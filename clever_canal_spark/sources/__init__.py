from .feed import first_position, latest_position, read_feed, read_feed_stream, write_feed_slices

__all__ = [
    "read_feed",
    "read_feed_stream",
    "write_feed_slices",
    "first_position",
    "latest_position",
]
