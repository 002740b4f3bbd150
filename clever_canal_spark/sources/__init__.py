from .feed import first_position, latest_position, read_feed, read_feed_stream, write_feed_slices
from .flat_message import (
    decode_flat_message,
    encode_flat_message_expr,
    export_flat_messages,
    export_flat_messages_to_dir,
)

__all__ = [
    "read_feed",
    "read_feed_stream",
    "write_feed_slices",
    "first_position",
    "latest_position",
    "decode_flat_message",
    "encode_flat_message_expr",
    "export_flat_messages",
    "export_flat_messages_to_dir",
]
