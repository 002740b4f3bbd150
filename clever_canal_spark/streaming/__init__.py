from .follower import FeedFollower, RoutedFeedFollower, footer_hints, throughput_view
from .pipeline import CdcPipeline, run_available
from .stateful import winner_delta_stream
from .windows import windowed_event_counts

__all__ = [
    "CdcPipeline",
    "FeedFollower",
    "RoutedFeedFollower",
    "footer_hints",
    "run_available",
    "throughput_view",
    "windowed_event_counts",
    "winner_delta_stream",
]
