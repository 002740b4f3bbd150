from .follower import FeedFollower, footer_hints, throughput_view
from .pipeline import CdcPipeline, run_available
from .stateful import winner_delta_stream

__all__ = ["CdcPipeline", "FeedFollower", "footer_hints", "run_available", "throughput_view", "winner_delta_stream"]
