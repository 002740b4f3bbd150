from .follower import FeedFollower, footer_hints, throughput_view
from .pipeline import CdcPipeline, run_available

__all__ = ["CdcPipeline", "FeedFollower", "footer_hints", "run_available", "throughput_view"]
