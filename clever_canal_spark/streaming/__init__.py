from .follower import FeedFollower
from .pipeline import CdcPipeline, run_available

__all__ = ["CdcPipeline", "FeedFollower", "run_available"]
