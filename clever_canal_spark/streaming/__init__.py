from .follower import FeedFollower, RoutedFeedFollower, footer_hints, throughput_view
from .pipeline import CdcPipeline, run_available
from .prometheus import (
    render_consumer_metrics,
    render_hotkey_metrics,
    render_metrics,
    render_replica_metrics,
    render_sketch_metrics,
)
from .stateful import winner_delta_stream
from .joins import interval_join_stream
from .lease import LeaderLease, LeadershipLost, run_with_lease
from .windows import (
    dedup_events_within_watermark,
    sessionized_counts,
    windowed_distinct_registers,
    windowed_event_counts,
    windowed_value_histogram,
)

__all__ = [
    "CdcPipeline",
    "FeedFollower",
    "RoutedFeedFollower",
    "footer_hints",
    "render_metrics",
    "render_consumer_metrics", "render_hotkey_metrics",
    "run_available",
    "LeaderLease",
    "LeadershipLost",
    "run_with_lease",
    "interval_join_stream",
    "sessionized_counts",
    "throughput_view",
    "dedup_events_within_watermark",
    "windowed_event_counts",
    "render_sketch_metrics",
    "render_replica_metrics",
    "windowed_distinct_registers",
    "windowed_value_histogram",
    "winner_delta_stream",
]
