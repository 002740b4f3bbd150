from .consumers import Batch, Consumer
from .diff import snapshot_diff
from .fs import ArrowFS, LocalFS, MemFS, MetadataFS
from .rollup import create_rollup, hot_groups, rollup_cursor, sync_rollup
from .table import CommitConflict, LakeTable, MergeResult, SnapshotExpired

__all__ = [
    "LakeTable", "MergeResult", "CommitConflict", "SnapshotExpired",
    "MetadataFS", "LocalFS", "ArrowFS", "MemFS",
    "create_rollup", "sync_rollup", "hot_groups", "rollup_cursor",
    "Consumer", "Batch", "snapshot_diff",
]
