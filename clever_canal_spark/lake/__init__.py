from .fs import ArrowFS, LocalFS, MemFS, MetadataFS
from .table import CommitConflict, LakeTable, MergeResult

__all__ = [
    "LakeTable", "MergeResult", "CommitConflict",
    "MetadataFS", "LocalFS", "ArrowFS", "MemFS",
]
