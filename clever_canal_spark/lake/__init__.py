from .table import CommitConflict, LakeTable, MergeResult

__all__ = ["LakeTable", "MergeResult", "CommitConflict"]
