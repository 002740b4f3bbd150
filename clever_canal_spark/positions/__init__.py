"""Position models: GTID sets and LSN watermarks."""

from .gtid import GtidSet, UUIDSet

__all__ = ["GtidSet", "UUIDSet"]
