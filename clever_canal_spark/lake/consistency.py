"""Cross-table consistency cuts over routed CDC destinations.

A multi-table route (plans/route.py) applies the SAME epoch to every
destination exactly once — each destination commits the epoch (or an
empty-epoch marker), so epoch ids are a shared logical clock across the
fan-out, exactly the transaction framing Canal's sink preserves
(ack-at-txn-boundary, SURVEY.md §2.4 E6; the reference groups events by
txn and delivers whole transactions, EntryEventSink.java sink contract).

That clock makes consistent multi-table reads a metadata-only operation:

- :func:`version_at_epoch` — the snapshot version at which a table's
  state first includes everything up to epoch E (epochs apply in order;
  the full epoch commits under its plain key after any DDL segments).
- :func:`consistent_versions` / :func:`consistent_scans` — the SAME cut
  across N tables: each table read at its own version, all reflecting
  exactly the feed prefix through epoch E. No coordination ran between
  the tables at write time beyond the shared epoch ids; the cut is
  reconstructed from each table's own registry.
- :func:`latest_consistent_epoch` — the newest epoch every table has
  fully applied (the group's consistency frontier): pick it, then read
  all tables at that cut even while a lagging destination keeps
  ingesting newer epochs.

Zero Spark jobs anywhere here — registry walks over the snapshot log
(driver-side JSON), then plain ``scan(version=...)`` time travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .table import _LOG_DIR, LakeTable, SnapshotExpired, _epoch_prefix


def _retained_versions(table: LakeTable) -> list[int]:
    import os

    names = table._fs.listdir(os.path.join(table.path, _LOG_DIR))
    return sorted(
        int(n[1:9]) for n in names if n.startswith("v") and n.endswith(".json")
    )


def version_at_epoch(table: LakeTable, epoch_id: int) -> int:
    """Smallest retained snapshot version whose state includes epoch
    ``epoch_id`` in full. Raises ``ValueError`` if the epoch hasn't been
    applied, :class:`SnapshotExpired` if retention already expired the
    snapshot that first contained it (the cut is gone — pick a newer
    epoch or retain more history)."""
    versions = _retained_versions(table)
    if not versions:
        raise ValueError(f"{table.path} has no snapshots")
    # binary search: committed(E) is monotone over the version chain
    lo, hi = 0, len(versions) - 1
    if not LakeTable._committed_in(table.snapshot(versions[hi]), epoch_id):
        raise ValueError(
            f"epoch {epoch_id} is not committed in {table.path} "
            f"(head v{versions[hi]})"
        )
    oldest = table.snapshot(versions[0])
    if LakeTable._committed_in(oldest, epoch_id):
        # E is already in the OLDEST retained snapshot, so the exact commit
        # point may predate retention. Version 1 is the create snapshot
        # (empty registry) so this can't trigger without expiration; the
        # only exactness proof left is the snapshot's own operation stamp.
        if oldest.operation in (
            f"merge-mor:epoch={epoch_id}",
            f"epoch_marker:{epoch_id}",
        ) or oldest.operation.endswith(f":epoch={epoch_id}"):
            return versions[0]
        raise SnapshotExpired(
            f"the snapshot where epoch {epoch_id} committed in "
            f"{table.path} was expired by retention — the consistency "
            f"cut below v{versions[0]} is gone; choose a newer epoch"
        )
    while lo < hi:
        mid = (lo + hi) // 2
        if LakeTable._committed_in(table.snapshot(versions[mid]), epoch_id):
            hi = mid
        else:
            lo = mid + 1
    return versions[lo]


def latest_consistent_epoch(tables: dict[str, LakeTable]) -> int:
    """The newest epoch id committed in EVERY table — the group's
    consistency frontier. Epoch ids are compared by their numeric prefix
    (segment suffixes collapse to their epoch). Raises ``ValueError``
    when some table has applied no epochs yet."""
    frontiers = []
    for name, t in tables.items():
        snap = t.snapshot()
        ids = [
            p for p in (_epoch_prefix(k) for k in snap.committed_epochs)
            if p is not None
        ]
        # only FULLY-applied epochs count: a segmented epoch's plain key
        # lands last, so require it (or the watermark) for the max
        full = [
            p for p in ids
            if str(p) in snap.committed_epochs or p <= snap.epoch_watermark
        ]
        if snap.epoch_watermark >= 0:
            full.append(snap.epoch_watermark)
        if not full:
            raise ValueError(f"table {name!r} has no fully-applied epochs")
        frontiers.append(max(full))
    return min(frontiers)


def consistent_versions(
    tables: dict[str, LakeTable], epoch_id: int | None = None
) -> dict[str, int]:
    """Per-table snapshot versions all reflecting exactly the feed prefix
    through ``epoch_id`` (default: :func:`latest_consistent_epoch`).
    Returns {name: version} for use with ``scan(version=...)``."""
    e = epoch_id if epoch_id is not None else latest_consistent_epoch(tables)
    return {name: version_at_epoch(t, e) for name, t in tables.items()}


def consistent_scans(
    tables: dict[str, LakeTable], epoch_id: int | None = None
) -> dict[str, DataFrame]:
    """Consistent multi-table read: each table scanned at its cut version."""
    e = epoch_id if epoch_id is not None else latest_consistent_epoch(tables)
    return {
        name: t.scan(version=version_at_epoch(t, e)) for name, t in tables.items()
    }
