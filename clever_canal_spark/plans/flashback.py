"""Epoch flashback: selectively undo a committed epoch's surviving writes.

The operational story: a bad deploy poisoned the feed for one epoch —
revert WHAT THAT EPOCH STILL OWNS without stopping the stream or
rewinding the table (a rewind would also lose every good epoch since).
This is the CDC-native form of a DB flashback: compensation events,
applied through the SAME exactly-once merge path as any epoch, so the
revert itself is idempotent, crash-safe, and visible in the changelog
like any other change (downstream consumers and maintained views absorb
it as ordinary events — no side-channel state surgery).

Selective-undo semantics:

- a key the epoch touched and NO later (non-compaction) commit rewrote is
  restored to its pre-epoch state — value rows back to the old image,
  first-appearance rows tombstoned;
- a key a LATER epoch already overwrote is left alone (the later write is
  presumed good; reverting it would lose newer data).

Plan shape: the epoch's commit span is found by registry binary search
(driver-side metadata, lake/consistency.py machinery); touched keys come
from two file-diff ``scan_changes`` reads (never a table scan); the
pre-state read is bucket-pruned (``scan_for_keys_df``). Work is
O(epoch + touched buckets), independent of table size.

Reference analog: Canal's rollback redelivers a batch for re-processing
(CanalServerWithEmbedded rollback); flashback is the post-ack
complement — the batch already committed, so the inverse batch is
delivered instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from ..lake.consistency import _retained_versions, version_at_epoch
from ..lake.table import LakeTable, MergeResult, SnapshotExpired, _epoch_prefix


@dataclass
class FlashbackPlan:
    epoch_id: int
    pre_version: int      # state to restore (just before the epoch)
    last_version: int     # the epoch's final commit
    revert_lsn: int       # LSN stamped on the compensation events


def _first_commit_version(table: LakeTable, epoch_id: int) -> int:
    """Smallest retained version whose registry contains ANY segment of
    ``epoch_id`` (presence is monotone over the chain)."""

    def has_any(snap) -> bool:
        if any(_epoch_prefix(k) == epoch_id for k in snap.committed_epochs):
            return True
        return epoch_id <= snap.epoch_watermark

    versions = _retained_versions(table)
    lo, hi = 0, len(versions) - 1
    if not has_any(table.snapshot(versions[hi])):
        raise ValueError(f"epoch {epoch_id} is not committed in {table.path}")
    if has_any(table.snapshot(versions[0])):
        raise SnapshotExpired(
            f"epoch {epoch_id}'s first commit in {table.path} predates the "
            f"oldest retained snapshot v{versions[0]} — the pre-epoch state "
            "needed for a revert is gone"
        )
    while lo < hi:
        mid = (lo + hi) // 2
        if has_any(table.snapshot(versions[mid])):
            hi = mid
        else:
            lo = mid + 1
    return versions[lo]


def _frontier_lsn(table: LakeTable) -> int | None:
    """Max source LSN the table has applied — driver-side metadata only
    (file stats + registry lineage + watermarks)."""
    snap = table.snapshot()
    cands = [snap.truncate_lsn or 0]
    if snap.epoch_watermark_lsn_max is not None:
        cands.append(snap.epoch_watermark_lsn_max)
    for f in snap.files + snap.delta_files:
        if f.get("lsn_max") is not None:
            cands.append(f["lsn_max"])
    for lin in snap.committed_epochs.values():
        if isinstance(lin, dict) and lin.get("lsn_max") is not None:
            cands.append(lin["lsn_max"])
    mx = max(cands)
    return mx if mx > 0 else None


def plan_flashback(
    table: LakeTable, epoch_id: int, lsn: int | None = None
) -> FlashbackPlan:
    v_first = _first_commit_version(table, epoch_id)
    v_last = version_at_epoch(table, epoch_id)
    v_pre = v_first - 1
    table._snapshot_retained(v_pre)  # must still be readable
    revert_lsn = lsn if lsn is not None else (_frontier_lsn(table) or 0) + 1
    return FlashbackPlan(epoch_id, v_pre, v_last, revert_lsn)


def revert_epoch(
    table: LakeTable,
    epoch_id: int,
    revert_epoch_id,
    lsn: int | None = None,
    mode: str = "mor",
    compact_every: int = 24,
) -> MergeResult:
    """Build and apply the compensation epoch that undoes what
    ``epoch_id`` still owns. ``revert_epoch_id`` keys the merge in the
    exactly-once registry (replays no-op). ``lsn`` stamps the
    compensation events (default: table frontier + 1, so they win LWW
    against everything applied so far — pass an explicit feed LSN when
    the stream is still advancing, or the next epoch could tie)."""
    plan = plan_flashback(table, epoch_id, lsn=lsn)
    key = table.snapshot().merge_key
    cols = [f["name"] for f in table.snapshot().current_fields()]

    touched = (
        table.scan_changes(plan.pre_version, plan.last_version)
        .select(*key).distinct()
    )
    later = (
        table.scan_changes(plan.last_version)
        .select(*key).distinct()
    )
    revert_keys = touched.join(later, on=key, how="left_anti")

    pre = table.scan_for_keys_df(revert_keys, version=plan.pre_version)
    # scan_for_keys_df prunes by BUCKET key (the merge-key prefix) — tighten
    # to the exact merge keys being reverted
    restored = pre.join(F.broadcast(revert_keys), on=key, how="left_semi")
    back = restored.select(
        *cols, F.lit("U").alias("op"), F.lit(plan.revert_lsn).cast("long").alias("lsn")
    )
    gone = revert_keys.join(restored.select(*key), on=key, how="left_anti")
    erase = gone.select(
        *[
            F.col(c) if c in key else F.lit(None).cast(dict(
                (f["name"], f["type"]) for f in table.snapshot().current_fields()
            )[c]).alias(c)
            for c in cols
        ],
        F.lit("D").alias("op"),
        F.lit(plan.revert_lsn).cast("long").alias("lsn"),
    )
    comp = back.unionByName(erase)
    return table.merge(
        comp,
        epoch_id=revert_epoch_id,
        lineage={
            "flashback_of_epoch": epoch_id,
            "lsn_min": plan.revert_lsn,
            "lsn_max": plan.revert_lsn,
        },
        mode=mode,
        lsn_col="lsn",
        compact_every=compact_every,
    )
