"""Physical row erasure — the GDPR right-to-be-forgotten operation.

``delete_where`` (plans/dml.py) erases rows *logically*: downstream
consumers see ordinary delete markers and the live scan stops returning
them — but time travel, the changelog, retained data files, and the LWW
tombstones themselves still carry the payload (and the KEY, which is
often the PII: a url). :func:`erase_rows` finishes the job physically,
the way Iceberg/Delta compliance guides do it (DELETE → rewrite data
files → expire snapshots → remove orphan files):

1. capture the matched keys from the reconciled state INCLUDING
   tombstones (materialized first — the logical delete is about to
   change that state; tombstones carry the pre-image, so a crash-replay
   whose rows are already deleted still finds them),
2. ``delete_where`` — downstream consumers observe normal D markers
   BEFORE the history disappears (ordering matters: a consumer that
   tails the changelog later will find the erase epoch expired),
3. one compaction-style rewrite of the whole table dropping EVERY
   version of the matched keys — including their tombstones, which a
   plain compact would retain (the tombstone carries the key),
4. retention collapse (``expire_snapshots(keep_last=1)``) + ``vacuum(0)``
   so no retained snapshot references the old files and the bytes leave
   disk.

Refuses when named refs pin older snapshots (the pinned version would
keep the files alive — drop the tags first, explicitly). The rewrite
commits as a compaction, so ``scan_changes`` never re-emits the
surviving rows.

Trade stated plainly: erasure collapses time travel to the single
post-erase snapshot and drops the erased keys' tombstones — a lagging
shard could re-insert an erased key afterwards (the usual LWW shield is
gone WITH the tombstone; that is inherent to erasure, not a bug: keep
the upstream feed filtered too).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..ckpt import free_checkpoint
from .table import LakeTable


@dataclass
class EraseResult:
    version: int
    files_removed: int
    delete_applied: bool


def _pred(predicate: Column | str) -> Column:
    return F.expr(predicate) if isinstance(predicate, str) else predicate


def erase_rows(
    table: LakeTable,
    predicate: Column | str,
    epoch_id,
    keep_last: int = 1,
) -> EraseResult:
    """Physically erase every live row matching ``predicate`` (and all
    retained history of those keys). See module docstring for the
    protocol and the stated trades."""
    refs = table.list_refs()
    if refs:
        raise ValueError(
            f"named refs pin historical snapshots ({sorted(refs)}); "
            "erasure cannot be complete while they exist — drop_tag first"
        )
    snap = table.snapshot()
    key = list(snap.merge_key)
    # capture keys from the reconciled state INCLUDING tombstones, not the
    # live scan: (a) a crash-replay re-runs after delete_where already
    # committed, so the matching rows are now tombstones and a live scan
    # would find nothing — silently retaining the PII-bearing tombstones;
    # (b) even on a first run, a key deleted earlier by normal CDC whose
    # tombstone still matches the predicate carries the payload and must
    # be purged too. Delete tombstones carry the full pre-image
    # (plans/dml.py delete_where), so the predicate evaluates on them.
    keys = (
        table._reconciled(snap, keep_deletes=True)
        .filter(_pred(predicate))
        .select(*key)
        .distinct()
        .localCheckpoint()
    )
    try:
        from ..plans.dml import delete_where

        res = delete_where(table, predicate, epoch_id=epoch_id)
        if res.applied and keys.limit(1).count() == 0:
            # first run, nothing matched: the (empty) delete epoch is
            # committed for exactly-once, but there is no history to
            # rewrite and no reason to collapse retention. A REPLAY
            # (res.applied False) never takes this path — a prior attempt
            # may have crashed mid-protocol, so the rewrite must run.
            return EraseResult(
                version=table.current_version(), files_removed=0,
                delete_applied=True,
            )

        # physical rewrite: every retained version of the matched keys —
        # tombstones included — drops from every bucket in one commit
        snap = table.snapshot()
        cols = [f["name"] for f in snap.current_fields()]
        body = (
            table._reconciled(snap, keep_deletes=True)
            .join(keys, on=key, how="left_anti")
            .select(*cols, "__lsn", "__op")
        )
        sort_key = list(snap.bucket_key)
        sort_key += [k for k in key if k not in sort_key]
        new_files = table._write_data_files(snap, body, sort_cols=sort_key + ["__lsn"])
        child = table._child(
            snap, files=new_files, delta_files=[], operation="compact:erase"
        )
        table._write_snapshot(child)
    finally:
        free_checkpoint(keys)

    table.expire_snapshots(keep_last=keep_last)
    removed = table.vacuum(orphan_ttl_s=0.0)
    return EraseResult(
        version=table.current_version(),
        files_removed=len(removed["removed_files"]),
        delete_applied=res.applied,
    )
