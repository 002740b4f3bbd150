"""The shared maintained-view sync protocol (rollup + sketch views).

Every changelog-synced view — additive rollup, HLL registers, count-min
slots, log2-histogram bins — advances by the same exactly-once
read-modify-write dance; only the DELTA BUILDER (what the new changes
contribute) and the MERGE EXPRESSION (how a delta row folds onto the
current row) differ. One copy of the protocol lives here so a fix to
any step (cursor contract, checkpoint lifecycle, empty-range marker,
bucket pruning) lands once, not four times:

1. cursor = the view's own max committed epoch (``rollup_cursor``);
   nothing to do when the source head hasn't advanced past it.
2. delta = ``build_delta(synced, head, vsnap)`` — one row per view key
   touched by the new changes, payload columns pre-aggregated. The
   frame is localCheckpoint'd here (one materialization serves the
   touched-bucket collect, the semi-join build and the merge source)
   and released on every exit path.
3. Empty delta → metadata-only ``commit_epoch_marker(head)`` — the
   cursor advances with zero data work.
4. current = the view's reconciled rows for JUST the delta's buckets
   (never a view scan), semi-joined down to the delta's keys.
5. merge source = delta LEFT JOIN current, folded by the caller's
   payload expressions; LWW ordinal = the consumed lake VERSION (an
   out-of-order shard can put a lower feed lsn in a later epoch — the
   updated row must still win the reconcile against its predecessor).
6. ``merge(epoch_id=head, mode='mor')`` — the cursor write commits
   ATOMICALLY with the data, so a crash between merge and anything
   else replays into a registered epoch and no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ckpt import free_checkpoint as _free_checkpoint
from .rollup import rollup_cursor
from .table import LakeTable


def sync_view(
    view: LakeTable,
    table: LakeTable,
    to_version: int | None,
    build_delta,
    cur_select: "list[tuple[str, str]]",
    merge_payload,
) -> int:
    """Advance ``view`` to ``table``'s head (or ``to_version``); returns
    lake versions consumed (0 = already current).

    ``build_delta(synced, head, vsnap) -> (DataFrame, aux)``: the delta
    frame (view merge-key columns + payload), plus a list of auxiliary
    checkpointed frames to release when the sync finishes.
    ``cur_select``: (view column, alias) pairs read from the touched
    buckets' current rows.
    ``merge_payload() -> list[Column]``: the view's payload columns for
    the merge source, referencing delta and aliased-current columns by
    name (evaluated against the delta LEFT JOIN current frame)."""
    head = table.current_version() if to_version is None else int(to_version)
    synced = rollup_cursor(view)
    if head <= synced:
        return 0
    vsnap = view.snapshot()
    key = list(vsnap.merge_key)
    delta, aux = build_delta(synced, head, vsnap)
    delta = delta.localCheckpoint(eager=False)
    try:
        touched = {
            int(r["__b"])
            for r in delta.select(view._bucket_col(vsnap).alias("__b"))
            .distinct()
            .collect()
        }
        if not touched:
            # the range carried no contributing rows (epoch markers,
            # compactions, net-zero transitions) — metadata-only advance
            view.commit_epoch_marker(head)
            return head - synced
        cur_cols = [F.col(n).alias(a) for n, a in cur_select]
        cur = (
            view._reconciled(vsnap, buckets=touched)
            .select(*key, *cur_cols)
            .join(delta.select(*key), on=key, how="left_semi")
            if (vsnap.files or vsnap.delta_files)
            else view.spark.createDataFrame([], vsnap.spark_schema()).select(
                *key, *cur_cols
            )
        )
        src = delta.join(cur, on=key, how="left").select(
            *key,
            *merge_payload(),
            F.lit("U").alias("op"),
            F.lit(int(head)).cast("long").alias("lsn"),
        )
        view.merge(src, epoch_id=head, op_col="op", mode="mor", lsn_col="lsn")
        return head - synced
    finally:
        _free_checkpoint(delta)
        for a in aux:
            _free_checkpoint(a)
