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


def live_state_hidden(table: LakeTable, version: int) -> DataFrame:
    """The table's live rows at a pinned version WITH the hidden ``__lsn``
    column — ``scan()`` minus the final payload-only projection. The seed
    side of a view bootstrap needs the LSN (e.g. the rollup's
    ``last_lsn``), which the public scan hides."""
    snap = table.snapshot(version)
    cols = [f["name"] for f in snap.current_fields()]
    if snap.delta_files:
        df = table._reconciled(snap)
    else:
        df = table._read_files(snap, snap.files, hidden=True).filter(
            F.col("__op") != F.lit("D")
        )
    return df.select(*cols, "__lsn")


def bootstrap_view(view: LakeTable, table: LakeTable, build_seed) -> int:
    """Seed an EMPTY maintained view from the source table's CURRENT
    state — the snapshot-then-tail path for putting a view on a
    long-lived table whose early changelog is past retention: a
    full-history first sync would raise
    :class:`~clever_canal_spark.lake.table.SnapshotExpired`, and
    ``create_*(start_after=current_version())`` would skip the existing
    rows entirely. This is the view-side analog of the engine's
    bootstrap (initial snapshot load, then tail) and of the reference's
    TableMeta snapshot+replay (DatabaseTableMeta.java:229-281).

    ``build_seed(version) -> DataFrame``: the view's initial rows
    (exact view schema: merge-key + payload columns) computed from the
    source state pinned at ``version`` — ONE full source scan, the only
    corpus-sized read the view ever does.

    Returns the lake version the seed captured; 0 = nothing done (the
    view has already consumed something — idempotent reopen). A source
    with no live rows (empty or all-deleted) stamps a metadata-only
    cursor marker at the current version, so the tail starts there
    either way. Crash-safe: the seed merges under
    ``epoch_id=version`` in the view's own registry atomically with the
    data, so a replayed bootstrap either sees a non-zero cursor and
    no-ops here, or re-merges into a registered epoch and no-ops inside
    ``merge``. Subsequent ``sync_*`` calls tail from ``version``.
    """
    head = table.current_version()
    synced = rollup_cursor(view)
    if synced > 0 or head <= 0:
        return 0
    vsnap = view.snapshot()
    if vsnap.files or vsnap.delta_files:
        raise ValueError(
            "bootstrap_view requires an empty view — it seeds initial state"
        )
    key = list(vsnap.merge_key)
    cols = [f["name"] for f in vsnap.current_fields()]
    seed = build_seed(head).select(*cols).localCheckpoint(eager=False)
    try:
        if not seed.take(1):
            # live state contributed nothing (all-deleted table, or the
            # seed expression nulled out) — metadata-only cursor stamp
            view.commit_epoch_marker(head)
            return head
        src = seed.select(
            *cols,
            F.lit("U").alias("op"),
            F.lit(int(head)).cast("long").alias("lsn"),
        )
        view.merge(src, epoch_id=head, op_col="op", mode="mor", lsn_col="lsn")
        return head
    finally:
        _free_checkpoint(seed)


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
