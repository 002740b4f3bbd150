"""Incrementally-maintained changelog rollup — materialized-view
maintenance over the CDC stream.

A downstream consumer often wants per-key traffic statistics, not the
row images themselves: how many changes has each url/domain seen, how
many were deletes, where is its write frontier. The reference exposes
the raw event stream and leaves aggregation to the client; here the
rollup is a first-class lake table the engine keeps in lockstep with
the source table's changelog (the same consume-the-changelog shape as
the dedup/ANN index syncs, and the closed loop behind hot-key salting:
the rollup IS the hot-key detector).

Why these aggregates: every rollup column is ADDITIVE over the change
stream (counts, max) — so maintenance needs **no before-images**, which
the changelog does not carry. A sync aggregates the NEW change rows
only, reads the current rollup rows for JUST the touched groups
(bucket-pruned — the view is keyed AND bucketed by the group column),
adds, and LWW-merges back. Nothing corpus-sized is ever read or
shuffled: per sync the work is O(changes) + O(touched buckets' view
files).

Semantics note: the rollup counts CHANGELOG ROWS (what ``scan_changes``
emits — for an ``apply_epoch``-fed table that is one pre-deduped winner
per key per epoch; for raw ``merge`` calls, every source row), not raw
feed events and not current table state. **The source table must be
MOR-fed**: a COW merge rewrites every surviving row of a touched bucket
into new files, and ``scan_changes`` re-emits those rewrites — the
rollup would count a cold key as "changed" every time a hot co-bucketed
key commits (the same caveat ``scan_changes`` documents; the LWW index
syncs tolerate re-emits because their apply is idempotent — additive
counting is not). A TRUNCATE therefore does NOT
reset it: erased keys keep their historical traffic counts, which is
exactly what a hot-key detector wants. Consumers needing current-state
aggregates should aggregate ``scan()`` instead.

Exactly-once: the merge is registered under the consumed lake version
in the view's committed-epoch registry; a crash between the merge and
the cursor write replays into a registered epoch and no-ops, so deltas
are never double-added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .table import LakeTable

_AGG_COLS = ("n_changes", "n_upserts", "n_deletes", "last_lsn")


def rollup_schema(group_col: str, group_type: str = "string") -> T.StructType:
    return T.StructType(
        [T.StructField(group_col, T.DataType.fromDDL(group_type), nullable=False)]
        + [T.StructField(c, T.LongType()) for c in _AGG_COLS]
    )


def create_rollup(
    spark: SparkSession,
    path: str,
    group_col: str,
    group_type: str = "string",
    n_buckets: int = 16,
    start_after: int = 0,
) -> LakeTable:
    """An empty rollup view keyed AND physically bucketed by the group
    column — bucketing on the group is what makes each sync's
    read-modify-write touch only the buckets the delta lands in.

    ``start_after``: lake version to start tailing AFTER (stamped as the
    initial cursor). Default 0 = count the table's whole retained
    history on the first sync. Pass ``table.current_version()`` to count
    from NOW — REQUIRED when the table's early snapshots were expired
    (a 0 cursor would walk past retention and raise
    :class:`~clever_canal_spark.lake.table.SnapshotExpired`), and the
    right choice for any long-lived table where the first sync reading
    the full changelog would defeat the O(changes) contract."""
    view = LakeTable.create(
        spark, path, rollup_schema(group_col, group_type),
        merge_key=[group_col], n_buckets=n_buckets,
    )
    if start_after > 0:
        view.commit_epoch_marker(int(start_after))
    return view


def sync_rollup(
    view: LakeTable,
    table: LakeTable,
    group_expr=None,
    to_version: int | None = None,
) -> int:
    """Advance the rollup to ``table``'s head (or ``to_version``):
    aggregate the changelog slice, add onto the current rollup rows of
    the touched groups, merge back. Returns lake versions consumed
    (0 = already current). Cursor = the view's own max committed epoch
    id (the consumed lake version), so the view needs no sidecar file
    and reopening it in a fresh process resumes exactly.

    ``group_expr`` must derive from the source table's MERGE-KEY columns
    (default: the view's key column by name): delete markers carry only
    the key — a payload-derived group would roll deletes up under null.

    Protocol (cursor, checkpoint lifecycle, bucket-pruned
    read-modify-write, consumed-version merge ordinal, exactly-once):
    shared with the sketch views — ``lake/_viewsync.py``."""
    from ._viewsync import sync_view

    def build_delta(synced, head, vsnap):
        gcol = vsnap.merge_key[0]
        gexpr = group_expr if group_expr is not None else F.col(gcol)
        # one aggregate over the changelog slice; the touched buckets
        # fall out of the delta's groups (never a driver-side value list)
        return (
            table.scan_changes(synced, head)
            .select(
                gexpr.alias(gcol),
                F.col("__op").alias("__op"),
                F.col("__lsn").alias("__lsn"),
            )
            .groupBy(gcol)
            .agg(
                F.count("*").alias("d_changes"),
                F.sum((F.col("__op") != "D").cast("long")).alias("d_upserts"),
                F.sum((F.col("__op") == "D").cast("long")).alias("d_deletes"),
                F.max("__lsn").alias("d_last_lsn"),
            )
        ), []

    return sync_view(
        view,
        table,
        to_version,
        build_delta,
        cur_select=[(c, c) for c in _AGG_COLS],
        merge_payload=lambda: [
            (F.coalesce("n_changes", F.lit(0)) + F.col("d_changes")).alias("n_changes"),
            (F.coalesce("n_upserts", F.lit(0)) + F.col("d_upserts")).alias("n_upserts"),
            (F.coalesce("n_deletes", F.lit(0)) + F.col("d_deletes")).alias("n_deletes"),
            F.greatest(
                F.coalesce("last_lsn", F.lit(0)), F.col("d_last_lsn")
            ).alias("last_lsn"),
        ],
    )


def bootstrap_rollup(view: LakeTable, table: LakeTable, group_expr=None) -> int:
    """Seed an empty rollup from the source's LIVE state (snapshot-then-
    tail): each live row counts as one upsert — ``n_changes=n_upserts=1``
    per row, ``n_deletes=0``, ``last_lsn`` from the row's hidden LSN —
    and the cursor stamps at the scanned version so ``sync_rollup``
    tails incrementally from there.

    Use when the table's early changelog is past retention (a
    full-history first sync raises SnapshotExpired) but the view should
    still reflect the rows that exist NOW, not just future traffic
    (``start_after`` gives the latter). Semantics caveat, stated rather
    than hidden: traffic that happened BEFORE the bootstrap version is
    unknowable from state alone — superseded versions and deleted keys
    left no trace — so seeded counts are a floor; from the bootstrap
    on, the additive contract is exact. Returns the seeded version
    (0 = view already has a cursor; a source with no live
    rows stamps a cursor marker at the current version)."""
    from ._viewsync import bootstrap_view, live_state_hidden

    gcol = view.snapshot().merge_key[0]
    gexpr = group_expr if group_expr is not None else F.col(gcol)

    def build_seed(version):
        return (
            live_state_hidden(table, version)
            .select(gexpr.alias(gcol), F.col("__lsn"))
            .filter(F.col(gcol).isNotNull())
            .groupBy(gcol)
            .agg(
                F.count("*").alias("n_changes"),
                F.count("*").alias("n_upserts"),
                F.lit(0).cast("long").alias("n_deletes"),
                F.max("__lsn").alias("last_lsn"),
            )
        )

    return bootstrap_view(view, table, build_seed)


def rollup_cursor(view: LakeTable) -> int:
    """The highest lake version this view has consumed — read from the
    view's own committed-epoch registry (epoch id == consumed version),
    so the cursor commits ATOMICALLY with the merge itself. Entries
    older than the registry's retention depth collapse into the
    snapshot's epoch watermark (``lake/table.py _EPOCH_RETENTION``), so
    the cursor read stays O(retention) however long the view runs."""
    snap = view.snapshot()
    return max(
        (int(e) for e in snap.committed_epochs),
        default=max(snap.epoch_watermark, 0),
    )


def hot_groups(view: LakeTable, min_changes: int) -> DataFrame:
    """Groups whose change traffic crosses ``min_changes`` — the input a
    follower feeds back into ``ApplyConfig(salted=...)`` key-skew
    handling. A full view scan, but the view is O(#distinct groups), not
    O(events)."""
    return view.scan().filter(F.col("n_changes") >= F.lit(min_changes))
