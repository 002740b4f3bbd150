"""Changelog-synced HLL sketch view — incrementally-maintained distinct
counting over the CDC stream.

The rollup view (``lake/rollup.py``) keeps ADDITIVE per-key aggregates;
this view keeps the other mergeable family a 100-TB ingest needs:
**distinct cardinality per group** — distinct urls per domain, distinct
shingles per source — where an exact COUNT(DISTINCT) would shuffle every
distinct value on every refresh. State is one dense HyperLogLog register
array per group (``operators/sketch.py``); a sync builds registers from
ONLY the new changelog rows, reads the current registers of JUST the
touched groups (bucket-pruned), element-wise-maxes, and LWW-merges back.
Per sync the work is O(changes) + O(touched buckets' view rows) — the
corpus is never rescanned.

Semantics: the estimate is **distinct items EVER SEEN** in the change
stream — a monotone statistic, which is exactly what an HLL register
supports (registers only grow). Three consequences, all deliberate:

- Deletes don't decrement (the item WAS seen); payload-derived items on
  a delete marker are null (the changelog carries no before-image) and
  are skipped — both consistent with ever-seen.
- Duplicate delivery is harmless: HLL add is idempotent, so unlike the
  additive rollup this view tolerates COW re-emits — either merge mode
  feeds it correctly.
- TRUNCATE does not reset it (same stance as the rollup: history is the
  point). Consumers needing current-state distinct counts aggregate
  ``scan()`` instead.

Exactly-once: identical contract to ``sync_rollup`` — the merge commits
under the consumed lake version in the view's own epoch registry, so a
crash between merge and cursor replays into a registered epoch and
no-ops; and because the merged registers are monotone, the
consumed-version LWW ordinal is always safe.

The sketch parameter ``b`` is persisted at create time in the view's log
directory (``sketch.json``, atomic create), so any process reopening the
view syncs with the same register geometry.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.sketch import (
    hll_card_from_regs_expr,
    hll_merge_regs_expr,
    hll_regs_dense,
)
from .rollup import _free_checkpoint, rollup_cursor
from .table import LakeTable

_CFG_NAME = "sketch.json"


def _cfg_path(view: LakeTable) -> str:
    return f"{view._log_path}/{_CFG_NAME}"


def hll_view_config(view: LakeTable) -> dict:
    """The persisted sketch geometry (``{"kind": "hll", "b": ...}``)."""
    return json.loads(view._fs.read_text(_cfg_path(view)))


def create_hll_view(
    spark: SparkSession,
    path: str,
    group_col: str,
    group_type: str = "string",
    b: int = 12,
    n_buckets: int = 16,
    start_after: int = 0,
) -> LakeTable:
    """An empty sketch view: one row per group carrying a dense m=2^b
    register array, keyed and physically bucketed by the group column
    (each sync's read-modify-write touches only the delta's buckets).

    ``start_after`` as in :func:`~clever_canal_spark.lake.rollup.create_rollup`:
    the lake version to begin tailing AFTER (0 = full retained history on
    first sync; pass ``table.current_version()`` for a from-now view or
    when early snapshots were expired).

    Default ``b=12`` (m=4096 registers -> ~1.6% stderr, 16 KiB/group);
    tests use small b. Raw-estimator validity floor: expected cardinality
    should exceed ~2.5*2^b (see ``operators/sketch.py``)."""
    schema = T.StructType(
        [
            T.StructField(group_col, T.DataType.fromDDL(group_type), nullable=False),
            T.StructField("regs", T.ArrayType(T.IntegerType())),
        ]
    )
    view = LakeTable.create(
        spark, path, schema, merge_key=[group_col], n_buckets=n_buckets
    )
    view._fs.write_text_exclusive(
        _cfg_path(view), json.dumps({"kind": "hll", "b": int(b)})
    )
    if start_after > 0:
        view.commit_epoch_marker(int(start_after))
    return view


def sync_hll_view(
    view: LakeTable,
    table: LakeTable,
    item_expr,
    group_expr=None,
    to_version: int | None = None,
) -> int:
    """Advance the sketch view to ``table``'s head (or ``to_version``):
    register the new changelog rows' items, element-wise-max onto the
    touched groups' current registers, merge back. Returns lake versions
    consumed (0 = already current). Cursor = the view's own max committed
    epoch id, exactly like the rollup — reopening in a fresh process
    resumes with no sidecar state.

    ``item_expr``: the value whose distinct count is tracked (a Column
    over the changelog row — e.g. the url key, or a payload expression).
    Null items (payload expressions on delete markers) are skipped.
    ``group_expr`` defaults to the view's key column by name; like the
    rollup it should derive from the source MERGE-KEY columns so delete
    markers group correctly — though here a payload-derived group merely
    skips D rows (null group filtered with null item) rather than
    corrupting counts."""
    b = int(hll_view_config(view)["b"])
    m = 1 << b
    head = table.current_version() if to_version is None else int(to_version)
    synced = rollup_cursor(view)
    if head <= synced:
        return 0
    vsnap = view.snapshot()
    gcol = vsnap.merge_key[0]
    gexpr = group_expr if group_expr is not None else F.col(gcol)

    items = (
        table.scan_changes(synced, head)
        .select(gexpr.alias(gcol), item_expr.alias("__item"))
        .filter(F.col("__item").isNotNull() & F.col(gcol).isNotNull())
    )
    delta = hll_regs_dense(items, [gcol], "__item", b, regs_col="_d_regs")
    delta = delta.localCheckpoint(eager=False)

    touched = {
        int(r["__b"])
        for r in delta.select(view._bucket_col(vsnap).alias("__b")).distinct().collect()
    }
    if not touched:
        # the range carried no items (epoch markers, compactions, pure
        # deletes of payload-derived items) — metadata-only cursor advance
        view.commit_epoch_marker(head)
        _free_checkpoint(delta)
        return head - synced

    cur = (
        view._reconciled(vsnap, buckets=touched)
        .select(gcol, F.col("regs").alias("_old_regs"))
        .join(delta.select(gcol), on=gcol, how="left_semi")
        if (vsnap.files or vsnap.delta_files)
        else view.spark.createDataFrame(
            [], f"{gcol} string, _old_regs array<int>"
        ).select(F.col(gcol).cast(vsnap.spark_schema()[gcol].dataType), "_old_regs")
    )
    src = delta.join(cur, on=gcol, how="left").select(
        gcol,
        F.expr(hll_merge_regs_expr("_old_regs", "_d_regs", m)).alias("regs"),
        F.lit("U").alias("op"),
        # merge-LWW ordinal = consumed lake version (see rollup); safe
        # here even against re-emits because the merge is monotone
        F.lit(int(head)).cast("long").alias("lsn"),
    )
    view.merge(src, epoch_id=head, op_col="op", mode="mor", lsn_col="lsn")
    _free_checkpoint(delta)
    return head - synced


def hll_view_estimates(view: LakeTable, out_col: str = "hll_distinct") -> DataFrame:
    """Per-group cardinality estimates from the stored registers — a
    scan of the view only (O(#groups), never the source table)."""
    b = int(hll_view_config(view)["b"])
    gcol = view.snapshot().merge_key[0]
    return view.scan().select(
        gcol, F.expr(hll_card_from_regs_expr(b, "regs")).alias(out_col)
    )
