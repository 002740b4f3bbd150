"""Partial-JSON (MySQL 8 ``binlog_row_value_options=PARTIAL_JSON``) apply.

The reference renders partial JSON updates as nested function text
(``JsonDiffConversion.java:36-131``); a plain full-row LWW merge would
overwrite whole documents with those fragments. ``apply_json_diff_epoch``
folds them correctly, Spark-first and O(batch + affected keys):

1. the batch's distinct keys prune a bucketed read of the current stored
   winners (never a table scan) — same shape as ``plans/patch.py``;
2. one per-key aggregation: non-JSON payload columns fold by plain LWW
   ``max_by(value, lsn)``; each declared JSON column folds as
   *base-then-diffs* — the latest full image (stored winner or a non-diff
   event) is the base, and every diff event ABOVE it applies in LSN order
   through one Arrow-batched pandas UDF
   (:func:`..sources.json_cols.json_diff_apply_udf`) — the only Python in
   the plan, and it runs on affected keys only;
3. the folded FULL images merge through the ordinary idempotent MOR path,
   so the changelog, replicas, and maintained views keep seeing full
   documents and know nothing about partial mode.

Ordering contract (same as patch apply): within an epoch any event order
works (the fold sorts by LSN); across epochs a key's events must arrive in
LSN order. A delete invalidates the base — diffs above a delete with no
newer full image fold onto NULL (and MySQL JSON functions on NULL yield
NULL), which cannot occur in a well-formed binlog stream anyway (no UPDATE
after DELETE without an INSERT, and INSERTs are always full images).

JSON column values are stored in CANONICAL form (sorted keys, compact —
``sources/json_cols.canonical_json``) whether they arrived full or as
diffs, so replay equality is byte-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..lake.table import LakeTable, MergeResult
from ..sources.json_cols import is_json_diff_expr, json_diff_apply_udf
from .patch import _winners_for_keys


def fold_json_events(
    all_ev: DataFrame,
    key: list[str],
    plain: list[str],
    json_cols: list[str],
) -> DataFrame:
    """Pure fold: normalized events (``key + payload + __op + __lsn +
    __is_base``) → one full image per key with ``op``/``lsn``. Shared by
    the epoch apply (events unioned with stored winners) and the
    driver-contract query (batch-only fold, ``__is_base`` all false)."""
    live = F.col("__op") != "D"
    aggs = [
        F.max("__lsn").alias("__lsn_max"),
        F.max_by("__op", "__lsn").alias("__op_last"),
        F.coalesce(
            F.max(F.when(F.col("__op") == "D", F.col("__lsn"))), F.lit(-1)
        ).alias("__dlsn"),
        F.coalesce(
            F.max(F.when(F.col("__is_base"), F.col("__lsn"))), F.lit(-1)
        ).alias("__base_lsn"),
    ]
    for c in plain:
        aggs.append(
            F.max_by(F.when(live, F.col(c)), F.when(live, F.col("__lsn"))).alias(
                f"__val_{c}"
            )
        )
        aggs.append(
            F.coalesce(F.max(F.when(live, F.col("__lsn"))), F.lit(-1)).alias(
                f"__setlsn_{c}"
            )
        )
    for c in json_cols:
        isdiff = F.expr(is_json_diff_expr(c))
        full = live & ~isdiff  # NULL col → rlike NULL → coalesce false: full
        aggs.append(
            F.max_by(F.when(full, F.col(c)), F.when(full, F.col("__lsn"))).alias(
                f"__jbase_{c}"
            )
        )
        aggs.append(
            F.coalesce(F.max(F.when(full, F.col("__lsn"))), F.lit(-1)).alias(
                f"__jblsn_{c}"
            )
        )
        # every diff event for c, (lsn, text) structs — sorted post-agg
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.when(live & isdiff, F.struct(F.col("__lsn"), F.col(c).alias("t")))
                )
            ).alias(f"__jdiffs_{c}")
        )
    folded = all_ev.groupBy(*key).agg(*aggs)
    # keys where nothing beat the stored winner fold to exactly the stored
    # row — dropping them keeps stale events out of the changelog
    folded = folded.filter(F.col("__lsn_max") > F.col("__base_lsn"))

    fold_udf = json_diff_apply_udf()
    out_cols: list = [*key]
    for c in plain:
        out_cols.append(
            F.when(
                (F.col("__op_last") != "D")
                & (F.col(f"__setlsn_{c}") > F.col("__dlsn")),
                F.col(f"__val_{c}"),
            ).alias(c)
        )
    for c in json_cols:
        # base survives only above the last delete; diffs below the
        # effective base (or delete) drop
        eff = F.greatest(F.col(f"__jblsn_{c}"), F.col("__dlsn"))
        base_val = F.when(
            F.col(f"__jblsn_{c}") > F.col("__dlsn"), F.col(f"__jbase_{c}")
        )
        diffs = F.filter(F.col(f"__jdiffs_{c}"), lambda d: d["__lsn"] > eff)
        texts = F.transform(diffs, lambda d: d["t"])
        out_cols.append(
            F.when(F.col("__op_last") == "D", F.lit(None).cast("string"))
            .otherwise(fold_udf(base_val, texts))
            .alias(c)
        )
    out_cols.append(
        F.when(F.col("__op_last") == "D", F.lit("D")).otherwise(F.lit("U")).alias("op")
    )
    out_cols.append(F.col("__lsn_max").alias("lsn"))
    return folded.select(*out_cols)


def apply_json_diff_epoch(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int,
    json_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> MergeResult:
    """Fold a batch whose ``json_cols`` values may be partial-update diff
    expressions, and apply it as one idempotent MOR epoch."""
    if table.is_epoch_committed(epoch_id):
        return MergeResult(applied=False, version=table.current_version())
    snap = table.snapshot()
    key = list(snap.merge_key)
    payload = [f["name"] for f in snap.current_fields() if f["name"] not in key]
    missing = [c for c in json_cols if c not in payload]
    if missing:
        raise ValueError(f"json_cols not payload columns: {missing}")
    plain = [c for c in payload if c not in json_cols]

    ev = batch.select(
        *key,
        *[F.col(c) for c in payload],
        F.col(op_col).alias("__op"),
        F.col(lsn_col).cast("long").alias("__lsn"),
        F.lit(False).alias("__is_base"),
    )
    base = _winners_for_keys(table, snap, batch.select(*key)).select(
        *key, *[F.col(c) for c in payload], "__op", "__lsn",
        F.lit(True).alias("__is_base"),
    )
    out = fold_json_events(ev.unionByName(base), key, plain, json_cols)
    return table.merge(out, epoch_id=epoch_id, mode="mor", lsn_col="lsn")
