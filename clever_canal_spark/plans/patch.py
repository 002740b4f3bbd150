"""Minimal-row-image apply: partial-column (patch) updates.

The reference's row images carry a per-column ``updated`` flag
(CanalEntry.Column.updated, set by LogEventConvert when a binlog UPDATE
ships a minimal after-image) — a sink must be able to apply an event
that names only the columns it changes. Full-row LWW cannot: folding a
{rank: 2} patch and a {lang: 'xx'} patch of one key must keep BOTH
columns, in LSN order, not pick one row wholesale.

``apply_patch_epoch`` does the fold Spark-first, O(batch + affected):

1. the batch's distinct keys prune a bucketed read of the CURRENT stored
   winners (tombstones included, with their LSNs) — never a table scan;
2. stored winner + patch events union into one per-key aggregation:
   for every payload column, ``max_by(value, set_lsn)`` over the events
   that SET that column (a patch sets its masked columns, an insert or
   the stored winner sets all, a delete sets none), plus the latest
   delete LSN — a column survives only if its last set is AFTER the last
   delete, so delete-then-patch re-creates the row with only the patched
   columns;
3. the folded FULL images merge through the ordinary idempotent MOR path
   (epoch-keyed, LWW) — so the changelog, replicas, and every maintained
   view keep seeing full rows and know nothing about patches.

Ordering contract: within an epoch any event order works (the fold
sorts by LSN); ACROSS epochs a key's patches must arrive in LSN order
(binlog order per key — the source guarantee CDC always has). A patch
at-or-below the stored winner's LSN is dropped whole: per-column
cross-epoch reordering would need per-column LSNs the row store does
not keep.

Patch batch shape: merge-key columns + payload columns (unnamed ones
NULL) + ``op`` (I/U/D) + ``lsn`` + ``updated_cols`` (array<string> of
the columns a U event actually sets; NULL means full image — I events
are always full images, D events set nothing). Setting a column to NULL
is expressed by naming it in ``updated_cols`` with a NULL value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..lake.table import LakeTable, MergeResult


def _winners_for_keys(table: LakeTable, snap, probe: DataFrame) -> DataFrame:
    """Stored winners for the probe's keys — tombstones and hidden cols
    retained (scan_for_keys_df drops both), bucket-pruned the same way."""
    keys = probe.distinct()
    buckets = {
        int(r["__b"])
        for r in keys.select(
            table._bucket_col(snap).alias("__b")
        ).distinct().collect()
    }
    cols = [f["name"] for f in snap.current_fields()]
    if not buckets:
        return table.spark.createDataFrame(
            [], snap.spark_schema()
        ).select(*cols, F.lit(0).cast("long").alias("__lsn"),
                 F.lit("U").alias("__op"))
    out = table._reconciled(snap, buckets=buckets, keep_deletes=True)
    out = out.join(
        F.broadcast(keys.select(*snap.bucket_key)),
        on=list(snap.bucket_key), how="left_semi",
    )
    return out.select(*cols, "__lsn", "__op")


def apply_patch_epoch(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int,
    lsn_col: str = "lsn",
    op_col: str = "op",
    mask_col: str = "updated_cols",
) -> MergeResult:
    """Fold a minimal-row-image batch against the stored state and apply
    it as one idempotent MOR epoch. See the module docstring for the
    batch shape and ordering contract."""
    if table.is_epoch_committed(epoch_id):
        return MergeResult(applied=False, version=table.current_version())
    snap = table.snapshot()
    key = list(snap.merge_key)
    payload = [f["name"] for f in snap.current_fields() if f["name"] not in key]

    ev = batch.select(
        *key,
        *[F.col(c) for c in payload],
        F.col(op_col).alias("__op"),
        F.col(lsn_col).cast("long").alias("__lsn"),
        F.when(F.col(op_col) == "I", F.lit(None).cast("array<string>"))
         .otherwise(F.col(mask_col).cast("array<string>")).alias("__mask"),
        F.lit(False).alias("__is_base"),
    )
    base = _winners_for_keys(table, snap, batch.select(*key)).select(
        *key,
        *[F.col(c) for c in payload],
        "__op", "__lsn",
        F.lit(None).cast("array<string>").alias("__mask"),
        F.lit(True).alias("__is_base"),
    )
    all_ev = ev.unionByName(base)

    def sets(c: str):
        # a delete sets nothing; a null mask (insert / full image / the
        # stored winner) sets everything; otherwise the mask decides
        return (F.col("__op") != "D") & (
            F.col("__mask").isNull() | F.array_contains("__mask", c)
        )

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
    for c in payload:
        cond = sets(c)
        aggs.append(
            F.max(F.when(cond, F.col("__lsn"))).alias(f"__setlsn_{c}")
        )
        aggs.append(
            F.max_by(
                F.when(cond, F.col(c)), F.when(cond, F.col("__lsn"))
            ).alias(f"__val_{c}")
        )
    folded = all_ev.groupBy(*key).agg(*aggs)
    # keys where no batch event beat the stored winner fold to exactly the
    # stored row — dropping them keeps stale patches out of the changelog
    folded = folded.filter(F.col("__lsn_max") > F.col("__base_lsn"))
    out = folded.select(
        *key,
        *[
            F.when(
                (F.col("__op_last") != "D")
                & (F.col(f"__setlsn_{c}") > F.col("__dlsn")),
                F.col(f"__val_{c}"),
            ).alias(c)
            for c in payload
        ],
        F.when(F.col("__op_last") == "D", F.lit("D"))
         .otherwise(F.lit("U")).alias("op"),
        F.col("__lsn_max").alias("lsn"),
    )
    return table.merge(out, epoch_id=epoch_id, mode="mor", lsn_col="lsn")
