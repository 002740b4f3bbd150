"""apply_epoch — the ``foreachBatch`` core (one micro-batch → lake state).

This is the Spark restatement of the whole Canal delivery+apply path
(SURVEY.md §3.2): a delivered batch (here: micro-batch ``epoch_id``) is
processed and acknowledged exactly once. ``ack`` = the committed-epoch entry
written atomically with the MERGE snapshot; ``rollback`` = Spark replaying
an uncommitted epoch from checkpoint, which this function detects and skips
or re-applies idempotently.

Pipeline inside one epoch (plan order matters for pushdown):

1. event-class + table regex filters (plain predicates — pushable);
2. split DDL channel rows out; cut the DML into LSN-ordered segments around
   each DDL (the store's DDL-isolation rule, E3 —
   MemoryEventStoreWithBuffer.java:389-417);
3. per segment: LWW dedup per (url, warc_ts) by LSN (plain or salted
   two-phase), THEN the pandas-UDF transforms on the surviving rows only
   (winners-only vectorized work — the disruptor stage-3 analog), then
   bucket-pruned copy-on-write MERGE;
4. apply the DDL to the table schema (idempotent), continue;
5. append one lineage/metrics row (idempotent via merge on epoch_id).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..filters import EventFilterConfig, apply_event_filters, project_fields
from ..functions.transforms import with_page_transforms
from ..lake import LakeTable
from ..model import KIND_DDL, KIND_HEARTBEAT, KIND_ROW, PAGE_KEY
from ..operators.lww import lww_dedup, salted_lww_dedup
from .ddl import apply_ddl_idempotent


@dataclass
class ApplyConfig:
    filters: EventFilterConfig = dc_field(default_factory=EventFilterConfig)
    salted: bool = False
    n_salts: int = 16
    transform: bool = True
    project: bool = False


@dataclass
class ApplyResult:
    epoch_id: int
    applied: bool
    segments: int = 0
    ddls_applied: int = 0
    n_rows: int = 0
    versions: list[int] = dc_field(default_factory=list)


def _dedup_flatten(rows: DataFrame, cfg: ApplyConfig) -> DataFrame:
    """Row events → one winner per key, flattened to merge-source shape
    (url, warc_ts, html, text, lang, op, lsn)."""
    keyed = rows.select(
        F.coalesce(F.col("after.url"), F.col("before.url")).alias("url"),
        F.coalesce(F.col("after.warc_ts"), F.col("before.warc_ts")).alias("warc_ts"),
        "lsn",
        "op",
        "after",
        "before",
    )
    dedup = (salted_lww_dedup(keyed, PAGE_KEY, n_salts=cfg.n_salts) if cfg.salted
             else lww_dedup(keyed, PAGE_KEY))
    if cfg.transform:
        dedup = with_page_transforms(dedup, image_col="after")
    return dedup.select(
        "url",
        "warc_ts",
        F.col("after.html").alias("html"),
        F.col("after.text").alias("text"),
        F.col("after.lang").alias("lang"),
        "op",
        "lsn",
    )


def apply_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    table: LakeTable,
    cfg: ApplyConfig | None = None,
    metrics_table: LakeTable | None = None,
) -> ApplyResult:
    """Apply one micro-batch exactly once. Safe to call again with the same
    ``epoch_id`` + data (replay after crash): already-committed segments and
    DDLs no-op."""
    cfg = cfg or ApplyConfig()
    t0 = time.monotonic()
    res = ApplyResult(epoch_id=epoch_id, applied=False)

    if table.is_epoch_committed(epoch_id):
        return res

    filtered = apply_event_filters(batch_df, cfg.filters)
    if cfg.project:
        filtered = project_fields(filtered, cfg.filters)

    # One aggregation job collects batch stats; DDL rows are few by
    # construction (store isolates them — E3), so collecting them is O(DDLs).
    stats = filtered.agg(
        F.count("*").alias("n_events"),
        F.min("lsn").alias("lsn_min"),
        F.max("lsn").alias("lsn_max"),
        F.sum((F.col("kind") == KIND_ROW).cast("long")).alias("n_rows"),
        F.sum(((F.col("kind") == KIND_ROW) & (F.col("op") != "D")).cast("long")).alias("n_upserts"),
        F.sum(((F.col("kind") == KIND_ROW) & (F.col("op") == "D")).cast("long")).alias("n_deletes"),
        F.sum((F.col("kind") == KIND_DDL).cast("long")).alias("n_ddl"),
        F.sum((F.col("kind") == KIND_HEARTBEAT).cast("long")).alias("n_heartbeats"),
    ).collect()[0]

    ddl_rows = []
    if stats["n_ddl"]:
        ddl_rows = sorted(
            (r.asDict() for r in filtered.filter(F.col("kind") == KIND_DDL).collect()),
            key=lambda r: r["lsn"],
        )
    rows = filtered.filter(F.col("kind") == F.lit(KIND_ROW))

    # LSN-ordered segments: DML < ddl1 | ddl1 | DML < ddl2 | ... | rest
    bounds = [r["lsn"] for r in ddl_rows]
    segments: list[tuple[str, DataFrame, dict | None]] = []
    lo = None
    for i, b in enumerate(bounds):
        seg = rows.filter(F.col("lsn") < b if lo is None else (F.col("lsn") > lo) & (F.col("lsn") < b))
        segments.append((f"{epoch_id}:{i}", seg, ddl_rows[i]))
        lo = b
    final_seg = rows if lo is None else rows.filter(F.col("lsn") > lo)
    segments.append((str(epoch_id), final_seg, None))

    lineage = {
        "lsn_min": stats["lsn_min"],
        "lsn_max": stats["lsn_max"],
        "n_events": stats["n_events"],
    }
    for seg_key, seg_df, ddl in segments:
        if not table.is_epoch_committed(seg_key):
            source = _dedup_flatten(seg_df, cfg)
            # schema may have evolved mid-epoch: align source to table columns
            tbl_cols = [f["name"] for f in table.snapshot().current_fields()]
            src_cols = set(source.columns)
            aligned = source.select(
                *[
                    (F.col(c) if c in src_cols else F.lit(None).cast(f["type"])).alias(c)
                    for f, c in ((f, f["name"]) for f in table.snapshot().current_fields())
                ],
                "op",
            )
            mr = table.merge(aligned, epoch_id=seg_key, lineage=lineage)
            if mr.applied:
                res.versions.append(mr.version)
        if ddl is not None:
            if apply_ddl_idempotent(table, ddl):
                res.ddls_applied += 1
        res.segments += 1

    res.applied = True
    res.n_rows = stats["n_rows"]

    if metrics_table is not None and not metrics_table.is_epoch_committed(epoch_id):
        wall_ms = int((time.monotonic() - t0) * 1000)
        m = spark.createDataFrame(
            [
                (
                    int(epoch_id),
                    stats["lsn_min"],
                    stats["lsn_max"],
                    stats["n_events"],
                    stats["n_rows"],
                    stats["n_upserts"],
                    stats["n_deletes"],
                    stats["n_ddl"],
                    stats["n_heartbeats"],
                    wall_ms,
                    res.versions[-1] if res.versions else None,
                )
            ],
            "epoch_id long, lsn_min long, lsn_max long, n_events long, n_rows long, "
            "n_upserts long, n_deletes long, n_ddl long, n_heartbeats long, "
            "wall_ms long, snapshot_version long",
        ).withColumn("committed_at", F.current_timestamp()).withColumn("op", F.lit("U"))
        metrics_table.merge(m, epoch_id=epoch_id, lineage=lineage)

    return res
