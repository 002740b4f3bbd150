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

import os
import time
from dataclasses import dataclass, field as dc_field

_TIMING = os.environ.get("CCS_TIMING", "") == "1"


def _tlog(msg: str, t0: float) -> float:
    if _TIMING:
        print(f"[apply {msg}: {time.monotonic() - t0:.2f}s]", flush=True)
    return time.monotonic()

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..filters import EventFilterConfig, apply_event_filters, project_fields
from ..functions.transforms import with_page_transforms
from ..lake import LakeTable
from ..model import KIND_DDL, KIND_HEARTBEAT, KIND_ROW, PAGE_KEY
from ..operators.lww import lww_dedup, salted_lww_dedup
from .ddl import apply_ddl_idempotent


@dataclass
class BatchHints:
    """Driver-side facts about an epoch's input, gathered from parquet
    footers by the follower (zero Spark jobs — file metadata only).

    ``ddl_possible=False`` is a *proof* (from the ``kind`` column's
    row-group statistics) that no DDL row exists in the epoch, which lets
    ``apply_epoch`` skip the up-front stats/DDL-collect job entirely and
    ride the epoch stats on the merge write via ``DataFrame.observe``.
    ``None`` means unknown → the conservative path runs."""

    n_events: int | None = None
    lsn_min: int | None = None
    lsn_max: int | None = None
    ddl_possible: bool | None = None


@dataclass
class ApplyConfig:
    filters: EventFilterConfig = dc_field(default_factory=EventFilterConfig)
    # LWW dedup strategy:
    # - "winner_join": shuffle only (key, lsn) pairs, then broadcast-semi-join
    #   the winning LSNs back — the payload (KBs of html) never rides the
    #   dedup shuffle. Best when winners-per-epoch fit a broadcast (≤ ~10M).
    # - "max_by": single-pass hash agg carrying the payload struct; use
    #   (optionally salted) when the winner set is too large to broadcast.
    # - "defer" (mor only): no pre-merge dedup at all — every event appends
    #   as a delta row and the MOR scan/compaction LWW settles winners.
    #   The epoch becomes ONE fully-parallel job (scan→transform→write, no
    #   agg barrier, no broadcast build) at the cost of writing losers too;
    #   best for wide clusters / low-duplication feeds.
    dedup_strategy: str = "winner_join"
    salted: bool = False  # salting for the max_by strategy's payload shuffle
    n_salts: int = 16
    # winner_join builds a broadcast of one (key, lsn) row per distinct key
    # in the epoch; past this many row events the epoch auto-falls-back to
    # salted max_by (no silent driver/executor OOM cliff on a 100x epoch)
    broadcast_winner_limit: int = 5_000_000
    transform: bool = True
    project: bool = False
    # "cow" rewrites touched buckets per epoch; "mor" appends delta files
    # (O(batch) apply — the sustained-ingest path) with auto-compaction
    merge_mode: str = "cow"
    compact_every: int = 24


@dataclass
class ApplyResult:
    epoch_id: int
    applied: bool
    segments: int = 0
    ddls_applied: int = 0
    n_rows: int = 0
    versions: list[int] = dc_field(default_factory=list)


def _effective_strategy(cfg: ApplyConfig, n_row_events: int | None) -> tuple[str, bool]:
    """(strategy, salted): winner_join degrades to salted max_by when the
    epoch's row-event count (an upper bound on distinct winners) exceeds
    the broadcast limit — the plan then contains NO BroadcastHashJoin."""
    if (
        cfg.dedup_strategy == "winner_join"
        and n_row_events is not None
        and n_row_events > cfg.broadcast_winner_limit
    ):
        return "max_by", True
    return cfg.dedup_strategy, cfg.salted


def _keyed(rows: DataFrame) -> DataFrame:
    # before-image is only needed to key deletes — extract the key, then
    # drop it so the dedup shuffle carries one payload struct, not two
    return rows.select(
        F.coalesce(F.col("after.url"), F.col("before.url")).alias("url"),
        F.coalesce(F.col("after.warc_ts"), F.col("before.warc_ts")).alias("warc_ts"),
        "lsn",
        "op",
        "after",
    )


def _dedup_flatten(
    rows: DataFrame,
    cfg: ApplyConfig,
    strategy: str | None = None,
    salted: bool | None = None,
    wins_source: DataFrame | None = None,
) -> DataFrame:
    """Row events → one winner per key, flattened to merge-source shape
    (url, warc_ts, html, text, lang, op, lsn).

    ``wins_source``: an un-instrumented twin of ``rows`` for the
    winner-join's broadcast-build branch — when ``rows`` carries a
    ``DataFrame.observe`` node, the build job must not execute it (one
    observation, one update)."""
    strategy = strategy if strategy is not None else cfg.dedup_strategy
    salted = salted if salted is not None else cfg.salted
    keyed = _keyed(rows)
    if strategy == "defer":
        dedup = keyed  # MOR reconcile is the dedup (guarded in apply_epoch)
    elif strategy == "winner_join":
        # tiny (key,lsn) shuffle decides winners; broadcast semi-join on
        # key+lsn picks their full rows — payload bytes never shuffle.
        # Join keys include the PAGE_KEY: lsn alone would rely on global
        # LSN uniqueness across keys (one event carrying several rowdata
        # entries shares one binlog offset in the reference model).
        wins = _keyed(wins_source if wins_source is not None else rows).groupBy(
            *PAGE_KEY
        ).agg(F.max("lsn").alias("lsn"))
        dedup = keyed.join(F.broadcast(wins), on=[*PAGE_KEY, "lsn"], how="left_semi")
    elif salted:
        dedup = salted_lww_dedup(keyed, PAGE_KEY, n_salts=cfg.n_salts)
    else:
        dedup = lww_dedup(keyed, PAGE_KEY)
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


def _stat_aggs() -> list:
    """The epoch-stats aggregate expressions (built lazily — Columns need
    an active session); identical whether collected up-front (slow path)
    or observed on the merge write (fast path)."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.min("lsn").alias("lsn_min"),
        F.max("lsn").alias("lsn_max"),
        F.sum((F.col("kind") == KIND_ROW).cast("long")).alias("n_rows"),
        F.sum(((F.col("kind") == KIND_ROW) & (F.col("op") != "D")).cast("long")).alias("n_upserts"),
        F.sum(((F.col("kind") == KIND_ROW) & (F.col("op") == "D")).cast("long")).alias("n_deletes"),
        F.sum((F.col("kind") == KIND_DDL).cast("long")).alias("n_ddl"),
        F.sum((F.col("kind") == KIND_HEARTBEAT).cast("long")).alias("n_heartbeats"),
    ]


def _align_to_table(source: DataFrame, table: LakeTable) -> DataFrame:
    """Project the merge source to the table's current columns (schema may
    have evolved since the feed slice was written)."""
    src_cols = set(source.columns)
    return source.select(
        *[
            (F.col(f["name"]) if f["name"] in src_cols
             else F.lit(None).cast(f["type"])).alias(f["name"])
            for f in table.snapshot().current_fields()
        ],
        "op",
        "lsn",
    )


_EMPTY_STATS = {
    "n_events": 0, "lsn_min": None, "lsn_max": None, "n_rows": 0,
    "n_upserts": 0, "n_deletes": 0, "n_ddl": 0, "n_heartbeats": 0,
}


def _resolve_obs(obs: Observation) -> dict:
    """Resolve a ``DataFrame.observe`` after the write job. When the write
    plan collapsed to zero tasks (a filter — e.g. a route's table whitelist
    — left the epoch empty, so AQE pruned the scan away), the CollectMetrics
    node never executed and ``Observation.get`` raises in the JVM; that case
    IS the empty epoch, so report zero stats instead of crashing."""
    try:
        return dict(obs.get)
    except Exception:
        return dict(_EMPTY_STATS)


def _apply_fast(
    filtered: DataFrame,
    epoch_id: int,
    table: LakeTable,
    cfg: ApplyConfig,
    metrics_table: LakeTable | None,
    hints: BatchHints,
    res: ApplyResult,
    t0: float,
) -> ApplyResult:
    """DDL-free epoch (proven by footer hints): ONE full pass over the
    input — epoch stats ride the merge write via ``DataFrame.observe``
    (CollectMetrics node, zero extra jobs), lineage resolves from the
    observation between the data write and the atomic snapshot commit."""
    obs = Observation()
    observed = filtered.observe(obs, *_stat_aggs())
    rows = observed.filter(F.col("kind") == F.lit(KIND_ROW))
    rows_plain = filtered.filter(F.col("kind") == F.lit(KIND_ROW))
    strategy, salted = _effective_strategy(cfg, hints.n_events)
    source = _dedup_flatten(rows, cfg, strategy=strategy, salted=salted, wins_source=rows_plain)
    aligned = _align_to_table(source, table)
    # NB both stamps measure from epoch start: "plan-build" = driver time
    # before the merge call, "fast total" = the whole epoch (inclusive)
    _tlog(f"e{epoch_id} plan-build", t0)
    t_merge = time.monotonic()
    plan_ms = int((t_merge - t0) * 1000)
    mr = table.merge(
        aligned,
        epoch_id=epoch_id,
        lineage=lambda: {
            k: _resolve_obs(obs)[k] for k in ("lsn_min", "lsn_max", "n_events")
        },
        mode="mor",
        lsn_col="lsn",
        compact_every=cfg.compact_every,
    )
    merge_ms = int((time.monotonic() - t_merge) * 1000)
    _tlog(f"e{epoch_id} fast total", t0)
    res.applied = True
    res.segments = 1
    if mr.applied:
        res.versions.append(mr.version)
        stats = _resolve_obs(obs)
        res.n_rows = stats["n_rows"] or 0
        _record_metrics(
            metrics_table, epoch_id, stats, t0, mr.version,
            stages={"plan_ms": plan_ms, "merge_ms": merge_ms},
        )
    return res


def apply_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    table: LakeTable,
    cfg: ApplyConfig | None = None,
    metrics_table: LakeTable | None = None,
    hints: BatchHints | None = None,
) -> ApplyResult:
    """Apply one micro-batch exactly once. Safe to call again with the same
    ``epoch_id`` + data (replay after crash): already-committed segments and
    DDLs no-op."""
    cfg = cfg or ApplyConfig()
    if cfg.dedup_strategy == "defer" and cfg.merge_mode != "mor":
        raise ValueError(
            "dedup_strategy='defer' requires merge_mode='mor' (COW merge has "
            "the one-source-row-per-key cardinality rule)"
        )
    t0 = time.monotonic()
    res = ApplyResult(epoch_id=epoch_id, applied=False)

    if table.is_epoch_committed(epoch_id):
        return res

    filtered = apply_event_filters(batch_df, cfg.filters)
    if cfg.project:
        filtered = project_fields(filtered, cfg.filters)

    if hints is not None and hints.n_events == 0:
        table.commit_epoch_marker(epoch_id, {"lsn_min": None, "lsn_max": None, "n_events": 0})
        res.applied = True
        return res
    if hints is not None and hints.ddl_possible is False and cfg.merge_mode == "mor":
        return _apply_fast(filtered, epoch_id, table, cfg, metrics_table, hints, res, t0)

    # One aggregation job collects batch stats; DDL rows are few by
    # construction (store isolates them — E3), so collecting them is O(DDLs).
    stats = filtered.agg(*_stat_aggs()).collect()[0]
    tp = _tlog(f"e{epoch_id} stats", t0)

    ddl_rows = []
    if stats["n_ddl"]:
        ddl_rows = sorted(
            (r.asDict() for r in filtered.filter(F.col("kind") == KIND_DDL).collect()),
            key=lambda r: r["lsn"],
        )
    rows = filtered.filter(F.col("kind") == F.lit(KIND_ROW))

    lineage0 = {
        "lsn_min": stats["lsn_min"],
        "lsn_max": stats["lsn_max"],
        "n_events": stats["n_events"],
    }
    if stats["n_rows"] == 0 and not ddl_rows:
        # heartbeat/empty epoch: positions advance, no data work
        # (EntryEventSink empty-transaction passthrough analog)
        table.commit_epoch_marker(epoch_id, lineage0)
        res.applied = True
        _record_metrics(metrics_table, epoch_id, stats, t0, None)
        return res

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

    strategy, salted = _effective_strategy(cfg, stats["n_rows"])
    lineage = lineage0
    for seg_key, seg_df, ddl in segments:
        if not table.is_epoch_committed(seg_key):
            source = _dedup_flatten(seg_df, cfg, strategy=strategy, salted=salted)
            # schema may have evolved mid-epoch: align source to table columns
            aligned = _align_to_table(source, table)
            mr = table.merge(
                aligned, epoch_id=seg_key, lineage=lineage,
                mode=cfg.merge_mode, lsn_col="lsn",
                compact_every=cfg.compact_every,
            )
            tp = _tlog(f"e{epoch_id} seg {seg_key} merge", tp)
            if mr.applied:
                res.versions.append(mr.version)
        if ddl is not None:
            if apply_ddl_idempotent(table, ddl):
                res.ddls_applied += 1
        res.segments += 1

    res.applied = True
    res.n_rows = stats["n_rows"]

    _record_metrics(
        metrics_table, epoch_id, stats, t0, res.versions[-1] if res.versions else None
    )
    return res


def bootstrap_epoch(
    table: LakeTable,
    snapshot_df: DataFrame,
    as_of_lsn: int,
    epoch_id: str = "bootstrap",
) -> ApplyResult:
    """Initial load (snapshot-then-tail): seed the table from a full-table
    snapshot consistent as of ``as_of_lsn``, exactly once.

    The Debezium/Canal bootstrap problem (the reference assumes a dump
    taken at a binlog position, MysqlConnection.java dump+position): every
    snapshot row enters at ``__lsn = as_of_lsn``, so the LWW reconcile
    gives the correct overlap semantics for the subsequent CDC tail —
    change events at lsn ≤ as_of_lsn (already reflected in the snapshot)
    LOSE to the seeded rows; events after it win. The feed can therefore
    be replayed from any position at-or-before the snapshot without
    double-apply, and the whole bootstrap is one idempotent epoch (crash
    → rerun → no-op)."""
    res = ApplyResult(epoch_id=epoch_id, applied=False)
    if table.is_epoch_committed(epoch_id):
        return res
    cols = [f["name"] for f in table.snapshot().current_fields()]
    src = snapshot_df.select(
        *cols,
        F.lit("I").alias("op"),
        F.lit(as_of_lsn).cast("long").alias("lsn"),
    )
    mr = table.merge(
        src,
        epoch_id=epoch_id,
        lineage={"lsn_min": as_of_lsn, "lsn_max": as_of_lsn, "bootstrap": True},
        mode="mor",
        lsn_col="lsn",
        compact_every=0,
    )
    res.applied = True
    if mr.applied:
        res.versions.append(mr.version)
    return res


def bootstrap_in_chunks(
    table: LakeTable,
    snapshot_df: DataFrame,
    as_of_lsn: int,
    n_chunks: int = 16,
    prefix: str = "bootstrap",
    only_chunks=None,
) -> dict:
    """Chunked, resumable initial load — the DBLog / Debezium
    incremental-snapshot shape: the backfill lands as ``n_chunks``
    independent epochs (deterministic key-hash slices), each exactly-once
    via the table's epoch registry, so a crash resumes at the next
    uncommitted chunk with zero replayed work and no oversized single
    commit.

    The live CDC tail may run CONCURRENTLY, interleaved anywhere between
    chunks, with no watermark protocol: every seed row enters at
    ``__lsn = as_of_lsn``, so a tail event that already updated or
    deleted a not-yet-seeded key simply WINS the LWW reconcile when its
    chunk arrives late (DBLog needs its high/low-watermark window
    because its sink lacks ordered reconciliation; an LSN-ordered merge
    makes overlap commutative by construction).

    ``only_chunks`` restricts one call to a subset — a backfill can be
    sharded across workers (each owns a chunk range) or deliberately
    interleaved with tail epochs; the registry keeps every schedule
    exactly-once.

    Scale note: the chunk predicate is a key-hash, which does not prune
    a flat snapshot scan — each chunk re-scans the dump (column-pruned
    to the table's fields). Point ``snapshot_df`` at a bucketed/
    partitioned dump if n_chunks × scan matters; chunking buys bounded
    per-commit memory/files and resumability, not scan savings."""
    if n_chunks < 1:
        raise ValueError("n_chunks must be >= 1")
    keys = list(table.snapshot().merge_key)
    applied, skipped, epoch_ids = 0, 0, []
    todo = range(n_chunks) if only_chunks is None else only_chunks
    for i in todo:
        if not (0 <= i < n_chunks):
            raise ValueError(f"chunk {i} outside [0, {n_chunks})")
        eid = f"{prefix}.{i:05d}of{n_chunks}"
        epoch_ids.append(eid)
        if table.is_epoch_committed(eid):
            skipped += 1
            continue
        chunk = snapshot_df.filter(
            F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_chunks)) == i
        )
        bootstrap_epoch(table, chunk, as_of_lsn, epoch_id=eid)
        applied += 1
    return {
        "n_chunks": n_chunks,
        "applied": applied,
        "skipped": skipped,
        "epoch_ids": epoch_ids,
    }


def _record_metrics(
    metrics_table, epoch_id, stats, t0, snapshot_version, stages: dict | None = None
) -> None:
    """One lineage row per epoch — driver-side pyarrow append (zero Spark
    jobs), idempotent via the metrics table's own epoch registry."""
    if metrics_table is None:
        return
    from datetime import datetime, timezone

    metrics_table.append_pylist(
        [
            {
                "epoch_id": int(epoch_id),
                **(stages or {}),
                "lsn_min": stats["lsn_min"],
                "lsn_max": stats["lsn_max"],
                "n_events": stats["n_events"],
                "n_rows": stats["n_rows"],
                "n_upserts": stats["n_upserts"],
                "n_deletes": stats["n_deletes"],
                "n_ddl": stats["n_ddl"],
                "n_heartbeats": stats["n_heartbeats"],
                "wall_ms": int((time.monotonic() - t0) * 1000),
                "snapshot_version": snapshot_version,
                "committed_at": datetime.now(timezone.utc),
            }
        ],
        epoch_id=epoch_id,
    )
