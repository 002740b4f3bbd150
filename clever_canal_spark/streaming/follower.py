"""FeedFollower — native micro-batch tail of a feed directory.

The reference tails rotating binlog files with its own position manager
(BinLogFileQueue.java:1-237 file rotation; FileMixedMetaManager.java:35-299
cursor persistence). This follower is the direct Spark analog — and it
exists for a hard performance reason: Structured Streaming's
``foreachBatch`` hands the micro-batch over as a ``Scan ExistingRDD``
(opaque pre-planned rows), so every action re-materializes ALL columns of
the whole batch — no column pruning, no predicate pushdown. Reading the
epoch's files with ``spark.read.parquet`` instead keeps the full Catalyst
path (pruned scans per action: the stats pass reads 3 columns, not 4 KB
html blobs).

Exactly-once across crashes:

1. the epoch→file-set binding is persisted BEFORE applying
   (``epoch-{id}.json``, exclusive create — replay sees the same set);
2. ``apply_epoch`` is idempotent per epoch (lake epoch registry);
3. restart re-applies only epochs whose merge never committed.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..lake import LakeTable
from ..model import CHANGE_EVENT_SCHEMA
from ..plans.apply import ApplyConfig, ApplyResult, BatchHints, apply_epoch


def footer_hints(files: list[str]) -> BatchHints:
    """Epoch facts from parquet footers — no Spark job, O(#files) driver
    work (the binlog-index analog: the reference's parser knows event
    positions before fetching bodies, LogFetcher/BinLogFileQueue).

    ``ddl_possible=False`` requires every row group to carry ``kind``
    column statistics proving min > 'DDL' (kind ∈ {DDL, HEARTBEAT, ROW},
    so a DDL row forces the row-group min to exactly 'DDL'). Missing stats
    → unknown (None) → the caller takes the conservative path."""
    import pyarrow.parquet as pq

    n_events = 0
    lsn_min: int | None = None
    lsn_max: int | None = None
    ddl_possible = False
    for path in files:
        md = pq.ParquetFile(path).metadata
        n_events += md.num_rows
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
        kind_i, lsn_i = idx.get("kind"), idx.get("lsn")
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            if rgm.num_rows == 0:
                continue
            kst = rgm.column(kind_i).statistics if kind_i is not None else None
            if kst is None or not kst.has_min_max:
                ddl_possible = None  # unproven — conservative path
            elif ddl_possible is not None and kst.min <= "DDL":
                ddl_possible = True
            lst = rgm.column(lsn_i).statistics if lsn_i is not None else None
            if lst is not None and lst.has_min_max:
                lsn_min = lst.min if lsn_min is None else min(lsn_min, lst.min)
                lsn_max = lst.max if lsn_max is None else max(lsn_max, lst.max)
    return BatchHints(
        n_events=n_events, lsn_min=lsn_min, lsn_max=lsn_max, ddl_possible=ddl_possible
    )


@dataclass
class FeedFollower:
    """``source_dir`` may be one directory or a list — the multi-shard
    group-sink analog (GroupEventSink.java:26-76): N upstream feeds merge
    into one apply. The reference gates shards with a min-timestamp
    barrier (TimelineBarrier.java:27-141); here no barrier is needed —
    LWW by LSN is order-insensitive, so shard interleaving across epochs
    cannot change the final state (SURVEY.md §4, documented improvement).

    That no-barrier claim leans on two lake invariants (both tested in
    ``tests/test_lake.py``): (1) ``merge`` reconciles by LSN against the
    target's current winner in BOTH modes — a lagging shard's lower-LSN
    event in a later epoch loses to the stored row; (2) delete winners
    persist as tombstones through COW rewrites and compaction, so a late
    lower-LSN upsert cannot resurrect a deleted key. Only
    ``compact(purge_tombstones_below=...)`` may drop tombstones, and its
    watermark must stay below every shard's delivery frontier.
    """

    spark: SparkSession
    source_dir: str | list[str]
    checkpoint_dir: str
    table: LakeTable
    cfg: ApplyConfig
    metrics_table: LakeTable | None = None
    max_files_per_epoch: int = 16
    # bytes-mode epoch admission (the reference's BatchMode.MEM_SIZE,
    # BatchMode.java:11-23, MemoryEventStoreWithBuffer.java:404-424): an
    # epoch closes at whichever bound trips first — file count or byte
    # budget — so skewed feed-file sizes can't produce skewed epochs.
    # None = file-count only.
    max_bytes_per_epoch: int | None = None

    def _epoch_log(self) -> list[tuple[int, list[str]]]:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        out = []
        for name in sorted(os.listdir(self.checkpoint_dir)):
            if name.startswith("epoch-") and name.endswith(".json"):
                with open(os.path.join(self.checkpoint_dir, name)) as fh:
                    meta = json.load(fh)
                out.append((meta["epoch_id"], meta["files"]))
        return out

    def _bind_epoch(self, epoch_id: int, files: list[str]) -> list[str]:
        """Persist the epoch→files binding (exclusive create; on replay the
        existing binding wins so the epoch is byte-identical)."""
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.checkpoint_dir, f"epoch-{epoch_id:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            with open(path) as fh:
                return json.load(fh)["files"]
        with os.fdopen(fd, "w") as fh:
            json.dump({"epoch_id": epoch_id, "files": files}, fh)
        return files

    def _apply(self, epoch_id: int, files: list[str]) -> ApplyResult:
        import os as _os, time as _time
        _t0 = _time.monotonic()
        hints = footer_hints(files)
        if _os.environ.get("CCS_TIMING") == "1":
            print(f"[follower e{epoch_id} hints({len(files)}f): {_time.monotonic() - _t0:.2f}s]",
                  flush=True)
        batch = self.spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(*files)
        return apply_epoch(
            self.spark, batch, epoch_id, self.table, self.cfg,
            metrics_table=self.metrics_table,
            hints=hints,
        )

    def _cut_epochs(self, fresh: list[str]) -> list[list[str]]:
        """Greedy epoch admission: close the epoch at max_files or (if
        configured) max_bytes, whichever trips first. A single over-budget
        file still forms its own epoch (progress guarantee)."""
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for p in fresh:
            sz = os.path.getsize(p) if self.max_bytes_per_epoch is not None else 0
            over_bytes = (
                self.max_bytes_per_epoch is not None
                and cur
                and cur_bytes + sz > self.max_bytes_per_epoch
            )
            if cur and (len(cur) >= self.max_files_per_epoch or over_bytes):
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(p)
            cur_bytes += sz
        if cur:
            groups.append(cur)
        return groups

    def _epoch_committed(self, epoch_id: int) -> bool:
        """Crash-recovery check; RoutedFeedFollower overrides (an epoch is
        done only when EVERY destination committed it)."""
        return self.table.is_epoch_committed(epoch_id)

    def run_available(self) -> list[ApplyResult]:
        """Drain everything currently in the source dir: finish any bound
        but uncommitted epoch (crash recovery), then consume new files in
        name order (binlog rotation order)."""
        results = []
        log = self._epoch_log()
        consumed: set[str] = set()
        next_epoch = 0
        for epoch_id, files in log:
            consumed.update(files)
            next_epoch = max(next_epoch, epoch_id + 1)
            if not self._epoch_committed(epoch_id):
                results.append(self._apply(epoch_id, files))

        dirs = [self.source_dir] if isinstance(self.source_dir, str) else list(self.source_dir)
        candidates = [
            os.path.join(d, f)
            for d in dirs
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]
        # rotation order within a shard = name order; shards interleave by
        # basename (stable, deterministic) — LWW makes the choice benign
        fresh = sorted(
            (p for p in candidates if p not in consumed),
            key=lambda p: (os.path.basename(p), p),
        )
        for group in self._cut_epochs(fresh):
            epoch_id = next_epoch
            next_epoch += 1
            bound = self._bind_epoch(epoch_id, group)
            results.append(self._apply(epoch_id, bound))
        return results

    def _list_feed_files(self) -> list[str]:
        dirs = [self.source_dir] if isinstance(self.source_dir, str) else list(self.source_dir)
        return [
            os.path.join(d, f)
            for d in dirs
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]

    def lag(self) -> dict:
        """Consumer lag vs the feed head — driver-side footer arithmetic,
        zero Spark jobs (the StoreCollector/prometheus gauge analog:
        put-sequence minus ack-sequence, StoreCollector.java:33-43).

        Returns feed head LSN, applied LSN frontier (max lsn_max across
        committed-epoch lineage), events-not-yet-consumed, and file counts.
        """
        consumed: set[str] = set()
        for _, files in self._epoch_log():
            consumed.update(files)
        all_files = self._list_feed_files()
        pending = [p for p in all_files if p not in consumed]
        pending_hints = footer_hints(pending) if pending else BatchHints(n_events=0)
        head_hints = footer_hints(all_files) if all_files else BatchHints(n_events=0)
        snap = self.table.snapshot()
        applied = [
            lin.get("lsn_max")
            for lin in snap.committed_epochs.values()
            if isinstance(lin, dict) and lin.get("lsn_max") is not None
        ]
        # epochs pruned into the registry watermark keep their frontier
        # in one preserved scalar (lake/table.py _prune_epoch_registry)
        if snap.epoch_watermark_lsn_max is not None:
            applied.append(snap.epoch_watermark_lsn_max)
        return {
            "feed_head_lsn": head_hints.lsn_max,
            "applied_lsn_max": max(applied) if applied else None,
            "pending_events": pending_hints.n_events,
            "pending_files": len(pending),
            "total_files": len(all_files),
        }


@dataclass
class RoutedFeedFollower(FeedFollower):
    """FeedFollower fanning each epoch to N destination tables via
    ``plans.route_epoch`` (the MQ-sink per-table routing analog). Epoch
    bookkeeping (file binding, cut, rotation order) is inherited; an
    epoch counts as committed only when EVERY destination's registry has
    it, so a crash between two destinations' commits replays the epoch
    and only the uncommitted destinations re-apply. ``table`` may be
    passed as None — it defaults to the first route's table (used only
    for the base class's field slot)."""

    routes: list | None = None

    def __post_init__(self):
        if not self.routes:
            raise ValueError("RoutedFeedFollower requires routes")
        if self.table is None:
            self.table = self.routes[0].table

    def _epoch_committed(self, epoch_id: int) -> bool:
        return all(r.table.is_epoch_committed(epoch_id) for r in self.routes)

    def _apply(self, epoch_id: int, files: list[str]):
        from ..plans.route import route_epoch

        hints = footer_hints(files)
        batch = self.spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(*files)
        return route_epoch(
            self.spark, batch, epoch_id, self.routes, self.cfg, hints=hints
        )


def throughput_view(metrics_table: LakeTable):
    """Per-epoch + cumulative throughput from the epoch-metrics table (the
    prometheus EntryCollector/StoreCollector rates as a DataFrame): epoch
    events/sec, rows/sec, and the running sustained rate."""
    from pyspark.sql import Window, functions as F

    m = metrics_table.scan()
    w = Window.orderBy("epoch_id").rowsBetween(Window.unboundedPreceding, 0)
    return m.select(
        "epoch_id", "n_events", "n_rows", "wall_ms", "lsn_min", "lsn_max",
        (F.col("n_events") / (F.col("wall_ms") / 1000.0)).alias("events_per_sec"),
        (F.col("n_rows") / (F.col("wall_ms") / 1000.0)).alias("rows_per_sec"),
        (F.sum("n_events").over(w) / (F.sum("wall_ms").over(w) / 1000.0)).alias(
            "cum_events_per_sec"
        ),
    )
