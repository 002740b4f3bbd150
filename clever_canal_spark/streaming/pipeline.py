"""Streaming shell: readStream → foreachBatch(apply_epoch) with checkpoint.

The Spark restatement of the whole Canal server loop (SURVEY.md §3.1-3.2):

- parser dump loop                 → file-stream source tailing the feed dir
- store put/get + meta cursor      → micro-batch planner + checkpointed
                                     offsets (``checkpointLocation``)
- getWithoutAck(batchId)           → ``foreachBatch(df, epoch_id)``
- ack(batchId)                     → committed-epoch entry written atomically
                                     with the MERGE snapshot
- rollback / crash redelivery      → Spark replays the uncommitted epoch on
                                     restart; apply_epoch is idempotent
- batch sizing ITEM_SIZE           → ``maxFilesPerTrigger`` (slice files are
                                     the feed's rotation unit)
- batch sizing MEM_SIZE            → ``maxBytesPerTrigger`` (byte-bounded
                                     admission; whole files, >= 1 per batch)

Resume-from-checkpoint is lossless: offsets name the exact file set of the
in-flight epoch, and the epoch registry makes the re-apply a no-op if its
MERGE already committed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..lake import LakeTable
from ..plans.apply import ApplyConfig, apply_epoch
from ..sources.feed import read_feed_stream


@dataclass
class CdcPipeline:
    spark: SparkSession
    source_dir: str
    checkpoint_dir: str
    table: LakeTable
    cfg: ApplyConfig
    metrics_table: LakeTable | None = None
    max_files_per_trigger: int | None = 1
    # byte-bounded admission (the MEM_SIZE analog, E2). Setting it takes
    # precedence over the file-count default of 1 — the two units are
    # mutually exclusive on the Spark file source.
    max_bytes_per_trigger: int | None = None
    # changelog rollup view kept in lockstep with the sink: synced after
    # every micro-batch's apply. Crash-safe without extra state: the
    # view's own registry keys syncs by consumed LAKE VERSION, so a
    # replayed epoch (apply no-ops) syncs 0, and a crash between apply
    # and sync is healed by the next batch's sync-to-head. Requires the
    # sink to be MOR-fed (lake/rollup.py module docstring).
    rollup_view: LakeTable | None = None
    # generic derived-state maintenance: callables invoked with the sink
    # table after every micro-batch's apply — the hook the persisted
    # indexes plug into (dedup_index.sync_from_lake, text_index.
    # sync_text_index_from_lake, ann_index.sync_ann_from_lake, each
    # curried over its index; lake.join_view.sync_join_view curried over
    # (view, dimension) — its recompute-based apply is idempotent, so it
    # is hook-safe). Same crash contract as rollup_view: every
    # sync keys its own exactly-once on the consumed lake version, so a
    # replayed micro-batch syncs 0 and a crash between apply and hook is
    # healed by the next batch's sync-to-head. Hooks run in list order,
    # AFTER the rollup sync.
    sync_hooks: tuple = ()
    # sync_hooks under COW are refused by default: a COW merge rewrites
    # every surviving co-bucketed row and scan_changes re-emits them, so
    # any ADDITIVE consumer plugged in as a hook (sync_rollup,
    # sync_hist_view) double-counts cold keys on every hot-bucket commit
    # — the same hazard the rollup_view guard catches, but the generic
    # hook mechanism cannot see which family a callable belongs to. Set
    # True ONLY when every hook is idempotent-by-LWW (the dedup/ANN/text
    # index syncs) or state-diff-based (sync_cms_view) — those tolerate
    # re-emits correctly, just at extra probe cost.
    allow_cow_sync_hooks: bool = False
    # pre-apply batch transform: callable(batch_df) -> batch_df, invoked
    # BEFORE apply_epoch — the admission-gate seam
    # (plans/admission.dedup_admission curried over its index; pair it
    # with the index's sync_from_lake in sync_hooks so epoch N+1's gate
    # sees what epoch N admitted). Must be deterministic for the same
    # input batch: a replayed micro-batch re-gates identically, keeping
    # apply_epoch's idempotence intact.
    admission: object = None
    # running/standby HA (streaming/lease.py, the ClientRunningMonitor
    # analog): when set, start() returns None unless the lease is
    # acquired (standby = start nothing), and every micro-batch renews
    # the heartbeat FIRST — a fenced ex-leader raises LeadershipLost,
    # failing the query before it applies anything further (the aborted
    # batch replays idempotently under the new leader)
    lease: object = None

    def __post_init__(self):
        if self.cfg.merge_mode != "mor":
            if self.rollup_view is not None:
                raise ValueError(
                    "rollup_view requires merge_mode='mor' (COW commits re-emit "
                    "surviving co-bucketed rows in scan_changes, inflating the "
                    "rollup's additive counts)"
                )
            if self.sync_hooks and not self.allow_cow_sync_hooks:
                raise ValueError(
                    "sync_hooks under merge_mode='cow' double-count in any "
                    "additive consumer (rollup/hist views) — use 'mor', or "
                    "pass allow_cow_sync_hooks=True if every hook is "
                    "LWW-idempotent or state-diff-based (index syncs, CMS view)"
                )

    def start(self, available_now: bool = True, processing_time: str | None = None):
        """Start the streaming query. ``available_now=True`` drains what is
        currently in the source then stops (deterministic for tests/bench);
        a production tail uses ``processing_time``."""
        if self.lease is not None:
            got = (
                self.lease.renew() if self.lease.is_leader
                else self.lease.try_acquire()
            )
            if not got:
                return None  # standby: start nothing
        stream = read_feed_stream(
            self.spark,
            self.source_dir,
            None if self.max_bytes_per_trigger else self.max_files_per_trigger,
            self.max_bytes_per_trigger,
        )

        def _apply(batch_df, epoch_id: int):
            if self.lease is not None and not self.lease.renew():
                from .lease import LeadershipLost

                raise LeadershipLost(
                    f"lease {self.lease.path}: superseded — stopping"
                )
            if self.admission is not None:
                batch_df = self.admission(batch_df)
            apply_epoch(
                batch_df.sparkSession,
                batch_df,
                epoch_id,
                self.table,
                self.cfg,
                metrics_table=self.metrics_table,
            )
            if self.rollup_view is not None:
                from ..lake import sync_rollup

                sync_rollup(self.rollup_view, self.table)
            for hook in self.sync_hooks:
                hook(self.table)

        w = stream.writeStream.foreachBatch(_apply).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            w = w.trigger(availableNow=True)
        elif processing_time:
            w = w.trigger(processingTime=processing_time)
        return w.start()

    def run_until_drained(self) -> None:
        q = self.start(available_now=True)
        if q is None:
            return  # standby
        q.awaitTermination()


def run_available(pipeline: CdcPipeline) -> None:
    """Drain everything currently in the source directory and stop."""
    pipeline.run_until_drained()
