"""Multi-table routing: one change-event batch → N destination tables.

The reference routes events to per-table destinations in its MQ sink
(dynamicTopic / FlatMessage-per-table, CanalMQProducer partitioning by
schema.table) and its embedded sink filters per instance. Here a single
epoch's batch fans out to any number of destination LakeTables, each
selected by the Canal name filter, each with its OWN exactly-once epoch
registry — a crash between two destinations' commits replays the epoch
and only the uncommitted destinations re-apply (idempotent per table).

Scale shape: each destination applies through the normal ``apply_epoch``
plan, so its scan carries a pushable ``schema.table`` predicate — at the
parquet reader this prunes row groups by the ``table_name`` column's
statistics, and everything downstream (dedup, transform, write) sees only
that table's rows. N destinations = N pruned scans of the same files, not
N full materializations (deliberately NOT a cached single scan: a cached
2 GB batch would pin executor memory, while pruned re-scans stay
streaming and let Catalyst specialize each destination's plan).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

from ..filters import EventFilterConfig
from ..lake import LakeTable
from .apply import ApplyConfig, ApplyResult, BatchHints, apply_epoch


@dataclass
class Route:
    """One destination: a Canal-style name pattern (e.g. ``cc\\.pages``)
    and the LakeTable it feeds. ``cfg`` overrides the shared ApplyConfig
    (its table whitelist is forced to this route's pattern)."""

    pattern: str
    table: LakeTable
    metrics_table: LakeTable | None = None
    cfg: ApplyConfig | None = None


def route_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    routes: list[Route],
    cfg: ApplyConfig | None = None,
    hints: BatchHints | None = None,
) -> dict[str, ApplyResult]:
    """Apply one micro-batch to every route's destination, exactly once
    per destination. Returns {pattern: ApplyResult}."""
    base = cfg or ApplyConfig()
    out: dict[str, ApplyResult] = {}
    for r in routes:
        rcfg = r.cfg or base
        rcfg = replace(
            rcfg,
            filters=replace(rcfg.filters, table_whitelist=r.pattern, table_blacklist=""),
        )
        # Per-destination hints: only PROOFS that stay true for a slice of
        # the batch survive routing. ``ddl_possible=False`` (no DDL row in
        # the whole batch → none in any slice) and ``n_events == 0`` (empty
        # batch → every slice empty) carry over; the batch-wide event COUNT
        # and LSN bounds do not — forwarding a non-zero n_events once sent a
        # route whose filter matched nothing down the fast path believing it
        # had rows, and the un-run Observation crashed at lineage time.
        rhints = None
        if hints is not None:
            rhints = BatchHints(
                n_events=0 if hints.n_events == 0 else None,
                ddl_possible=hints.ddl_possible,
            )
        out[r.pattern] = apply_epoch(
            spark, batch_df, epoch_id, r.table, rcfg,
            metrics_table=r.metrics_table, hints=rhints,
        )
    return out
