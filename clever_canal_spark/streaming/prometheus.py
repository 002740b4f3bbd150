"""Prometheus text-exposition rendering of the engine's metrics — the
clever-canal-prometheus module analog (impl/EntryCollector.java:32-33,
impl/StoreCollector.java:33-43, impl/MetaCollector / SinkCollector).

The reference registers per-destination Collectors that a Prometheus
server scrapes over HTTP. This engine keeps metrics as DATA (the
epoch-metrics LakeTable, 1 row per epoch, committed atomically with the
epoch itself — plans/apply._record_metrics) plus the follower's
zero-job ``lag()`` gauge; this module renders both into the standard
`text/plain; version=0.0.4` exposition format so any scrape endpoint
(a 10-line HTTP handler, a node_exporter textfile collector, a
pushgateway upload) can serve them. Rendering is driver-side string
work over O(1) aggregates — the metrics table is epochs-long, not
events-long, so the collect is a few hundred rows at most even after
days of ingest (and callers can pre-filter by epoch range).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# (metric suffix, metrics-table column, help text)
_COUNTERS = [
    ("events_total", "n_events", "change events consumed (EntryCollector analog)"),
    ("rows_total", "n_rows", "row events applied"),
    ("upserts_total", "n_upserts", "I/U events applied"),
    ("deletes_total", "n_deletes", "D events applied"),
    ("ddl_total", "n_ddl", "DDL events applied"),
    ("heartbeats_total", "n_heartbeats", "heartbeat events suppressed"),
    ("apply_wall_ms_total", "wall_ms", "wall-clock spent applying epochs"),
]


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    body = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + body + "}"


def render_metrics(
    metrics_table,
    lag: dict | None = None,
    namespace: str = "ccs",
    labels: dict[str, str] | None = None,
) -> str:
    """One scrape body: cumulative counters + last-epoch gauges from the
    epoch-metrics table, plus the follower ``lag()`` dict when given.
    Counter totals aggregate in ONE Spark job; the last-epoch gauges ride
    the same collect (max_by on epoch_id)."""
    labels = labels or {}
    m = metrics_table.scan()
    aggs = [F.sum(c).alias(c) for _, c, _ in _COUNTERS]
    aggs.append(F.count("*").alias("__n_epochs"))
    aggs.append(F.max("epoch_id").alias("__last_epoch"))
    for c in ("n_events", "wall_ms", "lsn_max", "snapshot_version"):
        aggs.append(F.max_by(F.col(c), F.col("epoch_id")).alias(f"__last_{c}"))
    row = m.agg(*aggs).collect()[0].asDict()

    lab = _fmt_labels(labels)
    out: list[str] = []

    def emit(name: str, help_: str, typ: str, value) -> None:
        out.append(f"# HELP {namespace}_{name} {help_}")
        out.append(f"# TYPE {namespace}_{name} {typ}")
        out.append(f"{namespace}_{name}{lab} {0 if value is None else value}")

    for suffix, col, help_ in _COUNTERS:
        emit(suffix, help_, "counter", row[col])
    emit("epochs_total", "epochs committed (ack'd batches, MetaCollector analog)",
         "counter", row["__n_epochs"])
    emit("last_epoch_id", "most recent committed epoch", "gauge", row["__last_epoch"])
    emit("last_epoch_events", "events in the most recent epoch", "gauge",
         row["__last_n_events"])
    emit("last_epoch_wall_ms", "apply wall of the most recent epoch", "gauge",
         row["__last_wall_ms"])
    emit("applied_lsn", "applied LSN frontier", "gauge", row["__last_lsn_max"])
    emit("snapshot_version", "lake snapshot version", "gauge",
         row["__last_snapshot_version"])

    if lag:
        emit("feed_head_lsn", "feed head LSN (put sequence, StoreCollector analog)",
             "gauge", lag.get("feed_head_lsn"))
        emit("lag_events", "events not yet consumed (put minus ack)",
             "gauge", lag.get("pending_events"))
        emit("pending_files", "feed files not yet bound to an epoch",
             "gauge", lag.get("pending_files"))
    return "\n".join(out) + "\n"
