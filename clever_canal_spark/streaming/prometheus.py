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

import re

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


def _esc(v) -> str:
    """Prometheus label-value escaping (exposition format: backslash,
    double-quote, newline). Group values come from DATA (urls), so this
    is not optional hygiene."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    body = ",".join(f'{k}="{_esc(v)}"' for k, v in sorted(labels.items()))
    return "{" + body + "}"


def _emit(out: list, namespace: str, name: str, help_: str, typ: str, samples) -> None:
    """One metric family in exposition order: HELP, TYPE, then one sample
    line per (labels, value) pair. None values render 0 — every renderer
    shares this rule (a literal 'None' is not a valid exposition float).
    The single copy of the format keeps the three renderers from
    drifting."""
    out.append(f"# HELP {namespace}_{name} {help_}")
    out.append(f"# TYPE {namespace}_{name} {typ}")
    for labels, value in samples:
        out.append(
            f"{namespace}_{name}{_fmt_labels(labels)} {0 if value is None else value}"
        )


def _group_label(view, labels: dict) -> "tuple[str, str]":
    """(group column, exposition label name) for a per-group view, with
    the static-label collision check every per-group renderer needs."""
    gcol = view.snapshot().merge_key[0]
    lname = gcol if _LABEL_NAME_OK.match(gcol) else "key"
    if lname in labels:
        raise ValueError(
            f"static label {lname!r} collides with the per-group label "
            "(the view's group column) — rename the static label"
        )
    return gcol, lname


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

    out: list[str] = []

    def emit(name: str, help_: str, typ: str, value) -> None:
        _emit(out, namespace, name, help_, typ, [(labels, value)])

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


# (hotkey metric suffix, rollup column, help text)
_HOTKEY_GAUGES = [
    ("hotkey_changes", "n_changes", "changelog rows seen for a hot group"),
    ("hotkey_deletes", "n_deletes", "delete rows seen for a hot group"),
    ("hotkey_last_lsn", "last_lsn", "write frontier of a hot group"),
]

_LABEL_NAME_OK = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def render_hotkey_metrics(
    view,
    top_k: int = 10,
    namespace: str = "ccs",
    labels: dict[str, str] | None = None,
) -> str:
    """Per-hot-group gauges from a changelog rollup view
    (:func:`~clever_canal_spark.lake.create_rollup`) — the reference's
    per-destination Collector family analog (impl/SinkCollector /
    EntryCollector register one child per destination; here one sample
    per hot group), and the observable half of the hot-key-salting loop:
    the same view ``hot_groups`` feeds back into ``ApplyConfig(salted=…)``
    is what a dashboard scrapes to see WHICH keys are hot.

    Cost shape: ONE TakeOrdered job over the (group, aggregates)
    projection — the rollup view is O(#distinct groups), never O(events),
    and parquet column pruning keeps the scan to the four aggregate
    columns. The consumed-version gauge rides the view's snapshot
    registry (zero jobs). No full count(*) is emitted on purpose: a
    per-scrape full-view aggregate would grow with the key space.
    """
    from ..lake.rollup import rollup_cursor

    labels = labels or {}
    group_col, label_name = _group_label(view, labels)
    rows = (
        view.scan()
        .select(group_col, *[c for _, c, _ in _HOTKEY_GAUGES])
        .orderBy(F.col("n_changes").desc(), F.col(group_col))
        .limit(top_k)
        .collect()
    )

    out: list[str] = []
    _emit(out, namespace, "rollup_consumed_version",
          "source lake version this rollup has consumed", "gauge",
          [(labels, rollup_cursor(view))])
    for suffix, col, help_ in _HOTKEY_GAUGES:
        _emit(out, namespace, suffix, help_, "gauge",
              [({**labels, label_name: r[group_col]}, r[col]) for r in rows])
    return "\n".join(out) + "\n"


def render_sketch_metrics(
    hll_view=None,
    hist_view=None,
    qs_permille: tuple[int, ...] = (500, 990),
    namespace: str = "ccs",
    labels: dict[str, str] | None = None,
) -> str:
    """Per-group gauges from the maintained sketch views — the
    cardinality and quantile rows of the same scrape body
    :func:`render_hotkey_metrics` serves for traffic counts.

    Emits, for each group: ``<ns>_hll_distinct`` (ever-seen distinct
    estimate from the HLL view) and ``<ns>_hist_q{q}_hi`` (the upper
    quantile bracket from the histogram view — the conservative p99 a
    dashboard alerts on). Cost shape: both views are O(#groups) /
    O(#groups x 64) rows — full scans of the VIEWS, never the source;
    consumed-version gauges ride the snapshot registries (zero jobs)."""
    from ..lake.rollup import rollup_cursor
    from ..lake.sketch_view import hist_view_quantiles, hll_view_estimates

    labels = labels or {}
    out: list[str] = []
    if hll_view is not None:
        gcol, lname = _group_label(hll_view, labels)
        _emit(out, namespace, "hll_consumed_version",
              "source lake version the HLL view has consumed", "gauge",
              [(labels, rollup_cursor(hll_view))])
        _emit(out, namespace, "hll_distinct",
              "ever-seen distinct items per group (HLL estimate)", "gauge",
              [({**labels, lname: r[gcol]}, r["hll_distinct"])
               for r in sorted(hll_view_estimates(hll_view).collect(),
                               key=lambda r: str(r[gcol]))])
    if hist_view is not None:
        gcol, lname = _group_label(hist_view, labels)
        _emit(out, namespace, "hist_consumed_version",
              "source lake version the histogram view has consumed", "gauge",
              [(labels, rollup_cursor(hist_view))])
        qrows = hist_view_quantiles(hist_view, list(qs_permille)).collect()
        for q in qs_permille:
            _emit(out, namespace, f"hist_q{q}_hi",
                  f"upper bracket of the {q}-permille quantile per group",
                  "gauge",
                  [({**labels, lname: r[gcol]}, r["est_hi"])
                   for r in sorted((r for r in qrows if r["q_permille"] == q),
                                   key=lambda r: str(r[gcol]))])
    return "\n".join(out) + "\n"


def render_consumer_metrics(
    table,
    namespace: str = "ccs",
    labels: dict[str, str] | None = None,
) -> str:
    """Per-subscriber cursor-lag gauges (the MemoryMetaManager
    listAllSubscribeInfo analog, lake/consumers.py): for every
    subscribed client_id, ``<ns>_consumer_acked_version`` (durable acked
    cursor) and ``<ns>_consumer_versions_behind`` (table head minus
    cursor), plus one ``<ns>_consumer_table_version``. Reads the
    consumer cursor directory and one manifest pointer — zero Spark
    jobs, scrape-rate safe."""
    from ..lake.consumers import Consumer

    labels = labels or {}
    head = table.current_version()
    cursors = Consumer.list_all(table)
    out: list[str] = []
    _emit(out, namespace, "consumer_table_version",
          "table head version consumers are chasing", "gauge",
          [(labels, head)])
    _emit(out, namespace, "consumer_acked_version",
          "durable acked cursor per subscribed client", "gauge",
          [({**labels, "client": c}, v) for c, v in sorted(cursors.items())])
    _emit(out, namespace, "consumer_versions_behind",
          "table versions not yet acked per client", "gauge",
          [({**labels, "client": c}, head - v)
           for c, v in sorted(cursors.items())])
    return "\n".join(out) + "\n"


def render_replica_metrics(
    replicas: "dict[str, tuple]",
    namespace: str = "ccs",
    labels: dict[str, str] | None = None,
) -> str:
    """Replication-lag gauges for downstream replicas — the SinkCollector
    analog for the lake-to-lake delivery path (lake/replica.py).

    ``replicas`` maps a destination name to its ``(replica, source)``
    LakeTable pair. Emits per destination: ``<ns>_replica_synced_version``
    (last consumed source version), ``<ns>_replica_source_version`` (the
    source head) and ``<ns>_replica_versions_behind``. All three read two
    manifest pointers and one sidecar JSON — zero Spark jobs, safe to
    scrape every few seconds."""
    from ..lake.replica import replica_lag

    labels = labels or {}
    out: list[str] = []
    rows = {
        name: replica_lag(rep, src)
        for name, (rep, src) in sorted(replicas.items())
    }
    for metric, help_ in (
        ("replica_synced_version", "source version the replica has consumed"),
        ("replica_source_version", "source table head version"),
        ("replica_versions_behind", "source versions not yet shipped"),
    ):
        key = metric.removeprefix("replica_")
        _emit(out, namespace, metric, help_, "gauge",
              [({**labels, "destination": name}, lag[key])
               for name, lag in rows.items()])
    return "".join(out)
