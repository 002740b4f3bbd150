"""Watermarked windowed aggregation over the change-event stream.

The engine's apply path needs no watermark (LWW by LSN is order-insensitive,
so late events are reconciled, not dropped), but the *metrics* side of a
CDC deployment is classic windowed streaming: events/sec per table per
time window, with bounded state. This is the Structured Streaming
restatement of the reference's prometheus rate gauges
(EntryCollector.java:32-33, StoreCollector.java:33-43) as a windowed
aggregation with late-data tolerance:

- ``withWatermark(ts, slack)`` bounds the aggregation state: a window's
  state is dropped once the watermark (max observed ts - slack) passes its
  end, so the query runs forever on bounded memory — the 100-TB/forever
  requirement for any streaming agg;
- events arriving later than the watermark are dropped (their window's
  state is gone); events late but within the slack still update their
  window — the standard lateness trade, tuned by ``watermark``.

Output mode notes: use ``update`` to emit per-batch window deltas to a
changelog-style sink, or ``append`` to emit each window exactly once when
the watermark closes it (append holds a window back until it cannot
receive late data anymore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..model import KIND_DDL, KIND_HEARTBEAT, KIND_ROW


def sessionized_counts(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming gap sessionization: per-key activity sessions closed
    after ``gap`` of inactivity, built on the native ``F.session_window``
    (dynamic merging windows — Spark manages the session state; the
    watermark both evicts closed sessions and, in append mode, releases a
    session exactly once when no more late events can extend it).

    The batch twin with identical merge semantics (and a session ordinal
    the native API doesn't expose) is ``operators.history.sessionize`` —
    equality is asserted in tests/test_history.py. Scale shape: state is
    one (key, open-session) entry per active key, bounded by the
    watermark; the shuffle is on the key.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(*key_cols, sw.alias("win"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("win")
    )


def dedup_events_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Effectively-once pre-filter for an AT-LEAST-ONCE upstream (an MQ
    redelivering the feed, a flaky relay re-sending a slice): drop
    re-deliveries of the same ``key_cols`` arriving within ``watermark``
    of first sight, with BOUNDED state — the native
    ``dropDuplicatesWithinWatermark``, which evicts a key's entry once
    the watermark passes its event time (a plain streaming
    ``dropDuplicates`` keeps every key forever — the unbounded-state
    trap this wrapper exists to avoid).

    Contract: duplicates inside the watermark window are suppressed;
    a re-delivery arriving LATER than the watermark can re-emit. For
    the engine's own apply path that residue is harmless — LWW by LSN
    makes re-applied events no-ops (the same reasoning the module
    docstring gives for not watermarking the apply path at all); this
    operator exists to cut the wasted work upstream, not to carry
    correctness. Batch inputs pass through a plain dropDuplicates
    (the deterministic twin — no time bound needed when the input is
    finite)."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(time window, table) event/row/delete counts over a (streaming
    or batch) change-event DataFrame, with watermark-bounded state.

    Works identically on a batch DataFrame (the watermark folds away) —
    the driver-contract oracle checks the batch twin; streaming semantics
    (late-row drop, state eviction) are asserted in
    tests/test_windowed_stream.py.
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    win = F.window(F.col("ts"), window_duration, slide or window_duration)
    return (
        events.groupBy(win.alias("win"), F.col("table_name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("kind") == KIND_ROW).cast("long")).alias("n_rows"),
            F.sum(((F.col("kind") == KIND_ROW) & (F.col("op") == "D")).cast("long")).alias(
                "n_deletes"
            ),
            F.sum((F.col("kind") == KIND_DDL).cast("long")).alias("n_ddl"),
            F.sum((F.col("kind") == KIND_HEARTBEAT).cast("long")).alias("n_heartbeats"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "table_name",
            "n_events",
            "n_rows",
            "n_deletes",
            "n_ddl",
            "n_heartbeats",
            "lsn_min",
            "lsn_max",
        )
    )


def windowed_distinct_registers(
    events: DataFrame,
    item,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    b: int = 5,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming distinct-cardinality state: per-(time window, bucket) HLL
    max-rank registers (``operators/sketch.py`` geometry) as ONE
    watermark-bounded aggregation — max is associative/commutative, so the
    register build is an ordinary streaming agg with perfect map-side
    combine and state of exactly m rows per open window, independent of
    how many distinct items the window sees.

    Streaming permits a single aggregation per query, so this emits the
    REGISTER rows (the mergeable state); the estimate is one
    ``hll_card(regs, ["window_start"], b)`` over the sink — and because
    registers are monotone, an update-mode sink reconciles by plain
    max(r) per (window, bucket). Batch input folds the watermark away and
    yields the exact final registers (the driver-oracle twin).

    Spark's built-in ``approx_count_distinct`` is the same HLL idea
    fused JVM-side; this restatement exists because its registers (a)
    interop with the lake sketch view / cross-shard merges and (b) are
    integer-exact, so a DuckDB oracle reproduces them bit-for-bit —
    the built-in's binary sketch is opaque and engine-specific.
    """
    from ..operators.sketch import u32_expr

    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    m, sc = 1 << b, 33 - b
    h = u32_expr("_item")
    w = f"({h} div {m})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {sc} "
        f"ELSE {sc} - length(conv({w}, 10, 2)) END"
    )
    prepared = events.select(
        F.col(ts_col),
        (item if not isinstance(item, str) else F.col(item)).alias("_item"),
    ).where(F.col("_item").isNotNull())
    return (
        prepared.select(
            F.col(ts_col),
            F.expr(f"{h} % {m}").alias("bucket"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col("bucket"))
        .agg(F.max("rho").alias("r"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bucket",
            "r",
        )
    )


def windowed_value_histogram(
    events: DataFrame,
    value_sql: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming quantile state: per-(time window, log2 bin) counts
    (``operators/sketch.py`` histogram geometry) as ONE watermark-bounded
    aggregation — count is associative/commutative, so the histogram
    build is an ordinary streaming agg with perfect map-side combine and
    state of <= 64 rows per open window, whatever the value distribution.
    The streaming sibling of ``windowed_distinct_registers``, covering
    the metrics stack's other gauge: p50/p99 event value / apply latency
    per window, read off the sink with ``hist_quantiles(regs,
    ["window_start"], [...])`` within a guaranteed one-doubling bracket.

    Update-mode sinks reconcile by max(n) per (window, bin): under an
    append-only stream each bin's count only grows, so later emissions
    dominate earlier ones. Unlike the HLL registers this state is NOT
    duplicate-immune (counts are additive) — the exactly-once file
    source + checkpoint contract supplies dedup, not the sketch. Batch
    input folds the watermark away and yields the exact final histogram
    (the driver-oracle twin).
    """
    from ..operators.sketch import hist_bin_expr

    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.select(
            F.col(ts_col),
            F.expr(hist_bin_expr(value_sql)).cast("int").alias("bin"),
        )
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bin",
            "n",
        )
    )
