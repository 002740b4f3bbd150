"""Consumer-side materializations of a change feed: SCD2 history and
gap sessionization.

Reference anchor: clever-canal delivers ordered row events to sinks
(CanalEventSink → MQ/store, EntryProtocol.proto:26-59 row data with
before/after images); what consumers overwhelmingly build from that
stream is (a) a slowly-changing-dimension type-2 history table and
(b) per-entity activity sessions. Both are one-shuffle window plans —
the partition key is the entity key, so they scale with key
cardinality and stay skew-bounded by versions-per-key.

Scale notes (100 TB):
- ``scd2_history``: one hash shuffle on the key, per-key window sort of
  the key's OWN versions only (bounded — web pages see tens of
  versions, not millions). No corpus-wide sort, no driver state.
- ``sessionize``: identical shuffle shape; the cumulative-sum session
  numbering stays inside the per-key partition. The streaming twin is
  ``F.session_window`` on the same columns (windows.py holds the
  watermarked streaming aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def scd2_history(
    feed: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize a type-2 slowly-changing-dimension history from a
    change feed: one row per surviving version with its validity LSN
    range.

    Semantics (exactly what a warehouse SCD2 sink builds from a CDC
    stream): events for a key are ordered by LSN; every I/U event opens
    a version valid from its own LSN up to (exclusive) the key's next
    event LSN — ANY next event, including a delete, closes the version.
    Delete events emit no row of their own. ``is_current`` marks the
    open version (a key whose last event is D has none).

    Plan: one shuffle on ``key_cols``; ``lead`` window within the key's
    partition. Payload columns ride the single shuffle once.
    """
    cols = value_cols if value_cols is not None else [
        c for c in feed.columns if c not in set(key_cols) | {lsn_col, op_col}
    ]
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).asc())
    out = feed.withColumn("__valid_to", F.lead(lsn_col).over(w))
    out = out.filter(F.col(op_col) != F.lit("D"))
    return out.select(
        *key_cols,
        *cols,
        F.col(lsn_col).alias("valid_from_lsn"),
        F.col("__valid_to").alias("valid_to_lsn"),
        F.col("__valid_to").isNull().alias("is_current"),
    )


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: group each key's events into sessions
    separated by inactivity of at least ``gap``.

    Boundary rule matches Spark's ``session_window`` merge semantics: an
    event extends the current session iff it starts strictly before the
    previous event's ``ts + gap`` (i.e. a new session opens when the
    inter-event gap is >= ``gap``). Returns one row per session:
    key, session_start/session_end (min/max event ts), n_events.

    Plan: one shuffle on the key; lag + cumulative sum inside the key
    partition (the batch twin of ``groupBy(session_window(...))`` — the
    window form keeps the payload on one shuffle and gives the session
    ordinal for free, which the streaming API does not expose).
    """
    tie = [order_tiebreak] if order_tiebreak else []
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(t).asc() for t in tie]
    )
    gap_expr: Column = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull() | (F.col(ts_col) >= prev + gap_expr)
    ).cast("long")
    numbered = events.withColumn(
        "__session_seq", F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    return numbered.groupBy(*key_cols, "__session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).withColumnRenamed("__session_seq", "session_seq")
