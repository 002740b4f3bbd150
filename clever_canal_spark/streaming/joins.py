"""Watermarked stream-stream interval join — event attribution over
two live streams with bounded state.

The CDC deployment shape this serves: two change streams (or a change
stream against its own derived event feed) correlated within a time
window — click→purchase attribution, request→error correlation,
write→replication-ack latency. The reference leaves correlation to
consumers (it ships ordered events, MQ sinks fan out); this is that
consumer restated as Spark's native stream-stream join, which the
engine's other streaming pieces deliberately avoid (LWW apply needs no
watermark) but an analytics consumer genuinely needs.

Why the shape matters (the 100-TB/forever requirement): an unbounded
stream-stream join must buffer EVERYTHING; Spark only bounds the state
when BOTH sides carry watermarks AND the join condition constrains the
two event times against each other. ``interval_join_stream`` builds
exactly that condition — equi-keys plus
``right_ts ∈ [left_ts + lower, left_ts + upper]`` — so each side's
buffered state is evicted once the other side's watermark passes the
interval. Inner joins emit as matches arrive; ``leftOuter`` emits the
null-padded left row only after the watermark proves no match can
still come (the attribution "no conversion" record).

Batch twin: the SAME function on batch frames is a plain range
equi-join (watermarks fold away) — the DuckDB-oracled
``cdc_interval_attribution`` query pins the semantics; the streaming
tests drive file-stream slices through watermark advancement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Join each left row to the right rows sharing ``on`` whose
    ``right_ts`` lies in ``[left_ts + lower, left_ts + upper]`` (both
    inclusive; ``lower`` may be negative — pass e.g. ``"-5 minutes"``).

    ``left_ts`` and ``right_ts`` must be DIFFERENT names (the output
    carries both). Non-key column names must be disjoint across sides —
    clashes raise rather than silently producing ambiguous columns.
    ``how`` ∈ {"inner", "leftOuter"}; on streaming inputs both sides get
    ``withWatermark(ts, watermark)`` (already-watermarked inputs pass
    through untouched — Spark keeps the earlier mark).

    State bound: left rows are droppable once the right watermark passes
    ``left_ts + upper``; right rows once the left watermark passes
    ``right_ts - lower``. That is Spark's own analysis of this exact
    condition shape — changing the condition form (e.g. moving the
    bounds into a post-join filter) silently reverts to unbounded state.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns must be disjoint across sides: {sorted(clash)}"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    l, r = left.alias("__l"), right.alias("__r")
    cond = None
    for k in on:
        c = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = c if cond is None else (cond & c)
    lo = F.expr(f"__l.{left_ts} + INTERVAL {lower.lstrip('-')}") \
        if not lower.startswith("-") \
        else F.expr(f"__l.{left_ts} - INTERVAL {lower[1:]}")
    hi = F.expr(f"__l.{left_ts} + INTERVAL {upper.lstrip('-')}") \
        if not upper.startswith("-") \
        else F.expr(f"__l.{left_ts} - INTERVAL {upper[1:]}")
    time_cond = (F.col(f"__r.{right_ts}") >= lo) & (F.col(f"__r.{right_ts}") <= hi)
    cond = time_cond if cond is None else (cond & time_cond)
    out_cols = (
        [F.col(f"__l.{k}") for k in on]
        + [F.col(f"__l.{c}") for c in left.columns if c not in on]
        + [F.col(f"__r.{c}") for c in right.columns if c not in on]
    )
    return l.join(r, cond, how).select(*out_cols)
