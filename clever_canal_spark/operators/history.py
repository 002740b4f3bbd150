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


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many entities completed each prefix
    of ``steps`` in order. A key "reaches" step k at the EARLIEST event
    of type ``steps[k]`` strictly after its step-(k−1) reach time
    (strict ``>`` — a same-timestamp event cannot complete the next
    step, which keeps the result independent of any within-timestamp
    ordering, so both engines agree by construction). Returns one row
    per step: ``step_idx`` (1-based), ``step``, ``n_keys``.

    Plan shape: the feed is pruned to the step types once, then each
    step is a per-key min aggregation joined to the previous step's
    reach table — k−1 equi-joins all hash-partitioned on the SAME key,
    so AQE coalesces them into co-located stages; every join's build
    side is the per-key reach table (≤ distinct keys, shrinking
    monotonically with depth), never raw events. Funnels are short
    (k ≤ ~6), so the job count stays O(k) with no per-key array
    materialization — the collect_list alternative would carry every
    matching event of a hot key into one task; this shape's skew bound
    is events-per-(key, step-type), strictly smaller.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    key_cols = key_cols or ["user_id"]
    ev = events.filter(F.col(type_col).isin(steps)).select(
        *key_cols, ts_col, type_col
    )
    reach = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(*key_cols)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [reach.agg(F.count(F.lit(1)).alias("n_keys"))]
    for step in steps[1:]:
        nxt = ev.filter(F.col(type_col) == step).join(reach, on=key_cols)
        reach = (
            nxt.filter(F.col(ts_col) > F.col("__t"))
            .groupBy(*key_cols)
            .agg(F.min(ts_col).alias("__t"))
        )
        counts.append(reach.agg(F.count(F.lit(1)).alias("n_keys")))
    out = counts[0].select(
        F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_keys"
    )
    for i, c in enumerate(counts[1:], start=2):
        out = out.unionByName(
            c.select(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i - 1]).alias("step"),
                "n_keys",
            )
        )
    return out


def retention_cohorts(
    events: DataFrame,
    anchor_type: str,
    active_types: list[str] | None = None,
    period_days: int = 7,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention: group entities by the period of their FIRST
    ``anchor_type`` event, then count how many of each cohort were
    active (any ``active_types`` event — default: any event) in each
    later period. Returns (``cohort_start`` date, ``period_offset``,
    ``n_active``) with offset 0 = the cohort's own period; activity
    before the anchor is excluded (offset ≥ 0 only).

    Period binning is integer-exact on both engines: day number since
    1970-01-01 integer-divided by ``period_days`` (no date_trunc —
    week-start conventions vary across engines/locales; epoch-day
    arithmetic doesn't). ``cohort_start`` is the bin's first day.

    Plan shape: one per-key min-aggregation for the anchor (hash
    shuffle on the key), one distinct over (key, period) for activity
    (same key partitioning — the join that pairs them is co-located),
    then a bounded (cohort, offset) aggregate. Nothing is ever sorted
    corpus-wide; output cardinality = cohorts × horizon, tiny at any
    scale.
    """
    if period_days <= 0:
        raise ValueError(f"period_days must be positive, got {period_days}")
    key_cols = key_cols or ["user_id"]
    bin_col = F.expr(
        f"CAST(datediff(CAST({ts_col} AS DATE), DATE '1970-01-01') "
        f"DIV {period_days} AS BIGINT)"
    )
    anchor = (
        events.filter(F.col(type_col) == anchor_type)
        .groupBy(*key_cols)
        .agg(F.min(bin_col).alias("__cohort_bin"))
    )
    act = events
    if active_types is not None:
        act = act.filter(F.col(type_col).isin(active_types))
    activity = act.select(*key_cols, bin_col.alias("__act_bin")).distinct()
    return (
        activity.join(anchor, on=key_cols)
        .filter(F.col("__act_bin") >= F.col("__cohort_bin"))
        .groupBy("__cohort_bin", (F.col("__act_bin") - F.col("__cohort_bin")).alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("__cohort_bin") * period_days).cast("int"),
            ).alias("cohort_start"),
            F.col("period_offset").cast("int").alias("period_offset"),
            "n_active",
        )
    )


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Temporal as-of join: every fact row gains the dim payload from the
    version in effect at the fact's timestamp — ``backward`` takes the
    dim row with the LARGEST ``ts_col`` ≤ the fact's (inclusive),
    ``forward`` the SMALLEST ≥. Facts with no qualifying dim version get
    nulls (LEFT semantics; DuckDB twin: ``f ASOF LEFT JOIN d ON f.k = d.k
    AND f.ts >= d.ts``). The CDC shape this serves: enriching a change
    stream with a slowly-changing dimension *as of each event*, not as of
    head — ``scd2_history`` builds the versions, ``asof_join`` consumes
    them without materializing validity intervals.

    ``tolerance`` (pandas ``merge_asof`` analog): the matched version must
    additionally lie within ``tolerance`` of the fact's timestamp
    (``fact - dim <= tolerance`` backward, ``dim - fact`` forward) — a
    staler version yields nulls, NOT the next-older one. Compared with
    Spark's ``-`` on the ts column's type, so pass a number for numeric
    timestamps (LSNs, epoch micros).

    NOT a join in the plan: the equi-join-plus-max-filter form first
    manufactures |fact| × |versions-per-key| intermediate rows per key;
    this is the union form — tag both sides, ONE hash shuffle on the key,
    and a per-key ordered ``last(…, ignorenulls=True)`` carries each dim
    version forward onto the facts that follow it. Every input row rides
    the shuffle exactly once, so cost is O(|facts| + |dims|) regardless
    of how many versions a key has. Skew bound = rows per key, same as
    ``scd2_history``. Payload fields ride inside ONE struct so a dim
    version whose payload value is genuinely NULL still *wins* (a naive
    per-column ``last(col, ignorenulls)`` would resurrect the previous
    version's value).

    Ties: a dim row at exactly the fact's timestamp applies to it (both
    directions — inclusive, matching DuckDB ASOF). Dims must be unique
    per (key, ts); with duplicates the surviving payload is undefined.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = payload_cols if payload_cols is not None else [
        c for c in dims.columns if c not in set(on) | {ts_col}
    ]
    clash = set(payload) & set(facts.columns)
    if clash:
        raise ValueError(f"payload columns already exist on the fact side: {sorted(clash)}")
    reserved = {"__dim", "__dim_ts", "__is_dim"} & (
        set(facts.columns) | set(dims.columns)
    )
    if reserved:
        raise ValueError(f"column names are reserved by asof_join: {sorted(reserved)}")

    # a dim version with a null ts OR a null join key can never satisfy
    # the equi+inequality predicate (SQL comparison semantics; DuckDB
    # ASOF agrees) — drop such rows before the backward window can sort
    # them first and masquerade them as the oldest version / before the
    # NULL-key window partition can pair null-key facts with them
    dim_ok = F.col(ts_col).isNotNull()
    for k in on:
        dim_ok = dim_ok & F.col(k).isNotNull()
    d = dims.filter(dim_ok).select(
        *on,
        F.col(ts_col),
        F.struct(*[F.col(p) for p in payload]).alias("__dim"),
        F.lit(True).alias("__is_dim"),
    )
    u = facts.withColumn("__is_dim", F.lit(False)).unionByName(
        d, allowMissingColumns=True
    )
    ts_ord = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    # dim-before-fact at equal ts in BOTH directions => inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, F.col("__is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__dim", F.last("__dim", ignorenulls=True).over(w))
    # the matched version's own ts, for the tolerance bound: non-null on
    # exactly the rows where __dim is (dim rows, ts non-null by filter),
    # same window + order => always the SAME row the struct fill picked
    if tolerance is not None:
        filled = filled.withColumn(
            "__dim_ts",
            F.last(
                F.when(F.col("__is_dim"), F.col(ts_col)), ignorenulls=True
            ).over(w),
        )
        gap = (
            F.col(ts_col) - F.col("__dim_ts")
            if direction == "backward"
            else F.col("__dim_ts") - F.col(ts_col)
        )
        keep = F.col(ts_col).isNotNull() & (gap <= F.lit(tolerance))
    else:
        keep = F.col(ts_col).isNotNull()
    # a null-ts FACT matches nothing either — backward gets this for free
    # (asc NULLS FIRST: nothing precedes it) but forward's desc NULLS LAST
    # would hand it the window's final fill
    return filled.filter(~F.col("__is_dim")).select(
        *facts.columns,
        *[F.when(keep, F.col("__dim").getField(p)).alias(p) for p in payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval-containment (range) join: each point row pairs with every
    interval row whose half-open ``[lo, hi)`` contains it, optionally
    also equi-keyed on ``on``. Output = point columns + interval columns
    (shared ``on`` keys appear once).

    Spark's built-in plan for an inequality-only predicate is a
    broadcast nested loop — O(|points|·|intervals|) comparisons plus a
    mandatory whole-side broadcast. This is the bin-bucketed
    decomposition instead: quantize the axis into fixed ``bin_width``
    bins, explode each interval onto the bins it overlaps, hash-join
    points to interval-bins on (bin [, keys]), then apply the exact
    containment residual. The join is a plain shuffled equi-join.

    Choosing ``bin_width``: an interval explodes into
    ``ceil(width / bin_width) + 1`` bin rows while each point probes
    exactly one bin — set it near the typical interval width so interval
    expansion stays O(1). Skew = the points and overlapping intervals of
    one bin; at scale size bins so one bin's rows fit a task (truly
    pathological overlap is inherent to the OUTPUT size, not this plan).
    Empty intervals (``hi <= lo``) match nothing.

    Bin ids use float floor-division — exact for |values| < 2^53, which
    covers LSNs (10^10-event feeds), epoch micros (~2^51) and any
    realistic axis; pre-scale the axis if yours genuinely exceeds that.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    on = on or []
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(
            f"point/interval columns must be disjoint outside `on`: {sorted(clash)}"
        )
    if "__bin" in set(points.columns) | set(intervals.columns):
        raise ValueError("column name __bin is reserved by range_join")
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width)).alias("__p")
    i = (
        intervals.filter(F.col(hi_col) > F.col(lo_col))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / bin_width),
                    F.floor((F.col(hi_col) - 1) / bin_width),
                )
            ),
        )
        .alias("__i")
    )
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in on:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = (
        cond
        & (F.col(f"__p.{point_col}") >= F.col(f"__i.{lo_col}"))
        & (F.col(f"__p.{point_col}") < F.col(f"__i.{hi_col}"))
    )
    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}") for c in intervals.columns if c not in set(on)
    ]
    return p.join(i, cond, "inner").select(*out_cols)
