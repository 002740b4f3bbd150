"""Mergeable sketches: integer-exact HyperLogLog (distinct counting) and
count-min (frequency / heavy hitters, turnstile-capable for CDC deletes).

Reference anchor: clever-canal keeps per-destination throughput/row
counters in its metrics layer (CanalMetricsService, PrometheusService
exposition); the corpus-scale analog a webtext CDC pipeline needs is
*distinct* counting — unique shingles/URLs/users per group — where an
exact COUNT(DISTINCT) shuffles every distinct value. HyperLogLog
(Flajolet et al. 2007) replaces that with m fixed registers per group.

Why this formulation is the 100-TB shape:
- ``hll_add`` is a plain ``groupBy(group, bucket).agg(max(rho))`` —
  perfect map-side combine (max is associative/commutative), so the
  shuffle carries at most ``groups x m`` rows regardless of input size.
- Registers are MERGEABLE state: union of two sketches = element-wise
  max. Cross-shard / cross-day rollups combine by re-running the same
  max agg over concatenated register tables — no raw data revisited.
  ``hll_union_card`` and ``hll_overlap`` are exactly that merge.
- Every step is integer arithmetic (the indicator sum is kept as the
  scaled BIGINT ``z = sum(2^(SC-r))``, the bias constant is a
  precomputed integer numerator, the estimate is one BIGINT integer
  division), so the result is bit-identical across engines — the DuckDB
  oracle transcribes the same algebra independently.

Deliberate scope: the raw HLL estimator only (valid for cardinalities
above ~2.5m); the small-range linear-counting correction needs ``ln``,
whose libm rounding differs across engines, so callers pick ``b`` such
that expected cardinality exceeds 2.5 * 2^b (default b=5 -> m=32,
stderr ~1.04/sqrt(32) = 18%; b=14 at corpus scale -> 0.8%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Bias-correction constants from Flajolet et al. 2007, Fig. 3.
_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m.bit_length() - 1, 0.7213 / (1 + 1.079 / m))


def hll_numerator(b: int) -> int:
    """The integer numerator ``floor(alpha_m * m^2 * 2^SC)`` with
    ``SC = 33 - b`` (the scale that makes every ``2^(SC-rho)`` term an
    integer; max rho is ``33 - b``). ``estimate = numerator div z``."""
    m = 1 << b
    return int(_alpha(m) * m * m * (1 << (33 - b)))


def u32_expr(item_sql: str) -> str:
    """Uniform 32-bit hash of any value, identical cross-engine
    (DuckDB twin: ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT``)."""
    return (
        f"CAST(conv(substring(md5(CAST({item_sql} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )


def hll_add(
    df: DataFrame, group_cols: list[str], item_col: str, b: int = 5
) -> DataFrame:
    """Build per-group HLL registers from an item column: one row per
    (group, bucket) carrying the max leading-zero rank ``r``.

    bucket = h mod m; w = h div m (the remaining 32-b bits);
    rho(w) = leading zeros of w in 32-b bits, plus 1
           = (33 - b) - length(bin(w))  [w=0 -> 33-b].
    The ``length(conv(w,10,2))`` formulation is integer-exact (no
    floating log2) and matches DuckDB's ``length(bin(w))``.

    NULL items are filtered here (a null hashes to a null bucket row
    that crashes ``hll_regs_dense``'s map build and silently shorts
    ``hll_card``'s missing-bucket term) — "distinct non-null items",
    the same stance as ``bloom_bits``.
    """
    m = 1 << b
    h = u32_expr(item_col)
    w = f"({h} div {m})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {33 - b} "
        f"ELSE {33 - b} - length(conv({w}, 10, 2)) END"
    )
    return (
        df.filter(F.expr(item_col).isNotNull())
        .select(
            *group_cols,
            F.expr(f"{h} % {m}").alias("bucket"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_card(
    regs: DataFrame, group_cols: list[str], b: int = 5, out_col: str = "hll_distinct"
) -> DataFrame:
    """Estimate per-group cardinality from a register table.

    Missing buckets are registers at 0 and contribute the full 2^SC to
    the scaled indicator sum; the estimate is a single BIGINT division.
    """
    m, sc = 1 << b, 33 - b
    numer = hll_numerator(b)
    z = (
        f"sum(shiftleft(CAST(1 AS BIGINT), {sc} - r)) "
        f"+ (CAST({m} AS BIGINT) - count(*)) * shiftleft(CAST(1 AS BIGINT), {sc})"
    )
    return regs.groupBy(*group_cols).agg(
        F.expr(f"CAST({numer} AS BIGINT) div ({z})").alias(out_col)
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], item_col: str, b: int = 5
) -> DataFrame:
    """Per-group HLL estimate side-by-side with the exact distinct count
    and the observed error in permille — the honesty columns."""
    est = hll_card(hll_add(df, group_cols, item_col, b), group_cols, b)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(item_col).alias("exact_distinct")
    )
    return est.join(exact, group_cols).select(
        *group_cols,
        "hll_distinct",
        "exact_distinct",
        F.expr(
            "abs(hll_distinct - exact_distinct) * 1000 div exact_distinct"
        ).alias("err_permille"),
    )


def hll_regs_dense(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    b: int = 5,
    regs_col: str = "regs",
) -> DataFrame:
    """Per-group registers as ONE dense ``array<int>`` row of length m —
    the storage form a maintained sketch view wants (row count = #groups,
    merge = element-wise ``zip_with greatest``). Missing buckets are 0."""
    m = 1 << b
    return (
        hll_add(df, group_cols, item_col, b)
        .groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("bucket").cast("int").alias("bucket"), "r")
                )
            ).alias("_m")
        )
        .select(
            *group_cols,
            F.expr(
                f"transform(sequence(0, {m - 1}), "
                f"i -> coalesce(element_at(_m, CAST(i AS INT)), 0))"
            ).cast("array<int>").alias(regs_col),
        )
    )


def hll_card_from_regs_expr(b: int, regs_col: str = "regs") -> str:
    """SQL expression estimating cardinality from a DENSE register array
    (every bucket present; 0 = empty register). Same integer algebra as
    :func:`hll_card` — one BIGINT division, bit-identical cross-engine."""
    sc = 33 - b
    numer = hll_numerator(b)
    z = (
        f"aggregate({regs_col}, CAST(0 AS BIGINT), "
        f"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), {sc} - r))"
    )
    return f"CAST({numer} AS BIGINT) div ({z})"


def hll_merge_regs_expr(a_col: str, b_col: str, m: int) -> str:
    """SQL expression merging two dense register arrays (either may be
    NULL = empty sketch): element-wise max — the HLL union."""
    zero = f"array_repeat(0, {m})"
    return (
        f"zip_with(coalesce({a_col}, {zero}), coalesce({b_col}, {zero}), "
        f"(x, y) -> greatest(x, y))"
    )


def cms_slot_expr(item_sql: str, depth: int, w: int) -> str:
    """Slot of ``item`` under the depth-th seeded hash: the u32 of
    ``'<depth>:' || item`` mod w. DuckDB twin:
    ``('0x' || substr(md5(<depth> || ':' || CAST(x AS VARCHAR)), 1, 8))::BIGINT % w``
    — identical bytes hashed, identical slot."""
    seeded = f"concat('{depth}:', CAST({item_sql} AS STRING))"
    return f"({u32_expr(seeded)} % {w})"


def cms_add(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    d: int = 4,
    w: int = 256,
    weight_sql: str = "CAST(1 AS BIGINT)",
) -> DataFrame:
    """Build per-group count-min sketch rows (Cormode & Muthukrishnan
    2005): d seeded hash rows of w slots each, stored as one row per
    (group, depth, slot) with the summed weight.

    The frequency companion to :func:`hll_add`, same 100-TB shape:
    - one ``groupBy(group, depth, slot).sum`` — perfect map-side combine,
      the shuffle carries at most ``groups x d x w`` rows whatever the
      input size;
    - MERGEABLE: union of two sketches = per-slot SUM (the sketch is
      linear), so cross-shard rollups re-run the same sum over
      concatenated sketch tables;
    - TURNSTILE: ``weight_sql`` may be negative — the CDC changelog maps
      I -> +1, D -> -1 (U -> 0) and the sketch tracks live-row frequency
      through deletes, which mergeable-max sketches (HLL) cannot;
    - integer arithmetic throughout, so the DuckDB oracle transcribing
      the same algebra hash-matches exactly.

    Point estimate (min over the d slot counts, :func:`cms_estimate`)
    never under-counts when all true frequencies are >= 0; the
    overestimate is bounded by 2N/w with prob 1 - (1/2)^d.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.expr(cms_slot_expr(item_col, i, w)).cast("int").alias("slot"),
            )
            for i in range(d)
        ]
    )
    return (
        # null items are skipped (same stance as hll_add/bloom_bits):
        # they would land in a meaningless NULL slot row
        df.filter(F.expr(item_col).isNotNull())
        .select(
            *group_cols, F.expr(weight_sql).alias("_wt"), F.explode(pairs).alias("p")
        )
        .select(*group_cols, F.col("p.depth").alias("depth"), F.col("p.slot").alias("slot"), "_wt")
        .groupBy(*group_cols, "depth", "slot")
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    d: int = 4,
    w: int = 256,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query a count-min sketch for each probe row: recompute the
    d slots of the probe item, look them up, take the min.

    Plan shape: the sketch is at most ``groups x d x w`` rows by
    construction, so it is BROADCAST to the probes — point lookups never
    shuffle the probe side. Missing slots read as 0 (an item whose slot
    row was never touched has estimate 0). Probe rows are assumed
    distinct on (group, item); all probe columns pass through.
    """
    group_cols = group_cols or []
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.expr(cms_slot_expr(item_col, i, w)).cast("int").alias("slot"),
            )
            for i in range(d)
        ]
    )
    keep = list(probes.columns)
    exploded = probes.select(*keep, F.explode(pairs).alias("p")).select(
        *keep, F.col("p.depth").alias("depth"), F.col("p.slot").alias("slot")
    )
    joined = exploded.join(
        F.broadcast(sketch.withColumnRenamed("cnt", "_cnt")),
        [*group_cols, "depth", "slot"],
        "left",
    )
    return joined.groupBy(*keep).agg(
        F.min(F.coalesce(F.col("_cnt"), F.lit(0).cast("bigint"))).alias(out_col)
    )


def hist_bin_expr(value_sql: str) -> str:
    """The log2 bin of a non-negative BIGINT value: 0 for 0, else its
    binary digit length (``floor(log2 v) + 1``) — integer-exact; DuckDB
    twin ``CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END``. Negative
    values raise loudly (a sentinel bin would poison cumulative counts)."""
    v = f"CAST(({value_sql}) AS BIGINT)"
    return (
        f"CASE WHEN {v} < 0 THEN raise_error('hist bin: negative value') "
        f"WHEN {v} = 0 THEN 0 ELSE length(conv({v}, 10, 2)) END"
    )


def hist_add(df: DataFrame, group_cols: list[str], value_sql: str) -> DataFrame:
    """Mergeable log2 histogram over a non-negative BIGINT value: one row
    per (group, bin) with the count, where ``bin = 0`` for value 0 and
    ``floor(log2 v) + 1`` otherwise — computed as binary-digit LENGTH
    (``length(conv(v, 10, 2))``; DuckDB twin ``length(bin(v))``), never
    floating log2, so engines agree bit-for-bit.

    The quantile member of the sketch family: like CMS the state is
    ADDITIVE (merge = per-bin sum, map-side combine keeps the shuffle at
    groups x ~64 rows), and quantile reads off the cumulative bin counts
    with a guaranteed 2x relative error (each bin spans one doubling).
    The CDC use is lag/latency percentiles per destination in the
    metrics stack — a p99 that merges across shards and epochs without
    ever revisiting raw values. Negative values raise (one sentinel bin
    would silently poison cum counts); callers shift or clamp first.
    NULL values are skipped (a NULL bin row would sort ahead of bin 0
    and pollute ``hist_quantiles``'s cumulative window) — the stance
    every sketch builder here shares.
    """
    return (
        df.filter(F.expr(value_sql).isNotNull())
        .select(*group_cols, F.expr(hist_bin_expr(value_sql)).cast("int").alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("n"))
    )


def hist_quantiles(
    hist: DataFrame, group_cols: list[str], qs_permille: list[int]
) -> DataFrame:
    """Quantile estimates from a log2-histogram table: for each group and
    each q (permille), the smallest bin whose cumulative count reaches
    ``ceil(q * total / 1000)`` (type-1 / lower quantile on bins). Emits
    the bin's value range — ``est_lo = 2^(bin-1)``, ``est_hi = 2^bin - 1``
    (0/0 for bin 0): the true quantile lies within, so est_hi is a
    <= 2x overestimate. All-integer arithmetic.

    Plan: one cumulative window per group over <= 64 bin rows (the
    histogram is tiny by construction — the window never sees raw data),
    then a crossJoin against the literal q list."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    spark = hist.sparkSession
    qs = spark.createDataFrame([(int(q),) for q in qs_permille], "q_permille int")
    hit = cum.crossJoin(F.broadcast(qs)).where(
        F.expr("cum >= (q_permille * total + 999) div 1000")
    )
    return hit.groupBy(*group_cols, "q_permille").agg(
        F.min("bin").alias("qbin")
    ).select(
        *group_cols,
        "q_permille",
        F.expr(
            "CASE WHEN qbin = 0 THEN CAST(0 AS BIGINT) "
            "ELSE shiftleft(CAST(1 AS BIGINT), qbin - 1) END"
        ).alias("est_lo"),
        F.expr(
            "CASE WHEN qbin = 0 THEN CAST(0 AS BIGINT) "
            "ELSE shiftleft(CAST(1 AS BIGINT), qbin) - 1 END"
        ).alias("est_hi"),
    )


def bloom_bits(
    df: DataFrame, item_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Bloom filter (Bloom 1970) as a table of DISTINCT set-bit
    positions — the membership sibling of HLL (distinct) and count-min
    (frequency). Bit positions reuse the seeded-hash convention of
    :func:`cms_slot_expr` (a Bloom filter IS a count-min row with
    saturated bits), so the DuckDB twin is the same md5 algebra.

    The row form (one ``bit: bigint`` per set bit, <= m_bits rows) is the
    shuffle-friendly mergeable state: union of two filters = DISTINCT of
    the concatenated bit tables, and the build is an explode + distinct
    with map-side partial dedup. The classic guarantee holds: NO false
    negatives ever; false-positive rate ~ (1 - e^(-kn/m))^k — size
    ``m_bits ~ 10n`` and ``k=3`` for ~8% at its worst, or ``k=7``,
    ``m ~ 14n`` for ~1%.

    The webtext use is the cross-shard pre-filter: build bits over shard
    A's url/fingerprint column once (tiny vs the shard), broadcast them,
    and only the ``might_contain`` survivors of shard B pay the exact
    (shuffling) semi-join."""
    pairs = F.array(
        *[
            F.expr(cms_slot_expr(item_col, i, m_bits)).cast("bigint")
            for i in range(k)
        ]
    )
    return (
        df.where(F.col(item_col).isNotNull())
        .select(F.explode(pairs).alias("bit"))
        .distinct()
    )


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    item_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership test for each probe row against a bit table built by
    :func:`bloom_bits` with the SAME (m_bits, k): recompute the k
    positions, require every one present. Returns the probe columns plus
    ``out_col`` as int 1/0 (1 = maybe present, 0 = definitely absent).

    Plan shape: the bit table is broadcast (<= m_bits tiny rows); the
    probe side never shuffles — the point of a pre-filter."""
    keep = list(probes.columns)
    pairs = F.array(
        *[
            F.expr(cms_slot_expr(item_col, i, m_bits)).cast("bigint")
            for i in range(k)
        ]
    )
    exploded = probes.select(*keep, F.explode(pairs).alias("bit"))
    joined = exploded.join(
        F.broadcast(bits.select("bit", F.lit(1).alias("_hit"))), "bit", "left"
    )
    return joined.groupBy(*keep).agg(
        F.min(F.coalesce(F.col("_hit"), F.lit(0))).cast("int").alias(out_col)
    )


def hll_overlap(
    df: DataFrame, group_col: str, item_col: str, b: int = 5
) -> DataFrame:
    """Pairwise set-overlap estimates between groups via HLL register
    merge: union = element-wise max, intersection by inclusion-exclusion
    (clamped at 0), Jaccard in permille.

    Plan: registers are densified to all m buckets (groups x m rows —
    tiny by construction), pair-joined on bucket, and reduced per pair.
    The raw corpus is scanned ONCE (hll_add); everything downstream is
    O(groups^2 * m) register algebra.
    """
    m, sc = 1 << b, 33 - b
    numer = hll_numerator(b)
    regs = hll_add(df, [group_col], item_col, b)
    ests = hll_card(regs, [group_col], b, out_col="est")
    spark = df.sparkSession
    groups = df.select(F.col(group_col).alias("g")).distinct()
    dense = (
        groups.crossJoin(spark.range(m).select(F.col("id").cast("int").alias("bucket")))
        .join(
            regs.select(F.col(group_col).alias("g"), "bucket", "r"),
            ["g", "bucket"],
            "left",
        )
        .select("g", "bucket", F.coalesce("r", F.lit(0)).alias("r"))
    )
    a, c = dense.alias("a"), dense.alias("c")
    pair_z = (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.g") < F.col("c.g")))
        .groupBy(F.col("a.g").alias("g_a"), F.col("c.g").alias("g_b"))
        .agg(
            F.expr(
                f"sum(shiftleft(CAST(1 AS BIGINT), {sc} - greatest(a.r, c.r)))"
            ).alias("z_union")
        )
    )
    ea = ests.select(F.col(group_col).alias("g_a"), F.col("est").alias("est_a"))
    eb = ests.select(F.col(group_col).alias("g_b"), F.col("est").alias("est_b"))
    return (
        pair_z.join(F.broadcast(ea), "g_a")
        .join(F.broadcast(eb), "g_b")
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            F.expr(f"CAST({numer} AS BIGINT) div z_union").alias("est_union"),
        )
        .select(
            "*",
            F.expr("greatest(CAST(0 AS BIGINT), est_a + est_b - est_union)").alias(
                "est_intersect"
            ),
        )
        .select(
            "*",
            F.expr("est_intersect * 1000 div est_union").alias("jaccard_permille"),
        )
    )
