"""HyperLogLog sketch operator: register mergeability (the distributed
contract), estimator accuracy bound, and hand-checked rank algebra."""

import pyspark.sql.functions as F
import pytest

from clever_canal_spark.operators.sketch import (
    hll_add,
    hll_card,
    hll_distinct,
    hll_numerator,
    hll_overlap,
)


def _items(spark, pairs):
    return spark.createDataFrame(pairs, "g string, s bigint")


def test_register_rank_hand_case(spark):
    # One item: hash pipeline is deterministic; recompute rho in Python
    # (same md5-u32 convention) and compare against the Spark register.
    import hashlib

    s = 424242
    h = int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16)
    bucket, w = h % 32, h // 32
    rho = 28 if w == 0 else 28 - w.bit_length()
    regs = hll_add(_items(spark, [("a", s)]), ["g"], "s", b=5).collect()
    assert len(regs) == 1
    assert (regs[0]["bucket"], regs[0]["r"]) == (bucket, rho)


def test_duplicates_do_not_move_the_estimate(spark):
    base = [("a", i) for i in range(500)]
    est1 = hll_card(hll_add(_items(spark, base), ["g"], "s"), ["g"]).collect()
    est2 = hll_card(
        hll_add(_items(spark, base * 3), ["g"], "s"), ["g"]
    ).collect()
    assert est1[0]["hll_distinct"] == est2[0]["hll_distinct"]


def test_merge_equals_rebuild(spark):
    # Element-wise max of two groups' registers == registers of the
    # concatenated data: the property that makes cross-shard rollups a
    # pure register merge with no raw-data revisit.
    left = [("x", i) for i in range(400)]
    right = [("x", i) for i in range(200, 700)]
    ra = hll_add(_items(spark, left), ["g"], "s")
    rb = hll_add(_items(spark, right), ["g"], "s")
    merged = (
        ra.unionByName(rb)
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    rebuilt = hll_add(_items(spark, left + right), ["g"], "s")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_estimate_within_bound(spark):
    # m=32 -> stderr ~18%; allow 3 sigma on a 2000-item set.
    n = 2000
    out = hll_distinct(
        _items(spark, [("a", i * 7919) for i in range(n)]), ["g"], "s", b=5
    ).collect()[0]
    assert out["exact_distinct"] == n
    assert abs(out["hll_distinct"] - n) < 0.55 * n
    assert out["err_permille"] == abs(out["hll_distinct"] - n) * 1000 // n


def test_overlap_identical_and_disjoint(spark):
    # Identical sets -> intersection ~ each estimate, jaccard near 1000;
    # disjoint sets -> union ~ a+b, jaccard small.
    same = [("a", i) for i in range(600)] + [("b", i) for i in range(600)]
    out = hll_overlap(_items(spark, same), "g", "s", b=5).collect()[0]
    assert out["est_a"] == out["est_b"] == out["est_union"]
    assert out["jaccard_permille"] == 1000

    disj = [("a", i) for i in range(600)] + [("b", i + 10_000) for i in range(600)]
    out2 = hll_overlap(_items(spark, disj), "g", "s", b=5).collect()[0]
    assert out2["jaccard_permille"] < 350


def test_numerator_matches_alpha_table():
    # b=5 -> m=32 -> alpha=0.697 (Flajolet et al. Fig. 3)
    assert hll_numerator(5) == int(0.697 * 32 * 32 * (1 << 28))
    with pytest.raises(Exception):
        hll_numerator("x")


def test_null_items_skipped_everywhere(spark):
    """NULL items/values are filtered inside every sketch builder: a
    null used to produce a NULL bucket row that crashed hll_regs_dense's
    map build and silently shorted hll_card's missing-bucket term."""
    from clever_canal_spark.operators.sketch import (
        cms_add, hist_add, hll_add, hll_card, hll_regs_dense,
    )

    df = spark.createDataFrame(
        [(str(i),) for i in range(23)] + [(None,)], "item string"
    )
    clean = df.filter(F.col("item").isNotNull())
    # estimate identical with and without the null present
    [w] = hll_card(hll_add(df, [], "item", b=5), [], b=5).collect()
    [wo] = hll_card(hll_add(clean, [], "item", b=5), [], b=5).collect()
    assert w["hll_distinct"] == wo["hll_distinct"]
    # dense registers no longer crash on the NULL map key
    assert hll_regs_dense(df, [], "item", b=5).count() == 1
    # CMS: no NULL slot rows
    slots = cms_add(df, [], "item", d=2, w=64).select("slot")
    assert slots.filter(F.col("slot").isNull()).count() == 0
    # histogram: a NULL value adds no bin row
    vals = spark.createDataFrame([(4,), (None,)], "v int")
    assert hist_add(vals, [], "v").count() == 1
