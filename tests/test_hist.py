"""Log2-histogram quantile sketch: hand-checked binning, merge-by-sum,
the 2x quantile bracketing guarantee, and the negative-value guard."""

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.sketch import hist_add, hist_quantiles


def _vals(spark, vals):
    return spark.createDataFrame([("g", v) for v in vals], "g string, v long")


def test_binning_hand_cases(spark):
    # 0 -> bin 0; 1 -> bin 1; 5 (101b) -> bin 3; 1024 -> bin 11
    rows = hist_add(_vals(spark, [0, 1, 5, 1024]), ["g"], "v").collect()
    assert {(r["bin"], r["n"]) for r in rows} == {(0, 1), (1, 1), (3, 1), (11, 1)}


def test_merge_equals_rebuild(spark):
    a, b = [1, 2, 3, 100, 5000], [3, 4, 200, 5000, 70000]
    ha = hist_add(_vals(spark, a), ["g"], "v")
    hb = hist_add(_vals(spark, b), ["g"], "v")
    merged = ha.unionByName(hb).groupBy("g", "bin").agg(F.sum("n").alias("n"))
    rebuilt = hist_add(_vals(spark, a + b), ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_quantiles_bracket_exact(spark):
    # est_lo <= exact type-1 quantile <= est_hi, and est_hi < 2*exact+1
    vals = sorted(v * 13 + 1 for v in range(200))
    df = _vals(spark, vals)
    hist = hist_add(df, ["g"], "v")
    out = {
        r["q_permille"]: (r["est_lo"], r["est_hi"])
        for r in hist_quantiles(hist, ["g"], [500, 900, 990]).collect()
    }
    n = len(vals)
    for q, (lo, hi) in out.items():
        thr = -(-q * n // 1000)  # ceil
        exact = vals[thr - 1]
        assert lo <= exact <= hi, (q, lo, exact, hi)
        assert hi <= 2 * exact  # one-doubling bin width


def test_zero_only_group_and_p100(spark):
    out = hist_quantiles(hist_add(_vals(spark, [0, 0, 0]), ["g"], "v"),
                         ["g"], [1000]).collect()
    assert (out[0]["est_lo"], out[0]["est_hi"]) == (0, 0)


def test_negative_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        hist_add(_vals(spark, [-1]), ["g"], "v").collect()


def test_histogram_is_bounded(spark):
    # 10k values -> at most 64 bin rows per group
    vals = [(i * 7919) % 1_000_000 for i in range(10_000)]
    assert hist_add(_vals(spark, vals), ["g"], "v").count() <= 64
