"""Corpus x corpus kNN join (operators/similarity.py knn_join):
full-probe completeness vs brute force, self-exclusion, per-query rank
contract, and the no-cross-join plan shape."""

import pyspark.sql.functions as F

from clever_canal_spark.operators.similarity import (
    N_DIMS,
    brute_force_topk,
    knn_join,
    probe_masks,
)


def _emb(spark, n=60, dims=N_DIMS):
    rows = [
        (i, [(((i * 31 + j * 17) % 13) - 6) / 10.0 for j in range(dims)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_full_radius_equals_brute_force_per_query(spark):
    """radius == n_planes probes every bucket — the candidate set is the
    whole corpus, so each query's top-k must equal brute force
    row-for-row (ties by vec_id on both paths)."""
    emb = _emb(spark, n=40)
    planes = 3
    assert len(probe_masks(planes, planes)) == 1 << planes
    out = knn_join(emb, emb, k=4, n_planes=planes, radius=planes)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["dot_e9"])
        for r in out.collect()
    }
    for qid in (0, 7, 23):
        q = emb.filter(F.col("vec_id") == qid)
        want = brute_force_topk(emb, q, k=4).collect()
        for rank, w in enumerate(want, start=1):
            assert got[(qid, rank)] == (w["vec_id"], w["dot_e9"])


def test_self_match_and_exclusion(spark):
    """Full-radius probing always finds the self pair (same bucket by
    construction); exclude_self drops exactly those rows. (Self is not
    necessarily rank 1 — these fixture vectors are unnormalized, so a
    longer neighbor can out-dot a vector's own self-product.)"""
    emb = _emb(spark, n=25)
    with_self = knn_join(emb, emb, k=25, n_planes=3, radius=3)
    self_rows = [r for r in with_self.collect() if r["query_id"] == r["vec_id"]]
    assert len(self_rows) == 25  # every query sees itself as a candidate
    without = knn_join(emb, emb, k=25, n_planes=3, radius=3, exclude_self=True)
    rows = without.collect()
    assert all(r["query_id"] != r["vec_id"] for r in rows)
    assert {r["query_id"] for r in rows} == set(range(25))
    assert all(r["rank"] >= 1 for r in rows)


def test_every_query_gets_at_most_k_and_ranks_are_dense(spark):
    emb = _emb(spark, n=50)
    out = knn_join(emb, emb, k=3, n_planes=4, radius=1, exclude_self=True)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert per_q, "single-probe-radius-1 on this fixture must find candidates"
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_plan_has_no_cross_join(spark):
    """The candidate join must be an equi-join on the bucket key — never
    CartesianProduct / BroadcastNestedLoop (the whole point vs a naive
    n x m score-everything)."""
    jvm = spark.sparkContext._jvm
    emb = _emb(spark, n=30)
    out = knn_join(emb, emb, k=2, n_planes=4, radius=1)
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_precomputed_bucket_columns_match_default_path(spark):
    """A stored LSH bucket column (the persisted-index pattern) must give
    the identical result to on-the-fly bucketing — and omitting n_planes
    with a stored column is a contract error."""
    import pytest
    from clever_canal_spark.operators.similarity import lsh_bucket_expr

    emb = _emb(spark, n=35)
    pre = emb.withColumn("bkt", F.expr(lsh_bucket_expr("embedding", 4)))
    want = sorted(
        map(tuple, knn_join(emb, emb, k=3, n_planes=4, radius=1).collect())
    )
    got = sorted(
        map(
            tuple,
            knn_join(
                pre, pre, k=3, n_planes=4, radius=1,
                left_bucket_col="bkt", right_bucket_col="bkt",
            ).collect(),
        )
    )
    assert got == want
    with pytest.raises(ValueError):
        knn_join(pre, pre, k=3, right_bucket_col="bkt")
