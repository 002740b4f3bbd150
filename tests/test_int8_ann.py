"""Int8 embedding quantization + two-stage re-rank: quantization range
and hand case, integer-dot exactness, recall against brute force, and
the no-shuffle/broadcast plan shape."""

import pyspark.sql.functions as F

from clever_canal_spark.operators.similarity import (
    N_DIMS,
    brute_force_topk,
    int8_quantize,
    int8_topk_rerank,
)


def _emb(spark, n=60, dims=N_DIMS):
    # deterministic unit-ish vectors with sign variety
    rows = [
        (i, [(((i * 31 + j * 17) % 13) - 6) / 10.0 for j in range(dims)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantization_range_and_hand_case(spark):
    df = _emb(spark, n=10)
    q = int8_quantize(df).collect()
    for r in q:
        assert all(-127 <= v <= 127 for v in r["qvec"])
        assert max(abs(v) for v in r["qvec"]) == 127  # maxabs element hits full scale
    # hand case: recompute from the collected (float32-rounded) values —
    # q_j = round(x_j * 127 / max|x|), scale_e9 = round(max|x| * 1e9)
    row0 = next(r for r in df.collect() if r["vec_id"] == 0)
    ma = max(abs(x) for x in row0["embedding"])
    want = [round(x * 127 / ma) for x in row0["embedding"]]
    got = next(r for r in q if r["vec_id"] == 0)
    assert list(got["qvec"]) == want
    assert got["scale_e9"] == round(ma * 1e9)


def test_zero_vector_quantizes_to_zeros(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * N_DIMS)], "vec_id bigint, embedding array<float>"
    )
    r = int8_quantize(df).collect()[0]
    assert list(r["qvec"]) == [0] * N_DIMS
    assert r["scale_e9"] == 0


def test_rerank_matches_brute_force_at_full_rerank(spark):
    # rerank = corpus size -> stage 1 filters nothing, output must equal
    # the exact brute-force top-k row for row
    df = _emb(spark, n=60)
    query = df.filter(F.col("vec_id") == 3)
    out = int8_topk_rerank(int8_quantize(df), df, query, k=10, rerank=60).collect()
    exact = brute_force_topk(df, query, k=10).collect()
    assert [(r["vec_id"], r["dot_e9"]) for r in out] == [
        (r["vec_id"], r["dot_e9"]) for r in exact
    ]


def test_rerank_recall_with_coarse_screen(spark):
    # a real screen (rerank << n) still recovers the exact top-k here:
    # int8 preserves ordering well at these magnitudes
    df = _emb(spark, n=200)
    query = df.filter(F.col("vec_id") == 7)
    out = {r["vec_id"] for r in
           int8_topk_rerank(int8_quantize(df), df, query, k=10, rerank=40).collect()}
    exact = {r["vec_id"] for r in brute_force_topk(df, query, k=10).collect()}
    assert len(out & exact) >= 9  # >= 90% recall on this fixture


def test_stage1_plan_has_no_shuffle(spark):
    # the coarse stage must be scan + broadcast query + TakeOrdered:
    # no Exchange other than the broadcast
    df = _emb(spark, n=50)
    query = df.filter(F.col("vec_id") == 0)
    plan = int8_topk_rerank(int8_quantize(df), df, query, k=5, rerank=20)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in s
    import re
    non_broadcast_exchanges = [
        ln for ln in s.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert non_broadcast_exchanges == [], non_broadcast_exchanges


def test_matryoshka_recall_full_dim_is_exact(spark):
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.similarity import matryoshka_recall

    import random
    rng = random.Random(7)
    rows = []
    for i in range(60):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        n = sum(x * x for x in v) ** 0.5
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    out = {r["n_dims"]: r for r in matryoshka_recall(
        emb, q, dims_list=(4, 8, 16), k=10, n_dims=16).collect()}
    assert set(out) == {4, 8, 16}
    assert out[16]["recall_e6"] == 1_000_000      # full prefix == exact
    assert all(r["k_exact"] == 10 for r in out.values())
    assert 0 <= out[4]["n_hits"] <= 10
