"""Product-quantization retrieval: encode correctness, screen-then-rerank
exactness bounds, and the memory-bound plan shape (the ADC screen touches
only the codes table, never the embedding column)."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk_rerank,
    pq_codebook,
    pq_encode,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_encode_picks_nearest_codeword_by_l2(spark):
    """4-dim corpus, 2 subspaces of 2 dims, codebook from vec 0 and 2:
    vec 1 sits next to vec 0 in subspace 0 and next to vec 2 in subspace
    1 — the code must split accordingly (hand-checkable L2)."""
    rows = [
        (0, [1.0, 0.0, 1.0, 0.0]),
        (1, [0.9, 0.1, 0.1, 0.9]),
        (2, [0.0, 1.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cb = pq_codebook(df, m_subs=2, codebook_mod=2, n_dims=4)  # seeds: 0, 2
    codes = {
        (r["vec_id"], r["sub"]): r["cent_id"]
        for r in pq_encode(df, cb, m_subs=2, n_dims=4).collect()
    }
    assert codes[(1, 0)] == 0, "subspace 0 of vec 1 is nearest seed 0"
    assert codes[(1, 1)] == 2, "subspace 1 of vec 1 is nearest seed 2"
    # seeds encode to themselves in every subspace
    for s in (0, 1):
        assert codes[(0, s)] == 0 and codes[(2, s)] == 2


def test_full_rerank_equals_brute_force(spark):
    """rerank = corpus size makes the ADC screen a no-op filter — the
    output must equal brute force row-for-row (the exactness bound that
    pins the rerank stage's arithmetic)."""
    emb = _emb(spark).filter(F.col("vec_id") < 200)
    cb = pq_codebook(emb, codebook_mod=25)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") == 0)
    got = sorted(
        tuple(r) for r in pq_adc_topk_rerank(emb, codes, cb, q, k=20, rerank=200).collect()
    )
    want = sorted(tuple(r) for r in brute_force_topk(emb, q, k=20).collect())
    assert got == want


def test_screen_reads_codes_not_embeddings(spark, tmp_path):
    """The scale claim: with codes persisted, the screen stage's scan is
    the CODES parquet — the corpus file appears in the plan only via the
    rerank semi-join, and every join in the plan is broadcast."""
    emb = _emb(spark)
    cb = pq_codebook(emb, codebook_mod=25)
    codes_path = str(tmp_path / "codes.parquet")
    pq_encode(emb, cb).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    q = emb.filter(F.col("vec_id") == 0)
    out = pq_adc_topk_rerank(emb, codes, cb, q, k=10, rerank=50)
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, "PQ path must not shuffle-join"
    assert "codes.parquet" in plan
    rows = {r["vec_id"] for r in out.collect()}
    assert len(rows) == 10


def test_recall_floor_on_fixture(spark):
    """At the driver-query knobs (8 subspaces, mod-25 codebook, 100-deep
    rerank over 500 vectors) the fixture recall is 0.74 — assert a 0.6
    floor so a quantizer regression (e.g. a broken distance sign) fails
    loudly rather than shaving recall silently."""
    from clever_canal_spark.operators.similarity import topk_recall

    emb = _emb(spark)
    cb = pq_codebook(emb, codebook_mod=25)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") == 0)
    approx = pq_adc_topk_rerank(emb, codes, cb, q, k=50, rerank=100)
    exact = brute_force_topk(emb, q, k=50)
    r = topk_recall(approx, exact).collect()[0]
    assert r["recall_e6"] >= 600_000, r
