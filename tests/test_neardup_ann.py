"""Near-dup cluster resolution, multi-probe ANN recall, and the
stop-shingle DF cap's candidate-pair bound."""

import os

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.dedup import (
    minhash_signature,
    neardup_clusters,
    ngram_jaccard_pairs,
)
from clever_canal_spark.operators.similarity import (
    ann_multiprobe_topk,
    brute_force_topk,
    probe_masks,
)
from tests.conftest import SF_DIR


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_neardup_clusters_transitive(spark):
    """A~B and B~C via different buckets must land A,B,C in ONE cluster
    (connected components, not per-bucket grouping)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, "s", base),
        (2, "s", base + " x"),          # near-dup of 1
        (3, "s", base + " x yzq"),      # near-dup of 2, maybe not of 1
        (50, "s", "completely different content about spark engines and parquet files"),
    ]
    out = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(docs_df(spark, rows)).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 1, out
    assert out[50] == 50  # singleton keeps its own id


def test_neardup_clusters_exact_duplicates(spark):
    rows = [(i, "s", "identical text payload for everyone here") for i in range(10)]
    out = neardup_clusters(docs_df(spark, rows))
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_minhash_parametric_k(spark):
    sig = minhash_signature(docs_df(spark, [(1, "s", "hello world text")]), k=32)
    assert [c for c in sig.columns if c.startswith("mh")] == [f"mh{j}" for j in range(32)]


def test_probe_masks():
    m1 = probe_masks(8, 1)
    assert len(m1) == 9 and m1[0] == 0 and all(bin(m).count("1") == 1 for m in m1[1:])
    m2 = probe_masks(4, 2)
    assert len(m2) == 1 + 4 + 6
    assert len(set(m2)) == len(m2)


def test_multiprobe_recall_beats_single_probe(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0)
    brute = {r["vec_id"] for r in brute_force_topk(emb, q, k=50).collect()}
    multi = {r["vec_id"] for r in ann_multiprobe_topk(emb, q, k=50, n_planes=4, radius=2).collect()}
    recall = len(multi & brute) / 50
    # 0.82 at the driver's sf0.01; the tiny sf0.001 fixture measures 0.66
    assert recall >= 0.6, recall


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.01"), reason="sf0.01 absent")
def test_multiprobe_recall_sf001(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0)
    brute = {r["vec_id"] for r in brute_force_topk(emb, q, k=50).collect()}
    multi = {r["vec_id"] for r in ann_multiprobe_topk(emb, q, k=50, n_planes=4, radius=2).collect()}
    assert len(multi & brute) / 50 >= 0.8


def test_jaccard_df_cap_bounds_candidates(spark):
    """With a hot shingle shared by every doc, the uncapped self-join is
    quadratic; max_df must bound candidate pairs to the true near-dups."""
    hot = "aaa "  # every doc shares shingles from this prefix
    rows = [(i, "s", hot * 4 + f"unique tail {i} with words {i * 7}") for i in range(40)]
    rows += [(100, "s", "twin text that matches its twin exactly ok"),
             (101, "s", "twin text that matches its twin exactly ok")]
    df = docs_df(spark, rows)
    capped = ngram_jaccard_pairs(df, tau_num=4, tau_den=5, max_df=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {(100, 101)}
    # and the candidate universe (pre-threshold intersections) stays linear:
    # every 'aaa'-prefix shingle has df=42 > 10, so it joins nothing
    uncapped = ngram_jaccard_pairs(df, tau_num=1, tau_den=100, max_df=10)
    assert uncapped.count() < 42 * 5  # far below the ~861 all-pairs


def test_multimodal_resize_and_frame_sample(spark):
    """mapInPandas plumbing: resize preserves cardinality; frame sampling
    explodes 1:N with deterministic windows."""
    from clever_canal_spark.operators.multimodal import resize_images, sample_frames

    rows = [(i, bytes(range(256)) * (i + 1)) for i in range(6)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    rs = resize_images(df, width=32, height=32).collect()
    assert len(rs) == 7
    by_id = {r["doc_id"]: r for r in rs}
    assert len(by_id[0]["payload"]) == 32 * 32 // 64
    assert by_id[99]["payload"] == bytearray(b"")
    fr = sample_frames(df, every_n_bytes=256, max_frames=4).collect()
    per_doc = {}
    for r in fr:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert 99 not in per_doc            # null payload yields no frames
    assert len(per_doc[0]) == 1 and len(per_doc[5]) == 4  # capped at max_frames
    assert bytes(per_doc[1][1]["frame"]) == bytes(range(256))  # stride window


def test_simhash_neardup_banding_complete(spark):
    """The banded Hamming join must find EXACTLY the brute-force pair set
    (pigeonhole: radius+1 disjoint bit-slices cannot all differ within
    Hamming radius) — including on non-ASCII text (full-token hash indexes
    by character, not byte)."""
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.dedup import simhash_neardup_pairs, simhash_wide

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "der hund und die katze sind nicht da heute",
        "der hund und die katze sind nicht da morgen",   # near-dup of 2
        "été présent à la réunion après-midi détendue",
        "été présent à la réunion après-midi détendues",  # near-dup of 4 (unicode)
        "completely different content about spark engines and lakes",
        "的 是 了 在 和 有 我 不 这 中 文本 内容",
    ]
    df = spark.createDataFrame(
        [(i, t * 3) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    radius = 3
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(df, radius=radius).collect()
    }
    sig = simhash_wide(df)
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
        .collect()
    }
    assert banded == brute
    # the engineered near-dup pair is found, within the radius
    h01 = [h for a_, b_, h in brute if (a_, b_) == (0, 1)]
    assert h01 and h01[0] <= radius


# --- scale-safe cosine near-dup blocking (VERDICT r2 #3/#6) ---------------

import math

from clever_canal_spark.operators.similarity import (
    blocked_buckets,
    cosine_neardup_pairs,
    derive_n_planes,
)


def _unit_vecs(spark, n, dims=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dims))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_derive_n_planes_scales_with_corpus():
    assert derive_n_planes(500) == 4                      # fixture scale: unchanged
    assert derive_n_planes(10_000_000, 10_000) == math.ceil(math.log2(10_000_000 / 2_500))
    assert derive_n_planes(10**9, 10_000) == 19
    assert derive_n_planes(10**12, 10_000) == 29          # capped at 30 just above


def test_bucket_split_bounds_candidate_pairs(spark):
    """Skewed fixture: 1 initial plane puts ~500 rows in each of 2 buckets;
    the cap (100) must force recursive re-hashing until every final bucket
    is under it — bounding the within-bucket all-pairs count."""
    df = _unit_vecs(spark, 1000)
    b = blocked_buckets(df, n_planes=1, n_dims=8, max_bucket_rows=100, split_rounds=2)
    sizes = [r["count"] for r in b.groupBy("bucket").count().collect()]
    assert sum(sizes) == 1000
    assert max(sizes) <= 100, sorted(sizes, reverse=True)[:5]
    # candidate pairs under the cap-derived bound, far below the n^2/2 naive
    pairs = sum(s * (s - 1) // 2 for s in sizes)
    assert pairs <= len(sizes) * 100 * 99 // 2
    assert pairs < 1000 * 999 // 4


def test_identical_vectors_rejected_or_kept(spark):
    """True duplicates sit on the same side of every hyperplane — no split
    can separate them. Default rejects with a pointer to exact dedup;
    on_oversized='keep' processes the documented O(size^2) bucket."""
    import pytest

    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="exact-dedup first"):
        cosine_neardup_pairs(df, n_planes=2, n_dims=8, max_bucket_rows=20).count()
    kept = cosine_neardup_pairs(
        df, n_planes=2, n_dims=8, max_bucket_rows=20, on_oversized="keep"
    )
    assert kept.count() == 60 * 59 // 2  # identical => dot = 1e9 >= tau


def test_auto_planes_matches_explicit_at_fixture_scale(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    auto = cosine_neardup_pairs(emb)          # n_planes derived -> 4 at this size
    explicit = cosine_neardup_pairs(emb, n_planes=4)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))


def test_lsh_verified_pairs_hand_cases(spark):
    """Two-stage contract: identical docs must surface as a verified pair
    (Jaccard 1); an unrelated doc must never appear even if banding is
    generous; a candidate sharing a bucket but failing the exact test is
    filtered by the verify stage."""
    from clever_canal_spark.operators.dedup import lsh_verified_pairs

    same = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, same),
        (2, same),                       # exact dup of 1 -> verified pair
        (3, "completely different content about parquet columnar storage"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {(r["doc_a"], r["doc_b"]): r.asDict()
           for r in lsh_verified_pairs(df).collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["inter"] == out[(1, 2)]["un"]  # Jaccard exactly 1
    assert all(3 not in k for k in out)


def test_cosine_neardup_clusters_hand_case(spark):
    """Deterministic clusters: two tight groups + an isolate. Components
    must agglomerate transitively through the verified pair graph and
    label isolates with themselves."""
    import numpy as np

    from clever_canal_spark.operators.similarity import cosine_neardup_clusters

    def unit(v):
        a = np.asarray(v, dtype=float)
        return [float(x) for x in a / np.linalg.norm(a)]

    base_a = [1.0, 0.1, 0, 0, 0, 0, 0, 0]
    base_b = [0, 0, 1.0, -0.1, 0, 0, 0, 0]
    rows = [
        (0, unit(base_a)),
        (1, unit([1.0, 0.12, 0.01, 0, 0, 0, 0, 0])),   # near 0
        (2, unit([1.0, 0.08, -0.01, 0, 0, 0, 0, 0])),  # near 0 and 1
        (5, unit(base_b)),
        (6, unit([0, 0.01, 1.0, -0.08, 0, 0, 0, 0])),  # near 5
        (9, unit([0, 0, 0, 0, 0, 0, 1.0, 0])),         # isolate
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_neardup_clusters(df, tau_e9=950_000_000, n_planes=2, n_dims=8)
    got = {r.vec_id: r.cluster_id for r in out.collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[5] == got[6] == 5
    assert got[9] == 9
    assert len(got) == 6


# -- hybrid RRF fusion ---------------------------------------------------------

def test_hybrid_rrf_hand_case(spark):
    """doc 1 ranks #1 in text only, doc 2 #1 in vector only, doc 3 #2 in
    both — fusion must put the both-channels doc first."""
    from clever_canal_spark.operators.similarity import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (1, "needle needle needle haystack"),       # text #1
            (2, "nothing relevant at all right here"),  # text miss
            (3, "a needle somewhere in this text"),     # text #2
        ],
        "doc_id bigint, text string",
    )
    # unit vectors in 4 dims: q = e1; doc2 = e1 (cos 1.0), doc3 close,
    # doc1 orthogonal (vector miss at depth 2 via limit)
    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.9, 0.435889894, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    q = emb.filter("vec_id = 2").select("vec_id", "embedding")
    out = hybrid_rrf_topk(docs, emb, ["needle"], q,
                          k=3, depth=2, k_rrf=60, n_dims=4)
    rows = [(r["doc_id"], r["r_text"], r["r_vec"], r["rrf_e9"])
            for r in out.collect()]
    by_id = {r[0]: r for r in rows}
    assert by_id[3][1] == 2 and by_id[3][2] == 2          # both channels
    assert by_id[1][1] == 1 and by_id[1][2] is None       # text only
    assert by_id[2][1] is None and by_id[2][2] == 1       # vector only
    e9 = lambda r: round(1e9 / (60 + r))
    assert by_id[3][3] == e9(2) + e9(2)
    assert by_id[1][3] == e9(1) and by_id[2][3] == e9(1)
    assert rows[0][0] == 3  # fused winner: present in both channels


def test_hybrid_indexed_equals_corpus_path_at_full_radius(spark, tmp_table_dir):
    """Index-served hybrid == corpus-path hybrid when the ANN probe
    covers every bucket (radius = n_planes) — the composition contract
    of the index family."""
    import os

    from clever_canal_spark.operators.ann_index import build_lsh_index, open_ann_index
    from clever_canal_spark.operators.similarity import (
        hybrid_rrf_indexed_topk, hybrid_rrf_topk,
    )
    from clever_canal_spark.operators.text_index import build_text_index

    docs = spark.createDataFrame(
        [(i, f"word{i} shared spark" if i % 2 else f"word{i} other text")
         for i in range(12)],
        "doc_id bigint, text string",
    )
    import math
    emb = spark.createDataFrame(
        [(i, [math.cos(i / 5.0), math.sin(i / 5.0), 0.0, 0.0]) for i in range(12)],
        "vec_id bigint, embedding array<float>",
    )
    tidx = build_text_index(spark, docs, os.path.join(tmp_table_dir, "hti"))
    build_lsh_index(spark, emb, os.path.join(tmp_table_dir, "hai"),
                    n_planes=3, n_dims=4)
    aidx = open_ann_index(spark, os.path.join(tmp_table_dir, "hai"))
    q = emb.filter("vec_id = 0")
    corpus = [(r["doc_id"], r["r_text"], r["r_vec"], r["rrf_e9"]) for r in
              hybrid_rrf_topk(docs, emb, ["spark"], q, k=8, depth=6,
                              n_dims=4).collect()]
    indexed = [(r["doc_id"], r["r_text"], r["r_vec"], r["rrf_e9"]) for r in
               hybrid_rrf_indexed_topk(tidx, aidx, ["spark"], q, k=8,
                                       depth=6, radius=3).collect()]
    assert corpus == indexed and len(corpus) > 0


def test_topk_recall_hand_counts(spark):
    """Per-query recall with one perfect, one partial, and one ENTIRELY
    missed query — the missed query must still emit an n_hits=0 row
    (exact leg drives the output); arithmetic is 10^6*hits DIV k."""
    from clever_canal_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(q, v) for q, vs in [(1, [10, 11]), (2, [20, 21]), (3, [30, 31])] for v in vs],
        "query_id int, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)],  # q3 missed entirely
        "query_id int, vec_id long",
    )
    got = {
        r["query_id"]: (r["n_hits"], r["k_exact"], r["recall_e6"])
        for r in topk_recall(approx, exact, query_cols=["query_id"]).collect()
    }
    assert got == {1: (2, 2, 1000000), 2: (1, 2, 500000), 3: (0, 2, 0)}


def test_topk_recall_global_row(spark):
    """No query_cols: one global row; empty approx still yields it."""
    from clever_canal_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame([(10,), (11,), (12,), (13,)], "vec_id long")
    approx = spark.createDataFrame([(11,), (99,)], "vec_id long")
    [r] = topk_recall(approx, exact).collect()
    assert (r["n_hits"], r["k_exact"], r["recall_e6"]) == (1, 4, 250000)
    [r0] = topk_recall(approx.limit(0), exact).collect()
    assert (r0["n_hits"], r0["recall_e6"]) == (0, 0)


def test_pair_recall_hand_counts(spark):
    """Hand-pinned pair recall: 2 of 3 exact pairs found, one spurious
    approx pair ignored by recall; empty exact set -> recall 0 row."""
    from clever_canal_spark.operators.dedup import pair_recall

    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    approx = spark.createDataFrame(
        [(1, 2), (5, 6), (7, 8)], "doc_a long, doc_b long"
    )
    [r] = pair_recall(approx, exact).collect()
    assert (r["n_approx"], r["n_exact"], r["n_hits"], r["recall_e6"]) == (
        3, 3, 2, 666666,
    )
    [r0] = pair_recall(approx, exact.limit(0)).collect()
    assert (r0["n_exact"], r0["recall_e6"]) == (0, 0)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_ivf_recall_monotone_in_probes(spark):
    """The recall knob behaves: probing more inverted lists can only add
    candidates, so recall@50 is monotone in n_probes (and reaches 1.0
    when every list is probed — IVF with all lists IS brute force)."""
    from clever_canal_spark.operators.similarity import (
        brute_force_topk, ivf_topk, topk_recall,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0)
    exact = brute_force_topk(emb, q, k=50)

    def recall(n_probes):
        approx = ivf_topk(emb, q, k=50, centroid_mod=32, n_probes=n_probes)
        return topk_recall(approx, exact).collect()[0]["recall_e6"]

    n_cents = emb.filter(F.col("vec_id") % 32 == 0).count()
    r4, r8, rall = recall(4), recall(8), recall(n_cents)
    assert r4 <= r8 <= rall == 1_000_000, (r4, r8, rall)


def test_neardup_keep_best_quality_keeper(spark):
    """Keeper = highest quality, ties to smallest doc_id — NOT the min-id
    keeper. Doc 1 is a low-quality variant (no stopwords via 'the|and|of'?
    it has 'the' — so make it punct-heavy instead); doc 2 is the clean
    copy: the cluster must keep 2 even though 1 has the smaller id."""
    from clever_canal_spark.operators.dedup import neardup_keep_best

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        # punct-heavy variant: > 1 punct per 10 tokens → loses a point
        (1, "s", base + " !!! ... ;;; ,,, :::"),
        (2, "s", base + " x"),  # clean near-dup, higher quality
        (50, "s", "completely different content about spark engines and parquet files"),
    ]
    out = {r["doc_id"]: r.asDict() for r in
           neardup_keep_best(docs_df(spark, rows)).collect()}
    assert out[1]["cluster_id"] == 1 and out[2]["cluster_id"] == 1
    assert out[1]["quality"] < out[2]["quality"], out
    # the BETTER copy survives, not the smaller id
    assert out[1]["keeper_doc_id"] == 2 and out[2]["keeper_doc_id"] == 2
    assert not out[1]["keep"] and out[2]["keep"]
    # singleton keeps itself
    assert out[50]["keep"] and out[50]["keeper_doc_id"] == 50
    # equal quality → smaller id wins (deterministic tie-break)
    rows_tie = [
        (7, "s", base),
        (9, "s", base + " x"),
    ]
    tie = {r["doc_id"]: r["keeper_doc_id"] for r in
           neardup_keep_best(docs_df(spark, rows_tie)).collect()}
    assert tie[7] == 7 and tie[9] == 7, tie
    # FULL-RANGE ids (production doc_id = xxhash64, signed 64-bit): the
    # high-quality copy at a huge POSITIVE id must beat the low-quality
    # copy at a huge NEGATIVE id — a scalar quality*K - doc_id keeper key
    # would pick the negative id regardless of quality (overflow/swamp)
    big_pos, big_neg = 5_000_000_000_000_000_000, -5_000_000_000_000_000_000
    rows_big = [
        (big_neg, "s", base + " !!! ... ;;; ,,, :::"),  # low quality
        (big_pos, "s", base + " x"),                     # high quality
    ]
    bigv = {r["doc_id"]: r.asDict() for r in
            neardup_keep_best(docs_df(spark, rows_big)).collect()}
    assert bigv[big_neg]["keeper_doc_id"] == big_pos, bigv
    assert bigv[big_pos]["keep"] and not bigv[big_neg]["keep"]
