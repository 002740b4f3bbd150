"""Similarity search over embedding columns (array<float>).

Scale design:

- brute-force top-k: the query vector is a 1-row broadcast (no shuffle of
  the big side); per-row dot product is a JVM higher-order-function
  expression inside whole-stage codegen — no Python, no UDF;
- LSH bucketing: 8 deterministic hyperplanes → 8-bit bucket per vector;
  ANN = equi-join on bucket (candidates only). Hyperplane coefficients are
  small integers so the DuckDB oracle reproduces them exactly;
- all similarity outputs are scaled integers (``*_e9`` = value·10^9
  rounded per element, summed exactly) — deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_PLANES = 8
N_DIMS = 64


def plane_coeff(p: int, j: int) -> int:
    """Deterministic hyperplane coefficients in [-5, 5]."""
    return ((p * 7 + j * 13) % 11) - 5


def dot_e9_expr(a: str, b: str, n_dims: int = N_DIMS) -> str:
    """Exact scaled dot product: per-element round(a_j*b_j*1e9) summed as
    BIGINT (element_at is 1-based on both engines)."""
    return (
        f"aggregate(transform(sequence(1, {n_dims}), i -> "
        f"CAST(ROUND(CAST(element_at({a}, i) AS DOUBLE) * CAST(element_at({b}, i) AS DOUBLE) * 1e9) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def normsq_e9_expr(a: str, n_dims: int = N_DIMS) -> str:
    return dot_e9_expr(a, a, n_dims)


def embedding_norms(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", F.expr(normsq_e9_expr("embedding")).alias("normsq_e9")
    )


def brute_force_topk(
    df: DataFrame, query_df: DataFrame, k: int = 100, n_dims: int = N_DIMS
) -> DataFrame:
    """Top-k by dot product against a (broadcast) 1-row query vector.
    Embeddings are L2-normalized, so dot = cosine. Ties break by vec_id."""
    q = F.broadcast(query_df.select(F.col("embedding").alias("qvec")))
    scored = df.crossJoin(q).select(
        "vec_id", F.expr(dot_e9_expr("embedding", "qvec", n_dims)).alias("dot_e9")
    )
    return scored.orderBy(F.col("dot_e9").desc(), F.col("vec_id")).limit(k)


def plane_bit_expr(vec: str, p: int, n_dims: int = N_DIMS) -> str:
    coeffs_dot = (
        f"aggregate(transform(sequence(1, {n_dims}), i -> "
        f"CAST(ROUND((((({p}*7) + (i-1)*13) % 11) - 5) * CAST(element_at({vec}, i) AS DOUBLE) * 1e9) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return f"(CASE WHEN ({coeffs_dot}) > 0 THEN {1 << p} ELSE 0 END)"


def lsh_bucket_expr(vec: str, n_planes: int = N_PLANES, n_dims: int = N_DIMS) -> str:
    return " + ".join(plane_bit_expr(vec, p, n_dims) for p in range(n_planes))


def lsh_buckets(df: DataFrame) -> DataFrame:
    """Hyperplane-LSH bucket id per vector (the ANN blocking key)."""
    return df.select(
        "vec_id", F.expr(lsh_bucket_expr("embedding")).alias("bucket")
    )


def probe_masks(n_planes: int, radius: int) -> list[int]:
    """XOR masks for all buckets within Hamming distance ``radius`` of the
    query bucket (deterministic order: by popcount, then value)."""
    import itertools

    masks = [0]
    for r in range(1, radius + 1):
        for bits in itertools.combinations(range(n_planes), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def ann_multiprobe_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    n_planes: int = N_PLANES,
    radius: int = 1,
    bucket_col: str | None = None,
) -> DataFrame:
    """Multi-probe ANN: score vectors in the query's LSH bucket AND every
    bucket within Hamming distance ``radius`` (flip up to ``radius``
    hyperplane bits) — Σ C(n_planes, r) probes.

    Single-probe LSH has a recall cliff: near neighbors sitting just across
    one hyperplane land in a sibling bucket and are never scored. Probing
    the flip buckets recovers exactly those (the standard multi-probe LSH
    scheme). Tune (n_planes, radius) to the corpus's similarity
    concentration: weakly-clustered embeddings want fewer planes + radius 2
    (bigger candidate slice); tight clusters take more planes + radius 1.
    The probe set is a broadcast either way — never a full scan.

    ``bucket_col``: name of a precomputed bucket column on ``df`` (persist
    it once with :func:`lsh_buckets` stored alongside the vectors — the
    "index"); None recomputes the expression inline."""
    q = query_df.select(
        F.col("embedding").alias("qvec"),
        F.expr(lsh_bucket_expr("embedding", n_planes)).alias("qbucket"),
    )
    masks = probe_masks(n_planes, radius)
    probes = q.select(
        "qvec",
        F.explode(
            F.array(*[F.expr(f"CAST(qbucket AS BIGINT) ^ {m}") for m in masks])
        ).alias("probe"),
    )
    bucket = (
        F.col(bucket_col) if bucket_col else F.expr(lsh_bucket_expr("embedding", n_planes))
    )
    cand = df.withColumn("__bucket", bucket.cast("long")).join(
        F.broadcast(probes), F.col("__bucket") == F.col("probe")
    )
    scored = cand.select(
        "vec_id", F.expr(dot_e9_expr("embedding", "qvec")).alias("dot_e9")
    )
    return scored.orderBy(F.col("dot_e9").desc(), F.col("vec_id")).limit(k)


def ann_lsh_topk(df: DataFrame, query_df: DataFrame, k: int = 50) -> DataFrame:
    """ANN: score only vectors in the query's LSH bucket (candidate set),
    then exact dot-product rank within it. The bucket equi-(semi)join is the
    100-TB path — brute force stays as the small-side fallback."""
    q = query_df.select(
        F.col("embedding").alias("qvec"),
        F.expr(lsh_bucket_expr("embedding")).alias("qbucket"),
    )
    cand = df.withColumn("bucket", F.expr(lsh_bucket_expr("embedding"))).join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    )
    scored = cand.select(
        "vec_id", F.expr(dot_e9_expr("embedding", "qvec")).alias("dot_e9")
    )
    return scored.orderBy(F.col("dot_e9").desc(), F.col("vec_id")).limit(k)


# --- IVF (inverted-file) coarse quantizer --------------------------------
# The second standard ANN family next to LSH: assign every vector to its
# nearest centroid (the "inverted list"); a query probes only the nearest
# n_probes lists. Here the coarse quantizer is a deterministic sample of
# the corpus (every ``centroid_mod``-th vector) rather than k-means —
# centroid choice is a quality knob, not a correctness one, and the
# deterministic form lets the DuckDB oracle replay it exactly.


def ivf_centroids(df: DataFrame, centroid_mod: int = 32) -> DataFrame:
    return df.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )


def _require_centroids(cents: DataFrame, fn: str) -> DataFrame:
    """Empty seed set would silently empty every downstream join (the
    assignment drops all rows) — refuse loudly instead."""
    if cents.limit(1).count() == 0:
        raise ValueError(
            f"{fn}: no centroid seeds (vec_id % centroid_mod matched no "
            "rows) — lower centroid_mod or renumber vec_ids"
        )
    return cents


def ivf_assign(
    df: DataFrame,
    centroid_mod: int = 32,
    n_dims: int = N_DIMS,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cent_id): nearest centroid by exact scaled dot, ties to the
    lowest cent_id. Centroids broadcast; assignment is one map-side pass +
    a max_by agg — the index build is O(n_vectors x n_centroids) with no
    payload shuffle (vec rows shuffle as (vec_id, cent_id) pairs only).
    Callers that already computed the centroid frame pass it via ``cents``
    so the selection scan runs once, not once per consumer."""
    cents = F.broadcast(cents if cents is not None else ivf_centroids(df, centroid_mod))
    scored = df.crossJoin(cents).select(
        "vec_id",
        "cent_id",
        F.expr(dot_e9_expr("embedding", "cvec", n_dims)).alias("dot_e9"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.max_by(F.col("cent_id"), F.struct(F.col("dot_e9"), -F.col("cent_id"))).alias("cent_id"))
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    centroid_mod: int = 32,
    n_probes: int = 4,
    n_dims: int = N_DIMS,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: rank centroids against the query, take the top ``n_probes``
    lists, exact-rank their members. At scale the assignment is a persisted
    index column; the probe set is a broadcast semi-join key. ``cents``
    swaps in an externally-built coarse quantizer (cent_id, cvec) — e.g.
    the Lloyd's-trained one from :func:`kmeans_centroids`."""
    cents = cents if cents is not None else ivf_centroids(df, centroid_mod)
    q = F.broadcast(query_df.select(F.col("embedding").alias("qvec")))
    probe_cents = (
        cents.crossJoin(q)
        .select("cent_id", F.expr(dot_e9_expr("cvec", "qvec", n_dims)).alias("cdot"))
        .orderBy(F.col("cdot").desc(), F.col("cent_id"))
        .limit(n_probes)
        .select("cent_id")
    )
    assigned = ivf_assign(df, centroid_mod, n_dims, cents=cents)
    cand_ids = assigned.join(F.broadcast(probe_cents), on="cent_id").select("vec_id")
    cand = df.join(cand_ids, on="vec_id", how="left_semi")
    scored = cand.crossJoin(q).select(
        "vec_id", F.expr(dot_e9_expr("embedding", "qvec", n_dims)).alias("dot_e9")
    )
    return scored.orderBy(F.col("dot_e9").desc(), F.col("vec_id")).limit(k)


def ivf_topk_trained(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    centroid_mod: int = 32,
    n_iters: int = 2,
    n_probes: int = 4,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """IVF with a Lloyd's-trained coarse quantizer: :func:`kmeans_centroids`
    refines the deterministic seeds, then the standard probe/assign path
    runs against the trained centroids. Better list balance → higher recall
    at equal probes than the sampled-seed quantizer (measured:
    emb_ivf_trained_recall vs emb_ivf_recall). Training is integer-exact,
    so the whole path stays cross-engine verifiable."""
    cents = centroid_arrays(
        kmeans_centroids(df, centroid_mod, n_iters, n_dims), n_dims
    )
    return ivf_topk(df, query_df, k, centroid_mod, n_probes, n_dims, cents=cents)


def ivf_mean_recall(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    centroid_mod: int = 32,
    n_probes: int = 4,
    n_dims: int = N_DIMS,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Corpus-level IVF recall over a BATCH of queries (``query_df`` =
    (query_id, embedding)): one assignment pass, per-query probe sets and
    window-ranked top-k on both the approximate and exact legs, then ONE
    summary row ``(n_hits, k_exact, recall_e6)`` pooled across queries —
    the statistically meaningful version of the single-query recall
    probes (a single query's recall swings ±10 points on quantizer
    choice; the 20-query mean is stable). Eval harness, not a serving
    path: the exact leg is O(n·queries) by construction.

    ``cents`` swaps the quantizer under test (seeds vs Lloyd's-trained)
    while every other knob stays fixed — the apples-to-apples comparison
    emb_ivf_batch_recall / emb_ivf_trained_recall is built on."""
    cents = cents if cents is not None else ivf_centroids(df, centroid_mod)
    q = F.broadcast(
        query_df.select("query_id", F.col("embedding").alias("qvec"))
    )
    assigned = ivf_assign(df, centroid_mod, n_dims, cents=cents)
    w_p = Window.partitionBy("query_id").orderBy(
        F.col("cdot").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "cent_id",
            F.expr(dot_e9_expr("cvec", "qvec", n_dims)).alias("cdot"),
        )
        .withColumn("__rn", F.row_number().over(w_p))
        .filter(F.col("__rn") <= n_probes)
        .select("query_id", "cent_id")
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("dot_e9").desc(), F.col("vec_id")
    )
    approx = (
        df.join(assigned, on="vec_id")
        .join(F.broadcast(probes), on="cent_id")
        .join(q, on="query_id")
        .select(
            "query_id", "vec_id",
            F.expr(dot_e9_expr("embedding", "qvec", n_dims)).alias("dot_e9"),
        )
        .withColumn("__rn", F.row_number().over(w_k))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id")
    )
    exact = (
        df.crossJoin(q)
        .select(
            "query_id", "vec_id",
            F.expr(dot_e9_expr("embedding", "qvec", n_dims)).alias("dot_e9"),
        )
        .withColumn("__rn", F.row_number().over(w_k))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id")
    )
    hits = approx.join(exact, on=["query_id", "vec_id"], how="left_semi")
    return (
        hits.agg(F.count("*").alias("n_hits"))
        .crossJoin(exact.agg(F.count("*").alias("k_exact")))
        .select(
            "n_hits", "k_exact",
            F.expr("1000000 * n_hits DIV k_exact").alias("recall_e6"),
        )
    )


def derive_n_planes(n_rows: int, max_bucket_rows: int = 10_000) -> int:
    """Scale-aware plane count: enough hyperplanes that the EXPECTED bucket
    holds ≤ max_bucket_rows/4 rows (4× headroom for non-uniform buckets),
    floored at 4 (the fixture-scale default) and capped at 30."""
    import math

    target = max(max_bucket_rows // 4, 1)
    if n_rows <= target:
        return 4
    return min(30, max(4, math.ceil(math.log2(n_rows / target))))


def blocked_buckets(
    df: DataFrame,
    n_planes: int,
    n_dims: int = N_DIMS,
    max_bucket_rows: int | None = None,
    split_rounds: int = 2,
    split_planes: int = 4,
) -> DataFrame:
    """(vec_id, embedding, bucket) with a per-bucket row cap enforced by
    recursive re-hashing: buckets over ``max_bucket_rows`` get
    ``split_planes`` MORE hyperplanes appended (bucket' = bucket·2^s +
    extra bits — collision-free vs unsplit buckets since an original
    bucket is either split or not), up to ``split_rounds`` times. Rows
    whose vectors are (near-)identical never separate — by construction
    they sit on the same side of every hyperplane — so the cap cannot be
    enforced for true duplicate blow-ups; callers decide (see
    ``cosine_neardup_pairs`` ``on_oversized``). Each round costs one small
    aggregate over (bucket, count) — only the oversized bucket ids (not
    rows) ever reach the driver, and the corpus hash pass runs ONCE (a
    lazy localCheckpoint materialized by the first count serves every
    later count and the caller's self-join)."""
    b, _ = _blocked_buckets_counted(
        df, n_planes, n_dims, max_bucket_rows, split_rounds, split_planes
    )
    return b


def _blocked_buckets_counted(
    df: DataFrame,
    n_planes: int,
    n_dims: int,
    max_bucket_rows: int | None,
    split_rounds: int,
    split_planes: int = 4,
) -> "tuple[DataFrame, list]":
    """blocked_buckets plus the FINAL (bucket, count) oversized rows, so a
    caller enforcing a hard cap reuses the loop's own last count instead
    of re-aggregating the corpus (r3 review: the raise-check and each
    split round were each re-deriving every LSH plane expression)."""
    b = df.select(
        "vec_id", "embedding",
        F.expr(lsh_bucket_expr("embedding", n_planes, n_dims)).cast("long").alias("bucket"),
    )
    if max_bucket_rows is None:
        return b, []
    # one corpus scan total: the first count materializes this checkpoint;
    # every later count and the caller's self-join read the stored rows
    b = b.localCheckpoint(eager=False)

    def _oversized(x: DataFrame) -> list:
        return (
            x.groupBy("bucket").count()
            .filter(F.col("count") > max_bucket_rows)
            .collect()
        )

    over = _oversized(b)
    offset = n_planes
    for _ in range(split_rounds):
        if not over:
            break
        ids = [r["bucket"] for r in over]
        extra = " + ".join(
            # extra planes continue the deterministic coefficient family at
            # ``offset`` but shift into the LOW bits of the widened bucket
            plane_bit_expr("embedding", offset + j, n_dims).replace(
                f"THEN {1 << (offset + j)}", f"THEN {1 << j}"
            )
            for j in range(split_planes)
        )
        b = b.withColumn(
            "bucket",
            F.col("bucket") * (1 << split_planes)
            + F.when(F.col("bucket").isin(ids), F.expr(extra)).otherwise(F.lit(0)),
        )
        offset += split_planes
        over = _oversized(b)
    return b, over


def cosine_neardup_pairs(
    df: DataFrame,
    tau_e9: int = 300_000_000,
    n_planes: int | None = None,
    n_dims: int = N_DIMS,
    max_bucket_rows: int = 10_000,
    split_rounds: int = 2,
    on_oversized: str = "raise",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH bucket as the blocking key
    (same-bucket pairs only — never the n² cross join), exact scaled-dot
    threshold inside the bucket. Unit-normalized embeddings → dot =
    cosine; tau_e9 = cosine·1e9.

    Scale safety (VERDICT r2 #3): ``n_planes=None`` derives the plane
    count from the corpus size (one count job) so the expected bucket
    stays ≤ ~max_bucket_rows/4; buckets that still exceed
    ``max_bucket_rows`` (skew) are recursively re-hashed with extra
    planes up to ``split_rounds`` times. If a bucket is STILL oversized
    after that — which for unit vectors means (near-)identical rows that
    no hyperplane separates — ``on_oversized='raise'`` rejects with the
    offending bucket sizes (run exact dedup first), ``'keep'`` proceeds
    with the documented O(size²) cost inside those buckets."""
    if on_oversized not in ("raise", "keep"):
        raise ValueError("on_oversized must be 'raise' or 'keep'")
    if n_planes is None:
        n_planes = derive_n_planes(df.count(), max_bucket_rows)
    # the split loop's own final count doubles as the raise-check — no
    # second corpus aggregation; the checkpointed blocking output feeds
    # both sides of the self-join without re-deriving the plane exprs
    b, still = _blocked_buckets_counted(
        df, n_planes, n_dims, max_bucket_rows, split_rounds
    )
    if on_oversized == "raise" and still:
        sizes = {r["bucket"]: r["count"] for r in still[:10]}
        raise ValueError(
            f"{len(still)} bucket(s) exceed max_bucket_rows={max_bucket_rows} "
            f"after {split_rounds} split rounds (likely near-identical "
            f"vectors — exact-dedup first, or pass on_oversized='keep'): "
            f"{sizes}"
        )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.expr(dot_e9_expr("a.embedding", "c.embedding", n_dims)).alias("dot_e9"),
        )
        .filter(F.col("dot_e9") >= tau_e9)
    )


def cosine_neardup_clusters(
    df: DataFrame,
    tau_e9: int = 300_000_000,
    n_planes: int | None = None,
    n_dims: int = N_DIMS,
    max_bucket_rows: int = 10_000,
    split_rounds: int = 2,
    on_oversized: str = "raise",
    max_iter: int = 20,
) -> DataFrame:
    """Embedding near-dup CLUSTER resolution: the verified cosine pairs
    (``cosine_neardup_pairs`` — LSH-blocked candidates, exact scaled-dot
    threshold) become the edge set of a min-label connected-components
    pass → (vec_id, cluster_id), cluster_id = the component's min vec_id
    (the keeper). The embedding twin of ``dedup.neardup_clusters``: the
    MinHash variant trusts bucket co-membership, this one only links
    pairs that PASSED the exact threshold — agglomerative near-dup at
    cosine ≥ tau. Edge count is bounded by the pairs output (itself
    bucket-capped), the loop is the shared observation-resolved
    fixpoint; rounds = component diameter."""
    from .dedup import _free_checkpoint, min_label_components

    pairs = cosine_neardup_pairs(
        df,
        tau_e9=tau_e9,
        n_planes=n_planes,
        n_dims=n_dims,
        max_bucket_rows=max_bucket_rows,
        split_rounds=split_rounds,
        on_oversized=on_oversized,
    )
    ids = df.select(F.col("vec_id").alias("doc_id"))
    # materialize the (small) edge set so the bidirectional union inside
    # min_label_components reuses it — unioning the raw plan would run
    # the bucket join + exact dot filter once PER BRANCH (same reasoning
    # as dedup.neardup_clusters' pre-loop checkpoint)
    edges = pairs.select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    ).localCheckpoint()
    out = min_label_components(ids, edges, max_iter=max_iter)
    _free_checkpoint(edges)
    return out.select(F.col("doc_id").alias("vec_id"), "cluster_id")


def _require_one_query_row(query_df: DataFrame, fn: str) -> None:
    # both hybrid shapes fuse exactly one query's two channels; a
    # multi-row query_df would silently merge unrelated queries into one
    # garbage ranking (the batched contract lives in ann_index)
    if query_df.limit(2).count() != 1:
        raise ValueError(f"{fn} takes exactly ONE query row; "
                         "batch queries via ann_index.ann_indexed_topk")


def _rrf_fuse(t_ranks: DataFrame, v_ranks: DataFrame, k: int, k_rrf: int) -> DataFrame:
    """Fuse per-channel integer ranks: rrf_e9 = Σ ROUND(1e9/(k_rrf+r))
    over the channels that returned the doc — ONE definition, so the
    corpus path and the index path cannot drift from each other or from
    the shared oracle SQL."""
    rrf = (
        "COALESCE(CAST(ROUND(1e9 / CAST({k} + r_text AS DOUBLE)) AS BIGINT), 0)"
        " + COALESCE(CAST(ROUND(1e9 / CAST({k} + r_vec AS DOUBLE)) AS BIGINT), 0)"
    ).format(k=k_rrf)
    return (
        t_ranks.join(v_ranks, "doc_id", "full_outer")
        .select("doc_id", "r_text", "r_vec", F.expr(rrf).alias("rrf_e9"))
        .orderBy(F.col("rrf_e9").desc(), F.col("doc_id"))
        .limit(k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_df: DataFrame,
    k: int = 25,
    depth: int = 100,
    k_rrf: int = 60,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranks fused with cosine vector
    ranks by reciprocal-rank fusion (RRF, Cormack et al. 2009) —
    ``score = Σ 1/(k_rrf + rank)`` over the channels that returned the
    doc. The modern search default: lexical recall catches what the
    embedding misses and vice versa, and rank fusion needs no score
    calibration between channels.

    Exact across engines: both channels' ranks are integers (each
    channel's own tie-break: score desc, id asc); the fused score is
    emitted as ``rrf_e9`` = Σ ROUND(1e9/(k_rrf+rank)) — double division
    of exact small ints, deterministic everywhere. Per-channel ranks are
    returned (NULL when a channel missed the doc) so downstream can
    re-fuse with different k_rrf without re-running retrieval.

    Scale shape: each channel is its own top-``depth`` (BM25: shuffle-
    free corpus pass; cosine: broadcast-1-row + TakeOrdered), so the
    fusion join touches 2·depth rows — driver-trivial regardless of
    corpus size. ``vec_id`` is the embedding row's document id (the
    documents↔embeddings contract used by emb_filtered_topk)."""
    from .text import bm25_topk

    _require_one_query_row(query_df, "hybrid_rrf_topk")
    w_t = Window.orderBy(F.col("score_e6").desc(), F.col("doc_id"))
    t_ranks = (
        bm25_topk(docs, terms, k=depth)
        .select("doc_id", F.row_number().over(w_t).alias("r_text"))
    )
    w_v = Window.orderBy(F.col("dot_e9").desc(), F.col("vec_id"))
    v_ranks = (
        brute_force_topk(emb, query_df, k=depth, n_dims=n_dims)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(w_v).alias("r_vec"),
        )
    )
    return _rrf_fuse(t_ranks, v_ranks, k, k_rrf)


def hybrid_rrf_indexed_topk(
    text_index,
    ann_index,
    terms: list[str],
    query_df: DataFrame,
    k: int = 25,
    depth: int = 100,
    k_rrf: int = 60,
    radius: int = 1,
) -> DataFrame:
    """:func:`hybrid_rrf_topk` served ENTIRELY from persisted indexes —
    the index-family composition: the text channel is a bucket-pruned
    BM25 probe (`text_index.probe_bm25`), the vector channel a
    multi-probe read of the LSH ANN index (`ann_index.ann_indexed_topk`)
    — the corpus is never scanned at query time, and both indexes stay
    current by tailing the same lake changelog.

    ``radius`` trades vector recall for probe cost exactly as in
    `ann_indexed_topk`; at ``radius = n_planes`` the probe set covers
    every bucket and the fused output is row-identical to the
    corpus-path :func:`hybrid_rrf_topk` (the tested/oracled setting —
    production picks a smaller radius and accepts ANN recall)."""
    from .ann_index import ann_indexed_topk
    from .text_index import probe_bm25

    _require_one_query_row(query_df, "hybrid_rrf_indexed_topk")
    w_t = Window.orderBy(F.col("score_e6").desc(), F.col("doc_id"))
    t_ranks = (
        probe_bm25(text_index, terms, k=depth)
        .select("doc_id", F.row_number().over(w_t).alias("r_text"))
    )
    q = query_df.select(F.lit(0).cast("long").alias("query_id"), "embedding")
    w_v = Window.orderBy(F.col("dot_e9").desc(), F.col("vec_id"))
    v_ranks = (
        ann_indexed_topk(ann_index, q, k=depth, radius=radius)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(w_v).alias("r_vec"),
        )
    )
    return _rrf_fuse(t_ranks, v_ranks, k, k_rrf)


def int8_maxabs_expr(vec: str) -> str:
    """Per-vector max |x| (the int8 quantization scale denominator)."""
    return (
        f"aggregate(transform({vec}, x -> abs(CAST(x AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (a, x) -> greatest(a, x))"
    )


def int8_qvec_expr(vec: str, n_dims: int = N_DIMS) -> str:
    """Symmetric int8 quantization: q_j = round(x_j * 127 / max|x|), in
    [-127, 127] (zero vector -> all zeros). ROUND on DOUBLE rounds half
    away from zero on both engines — same convention the e9 dot relies
    on. DuckDB twin transcribes with list_transform/list_max."""
    ma = int8_maxabs_expr(vec)
    return (
        f"transform(sequence(1, {n_dims}), i -> CAST(CASE WHEN {ma} = 0 THEN 0 "
        f"ELSE ROUND(CAST(element_at({vec}, i) AS DOUBLE) * 127 / {ma}) END AS INT))"
    )


def int8_dot_expr(a: str, b: str) -> str:
    """Integer dot product of two quantized vectors — pure BIGINT
    arithmetic, bit-identical across engines by construction."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )


def int8_quantize(df: DataFrame, n_dims: int = N_DIMS) -> DataFrame:
    """Quantize a float embedding column to int8: ``(vec_id, qvec,
    scale_e9)`` where ``x_j ~ qvec_j * (scale_e9/1e9) / 127``. This is
    the BUILD step — run once and persist (a LakeTable column, exactly
    like the ANN index's bucket column); queries take the stored form.
    At 100 TB the point is memory/IO: int8 is 4x smaller than float32
    (a production layout additionally packs the array to a 64-byte
    binary — the arithmetic below is layout-independent), so the
    first-stage scan streams 4x more vectors per second off the same
    hardware."""
    return df.select(
        "vec_id",
        F.expr(int8_qvec_expr("embedding", n_dims)).alias("qvec"),
        F.expr(f"CAST(ROUND({int8_maxabs_expr('embedding')} * 1e9) AS BIGINT)").alias(
            "scale_e9"
        ),
    )


def int8_topk_rerank(
    quantized: DataFrame,
    full: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    rerank: int = 200,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Two-stage ANN: coarse top-``rerank`` by INTEGER dot over the
    pre-quantized corpus (``int8_quantize`` output — NOT rebuilt per
    query), then exact e9-scaled re-rank of just those candidates from
    the full-precision table. Output ``(vec_id, dot_e9)``, k rows.

    Plan shape: the 1-row query is quantized inline and broadcast; stage
    1 is a single scan of the (4x smaller) quantized column + TakeOrdered
    — no shuffle; stage 2 broadcasts the ``rerank`` candidate ids as a
    semi-join onto the full table (bucket-pruned via ``LakeTable.lookup``
    when the corpus lives in a lake table), so full-precision vectors are
    read for candidates only. Both stages break ties by vec_id —
    deterministic end to end, which is what lets a DuckDB oracle
    hash-match an ANN query."""
    _require_one_query_row(query_df, "int8_topk_rerank")
    q = F.broadcast(
        query_df.select(
            F.expr(int8_qvec_expr("embedding", n_dims)).alias("q_qvec"),
            F.col("embedding").alias("q_full"),
        )
    )
    cand = (
        quantized.crossJoin(q)
        .select("vec_id", F.expr(int8_dot_expr("qvec", "q_qvec")).alias("qdot"))
        .orderBy(F.col("qdot").desc(), F.col("vec_id"))
        .limit(rerank)
    )
    return (
        full.join(F.broadcast(cand.select("vec_id")), "vec_id", "left_semi")
        .crossJoin(q)
        .select(
            "vec_id",
            F.expr(dot_e9_expr("embedding", "q_full", n_dims)).alias("dot_e9"),
        )
        .orderBy(F.col("dot_e9").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- product quantization (PQ) --------------------------------------------
#
# The memory-bound scale path past int8: the screen stage reads M small
# integers per vector (the code) instead of the embedding — at M=8 over
# 64 float dims that is 256 bytes → 8 code entries per row riding the
# scan, and the asymmetric-distance computation (ADC) is a broadcast
# lookup-table join + one sum per vector. Codebooks are deterministic
# corpus seeds (every ``codebook_mod``-th vector's subvector), same
# family as ivf_centroids — quantizer quality is a knob, correctness
# (and the DuckDB oracle) doesn't depend on it.

PQ_M = 8  # subspaces; each spans n_dims // PQ_M contiguous dims


def pq_codebook(
    df: DataFrame, m_subs: int = PQ_M, codebook_mod: int = 25, n_dims: int = N_DIMS
) -> DataFrame:
    """(sub, cent_id, cw): per-subspace codeword table from deterministic
    corpus seeds. Tiny (m_subs · n/codebook_mod rows) — always broadcast."""
    d = n_dims // m_subs
    seeds = df.filter(F.col("vec_id") % codebook_mod == 0)
    subs = df.sparkSession.range(m_subs).select(F.col("id").cast("int").alias("sub"))
    return seeds.crossJoin(F.broadcast(subs)).select(
        "sub",
        F.col("vec_id").alias("cent_id"),
        F.expr(f"slice(embedding, sub * {d} + 1, {d})").alias("cw"),
    )


def pq_encode(
    df: DataFrame, codebook: DataFrame, m_subs: int = PQ_M, n_dims: int = N_DIMS
) -> DataFrame:
    """(vec_id, sub, cent_id): nearest codeword per subspace by exact
    scaled L2 (||c||² − 2·x·c, both e9 integers — the ||x||² term is
    constant per (vec_id, sub) and drops out of the argmin). One-time
    O(n · m_subs · K) build, broadcast codebook, min_by agg — the encode
    twin of ivf_assign; codes are what the ADC screen scans instead of
    embeddings."""
    d = n_dims // m_subs
    dist = (
        f"({normsq_e9_expr('cw', d)}) - 2 * "
        f"({dot_e9_expr(f'slice(embedding, sub * {d} + 1, {d})', 'cw', d)})"
    )
    return (
        df.crossJoin(F.broadcast(codebook))
        .select("vec_id", "sub", "cent_id", F.expr(dist).alias("__dist"))
        .groupBy("vec_id", "sub")
        .agg(
            F.min_by("cent_id", F.struct(F.col("__dist"), F.col("cent_id"))).alias(
                "cent_id"
            )
        )
    )


def pq_adc_topk_rerank(
    df: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    query_df: DataFrame,
    k: int = 50,
    rerank: int = 100,
    m_subs: int = PQ_M,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Two-stage PQ retrieval: (1) ADC screen — per-query lookup table
    T[sub, codeword] = subquery·codeword (m_subs·K rows, broadcast), then
    approx dot(q, x) ≈ Σ_sub T[sub, code_x[sub]] as a broadcast join +
    sum over the CODES table (embeddings never read); top-``rerank`` by
    (adc DESC, vec_id). (2) exact e9 re-rank of just those candidates
    from the full-precision table. Deterministic end to end — the DuckDB
    oracle hash-matches the whole screen-then-rerank pipeline."""
    _require_one_query_row(query_df, "pq_adc_topk_rerank")
    d = n_dims // m_subs
    q = F.broadcast(query_df.select(F.col("embedding").alias("q_full")))
    qtab = F.broadcast(
        codebook.crossJoin(q).select(
            "sub",
            "cent_id",
            F.expr(
                dot_e9_expr(f"slice(q_full, sub * {d} + 1, {d})", "cw", d)
            ).alias("qdot"),
        )
    )
    screened = (
        codes.join(qtab, on=["sub", "cent_id"])
        .groupBy("vec_id")
        .agg(F.sum("qdot").alias("adc_e9"))
        .orderBy(F.col("adc_e9").desc(), F.col("vec_id"))
        .limit(rerank)
    )
    return (
        df.join(F.broadcast(screened.select("vec_id")), "vec_id", "left_semi")
        .crossJoin(q)
        .select(
            "vec_id",
            F.expr(dot_e9_expr("embedding", "q_full", n_dims)).alias("dot_e9"),
        )
        .orderBy(F.col("dot_e9").desc(), F.col("vec_id"))
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    radius: int = 1,
    exclude_self: bool = False,
    n_dims: int = N_DIMS,
    max_bucket_rows: int = 10_000,
    left_bucket_col: str | None = None,
    right_bucket_col: str | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor JOIN: for EVERY row of ``left``,
    the top-k ``right`` rows by cosine — the corpus x corpus shape
    (training-pair mining, hard-negative sampling, cross-corpus near-dup
    linking, retrieval eval) that the query-batch ANN ops cannot serve:
    they broadcast the query side (``ann_multiprobe_topk``,
    ``ann_indexed_topk``), which caps it at driver-memory scale. Here
    BOTH sides are corpus-sized.

    Scale shape — never a cross join:

    - each side gets the deterministic hyperplane bucket
      (``lsh_bucket_expr``), computed in one projection;
    - the left expands by the multi-probe XOR masks (sum C(n_planes, r),
      r <= radius — a bounded constant, broadcast-free ``explode``), so
      a neighbor just across one hyperplane is still found;
    - candidates come from ONE integer equi-join (shuffle hash join on
      the bucket key); AQE's skew-join split handles hot buckets;
    - per-left top-k is one ``row_number`` window partitioned by the
      left id — bounded by that row's own candidate count, never a
      global sort. Ties break by (dot desc, vec_id), so results are
      deterministic and a DuckDB oracle can hash-match them.

    Recall follows multi-probe LSH: with the defaults a true neighbor is
    missed only when it differs in >= radius+1 hyperplane signs.
    ``n_planes=None`` derives the plane count from the RIGHT corpus size
    (``derive_n_planes``, expected bucket <= max_bucket_rows/4): more
    planes = smaller buckets = cheaper join but lower recall per probe —
    compensate with ``radius`` when the space is weakly clustered.
    Left rows expand by the probe count, so the left shuffle carries
    (probes x rows) skinny (id, qvec, bucket) rows — for radius 1 with 8
    planes that is 9x, still linear, never quadratic.

    ``exclude_self=True`` drops same-vec_id matches (the self-join form:
    nearest OTHER neighbors within one corpus).

    ``left_bucket_col`` / ``right_bucket_col``: a PRECOMPUTED bucket
    column on that side (the persisted-index pattern — e.g. an LSH
    LakeTable built by ``ann_index.build_lsh_index``), skipping the
    bucket projection here. The stored buckets must come from the same
    ``(n_planes, n_dims)`` hyperplane family, and ``n_planes`` must then
    be passed explicitly (it sizes the probe-mask set).

    Output: (query_id, vec_id, dot_e9, rank) — rank 1..k per query_id.
    """
    if n_planes is None:
        if left_bucket_col or right_bucket_col:
            raise ValueError(
                "precomputed bucket columns need an explicit n_planes "
                "(the probe masks must match the stored hyperplane count)"
            )
        n_planes = derive_n_planes(right.count(), max_bucket_rows)
    masks = probe_masks(n_planes, radius)
    bexpr = lsh_bucket_expr("embedding", n_planes, n_dims)
    rbucket = (
        F.col(right_bucket_col) if right_bucket_col else F.expr(bexpr)
    )
    lbucket = F.col(left_bucket_col) if left_bucket_col else F.expr(bexpr)
    r = right.select(
        F.col("vec_id"),
        F.col("embedding").alias("rvec"),
        rbucket.alias("bucket"),
    )
    probes = (
        left.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            lbucket.alias("qbucket"),
        )
        .withColumn("__m", F.explode(F.array(*[F.lit(m) for m in masks])))
        .select(
            "query_id",
            "qvec",
            F.expr("CAST(qbucket AS INT) ^ CAST(__m AS INT)").alias("bucket"),
        )
    )
    cand = probes.join(r, on="bucket").select(
        "query_id",
        "vec_id",
        F.expr(dot_e9_expr("rvec", "qvec", n_dims)).alias("dot_e9"),
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_e9").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot_e9", "rank")
    )


def semdedup_keepers(
    df: DataFrame,
    centroid_mod: int = 32,
    tau_e9: int = 300_000_000,
    n_dims: int = N_DIMS,
    max_cell_rows: int = 10_000,
    on_oversized: str = "raise",
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means-cell blocking — duplicates are only sought WITHIN a cell
    (accepting cross-cell misses, the paper's trade), pairs at cosine ≥
    tau form duplicate groups, and one representative per group survives.
    Returns (vec_id, cent_id, cluster_id, keep) — keeper = the group's
    min vec_id (deterministic; the paper's low-centroid-similarity pick
    is a policy swap on the same grouping).

    Scale shape: centroids are a fixed 1/centroid_mod fraction of the
    corpus, so the EXPECTED cell size is ~centroid_mod however big the
    corpus — the within-cell pair join is O(n·centroid_mod), never n².
    A dense region can still overflow a cell: cells above
    ``max_cell_rows`` raise by default (``on_oversized='keep'`` accepts
    the documented O(size²) inside them). Assignment is the same
    broadcast argmax as :func:`ivf_assign` (payload never rides the
    shuffle until the single tag join); components resolve via the
    shared observation-resolved min-label loop."""
    if on_oversized not in ("raise", "keep"):
        raise ValueError("on_oversized must be 'raise' or 'keep'")
    from .dedup import _free_checkpoint, min_label_components

    cents = _require_centroids(ivf_centroids(df, centroid_mod), "semdedup_keepers")
    assigned = ivf_assign(df, centroid_mod, n_dims, cents=cents)
    # one materialization: the self-join below would otherwise recompute
    # the O(n·centroids) assignment once per branch. The returned plan
    # also reads it, so it is NOT freed here — the ContextCleaner GCs the
    # blocks once the caller drops the result (one-shot-operator pattern,
    # same as cosine_neardup_pairs' blocking checkpoint).
    tagged = df.join(assigned, on="vec_id").localCheckpoint()
    if on_oversized == "raise":
        big = (
            tagged.groupBy("cent_id").count()
            .filter(F.col("count") > max_cell_rows).limit(10).collect()
        )
        if big:
            sizes = {r["cent_id"]: r["count"] for r in big}
            raise ValueError(
                f"cell(s) exceed max_cell_rows={max_cell_rows} (dense "
                f"region or duplicate blow-up — exact-dedup first, raise "
                f"centroid_mod, or pass on_oversized='keep'): {sizes}"
            )
    a, c = tagged.alias("a"), tagged.alias("c")
    pairs = (
        a.join(c, (F.col("a.cent_id") == F.col("c.cent_id"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(
            F.col("a.vec_id").alias("pa"),
            F.col("c.vec_id").alias("pb"),
            F.expr(dot_e9_expr("a.embedding", "c.embedding", n_dims)).alias("dot_e9"),
        )
        .filter(F.col("dot_e9") >= tau_e9)
    )
    edges = pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b")).localCheckpoint()
    try:
        ids = df.select(F.col("vec_id").alias("doc_id"))
        comps = min_label_components(ids, edges, max_iter=max_iter)
    finally:
        _free_checkpoint(edges)
    return (
        tagged.select("vec_id", "cent_id")
        .join(comps.withColumnRenamed("doc_id", "vec_id"), on="vec_id")
        .select(
            "vec_id", "cent_id", "cluster_id",
            (F.col("cluster_id") == F.col("vec_id")).alias("keep"),
        )
    )


def kmeans_centroids(
    df: DataFrame,
    centroid_mod: int = 32,
    n_iters: int = 2,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Spherical k-means (Lloyd's) refinement of the deterministic IVF
    seeds — the trained-centroid upgrade for :func:`ivf_assign` /
    ``ann_index.build_ivf_index`` (on unit vectors argmax-cosine ==
    argmin-euclidean, so the assignment step reuses the exact scaled-dot
    machinery). Returns (cent_id, dim, mean_e9): each refined centroid as
    per-dimension BIGINT e9 means — integer-exact, so a SQL twin
    reproduces training bit-for-bit. ``centroid_arrays`` rebuilds the
    array form for probing.

    Per iteration: one broadcast argmax assignment (payload never
    shuffles; (vec_id, cent_id) pairs only), then per-dimension sums via
    posexplode — n·d narrow rows that partial-aggregate map-side to
    ≤ centroids·d rows per partition. Empty clusters keep their previous
    centroid (deterministic). Centroids re-broadcast each round from a
    localCheckpoint so the loop's plan stays flat."""
    from ..ckpt import free_checkpoint

    cents = _require_centroids(
        ivf_centroids(df, centroid_mod), "kmeans_centroids"
    ).select(
        "cent_id", F.expr("transform(cvec, x -> CAST(x AS DOUBLE))").alias("cvec")
    )
    prev = None
    for _ in range(n_iters):
        c = F.broadcast(cents)
        assigned = (
            df.crossJoin(c)
            .select(
                "vec_id", "cent_id",
                F.expr(dot_e9_expr("embedding", "cvec", n_dims)).alias("d"),
            )
            .groupBy("vec_id")
            .agg(F.max_by("cent_id", F.struct(F.col("d"), -F.col("cent_id"))).alias("cent_id"))
        )
        sums = (
            df.join(assigned, on="vec_id")
            .select("cent_id", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cent_id", "dim")
            .agg(
                F.sum(F.expr("CAST(ROUND(CAST(v AS DOUBLE) * 1e9) AS BIGINT)")).alias("s_e9"),
                F.count("*").alias("n"),
            )
        )
        new = (
            sums.select("cent_id", "dim", F.expr("s_e9 DIV n").alias("m_e9"))
            .groupBy("cent_id")
            .agg(F.map_from_arrays(F.collect_list("dim"), F.collect_list("m_e9")).alias("mm"))
            .select(
                "cent_id",
                F.expr(
                    f"transform(sequence(0, {n_dims - 1}),"
                    " i -> CAST(element_at(mm, i) AS DOUBLE) / 1e9)"
                ).alias("new_cvec"),
            )
        )
        cents = (
            cents.join(new, on="cent_id", how="left")
            .select("cent_id", F.coalesce("new_cvec", "cvec").alias("cvec"))
            .localCheckpoint()
        )
        if prev is not None:
            free_checkpoint(prev)
        prev = cents
    return cents.select(
        "cent_id", F.posexplode("cvec").alias("dim", "m")
    ).select(
        "cent_id", "dim",
        F.expr("CAST(ROUND(m * 1e9) AS BIGINT)").alias("mean_e9"),
    )


def centroid_arrays(centroids_long: DataFrame, n_dims: int = N_DIMS) -> DataFrame:
    """(cent_id, dim, mean_e9) → (cent_id, cvec array<double>) for use as
    the centroid side of :func:`ivf_assign`-style probes."""
    return (
        centroids_long.groupBy("cent_id")
        .agg(F.map_from_arrays(F.collect_list("dim"), F.collect_list("mean_e9")).alias("mm"))
        .select(
            "cent_id",
            F.expr(
                f"transform(sequence(0, {n_dims - 1}),"
                " i -> CAST(element_at(mm, i) AS DOUBLE) / 1e9)"
            ).alias("cvec"),
        )
    )


def centroid_affinity(
    df: DataFrame,
    centroid_mod: int = 32,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """(vec_id, cent_id, affinity_e9): each vector's exact scaled cosine
    to its NEAREST centroid — the prototypicality signal (low affinity =
    outlier / novel content; SemDeDup ranks within-cluster keepers by
    exactly this). One broadcast argmax pass, same shape as
    :func:`ivf_assign`, payload never shuffles."""
    cents = F.broadcast(
        _require_centroids(ivf_centroids(df, centroid_mod), "centroid_affinity")
    )
    scored = df.crossJoin(cents).select(
        "vec_id",
        "cent_id",
        F.expr(dot_e9_expr("embedding", "cvec", n_dims)).alias("dot_e9"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(F.col("cent_id"), F.col("dot_e9")),
                F.struct(F.col("dot_e9"), -F.col("cent_id")),
            ).alias("__w")
        )
        .select(
            "vec_id",
            F.col("__w.cent_id").alias("cent_id"),
            F.col("__w.dot_e9").alias("affinity_e9"),
        )
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str = "vec_id",
    query_cols: list[str] | None = None,
) -> DataFrame:
    """Recall of an approximate top-k result against the exact one — the
    honesty metric every ANN knob (planes, radius, probes, rerank depth)
    should be tuned against, as a first-class operator instead of a
    number quoted in docs. Returns one row per query (``query_cols``
    from batched probes) or one global row: ``(n_hits, k_exact,
    recall_e6)`` with ``recall_e6 = 10⁶·n_hits DIV k_exact`` —
    integer-exact, so a DuckDB oracle hash-matches.

    Queries the approximate leg missed ENTIRELY still appear (exact leg
    drives the output; n_hits 0) — a silent empty result is the worst
    ANN failure mode and must not vanish from its own evaluation.
    Both inputs are top-k frames (≤ queries×k rows); the hit semi-join
    and the per-query counts are bounded by them, never by the corpus."""
    qcols = list(query_cols or [])
    on = qcols + [id_col]
    hits = (
        approx.select(*on)
        .join(exact.select(*on), on=on, how="left_semi")
        .groupBy(*qcols)
        .agg(F.count("*").alias("n_hits"))
    )
    totals = exact.groupBy(*qcols).agg(F.count("*").alias("k_exact"))
    joined = (
        totals.join(hits, on=qcols, how="left") if qcols
        else totals.crossJoin(hits.select(F.col("n_hits").alias("__nh")))
        .withColumn("n_hits", F.coalesce(F.col("__nh"), F.lit(0)))
        .drop("__nh")
    )
    if qcols:
        joined = joined.withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
    return joined.select(
        *qcols,
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("k_exact").cast("long").alias("k_exact"),
        F.expr("CAST(1000000 AS BIGINT) * n_hits DIV k_exact").alias("recall_e6"),
    )


def hard_negative_mine(
    df: DataFrame,
    pairs: DataFrame,
    k: int = 10,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Hard-negative mining for embedding-model training: per query, the
    top-``k`` most-similar corpus vectors EXCLUDING the query itself and
    its labeled positives (``pairs`` = (query_id, pos_id)) — the
    contrastive-training data-prep step (in-batch negatives are easy;
    the informative ones are the near-misses this mines). Output
    (query_id, neg_id, dot_e9, rank), rank 1 = hardest.

    Corpus-path shape: queries broadcast (tiny), one scored pass over
    the corpus, per-query window rank bounded by k + exclusions. The
    exclusion anti-join is against the (tiny, broadcast) pairs frame —
    never a corpus-sized side. For repeated mining rounds at 10⁹
    vectors, screen through the persisted ANN index first
    (`hard_negative_mine_indexed`) — this exact variant is the recall
    oracle the approximate one is graded against."""
    q = (
        pairs.select("query_id").distinct()
        .join(
            df.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"),
            ),
            on="query_id",
        )
    )
    scored = df.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.expr(dot_e9_expr("embedding", "qvec", n_dims)).alias("dot_e9"),
    )
    excl = (
        pairs.select("query_id", F.col("pos_id").alias("vec_id"))
        .unionByName(
            pairs.select("query_id", F.col("query_id").alias("vec_id")).distinct()
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_e9").desc(), F.col("vec_id")
    )
    return (
        scored.join(F.broadcast(excl), on=["query_id", "vec_id"], how="left_anti")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neg_id"), "dot_e9", "rank")
    )


def hard_negative_mine_indexed(
    index,
    df: DataFrame,
    pairs: DataFrame,
    k: int = 10,
    n_probes: int = 4,
) -> DataFrame:
    """Index-served hard negatives: overfetch top-(k + max positives + 1)
    per query through the persisted IVF index (pruned-list read), then
    drop self/positives and re-rank — the serving-scale path; grade its
    recall against `hard_negative_mine` (probes miss a list ⇒ missed
    negative, the usual ANN trade)."""
    from .ann_index import ivf_indexed_topk

    max_pos = (
        pairs.groupBy("query_id").count()
        .agg(F.max("count").alias("m")).collect()[0]["m"]
    ) or 0
    q = pairs.select("query_id").distinct().join(
        df.select(F.col("vec_id").alias("query_id"), "embedding"),
        on="query_id",
    )
    over = ivf_indexed_topk(index, q, k=k + max_pos + 1, n_probes=n_probes)
    excl = (
        pairs.select("query_id", F.col("pos_id").alias("vec_id"))
        .unionByName(
            pairs.select("query_id", F.col("query_id").alias("vec_id")).distinct()
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_e9").desc(), F.col("vec_id")
    )
    return (
        over.join(F.broadcast(excl), on=["query_id", "vec_id"], how="left_anti")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neg_id"), "dot_e9", "rank")
    )


def matryoshka_recall(
    df: DataFrame,
    query_df: DataFrame,
    dims_list: "tuple[int, ...]" = (8, 16, 32, 64),
    k: int = 50,
    n_dims: int = N_DIMS,
) -> DataFrame:
    """Truncated-dimension retrieval curve — the Matryoshka (MRL)
    serving question: how much recall@k survives ranking on only the
    FIRST d dimensions? Prefix truncation is the cheapest
    memory/bandwidth lever an embedding store has (d/64 of the bytes,
    no re-encoding, no codebook), and this curve is the evidence for
    choosing d.

    One exact full-dim top-k as ground truth, one prefix-dot top-k per
    candidate d (``dot_e9_expr(n_dims=d)`` reads only the first d
    elements — no array slicing, no copy), each scored by
    :func:`topk_recall`. Output: (n_dims, n_hits, k_exact, recall_e6),
    one row per d, integer-exact on both engines."""
    # materialize the ground-truth leg ONCE (k rows): every per-dimension
    # recall leg consumes it twice (semi-join + totals), so a lazy frame
    # would re-run the full-dimension corpus scan ~2x per candidate d
    exact = (
        brute_force_topk(df, query_df, k=k, n_dims=n_dims)
        .select("vec_id")
        .localCheckpoint()
    )
    out = None
    for d in dims_list:
        approx = brute_force_topk(df, query_df, k=k, n_dims=d).select("vec_id")
        r = topk_recall(approx, exact).select(
            F.lit(int(d)).cast("int").alias("n_dims"),
            "n_hits", "k_exact", "recall_e6",
        )
        out = r if out is None else out.unionByName(r)
    # the result is one row per candidate d — checkpoint IT (eager, tiny)
    # so the k-row ground-truth blocks can be released now instead of
    # living for the session (the returned frame must not keep a lineage
    # into `exact`: a localCheckpoint's lineage is truncated and cannot
    # recompute after unpersist)
    out = out.localCheckpoint()
    from .dedup import _free_checkpoint

    _free_checkpoint(exact)
    return out
