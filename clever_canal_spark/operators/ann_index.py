"""Persisted ANN indexes: build once, probe many — with batched queries.

The round-2 ANN operators (`similarity.py`) recompute their blocking
structure inline on every call: `ann_multiprobe_topk` re-derives the LSH
bucket of every corpus vector, and `ivf_topk` re-runs the full
O(n·centroids) nearest-centroid assignment per query. Correct, but at
10⁹ vectors that is the index build riding every lookup.

This module separates the two phases the way a real similarity service
does (reference parity: the reference keeps no vector index — this is
part of the beyond-reference training-data surface):

- **build**: one batch job computes the blocking column (LSH ``bucket``
  or IVF ``cent_id``) and stores ``(vec_id, embedding, blocking_col)``
  in a :class:`~clever_canal_spark.lake.LakeTable` whose *physical*
  bucket key IS the blocking column — so the lake's manifest-level
  bucket pruning (the same machinery behind ``lookup``) turns a probe
  into an O(probes/n_buckets) read. Index parameters land in a sidecar
  ``index.json`` so ``open_ann_index`` needs no caller-remembered state.
- **probe**: N-row query batches. Per query, the probe set (flip-masks
  within Hamming ``radius`` for LSH; top-``n_probes`` centroids for
  IVF) is derived from the tiny query batch only, collected driver-side
  (O(#queries·#probes) — never touches the corpus), and pruned-read via
  ``LakeTable.scan_for_keys``. Scoring joins the candidates against the
  broadcast probe list; per-query top-k is a window rank over the
  pruned candidate slice.

At 100 TB: the index table is written bucket-partitioned once (or
maintained incrementally for insert-only feeds via ``LakeTable.merge``
keyed on ``vec_id``); every query batch reads only its probe buckets'
files. Updating a vector in place would move it across blocking buckets
— express updates as delete+insert of the index row (rebuild the
affected entry), or rebuild the index from the corpus table; the build
is a single scan either way.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..lake import LakeTable
from .similarity import (
    N_DIMS,
    N_PLANES,
    dot_e9_expr,
    ivf_assign,
    ivf_centroids,
    lsh_bucket_expr,
    probe_masks,
)

_SIDECAR = "index.json"


def _index_schema(block_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), nullable=False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=False),
            T.StructField(block_col, T.LongType(), nullable=False),
        ]
    )


@dataclass
class LshIndex:
    """A persisted hyperplane-LSH index: ``vectors`` is a LakeTable of
    ``(vec_id, embedding, bucket)`` physically bucketed BY ``bucket``;
    ``directory`` is the reverse lookup ``(vec_id, bucket)`` bucketed by
    ``vec_id`` — the piece that makes *incremental* maintenance a pruned
    point-read instead of an index scan (see `apply_index_changes`)."""

    vectors: LakeTable
    directory: LakeTable
    n_planes: int
    n_dims: int
    path: str

    block_col = "bucket"


@dataclass
class IvfIndex:
    """A persisted IVF index: ``vectors`` holds ``(vec_id, embedding,
    cent_id)`` physically bucketed by ``cent_id``; ``centroids`` is the
    tiny ``(cent_id, cvec)`` coarse-quantizer table; ``directory`` maps
    ``vec_id → cent_id`` for incremental maintenance."""

    vectors: LakeTable
    centroids: LakeTable
    directory: LakeTable
    centroid_mod: int
    n_dims: int
    path: str
    train_iters: int = 0
    # IVF-PQ composition: when pq_subs > 0 the vectors table carries a
    # ``pq_code`` array (codeword id per subspace) and ``pq_codebook``
    # holds the (sub, cent_id, cw) codeword table — probes can then ADC-
    # screen inside the probed lists before touching full embeddings.
    pq_subs: int = 0
    pq_mod: int = 0
    pq_codebook: "LakeTable | None" = None

    block_col = "cent_id"


def build_lsh_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    n_planes: int = N_PLANES,
    n_dims: int = N_DIMS,
    n_buckets: int = 16,
) -> LshIndex:
    """One pass over the corpus: compute each vector's LSH bucket and store
    it as the index table's physical bucket key. 2^n_planes logical buckets
    hash into ``n_buckets`` file buckets — probes prune at file level."""
    t = LakeTable.create(
        spark,
        os.path.join(path, "vectors"),
        _index_schema("bucket"),
        merge_key=["vec_id"],
        bucket_key=["bucket"],
        n_buckets=n_buckets,
    )
    t.append(
        df.select(
            "vec_id",
            "embedding",
            F.expr(lsh_bucket_expr("embedding", n_planes, n_dims)).cast("long").alias("bucket"),
        )
    )
    d = _create_directory(spark, path, "bucket", n_buckets)
    d.append(t.scan().select("vec_id", "bucket"))
    meta = {"family": "lsh", "n_planes": n_planes, "n_dims": n_dims}
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump(meta, fh)
    return LshIndex(vectors=t, directory=d, n_planes=n_planes, n_dims=n_dims, path=path)


def build_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    centroid_mod: int = 32,
    n_dims: int = N_DIMS,
    n_buckets: int = 16,
    train_iters: int = 0,
    pq_subs: int = 0,
    pq_mod: int = 25,
) -> IvfIndex:
    """The one-time O(n·centroids) nearest-centroid assignment (broadcast
    cross + max_by — `similarity.ivf_assign`) runs HERE, never at query
    time. Assignment rows carry only (vec_id, cent_id) through the agg;
    the payload joins back by vec_id for the index write.

    ``train_iters > 0`` refines the sampled seeds with that many Lloyd's
    iterations (`similarity.kmeans_centroids`) before assignment — the
    trained quantizer lifts pooled recall at equal probes (measured:
    emb_ivf_trained_recall vs emb_ivf_batch_recall) and tightens list
    balance, and training cost rides the one-time build, never a query.

    ``pq_subs > 0`` additionally PQ-encodes every vector at build time
    (`similarity.pq_codebook`/`pq_encode`, ``pq_mod`` seed codewords per
    subspace): the vectors table carries a ``pq_code`` array and the
    codeword table persists alongside, so `ivf_pq_indexed_topk` can
    ADC-screen inside the probed lists before reading any embedding —
    the IVF-PQ composition (pruned read × compressed screen × exact
    rerank)."""
    if train_iters > 0:
        from .similarity import centroid_arrays, kmeans_centroids

        cents = centroid_arrays(
            kmeans_centroids(df, centroid_mod, train_iters, n_dims), n_dims
        )
        cvec_type = T.DoubleType()
    else:
        cents = ivf_centroids(df, centroid_mod)
        cvec_type = T.FloatType()
    # write the (tiny) centroid table FIRST and check emptiness from its
    # manifest row counts — zero extra jobs over the corpus. A corpus with
    # no vec_id % centroid_mod == 0 rows would otherwise SILENTLY build an
    # empty index (every assignment cross-joins zero centroids).
    ct = LakeTable.create(
        spark,
        os.path.join(path, "centroids"),
        T.StructType(
            [
                T.StructField("cent_id", T.LongType(), nullable=False),
                T.StructField("cvec", T.ArrayType(cvec_type), nullable=False),
            ]
        ),
        merge_key=["cent_id"],
        n_buckets=1,
    )
    ct.append(cents)
    if sum(f["rows"] for f in ct.snapshot().files) == 0:
        raise ValueError(
            f"no centroid candidates: no vec_id % {centroid_mod} == 0 in "
            f"the corpus — pick a smaller centroid_mod or remap vec_ids"
        )
    vec_schema = _index_schema("cent_id")
    if pq_subs > 0:
        vec_schema = T.StructType(
            list(vec_schema.fields)
            + [T.StructField("pq_code", T.ArrayType(T.LongType()), nullable=False)]
        )
    t = LakeTable.create(
        spark,
        os.path.join(path, "vectors"),
        vec_schema,
        merge_key=["vec_id"],
        bucket_key=["cent_id"],
        n_buckets=n_buckets,
    )
    assigned = ivf_assign(df, centroid_mod, n_dims, cents=cents)
    rows = df.join(assigned, on="vec_id").select("vec_id", "embedding", "cent_id")
    pqt = None
    if pq_subs > 0:
        from .similarity import pq_codebook, pq_encode

        cb = pq_codebook(df, pq_subs, pq_mod, n_dims)
        pqt = LakeTable.create(
            spark,
            os.path.join(path, "pq_codebook"),
            T.StructType(
                [
                    T.StructField("sub", T.IntegerType(), nullable=False),
                    T.StructField("cent_id", T.LongType(), nullable=False),
                    T.StructField("cw", T.ArrayType(T.FloatType()), nullable=False),
                ]
            ),
            merge_key=["sub", "cent_id"],
            n_buckets=1,
        )
        pqt.append(cb)
        codes = (
            pq_encode(df, cb, pq_subs, n_dims)
            .groupBy("vec_id")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(sub, cent_id))), "
                       "s -> s.cent_id)").alias("pq_code")
            )
        )
        rows = rows.join(codes, on="vec_id")
    t.append(rows)
    d = _create_directory(spark, path, "cent_id", n_buckets)
    d.append(t.scan().select("vec_id", "cent_id"))
    meta = {
        "family": "ivf",
        "centroid_mod": centroid_mod,
        "n_dims": n_dims,
        "train_iters": train_iters,
        "pq_subs": pq_subs,
        "pq_mod": pq_mod if pq_subs > 0 else 0,
    }
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump(meta, fh)
    return IvfIndex(
        vectors=t, centroids=ct, directory=d,
        centroid_mod=centroid_mod, n_dims=n_dims, path=path,
        train_iters=train_iters,
        pq_subs=pq_subs, pq_mod=meta["pq_mod"], pq_codebook=pqt,
    )


def _create_directory(spark: SparkSession, path: str, block_col: str, n_buckets: int) -> LakeTable:
    return LakeTable.create(
        spark,
        os.path.join(path, "directory"),
        T.StructType(
            [
                T.StructField("vec_id", T.LongType(), nullable=False),
                T.StructField(block_col, T.LongType(), nullable=False),
            ]
        ),
        merge_key=["vec_id"],
        n_buckets=n_buckets,
    )


def open_ann_index(spark: SparkSession, path: str) -> "LshIndex | IvfIndex":
    """Reopen a persisted index from its sidecar params."""
    with open(os.path.join(path, _SIDECAR)) as fh:
        meta = json.load(fh)
    if meta["family"] == "lsh":
        return LshIndex(
            vectors=LakeTable(spark, os.path.join(path, "vectors")),
            directory=LakeTable(spark, os.path.join(path, "directory")),
            n_planes=meta["n_planes"],
            n_dims=meta["n_dims"],
            path=path,
        )
    if meta["family"] == "ivf":
        pq_subs = meta.get("pq_subs", 0)
        return IvfIndex(
            vectors=LakeTable(spark, os.path.join(path, "vectors")),
            centroids=LakeTable(spark, os.path.join(path, "centroids")),
            directory=LakeTable(spark, os.path.join(path, "directory")),
            centroid_mod=meta["centroid_mod"],
            n_dims=meta["n_dims"],
            path=path,
            train_iters=meta.get("train_iters", 0),
            pq_subs=pq_subs,
            pq_mod=meta.get("pq_mod", 0),
            pq_codebook=(
                LakeTable(spark, os.path.join(path, "pq_codebook"))
                if pq_subs > 0
                else None
            ),
        )
    raise ValueError(f"unknown index family {meta['family']!r}")


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("dot_e9").desc(), F.col("vec_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ann_indexed_topk(
    index: LshIndex,
    query_df: DataFrame,
    k: int = 50,
    radius: int = 1,
) -> DataFrame:
    """Batched multi-probe ANN over a persisted LSH index.

    ``query_df``: (query_id, embedding) — any batch size. The query batch
    is collected ONCE (O(#queries) rows — never touches the corpus); the
    flip-mask probe neighborhoods are then pure driver arithmetic (the
    bucket itself is computed by the same JVM expression the build used,
    so index and probe hashing cannot drift). One bucket-pruned read of
    the index follows, and candidates score against their matching query
    via a broadcast equi-join on (probe bucket) built from a LOCAL
    DataFrame — no re-scan of the query source per Spark job. Output:
    (query_id, vec_id, dot_e9), top-k per query.
    """
    masks = probe_masks(index.n_planes, radius)
    qrows = query_df.select(
        "query_id",
        F.col("embedding").alias("qvec"),
        F.expr(lsh_bucket_expr("embedding", index.n_planes, index.n_dims))
        .cast("long")
        .alias("qbucket"),
    ).collect()
    # driver-side probe expansion: bucket values are non-negative
    # (< 2^n_planes), so Python ^ matches the SQL BIGINT XOR exactly
    probe_rows = [
        (r["query_id"], r["qvec"], r["qbucket"] ^ m) for r in qrows for m in masks
    ]
    # probe schema inherits the caller's query_id type (string request
    # ids are as legitimate as bigints — the contract is only the
    # column NAMES)
    probes = query_df.sparkSession.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", query_df.schema["query_id"].dataType),
                T.StructField("qvec", T.ArrayType(T.FloatType())),
                T.StructField("probe", T.LongType()),
            ]
        ),
    )
    probe_vals = sorted({p[2] for p in probe_rows})
    cand = index.vectors.scan_for_keys(probe_vals)
    scored = cand.join(F.broadcast(probes), cand["bucket"] == probes["probe"]).select(
        "query_id",
        "vec_id",
        F.expr(dot_e9_expr("embedding", "qvec", index.n_dims)).alias("dot_e9"),
    )
    return _topk_per_query(scored, k)


def apply_index_changes(
    index: "LshIndex | IvfIndex",
    changes: DataFrame,
    epoch_id: int | None = None,
    lookup_threshold: int = 10_000,
) -> None:
    """Incrementally maintain a persisted index from a CDC-style change
    batch — the piece that lets the ANN index ride the same ingest loop as
    the lake tables instead of being rebuilt.

    ``changes``: (vec_id, embedding, op, lsn) with op ∈ {I,U,D} (I≡U;
    embedding may be null for D) and ``lsn`` the monotonic change order.

    The hard part is *moves*: an updated vector usually lands in a
    different blocking bucket, and a pruned probe of the OLD bucket must
    not surface the stale row. The ``directory`` table (vec_id → bucket,
    physically bucketed by vec_id) provides the old location as a pruned
    point-read for small batches (``scan_for_keys``) or one semi-join for
    large ones — never an index scan per batch at small batch sizes. Each
    move merges a tombstone into the old bucket and the new row into the
    new bucket as ONE MOR epoch (O(batch) appends); per-row the tombstone
    orders at ``2·lsn`` and the upsert at ``2·lsn + 1``, so the pair
    resolves deterministically under LWW in any read or compaction, pruned
    or global. Exactly-once per ``epoch_id`` rides the tables' committed-
    epoch registries (vectors first, then directory; a crash between the
    two replays idempotently — epoch ordering is the caller's contract,
    as everywhere in the engine).
    """
    bc = index.block_col
    # intra-batch LWW: at most one surviving change per vec_id, so a
    # same-batch insert→update pair cannot strand a row in the first
    # change's bucket
    w = (
        changes.groupBy("vec_id")
        .agg(
            F.max_by(F.struct("embedding", "op", "lsn"), F.col("lsn")).alias("__w")
        )
        .select("vec_id", "__w.embedding", "__w.op", "__w.lsn")
    ).cache()
    try:
        n = w.count()
        live = w.filter(F.col("op") != "D")
        if isinstance(index, LshIndex):
            upserts = live.withColumn(
                bc,
                F.expr(lsh_bucket_expr("embedding", index.n_planes, index.n_dims)).cast("long"),
            )
        else:
            cents = F.broadcast(index.centroids.scan())
            assigned = (
                live.crossJoin(cents)
                .select(
                    "vec_id",
                    "cent_id",
                    F.expr(dot_e9_expr("embedding", "cvec", index.n_dims)).alias("__d"),
                )
                .groupBy("vec_id")
                .agg(
                    F.max_by(
                        F.col("cent_id"), F.struct(F.col("__d"), -F.col("cent_id"))
                    ).alias(bc)
                )
            )
            upserts = live.join(assigned, on="vec_id")
            if index.pq_subs > 0:
                # re-encode moved/updated vectors against the STORED
                # codebook — codes stay comparable with build-time ones
                from .similarity import pq_encode

                codes = (
                    pq_encode(live, index.pq_codebook.scan(), index.pq_subs, index.n_dims)
                    .groupBy("vec_id")
                    .agg(
                        F.expr(
                            "transform(array_sort(collect_list(struct(sub, cent_id))), "
                            "s -> s.cent_id)"
                        ).alias("pq_code")
                    )
                )
                upserts = upserts.join(codes, on="vec_id")
        has_pq = isinstance(index, IvfIndex) and index.pq_subs > 0
        if n <= lookup_threshold:
            ids = [r["vec_id"] for r in w.select("vec_id").collect()]
            old = index.directory.scan_for_keys(ids)
        else:
            old = index.directory.scan().join(
                w.select("vec_id"), on="vec_id", how="left_semi"
            )
        # tombstone the old location when the vec is deleted or moved
        tombs = (
            old.withColumnRenamed(bc, "__oldb")
            .join(w.select("vec_id", "op", "lsn"), on="vec_id")
            .join(
                upserts.select("vec_id", F.col(bc).alias("__newb")),
                on="vec_id",
                how="left",
            )
            .filter(
                (F.col("op") == "D")
                | F.col("__newb").isNull()
                | (F.col("__newb") != F.col("__oldb"))
            )
            .select(
                "vec_id",
                F.lit(None).cast(T.ArrayType(T.FloatType())).alias("embedding"),
                F.col("__oldb").alias(bc),
                F.lit("D").alias("op"),
                (F.col("lsn") * 2).alias("__l2"),
                *(
                    [F.lit(None).cast(T.ArrayType(T.LongType())).alias("pq_code")]
                    if has_pq
                    else []
                ),
            )
        )
        ups = upserts.select(
            "vec_id", "embedding", bc, F.lit("U").alias("op"),
            (F.col("lsn") * 2 + 1).alias("__l2"),
            *(["pq_code"] if has_pq else []),
        )
        index.vectors.merge(
            tombs.unionByName(ups), epoch_id=epoch_id, op_col="op",
            mode="mor", lsn_col="__l2",
        )
        dir_src = (
            w.filter(F.col("op") == "D")
            .select(
                "vec_id",
                F.lit(None).cast("long").alias(bc),
                F.lit("D").alias("op"),
                (F.col("lsn") * 2).alias("__l2"),
            )
            .unionByName(
                upserts.select(
                    "vec_id", bc, F.lit("U").alias("op"),
                    (F.col("lsn") * 2 + 1).alias("__l2"),
                )
            )
        )
        index.directory.merge(
            dir_src, epoch_id=epoch_id, op_col="op", mode="mor", lsn_col="__l2"
        )
    finally:
        w.unpersist()


def ivf_indexed_topk(
    index: IvfIndex,
    query_df: DataFrame,
    k: int = 50,
    n_probes: int = 4,
) -> DataFrame:
    """Batched IVF ANN over a persisted index: rank the (tiny, broadcast)
    centroid table against each query, take each query's top ``n_probes``
    inverted lists, pruned-read exactly those lists, exact-rank inside.
    NO corpus-wide assignment job in this path — that ran at build time."""
    cents = F.broadcast(index.centroids.scan())
    q = query_df.select("query_id", F.col("embedding").alias("qvec"))
    ranked = q.crossJoin(cents).select(
        "query_id",
        "qvec",
        "cent_id",
        F.expr(dot_e9_expr("cvec", "qvec", index.n_dims)).alias("cdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), F.col("cent_id"))
    # one collect for BOTH the pruned-read key list and the broadcast probe
    # side (≤ #queries·n_probes rows) — re-deriving the ranking per Spark
    # job would re-run the centroid scan for the broadcast build
    probe_rows = [
        (r["query_id"], r["qvec"], r["cent_id"])
        for r in ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probes)
        .select("query_id", "qvec", "cent_id")
        .collect()
    ]
    probes = query_df.sparkSession.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", query_df.schema["query_id"].dataType),
                T.StructField("qvec", T.ArrayType(T.FloatType())),
                T.StructField("cent_id", T.LongType()),
            ]
        ),
    )
    cent_ids = sorted({p[2] for p in probe_rows})
    cand = index.vectors.scan_for_keys(cent_ids)
    scored = cand.join(F.broadcast(probes), on="cent_id").select(
        "query_id",
        "vec_id",
        F.expr(dot_e9_expr("embedding", "qvec", index.n_dims)).alias("dot_e9"),
    )
    return _topk_per_query(scored, k)


def ivf_pq_indexed_topk(
    index: IvfIndex,
    query_df: DataFrame,
    k: int = 50,
    n_probes: int = 4,
    rerank: int = 100,
) -> DataFrame:
    """IVF-PQ probe: the FAISS-style composition over a persisted index —
    (1) rank the broadcast centroid table per query and pruned-read ONLY
    the top-``n_probes`` inverted lists (file-level bucket pruning, as in
    `ivf_indexed_topk`); (2) ADC-screen inside those lists using the
    stored ``pq_code`` arrays against a per-query broadcast lookup table
    (codes + a BIGINT sum — embeddings untouched); (3) exact e9 re-rank
    of the top-``rerank`` screened candidates from the same pruned read.
    At scale the screen is what makes wide probes affordable: the
    full-precision column is read for ``rerank`` candidates per query,
    not for every member of every probed list."""
    if index.pq_subs <= 0 or index.pq_codebook is None:
        raise ValueError(
            "ivf_pq_indexed_topk: index was built without PQ codes — "
            "rebuild with build_ivf_index(..., pq_subs=M)"
        )
    d = index.n_dims // index.pq_subs
    cents = F.broadcast(index.centroids.scan())
    q = query_df.select("query_id", F.col("embedding").alias("qvec"))
    ranked = q.crossJoin(cents).select(
        "query_id",
        "qvec",
        "cent_id",
        F.expr(dot_e9_expr("cvec", "qvec", index.n_dims)).alias("cdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), F.col("cent_id"))
    probe_rows = [
        (r["query_id"], r["qvec"], r["cent_id"])
        for r in ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probes)
        .select("query_id", "qvec", "cent_id")
        .collect()
    ]
    probes = query_df.sparkSession.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", query_df.schema["query_id"].dataType),
                T.StructField("qvec", T.ArrayType(T.FloatType())),
                T.StructField("cent_id", T.LongType()),
            ]
        ),
    )
    cent_ids = sorted({p[2] for p in probe_rows})
    cand = index.vectors.scan_for_keys(cent_ids)
    cand_q = cand.join(F.broadcast(probes), on="cent_id")
    qtab = F.broadcast(
        q.crossJoin(F.broadcast(index.pq_codebook.scan())).select(
            "query_id",
            "sub",
            F.col("cent_id").alias("code_id"),
            F.expr(
                dot_e9_expr(f"slice(qvec, sub * {d} + 1, {d})", "cw", d)
            ).alias("qdot"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_e9").desc(), F.col("vec_id")
    )
    screened = (
        cand_q.select(
            "query_id", "vec_id", F.posexplode("pq_code").alias("sub", "code_id")
        )
        .join(qtab, on=["query_id", "sub", "code_id"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdot").alias("adc_e9"))
        .withColumn("__rn", F.row_number().over(w_adc))
        .filter(F.col("__rn") <= rerank)
        .select("query_id", "vec_id")
    )
    scored = cand_q.join(
        screened, on=["query_id", "vec_id"], how="left_semi"
    ).select(
        "query_id",
        "vec_id",
        F.expr(dot_e9_expr("embedding", "qvec", index.n_dims)).alias("dot_e9"),
    )
    return _topk_per_query(scored, k)


def _lake_vec_id_expr(table: LakeTable, snap) -> "F.Column":
    """vec_id from a lake table's merge key: the key column itself when it
    is a single INTEGRAL column (ids stay comparable with directly-built
    indexes), else xxhash64 over the key — never a silent cast: casting a
    string key to long yields NULLs that would collapse the whole batch
    into one LWW winner inside apply_index_changes."""
    key = list(snap.merge_key)
    if len(key) == 1:
        fields = {f["name"]: f.get("type", "") for f in snap.current_fields()}
        if fields.get(key[0], "").lower() in (
            "tinyint", "smallint", "int", "integer", "bigint",
            "byte", "short", "long",
        ):
            return F.col(key[0]).cast("long")
    return F.xxhash64(*key)


def sync_ann_from_lake(
    index: "LshIndex | IvfIndex",
    table: LakeTable,
    embedding_col: str = "embedding",
    vec_id_expr=None,
) -> int:
    """Tail a LakeTable's changelog into the ANN index — the similarity
    twin of ``dedup_index.sync_from_lake``: the ingest loop applies an
    epoch to the embeddings lake table, this advances the index to match,
    and query batches keep probing pruned buckets with no rebuild.

    Reads ``scan_changes(cursor, head)`` (file-diff only), folds the rows
    into the (vec_id, embedding, op, lsn) contract of
    :func:`apply_index_changes` (which handles cross-bucket moves and
    tombstones), and applies ONE index epoch keyed by the target lake
    version. ``vec_id`` defaults to the table's merge-key column when it
    is a single column (cast to long), else ``xxhash64`` over the
    composite key. Crash-safety matches the dedup sync: the merge
    registry skips a replayed version, and a replay that spans extra
    versions re-applies (vec_id, lsn) winners value-idempotently under
    LWW. Returns lake versions consumed (0 = already current)."""
    from .dedup_index import _read_lake_cursor, _write_lake_cursor

    head = table.current_version()
    synced = _read_lake_cursor(index.path)
    if head <= synced:
        return 0
    # mirror metadata-only TRUNCATEs (no D markers in the changelog):
    # erase the index at the truncate LSN, tail only post-truncate changes
    truncs = table.truncates_between(synced, head)
    if truncs:
        last = truncs[-1]
        index.vectors.truncate_rows(last["lsn"])
        index.directory.truncate_rows(last["lsn"])
        synced_from = last["version"]
        if synced_from >= head:
            _write_lake_cursor(index.path, head)
            return head - synced
    else:
        synced_from = synced
    snap = table.snapshot(head)
    vid = vec_id_expr if vec_id_expr is not None else _lake_vec_id_expr(table, snap)
    changes = table.scan_changes(synced_from, head).select(
        vid.alias("vec_id"),
        F.col(embedding_col).cast(T.ArrayType(T.FloatType())).alias("embedding"),
        F.col("__op").alias("op"),
        F.col("__lsn").alias("lsn"),
    )
    apply_index_changes(index, changes, epoch_id=head)
    _write_lake_cursor(index.path, head)
    return head - synced


def build_ann_index_from_lake(
    table: LakeTable,
    path: str,
    family: str = "lsh",
    embedding_col: str = "embedding",
    vec_id_expr=None,
    **build_kwargs,
) -> "LshIndex | IvfIndex":
    """Bootstrap an ANN index from an embeddings lake table's CURRENT
    state and stamp the lake cursor at the same snapshot, so the first
    ``sync_ann_from_lake`` resumes exactly where the build read —
    versions that land between the scan and the stamp are never skipped
    (the version is pinned before the scan)."""
    from .dedup_index import _write_lake_cursor

    if family not in ("lsh", "ivf"):
        raise ValueError(f"unknown ANN index family: {family!r} (expected 'lsh' or 'ivf')")
    head = table.current_version()
    snap = table.snapshot(head)
    vid = vec_id_expr if vec_id_expr is not None else _lake_vec_id_expr(table, snap)
    corpus = table.scan(version=head).select(
        vid.alias("vec_id"),
        F.col(embedding_col).cast(T.ArrayType(T.FloatType())).alias("embedding"),
    )
    build = build_lsh_index if family == "lsh" else build_ivf_index
    idx = build(table.spark, corpus, path, **build_kwargs)
    _write_lake_cursor(path, head)
    return idx
