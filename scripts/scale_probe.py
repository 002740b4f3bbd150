"""Serving-index scale probe — the r3-verdict's task #8.

Measures how QUERY wall time moves when the corpus grows 10x, for two
pairs of inline-vs-indexed twins:

- ANN: inline brute-force cosine top-k (per-query corpus scan) vs the
  persisted IVF index probe (``ivf_indexed_topk`` — pruned read of the
  probed inverted lists only);
- BM25: corpus-path ``bm25_topk`` (tokenize-everything per query) vs the
  inverted text index probe (``probe_bm25`` — reads only the query terms'
  posting buckets).

The 100-TB pitch this evidences: inline op cost is O(corpus) and the
curve shows it (~10x wall at 10x rows); indexed probe cost is
O(index-buckets-touched) and stays near-flat. Index BUILD time is
recorded separately (it is the one-time cost the probes amortize).

Corpus scaling is deterministic: the sf documents/embeddings tables
union-replicated K times with id offsets (same distribution, K times the
rows). Output: ONE JSON line to stdout, also written to
``SCALE_PROBE.json`` at the repo root — ``bench.py`` embeds it in the
BENCH detail payload so the curves ride the per-round artifact.

Usage: PYTHONPATH=. python scripts/scale_probe.py [--sf-dir D] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

QUERY_VEC_IDS = [0, 7, 19, 31]
BM25_TERMS = ["data", "model", "learning"]
K = 20
IVF_MOD = 32
N_PROBES = 4


def _replicate(df, factor: int, id_col: str):
    """K deterministic copies with shifted ids (same distribution)."""
    if factor == 1:
        return df
    n = df.count()
    parts = [df]
    for i in range(1, factor):
        parts.append(df.withColumn(id_col, F.col(id_col) + F.lit(i * n)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def _run_scale(spark, sf_dir: str, factor: int) -> dict:
    from clever_canal_spark.operators.ann_index import (
        build_ivf_index,
        ivf_indexed_topk,
        open_ann_index,
    )
    from clever_canal_spark.operators.similarity import brute_force_topk
    from clever_canal_spark.operators.text import bm25_topk
    from clever_canal_spark.operators.text_index import (
        build_text_index,
        open_text_index,
        probe_bm25_batch,
    )

    emb = _replicate(
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
        factor, "vec_id",
    ).localCheckpoint()
    docs = _replicate(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text"),
        factor, "doc_id",
    ).localCheckpoint()
    n_vecs, n_docs = emb.count(), docs.count()
    queries = emb.filter(F.col("vec_id").isin(QUERY_VEC_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).localCheckpoint()

    out = {"factor": factor, "n_vecs": n_vecs, "n_docs": n_docs}

    # --- ANN ---------------------------------------------------------------
    def ann_inline():
        for row in queries.collect():
            q = spark.createDataFrame([(row["embedding"],)], "embedding array<float>")
            brute_force_topk(emb, q, k=K).write.format("noop").mode("overwrite").save()

    out["ann_inline_s"] = _timed(ann_inline)

    idx_dir = tempfile.mkdtemp(prefix=f"ccs-scaleprobe-ivf-x{factor}-")
    out["ann_index_build_s"] = _timed(
        lambda: build_ivf_index(spark, emb, idx_dir, centroid_mod=IVF_MOD)
    )
    idx = open_ann_index(spark, idx_dir)
    # warm once (JVM/codegen), then the timed probe
    ivf_indexed_topk(idx, queries, k=K, n_probes=N_PROBES).write.format(
        "noop"
    ).mode("overwrite").save()
    out["ann_probe_s"] = _timed(
        lambda: ivf_indexed_topk(idx, queries, k=K, n_probes=N_PROBES)
        .write.format("noop").mode("overwrite").save()
    )

    # --- BM25 --------------------------------------------------------------
    out["bm25_inline_s"] = _timed(
        lambda: bm25_topk(docs, BM25_TERMS, k=K)
        .write.format("noop").mode("overwrite").save()
    )
    tidx_dir = tempfile.mkdtemp(prefix=f"ccs-scaleprobe-text-x{factor}-")
    out["bm25_index_build_s"] = _timed(
        lambda: build_text_index(spark, docs, tidx_dir)
    )
    tidx = open_text_index(spark, tidx_dir)
    qb = spark.createDataFrame([(0, BM25_TERMS)], "query_id long, terms array<string>")
    probe_bm25_batch(tidx, qb, k=K).write.format("noop").mode("overwrite").save()
    out["bm25_probe_s"] = _timed(
        lambda: probe_bm25_batch(tidx, qb, k=K)
        .write.format("noop").mode("overwrite").save()
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    from clever_canal_spark.session import build_session

    spark = build_session(
        app_name="ccs-scale-probe", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    try:
        x1 = _run_scale(spark, args.sf_dir, 1)
        xk = _run_scale(spark, args.sf_dir, args.factor)
    finally:
        spark.stop()

    def ratio(a, b):
        return round(b / a, 2) if a else None

    payload = {
        "sf_dir": args.sf_dir,
        "x1": x1,
        f"x{args.factor}": xk,
        # growth ratios at Kx corpus: inline should track K, probes ~1
        "ann_inline_growth": ratio(x1["ann_inline_s"], xk["ann_inline_s"]),
        "ann_probe_growth": ratio(x1["ann_probe_s"], xk["ann_probe_s"]),
        "bm25_inline_growth": ratio(x1["bm25_inline_s"], xk["bm25_inline_s"]),
        "bm25_probe_growth": ratio(x1["bm25_probe_s"], xk["bm25_probe_s"]),
    }
    with open(os.path.join(REPO, "SCALE_PROBE.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
