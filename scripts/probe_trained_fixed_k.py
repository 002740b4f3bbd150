"""Fixed-k linearity probe for the trained-quantizer (Lloyd's) family.

Why this exists: the sf1 oracle sweep's trained-IVF/PQ queries are
minutes-per-query, which LOOKS like a scale problem. It isn't an
operator problem — it's a fixture knob: the sweep queries seed centroids
with ``vec_id % 32 == 0``, so k grows with the corpus (63 centroids at
x1 → 625 at x10) and the Lloyd's assignment step (n·k dot products per
iteration) grows ~100x at x10 BY CONSTRUCTION. Real deployments fix k
(or grow it ~sqrt(n)), making assignment linear in n.

This probe measures exactly that: 2-iteration integer-exact k-means
(similarity.kmeans_centroids — the same code path the sweep queries use)
at x1 (2k vectors) and x10 (20k vectors), twice each:

- fixed k:   mod 32 at x1, mod 320 at x10  → k = 63 at BOTH scales
- fixture k: mod 32 at both                → k = 63 → 625

and reports wall growth for each. Expectation: fixed-k growth ≈ data
growth (linear operator), fixture-k growth ≈ 10x that (k grew too).

Usage: PYTHONPATH=. python scripts/probe_trained_fixed_k.py \
           [--x1 /root/testdata/sf0.1] [--x10 /dev/shm/ccs-sf1] \
           [--out PROBE_TRAINED_FIXED_K.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(spark, sf_dir: str, mod: int) -> dict:
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.similarity import kmeans_centroids

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    n = emb.count()
    t0 = time.monotonic()
    cents = kmeans_centroids(emb, centroid_mod=mod, n_iters=2)
    k = cents.agg(F.countDistinct("cent_id")).collect()[0][0]
    wall = time.monotonic() - t0
    return {"n_vectors": n, "centroid_mod": mod, "k": k,
            "wall_s": round(wall, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x1", default="/root/testdata/sf0.1")
    ap.add_argument("--x10", default="/dev/shm/ccs-sf1")
    ap.add_argument("--out", default="PROBE_TRAINED_FIXED_K.json")
    args = ap.parse_args()

    from clever_canal_spark.session import build_session

    spark = build_session(
        app_name="probe-trained-fixed-k", master="local[8]",
        shuffle_partitions=8,
    )
    # untimed warmup: JVM codegen + Python workers, so leg 1 isn't
    # billed for session startup
    _run(spark, args.x1, 32)

    legs = {
        "x1": _run(spark, args.x1, 32),
        "x10_fixed_k": _run(spark, args.x10, 320),
        "x10_fixture_k": _run(spark, args.x10, 32),
    }
    out = {
        "what": (
            "2-iter Lloyd's (kmeans_centroids) wall at x1 vs x10 with k "
            "FIXED (mod scales with corpus) vs the sweep fixture's "
            "k = n/32 (k grows 10x with the corpus)"
        ),
        "legs": legs,
        "growth_at_x10": {
            "fixed_k": round(legs["x10_fixed_k"]["wall_s"]
                             / legs["x1"]["wall_s"], 2),
            "fixture_k": round(legs["x10_fixture_k"]["wall_s"]
                               / legs["x1"]["wall_s"], 2),
        },
        "reading": (
            "fixed-k growth ~ data growth => the training/assignment "
            "operator is linear in n at fixed k; the sweep's "
            "minutes-per-query trained family at sf1 is the fixture's "
            "k = n/32 knob (100x assignment work at x10), the same "
            "documented-by-construction class as the quadratic oracles"
        ),
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
