"""Independent numpy verification of doc_lsh_verified_pairs and
doc_lsh_pair_recall at big SF — the last two sf1 entries whose DuckDB
oracles are infeasible (all-pairs/candidate enumeration exhausted 79 GB
of spill on the dense templated corpus).

From-scratch legs (same discipline as verify_doc_clusters_python.py):
shingles/minhash/banding recomputed in hashlib/numpy; candidate pairs
from same-(band,bucket) membership; EXACT distinct-shingle
intersections via a per-replica presence-matrix matmul (docs x vocab
uint8 -> M @ M.T gives every within-replica pair's intersection in one
BLAS call — the corpus replicates in 5k-doc alphabet-permuted replicas,
so cross-replica candidates are rare and are checked individually with
set ops). Then:

- doc_lsh_verified_pairs: candidates with 5*inter >= 3*union, compared
  as exact (doc_a, doc_b, inter, un) tuples against the engine.
- doc_lsh_pair_recall: the oracle's windowed composition — approx =
  verified pairs with both ids < 500 and equal source; exact = all
  same-source pairs among doc_id < 500 with J >= 3/5 (the hot-shingle
  df cap is a no-op below 10k df); one (n_approx, n_exact, n_hits,
  recall_e6) row compared against the engine.

Usage: SF_DIR=/dev/shm/ccs-sf1t PYTHONPATH=. \
           python scripts/verify_lsh_pairs_python.py [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.verify_doc_clusters_python import (  # noqa: E402
    MINHASH_P, N_BANDS, ROWS_PER_BAND, minhash_sig, shingle_hashes)

REPLICA = 5000  # base-corpus rows per replica at sf0.1 x10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VERIFY_LSH_PAIRS_SF1.json")
    args = ap.parse_args()
    sf_dir = os.environ.get("SF_DIR", "/dev/shm/ccs-sf1t")

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "source"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    sources = dict(zip(ids, tbl.column("source").to_pylist()))
    n_docs = len(ids)
    shing = {d: np.unique(shingle_hashes(t)) for d, t in zip(ids, texts)}
    sizes = {d: len(s) for d, s in shing.items()}

    # banding -> bucket membership (candidate pairs stay IMPLICIT: the
    # templated corpus makes buckets huge, so the pair set is 10^7-10^8;
    # per replica a boolean candidate matrix + one presence matmul keeps
    # everything vectorized)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for d, t in zip(ids, texts):
        sig = minhash_sig(shingle_hashes(t))
        for band in range(N_BANDS):
            lo, hi = sig[band * 2], sig[band * 2 + 1]
            if lo is None:
                continue
            buckets[(band, lo * MINHASH_P + hi)].append(d)
    n_cand = 0
    cross_buckets: list[list[int]] = []
    reps = sorted({d // REPLICA for d in ids})
    rep_rows: dict[int, dict[int, int]] = {}
    cand_mats: dict[int, np.ndarray] = {}
    for rep in reps:
        rep_ids = sorted(d for d in ids if d // REPLICA == rep)
        rep_rows[rep] = {d: i for i, d in enumerate(rep_ids)}
        cand_mats[rep] = np.zeros((len(rep_ids), len(rep_ids)), dtype=bool)
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len({d // REPLICA for d in members}) > 1:
            cross_buckets.append(members)
        by = defaultdict(list)
        for d in members:
            by[d // REPLICA].append(d)
        for rep, ms in by.items():
            if len(ms) < 2:
                continue
            rows = [rep_rows[rep][d] for d in ms]
            cand_mats[rep][np.ix_(rows, rows)] = True
            n_cand += len(ms) * (len(ms) - 1) // 2
    print(f"[py] {n_docs} docs, ~{n_cand} within-replica candidate pairs, "
          f"{len(cross_buckets)} cross-replica buckets", file=sys.stderr)

    verified: dict[tuple[int, int], tuple[int, int]] = {}
    for rep in reps:
        rep_ids = sorted(rep_rows[rep])
        vocab = np.unique(np.concatenate(
            [shing[d] for d in rep_ids if sizes[d]]
            or [np.empty(0, np.int64)]))
        vidx = {int(v): i for i, v in enumerate(vocab)}
        M = np.zeros((len(rep_ids), len(vocab)), dtype=np.float32)
        for d in rep_ids:
            if sizes[d]:
                M[rep_rows[rep][d], [vidx[int(h)] for h in shing[d]]] = 1.0
        G = np.rint(M @ M.T).astype(np.int64)
        sz = np.array([sizes[d] for d in rep_ids], dtype=np.int64)
        un = sz[:, None] + sz[None, :] - G
        mask = cand_mats[rep] & np.triu(np.ones_like(cand_mats[rep]), 1) \
            & (5 * G >= 3 * un)
        ai, bi = np.where(mask)
        for i, j in zip(ai.tolist(), bi.tolist()):
            a, b = rep_ids[i], rep_ids[j]
            verified[(a, b)] = (int(G[i, j]), int(un[i, j]))
        print(f"[py] replica {rep}: matmul {M.shape} -> "
              f"{int(mask.sum())} verified pairs", file=sys.stderr)
        del M, G, un, mask
    # cross-replica pairs (rare band-key collisions): exact set ops
    seen_cross: set[tuple[int, int]] = set()
    for members in cross_buckets:
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                if a // REPLICA == b // REPLICA or (a, b) in seen_cross:
                    continue
                seen_cross.add((a, b))
                x = int(np.intersect1d(shing[a], shing[b]).size)
                u = sizes[a] + sizes[b] - x
                if 5 * x >= 3 * u:
                    verified[(a, b)] = (x, u)
    if seen_cross:
        print(f"[py] {len(seen_cross)} cross-replica pairs checked",
              file=sys.stderr)

    # windowed recall legs (doc_id < 500, same source)
    approx = {(a, b) for (a, b) in verified
              if a < 500 and b < 500 and sources[a] == sources[b]}
    win = [d for d in ids if d < 500]
    exact = set()
    for i, a in enumerate(win):
        for b in win[i + 1:]:
            if sources[a] != sources[b]:
                continue
            x = int(np.intersect1d(shing[a], shing[b]).size)
            un = sizes[a] + sizes[b] - x
            if 5 * x >= 3 * un:
                exact.add((a, b) if a < b else (b, a))
    hits = len(approx & exact)
    recall_e6 = 0 if not exact else 1_000_000 * hits // len(exact)
    py_recall = (len(approx), len(exact), hits, recall_e6)

    # engine side
    from clever_canal_spark.entry_queries import QUERIES
    from clever_canal_spark.session import build_session

    spark = build_session(app_name="verify-lsh-pairs", master="local[16]",
                          shuffle_partitions=16)
    try:
        rows = QUERIES["doc_lsh_verified_pairs"](spark, sf_dir).collect()
        got_pairs = {(r["doc_a"], r["doc_b"]): (r["inter"], r["un"])
                     for r in rows}
        rr = QUERIES["doc_lsh_pair_recall"](spark, sf_dir).collect()[0]
        got_recall = (rr["n_approx"], rr["n_exact"], rr["n_hits"],
                      rr["recall_e6"])
    finally:
        spark.stop()

    miss = sum(1 for p in verified if p not in got_pairs)
    extra = sum(1 for p in got_pairs if p not in verified)
    diff = sum(1 for p, v in verified.items()
               if p in got_pairs and got_pairs[p] != v)
    ok_pairs = miss == 0 and extra == 0 and diff == 0
    ok_recall = tuple(py_recall) == tuple(got_recall)
    report = {
        "sf_dir": sf_dir, "n_docs": n_docs, "n_candidates": n_cand,
        "doc_lsh_verified_pairs": {
            "engine_rows": len(got_pairs), "python_rows": len(verified),
            "missing": miss, "extra": extra, "value_mismatches": diff,
            "status": "OK" if ok_pairs else "MISMATCH"},
        "doc_lsh_pair_recall": {
            "python": dict(zip(("n_approx", "n_exact", "n_hits",
                                "recall_e6"), py_recall)),
            "engine": dict(zip(("n_approx", "n_exact", "n_hits",
                                "recall_e6"), got_recall)),
            "status": "OK" if ok_recall else "MISMATCH"},
        "status": "OK" if (ok_pairs and ok_recall) else "MISMATCH",
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    sys.exit(0 if report["status"] == "OK" else 1)


if __name__ == "__main__":
    main()
