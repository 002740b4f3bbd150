"""Independent numpy verification of doc_hash_embed_topk at big SF.

Why: the query's DuckDB oracle recomputes the hashing-trick counts array
four times inside nested list_transforms, which made it the one
SKIPPED_SLOW holdout of the sf1 sweep (hours of single-threaded md5
grinding). The pipeline is linear — only the oracle's constant is bad —
so the honest check at scale is the established pattern
(verify_semdedup_numpy.py, verify_doc_clusters_python.py): recompute
the WHOLE thing from scratch in Python and diff the engine's output.

From-scratch legs (nothing shared with either engine):
- tokens: regex \\S+ over raw text
- per-token bucket/sign: u32 = first 8 hex chars of md5(token);
  dim = u32 % 64, sign = +1 if (u32 // 256) even else -1
- counts per dim -> L2 normalize in float64 (IEEE sqrt/divide,
  bit-identical to both engines' correctly-rounded ops)
- query = doc 7's embedding; dot_e9 = per-element
  round-half-away(a_j*b_j*1e9) summed as int64; top 25 by
  (dot_e9 DESC, vec_id ASC)

Usage: SF_DIR=/dev/shm/ccs-sf1t PYTHONPATH=. \
           python scripts/verify_hash_embed_python.py [--out FILE]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DIMS, K, QUERY_ID = 64, 25, 7
TOKEN_RE = re.compile(r"\S+")


def embed(text: str | None) -> np.ndarray:
    counts = np.zeros(N_DIMS, dtype=np.int64)
    for tok in TOKEN_RE.findall(text or ""):
        u32 = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        counts[u32 % N_DIMS] += 1 if (u32 // 256) % 2 == 0 else -1
    ss = int(np.sum(counts * counts))
    if ss == 0:
        return np.zeros(N_DIMS, dtype=np.float64)
    return counts.astype(np.float64) / np.sqrt(np.float64(ss))


def dot_e9(a: np.ndarray, b: np.ndarray) -> int:
    prod = a * b * 1e9
    return int(np.sum(
        (np.sign(prod) * np.floor(np.abs(prod) + 0.5)).astype(np.int64)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VERIFY_HASH_EMBED_SF1.json")
    args = ap.parse_args()
    sf_dir = os.environ.get("SF_DIR", "/dev/shm/ccs-sf1t")

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    embs = {did: embed(t) for did, t in zip(ids, texts)}
    q = embs[QUERY_ID]
    scored = sorted(((dot_e9(e, q), did) for did, e in embs.items()),
                    key=lambda x: (-x[0], x[1]))[:K]
    expected = [(did, d) for d, did in scored]

    from clever_canal_spark.entry_queries import QUERIES
    from clever_canal_spark.session import build_session

    spark = build_session(app_name="verify-hash-embed", master="local[16]",
                          shuffle_partitions=16)
    try:
        rows = QUERIES["doc_hash_embed_topk"](spark, sf_dir).collect()
    finally:
        spark.stop()
    got = [(r["vec_id"], r["dot_e9"]) for r in rows]

    mismatches = sum(1 for a, b in zip(expected, got) if a != b) \
        + abs(len(expected) - len(got))
    report = {
        "sf_dir": sf_dir, "n_docs": len(ids), "k": K,
        "engine_rows": len(got), "python_rows": len(expected),
        "mismatches": mismatches,
        "status": "OK" if mismatches == 0 else "MISMATCH",
        "top3": [{"vec_id": v, "dot_e9": d} for v, d in got[:3]],
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    sys.exit(0 if mismatches == 0 else 1)


if __name__ == "__main__":
    main()
