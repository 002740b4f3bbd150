"""Independent numpy verification of emb_semdedup_keepers at big SF.

Why: the query's DuckDB oracle replays assignment + within-cell pairs +
a RECURSIVE transitive closure. On the sf1 one-blob synthetic corpus the
closure and the dense cells make the oracle quadratic — it OOMs at a
70 GB cap (recorded in SWEEP_SF1.json). The engine side runs fine
(cells stay under the documented max_cell_rows); what's missing is an
independent check of its OUTPUT at that scale. Precedent: the sf1
cluster family was verified against a Python union-find (cluster_check
in SWEEP_SF1.json).

This script recomputes SemDeDup from scratch in numpy — deterministic
IVF centroid seeds (vec_id % mod == 0), argmax integer-e9 dot
assignment (per-element round-half-away-from-zero, matching Spark SQL
ROUND / BigDecimal HALF_UP), exact within-cell pairs at tau, union-find
components, min-id keeper — and diffs all four output columns row-for-
row against the engine query's result.

Usage: SF_DIR=/dev/shm/ccs-sf1 PYTHONPATH=. \
           python scripts/verify_semdedup_numpy.py [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOD = 16
TAU_E9 = 300_000_000


def dot_e9(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sum_j round_half_away(a_j * b_j * 1e9) over the last axis, int64."""
    prod = a * b * 1e9
    return np.sum(
        (np.sign(prod) * np.floor(np.abs(prod) + 0.5)).astype(np.int64), axis=-1
    )


def assign_cells(emb: np.ndarray, ids: np.ndarray,
                 cvecs: np.ndarray, cids: np.ndarray,
                 chunk: int = 512) -> np.ndarray:
    """argmax dot_e9 per vector; ties break to the LOWEST cent_id (the
    engine's max_by(struct(dot, -cent_id)) tiebreak)."""
    out = np.empty(len(emb), dtype=np.int64)
    order = np.argsort(cids, kind="stable")  # ascending cent_id
    cv, ci = cvecs[order], cids[order]
    for s in range(0, len(emb), chunk):
        block = emb[s:s + chunk]                      # (B, D)
        d = dot_e9(block[:, None, :], cv[None, :, :])  # (B, C)
        best = np.argmax(d, axis=1)                   # first max = lowest id
        out[s:s + chunk] = ci[best]
    return out


class UF:
    def __init__(self, ids):
        self.p = {int(i): int(i) for i in ids}

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller id as root => root IS the min label
            if ra > rb:
                ra, rb = rb, ra
            self.p[rb] = ra


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VERIFY_SEMDEDUP_SF1.json")
    args = ap.parse_args()
    sf = os.environ.get("SF_DIR", "/dev/shm/ccs-sf1")

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]

    seed = ids % MOD == 0
    cell = assign_cells(emb, ids, emb[seed], ids[seed])

    uf = UF(ids)
    n_pairs = 0
    row_chunk = 128  # bounds the (chunk, n, D) temp: 128*10k*64*8B = 650MB
    for c in np.unique(cell):
        m = cell == c
        cid_ids, cid_emb = ids[m], emb[m]
        n = len(cid_ids)
        if n < 2:
            continue
        for s in range(0, n, row_chunk):
            blk = cid_emb[s:s + row_chunk]
            d = dot_e9(blk[:, None, :], cid_emb[None, :, :])  # (B, n)
            rows_, cols_ = np.nonzero(d >= TAU_E9)
            rows_ += s
            strict = cols_ > rows_  # each unordered pair once
            n_pairs += int(strict.sum())
            for a, b in zip(rows_[strict], cols_[strict]):
                uf.union(int(cid_ids[a]), int(cid_ids[b]))
    cluster = np.fromiter((uf.find(int(i)) for i in ids), dtype=np.int64)
    keep = cluster == ids

    from clever_canal_spark.entry_queries import QUERIES
    from clever_canal_spark.session import build_session

    spark = build_session(app_name="verify-semdedup", master="local[8]",
                          shuffle_partitions=8)
    rows = QUERIES["emb_semdedup_keepers"](spark, sf).collect()
    spark.stop()
    got = {int(r["vec_id"]): (int(r["cent_id"]), int(r["cluster_id"]),
                              bool(r["keep"])) for r in rows}

    mism = 0
    for i, vid in enumerate(ids):
        want = (int(cell[i]), int(cluster[i]), bool(keep[i]))
        if got.get(int(vid)) != want:
            if mism < 5:
                print(f"MISMATCH vec_id={vid}: engine={got.get(int(vid))} "
                      f"numpy={want}")
            mism += 1

    out = {
        "what": ("emb_semdedup_keepers at sf1 vs from-scratch numpy "
                 "(assignment, within-cell pairs, union-find, keeper) — "
                 "independent check standing in for the quadratic "
                 "DuckDB oracle that OOMs at a 70GB cap on this corpus"),
        "sf_dir": sf,
        "n_vectors": int(len(ids)),
        "n_cells_used": int(len(np.unique(cell))),
        "n_pairs_tau": n_pairs,
        "n_clusters": int(len(np.unique(cluster))),
        "n_keepers": int(keep.sum()),
        "mismatches": mism,
        "status": "OK" if mism == 0 else "MISMATCH",
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    sys.exit(1 if mism else 0)


if __name__ == "__main__":
    main()
