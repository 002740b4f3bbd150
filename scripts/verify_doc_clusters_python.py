"""Independent pure-Python verification of the doc near-dup cluster
family at big SF.

Why: the family's DuckDB oracles replay MinHash banding plus a RECURSIVE
transitive closure; on a 50k-doc corpus whose per-replica near-dup graph
is dense (heavily templated synthetic text), the closure's reach set is
~quadratic per component and the oracle OOMs even at a 48-80 GB cap and
with the de-artifacted (per-replica alphabet-permuted) sf1 fixture —
recorded as ORACLE_OOM in SWEEP_SF1.json. The engine side is banded and
linear (SCALE_PROBE_CDC: edges 9.6x per decade); what's missing is an
independent check of its OUTPUT at that scale. Precedent:
scripts/verify_semdedup_numpy.py and the sf1 cluster_check union-find.

This script recomputes the WHOLE pipeline from scratch in Python/numpy —
3-char polynomial shingle hashes, the 6-permutation MinHash family
((31+2j)h + (7+5j) mod 100003), 3x2 banding, per-bucket star edges
(member -> bucket min), union-find components, min-id cluster labels —
and then each downstream product exactly as its DuckDB oracle spells it:

- doc_neardup_clusters  (doc_id, cluster_id)
- doc_cluster_weights   (+ cluster_size, weight_e6 = 10^6 // size)
- doc_neardup_keep_best (+ quality from the three regex heuristics,
                         max-quality-then-min-id keeper, keep flag)
- doc_weighted_sample   (md5-u32('wsample'||doc_id) % 10^6 < weight_e6)
- doc_split_by_cluster  (md5-u32('split'||cluster_id) % 10^6 bucketed
                         900k/950k -> train/val/test)

and diffs every column row-for-row against the engine queries' results
on the same parquet. Nothing is shared with either engine: hashing is
hashlib/numpy, components are union-find, regexes are Python `re`.

Usage: SF_DIR=/dev/shm/ccs-sf1t PYTHONPATH=. \
           python scripts/verify_doc_clusters_python.py [--out FILE]
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

MINHASH_P = 100003
N_BANDS, ROWS_PER_BAND = 3, 2
TOKEN_RE = re.compile(r"\S+")
PUNCT_RE = re.compile(r"[.,;:!?]")
STOP_RE = re.compile(r"\b(the|and|of)\b")


def md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def shingle_hashes(text: str) -> np.ndarray:
    """c[i]*961 + c[i+1]*31 + c[i+2] over char codes (ASCII corpus)."""
    if text is None or len(text) < 3:
        return np.empty(0, dtype=np.int64)
    c = np.frombuffer(text.encode("ascii"), dtype=np.uint8).astype(np.int64)
    return c[:-2] * 961 + c[1:-1] * 31 + c[2:]


def minhash_sig(sh: np.ndarray, k: int = 6) -> list[int | None]:
    if sh.size == 0:
        return [None] * k
    return [int(np.min(((31 + 2 * j) * sh + (7 + 5 * j)) % MINHASH_P))
            for j in range(k)]


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VERIFY_DOC_CLUSTERS_SF1.json")
    args = ap.parse_args()
    sf_dir = os.environ.get("SF_DIR", "/dev/shm/ccs-sf1t")

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    n_docs = len(doc_ids)
    print(f"[py] {n_docs} docs from {sf_dir}", file=sys.stderr)

    # ---- from-scratch banding -> star edges ----
    buckets: dict[tuple[int, int], list[int]] = {}
    quality: dict[int, int] = {}
    for did, text in zip(doc_ids, texts):
        sig = minhash_sig(shingle_hashes(text))
        for band in range(N_BANDS):
            lo = sig[band * ROWS_PER_BAND]
            hi = sig[band * ROWS_PER_BAND + 1]
            if lo is None or hi is None:
                continue  # Spark/DuckDB equi-joins drop NULL bucket keys
            buckets.setdefault((band, lo * MINHASH_P + hi), []).append(did)
        t = text or ""
        n_tokens = len(TOKEN_RE.findall(t))
        n_punct = len(PUNCT_RE.findall(t))
        has_stop = STOP_RE.search(t) is not None
        quality[did] = (
            (1 if 10 <= n_tokens <= 10000 else 0)
            + (1 if has_stop else 0)
            + (1 if n_punct * 10 <= n_tokens else 0)
        )

    uf = UnionFind()
    n_edges = 0
    for members in buckets.values():
        if len(members) < 2:
            continue
        root = min(members)
        for m in members:
            if m != root:
                uf.union(m, root)
                n_edges += 1
    label = {did: uf.find(did) for did in doc_ids}
    print(f"[py] {n_edges} star edges, "
          f"{len(set(label.values()))} components", file=sys.stderr)

    # ---- downstream products, straight from the oracle SQL ----
    sizes: dict[int, int] = {}
    for cl in label.values():
        sizes[cl] = sizes.get(cl, 0) + 1
    weight = {did: 1_000_000 // sizes[label[did]] for did in doc_ids}

    qmax: dict[int, int] = {}
    for did in doc_ids:
        cl = label[did]
        if quality[did] > qmax.get(cl, -1):
            qmax[cl] = quality[did]
    keeper: dict[int, int] = {}
    for did in sorted(doc_ids):
        cl = label[did]
        if quality[did] == qmax[cl] and cl not in keeper:
            keeper[cl] = did

    sampled = {did for did in doc_ids
               if md5_u32("wsample" + str(did)) % 1_000_000 < weight[did]}

    def split_of(cluster_id: int) -> str:
        h = md5_u32("split" + str(cluster_id)) % 1_000_000
        return "train" if h < 900_000 else ("val" if h < 950_000 else "test")

    expected = {
        "doc_neardup_clusters": {
            did: (label[did],) for did in doc_ids},
        "doc_cluster_weights": {
            did: (label[did], sizes[label[did]], weight[did])
            for did in doc_ids},
        "doc_neardup_keep_best": {
            did: (label[did], quality[did], keeper[label[did]],
                  did == keeper[label[did]])
            for did in doc_ids},
        "doc_weighted_sample": {
            did: (label[did], weight[did]) for did in sorted(sampled)},
        "doc_split_by_cluster": {
            did: (label[did], split_of(label[did])) for did in doc_ids},
    }
    cols = {
        "doc_neardup_clusters": ["cluster_id"],
        "doc_cluster_weights": ["cluster_id", "cluster_size", "weight_e6"],
        "doc_neardup_keep_best": ["cluster_id", "quality", "keeper_doc_id",
                                  "keep"],
        "doc_weighted_sample": ["cluster_id", "weight_e6"],
        "doc_split_by_cluster": ["cluster_id", "split"],
    }

    # ---- engine side ----
    from clever_canal_spark.entry_queries import QUERIES
    from clever_canal_spark.session import build_session

    spark = build_session(app_name="verify-doc-clusters", master="local[16]",
                          shuffle_partitions=16)
    report: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "n_edges": n_edges,
                    "n_clusters": len(sizes), "queries": {}}
    ok_all = True
    try:
        for name, exp in expected.items():
            rows = QUERIES[name](spark, sf_dir).collect()
            got = {r["doc_id"]: tuple(r[c] for c in cols[name]) for r in rows}
            missing = sum(1 for d in exp if d not in got)
            extra = sum(1 for d in got if d not in exp)
            diff = sum(1 for d in exp if d in got and exp[d] != got[d])
            status = "OK" if (missing == 0 and extra == 0 and diff == 0) \
                else "MISMATCH"
            ok_all &= status == "OK"
            report["queries"][name] = {
                "engine_rows": len(got), "python_rows": len(exp),
                "missing": missing, "extra": extra, "value_mismatches": diff,
                "status": status,
            }
            print(f"[py] {name}: engine {len(got)} / python {len(exp)} "
                  f"rows, {diff} value mismatches -> {status}",
                  file=sys.stderr)
    finally:
        spark.stop()

    report["status"] = "OK" if ok_all else "MISMATCH"
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
