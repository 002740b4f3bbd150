"""Synthesize an sf1-scale test dataset from sf0.1 — deterministic
K-fold replication with COORDINATED key shifts, so the result has 10x
the rows of every big table while keeping referential integrity
(lineitem→orders/part/supplier, orders→customer) and key uniqueness
(every replica's primary ids shift by i * (max_key + 1)).

Why replicate instead of generating: the driver's testdata generator is
external; the sandbox rule is "synthesize deterministically at small
scale" — id-shifted copies preserve every distribution and correlation
of the original while scaling row counts exactly, and both engines in
the oracle sweep read the SAME files, so correctness comparisons stay
meaningful at the bigger scale. (``scale_probe.py`` set the precedent.)

Dimension tables (region, nation) copy as-is — their keys are
referenced by replicated rows and a 10x nation table would be
semantically wrong, exactly like a real warehouse.

Usage: python scripts/make_sf_big.py [--src /root/testdata/sf0.1]
       [--dst /dev/shm/ccs-sf1] [--factor 10]
Then:  SF_DIR=/dev/shm/ccs-sf1 PYTHONPATH=. python scripts/sweep_oracles.py
"""

from __future__ import annotations

import argparse
import os
import random

import duckdb

# table → (primary id col, {fk col: parent table}); parents' shift base
# is max(parent primary) + 1 so children shift in lockstep
SPEC = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": ("l_orderkey", {"l_orderkey": "orders", "l_partkey": "part",
                                "l_suppkey": "supplier"}),
    "events": ("event_id", {}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/dev/shm/ccs-sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--no-perm-embeddings", action="store_true",
                    help="replicate embedding vectors VERBATIM (the r5 "
                         "first-sweep behavior) instead of the default "
                         "per-replica dimension permutation")
    ap.add_argument("--no-perm-text", action="store_true",
                    help="replicate document text VERBATIM (the r5 "
                         "first-sweep behavior) instead of the default "
                         "per-replica alphabet permutation")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()

    shift_base: dict[str, int] = {}
    for t, (pk, _) in SPEC.items():
        shift_base[t] = con.sql(
            f"SELECT max({pk}) + 1 FROM read_parquet('{args.src}/{t}.parquet')"
        ).fetchone()[0]

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied as-is")

    for t, (pk, fks) in SPEC.items():
        cols = con.sql(
            f"SELECT * FROM read_parquet('{args.src}/{t}.parquet') LIMIT 0"
        ).columns
        shifted_cols = {pk: shift_base[t], **{c: shift_base[p] for c, p in fks.items()}}

        def col_expr(c: str) -> str:
            if c in shifted_cols:
                return f"{c} + i * {shifted_cols[c]} AS {c}"
            if (t == "embeddings" and c == "embedding"
                    and not args.no_perm_embeddings):
                # Per-replica DIMENSION PERMUTATION (orthogonal transform):
                # verbatim replication hands every vector factor-1 exact
                # clones, so LSH buckets densify by the factor and every
                # pair/candidate stage grows by factor^2 BY CONSTRUCTION
                # (observed: the sf1 ANN sweep's knn_join skew-stalled on
                # one clone-bucket task). Permuting dimensions per replica
                # keeps ALL intra-replica geometry exact (dot(P(x), P(y))
                # = dot(x, y): same top-k, same recall curves as x1)
                # while cross-replica vectors decorrelate — the factor-x
                # corpus behaves like `factor` independent corpora, the
                # same trick scale_probe_cdc.py plays with a per-replica
                # alphabet permutation on document text.
                dim = con.sql(
                    f"SELECT len(embedding) FROM "
                    f"read_parquet('{args.src}/{t}.parquet') LIMIT 1"
                ).fetchone()[0]
                cases = []
                for i in range(args.factor):
                    if i == 0:
                        cases.append("WHEN 0 THEN embedding")
                        continue
                    perm = list(range(1, dim + 1))  # duckdb lists are 1-based
                    random.Random(7_777_777 * i).shuffle(perm)
                    cases.append(
                        f"WHEN {i} THEN list_select(embedding, {perm})")
                return "CASE i " + " ".join(cases) + " END AS embedding"
            if (t == "documents" and c == "text"
                    and not args.no_perm_text):
                # Per-replica ALPHABET permutation (bijective per-char
                # map): verbatim text replication makes every doc a
                # near-dup of its factor-1 clones, so the corpus's
                # near-dup graph collapses into one giant component and
                # every clustering/pair-enumerating oracle goes quadratic
                # BY CONSTRUCTION (the r5 first sweep's ORACLE_OOM class).
                # A bijection maps each replica's 3-char shingle set
                # isomorphically — intra-replica Jaccard is EXACT, so the
                # factor-x corpus has factor independent copies of the x1
                # dup structure. Same trick scale_probe_cdc.py documents.
                import string

                lo, up = string.ascii_lowercase, string.ascii_uppercase
                cases = ["WHEN 0 THEN text"]
                for i in range(1, args.factor):
                    perm = list(lo)
                    random.Random(31_337 * i).shuffle(perm)
                    if "".join(perm) == lo:
                        perm = perm[1:] + perm[:1]
                    rot = "".join(perm) + "".join(perm).upper()
                    cases.append(
                        f"WHEN {i} THEN translate(text, '{lo + up}', '{rot}')")
                return "CASE i " + " ".join(cases) + " END AS text"
            return c

        sel = ", ".join(col_expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{args.src}/{t}.parquet'), "
            f"range({args.factor}) r(i) ORDER BY i, {pk}) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: x{args.factor} -> {n} rows (shift base {shift_base[t]})")


if __name__ == "__main__":
    main()
