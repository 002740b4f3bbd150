"""CDC+dedup-core scale probe — the r4-verdict's task #1 (the 100x
question, measured instead of argued from plan shape).

Runs the REPLAY-PATH operators at x1 and x10 input and records, per op:
wall seconds, SHUFFLE bytes (read+write, from Spark's status REST — the
axis that decides whether a plan survives a 100x scale-up), and events or
docs processed. Ops covered:

- ``cdc_engine_replay`` core: the same feed-tail → LWW → MOR-merge
  pipeline ``bench.py`` times (via its ``_replay_once``), at N and 10N
  events. Claim measured: wall grows ~linearly (events/sec ~flat) and
  shuffle bytes grow ~linearly — no superlinear stage anywhere in the
  apply path.
- LWW dedup strategies head-to-head on one epoch-sized batch:
  ``winner_join`` (tiny (key,lsn) shuffle + broadcast semi-join; payload
  bytes never shuffle), ``max_by`` plain, and ``max_by`` salted. Claim:
  winner_join's shuffle bytes stay ~key-sized while the max_by variants
  shuffle the payload — visible in the recorded bytes at both scales.
- ``doc_minhash_lsh_buckets`` + ``doc_neardup_clusters``: banded LSH and
  its connected-components closure on the documents corpus replicated
  K-fold. Claim: the banded design keeps the pair stage (and its
  shuffle) ~linear in the corpus — never the all-pairs quadratic.

Replication is deterministic (id-shifted copies, same distribution) like
``scale_probe.py``; wall seconds at sandbox sizes are scheduling-noisy,
so BYTES is the headline axis here too. Output: one JSON line +
``SCALE_PROBE_CDC.json`` at the repo root; ``bench.py`` embeds it in the
BENCH detail payload.

Usage: PYTHONPATH=. python scripts/scale_probe_cdc.py
       [--sf-dir D] [--factor 10] [--cpus 16] [--base-events 600000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = int(os.environ.get("CCS_PROBE_UI_PORT", "4049"))


def _shuffle_totals() -> tuple[int, int] | None:
    """(read_bytes, write_bytes) summed over all stages so far, via the
    status REST API (spark.ui.enabled must be on). None when the UI is
    unreachable — callers then record bytes as null rather than failing
    the probe."""
    try:
        base = f"http://localhost:{UI_PORT}/api/v1"
        with urllib.request.urlopen(f"{base}/applications", timeout=5) as r:
            apps = json.load(r)
        app_id = apps[0]["id"]
        with urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=10) as r:
            stages = json.load(r)
        rd = sum(s.get("shuffleReadBytes") or 0 for s in stages)
        wr = sum(s.get("shuffleWriteBytes") or 0 for s in stages)
        return rd, wr
    except Exception:
        return None


class _ShuffleMeter:
    """Delta-meter over the cumulative stage totals."""

    def __init__(self):
        self._last = _shuffle_totals()

    def delta(self) -> int | None:
        now = _shuffle_totals()
        if now is None or self._last is None:
            self._last = now
            return None
        d = (now[0] - self._last[0]) + (now[1] - self._last[1])
        self._last = now
        return d


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def _replicate(df, factor: int, id_col: str):
    from pyspark.sql import functions as F

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


def _probe_replay(spark, meter: _ShuffleMeter, n_events: int, tag: str) -> dict:
    """One bench-grade replay (feed materialize untimed, tail→apply→merge
    timed) — reuses bench._replay_once so the probe measures exactly the
    pipeline the headline benchmark times."""
    import bench

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"ccs-cdcprobe-{tag}-", dir=base)
    try:
        meter.delta()  # reset
        r = bench._replay_once(
            spark, work, n_events, max(n_events // 20, 1000), n_epochs=3
        )
        sh = meter.delta()
        return {
            "n_events": n_events,
            "wall_s": r["wall_sec"],
            "sustained_events_per_sec": r["sustained_events_per_sec"],
            "epoch_wall_ms": r["epoch_wall_ms"],
            "shuffle_bytes": sh,
            "final_rows": r["final_rows"],
        }
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _probe_lww(spark, meter: _ShuffleMeter, n_events: int) -> dict:
    """The three dedup strategies over one identical batch: wall + the
    shuffle bytes each strategy's plan actually moves."""
    from pyspark.sql import functions as F

    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.model import KIND_ROW
    from clever_canal_spark.plans.apply import ApplyConfig, _dedup_flatten

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="ccs-cdcprobe-lww-", dir=base)
    try:
        generate_feed(
            spark, FeedConfig(n_events=n_events, n_urls=max(n_events // 20, 1000),
                              versions_per_url=3, zipf_s=3.0, seed=42)
        ).write.mode("overwrite").parquet(f"{d}/feed")
        rows = spark.read.parquet(f"{d}/feed").filter(F.col("kind") == KIND_ROW)
        cfg = ApplyConfig(transform=False)
        out = {"n_events": n_events}
        for name, strategy, salted in (
            ("winner_join", "winner_join", False),
            ("max_by", "max_by", False),
            ("max_by_salted", "max_by", True),
        ):
            flat = _dedup_flatten(rows, cfg, strategy=strategy, salted=salted)
            # warm once so codegen/broadcast init isn't charged to x1
            flat.write.format("noop").mode("overwrite").save()
            meter.delta()
            out[f"{name}_s"] = _timed(
                lambda: flat.write.format("noop").mode("overwrite").save()
            )
            out[f"{name}_shuffle_bytes"] = meter.delta()
        return out
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def _probe_dedup(spark, meter: _ShuffleMeter, sf_dir: str, factor: int) -> dict:
    """MinHash-LSH banding + near-dup clustering on the replicated docs.

    Replicas get DISTINCT text via a per-replica Caesar rotation of the
    alphabet — BIJECTIVE, so the 3-char shingle set of every doc maps
    isomorphically and similarity WITHIN each copy is preserved exactly,
    while copy i shares (almost) no shingles with copy j: x10 behaves
    like 10 independent corpora with x1's dup-rate. A verbatim
    replication would make every doc a near-dup of its 9 clones (the
    workload's true edge/cluster output grows superlinearly by
    construction — measured 36x shuffle at x10), and a lossy transform
    (vowel collapse) INCREASES intra-replica similarity (measured 45x)
    — both curves indict the FIXTURE, not the engine."""
    import string

    from pyspark.sql import functions as F

    from clever_canal_spark.operators.dedup import (
        minhash_lsh_buckets,
        neardup_clusters,
    )

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix=f"ccs-cdcprobe-docs-x{factor}-", dir=base)
    try:
        docs0 = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text")
        )
        n0 = docs0.count()
        lo, up = string.ascii_lowercase, string.ascii_uppercase
        reps = [docs0]
        for i in range(1, factor):
            # per-replica SEEDED alphabet permutation (not a Caesar
            # rotation: only 25 of those exist, so factor > 26 would
            # hand replicas i and i+25 the SAME map — verbatim clones of
            # each other, re-creating the superlinear fixture artifact
            # the bijection exists to avoid). 26! permutations cover any
            # factor; a bijective per-char map keeps each replica's
            # shingle set isomorphic (intra-replica Jaccard exact) while
            # sharing ~no shingles across replicas.
            import random

            perm = list(lo)
            random.Random(1_000_003 * i).shuffle(perm)
            if "".join(perm) == lo:  # astronomically unlikely identity
                perm = perm[1:] + perm[:1]
            rot = "".join(perm) + "".join(perm).upper()
            reps.append(
                docs0.withColumn("doc_id", F.col("doc_id") + F.lit(i * n0))
                .withColumn("text", F.translate("text", lo + up, rot))
            )
        out_df = reps[0]
        for p in reps[1:]:
            out_df = out_df.unionByName(p)
        out_df.write.mode("overwrite").parquet(f"{d}/docs")
        docs = spark.read.parquet(f"{d}/docs")
        n_docs = docs.count()
        out = {"n_docs": n_docs}
        buckets = minhash_lsh_buckets(docs)
        buckets.write.format("noop").mode("overwrite").save()  # warm
        meter.delta()
        out["lsh_buckets_s"] = _timed(
            lambda: buckets.write.format("noop").mode("overwrite").save()
        )
        out["lsh_buckets_shuffle_bytes"] = meter.delta()
        meter.delta()
        st: dict = {}
        out["neardup_clusters_s"] = _timed(
            lambda: neardup_clusters(docs, stats=st)
            .write.format("noop").mode("overwrite").save()
        )
        out["neardup_clusters_shuffle_bytes"] = meter.delta()
        # attribution for the one non-linear curve: loop shuffle is
        # rounds x (edges + nodes); edges must stay ~linear (banded LSH),
        # while rounds is O(log component-diameter) — data-dependent, and
        # this synthetic corpus is one giant near-dup blob per replica,
        # so its diameter (hence rounds) grows with the blob
        out["neardup_edges"] = st.get("edges")
        out["neardup_rounds"] = st.get("rounds")
        return out
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--factors", default=None,
                    help="comma list of replication factors, e.g. 1,10,100 "
                         "(two-decade evidence); overrides --factor")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--base-events", type=int, default=600_000)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_PROBE_CDC.json"),
                    help="output path (point elsewhere for smoke runs so the "
                         "recorded artifact survives)")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override shuffle partitions (default = --cpus; at "
                         "x100 the biggest leg wants ~4x cores so per-task "
                         "shuffle blocks stay spill-free — the same knob a "
                         "cluster run would size to ~2-3x total cores)")
    args = ap.parse_args()

    from clever_canal_spark.session import build_session

    spark = build_session(
        app_name="ccs-cdc-scale-probe", master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions or args.cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    meter = _ShuffleMeter()
    try:
        # untimed warmup: Python workers + codegen + committer init, so the
        # x1 legs (measured first) don't absorb session spin-up and
        # understate growth
        import bench

        wwork = tempfile.mkdtemp(prefix="ccs-cdcprobe-warm-")
        bench._replay_once(spark, wwork, 20_000, 2_000, n_epochs=1)

        factors = ([int(x) for x in args.factors.split(",")]
                   if args.factors else [1, args.factor])
        out: dict = {"sf_dir": args.sf_dir, "cpus": args.cpus}
        for k in factors:
            out[f"x{k}"] = {
                "replay": _probe_replay(spark, meter, args.base_events * k, f"x{k}"),
                "lww": _probe_lww(spark, meter, args.base_events * k),
                "dedup": _probe_dedup(spark, meter, args.sf_dir, k),
            }
    finally:
        spark.stop()

    def ratio(a, b):
        return round(b / a, 2) if a else None

    def growth_between(xa: dict, xb: dict) -> dict:
        g = {
            "replay_wall": ratio(xa["replay"]["wall_s"], xb["replay"]["wall_s"]),
            "replay_shuffle_bytes": ratio(
                xa["replay"]["shuffle_bytes"] or 0,
                xb["replay"]["shuffle_bytes"] or 0),
            "replay_sustained_eps": ratio(
                xa["replay"]["sustained_events_per_sec"] or 1,
                xb["replay"]["sustained_events_per_sec"] or 1),
            "lsh_buckets_shuffle_bytes": ratio(
                xa["dedup"]["lsh_buckets_shuffle_bytes"] or 0,
                xb["dedup"]["lsh_buckets_shuffle_bytes"] or 0),
            "neardup_clusters_shuffle_bytes": ratio(
                xa["dedup"]["neardup_clusters_shuffle_bytes"] or 0,
                xb["dedup"]["neardup_clusters_shuffle_bytes"] or 0),
            "neardup_edges": ratio(
                xa["dedup"].get("neardup_edges") or 0,
                xb["dedup"].get("neardup_edges") or 0),
            "neardup_rounds": ratio(
                xa["dedup"].get("neardup_rounds") or 0,
                xb["dedup"].get("neardup_rounds") or 0),
        }
        for name in ("winner_join", "max_by", "max_by_salted"):
            g[f"lww_{name}_shuffle_bytes"] = ratio(
                xa["lww"][f"{name}_shuffle_bytes"] or 0,
                xb["lww"][f"{name}_shuffle_bytes"] or 0)
        return g

    # x1 → max keeps the key bench.py has always embedded; consecutive
    # pairs add the per-decade curve (e.g. x10→x100)
    out[f"growth_at_x{factors[-1]}"] = growth_between(
        out[f"x{factors[0]}"], out[f"x{factors[-1]}"])
    for a, b in zip(factors, factors[1:]):
        if (a, b) != (factors[0], factors[-1]):
            out[f"growth_x{a}_to_x{b}"] = growth_between(out[f"x{a}"], out[f"x{b}"])
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
