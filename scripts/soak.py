"""Durability soak — the r4-verdict's task #7: one recorded
kill-restart-chaos run of the continuous pipeline with downstream state
(replica shipped per micro-batch, a durable named consumer, a secondary
index) attached, asserting at the end that

- the chaos-run final table state is IDENTICAL (row-set hash) to a
  clean-room single-process replay of the same feed (zero double-applies,
  zero lost epochs — the crash windows COMPOSED, not just unit-tested);
- the replica equals the primary, the secondary index equals a fresh
  rebuild, and the consumer's acked batches covered the changelog exactly
  once (contiguous version ranges, no overlap, no gap);
- every epoch id in the metrics table committed exactly once.

The chaos child is the real CLI (`run_pipeline.py --engine structured
--continuous`) killed with SIGKILL at random points — including
mid-commit — while the driver keeps appending LSN-contiguous feed waves
(with mid-stream DDL) and, during the downtime windows, drains the
consumer and syncs the secondary index (the documented
separate-periodic-invocation pattern). Output: one JSON line +
``SOAK_r05.json`` at the repo root.

Usage: PYTHONPATH=. python scripts/soak.py [--minutes 20]
       [--wave-events 25000] [--cpus 8] [--work DIR] [--seed 4242]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WAVE_SLICES = 4  # files per wave → several micro-batches' worth


def _state_hash(df, cols: list[str]):
    """Engine-side row-set hash: per-row md5-u32 folded in DECIMAL(38,0)
    (the publish-manifest trick — order-free, overflow-free), plus count.
    Every column hashes via md5 over its binary cast so bytes (html) and
    nulls participate without collation questions; no rows ever reach
    the driver."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    fields = ", ".join(
        # ANSI mode forbids numeric→binary casts; md5 over the string form
        # is deterministic for every non-binary type, and binary columns
        # hash their bytes directly
        f"coalesce(md5({c}), chr(30))" if dtypes.get(c) == "binary"
        else f"coalesce(md5(cast({c} as string)), chr(30))"
        for c in cols
    )
    u32 = F.expr(
        f"CAST(conv(substring(md5(concat_ws(chr(31), {fields})), 1, 8), 16, 10) "
        "AS DECIMAL(38,0))"
    )
    agg = df.agg(
        F.sum(u32).cast("decimal(38,0)").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (str(agg["h"]), agg["n"])


def _spawn_child(args, env) -> subprocess.Popen:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--engine", "structured", "--continuous",
        "--source-dir", f"{args.work}/feed",
        "--table-dir", f"{args.work}/pages",
        "--checkpoint", f"{args.work}/ckpt",
        "--metrics-dir", f"{args.work}/metrics",
        "--replica-dir", f"{args.work}/replica",
        "--merge-mode", "mor",
        "--n-buckets", "8",
        "--max-files-per-epoch", "8",
    ]
    return subprocess.Popen(
        cmd, stdout=open(f"{args.work}/child.log", "ab"),
        stderr=subprocess.STDOUT, env=env,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--wave-events", type=int, default=25_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--work", default=None)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--kill-min-s", type=float, default=15.0)
    ap.add_argument("--kill-max-s", type=float, default=40.0)
    args = ap.parse_args()
    args.work = args.work or tempfile.mkdtemp(prefix="ccs-soak-")
    os.makedirs(args.work, exist_ok=True)
    rng = random.Random(args.seed)

    from pyspark.sql import functions as F

    from clever_canal_spark.gen import DdlSpec, FeedConfig, generate_feed
    from clever_canal_spark.lake import LakeTable, sync_replica
    from clever_canal_spark.lake.consumers import Consumer
    from clever_canal_spark.model import EPOCH_METRICS_SCHEMA, PAGE_SCHEMA
    from clever_canal_spark.session import build_session

    spark = build_session(
        app_name="ccs-soak-driver", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    table = LakeTable.create(
        spark, f"{args.work}/pages", PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=8,
    )
    LakeTable.create(
        spark, f"{args.work}/metrics", EPOCH_METRICS_SCHEMA,
        merge_key=["epoch_id"], n_buckets=4,
    )
    consumer = Consumer(table, "soak-client", start_after=0)

    # feed waves: LSN-contiguous slices of one deterministic config; two
    # mid-stream DDLs land inside waves 2 and 5
    W = args.wave_events
    cfg = FeedConfig(
        n_events=W, n_urls=max(W // 10, 500), versions_per_url=3,
        zipf_s=3.0, seed=args.seed, heartbeat_every=1000,
        ddls=[
            DdlSpec(lsn=2 * W + 137,
                    sql="ALTER TABLE cc.pages ADD COLUMN quality double"),
            DdlSpec(lsn=5 * W + 41,
                    sql="ALTER TABLE cc.pages ADD COLUMN fetch_ms bigint DEFAULT 0"),
        ],
    )

    os.makedirs(f"{args.work}/feed", exist_ok=True)
    wave = 0

    def write_wave() -> None:
        nonlocal wave
        lo, hi = wave * W, (wave + 1) * W
        sl = generate_feed(spark, cfg, id_start=lo, id_end=hi,
                           num_partitions=WAVE_SLICES)
        tmp = f"{args.work}/feed/.stage-{wave}"
        sl.write.mode("overwrite").parquet(tmp)
        parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        for j, part in enumerate(parts):
            os.rename(os.path.join(tmp, part),
                      f"{args.work}/feed/binlog-{wave:06d}-{j:03d}.parquet")
        shutil.rmtree(tmp)
        wave += 1

    write_wave()  # wave 0 exists before the child starts

    env = {**os.environ, "PYTHONPATH": REPO,
           "SPARK_GRAFT_CPUS": str(args.cpus)}
    deadline = time.monotonic() + args.minutes * 60
    restarts = 0
    kills_mid_run = 0
    consumer_batches: list[tuple[int, int, int]] = []  # (from_v, to_v, rows)
    secidx = None
    secidx_syncs = 0

    def drain_consumer(limit_batches: int = 50) -> None:
        for _ in range(limit_batches):
            b = consumer.get_without_ack(max_versions=20)
            if b is None:
                return
            n = b.df.count()
            consumer_batches.append((b.from_version, b.to_version, n))
            consumer.ack(b.batch_id)

    child = _spawn_child(args, env)
    restarts += 1
    try:
        while time.monotonic() < deadline:
            # feed keeps flowing while the child lives
            run_for = rng.uniform(args.kill_min_s, args.kill_max_s)
            t_end = time.monotonic() + run_for
            while time.monotonic() < min(t_end, deadline):
                write_wave()
                time.sleep(rng.uniform(2.0, 5.0))
            if child.poll() is None:
                child.send_signal(signal.SIGKILL)
                kills_mid_run += 1
            child.wait()
            # downtime window: the separate periodic maintenance pattern
            drain_consumer()
            if secidx is None and table.scan().take(1):
                from clever_canal_spark.operators.secondary_index import (
                    build_secondary_index,
                )

                secidx = build_secondary_index(
                    table, f"{args.work}/secidx", "lang", n_buckets=4
                )
            elif secidx is not None:
                from clever_canal_spark.operators.secondary_index import (
                    sync_secondary_index,
                )

                sync_secondary_index(secidx, table)
                secidx_syncs += 1
            if time.monotonic() >= deadline:
                break
            child = _spawn_child(args, env)
            restarts += 1
    finally:
        if child.poll() is None:
            child.send_signal(signal.SIGKILL)
            child.wait()

    # final catch-up drain in THIS process (same checkpoint/source — the
    # crash-resume path), then downstream syncs to head
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.streaming import CdcPipeline

    cfg_apply = ApplyConfig(merge_mode="mor")
    metrics = LakeTable(spark, f"{args.work}/metrics")
    pipe = CdcPipeline(
        spark, f"{args.work}/feed", f"{args.work}/ckpt", table, cfg_apply,
        metrics_table=metrics, max_files_per_trigger=8,
    )
    pipe.run_until_drained()
    replica = LakeTable(spark, f"{args.work}/replica")
    sync_replica(replica, table)
    drain_consumer(limit_batches=500)
    from clever_canal_spark.operators.secondary_index import (
        build_secondary_index,
        sync_secondary_index,
    )

    if secidx is not None:
        sync_secondary_index(secidx, table)

    # ---- verification ------------------------------------------------------
    cols = sorted(f["name"] for f in table.snapshot().current_fields())
    chaos_hash, chaos_rows = _state_hash(table.scan(), cols)

    # clean-room replay: same feed, fresh table, one process, no chaos
    from clever_canal_spark.streaming import FeedFollower

    clean = LakeTable.create(
        spark, f"{args.work}/pages_clean", PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=8,
    )
    FeedFollower(
        spark, f"{args.work}/feed", f"{args.work}/ckpt_clean", clean,
        cfg_apply, max_files_per_epoch=8,
    ).run_available()
    clean_cols = sorted(f["name"] for f in clean.snapshot().current_fields())
    clean_hash, clean_rows = _state_hash(clean.scan(), clean_cols)

    replica_cols = sorted(f["name"] for f in replica.snapshot().current_fields())
    rep_hash, rep_rows = _state_hash(replica.scan(), replica_cols)

    # secondary index vs fresh rebuild
    secidx_ok = None
    if secidx is not None:
        rebuilt = build_secondary_index(table, f"{args.work}/secidx_rebuild",
                                        "lang", n_buckets=4)
        a = _state_hash(secidx.entries.scan(), sorted(secidx.entries.scan().columns))
        b = _state_hash(rebuilt.entries.scan(), sorted(rebuilt.entries.scan().columns))
        secidx_ok = a == b

    # consumer coverage: contiguous (from, to] ranges, no gap/overlap, and
    # the delivered row total equals one full changelog read
    ranges_ok = all(
        consumer_batches[i][1] == consumer_batches[i + 1][0]
        for i in range(len(consumer_batches) - 1)
    )
    covered_to = consumer_batches[-1][1] if consumer_batches else 0
    delivered_rows = sum(n for _, _, n in consumer_batches)
    changelog_rows = table.scan_changes(0, covered_to).count() if covered_to else 0

    # epoch registry: every metrics epoch id exactly once
    em = metrics.scan().groupBy("epoch_id").count()
    dup_epochs = em.filter(F.col("count") > 1).count()
    n_epochs = em.count()

    out = {
        "minutes": args.minutes,
        "waves": wave,
        "n_events": wave * W,
        "restarts": restarts,
        "kills_mid_run": kills_mid_run,
        "epochs_committed": n_epochs,
        "duplicate_epoch_ids": dup_epochs,
        "chaos_state": {"hash": chaos_hash, "rows": chaos_rows},
        "clean_state": {"hash": clean_hash, "rows": clean_rows},
        "state_parity": chaos_hash == clean_hash and chaos_rows == clean_rows,
        "schema_evolved": "quality" in cols and "fetch_ms" in cols,
        "replica": {"hash": rep_hash, "rows": rep_rows,
                    "parity": rep_hash == chaos_hash and rep_rows == chaos_rows},
        "secondary_index_syncs": secidx_syncs,
        "secondary_index_equals_rebuild": secidx_ok,
        "consumer": {
            "batches": len(consumer_batches),
            "ranges_contiguous": ranges_ok,
            "delivered_rows": delivered_rows,
            "changelog_rows": changelog_rows,
            "exactly_once": ranges_ok and delivered_rows == changelog_rows,
        },
        "work": args.work,
    }
    ok = (
        out["state_parity"] and out["replica"]["parity"]
        and out["duplicate_epoch_ids"] == 0
        and out["consumer"]["exactly_once"]
        and (secidx_ok is not False)
        and out["schema_evolved"]
    )
    out["ok"] = ok
    with open(os.path.join(REPO, "SOAK_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
