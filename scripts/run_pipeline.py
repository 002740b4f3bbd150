"""spark-submit entry point for the CDC ingest pipeline.

Cluster usage (the north-star packaging shape):

    zip -r ccs.zip clever_canal_spark
    spark-submit --py-files ccs.zip scripts/run_pipeline.py \
        --source-dir  /mnt/shared/feed/pages-cdc/ \
        --table-dir   /mnt/shared/lake/pages/ \
        --checkpoint  /mnt/shared/ckpt/pages-cdc/ \
        --metrics-dir /mnt/shared/lake/pages_metrics/ \
        --merge-mode mor --n-buckets 4096 --table-whitelist 'cc\\..*'

FILESYSTEM REQUIREMENT: with the default LocalFS metadata store, the
feed, table, checkpoint, and metrics paths must live on a POSIX
filesystem shared by the driver and all executors (NFS/Lustre/EFS-style):
the snapshot log commits via exclusive hard-link creation and the
follower binds epochs with O_CREAT|O_EXCL. The lake's metadata layer is
now pluggable (lake/fs.py — MetadataFS seam; ArrowFS wraps any
pyarrow.fs.FileSystem for S3/GCS/HDFS): object stores work once the
store supplies the atomic create-if-absent commit (S3 conditional PUT
If-None-Match — subclass ArrowFS.write_text_exclusive), or in
single-writer deployments as-is (ArrowFS(single_writer=True); one
follower per table is the normal CDC topology). Alternatively the lake
calls map 1:1 onto Iceberg (`merge` → MERGE INTO, the epoch registry →
snapshot summary properties — see lake/table.py module docstring), with
Iceberg's catalog supplying the atomic swap instead.

Local smoke:

    PYTHONPATH=. python scripts/run_pipeline.py --demo

The job is resumable: kill it at any point and rerun with the same
checkpoint — bound-but-unapplied epochs re-apply idempotently.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clever_canal_spark.filters import EventFilterConfig
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import EPOCH_METRICS_SCHEMA, PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.session import build_session
from clever_canal_spark.streaming import CdcPipeline, FeedFollower


def main() -> None:
    p = argparse.ArgumentParser(description="clever-canal-spark CDC ingest")
    p.add_argument("--source-dir", help="feed directory (parquet change events)")
    p.add_argument("--table-dir", help="lake table root")
    p.add_argument("--checkpoint", help="checkpoint directory")
    p.add_argument("--metrics-dir", help="lineage/metrics table root (optional)")
    p.add_argument("--merge-mode", choices=["cow", "mor"], default="mor")
    p.add_argument("--dedup", choices=["winner_join", "max_by", "defer"], default="winner_join")
    p.add_argument("--salted", action="store_true", help="salt the max_by dedup shuffle")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--compact-every", type=int, default=24)
    p.add_argument("--max-files-per-epoch", type=int, default=64)
    p.add_argument("--table-whitelist", default="")
    p.add_argument("--table-blacklist", default="")
    p.add_argument("--mq-export-dir", default="",
                   help="ship the lake changelog to this directory as "
                        "FlatMessage JSONL batches with a durable resume "
                        "cursor (sources/flat_message.py "
                        "export_flat_messages_to_dir — the MQ-sink connector)")
    p.add_argument("--mq-props", default="",
                   help="Canal MQ routing properties for the export, "
                        "SEMICOLON-joined key=value pairs (values keep "
                        "their comma-separated rule lists), e.g. "
                        "'partitionsNum=4;partitionHash=cc\\\\.pages:$pk$;"
                        "dynamicTopic=hot:cc\\\\.pages' — batches gain a "
                        "mq_topic=/mq_partition= queue layout")
    p.add_argument("--lease-path", default="",
                   help="running/standby HA: acquire this leader lease before "
                        "applying (streaming/lease.py — the Canal "
                        "ClientRunningMonitor analog); standbys exit 0 doing "
                        "nothing until the leader's TTL lapses")
    p.add_argument("--node-id", default="",
                   help="this node's identity in the lease (default: host:pid)")
    p.add_argument("--admission-near-bands", type=int, default=None,
                   help="also gate NEAR-duplicates at admission: reject docs "
                        "sharing >= N MinHash-LSH band buckets with an "
                        "indexed doc (banding verdict, unverified — the "
                        "cheap-false-positive side of the door asymmetry)")
    p.add_argument("--admission-chunk-shared", type=int, default=None,
                   help="also gate SHIFTED copies at admission: reject docs "
                        "sharing >= N content-defined chunks with an indexed "
                        "doc (probe_chunk_dups; requires an index built with "
                        "chunk fingerprints)")
    p.add_argument("--admission", action="store_true",
                   help="gate each micro-batch against the dedup index "
                        "(drops duplicate-content events pre-merge; "
                        "structured engine, requires --dedup-index-dir)")
    p.add_argument("--dedup-index-dir", default="",
                   help="maintain a persisted dedup index (md5 fps + MinHash-LSH bands) "
                        "in sync with the lake table: bootstrap from the current state "
                        "on first run, then tail scan_changes() after each drain")
    p.add_argument("--text-index-dir", default="",
                   help="maintain a persisted inverted text index (postings "
                        "bucketed by token + forward index) in sync with the "
                        "lake table — BM25 probes then read only the query "
                        "terms' buckets, never the corpus")
    p.add_argument("--rollup-dir", default="",
                   help="maintain a per-url changelog rollup view (lake/rollup.py: "
                        "n_changes/n_upserts/n_deletes/last_lsn, the hot-key "
                        "detector) in sync with the lake table after each drain")
    p.add_argument("--hll-view-dir", default="",
                   help="maintain a per-domain HLL sketch view (lake/sketch_view.py: "
                        "distinct urls EVER SEEN per domain, dense register rows) in "
                        "sync with the lake changelog — monotone, so it tolerates "
                        "either merge mode and duplicate delivery")
    p.add_argument("--cms-view-dir", default="",
                   help="maintain a count-min sketch view (lake/sketch_view.py: "
                        "net per-domain url-insert frequency in d*w fixed rows, "
                        "turnstile I=+1/D=-1) in sync with the lake changelog — "
                        "additive, so it requires --merge-mode mor like the rollup")
    p.add_argument("--hist-view-dir", default="",
                   help="maintain a per-domain log2-histogram view "
                        "(lake/sketch_view.py: page-size quantile state, <=64 "
                        "bins/group) in sync with the lake changelog — additive, "
                        "requires --merge-mode mor like the rollup")
    p.add_argument("--agg-view-dir", default="",
                   help="maintain an exact per-domain GROUP-BY aggregate view "
                        "(lake/agg_view.py: count/sum/min/max of page text "
                        "length with retraction-correct MIN/MAX) in sync with "
                        "the lake changelog")
    p.add_argument("--join-view-dir", default="",
                   help="maintain an incrementally-synced JOIN view "
                        "(lake/join_view.py): pages enriched by the lang "
                        "dimension at --join-dim-dir; recompute-idempotent, "
                        "works under either merge mode")
    p.add_argument("--join-dim-dir", default="",
                   help="lang-keyed dimension table for --join-view-dir "
                        "(created+seeded by --demo)")
    p.add_argument("--transform-view-dir", default="",
                   help="maintain a derived silver table "
                        "(lake/transform_view.py): text stats per page "
                        "where lang='en'; state-diff synced, exact reseed "
                        "after retention expiry")
    p.add_argument("--secondary-index-dir", default="",
                   help="maintain a secondary index on the lang column "
                        "(operators/secondary_index.py): point lookups by "
                        "value without table scans; state-diff synced")
    p.add_argument("--replica-dir", default="",
                   help="maintain a downstream replica lake "
                        "(lake/replica.py): bootstrap on first run, "
                        "changelog-ship afterwards; schema evolution and "
                        "TRUNCATEs mirror; exactly-once per source version")
    p.add_argument("--replica-filter", default="",
                   help="optional SQL predicate for a filtered replica "
                        "subscription (e.g. \"lang = 'en'\")")
    p.add_argument("--engine", choices=["follower", "structured"], default="follower",
                   help="native follower (full pushdown) or Structured Streaming foreachBatch")
    p.add_argument("--continuous", action="store_true",
                   help="structured engine only: keep tailing instead of drain-and-exit")
    p.add_argument("--consumer", default="",
                   help="named downstream subscriber: after the drain, deliver "
                        "the table's changelog through the getWithoutAck/ack "
                        "cursor protocol (lake/consumers.py) and print progress; "
                        "reopening the same name resumes from its acked cursor")
    p.add_argument("--feed-audit", choices=["warn", "strict"], default=None,
                   help="pre-ingest feed-integrity audit (sources/feed.py): "
                        "LSN continuity holes + duplicate offsets; 'strict' "
                        "aborts on any finding, 'warn' prints and continues")
    p.add_argument("--demo", action="store_true", help="run a tiny self-contained demo")
    args = p.parse_args()

    spark = build_session(app_name="clever-canal-spark-ingest")

    if args.demo:
        import tempfile

        from clever_canal_spark.gen import FeedConfig, materialize_feed

        work = tempfile.mkdtemp(prefix="ccs-demo-")
        print(f"demo working dir: {work}")
        materialize_feed(spark, FeedConfig(n_events=5000, n_urls=300), f"{work}/feed", 4, 4)
        args.source_dir = f"{work}/feed"
        args.table_dir = f"{work}/pages"
        args.checkpoint = f"{work}/ckpt"
        args.metrics_dir = f"{work}/metrics"
        args.rollup_dir = args.rollup_dir or f"{work}/rollup"
        args.hll_view_dir = args.hll_view_dir or f"{work}/hllview"
        args.cms_view_dir = args.cms_view_dir or f"{work}/cmsview"
        args.hist_view_dir = args.hist_view_dir or f"{work}/histview"
        args.join_view_dir = args.join_view_dir or f"{work}/joinview"
        args.join_dim_dir = args.join_dim_dir or f"{work}/langdim"
        args.consumer = args.consumer or "demo-client"
        args.replica_dir = args.replica_dir or f"{work}/replica"
        args.secondary_index_dir = args.secondary_index_dir or f"{work}/secidx"
        args.transform_view_dir = args.transform_view_dir or f"{work}/silver"
        args.agg_view_dir = args.agg_view_dir or f"{work}/aggview"
        args.mq_export_dir = args.mq_export_dir or f"{work}/mqexport"

    if not (args.source_dir and args.table_dir and args.checkpoint):
        p.error("--source-dir, --table-dir and --checkpoint are required (or --demo)")
    if (args.rollup_dir or args.cms_view_dir or args.hist_view_dir) and args.merge_mode != "mor":
        # a COW merge re-emits every surviving co-bucketed row into
        # scan_changes; additive counting would inflate cold keys
        # (lake/rollup.py module docstring) — refuse, don't corrupt
        p.error("--rollup-dir/--cms-view-dir require --merge-mode mor (COW "
                "commits re-emit unchanged co-bucketed rows into the "
                "changelog, which would inflate additive counts)")

    if args.feed_audit:
        from pyspark.sql import functions as F

        from clever_canal_spark.sources.feed import (
            duplicate_lsn_audit,
            lsn_continuity_audit,
            read_feed,
        )

        feed = read_feed(spark, args.source_dir)
        gaps = lsn_continuity_audit(feed).agg(
            F.count("*").alias("n"), F.coalesce(F.sum("missing"), F.lit(0)).alias("m")
        ).collect()[0]
        n_dups = duplicate_lsn_audit(feed).count()
        print(
            f"[audit] lsn gaps: {gaps['n']} (missing {gaps['m']} events), "
            f"duplicated lsns: {n_dups}"
        )
        if args.feed_audit == "strict" and (gaps["n"] or n_dups):
            raise SystemExit(
                "[audit] feed integrity check failed — refusing to ingest "
                "(re-ship the missing/duplicated slices or rerun with "
                "--feed-audit warn)"
            )

    table = LakeTable(spark, args.table_dir)
    if not table.exists():
        table = LakeTable.create(
            spark, args.table_dir, PAGE_SCHEMA,
            merge_key=["url", "warc_ts"], n_buckets=args.n_buckets,
        )
    metrics = None
    if args.metrics_dir:
        metrics = LakeTable(spark, args.metrics_dir)
        if not metrics.exists():
            metrics = LakeTable.create(
                spark, args.metrics_dir, EPOCH_METRICS_SCHEMA,
                merge_key=["epoch_id"], n_buckets=4,
            )
    view = None
    if args.rollup_dir:
        from clever_canal_spark.lake import create_rollup

        if os.path.exists(os.path.join(args.rollup_dir, "_log")):
            view = LakeTable(spark, args.rollup_dir)
        else:
            view = create_rollup(spark, args.rollup_dir, "url",
                                 n_buckets=args.n_buckets)

    hview = None
    if args.hll_view_dir:
        from clever_canal_spark.lake import create_hll_view

        if os.path.exists(os.path.join(args.hll_view_dir, "_log")):
            hview = LakeTable(spark, args.hll_view_dir)
        else:
            # b=5 (m=32): validity floor 2.5*32=80 distinct — right for the
            # demo's ~300 urls; production passes b=12+ (floor ~10k,
            # stderr 1.6% — see lake/sketch_view.py)
            hview = create_hll_view(spark, args.hll_view_dir, "domain",
                                    b=5, n_buckets=args.n_buckets)

    cview = None
    if args.cms_view_dir:
        from clever_canal_spark.lake import create_cms_view

        if os.path.exists(os.path.join(args.cms_view_dir, "_log")):
            cview = LakeTable(spark, args.cms_view_dir)
        else:
            # d=4 x w=1024: overestimate <= 2N/1024 w.p. 15/16 — plenty
            # for the demo's ~300 urls; production sizes w ~ 2N/eps
            cview = create_cms_view(spark, args.cms_view_dir, d=4, w=1024,
                                    n_buckets=4)

    histview = None
    if args.hist_view_dir:
        from clever_canal_spark.lake import create_hist_view

        if os.path.exists(os.path.join(args.hist_view_dir, "_log")):
            histview = LakeTable(spark, args.hist_view_dir)
        else:
            histview = create_hist_view(spark, args.hist_view_dir, "domain",
                                        n_buckets=4)

    jview = jdim = None
    if args.join_view_dir:
        from pyspark.sql import types as T

        from clever_canal_spark.lake import create_join_view

        if not args.join_dim_dir:
            raise SystemExit("--join-view-dir requires --join-dim-dir")
        jdim = LakeTable(spark, args.join_dim_dir)
        if not jdim.exists():
            jdim = LakeTable.create(
                spark, args.join_dim_dir,
                T.StructType([T.StructField("lang", T.StringType()),
                              T.StructField("family", T.StringType())]),
                merge_key=["lang"], n_buckets=2,
            )
            seed = spark.createDataFrame(
                [("en", "germanic", "I", 0), ("de", "germanic", "I", 1),
                 ("fr", "romance", "I", 2)],
                "lang string, family string, op string, lsn long",
            )
            jdim.merge(seed, epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
            print(f"join dim: created + seeded 3 langs at {args.join_dim_dir}")
        if os.path.exists(os.path.join(args.join_view_dir, "_log")):
            jview = LakeTable(spark, args.join_view_dir)
        else:
            jview = create_join_view(spark, args.join_view_dir, table, jdim,
                                     on=["lang"], how="left",
                                     n_buckets=args.n_buckets)

    cfg = ApplyConfig(
        filters=EventFilterConfig(
            table_whitelist=args.table_whitelist, table_blacklist=args.table_blacklist
        ),
        dedup_strategy=args.dedup,
        salted=args.salted,
        merge_mode=args.merge_mode,
        compact_every=args.compact_every,
    )

    if args.engine == "follower":
        fol = FeedFollower(
            spark, args.source_dir, args.checkpoint, table, cfg,
            metrics_table=metrics, max_files_per_epoch=args.max_files_per_epoch,
        )
        if args.lease_path:
            import socket

            from clever_canal_spark.streaming import LeaderLease, run_with_lease

            owner = args.node_id or f"{socket.gethostname()}:{os.getpid()}"
            lease = LeaderLease(args.lease_path, owner)
            results = run_with_lease(fol, lease)
            state = "leader" if lease.is_leader else "standby (no-op)"
            print(f"lease {args.lease_path}: {owner} is {state}")
        else:
            results = fol.run_available()
        print(f"applied {len(results)} epochs; table version {table.current_version()}, "
              f"rows {table.scan().count()}")
    else:
        # --continuous: indexes ride the micro-batch loop via sync_hooks
        # (each sync is exactly-once on consumed lake version, so this is
        # crash-equivalent to the post-drain path below)
        sync_hooks = []
        if args.continuous and args.dedup_index_dir:
            from clever_canal_spark.operators.dedup_index import (
                open_or_build_dedup_index, sync_from_lake,
            )

            didx = open_or_build_dedup_index(table, args.dedup_index_dir)
            sync_hooks.append(lambda t, _i=didx: sync_from_lake(_i, t))
            print("dedup index: maintained per micro-batch")
        if args.continuous and args.text_index_dir:
            from clever_canal_spark.operators.text_index import (
                open_or_build_text_index, sync_text_index_from_lake,
            )

            tidx = open_or_build_text_index(table, args.text_index_dir)
            sync_hooks.append(lambda t, _i=tidx: sync_text_index_from_lake(_i, t))
            print("text index: maintained per micro-batch")
        if args.continuous and args.hll_view_dir:
            from pyspark.sql import functions as F

            from clever_canal_spark.lake import sync_hll_view

            sync_hooks.append(
                lambda t, _v=hview: sync_hll_view(
                    _v, t,
                    item_expr=F.col("url"),
                    group_expr=F.regexp_extract(
                        F.col("url"), r"^[a-z]+://([^/]+)", 1
                    ),
                )
            )
            print("hll view: maintained per micro-batch")
        if args.continuous and args.cms_view_dir:
            from pyspark.sql import functions as F

            from clever_canal_spark.lake import sync_cms_view

            sync_hooks.append(
                lambda t, _v=cview: sync_cms_view(
                    _v, t,
                    item_expr=F.regexp_extract(
                        F.col("url"), r"^[a-z]+://([^/]+)", 1
                    ),
                )
            )
            print("cms view: maintained per micro-batch")
        if args.continuous and args.hist_view_dir:
            from pyspark.sql import functions as F

            from clever_canal_spark.lake import sync_hist_view

            sync_hooks.append(
                lambda t, _v=histview: sync_hist_view(
                    _v, t,
                    value_expr=F.length("text"),
                    group_expr=F.regexp_extract(
                        F.col("url"), r"^[a-z]+://([^/]+)", 1
                    ),
                )
            )
            print("hist view: maintained per micro-batch")
        if args.continuous and args.replica_dir:
            from clever_canal_spark.lake import create_replica, sync_replica

            if not os.path.exists(os.path.join(args.replica_dir, "replica.json")):
                rep_t = create_replica(table, args.replica_dir,
                                       row_filter=args.replica_filter or None)
                print("replica: bootstrapped; shipped per micro-batch")
            else:
                rep_t = LakeTable(spark, args.replica_dir)
                print("replica: shipped per micro-batch")
            sync_hooks.append(lambda t, _r=rep_t: sync_replica(_r, t))
        admission = None
        if args.admission:
            # gate each micro-batch against the dedup index BEFORE apply;
            # the paired sync hook (added above when --continuous) makes
            # epoch N's admissions visible to epoch N+1's gate
            from clever_canal_spark.operators.dedup_index import (
                open_or_build_dedup_index,
            )
            from clever_canal_spark.plans import dedup_admission

            if not args.dedup_index_dir:
                raise SystemExit("--admission requires --dedup-index-dir")
            gidx = open_or_build_dedup_index(
                table, args.dedup_index_dir,
                with_chunks=args.admission_chunk_shared is not None,
            )
            if args.admission_chunk_shared is not None and gidx.chunks is None:
                # opened an EXISTING index built without chunk
                # fingerprints — fail at startup, not on the first batch
                raise SystemExit(
                    "--admission-chunk-shared needs a dedup index with "
                    f"chunk fingerprints, but {args.dedup_index_dir} was "
                    "built without them — rebuild it (remove the dir, or "
                    "build_dedup_index(with_chunks=True))"
                )

            def admission(batch, _i=gidx):
                res = dedup_admission(
                    batch, _i, near_min_bands=args.admission_near_bands,
                    chunk_min_shared=args.admission_chunk_shared,
                )
                return res.batch

            nb = args.admission_near_bands
            cs = args.admission_chunk_shared
            print("admission gate: duplicate-content events dropped pre-merge"
                  + (f" (near-dup at >={nb} shared bands)" if nb else "")
                  + (f" (shifted copies at >={cs} shared chunks)" if cs else ""))
        pipe = CdcPipeline(
            spark, args.source_dir, args.checkpoint, table, cfg,
            metrics_table=metrics, max_files_per_trigger=args.max_files_per_epoch,
            rollup_view=view, sync_hooks=tuple(sync_hooks), admission=admission,
        )
        if args.continuous:
            q = pipe.start(available_now=False, processing_time="10 seconds")
            q.awaitTermination()
        else:
            pipe.run_until_drained()
            print(f"drained; table version {table.current_version()}")

    # post-drain index maintenance works for BOTH engines: the index tails
    # the lake's changelog, not the feed, so it doesn't care which engine
    # applied the epochs (and --continuous streaming users run it from a
    # separate periodic invocation against the same dirs).
    if args.dedup_index_dir and args.continuous and args.engine == "follower":
        print("dedup index: NOT maintained by the follower in --continuous "
              "mode; use --engine structured (per-micro-batch sync_hooks) or "
              "a separate periodic invocation (same dirs, no --continuous)")
    if args.dedup_index_dir and not args.continuous:
        from clever_canal_spark.operators.dedup_index import (
            open_or_build_dedup_index, sync_from_lake,
        )

        fresh = not os.path.isdir(args.dedup_index_dir)
        idx = open_or_build_dedup_index(table, args.dedup_index_dir)
        if fresh:
            print(f"dedup index: bootstrapped from current table state "
                  f"({idx.fps.scan().count()} fingerprints)")
        else:
            n = sync_from_lake(idx, table)
            # no fps count here: the sync is O(delta) by design and a
            # count would rescan the whole fingerprint index every drain
            print(f"dedup index: consumed {n} lake versions")

    if args.text_index_dir and args.continuous and args.engine == "follower":
        print("text index: NOT maintained by the follower in --continuous "
              "mode; use --engine structured (per-micro-batch sync_hooks) or "
              "a separate periodic invocation (same dirs, no --continuous)")
    if args.text_index_dir and not args.continuous:
        from clever_canal_spark.operators.text_index import (
            open_or_build_text_index, sync_text_index_from_lake,
        )

        fresh = not os.path.isdir(args.text_index_dir)
        tidx = open_or_build_text_index(table, args.text_index_dir)
        if fresh:
            print(f"text index: bootstrapped from current table state "
                  f"({tidx.fwd.scan().count()} documents)")
        else:
            n = sync_text_index_from_lake(tidx, table)
            print(f"text index: consumed {n} lake versions")

    if args.rollup_dir and args.continuous and args.engine == "follower":
        print("rollup view: NOT maintained by the follower in --continuous "
              "mode; run a separate periodic invocation (same dirs, no "
              "--continuous) to sync it")
    if args.rollup_dir and not args.continuous:
        # streaming engine already synced per micro-batch (CdcPipeline
        # rollup_view); this catch-up is a no-op there and the real sync
        # for the follower engine — either way the view is now at head
        from clever_canal_spark.lake import SnapshotExpired, sync_rollup

        try:
            n = sync_rollup(view, table)
            print(f"rollup view: consumed {n} lake versions")
            from clever_canal_spark.streaming import render_hotkey_metrics

            # top hot keys in scrape format — the per-destination
            # Collector body an operator would wire to an HTTP endpoint
            print(render_hotkey_metrics(view, top_k=5,
                                        labels={"destination": "pages"}),
                  end="")
        except SnapshotExpired:
            # the changelog below retention is gone and traffic counts
            # cannot be rebuilt from current state — RESET loudly: erase
            # the view (in its own lsn domain = lake versions) and count
            # from NOW
            head = table.current_version()
            view.truncate_rows(head)
            view.commit_epoch_marker(head)
            print(f"rollup view: cursor fell below the source table's "
                  f"snapshot retention — view RESET; counts restart at "
                  f"version {head}")

    if args.join_view_dir:
        # recompute-idempotent: safe post-drain under BOTH engines and
        # either merge mode (COW re-emits only inflate the affected set)
        from clever_canal_spark.lake import SnapshotExpired
        from clever_canal_spark.lake.join_view import (
            bootstrap_join_view, join_view_cursor, join_view_lag,
            sync_join_view,
        )

        try:
            if join_view_cursor(jview) == (0, 0) and not (
                jview.snapshot().files or jview.snapshot().delta_files
            ):
                try:
                    nl, nr = sync_join_view(jview, table, jdim)
                except SnapshotExpired:
                    nl, nr = bootstrap_join_view(jview, table, jdim)
                    print(f"join view: source history past retention — "
                          f"bootstrapped from heads ({nl}, {nr})")
                else:
                    print(f"join view: consumed ({nl}, {nr}) source versions")
            else:
                nl, nr = sync_join_view(jview, table, jdim)
                print(f"join view: consumed ({nl}, {nr}) source versions")
            n_enriched = jview.scan().where("family IS NOT NULL").count()
            print(f"join view: {jview.scan().count()} rows, "
                  f"{n_enriched} enriched; lag {join_view_lag(jview, table, jdim)}")
        except SnapshotExpired:
            print("join view: cursor fell below source retention — recreate "
                  "the view dir and rerun to bootstrap from current state")

    if args.transform_view_dir:
        from clever_canal_spark.lake import (
            SnapshotExpired, create_transform_view, open_transform_view,
            reseed_transform_view, sync_transform_view,
        )

        if not os.path.exists(
            os.path.join(args.transform_view_dir, "_log", "transformview.json")
        ):
            tv = create_transform_view(
                table, args.transform_view_dir,
                exprs={"n_chars": "CAST(length(text) AS INT)",
                       "head": "upper(substr(text, 1, 4))"},
                row_filter="lang = 'en'",
            )
            print(f"transform view: bootstrapped "
                  f"({tv.scan().count()} derived rows, lang='en')")
        else:
            tv = open_transform_view(spark, args.transform_view_dir)
            try:
                n = sync_transform_view(tv, table)
                print(f"transform view: consumed {n} lake versions")
            except SnapshotExpired:
                v = reseed_transform_view(tv, table)
                print(f"transform view: cursor fell below retention — "
                      f"reseeded exactly from live state at version {v}")

    if args.mq_export_dir:
        from clever_canal_spark.lake import SnapshotExpired
        from clever_canal_spark.sources import export_flat_messages_to_dir

        mq = None
        if args.mq_props:
            from clever_canal_spark.sources import parse_mq_properties

            props = dict(
                kv.split("=", 1) for kv in args.mq_props.split(";") if kv
            )
            mq = parse_mq_properties(props)
        try:
            r = export_flat_messages_to_dir(
                table, args.mq_export_dir, database="cc", table_name="pages",
                mq=mq,
            )
            if r["consumed"]:
                routed = f" routed x{mq.partitions_num}" if mq else ""
                print(f"mq export: {r['n_messages']} messages "
                      f"({r['consumed']} versions){routed} -> {r['path']}")
                if mq is not None and mq.partition_hash:
                    # close the loop: one queue worker drains partition 0
                    # of the first routed topic (get/ack contract)
                    import os as _os

                    from clever_canal_spark.sources.flat_message import (
                        tail_flat_messages,
                    )

                    topics = sorted(
                        t.split("=", 1)[1]
                        for t in _os.listdir(r["path"])
                        if t.startswith("mq_topic=")
                    )
                    if not topics:
                        # versions can advance with zero changelog rows
                        # (stale-epoch / truncate-only windows) — the batch
                        # dir then has no topic subtrees to drain
                        print("mq consume: no routed messages this window")
                    else:
                        df, ack = tail_flat_messages(
                            spark, args.mq_export_dir,
                            _os.path.join(args.mq_export_dir, "_worker0.json"),
                            topic=topics[0], partition=0,
                        )
                        n = 0 if df is None else df.count()
                        ack()
                        print(f"mq consume: worker0 drained {n} messages "
                              f"from {topics[0]}/0 and acked")
        except SnapshotExpired:
            print("mq export: cursor fell below snapshot retention — "
                  "downstream must re-seed (replica bootstrap story); "
                  "remove _cursor.json to restart from retained history")

    if args.agg_view_dir:
        from clever_canal_spark.lake import (
            SnapshotExpired, create_agg_view, open_agg_view,
            reseed_agg_view, sync_agg_view,
        )

        if not os.path.exists(
            os.path.join(args.agg_view_dir, "_log", "aggview.json")
        ):
            av = create_agg_view(
                table, args.agg_view_dir,
                "regexp_extract(url, '^[a-z]+://([^/]+)', 1)",
                "CAST(length(text) AS INT)",
            )
            print(f"agg view: bootstrapped ({av.scan().count()} domain "
                  f"groups: count/sum/min/max text length)")
        else:
            av = open_agg_view(spark, args.agg_view_dir)
            try:
                n = sync_agg_view(av, table)
                print(f"agg view: consumed {n} lake versions")
            except SnapshotExpired:
                v = reseed_agg_view(av, table)
                print(f"agg view: cursor fell below retention — reseeded "
                      f"exactly from live state at version {v}")
        for r in av.scan().orderBy("group_key").limit(1).collect():
            print(f"agg view: domain={r['group_key']} rows={r['n_rows']} "
                  f"text length min/max {r['min_val']}/{r['max_val']} chars")

    if args.secondary_index_dir:
        from clever_canal_spark.lake import SnapshotExpired
        from clever_canal_spark.operators.secondary_index import (
            build_secondary_index, open_secondary_index,
            reseed_secondary_index, sync_secondary_index,
        )

        if not os.path.exists(
            os.path.join(args.secondary_index_dir, "_log", "secindex.json")
        ):
            sidx = build_secondary_index(table, args.secondary_index_dir, "lang")
            print(f"secondary index: bootstrapped on lang "
                  f"({sidx.entries.scan().count()} entries)")
        else:
            sidx = open_secondary_index(spark, args.secondary_index_dir)
            try:
                n = sync_secondary_index(sidx, table)
                print(f"secondary index: consumed {n} lake versions")
            except SnapshotExpired:
                v = reseed_secondary_index(sidx, table)
                print(f"secondary index: cursor fell below retention — "
                      f"reseeded exactly from live state at version {v}")

    if args.replica_dir:
        # cursor-based and exactly-once per consumed source version: safe
        # post-drain under both engines (a continuous structured run that
        # shipped per micro-batch just syncs 0 here)
        from clever_canal_spark.lake import (
            SnapshotExpired, create_replica, replica_lag, sync_replica,
        )

        if not os.path.exists(os.path.join(args.replica_dir, "replica.json")):
            rep = create_replica(table, args.replica_dir,
                                 row_filter=args.replica_filter or None)
            print(f"replica: bootstrapped at source version "
                  f"{table.current_version()} ({rep.scan().count()} rows)")
        else:
            rep = LakeTable(spark, args.replica_dir)
            try:
                n = sync_replica(rep, table)
                print(f"replica: consumed {n} source versions; "
                      f"lag {replica_lag(rep, table)}")
            except SnapshotExpired:
                print("replica: cursor fell below source retention — "
                      "recreate the replica dir to re-bootstrap from "
                      "current state")

    if args.hll_view_dir and args.continuous and args.engine == "follower":
        print("hll view: NOT maintained by the follower in --continuous "
              "mode; run a separate periodic invocation (same dirs, no "
              "--continuous) to sync it")
    if args.hll_view_dir and not args.continuous:
        from pyspark.sql import functions as F

        from clever_canal_spark.lake import (
            SnapshotExpired, hll_view_estimates, sync_hll_view,
        )

        try:
            n = sync_hll_view(
                hview, table,
                item_expr=F.col("url"),
                group_expr=F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1),
            )
            print(f"hll view: consumed {n} lake versions")
            for r in hll_view_estimates(hview).orderBy("domain").limit(5).collect():
                print(f"hll view: domain={r['domain']} ~{r['hll_distinct']} distinct urls")
        except SnapshotExpired:
            # changelog below retention is gone; the registers stay (the
            # estimate remains a valid ever-seen count of what the view
            # DID observe) — skip the cursor to head and keep counting
            head = table.current_version()
            hview.commit_epoch_marker(head)
            print(f"hll view: cursor fell below snapshot retention — items "
                  f"in the expired range were missed (estimate is now a "
                  f"lower bound); resuming at version {head}")

    if args.cms_view_dir and args.continuous and args.engine == "follower":
        print("cms view: NOT maintained by the follower in --continuous "
              "mode; run a separate periodic invocation (same dirs, no "
              "--continuous) to sync it")
    if args.cms_view_dir and not args.continuous:
        from pyspark.sql import functions as F

        from clever_canal_spark.lake import (
            SnapshotExpired, cms_view_estimate, sync_cms_view,
        )

        domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
        try:
            n = sync_cms_view(cview, table, item_expr=domain)
            print(f"cms view: consumed {n} lake versions")
            # demo probe list: a handful of live domains from the table
            # (real deployments probe a known watchlist — the sketch
            # itself never needs the source scanned)
            probes = (
                table.scan().select(domain.alias("item")).distinct().limit(5)
            )
            for r in cms_view_estimate(cview, probes, "item").orderBy("item").collect():
                print(f"cms view: domain={r['item']} ~{r['cms_count']} net url inserts (I-D markers)")
        except SnapshotExpired:
            # additive state can't absorb a gap (missed I's AND missed
            # D's) — same stance as the rollup: reset loudly, count from
            # NOW
            head = table.current_version()
            cview.truncate_rows(head)
            cview.commit_epoch_marker(head)
            print(f"cms view: cursor fell below snapshot retention — view "
                  f"RESET; counts restart at version {head}")

    if args.hist_view_dir and args.continuous and args.engine == "follower":
        print("hist view: NOT maintained by the follower in --continuous "
              "mode; run a separate periodic invocation (same dirs, no "
              "--continuous) to sync it")
    if args.hist_view_dir and not args.continuous:
        from pyspark.sql import functions as F

        from clever_canal_spark.lake import (
            SnapshotExpired, hist_view_quantiles, sync_hist_view,
        )

        try:
            n = sync_hist_view(
                histview, table,
                value_expr=F.length("text"),
                group_expr=F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1),
            )
            print(f"hist view: consumed {n} lake versions")
            for r in (hist_view_quantiles(histview, [500, 990])
                      .orderBy("domain", "q_permille").limit(4).collect()):
                print(f"hist view: domain={r['domain']} p{r['q_permille'] // 10}"
                      f" page size in [{r['est_lo']}, {r['est_hi']}] chars")
        except SnapshotExpired:
            # additive state can't absorb a gap — same stance as the
            # rollup/CMS: reset loudly, count from NOW
            head = table.current_version()
            histview.truncate_rows(head)
            histview.commit_epoch_marker(head)
            print(f"hist view: cursor fell below snapshot retention — view "
                  f"RESET; counts restart at version {head}")

    if (args.hll_view_dir or args.hist_view_dir) and not args.continuous:
        # one scrape body for the sketch gauges, next to the rollup's
        # hot-key rows above — what an HTTP /metrics endpoint would serve
        from clever_canal_spark.streaming import render_sketch_metrics

        print(render_sketch_metrics(
            hll_view=hview if args.hll_view_dir else None,
            hist_view=histview if args.hist_view_dir else None,
            labels={"destination": "pages"},
        ), end="")

    if args.consumer and args.continuous:
        print("consumer: not drained in --continuous mode; run a separate "
              "periodic invocation (same dirs, no --continuous) to consume")
    if args.consumer and not args.continuous:
        # the downstream-subscriber surface (MemoryMetaManager /
        # getWithoutAck-ack protocol analog): a fresh name replays the
        # whole retained changelog; a reopened name resumes from its
        # durably acked cursor — crash between batches redelivers
        from clever_canal_spark.lake import Consumer

        c = Consumer(table, args.consumer, start_after=0)
        n_rows = n_batches = 0
        while (b := c.get_without_ack(max_versions=8)) is not None:
            n_rows += b.df.count()
            for tr in b.truncates:
                print(f"consumer {args.consumer}: TRUNCATE at lsn {tr['lsn']} "
                      f"(erase downstream state)")
            c.ack(b.batch_id)
            n_batches += 1
        print(f"consumer {args.consumer}: delivered {n_batches} batch(es), "
              f"{n_rows} change rows; acked cursor v{c.cursor()}")

    spark.stop()


if __name__ == "__main__":
    main()
