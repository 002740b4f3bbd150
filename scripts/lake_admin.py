"""spark-submit entry point for lake table administration — the
operational surface next to run_pipeline (ingest) and run_curation
(corpus): inspect and maintain a LakeTable without writing code.

    zip -r ccs.zip clever_canal_spark
    spark-submit --py-files ccs.zip scripts/lake_admin.py \
        --table-dir /mnt/shared/lake/pages <command> [args]

Commands:

    fsck [--deep]              integrity check (lake/fsck.py); exit 1 on findings
    status                     one-stop zero-job health summary (JSON)
    advise                     maintenance advisor (lake/advisor.py); zero jobs;
                               --apply executes the due actions in order
    history                    retained operation log (newest first)
    compact [--zorder c1,c2]   fold MOR deltas; optional z-order layout
    rebucket N                 metadata-only bucket-count change (nesting)
    migrate-spec               eagerly rewrite old-bucket-spec files
    set-stats-cols c1,c2       manifest column stats for scan_where pruning
    expire --keep N            expire_snapshots(keep_last=N)
    vacuum [--ttl SECONDS]     remove orphan files / stale stage dirs
    delete-where 'PRED' --epoch ID    logical bulk delete (change events)
    erase-where 'PRED' --epoch ID     PHYSICAL erasure (GDPR protocol)
    tag NAME [--version V] | untag NAME | refs
    whence url=VALUE [k=v ...]     row-level provenance (lake/provenance.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clever_canal_spark.lake import LakeTable, check_table, erase_rows
from clever_canal_spark.plans import delete_where
from clever_canal_spark.session import build_session


def main() -> None:
    p = argparse.ArgumentParser(description="clever-canal-spark lake admin")
    p.add_argument("--table-dir",
                   help="lake table root (required for every command "
                        "except feed-audit)")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("fsck").add_argument("--deep", action="store_true")
    ad = sub.add_parser("advise")
    ad.add_argument("--keep-target", type=int, default=32)
    ad.add_argument("--apply", action="store_true",
                    help="execute the advise-severity actions in dependency "
                         "order (compact -> migrate-spec -> expire -> vacuum); "
                         "info findings are never applied")
    ad.add_argument("--vacuum-ttl", type=float, default=3600.0)
    sub.add_parser("history")
    st = sub.add_parser("status")
    st.add_argument("--keep-target", type=int, default=32)
    c = sub.add_parser("compact")
    c.add_argument("--zorder", default="")
    rb = sub.add_parser("rebucket")
    rb.add_argument("n", type=int)
    sub.add_parser("migrate-spec")
    sc = sub.add_parser("set-stats-cols")
    sc.add_argument("cols")
    ex = sub.add_parser("expire")
    ex.add_argument("--keep", type=int, required=True)
    va = sub.add_parser("vacuum")
    va.add_argument("--ttl", type=float, default=3600.0)
    dw = sub.add_parser("delete-where")
    dw.add_argument("pred")
    dw.add_argument("--epoch", required=True)
    ew = sub.add_parser("erase-where")
    ew.add_argument("pred")
    ew.add_argument("--epoch", required=True)
    tg = sub.add_parser("tag")
    tg.add_argument("name")
    tg.add_argument("--version", type=int, default=None)
    ut = sub.add_parser("untag")
    ut.add_argument("name")
    sub.add_parser("refs")
    wh = sub.add_parser("whence")
    wh.add_argument("keys", nargs="+",
                    help="key column assignments, e.g. url=http://a.com/1")
    fa = sub.add_parser("feed-audit")
    fa.add_argument("--feed-dir", required=True,
                    help="feed directory (parquet change events)")
    fa.add_argument("--lsn-col", default="lsn")
    fa.add_argument("--bucket", type=int, default=100_000,
                    help="gap-scan bucket width (lsn DIV bucket)")
    fa.add_argument("--max-rows", type=int, default=50,
                    help="print at most this many gap/dup rows")
    dd = sub.add_parser("dataset-diff")
    dd.add_argument("--a", required=True, help="published dataset A (baseline)")
    dd.add_argument("--b", required=True, help="published dataset B (candidate)")
    args = p.parse_args()

    if args.cmd not in ("feed-audit", "dataset-diff") and not args.table_dir:
        p.error("--table-dir is required for this command")

    spark = build_session(app_name="ccs-lake-admin")
    if args.cmd == "dataset-diff":
        # published-snapshot diff (operators/publish.py diff_datasets):
        # JSON per-shard rows + summary; exit 1 when anything changed —
        # scriptable as a "did the re-publish move?" gate
        from clever_canal_spark.operators.publish import diff_datasets

        rows = diff_datasets(spark, args.a, args.b).orderBy("shard").collect()
        n_a = sum(r["n_only_a"] for r in rows)
        n_b = sum(r["n_only_b"] for r in rows)
        changed = [r["shard"] for r in rows if r["changed"]]
        for r in rows:
            print(json.dumps(r.asDict()))
        print(f"[admin] dataset-diff: {len(changed)}/{len(rows)} shards "
              f"changed, {n_a} rows only in A, {n_b} only in B")
        sys.exit(1 if changed else 0)
    if args.cmd == "feed-audit":
        # feed-integrity pass (sources/feed.py): continuity holes +
        # duplicate offsets, as JSON rows + a summary line; exit 1 on
        # any finding (scriptable as a pre-ingest gate)
        from pyspark.sql import functions as F

        from clever_canal_spark.sources.feed import (
            duplicate_lsn_audit,
            lsn_continuity_audit,
            read_feed,
        )

        feed = read_feed(spark, args.feed_dir)
        gaps = lsn_continuity_audit(feed, lsn_col=args.lsn_col,
                                    bucket=args.bucket)
        dups = duplicate_lsn_audit(feed, lsn_col=args.lsn_col)
        g_rows = gaps.orderBy("gap_start").limit(args.max_rows).collect()
        d_rows = dups.orderBy("lsn").limit(args.max_rows).collect()
        for r in g_rows:
            print(json.dumps({"kind": "gap", **r.asDict()}))
        for r in d_rows:
            print(json.dumps({"kind": "dup_lsn", **r.asDict()}))
        tot = gaps.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("missing"), F.lit(0)).alias("m"),
        ).collect()[0]
        n_dup = dups.count()
        print(f"[admin] feed-audit: {tot['n']} gap(s) "
              f"({tot['m']} missing events), {n_dup} duplicated lsn(s)")
        raise SystemExit(1 if (tot["n"] or n_dup) else 0)
    t = LakeTable(spark, args.table_dir)
    rc = 0
    if args.cmd == "fsck":
        findings = check_table(t, deep=args.deep)
        for f in findings:
            print(json.dumps(f))
        print(f"[admin] fsck: {len(findings)} finding(s) "
              f"({'deep' if args.deep else 'metadata'} pass)")
        rc = 1 if findings else 0
    elif args.cmd == "advise":
        from clever_canal_spark.lake.advisor import maintenance_report

        findings = maintenance_report(t, keep_target=args.keep_target)
        for f in findings:
            print(json.dumps(f))
        n_adv = sum(1 for f in findings if f["severity"] == "advise")
        print(f"[admin] advise: {n_adv} action(s) due, "
              f"{len(findings) - n_adv} info")
        if args.apply and n_adv:
            from clever_canal_spark.lake.advisor import apply_maintenance

            for r in apply_maintenance(t, findings,
                                       keep_target=args.keep_target,
                                       vacuum_ttl_s=args.vacuum_ttl):
                print(f"[admin] applied {r['action']}: {r['result']}")
            left = maintenance_report(t, keep_target=args.keep_target)
            n_left = sum(1 for f in left if f["severity"] == "advise")
            print(f"[admin] advise after apply: {n_left} action(s) still due")
    elif args.cmd == "status":
        # one-stop zero-job health summary: manifest + sidecars only
        import os as _os

        from clever_canal_spark.lake.advisor import maintenance_report
        from clever_canal_spark.lake.consumers import Consumer

        snap = t.snapshot()
        rows = sum(f.get("rows") or 0 for f in snap.files)
        drows = sum(f.get("rows") or 0 for f in snap.delta_files)
        doc = {
            "version": snap.version,
            "base_files": len(snap.files),
            "delta_files": len(snap.delta_files),
            "rows_in_bases": rows,
            "rows_in_deltas": drows,
            "n_buckets": snap.n_buckets,
            "merge_key": list(snap.merge_key),
            "stats_cols": list(snap.stats_cols or []),
            "tags": {k: int(v["version"]) for k, v in t.list_refs().items()},
            "committed_epochs": len(t.committed_epochs()),
            "consumers": Consumer.list_all(t),
            "advise_due": sum(
                1 for f in maintenance_report(t, keep_target=args.keep_target)
                if f["severity"] == "advise"
            ),
            "recent_operations": [
                {"version": h["version"], "operation": h["operation"]}
                for h in t.history()[:5]
            ],
        }
        lease_path = _os.path.join(args.table_dir, "_running.json")
        if _os.path.exists(lease_path):
            import json as _json

            with open(lease_path) as fh:
                doc["lease"] = _json.load(fh)
        print(json.dumps(doc, indent=1))
        n_deltas = doc["delta_files"]
        print(f"[admin] status: v{doc['version']}, ~{rows} base rows"
              f" (+{drows} pending delta rows in {n_deltas} files),"
              f" {doc['advise_due']} maintenance action(s) due")
    elif args.cmd == "history":
        for h in t.history():
            print(json.dumps(h))
    elif args.cmd == "compact":
        z = [c for c in args.zorder.split(",") if c]
        v = t.compact(zorder_cols=z or None)
        print(f"[admin] compact -> v{v}" if v else "[admin] compact: no deltas")
    elif args.cmd == "rebucket":
        print(f"[admin] rebucket -> v{t.rebucket(args.n)}")
    elif args.cmd == "migrate-spec":
        v = t.migrate_bucket_spec()
        print(f"[admin] migrate-spec -> v{v}" if v else "[admin] migrate-spec: nothing stale")
    elif args.cmd == "set-stats-cols":
        print(f"[admin] set-stats-cols -> v{t.set_stats_cols(args.cols.split(','))}")
    elif args.cmd == "expire":
        gone = t.expire_snapshots(keep_last=args.keep)
        print(f"[admin] expired {len(gone)} snapshot(s)")
    elif args.cmd == "vacuum":
        r = t.vacuum(orphan_ttl_s=args.ttl)
        print(f"[admin] vacuum: {len(r['removed_files'])} file(s), "
              f"{r['removed_stage_dirs']} stage dir(s), "
              f"{r['removed_sealed_branches']} sealed branch(es)")
    elif args.cmd == "delete-where":
        r = delete_where(t, args.pred, epoch_id=args.epoch)
        print(f"[admin] delete-where applied={r.applied} v{r.version} lsn={r.lsn}")
    elif args.cmd == "erase-where":
        r = erase_rows(t, args.pred, epoch_id=args.epoch)
        print(f"[admin] erase-where applied={r.delete_applied} v{r.version} "
              f"files_removed={r.files_removed}")
    elif args.cmd == "tag":
        print(f"[admin] tag {args.name} -> v{t.create_tag(args.name, args.version)}")
    elif args.cmd == "untag":
        t.drop_tag(args.name)
        print(f"[admin] untag {args.name}")
    elif args.cmd == "refs":
        for name, ref in t.list_refs().items():
            print(json.dumps({"name": name, **ref}))
    elif args.cmd == "whence":
        from clever_canal_spark.lake import row_provenance

        kv = dict(a.split("=", 1) for a in args.keys)
        print(json.dumps(row_provenance(t, **kv), indent=1))
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
