"""spark-submit entry point for the corpus-curation pipeline — the
webtext half of the engine: the CDC follower (scripts/run_pipeline.py)
keeps the pages lake current, and THIS job turns the lake's current
state into a training-ready corpus table.

    zip -r ccs.zip clever_canal_spark
    spark-submit --py-files ccs.zip scripts/run_curation.py \
        --table-dir /mnt/shared/lake/pages/ \
        --out-dir   /mnt/shared/corpus/pages-curated/ \
        --dedup-index-dir /mnt/shared/lake/pages_didx/ \
        --seq-budget 2048

Stages (each prints its row count; all JVM-side except nothing):

    lake scan -> persisted-index dedup probe (RAW text — the index holds
                 fingerprints of what sync_from_lake saw; self-match-aware
                 so canonical copies stay and claimed twins drop)
              -> normalize (control chars / whitespace)
              -> Gopher quality filter (5-rule AND)
              -> CCNet perplexity tercile drop (opt-in: --ppl-drop-bucket)
              -> DSIR importance-weight keep (opt-in: --dsir-keep-pct)
              -> PII scrub (emails / IPv4 / phones)
              -> boilerplate line strip (df > max-df lines dropped)
              -> in-corpus exact dedup of the CURATED text (md5 group-by)
              -> deterministic language mix (--mix 'en=100,de=50,...')
              -> sequence packing (fixed --seq-budget token bins)
              -> parquet out

Local smoke:

    PYTHONPATH=. python scripts/run_curation.py --demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.operators.dedup_index import open_dedup_index, probe_exact
from clever_canal_spark.operators.text import (
    boilerplate_strip,
    gopher_quality,
    normalize_text,
    pii_scrub,
    sequence_pack,
    source_mix,
)
from clever_canal_spark.session import build_session


def main() -> None:
    p = argparse.ArgumentParser(description="clever-canal-spark corpus curation")
    p.add_argument("--table-dir", help="pages lake table root")
    p.add_argument("--out-dir", help="curated corpus output (parquet)")
    p.add_argument("--dedup-index-dir", default="",
                   help="persisted dedup index to probe for cross-corpus exact dups "
                        "(docs already in the index are dropped); omit for in-corpus dedup")
    p.add_argument("--max-df", type=int, default=5,
                   help="boilerplate threshold: lines in more docs than this are stripped")
    p.add_argument("--mix", default="",
                   help="language mix, e.g. 'en=100,de=50' (percent kept per lang; "
                        "default keeps 100%% of every lang)")
    p.add_argument("--seq-budget", type=int, default=2048,
                   help="tokens per packed training sequence")
    p.add_argument("--span-ngram", type=int, default=8,
                   help="word-gram size for cross-doc duplicate-passage "
                        "cutting (ExactSubstr family); 0 disables the stage")
    p.add_argument("--url-filter", action="store_true",
                   help="pre-gate on URL signals (IP hosts, blocklist "
                        "suffixes, keywords, digit-spam hosts, deep "
                        "paths, long queries) before any text is read")
    p.add_argument("--url-blocklist", default="",
                   help="comma-separated blocked domains (suffix match)")
    p.add_argument("--encode-ids-merges", type=int, default=None,
                   help="materialize trainer-ready BPE token-id arrays "
                        "(ids, n_bpe_tokens columns) with this many "
                        "freshly-trained merges")
    p.add_argument("--host-report-out", default="",
                   help="write the per-host quality roll-up (parquet; "
                        "blocklist_candidate column proposes the next "
                        "run's --url-blocklist)")
    p.add_argument("--c4-min-lines", type=int, default=1,
                   help="c4-lines doc threshold: min surviving lines "
                        "(default 1 — extracted single-line text passes "
                        "when its one line is clean; raw multi-line "
                        "crawl text wants 3+)")
    p.add_argument("--c4-lines", action="store_true",
                   help="apply the C4 line-rule battery (terminal-punct "
                        "lines, >=3 words, no javascript lines; lorem-"
                        "ipsum/brace docs drop) — surviving lines "
                        "replace the text")
    p.add_argument("--rep-filter", action="store_true",
                   help="drop repetitive docs (Gopher duplicate-2-gram "
                        "verdict, operators/text.repetition_stats)")
    p.add_argument("--skip-quality", action="store_true")
    p.add_argument("--model-quality-threshold-e6", type=int, default=None,
                   help="enable the model-based quality stage: drop docs whose "
                        "linear-classifier mean score (avg_e6) is below this "
                        "(operators/text.linear_quality_score)")
    p.add_argument("--quality-weights-dir", default="",
                   help="parquet dir of (feature_id int, weight_e6 long) — a "
                        "trained fastText/logistic export; default uses the "
                        "deterministic demo weights (hashed_weights)")
    p.add_argument("--ppl-drop-bucket", default="",
                   choices=["", "head", "middle", "tail"],
                   help="enable the CCNet perplexity stage: score every doc "
                        "against an in-corpus bigram reference LM and drop "
                        "the named tercile (operators/text.lm_bigram_scores "
                        "+ ccnet_buckets); unscored docs (<2 tokens) keep")
    p.add_argument("--dsir-keep-pct", type=int, default=None,
                   help="enable the DSIR stage: keep the top N%% of docs by "
                        "per-token hashed importance weight vs the reference "
                        "split (operators/text.dsir_weights); docs with no "
                        "tokens drop")
    p.add_argument("--neardup-keep-best", action="store_true",
                   help="enable the MinHash near-dup drop with the quality-"
                        "aware keeper: each cluster keeps its highest-"
                        "quality copy (ties to the smallest doc_id)")
    p.add_argument("--chunk-dup-min-shared", type=int, default=None,
                   help="enable the shift-resistant passage-dedup stage: "
                        "drop the higher-id doc of any pair sharing >= N "
                        "content-defined chunks (dedup.chunk_dup_pairs); "
                        "catches syndicated copies whose byte offsets "
                        "differ (prefix/suffix edits) that exact dedup "
                        "misses")
    p.add_argument("--skip-boilerplate", action="store_true")
    p.add_argument("--publish-shards", type=int, default=0,
                   help="publish the output as N deterministic shards with an "
                        "integrity _MANIFEST.json (operators/publish.py) "
                        "instead of a bare parquet write; verified post-write")
    p.add_argument("--chunk-dup-max-frac-e6", type=int, default=None,
                   help="drop docs whose duplicated-chunk mass fraction "
                        "exceeds this (ppm of chunk chars shared with any "
                        "other doc; dedup.chunk_dup_fraction) — the "
                        "threshold form of chunk dedup: kills mostly-"
                        "syndicated pages but keeps originals that merely "
                        "QUOTE a shared passage")
    p.add_argument("--split-ppm", default="",
                   help="assign a deterministic train/val/test split column "
                        "on the output, e.g. 'train=900000,val=50000,"
                        "test=50000' (ppm, must sum to 1000000; "
                        "text.assign_splits — salted hash, repartition-"
                        "stable, cross-engine reproducible)")
    p.add_argument("--demo", action="store_true", help="tiny self-contained demo")
    args = p.parse_args()

    spark = build_session(app_name="clever-canal-spark-curation")

    if args.demo:
        import tempfile

        from clever_canal_spark.filters import EventFilterConfig
        from clever_canal_spark.gen import FeedConfig, materialize_feed
        from clever_canal_spark.model import PAGE_SCHEMA
        from clever_canal_spark.plans import ApplyConfig
        from clever_canal_spark.streaming import FeedFollower

        work = tempfile.mkdtemp(prefix="ccs-curation-demo-")
        print(f"demo working dir: {work}")
        n_ev = int(os.environ.get("CCS_DEMO_EVENTS", "5000"))
        materialize_feed(
            spark, FeedConfig(n_events=n_ev, n_urls=max(n_ev // 12, 50)),
            f"{work}/feed", 4, 4,
        )
        table = LakeTable.create(
            spark, f"{work}/pages", PAGE_SCHEMA,
            merge_key=["url", "warc_ts"], n_buckets=16,
        )
        FeedFollower(
            spark, f"{work}/feed", f"{work}/ckpt", table,
            ApplyConfig(filters=EventFilterConfig()),
        ).run_available()
        # adversarial rows so every stage provably fires in the demo:
        # an exact-dup pair, a shared-passage pair (distinct docs, one
        # copied paragraph), a PII doc, a control-char doc, a too-short doc
        dup = ("the quick brown fox jumps over the lazy dog and then runs down "
               "to the river bank before the sun sets on the far hills")
        passage = ("every copy of this exact paragraph should be cut from all "
                   "but nothing else in the document")
        crafted = [
            ("https://demo/dup-a", dup),
            ("https://demo/dup-b", dup),
            ("https://demo/span-a", f"first page intro words {passage} and a "
                                    "unique closing sentence about rivers"),
            ("https://demo/span-b", f"second page different start {passage} "
                                    "then its own ending about mountains"),
            # shifted near-dup pair: same syndicated body behind DIFFERENT
            # prefixes, so every byte offset differs — exact md5 dedup
            # cannot pair them; only the content-defined chunk stage can
            # (body pre-checked to yield >= 3 shared chunks at the
            # default window/divisor — chunk boundaries are content-
            # sensitive, so an arbitrary string may produce none)
            ("https://demo/shift-a", "alpha site header before the body " +
             "".join("shared syndicated article text number "
                     f"{k} that reads the same on every mirror of the wire "
                     "service feed and fills the page with plenty of "
                     "ordinary words about weather markets and sport "
                     for k in range(3))),
            ("https://demo/shift-b", "completely different beta prefix " +
             "".join("shared syndicated article text number "
                     f"{k} that reads the same on every mirror of the wire "
                     "service feed and fills the page with plenty of "
                     "ordinary words about weather markets and sport "
                     for k in range(3))),
            ("https://demo/pii", "write to alice@example.com from 10.1.2.3 "
                                 "or dial 555-123-9876 about the order we "
                                 "placed for the warehouse and the invoice"),
            ("https://demo/ctrl", "bell\x07chars and the rest of the text of "
                                  "this page is long enough to pass the "
                                  "quality filter with the usual words in it"),
            ("https://demo/short", "too short"),
        ]
        table.merge(
            spark.createDataFrame(
                [(u, "2024-01-01 00:00:00", t, "U", 10_000_000 + i)
                 for i, (u, t) in enumerate(crafted)],
                "url string, warc_ts string, text string, op string, lsn bigint",
            )
            .withColumn("warc_ts", F.to_timestamp("warc_ts"))
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("lang", F.lit("en")),
            epoch_id=999, op_col="op", mode="mor", lsn_col="lsn",
        )
        args.table_dir = f"{work}/pages"
        args.out_dir = f"{work}/curated"

    if not (args.table_dir and args.out_dir):
        p.error("--table-dir and --out-dir are required (or --demo)")

    table = LakeTable(spark, args.table_dir)
    snap = table.snapshot()
    scan = table.scan()
    if args.url_filter:
        # cheapest gate first: URL-level signals never read text/html
        from clever_canal_spark.operators.text import url_quality_signals

        bl = tuple(d for d in args.url_blocklist.split(",") if d)
        n0 = scan.count()
        flagged = url_quality_signals(scan, url_col="url", blocked_domains=bl)
        scan = flagged.filter(F.col("url_ok")).drop(
            *[c for c in flagged.columns if c.startswith("f_")], "url_ok"
        )
        print(f"[curate] url filter: {scan.count()}/{n0} urls pass")
    if args.host_report_out:
        # the feedback loop: this run's per-host roll-up proposes the
        # NEXT run's --url-blocklist (host_quality_report docstring)
        from clever_canal_spark.operators.text import host_quality_report

        rep = host_quality_report(
            table.scan().filter(F.col("text").isNotNull())
        ).localCheckpoint()
        rep.write.mode("overwrite").parquet(args.host_report_out)
        n_cand = rep.filter(F.col("blocklist_candidate")).count()
        print(f"[curate] host report: {rep.count()} hosts, "
              f"{n_cand} blocklist candidates -> {args.host_report_out}")
    corpus = scan.select(
        F.xxhash64(*snap.merge_key).alias("doc_id"),
        F.col("text"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
    ).filter(F.col("text").isNotNull())
    print(f"[curate] lake scan: {corpus.count()} docs (table v{snap.version})")

    # index probe FIRST, on the raw lake text: the persisted index holds
    # fingerprints of exactly what sync_from_lake saw, so any later text
    # mutation (normalize/scrub/strip) would mask every match. Self-match-
    # aware: a doc whose best match IS itself is the canonical copy and
    # stays; only docs claimed by a smaller-id twin (or, for a delta batch,
    # by an already-indexed doc) drop.
    if args.dedup_index_dir:
        idx = open_dedup_index(spark, args.dedup_index_dir)
        claimed = probe_exact(idx, corpus, "text", broadcast_batch=False).filter(
            F.col("dup_of_doc_id") != F.col("new_doc_id")
        ).select(F.col("new_doc_id").alias("doc_id"))
        corpus = corpus.join(claimed, on="doc_id", how="left_anti")
        # checkpoint: the probe reads the whole fps index — without this,
        # every later stage's count would re-run the probe join
        corpus = corpus.localCheckpoint()
        print(f"[curate] index dedup probe: {corpus.count()} docs keep "
              f"(canonical or unseen)")

    # normalize BEFORE anything else hashes text: in-corpus dedup keys and
    # quality rules should see the canonical form
    corpus = (
        normalize_text(corpus, "text")
        .withColumnRenamed("clean_text", "text")
        .drop("n_removed")
        .join(corpus.select("doc_id", "lang"), on="doc_id")
    )

    if args.c4_lines:
        from clever_canal_spark.operators.text import c4_line_filter

        c4 = c4_line_filter(corpus, "text", min_lines=args.c4_min_lines)
        n0 = corpus.count()
        kept = c4.filter(F.col("doc_ok")).select("doc_id", "text")
        corpus = (
            corpus.drop("text").join(kept, "doc_id")  # filtered lines replace text
            .localCheckpoint()
        )
        print(f"[curate] c4 line rules: {corpus.count()}/{n0} docs pass "
              f"(surviving lines replace text)")

    if args.rep_filter:
        from clever_canal_spark.operators.text import repetition_stats

        rep = repetition_stats(corpus, "text").filter(F.col("repetitive") == 1)
        n0 = corpus.count()
        corpus = corpus.join(rep.select("doc_id"), "doc_id", "left_anti")
        print(f"[curate] repetition filter: {corpus.count()}/{n0} docs pass")

    if not args.skip_quality:
        passed = gopher_quality(corpus, "text").filter(F.col("passes") == 1)
        corpus = corpus.join(passed.select("doc_id"), on="doc_id", how="left_semi")
        print(f"[curate] gopher quality: {corpus.count()} docs pass")

    if args.model_quality_threshold_e6 is not None:
        from clever_canal_spark.operators.text import (
            hashed_weights,
            linear_quality_score,
        )

        weights = (
            spark.read.parquet(args.quality_weights_dir)
            if args.quality_weights_dir
            else hashed_weights(spark)
        )
        ok = linear_quality_score(corpus, weights).filter(
            F.col("avg_e6") >= args.model_quality_threshold_e6
        )
        corpus = corpus.join(ok.select("doc_id"), on="doc_id", how="left_semi")
        print(f"[curate] model quality (avg_e6 >= "
              f"{args.model_quality_threshold_e6}): {corpus.count()} docs pass")

    if args.ppl_drop_bucket:
        from clever_canal_spark.operators.text import (
            ccnet_buckets,
            lm_bigram_scores,
        )

        buckets = ccnet_buckets(lm_bigram_scores(corpus))
        dropped = buckets.filter(
            F.col("bucket") == args.ppl_drop_bucket
        ).select("doc_id")
        corpus = corpus.join(dropped, on="doc_id", how="left_anti")
        # checkpoint: the LM score is a multi-shuffle lineage (bigram
        # instances x 3 LM joins) — without this every later stage's
        # count re-runs it
        corpus = corpus.localCheckpoint()
        print(f"[curate] ccnet perplexity (drop {args.ppl_drop_bucket}): "
              f"{corpus.count()} docs keep")

    if args.dsir_keep_pct is not None:
        from pyspark.sql.window import Window

        from clever_canal_spark.operators.text import dsir_weights

        # per-token importance score, folded into a milli-nat histogram
        # (the ccnet_buckets stance: the only corpus-wide window runs
        # over the tiny histogram, never raw docs); keep bins from the
        # top until >= keep-pct of scored docs are in
        scored = dsir_weights(corpus).select(
            "doc_id",
            F.floor(
                F.col("lw_sum_e9") / F.col("n_tokens") / F.lit(1e6)
            ).cast("long").alias("__sbin"),
        )
        hist = scored.groupBy("__sbin").agg(F.count(F.lit(1)).alias("n"))
        wd = Window.orderBy(F.col("__sbin").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = hist.select(
            "__sbin",
            F.sum("n").over(wd).alias("cum"),
            F.sum("n").over(Window.partitionBy()).alias("total"),
        )
        # cum grows as bins DESCEND, so every bin at or below the
        # crossing satisfies the target — the threshold is the MAX
        # (highest) satisfying bin, i.e. the first crossing from the top
        th = cum.agg(
            F.max(
                F.when(
                    F.expr(f"cum * 100 >= total * {args.dsir_keep_pct}"),
                    F.col("__sbin"),
                )
            ).alias("t")
        ).first().t
        keep = scored.filter(F.col("__sbin") >= th).select("doc_id")
        corpus = corpus.join(keep, on="doc_id", how="left_semi")
        corpus = corpus.localCheckpoint()
        print(f"[curate] dsir importance (top {args.dsir_keep_pct}%, "
              f"bin >= {th}): {corpus.count()} docs keep")

    scrubbed = pii_scrub(corpus, "text").withColumnRenamed("clean_text", "text")
    pii = scrubbed.agg(
        F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
    ).first()
    print(f"[curate] pii scrub: {pii['e']} emails, {pii['i']} ips, "
          f"{pii['p']} phones redacted")
    corpus = scrubbed.select("doc_id", "text").join(
        corpus.select("doc_id", "lang"), on="doc_id"
    )

    if not args.skip_boilerplate:
        stripped = boilerplate_strip(corpus, max_df=args.max_df, text_col="text")
        corpus = (
            stripped.filter(F.col("n_kept") > 0)
            .select("doc_id", F.col("clean_text").alias("text"))
            .join(corpus.select("doc_id", "lang"), on="doc_id")
        )
        print(f"[curate] boilerplate strip (max_df={args.max_df}): "
              f"{corpus.count()} docs survive")

    # in-corpus exact dedup of the CURATED text (runs with or without the
    # index: stripping/scrubbing can merge docs that differed only in
    # boilerplate, and the index probe upstream saw only raw text)
    first = (
        corpus.groupBy(F.md5("text").alias("__fp"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    corpus = corpus.join(first.select("doc_id"), on="doc_id", how="left_semi")
    # truncate the lineage before mixing/packing: the final pack join reads
    # the curated corpus TWICE (rows + window), and without a checkpoint
    # each side would re-run the whole scan→probe→strip chain — plan depth,
    # not data size, dominated the tail of this job before this line
    corpus = corpus.localCheckpoint()
    print(f"[curate] in-corpus exact dedup: {corpus.count()} docs kept")

    # MinHash-LSH whole-doc near-dup drop, quality-aware keeper: each
    # cluster keeps its HIGHEST-quality copy (ties → smallest doc_id), the
    # FineWeb-style "keep the best copy" policy — runs right after exact
    # dedup so later passage stages see one survivor per surface cluster
    if args.neardup_keep_best:
        from clever_canal_spark.operators.dedup import neardup_keep_best

        verdicts = neardup_keep_best(corpus).localCheckpoint()
        survivors = verdicts.where("keep").select("doc_id")
        # one aggregate: drops + the number of MULTI-doc groups (counting
        # every cluster would just re-print the corpus size — singletons
        # are their own keeper)
        stats = verdicts.agg(
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_drop"),
            F.countDistinct(
                F.when(~F.col("keep"), F.col("cluster_id"))
            ).alias("n_groups"),
        ).collect()[0]
        corpus = corpus.join(survivors, on="doc_id", how="left_semi").localCheckpoint()
        print(f"[curate] near-dup keep-best: {stats['n_groups']} multi-doc "
              f"groups, dropped {stats['n_drop']} lower-quality variants; "
              f"{corpus.count()} docs kept")

    # cross-doc duplicate-passage cut (ExactSubstr family): whole-doc
    # dups are already gone, so what remains is COPIED PASSAGES inside
    # otherwise-distinct docs — detect maximal shared n-gram spans and
    # cut them (operators/dedup.py dup_spans/cut_spans)
    # shift-resistant near-dup drop FIRST (whole docs): content-defined
    # chunk fingerprints re-align on shared passages even when byte
    # offsets differ, so syndicated copies with edited prefixes
    # (invisible to the exact md5 dedup above) pair up here; keep the
    # lowest doc_id of each pair. Runs BEFORE the span-cut stage — a
    # wholesale copy should drop as a document, not survive as a
    # passage-cut husk (and span-cut would erase the very passages this
    # stage keys on).
    if args.chunk_dup_min_shared:
        from clever_canal_spark.operators.dedup import (
            chunk_dup_pairs,
            content_defined_chunks,
        )

        pairs = chunk_dup_pairs(
            content_defined_chunks(corpus),
            min_shared=args.chunk_dup_min_shared,
        )
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        n_losers = losers.count()
        corpus = corpus.join(losers, on="doc_id", how="left_anti").localCheckpoint()
        print(f"[curate] chunk dedup (shared >= {args.chunk_dup_min_shared}): "
              f"dropped {n_losers} shifted near-dups; {corpus.count()} docs kept")

    if args.chunk_dup_max_frac_e6 is not None:
        from clever_canal_spark.operators.dedup import (
            chunk_dup_fraction,
            content_defined_chunks,
        )

        frac = chunk_dup_fraction(content_defined_chunks(corpus))
        heavy = frac.filter(
            F.col("dup_frac_e6") > args.chunk_dup_max_frac_e6
        ).select("doc_id")
        n_heavy = heavy.count()
        corpus = corpus.join(heavy, on="doc_id", how="left_anti").localCheckpoint()
        print(f"[curate] chunk dup-fraction (> {args.chunk_dup_max_frac_e6} "
              f"ppm): dropped {n_heavy} mostly-duplicated docs; "
              f"{corpus.count()} docs kept")

    if args.span_ngram > 0:
        from clever_canal_spark.operators.dedup import cut_spans, dup_spans

        spans = dup_spans(corpus, n=args.span_ngram, min_docs=2)
        n_spans = spans.count()
        corpus = (
            cut_spans(corpus, spans)
            .drop("text")
            .withColumnRenamed("clean_text", "text")
            .filter(F.col("text") != "")
            .localCheckpoint()
        )
        print(f"[curate] passage dedup (n={args.span_ngram}): cut {n_spans} "
              f"spans; {corpus.count()} docs remain non-empty")

    rates = {}
    for part in filter(None, args.mix.split(",")):
        k, v = part.split("=")
        rates[k.strip()] = int(v)
    mixed = source_mix(corpus, rates_pct=rates or None, part_col="lang")
    corpus = corpus.join(mixed.select("doc_id"), on="doc_id", how="left_semi")
    print(f"[curate] mix {rates or '(100% all)'}: {corpus.count()} docs")

    packed = sequence_pack(corpus, budget=args.seq_budget, part_col="lang")
    out = corpus.join(packed.drop("lang"), on="doc_id")

    # held-out split assignment rides the OUTPUT (a column, not a write
    # fork): row-wise by default, cluster-hashed when the chunk-dedup
    # stage is on (its pair graph is gone by now, so re-derive the
    # leakage guard from exact text fingerprints — whole-doc dups are
    # already dropped; shifted near-dups were dropped by the chunk stage)
    if args.split_ppm:
        from clever_canal_spark.operators.text import assign_splits

        parts = dict(
            (k.strip(), int(v))
            for k, v in (p.split("=") for p in args.split_ppm.split(","))
        )
        out = assign_splits(out, weights_ppm=parts)
        dist = {r["split"]: r["count"]
                for r in out.groupBy("split").count().collect()}
        print(f"[curate] splits {parts}: {dist}")
    if args.encode_ids_merges is not None:
        # terminal tokenize: trainer-ready BPE id arrays ride the output
        from clever_canal_spark.operators.text import bpe_encode_ids

        ids = bpe_encode_ids(out, n_merges=args.encode_ids_merges).select(
            "doc_id", "ids", F.col("n_tokens").alias("n_bpe_tokens")
        )
        out = out.join(ids, "doc_id", "left").localCheckpoint()
        tot = out.agg(F.sum("n_bpe_tokens")).first()[0]
        print(f"[curate] bpe encode ({args.encode_ids_merges} merges): "
              f"{tot} token ids materialized")
    if args.publish_shards > 0:
        from clever_canal_spark.operators.publish import (
            publish_dataset,
            verify_dataset,
        )

        manifest = publish_dataset(out, args.out_dir,
                                   n_shards=args.publish_shards)
        check = verify_dataset(spark, args.out_dir)
        print(f"[curate] published {manifest['total_rows']} docs in "
              f"{manifest['n_shards']} shards -> {args.out_dir} "
              f"(verify: {'OK' if check['ok'] else check['mismatches']})")
    else:
        out.write.mode("overwrite").parquet(args.out_dir)
    final = spark.read.parquet(args.out_dir)
    n_bins = final.select("lang", "bin_id").distinct().count()
    print(f"[curate] wrote {final.count()} docs in {n_bins} packed "
          f"{args.seq_budget}-token bins -> {args.out_dir}")

    spark.stop()


if __name__ == "__main__":
    main()
