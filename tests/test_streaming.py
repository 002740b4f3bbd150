"""Streaming pipeline: tail → apply, checkpoint resume, mid-stream file
arrival, exactly-once across restarts."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.functions.transforms import extract_text_from_html, tag_language
from clever_canal_spark.gen import FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.sources import write_feed_slices
from clever_canal_spark.streaming import CdcPipeline


def _final_state(table):
    return {
        (r["url"], str(r["warc_ts"])): (r["text"], r["lang"]) for r in table.scan().collect()
    }


def _oracle(feed_rows):
    out = {}
    for (url, warc_ts), img in reference_apply(feed_rows).items():
        text = extract_text_from_html(bytes(img["html"]))
        out[(url, str(warc_ts))] = (text, tag_language(text))
    return out


def test_stream_drain_and_resume(spark, tmp_table_dir):
    src_dir = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    tbl_dir = os.path.join(tmp_table_dir, "pages")

    cfgf = FeedConfig(n_events=1200, n_urls=80, seed=3)
    feed = generate_feed(spark, cfgf).cache()
    slices = write_feed_slices(feed, src_dir, n_slices=6, n_events=cfgf.n_events)
    assert len(slices) == 6

    # phase 1: only the first 3 slices exist (rest parked outside the dir)
    hold_dir = os.path.join(tmp_table_dir, "hold")
    os.makedirs(hold_dir)
    held_back = []
    for p in slices[3:]:
        os.rename(p, os.path.join(hold_dir, os.path.basename(p)))
        held_back.append(p)

    table = LakeTable.create(spark, tbl_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4)
    pipe = CdcPipeline(
        spark, src_dir, ckpt, table, ApplyConfig(), max_files_per_trigger=2
    )
    pipe.run_until_drained()
    epochs_after_p1 = set(table.committed_epochs())
    assert len(epochs_after_p1) >= 1

    partial_oracle = _oracle(feed.filter(F.col("lsn") < 600).collect())
    assert _final_state(table) == partial_oracle

    # phase 2: remaining files arrive; resume from the SAME checkpoint
    for p in held_back:
        os.rename(os.path.join(hold_dir, os.path.basename(p)), p)
    pipe.run_until_drained()

    assert _final_state(table) == _oracle(feed.collect())
    # restart again with nothing new: no further snapshots
    v = table.current_version()
    pipe.run_until_drained()
    assert table.current_version() == v
    feed.unpersist()


def test_stream_epoch_lineage_metrics(spark, tmp_table_dir):
    from clever_canal_spark.model import EPOCH_METRICS_SCHEMA

    src_dir = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=400, n_urls=30, seed=5)
    feed = generate_feed(spark, cfgf)
    write_feed_slices(feed, src_dir, n_slices=2, n_events=cfgf.n_events)

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    metrics = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "metrics"), EPOCH_METRICS_SCHEMA,
        merge_key=["epoch_id"], n_buckets=2,
    )
    pipe = CdcPipeline(
        spark, src_dir, os.path.join(tmp_table_dir, "ckpt"), table,
        ApplyConfig(), metrics_table=metrics, max_files_per_trigger=1,
    )
    pipe.run_until_drained()

    rows = {r["epoch_id"]: r for r in metrics.scan().collect()}
    assert len(rows) == 2  # one lineage row per epoch
    total_events = sum(r["n_events"] for r in rows.values())
    assert total_events == cfgf.n_events
    # lineage: LSN ranges partition the stream
    ranges = sorted((r["lsn_min"], r["lsn_max"]) for r in rows.values())
    assert ranges[0][0] == 0 and ranges[-1][1] == cfgf.n_events - 1
    assert all(r["snapshot_version"] is not None for r in rows.values())


def test_stream_byte_bounded_epochs(spark, tmp_table_dir):
    """max_bytes_per_trigger (the MEM_SIZE admission analog, E2) must
    bound each micro-batch to roughly one slice file's bytes — several
    committed epochs instead of one drain-everything batch — while the
    final state stays oracle-identical."""
    src_dir = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    tbl_dir = os.path.join(tmp_table_dir, "pages")

    cfgf = FeedConfig(n_events=1200, n_urls=80, seed=11)
    feed = generate_feed(spark, cfgf).cache()
    slices = write_feed_slices(feed, src_dir, n_slices=4, n_events=cfgf.n_events)
    slice_bytes = max(os.path.getsize(p) for p in slices)

    table = LakeTable.create(
        spark, tbl_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    pipe = CdcPipeline(
        spark, src_dir, ckpt, table, ApplyConfig(),
        max_bytes_per_trigger=slice_bytes,  # budget ~ 1 file => >= 2 epochs
    )
    pipe.run_until_drained()
    assert len(set(table.committed_epochs())) >= 2
    assert _final_state(table) == _oracle(feed.collect())


def test_stream_admission_units_exclusive(spark, tmp_table_dir):
    import pytest

    from clever_canal_spark.sources import read_feed_stream

    with pytest.raises(ValueError, match="mutually"):
        read_feed_stream(spark, tmp_table_dir, 2, 1024)


def test_stream_admission_gate_hook(spark, tmp_table_dir):
    """CdcPipeline(admission=...) gates each micro-batch pre-apply, and
    the paired sync hook makes wave-1 admissions gate wave 2's
    duplicates. Checkpoint replay re-gates deterministically."""
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index, open_dedup_index, sync_from_lake,
    )
    from clever_canal_spark.plans import dedup_admission

    src_dir = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    didx_dir = os.path.join(tmp_table_dir, "didx")

    cfgf = FeedConfig(n_events=600, n_urls=40, seed=5)
    feed = generate_feed(spark, cfgf).cache()
    write_feed_slices(feed, src_dir, n_slices=3, n_events=cfgf.n_events)

    table = LakeTable.create(spark, os.path.join(tmp_table_dir, "pages"),
                             PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4)
    # seed the index with one known page text so its duplicate is gated
    seeded = feed.filter(F.col("after").isNotNull()).limit(1).select(
        F.lit(999999).cast("long").alias("doc_id"), F.col("after.text").alias("text")
    )
    build_dedup_index(spark, seeded, didx_dir)

    gate = lambda b: dedup_admission(b, open_dedup_index(spark, didx_dir)).batch
    pipe = CdcPipeline(
        spark, src_dir, ckpt, table, ApplyConfig(merge_mode="mor"),
        max_files_per_trigger=1,
        admission=gate,
        sync_hooks=(lambda t: sync_from_lake(open_dedup_index(spark, didx_dir), t),),
    )
    pipe.run_until_drained()
    assert table.scan().count() > 0
    # drain again from the same checkpoint: nothing new, state unchanged
    v = table.current_version()
    pipe.run_until_drained()
    assert table.current_version() == v
    # epoch-over-epoch visibility: the index now contains the lake's
    # docs; re-sending ANY ingested page's text under a new url gates it
    one = table.scan().limit(1).collect()[0]
    probe = spark.createDataFrame(
        [("I", 10**9, "brand-new-url", str(one["warc_ts"]), one["text"])],
        "op string, lsn long, url string, warc_ts string, text string",
    ).select("op", "lsn", F.struct(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"), "text").alias("after"))
    res = dedup_admission(probe, open_dedup_index(spark, didx_dir))
    assert res.batch.count() == 0
    feed.unpersist()
