"""FeedFollower: multi-shard merge (the group-sink analog), crash-window
recovery, epoch/file binding stability."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.functions.transforms import extract_text_from_html, tag_language
from clever_canal_spark.gen import FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.sources import write_feed_slices
from clever_canal_spark.streaming import FeedFollower


def _oracle(feed_rows):
    out = {}
    for (url, warc_ts), img in reference_apply(feed_rows).items():
        text = extract_text_from_html(bytes(img["html"]))
        out[(url, str(warc_ts))] = (text, tag_language(text))
    return out


def _state(table):
    return {(r["url"], str(r["warc_ts"])): (r["text"], r["lang"]) for r in table.scan().collect()}


def test_multi_shard_group_merge(spark, tmp_table_dir):
    """Two shards carrying interleaved LSN ranges (odd/even slices) in two
    directories; merged apply must equal the single-feed oracle — no
    timeline barrier required."""
    cfgf = FeedConfig(n_events=1200, n_urls=80, seed=17)
    feed = generate_feed(spark, cfgf).cache()
    s1 = os.path.join(tmp_table_dir, "shard1")
    s2 = os.path.join(tmp_table_dir, "shard2")
    slices = write_feed_slices(feed, s1, n_slices=6, n_events=cfgf.n_events)
    os.makedirs(s2)
    for i, p in enumerate(slices):
        if i % 2 == 1:  # odd slices live in shard2
            os.rename(p, os.path.join(s2, os.path.basename(p)))

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    fol = FeedFollower(
        spark, [s1, s2], os.path.join(tmp_table_dir, "ckpt"), table,
        ApplyConfig(merge_mode="mor"), max_files_per_epoch=2,
    )
    results = fol.run_available()
    assert len(results) == 3  # 6 files / 2 per epoch
    assert _state(table) == _oracle(feed.collect())
    feed.unpersist()


def test_bound_epoch_reuses_file_set(spark, tmp_table_dir):
    """A bound-but-unapplied epoch (crash window) re-applies with its
    ORIGINAL file set even if more files arrived since."""
    cfgf = FeedConfig(n_events=600, n_urls=50, seed=23)
    feed = generate_feed(spark, cfgf).cache()
    src = os.path.join(tmp_table_dir, "feed")
    slices = write_feed_slices(feed, src, n_slices=3, n_events=cfgf.n_events)
    hold = os.path.join(tmp_table_dir, "hold")
    os.makedirs(hold)
    os.rename(slices[2], os.path.join(hold, os.path.basename(slices[2])))

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    fol = FeedFollower(
        spark, src, os.path.join(tmp_table_dir, "ckpt"), table,
        ApplyConfig(merge_mode="mor"), max_files_per_epoch=1,
    )
    # bind epoch 0 manually (simulating crash between bind and apply)
    bound = fol._bind_epoch(0, [slices[0]])
    assert bound == [slices[0]]
    # late file arrives before recovery
    os.rename(os.path.join(hold, os.path.basename(slices[2])), slices[2])
    fol.run_available()
    # epoch 0 must have applied exactly slices[0]; everything consumed once
    log = dict(fol._epoch_log())
    assert log[0] == [slices[0]]
    assert sorted(sum(log.values(), [])) == sorted(slices)
    assert _state(table) == _oracle(feed.collect())
    feed.unpersist()
