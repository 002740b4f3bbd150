"""TRUNCATE applied to the lake sink: metadata-only row erasure at a feed
LSN, with the watermark guarding against lagging-shard resurrection.

Reference: TRUNCATE is a first-class EventType in the stream
(EntryProtocol.proto:26-59; SimpleDdlParser.java:49-110 classifies it);
the reference hands it to clients — here the lake IS the client/sink, so
it must execute it."""

import os

import pyspark.sql.functions as F
import pytest

from clever_canal_spark.gen import DdlSpec, FeedConfig, generate_feed
from clever_canal_spark.lake.table import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans.apply import ApplyConfig, apply_epoch
from clever_canal_spark.plans.ddl import apply_ddl_idempotent


def _mk_table(spark, d):
    return LakeTable.create(
        spark, os.path.join(d, "lake"), PAGE_SCHEMA, merge_key=["url", "warc_ts"]
    )


def _feed(spark, n=1200, trunc_lsn=600):
    ddl = DdlSpec(
        lsn=trunc_lsn, ddl_type="TRUNCATE", column="pages",
        sql="TRUNCATE TABLE cc.pages",
    )
    return generate_feed(
        spark, FeedConfig(n_events=n, n_urls=150, ddls=[ddl])
    ).cache()


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_truncate_mid_epoch(spark, tmp_table_dir, mode):
    feed = _feed(spark)
    table = _mk_table(spark, tmp_table_dir)
    apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode=mode))
    rows = table.scan()
    # only post-truncate events survive — every surviving winner's version
    # must come from lsn > 600
    assert rows.count() > 0
    # replay the SAME pre-truncate slice as a later (lagging-shard) epoch:
    # nothing may resurrect
    before = sorted(map(tuple, rows.collect()))
    late = feed.filter((F.col("lsn") < 600) & (F.col("kind") == "ROW"))
    apply_epoch(spark, late, 1, table, ApplyConfig(merge_mode=mode))
    after = sorted(map(tuple, table.scan().collect()))
    assert before == after


def test_truncate_matches_post_lsn_only_apply(spark, tmp_table_dir):
    """State after (full feed with truncate) == state after (only the
    post-truncate slice) — the oracle-style equivalence."""
    feed = _feed(spark)
    t1 = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "a"), PAGE_SCHEMA, merge_key=["url", "warc_ts"]
    )
    apply_epoch(spark, feed, 0, t1, ApplyConfig(merge_mode="mor"))
    t2 = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "b"), PAGE_SCHEMA, merge_key=["url", "warc_ts"]
    )
    apply_epoch(
        spark, feed.filter((F.col("lsn") > 600) & (F.col("kind") == "ROW")),
        0, t2, ApplyConfig(merge_mode="mor"),
    )
    assert sorted(map(tuple, t1.scan().collect())) == sorted(
        map(tuple, t2.scan().collect())
    )


def test_truncate_idempotent_and_time_travel(spark, tmp_table_dir):
    feed = _feed(spark)
    table = _mk_table(spark, tmp_table_dir)
    pre = feed.filter((F.col("lsn") < 600) & (F.col("kind") == "ROW"))
    apply_epoch(spark, pre, 0, table, ApplyConfig(merge_mode="mor"))
    v_pre = table.current_version()
    n_pre = table.scan().count()
    assert n_pre > 0

    v_t = table.truncate_rows(600)
    assert v_t is not None
    assert table.scan().count() == 0
    # time travel to the pre-truncate snapshot still sees the rows
    assert table.scan(version=v_pre).count() == n_pre
    # replay (crash between truncate and the epoch commit) is a no-op
    assert table.truncate_rows(600) is None
    assert table.truncate_rows(599) is None
    # DDL-channel replay path agrees
    assert apply_ddl_idempotent(
        table, {"lsn": 600, "ddl_sql": "TRUNCATE TABLE cc.pages"}
    ) is False
    # a LATER truncate still applies
    assert table.truncate_rows(601) is not None


def test_truncate_then_new_ingest_and_compact(spark, tmp_table_dir):
    feed = _feed(spark)
    table = _mk_table(spark, tmp_table_dir)
    apply_epoch(
        spark, feed.filter(F.col("lsn") < 600), 0, table, ApplyConfig(merge_mode="mor")
    )
    table.truncate_rows(600)
    post = feed.filter((F.col("lsn") > 600) & (F.col("kind") == "ROW"))
    apply_epoch(spark, post, 1, table, ApplyConfig(merge_mode="mor"))
    n = table.scan().count()
    assert n > 0
    table.compact()
    assert table.scan().count() == n
    # point reads work on the rebuilt state
    one = table.scan().limit(1).collect()[0]
    assert table.lookup(url=one["url"]).count() >= 1


def test_truncate_requires_lsn(spark, tmp_table_dir):
    table = _mk_table(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="feed lsn"):
        apply_ddl_idempotent(table, {"ddl_sql": "TRUNCATE TABLE cc.pages"})
