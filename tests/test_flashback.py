"""Epoch flashback (plans/flashback.py): selective undo of a committed
epoch's surviving writes via compensation events."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable, SnapshotExpired
from clever_canal_spark.plans import plan_flashback, revert_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)
TS = "2024-01-01 00:00:00"


def make_table(spark, path):
    return LakeTable.create(spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2)


def src(spark, rows, lsn0=0):
    """rows: (url, text_or_None_for_delete)"""
    df = spark.createDataFrame(
        [(u, TS, x, "D" if x is None else "U", lsn0 + i) for i, (u, x) in enumerate(rows)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(t):
    return {(r["url"], r["text"]) for r in t.scan().collect()}


def test_revert_restores_and_tombstones(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "good-a"), ("b", "good-b")]), epoch_id=0,
            mode="mor", lsn_col="lsn")
    # the bad epoch: clobbers a, deletes b, inserts junk c
    t.merge(src(spark, [("a", "BAD"), ("b", None), ("c", "JUNK")], lsn0=10),
            epoch_id=1, mode="mor", lsn_col="lsn")
    assert state(t) == {("a", "BAD"), ("c", "JUNK")}
    res = revert_epoch(t, 1, revert_epoch_id=100)
    assert res.applied
    # a restored, b resurrected, c (first appearance in the bad epoch) gone
    assert state(t) == {("a", "good-a"), ("b", "good-b")}
    # the revert is exactly-once like any epoch
    assert not revert_epoch(t, 1, revert_epoch_id=100).applied
    assert state(t) == {("a", "good-a"), ("b", "good-b")}


def test_later_writes_are_preserved(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v0"), ("b", "v0")]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", "BAD"), ("b", "BAD"), ("d", "BAD")], lsn0=10),
            epoch_id=1, mode="mor", lsn_col="lsn")
    # epoch 2 legitimately overwrites a — the revert must NOT touch it
    t.merge(src(spark, [("a", "v2")], lsn0=20), epoch_id=2, mode="mor", lsn_col="lsn")
    revert_epoch(t, 1, revert_epoch_id=100)
    assert state(t) == {("a", "v2"), ("b", "v0")}


def test_revert_flows_through_changelog(spark, tmp_table_dir):
    """Downstream consumers see the compensation as ordinary change rows."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v0")]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", "BAD"), ("z", "JUNK")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn")
    v_before_revert = t.current_version()
    revert_epoch(t, 1, revert_epoch_id=100)
    ch = t.scan_changes(v_before_revert).select("url", "text", "__op").collect()
    got = {(r["url"], r["text"], r["__op"]) for r in ch}
    assert got == {("a", "v0", "U"), ("z", None, "D")}


def test_plan_lsn_and_expired_pre_state(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v0")]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", "v1")], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
    plan = plan_flashback(t, 1)
    assert plan.revert_lsn > 10  # beats the table frontier
    with pytest.raises(ValueError, match="not committed"):
        plan_flashback(t, 7)
    # retention ate the pre-epoch state → refuse, don't guess
    for e in range(2, 5):
        t.merge(src(spark, [("a", f"v{e}")], lsn0=10 * e), epoch_id=e,
                mode="mor", lsn_col="lsn")
    t.expire_snapshots(keep_last=2)
    with pytest.raises(SnapshotExpired):
        plan_flashback(t, 1)


def test_revert_under_cow_mode(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v0")]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", "BAD")], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
    revert_epoch(t, 1, revert_epoch_id=100, mode="cow")
    assert state(t) == {("a", "v0")}
