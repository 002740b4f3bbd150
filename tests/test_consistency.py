"""Cross-table consistency cuts (lake/consistency.py): epoch ids as the
shared logical clock across routed destinations."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    SnapshotExpired,
    consistent_scans,
    consistent_versions,
    latest_consistent_epoch,
    version_at_epoch,
)

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


def src(spark, pairs, lsn0=0):
    df = spark.createDataFrame(
        [(u, TS, x, "U", lsn0 + i) for i, (u, x) in enumerate(pairs)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(df):
    return {(r["url"], r["text"]) for r in df.collect()}


def test_version_at_epoch_and_cut(spark, tmp_table_dir):
    pages = make_table(spark, tmp_table_dir + "/pages")
    users = make_table(spark, tmp_table_dir + "/users")
    for e in range(3):
        pages.merge(src(spark, [(f"p{e}", f"v{e}")], lsn0=10 * e), epoch_id=e,
                    mode="mor", lsn_col="lsn")
    # users lags: epochs 0-1 only (epoch 1 was empty for users → marker)
    users.merge(src(spark, [("u0", "v0")]), epoch_id=0, mode="mor", lsn_col="lsn")
    users.commit_epoch_marker(1)

    tables = {"pages": pages, "users": users}
    assert latest_consistent_epoch(tables) == 1
    cut = consistent_versions(tables)
    # the cut version reflects exactly epochs 0-1: pages' epoch-2 row is
    # invisible at its cut even though its head already has it
    scans = consistent_scans(tables)
    assert state(scans["pages"]) == {("p0", "v0"), ("p1", "v1")}
    assert state(scans["users"]) == {("u0", "v0")}
    assert version_at_epoch(pages, 1) == cut["pages"]
    # users catches up → frontier advances
    users.merge(src(spark, [("u2", "v2")], lsn0=50), epoch_id=2, mode="mor", lsn_col="lsn")
    assert latest_consistent_epoch(tables) == 2
    assert state(consistent_scans(tables)["pages"]) == {
        ("p0", "v0"), ("p1", "v1"), ("p2", "v2"),
    }
    with pytest.raises(ValueError, match="not committed"):
        version_at_epoch(users, 99)


def test_expired_cut_raises(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    for e in range(4):
        t.merge(src(spark, [(f"p{e}", f"v{e}")], lsn0=10 * e), epoch_id=e,
                mode="mor", lsn_col="lsn")
    t.expire_snapshots(keep_last=2)
    # epoch 3's commit is the head-1 snapshot — still exact
    assert version_at_epoch(t, 3) == t.current_version()
    # epoch 0's commit point is gone
    with pytest.raises(SnapshotExpired):
        version_at_epoch(t, 0)
    # ... unless the oldest retained snapshot IS the commit (operation stamp)
    t2 = make_table(spark, tmp_table_dir + "/t2")
    for e in range(3):
        t2.merge(src(spark, [(f"q{e}", f"v{e}")], lsn0=10 * e), epoch_id=e,
                 mode="mor", lsn_col="lsn")
    t2.expire_snapshots(keep_last=2)  # oldest retained = epoch 1's commit
    assert version_at_epoch(t2, 1) == t2.current_version() - 1


def test_routed_destinations_share_the_clock(spark, tmp_path):
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.plans.route import Route, route_epoch

    feed_a = generate_feed(spark, FeedConfig(n_events=400, n_urls=40, seed=7,
                                             table_name="pages"))
    feed_b = generate_feed(spark, FeedConfig(n_events=400, n_urls=30, seed=9,
                                             table_name="users")).withColumn(
        "lsn", F.col("lsn") + 100_000)
    from clever_canal_spark.model import PAGE_SCHEMA

    t_pages = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=2)
    t_users = LakeTable.create(spark, str(tmp_path / "users"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=2)
    routes = [Route(r"cc\.pages", t_pages), Route(r"cc\.users", t_users)]
    cfg = ApplyConfig(merge_mode="mor")
    # epoch 0 carries both tables; epoch 1 only pages rows — users still
    # commits a marker, so the clock stays shared
    route_epoch(spark, feed_a.unionByName(feed_b).filter(F.col("lsn") % 2 == 0),
                0, routes, cfg)
    route_epoch(spark, feed_a.filter(F.col("lsn") % 2 == 1), 1, routes, cfg)
    tables = {"pages": t_pages, "users": t_users}
    assert latest_consistent_epoch(tables) == 1
    cut = consistent_versions(tables, epoch_id=0)
    assert cut["pages"] < t_pages.current_version()
    # the epoch-0 cut sees only even-lsn rows in pages
    got = t_pages.scan(version=cut["pages"]).count()
    head = t_pages.scan().count()
    assert 0 < got <= head
