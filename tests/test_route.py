"""Multi-table routing: one batch fans out to N destination tables, each
LWW-correct in isolation and exactly-once per destination."""

from pyspark.sql import functions as F

from clever_canal_spark.gen import FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.plans.route import Route, route_epoch


def _state(table):
    return {
        (r["url"], str(r["warc_ts"])): r["text"] for r in table.scan().collect()
    }


def _oracle(rows):
    return {
        (u, str(ts)): None  # text filled by transform; compare keys only here
        for (u, ts) in reference_apply(rows).keys()
    }


def test_route_two_tables(spark, tmp_path):
    # two interleaved feeds over DISJOINT lsn ranges (global LSN uniqueness)
    cfg_a = FeedConfig(n_events=800, n_urls=60, seed=11, table_name="pages")
    feed_a = generate_feed(spark, cfg_a)
    cfg_b = FeedConfig(n_events=800, n_urls=40, seed=23, table_name="users")
    feed_b = generate_feed(spark, cfg_b, id_start=0, id_end=800).withColumn(
        "lsn", F.col("lsn") + 100_000
    )
    batch = feed_a.unionByName(feed_b)

    t_pages = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    t_users = LakeTable.create(spark, str(tmp_path / "users"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    routes = [Route(r"cc\.pages", t_pages), Route(r"cc\.users", t_users)]
    res = route_epoch(spark, batch, 0, routes, ApplyConfig(merge_mode="mor"))
    assert all(r.applied for r in res.values())

    # each destination matches the per-feed reference apply (keys)
    want_pages = _oracle([r.asDict(recursive=True) for r in feed_a.collect()])
    want_users = _oracle([r.asDict(recursive=True) for r in feed_b.collect()])
    assert set(_state(t_pages)) == set(want_pages)
    assert set(_state(t_users)) == set(want_users)
    assert set(want_pages)  # non-trivial
    # cross-isolation: no users urls in pages (url space collides by id,
    # so compare row counts against per-table expectations instead)
    assert t_pages.scan().count() == len(want_pages)
    assert t_users.scan().count() == len(want_users)

    # exactly-once per destination: replay no-ops both
    res2 = route_epoch(spark, batch, 0, routes, ApplyConfig(merge_mode="mor"))
    assert all(not r.versions for r in res2.values())

    # partial-crash recovery: epoch 1 already committed for pages only ->
    # replay applies it just to users
    batch2 = batch.withColumn("lsn", F.col("lsn") + 1_000_000)
    route_epoch(spark, batch2, 1, [routes[0]], ApplyConfig(merge_mode="mor"))
    res3 = route_epoch(spark, batch2, 1, routes, ApplyConfig(merge_mode="mor"))
    assert not res3[r"cc\.pages"].versions and res3[r"cc\.users"].versions


def test_route_empty_destination_fast_path(spark, tmp_path):
    """A route whose filter matches NOTHING in the epoch must commit an
    epoch marker (positions advance), not crash — even on the hints-driven
    fast path where the un-run Observation cannot resolve stats."""
    from clever_canal_spark.plans import BatchHints

    feed = generate_feed(
        spark, FeedConfig(n_events=200, n_urls=20, seed=9, table_name="pages")
    )
    t_pages = LakeTable.create(spark, str(tmp_path / "p"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    t_users = LakeTable.create(spark, str(tmp_path / "u"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    routes = [Route(r"cc\.pages", t_pages), Route(r"cc\.users", t_users)]
    # batch-wide footer hints claim 200 events + no DDL (true for the whole
    # batch); the users route's slice is empty — this is the crash shape
    hints = BatchHints(n_events=200, lsn_min=0, lsn_max=199, ddl_possible=False)
    res = route_epoch(spark, feed, 0, routes,
                      ApplyConfig(merge_mode="mor"), hints=hints)
    assert all(r.applied for r in res.values())
    assert t_pages.scan().count() > 0
    assert t_users.scan().count() == 0
    # the empty destination still committed the epoch (exactly-once cursor)
    assert t_users.is_epoch_committed(0)
    # replay no-ops both
    res2 = route_epoch(spark, feed, 0, routes,
                       ApplyConfig(merge_mode="mor"), hints=hints)
    assert all(not r.versions for r in res2.values())


def test_routed_follower_crash_between_destinations(spark, tmp_path):
    """Checkpointed routed tail: epoch fans to two tables; a 'crash' that
    committed only the first destination replays the epoch on restart and
    applies just the second (exactly-once per destination)."""
    import os

    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import RoutedFeedFollower

    cfg_a = FeedConfig(n_events=400, n_urls=30, seed=5, table_name="pages")
    cfg_b = FeedConfig(n_events=400, n_urls=30, seed=6, table_name="users")
    # users occupy lsn 400-799: slice 1 is pages-only, slice 2 users-only —
    # each epoch leaves ONE route's filter empty (the crash shape), and both
    # lsn ranges stay inside write_feed_slices' [0, n_events) slicing window
    feed = generate_feed(spark, cfg_a).unionByName(
        generate_feed(spark, cfg_b).withColumn("lsn", F.col("lsn") + 400)
    )
    src = str(tmp_path / "feed")
    write_feed_slices(feed, src, n_slices=2, n_events=800)

    t_pages = LakeTable.create(spark, str(tmp_path / "p"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    t_users = LakeTable.create(spark, str(tmp_path / "u"), PAGE_SCHEMA,
                               merge_key=["url", "warc_ts"], n_buckets=4)
    routes = [Route(r"cc\.pages", t_pages), Route(r"cc\.users", t_users)]
    mk = lambda: RoutedFeedFollower(
        spark, src, str(tmp_path / "ck"), None,
        ApplyConfig(merge_mode="mor"), routes=routes, max_files_per_epoch=1,
    )
    res = mk().run_available()
    assert len(res) == 2 and all(
        all(r.applied for r in d.values()) for d in res
    )
    n_pages, n_users = t_pages.scan().count(), t_users.scan().count()
    assert n_pages > 0 and n_users > 0

    # simulate crash-between-destinations on a NEW epoch: bind a new file,
    # commit it to pages only, then restart the routed follower. Written
    # directly (write_feed_slices slices by lsn range and would drop the
    # +50_000-shifted rows); lsn 50_000+ beats every earlier users event.
    extra = generate_feed(
        spark, FeedConfig(n_events=100, n_urls=10, seed=7, table_name="users")
    ).withColumn("lsn", F.col("lsn") + 50_000)
    xtmp = str(tmp_path / "x")
    extra.coalesce(1).write.mode("overwrite").parquet(xtmp)
    xfile = os.path.join(src, "zz-extra.parquet")
    os.rename(
        [os.path.join(xtmp, f) for f in os.listdir(xtmp)
         if f.endswith(".parquet")][0],
        xfile,
    )
    # pages-only partial apply under the SAME epoch id the follower will use
    f2 = mk()
    fresh_epoch = 2
    f2._bind_epoch(fresh_epoch, [xfile])
    route_epoch(spark, spark.read.schema(
        __import__("clever_canal_spark.model", fromlist=["CHANGE_EVENT_SCHEMA"]).CHANGE_EVENT_SCHEMA
    ).parquet(xfile), fresh_epoch, [routes[0]], ApplyConfig(merge_mode="mor"))
    assert t_pages.is_epoch_committed(fresh_epoch)
    assert not t_users.is_epoch_committed(fresh_epoch)

    res2 = mk().run_available()  # restart: replays epoch 2 for users only
    assert t_users.is_epoch_committed(fresh_epoch)
    # users state now matches the ordered reference apply of feed+extra
    # (extra keys overlap the earlier feed's, so assert state, not counts)
    users_rows = [
        r.asDict(recursive=True)
        for r in feed.filter(F.col("table_name") == "users").collect()
    ] + [r.asDict(recursive=True) for r in extra.collect()]
    assert set(_state(t_users)) == set(_oracle(users_rows))
    assert t_pages.scan().count() == n_pages         # pages unchanged (no double-apply)
