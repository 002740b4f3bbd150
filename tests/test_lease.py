"""Leader lease (streaming/lease.py): acquire/standby/renew/takeover/
release with a fake clock, the crashed-mutator recovery path, and the
active-standby follower loop where a takeover fences the old leader and
the epoch registry no-ops its zombie apply."""

import json
import os
import threading

from clever_canal_spark.streaming.lease import LeaderLease, run_with_lease


class Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _pair(tmp, clock, ttl=30.0):
    path = os.path.join(tmp, "_running.json")
    return (LeaderLease(path, "node-a", ttl_s=ttl, clock=clock),
            LeaderLease(path, "node-b", ttl_s=ttl, clock=clock))


def test_acquire_standby_renew_takeover(tmp_table_dir):
    clock = Clock()
    a, b = _pair(tmp_table_dir, clock)
    assert a.try_acquire() and a.is_leader
    assert not b.try_acquire() and not b.is_leader     # live leader: stand by
    clock.t += 10
    assert a.renew()                                   # heartbeat refreshes
    assert not b.try_acquire()
    clock.t += 31                                      # a stops renewing; TTL passes
    assert b.try_acquire() and b.is_leader             # takeover, generation bump
    assert not a.renew() and not a.is_leader           # fenced: old leader told to stop
    assert b.read()["generation"] == 2


def test_release_hands_off_immediately(tmp_table_dir):
    clock = Clock()
    a, b = _pair(tmp_table_dir, clock)
    assert a.try_acquire()
    a.release()
    assert not a.is_leader
    assert b.try_acquire()                             # no TTL wait after release
    assert b.read()["owner"] == "node-b"


def test_crashed_mutator_recovery(tmp_table_dir):
    clock = Clock()
    a, b = _pair(tmp_table_dir, clock)
    assert a.try_acquire()
    # simulate a crash mid-mutation: the lockfile stays stranded (the
    # lease itself is intact — mutations are atomic replace)
    with open(a.path + ".lock", "w"):
        pass
    clock.t += 31                                      # lease expired, but...
    # ...the stranded lock is fresh by mtime: mutex refused, no takeover
    assert not b.try_acquire()
    # age the lock past the TTL -> debris: b clears it and takes over
    os.utime(a.path + ".lock", (clock.t - 100, clock.t - 100))
    assert b.try_acquire() and b.is_leader
    assert b.read()["generation"] == 2
    assert not a.renew()


def test_contended_takeover_single_winner(tmp_table_dir):
    # an expired lease + N concurrent claimants: exactly one wins
    clock = Clock()
    path = os.path.join(tmp_table_dir, "_running.json")
    with open(path, "w") as fh:
        json.dump({"owner": "dead", "generation": 7, "stamp": clock.t - 100}, fh)
    leases = [LeaderLease(path, f"n{i}", ttl_s=30, clock=clock) for i in range(8)]
    wins = []
    barrier = threading.Barrier(len(leases))

    def race(l):
        barrier.wait()
        if l.try_acquire():
            wins.append(l.owner)

    ts = [threading.Thread(target=race, args=(l,)) for l in leases]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1, wins
    doc = leases[0].read()
    assert doc["owner"] == wins[0] and doc["generation"] == 8


def test_active_standby_follower_loop(spark, tmp_table_dir):
    """Two followers on the same feed behind one lease: only the leader
    applies; after takeover the standby continues the SAME epochs
    exactly-once (the registry, not the lease, carries correctness)."""
    from clever_canal_spark.filters import EventFilterConfig
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import FeedFollower

    clock = Clock()
    feed = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=400, n_urls=30, seed=3)
    write_feed_slices(generate_feed(spark, cfgf), feed, n_slices=2,
                      n_events=cfgf.n_events)
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    cfg = ApplyConfig(filters=EventFilterConfig())
    fa = FeedFollower(spark, feed, os.path.join(tmp_table_dir, "ck-a"), table, cfg)
    fb = FeedFollower(spark, feed, os.path.join(tmp_table_dir, "ck-b"), table, cfg)
    la, lb = _pair(tmp_table_dir, clock)

    ra = run_with_lease(fa, la)
    rb = run_with_lease(fb, lb)
    assert len(ra) >= 1 and rb == []                   # a led, b stood by
    v1, rows1 = table.current_version(), table.scan().count()

    clock.t += 31                                      # a goes silent
    rb = run_with_lease(fb, lb)                        # b takes over; same
    assert lb.is_leader and not la.renew()             # epochs replay no-op
    assert table.scan().count() == rows1
    assert table.current_version() == v1               # nothing double-applied


def test_cdc_pipeline_lease_standby_and_leader(spark, tmp_table_dir):
    """Streaming-shell HA: a pipeline without the lease starts nothing
    (standby); the leader drains; after the leader's TTL lapses the
    standby's next run takes over and drains new slices."""
    from clever_canal_spark.filters import EventFilterConfig
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import CdcPipeline

    clock = Clock()
    feed = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=300, n_urls=30, seed=5)
    write_feed_slices(generate_feed(spark, cfgf), feed, n_slices=2,
                      n_events=cfgf.n_events)
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    la, lb = _pair(tmp_table_dir, clock)
    cfg = ApplyConfig(filters=EventFilterConfig(), merge_mode="mor")
    pa = CdcPipeline(spark, feed, os.path.join(tmp_table_dir, "ck-a"),
                     table, cfg, lease=la)
    pb = CdcPipeline(spark, feed, os.path.join(tmp_table_dir, "ck-b"),
                     table, cfg, lease=lb)
    pa.run_until_drained()
    rows = table.scan().count()
    assert rows > 0 and la.is_leader
    pb.run_until_drained()                      # standby: no-op
    assert table.scan().count() == rows and not lb.is_leader
    clock.t += 31                               # leader goes silent
    pb.run_until_drained()                      # takeover; same data no-ops
    assert lb.is_leader
    assert table.scan().count() == rows
