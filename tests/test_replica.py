"""Lake-to-lake replication (lake/replica.py): changelog shipping with
schema-evolution mirroring. Incremental replica == source state after
every wave; tombstone-carrying bootstrap defeats out-of-order
resurrection; rename cycles; crash-replay idempotence; truncate
mirroring; fresh-process reopen."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    create_replica,
    replica_cursor,
    replica_lag,
    sync_replica,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("lang", T.StringType()),
    ]
)


@pytest.fixture()
def dirs():
    d = [tempfile.mkdtemp(prefix=f"ccs-rep-{i}-") for i in range(3)]
    yield d
    for p in d:
        shutil.rmtree(p, ignore_errors=True)


def mk_source(spark, path):
    return LakeTable.create(spark, path, SCHEMA, merge_key=["url"], n_buckets=4)


def wave(spark, rows):
    """rows: (url, rank, lang, op, lsn)"""
    return spark.createDataFrame(
        rows, "url string, rank int, lang string, op string, lsn long"
    )


def assert_same_state(replica, source):
    a = replica.scan()
    b = source.scan().select(*a.columns)
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bootstrap_then_incremental_equals_source(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(
        wave(spark, [(f"u{i}", i, "en", "U", i + 1) for i in range(20)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    rep = create_replica(src, dirs[1])
    assert_same_state(rep, src)
    # wave 2: update, delete, insert — ship incrementally
    src.merge(
        wave(spark, [("u3", 99, "de", "U", 100),
                     ("u7", None, None, "D", 101),
                     ("u77", 77, "fr", "U", 102)]),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    assert sync_replica(rep, src) > 0
    assert_same_state(rep, src)
    assert rep.scan().filter(F.col("url") == "u7").count() == 0
    # replay: nothing to consume, state unchanged
    assert sync_replica(rep, src) == 0
    assert_same_state(rep, src)


def test_bootstrap_carries_tombstones_against_resurrection(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("k", 1, "en", "U", 10)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    src.merge(wave(spark, [("k", None, None, "D", 20)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    assert rep.scan().count() == 0
    # out-of-order shard: an upsert BELOW the tombstone's lsn arrives later.
    # It loses on the source; the replica must make the same LWW call.
    src.merge(wave(spark, [("k", 2, "en", "U", 15)]),
              epoch_id=2, mode="mor", lsn_col="lsn")
    sync_replica(rep, src)
    assert src.scan().filter(F.col("url") == "k").count() == 0
    assert rep.scan().filter(F.col("url") == "k").count() == 0


def test_schema_evolution_mirrors(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1), ("u2", 2, "de", "U", 2)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    # one sync hop carrying add + rename + widen + drop AND data in the
    # evolved shape
    src.add_column("score", "bigint")
    src.rename_column("lang", "language")
    src.widen_column("rank", "bigint")
    src.drop_column("score")
    src.add_column("score2", "int")
    src.merge(
        spark.createDataFrame(
            [("u3", 3, "fr", 30, "U", 3)],
            "url string, rank long, language string, score2 int, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_replica(rep, src)
    assert_same_state(rep, src)
    assert [f.name for f in rep.scan().schema.fields] == [
        "url", "rank", "language", "score2"
    ]
    assert dict(rep.scan().dtypes)["rank"] == "bigint"
    # drop-then-re-add got a fresh field id: u1/u2's old 'score' bytes
    # (there were none, but the column must read null, not resurrect)
    assert rep.scan().filter(F.col("url") == "u1").collect()[0]["score2"] is None


def test_rename_swap_cycle(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 5, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    # swap rank <-> lang via a temp hop on the source, then mirror the
    # NET diff (replica sees only endpoint schemas → a pure swap cycle)
    src.rename_column("rank", "__x")
    src.rename_column("lang", "rank")
    src.rename_column("__x", "lang")
    src.merge(
        spark.createDataFrame(
            [("u2", "de", 7, "U", 2)],
            "url string, rank string, lang int, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_replica(rep, src)
    assert_same_state(rep, src)
    got = {f.name: f.dataType.simpleString() for f in rep.scan().schema.fields}
    assert got == {"url": "string", "rank": "string", "lang": "int"}
    r1 = rep.scan().filter(F.col("url") == "u1").collect()[0]
    assert r1["lang"] == 5 and r1["rank"] == "en"


def test_crash_between_merge_and_sidecar_is_value_idempotent(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    src.add_column("extra", "int")
    src.merge(
        spark.createDataFrame(
            [("u2", 2, "de", 9, "U", 2)],
            "url string, rank int, lang string, extra int, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_replica(rep, src)
    v_after = rep.current_version()
    # simulate the crash: roll the sidecar back to the pre-sync cursor
    # (merge + schema mirror landed, sidecar write "lost")
    side = json.load(open(os.path.join(rep.path, "replica.json")))
    side["version"] = 2  # the bootstrap cursor (create=1, seed merge=2)
    side["idmap"].popitem()  # forget the newest add's mapping too
    json.dump(side, open(os.path.join(rep.path, "replica.json"), "w"))
    assert sync_replica(rep, src) > 0  # replays
    assert_same_state(rep, src)
    # schema mirror adopted the already-added column; merge no-opped
    assert replica_cursor(rep.path) == src.current_version()
    assert rep.current_version() == v_after  # no duplicate data commit


def test_truncate_mirrors(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [(f"u{i}", i, "en", "U", i + 1) for i in range(10)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    src.truncate_rows(1000)
    src.merge(wave(spark, [("w1", 1, "fr", "U", 2000)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_replica(rep, src)
    assert_same_state(rep, src)
    assert [r["url"] for r in rep.scan().collect()] == ["w1"]


def test_fresh_reopen_and_lag(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    # reopen as a bare LakeTable (fresh-process analog)
    rep2 = LakeTable(spark, dirs[1])
    assert sync_replica(rep2, src) == 0
    lag = replica_lag(rep2, src)
    assert lag["versions_behind"] == 0
    src.merge(wave(spark, [("u2", 2, "de", "U", 2)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    assert replica_lag(rep2, src)["versions_behind"] == 1
    sync_replica(rep2, src)
    assert_same_state(rep2, src)


def test_replica_of_truncated_source_bootstrap(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 5)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    src.truncate_rows(10)
    src.merge(wave(spark, [("u2", 2, "de", "U", 20)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    assert_same_state(rep, src)
    # the source's truncate watermark carried over
    assert rep.snapshot().truncate_lsn == 10


def test_non_replica_path_raises(spark, dirs):
    src = mk_source(spark, dirs[0])
    with pytest.raises(ValueError, match="not a replica"):
        sync_replica(src, src)


def test_filtered_replica_tracks_predicate_membership(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(
        wave(spark, [("u1", 1, "en", "U", 1), ("u2", 2, "de", "U", 2),
                     ("u3", 3, "en", "U", 3)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    rep = create_replica(src, dirs[1], row_filter="lang = 'en'")
    assert sorted(r["url"] for r in rep.scan().collect()) == ["u1", "u3"]
    # u1 leaves the predicate (U -> D on the replica), u2 enters it,
    # u4 inserts outside it
    src.merge(
        wave(spark, [("u1", 1, "fr", "U", 10), ("u2", 2, "en", "U", 11),
                     ("u4", 4, "de", "U", 12)]),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_replica(rep, src)
    assert sorted(r["url"] for r in rep.scan().collect()) == ["u2", "u3"]
    # replica == filtered source, schema included
    flt = src.scan().filter(F.col("lang") == "en")
    assert rep.scan().exceptAll(flt).count() == 0
    assert flt.exceptAll(rep.scan()).count() == 0


def test_filtered_bootstrap_tombstones_nonmatching_winners(spark, dirs):
    src = mk_source(spark, dirs[0])
    # k's winner is non-matching at bootstrap time (lsn 10)
    src.merge(wave(spark, [("k", 1, "de", "U", 10)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1], row_filter="lang = 'en'")
    assert rep.scan().count() == 0
    # an out-of-order MATCHING image below the winner's lsn arrives later:
    # the filtered view never showed k, and must not show it now
    src.merge(wave(spark, [("k", 1, "en", "U", 5)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_replica(rep, src)
    assert src.scan().filter("lang = 'en'").count() == 0
    assert rep.scan().count() == 0


def test_projected_replica_fixed_subscription(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1], columns=["url", "rank"])
    assert [f.name for f in rep.scan().schema.fields] == ["url", "rank"]
    # a later source ADD stays out; a rename+widen of a subscribed column
    # mirrors
    src.add_column("extra", "int")
    src.rename_column("rank", "rnk")
    src.widen_column("rnk", "bigint")
    src.merge(
        spark.createDataFrame(
            [("u2", 2, "de", 9, "U", 2)],
            "url string, rnk long, lang string, extra int, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_replica(rep, src)
    got = {f.name: f.dataType.simpleString() for f in rep.scan().schema.fields}
    assert got == {"url": "string", "rnk": "bigint"}
    assert rep.scan().exceptAll(src.scan().select("url", "rnk")).count() == 0
    assert src.scan().select("url", "rnk").exceptAll(rep.scan()).count() == 0


def test_projection_must_cover_keys(spark, dirs):
    src = mk_source(spark, dirs[0])
    with pytest.raises(ValueError, match="key column"):
        create_replica(src, dirs[1], columns=["rank"])
    with pytest.raises(ValueError, match="unknown column"):
        create_replica(src, dirs[2], columns=["url", "nope"])


def test_chained_replica_of_replica(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1), ("u2", 2, "de", "U", 2)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    mid = create_replica(src, dirs[1])
    leaf = create_replica(mid, dirs[2])
    src.merge(wave(spark, [("u3", 3, "fr", "U", 3), ("u1", None, None, "D", 4)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_replica(mid, src)
    sync_replica(leaf, mid)
    assert_same_state(leaf, src)


def test_render_replica_metrics_zero_jobs(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    src.merge(wave(spark, [("u2", 2, "de", "U", 2)]),
              epoch_id=1, mode="mor", lsn_col="lsn")

    from clever_canal_spark.streaming import render_replica_metrics

    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    body = render_replica_metrics({"pages": (rep, src)})
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "metrics rendering must launch no jobs"
    assert 'ccs_replica_versions_behind{destination="pages"} 1' in body
    assert "# TYPE ccs_replica_synced_version gauge" in body
    sync_replica(rep, src)
    body = render_replica_metrics({"pages": (rep, src)})
    assert 'ccs_replica_versions_behind{destination="pages"} 0' in body


def test_bounded_catchup_in_chunks(spark, dirs):
    src = mk_source(spark, dirs[0])
    src.merge(wave(spark, [("u1", 1, "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    rep = create_replica(src, dirs[1])
    for i in range(1, 4):  # three more source epochs
        src.merge(wave(spark, [(f"w{i}", i, "de", "U", 100 + i)]),
                  epoch_id=i, mode="mor", lsn_col="lsn")
    mid = replica_cursor(rep.path) + 2
    assert sync_replica(rep, src, to_version=mid) == 2
    assert replica_cursor(rep.path) == mid
    assert sync_replica(rep, src) > 0  # finish the catch-up
    assert_same_state(rep, src)
