"""CDC-maintained secondary index (operators/secondary_index.py):
state-diff maintenance == from-scratch rebuild, value flips move
entries, probes are exact and bucket-pruned, truncates mirror,
replays no-op, fresh-process reopen resumes from the epoch registry."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.operators.secondary_index import (
    build_secondary_index,
    open_secondary_index,
    probe_secondary,
    sync_secondary_index,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


@pytest.fixture()
def dirs():
    d = [tempfile.mkdtemp(prefix=f"ccs-sec-{i}-") for i in range(3)]
    yield d
    for p in d:
        shutil.rmtree(p, ignore_errors=True)


def mk(spark, path):
    return LakeTable.create(spark, path, SCHEMA, merge_key=["url"], n_buckets=4)


def wave(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lang string, rank int, op string, lsn long"
    )


def entries(idx):
    return {(r["val"], r["url"]) for r in idx.entries.scan().collect()}


def test_sync_equals_rebuild_and_probe_exact(spark, dirs):
    t = mk(spark, dirs[0])
    t.merge(
        wave(spark, [(f"u{i}", ["en", "de", "fr"][i % 3], i, "U", i + 1)
                     for i in range(15)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    idx = build_secondary_index(t, dirs[1], "lang", n_buckets=4)
    # wave: u0 flips en->zz, u1 deleted, u99 inserted as en
    t.merge(
        wave(spark, [("u0", "zz", 0, "U", 100),
                     ("u1", None, None, "D", 101),
                     ("u99", "en", 99, "U", 102)]),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    assert sync_secondary_index(idx, t) > 0
    rebuilt = build_secondary_index(t, dirs[2], "lang", n_buckets=4)
    assert entries(idx) == entries(rebuilt)
    assert ("zz", "u0") in entries(idx) and ("en", "u0") not in entries(idx)
    assert not any(u == "u1" for _, u in entries(idx))
    # probe returns live source rows, matches a direct filtered scan
    got = probe_secondary(idx, t, "en")
    want = t.scan().filter(F.col("lang") == "en")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # replay: nothing to consume
    assert sync_secondary_index(idx, t) == 0


def test_probe_prunes_index_files(spark, dirs):
    t = mk(spark, dirs[0])
    t.merge(
        wave(spark, [(f"u{i}", f"l{i % 11}", i, "U", i + 1) for i in range(200)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    idx = build_secondary_index(t, dirs[1], "lang", n_buckets=8)
    probe = idx.entries.spark.createDataFrame([("l3",)], "val string")
    pruned = idx.entries.scan_for_keys_df(probe)
    assert 0 < len(pruned.inputFiles()) < len(idx.entries.scan().inputFiles())


def test_expression_values_and_fresh_reopen(spark, dirs):
    t = mk(spark, dirs[0])
    t.merge(
        wave(spark, [(f"u{i}", "en", i, "U", i + 1) for i in range(10)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    # index an EXPRESSION, not a bare column
    build_secondary_index(t, dirs[1], "CAST(rank % 2 AS STRING)", n_buckets=4)
    idx2 = open_secondary_index(spark, dirs[1])  # fresh-object reopen
    assert idx2.value_expr == "CAST(rank % 2 AS STRING)"
    assert sync_secondary_index(idx2, t) == 0
    t.merge(wave(spark, [("u2", "en", 7, "U", 100)]),  # 2 -> odd bucket
            epoch_id=1, mode="mor", lsn_col="lsn")
    sync_secondary_index(idx2, t)
    got = {r["url"] for r in probe_secondary(idx2, t, "1").collect()}
    assert got == {"u1", "u2", "u3", "u5", "u7", "u9"}


def test_null_values_not_indexed(spark, dirs):
    t = mk(spark, dirs[0])
    t.merge(wave(spark, [("u1", None, 1, "U", 1), ("u2", "en", 2, "U", 2)]),
            epoch_id=0, mode="mor", lsn_col="lsn")
    idx = build_secondary_index(t, dirs[1], "lang", n_buckets=4)
    assert entries(idx) == {("en", "u2")}


def test_truncate_mirrors_and_marker_only_sync(spark, dirs):
    t = mk(spark, dirs[0])
    t.merge(wave(spark, [(f"u{i}", "en", i, "U", i + 1) for i in range(6)]),
            epoch_id=0, mode="mor", lsn_col="lsn")
    idx = build_secondary_index(t, dirs[1], "lang", n_buckets=4)
    t.truncate_rows(1000)
    sync_secondary_index(idx, t)
    assert entries(idx) == set()
    t.merge(wave(spark, [("w1", "fr", 1, "U", 2000)]),
            epoch_id=1, mode="mor", lsn_col="lsn")
    sync_secondary_index(idx, t)
    assert entries(idx) == {("fr", "w1")}
    # a source commit that changes no indexed pair still advances the
    # cursor (marker-only sync)
    t.merge(wave(spark, [("w1", "fr", 1, "U", 1)]),  # stale, loses LWW
            epoch_id=2, mode="mor", lsn_col="lsn")
    assert sync_secondary_index(idx, t) > 0
    assert sync_secondary_index(idx, t) == 0
    assert entries(idx) == {("fr", "w1")}


def test_reseed_after_retention_expiry(spark, dirs):
    from clever_canal_spark.lake import SnapshotExpired
    from clever_canal_spark.operators.secondary_index import (
        reseed_secondary_index,
    )

    t = mk(spark, dirs[0])
    t.merge(wave(spark, [(f"u{i}", "en", i, "U", i + 1) for i in range(6)]),
            epoch_id=0, mode="mor", lsn_col="lsn")
    idx = build_secondary_index(t, dirs[1], "lang", n_buckets=4)
    # age the source past the index's cursor
    t.merge(wave(spark, [("u0", "de", 0, "U", 100)]),
            epoch_id=1, mode="mor", lsn_col="lsn")
    t.merge(wave(spark, [("u1", None, None, "D", 101)]),
            epoch_id=2, mode="mor", lsn_col="lsn")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired):
        sync_secondary_index(idx, t)
    reseed_secondary_index(idx, t)
    rebuilt = build_secondary_index(t, dirs[2], "lang", n_buckets=4)
    assert entries(idx) == entries(rebuilt)
    # cursor caught up: normal tailing resumes
    assert sync_secondary_index(idx, t) == 0
    t.merge(wave(spark, [("u9", "fr", 9, "U", 200)]),
            epoch_id=3, mode="mor", lsn_col="lsn")
    assert sync_secondary_index(idx, t) > 0
    assert ("fr", "u9") in entries(idx)
