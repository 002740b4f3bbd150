"""File-level column-stats pruning (LakeTable.scan_where + stats_cols):
the Iceberg lower/upper-bound scan-planning analog generalized past the
bucket key."""

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def make_table(spark, path, **kw):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=1,
        stats_cols=["score", "warc_ts"], **kw,
    )


def src(spark, rows, lsn0=0):
    """rows: (url, ts_str, score)"""
    df = spark.createDataFrame(
        [(u, ts, f"t{u}", s, "U", lsn0 + i) for i, (u, ts, s) in enumerate(rows)],
        "url string, warc_ts string, text string, score long, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def seeded(spark, path):
    """Three compacted commits with disjoint score ranges (one file per
    commit after each compact? — COW merges write one file per bucket per
    commit; n_buckets=1 keeps the geometry obvious)."""
    t = make_table(spark, path)
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", 10),
                        ("b", "2024-01-02 00:00:00", 20)]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.compact()
    t.merge(src(spark, [("c", "2024-02-01 00:00:00", 100),
                        ("d", "2024-02-02 00:00:00", 200)], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
    # second batch stays a delta file until the test compacts
    return t


def test_scan_where_prunes_files_by_value_range(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    t.compact()
    snap = t.snapshot()
    assert not snap.delta_files
    with_stats = [f for f in snap.files if f.get("col_stats", {}).get("score")]
    assert with_stats, "stats must be recorded at write"
    out = t.scan_where("score", lo=100)
    assert {r["url"] for r in out.collect()} == {"c", "d"}
    # n_buckets=1 compacts to a single file — prove ACTUAL file skipping
    # on a multi-bucket table where compaction leaves several files
    t3_dir = tmp_table_dir + "-three"
    t3 = LakeTable.create(spark, t3_dir, SCHEMA, merge_key=["url", "warc_ts"],
                          n_buckets=4, stats_cols=["score"])
    t3.merge(src(spark, [(f"u{i}", "2024-01-01 00:00:00", i) for i in range(8)]),
             epoch_id=0, mode="mor", lsn_col="lsn")
    t3.compact()
    snap3 = t3.snapshot()
    n_files = len(snap3.files)
    assert n_files > 1
    probe = t3.scan_where("score", lo=7, hi=7)
    assert {r["url"] for r in probe.collect()} == {"u7"}
    assert len(set(probe.inputFiles())) < n_files


def test_scan_where_timestamp_bounds(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    t.compact()
    out = t.scan_where("warc_ts", lo=dt.datetime(2024, 1, 15))
    assert {r["url"] for r in out.collect()} == {"c", "d"}
    out2 = t.scan_where("warc_ts", hi=dt.datetime(2024, 1, 15))
    assert {r["url"] for r in out2.collect()} == {"a", "b"}


def test_scan_where_with_deltas_falls_back_unpruned_but_correct(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)  # epoch 1 still a delta
    assert t.snapshot().delta_files
    # a delta UPDATE moves a's score out of range — the fallback must see it
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", 500)], lsn0=100),
            epoch_id=2, mode="mor", lsn_col="lsn")
    out = t.scan_where("score", lo=100)
    assert {(r["url"], r["score"]) for r in out.collect()} == {
        ("a", 500), ("c", 100), ("d", 200)
    }
    out2 = t.scan_where("score", hi=50)
    assert {r["url"] for r in out2.collect()} == {"b"}  # a moved out


def test_set_stats_cols_applies_to_new_writes_only(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA,
                         merge_key=["url", "warc_ts"], n_buckets=1)
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", 1)]), epoch_id=0,
            mode="mor", lsn_col="lsn")
    with pytest.raises(ValueError, match="unknown stats column"):
        t.set_stats_cols(["nope"])
    t.set_stats_cols(["score"])
    old = [f for f in t.snapshot().delta_files]
    assert all("col_stats" not in f for f in old)  # pre-change files: no stats
    t.merge(src(spark, [("b", "2024-01-01 00:00:00", 2)], lsn0=5), epoch_id=1,
            mode="mor", lsn_col="lsn")
    newf = [f for f in t.snapshot().delta_files if f["path"] not in
            {o["path"] for o in old}]
    assert newf and all(f.get("col_stats", {}).get("score") for f in newf)
    # stats-less old files always read: results stay exact
    t.compact()
    assert {r["url"] for r in t.scan_where("score", hi=1).collect()} == {"a"}


def test_scan_where_unknown_column_raises(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="unknown column"):
        t.scan_where("nope", lo=1)


def _pyz(vals, bits=16):
    """Python twin of the z-value interleave for layout assertions."""
    los = [min(v) for v in zip(*vals)]
    his = [max(v) for v in zip(*vals)]
    out = []
    n = len(los)
    for row in vals:
        z = 0
        for j, (v, lo, hi) in enumerate(zip(row, los, his)):
            nv = (v - lo) * 65535 // max(hi - lo, 1)
            for b in range(bits):
                z += ((nv >> b) & 1) << (b * n + j)
        out.append(z)
    return out


def test_compact_zorder_layout_sorts_by_interleaved_key(spark, tmp_table_dir):
    import pyarrow.parquet as pq

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA,
                         merge_key=["url", "warc_ts"], n_buckets=1)
    # 2-D grid visited in shuffled order: day index and score independent
    import random

    rnd = random.Random(7)
    cells = [(d, s) for d in range(16) for s in range(16)]
    rnd.shuffle(cells)
    rows = [
        (f"u{d}-{s}", f"2024-01-{d + 1:02d} 00:00:00", s * 100)
        for d, s in cells
    ]
    t.merge(src(spark, rows), epoch_id=0, mode="mor", lsn_col="lsn")
    before = {(r["url"], r["score"]) for r in t.scan().collect()}
    t.compact(zorder_cols=["score", "warc_ts"])
    snap = t.snapshot()
    assert not snap.delta_files and len(snap.files) == 1
    # physical row order inside the file follows the interleaved key
    import os

    tbl = pq.read_table(os.path.join(tmp_table_dir, snap.files[0]["path"]))
    scores = tbl.column("score").to_pylist()
    ts_us = [int(v.timestamp() * 1e6) for v in tbl.column("warc_ts").to_pylist()]
    zvals = _pyz(list(zip(scores, ts_us)))
    assert zvals == sorted(zvals), "rows not in z-order"
    # layout-only: the logical table is unchanged and __zval never lands
    assert {(r["url"], r["score"]) for r in t.scan().collect()} == before
    assert "__zval" not in tbl.column_names


def test_compact_zorder_unknown_column_raises(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", 1)]), epoch_id=0,
            mode="mor", lsn_col="lsn")
    with pytest.raises(ValueError, match="zorder column"):
        t.compact(zorder_cols=["nope"])


def test_scan_where_ranges_conjunction_on_zordered_table(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA,
                         merge_key=["url", "warc_ts"], n_buckets=4,
                         stats_cols=["score", "warc_ts"])
    rows = [
        (f"u{d}-{s}", f"2024-01-{d + 1:02d} 00:00:00", s * 10)
        for d in range(8) for s in range(8)
    ]
    t.merge(src(spark, rows), epoch_id=0, mode="mor", lsn_col="lsn")
    t.compact(zorder_cols=["score", "warc_ts"])
    got = t.scan_where_ranges({
        "score": (20, 30),
        "warc_ts": (dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)),
    })
    assert {r["url"] for r in got.collect()} == {
        f"u{d}-{s}" for d in (2, 3, 4) for s in (2, 3)
    }
    with pytest.raises(ValueError, match="unknown column"):
        t.scan_where_ranges({"nope": (1, 2)})
    # delta-pending fallback stays correct
    t.merge(src(spark, [("u0-0", "2024-01-01 00:00:00", 25)], lsn0=999),
            epoch_id=1, mode="mor", lsn_col="lsn")
    got2 = t.scan_where_ranges({"score": (20, 30)})
    assert ("u0-0" in {r["url"] for r in got2.collect()})
