"""Per-file bloom-filter file skipping for point reads.

MOR delta files hold keys in LSN-arrival order, so their manifest
[key_min, key_max] spans nearly the whole keyspace — range pruning keeps
every delta file in the probe's bucket. The per-file bloom (Iceberg
Puffin / Delta bloom-index analog, built at write time from the same JVM
xxhash64 family the probe job uses) is what lets `lookup` skip the delta
files that provably don't contain the key between compactions.

The oracle-style guard here is equality against an unpruned scan: a bloom
may only ever make pruning *incomplete* (false positive → file read
anyway), never wrong.
"""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.table import _BLOOM_DIR, _LOG_DIR

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

TS = "2024-01-01 00:00:00"


def make_table(spark, path, n_buckets=2, bloom=16):
    return LakeTable.create(
        spark,
        path,
        SCHEMA,
        merge_key=["url", "warc_ts"],
        n_buckets=n_buckets,
        bloom_bits_per_key=bloom,
    )


def epoch_src(spark, e, n=40, lsn_base=0):
    # keys interleave lexically across epochs: every epoch's file spans
    # ~the whole key range, so [key_min, key_max] pruning keeps them all
    rows = [(f"k{i:02d}e{e}", TS, f"v{e}.{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string")
    return (
        df.withColumn("warc_ts", F.to_timestamp("warc_ts"))
        .withColumn("op", F.lit("U"))
        .withColumn("lsn", F.lit(lsn_base + e).cast("long"))
    )


def replay(spark, t, n_epochs=4):
    for e in range(n_epochs):
        t.merge(epoch_src(spark, e), epoch_id=e, mode="mor", lsn_col="lsn",
                compact_every=0)


def test_bloom_skips_delta_files_on_point_lookup(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    replay(spark, t, n_epochs=4)

    # present key: correct row, and the plan shows the bloom (not the key
    # range) doing the skipping — every delta file survives range pruning
    out = t.lookup(url="k07e2").collect()
    assert [(r["url"], r["text"]) for r in out] == [("k07e2", "v2.7")]
    plan = t.lookup_plan(url="k07e2")
    assert plan["files_in_bucket"] == 4  # one delta file per epoch in the bucket
    assert plan["after_key_range"] == plan["files_in_bucket"]  # ranges useless here
    assert plan["after_bloom"] == 1  # only the epoch-2 file can hold the key
    # absent key chosen INSIDE the lexical key range (k05e3 < k05e9 < k06e0)
    # so range pruning keeps everything and only the bloom can skip: zero
    # rows, zero files read (modulo bloom false positives; at 16 bits/key
    # the fixture resolves to an exact skip)
    assert t.lookup(url="k05e9").count() == 0
    plan = t.lookup_plan(url="k05e9")
    assert plan["after_key_range"] == plan["files_in_bucket"]
    assert plan["after_bloom"] == 0
    assert plan["paths"] == []


def test_bloom_never_wrong_equality_with_full_scan(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    replay(spark, t, n_epochs=3)
    # overwrite one key in a later epoch: bloom-pruned LWW must still pick
    # the highest-LSN winner
    t.merge(
        epoch_src(spark, 0, n=5, lsn_base=100), epoch_id=99, mode="mor",
        lsn_col="lsn", compact_every=0,
    )
    for url in ("k03e0", "k03e1", "k39e2", "absent"):
        via_lookup = {
            (r["url"], r["text"]) for r in t.lookup(url=url).collect()
        }
        via_scan = {
            (r["url"], r["text"])
            for r in t.scan().filter(F.col("url") == url).collect()
        }
        assert via_lookup == via_scan, url


def test_bloom_survives_compaction(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    replay(spark, t, n_epochs=3)
    t.compact()
    snap = t.snapshot()
    assert snap.files and not snap.delta_files
    assert all(f.get("bloom") for f in snap.files)  # rewritten files re-bloomed
    assert [(r["text"]) for r in t.lookup(url="k05e1").collect()] == ["v1.5"]
    # absent in-range key: the compacted base file itself is skipped by its
    # bloom (the range covers the key) → a miss does literally zero data I/O
    plan = t.lookup_plan(url="k05e9")
    assert plan["files_in_bucket"] >= 1
    assert plan["after_key_range"] == plan["files_in_bucket"]
    assert plan["after_bloom"] == 0


def test_set_bloom_on_existing_table(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    replay(spark, t, n_epochs=2)  # pre-bloom deltas
    assert all(not f.get("bloom") for f in t.snapshot().delta_files)
    t.set_bloom(16)
    t.merge(epoch_src(spark, 2), epoch_id=2, mode="mor", lsn_col="lsn",
            compact_every=0)
    deltas = t.snapshot().delta_files
    assert any(f.get("bloom") for f in deltas) and any(
        not f.get("bloom") for f in deltas
    )
    # old files are always read (pruning incomplete, never wrong): an
    # absent in-range key keeps the 2 pre-bloom files, skips the bloomed one
    plan = t.lookup_plan(url="k05e9")
    assert plan["files_in_bucket"] == 3
    assert plan["after_bloom"] == 2
    assert [(r["text"]) for r in t.lookup(url="k01e0").collect()] == ["v0.1"]


def test_scan_for_keys_bloom_prunes(spark, tmp_table_dir, monkeypatch):
    t = make_table(spark, tmp_table_dir, n_buckets=1)  # one bucket: only the
    replay(spark, t, n_epochs=4)  # bloom can prune anything

    seen = []
    orig = LakeTable._read_files

    def spy(self, snap, files, hidden=False):
        seen.append(list(files))
        return orig(self, snap, files, hidden)

    monkeypatch.setattr(LakeTable, "_read_files", spy)
    out = t.scan_for_keys(["k00e0", "k00e3"])
    got = {(r["url"], r["text"]) for r in out.collect()}
    assert got == {("k00e0", "v0.0"), ("k00e3", "v3.0")}
    read = sum(len(fs) for fs in seen)
    assert read == 2  # 4 delta files in the bucket; bloom keeps exactly 2


def test_bloom_sidecar_vacuum(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    replay(spark, t, n_epochs=2)
    bloom_dir = os.path.join(tmp_table_dir, _LOG_DIR, _BLOOM_DIR)
    live = set(os.listdir(bloom_dir))
    assert len(live) == 2  # one sidecar per commit
    # orphan sidecar (crash between sidecar write and snapshot commit)
    orphan = os.path.join(bloom_dir, "deadbeef0000.json")
    with open(orphan, "w") as fh:
        json.dump({}, fh)
    res = t.vacuum(orphan_ttl_s=0)
    assert res["removed_bloom_sidecars"] == 1
    assert set(os.listdir(bloom_dir)) == live  # referenced sidecars kept
    assert t.lookup(url="k00e1").count() == 1


def test_bloom_sidecar_is_small_and_out_of_snapshot_json(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    replay(spark, t, n_epochs=1)
    snap_json = t._fs.read_text(
        os.path.join(tmp_table_dir, _LOG_DIR, f"v{t.current_version():08d}.json")
    )
    assert '"bits"' not in snap_json  # bitmaps never ride the snapshot log
    for f in t.snapshot().delta_files:
        assert f["bloom"].startswith("blooms/")
