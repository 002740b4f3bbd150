"""Integrity checker (lake/fsck.py check_table): healthy tables report
nothing; seeded corruption is found by the right check."""

import json
import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable, check_table

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def src(spark, rows, lsn0=0):
    df = spark.createDataFrame(
        [(u, "2024-01-01 00:00:00", x, "U", lsn0 + i) for i, (u, x) in enumerate(rows)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def seeded(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2)
    t.merge(src(spark, [(f"u{i}", f"v{i}") for i in range(12)]), epoch_id=0,
            mode="mor", lsn_col="lsn")
    t.compact()
    t.rebucket(4)
    t.merge(src(spark, [("u1", "v1b")], lsn0=50), epoch_id=1, mode="mor", lsn_col="lsn")
    return t


def test_healthy_table_reports_nothing(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    assert check_table(t) == []
    assert check_table(t, deep=True) == []


def test_missing_file_and_row_count_mismatch(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    snap = t.snapshot()
    victim = snap.files[0]["path"]
    os.remove(os.path.join(tmp_table_dir, victim))
    found = check_table(t)
    assert any(f["check"] == "file-exists" and f["path"] == victim for f in found)
    # tamper a manifest row count (simulated metadata bug)
    log = sorted(os.listdir(os.path.join(tmp_table_dir, "_log")))[-1]
    p = os.path.join(tmp_table_dir, "_log", log)
    d = json.loads(open(p).read())
    d["delta_files"][0]["rows"] = 999_999
    open(p, "w").write(json.dumps(d))
    found = check_table(LakeTable(spark, tmp_table_dir))
    assert any(f["check"] == "row-count" for f in found)


def test_deep_check_catches_wrong_bucket_claim(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    log = sorted(os.listdir(os.path.join(tmp_table_dir, "_log")))[-1]
    p = os.path.join(tmp_table_dir, "_log", log)
    d = json.loads(open(p).read())
    # swap a delta file's claimed bucket — metadata pass can't see it,
    # the deep row-hash pass must
    real = d["delta_files"][0]["bucket"]
    d["delta_files"][0]["bucket"] = (real + 1) % 4
    open(p, "w").write(json.dumps(d))
    t2 = LakeTable(spark, tmp_table_dir)
    assert not [f for f in check_table(t2) if f["check"] == "row-bucket"]
    deep = check_table(t2, deep=True)
    assert any(f["check"] == "row-bucket" for f in deep)
