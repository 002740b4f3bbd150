"""Physical erasure (lake/erase.py erase_rows): the right-to-be-forgotten
protocol — bytes leave disk, history collapses, consumers saw the delete."""

import glob
import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable, SnapshotExpired, erase_rows

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)
TS = "2024-01-01 00:00:00"
SECRET = "SECRET-PAYLOAD-8f3a"
SECRET_URL = "https://pii.example/victim"


def src(spark, rows, lsn0=0):
    df = spark.createDataFrame(
        [(u, TS, x, "D" if x is None else "U", lsn0 + i) for i, (u, x) in enumerate(rows)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def seeded(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2)
    t.merge(src(spark, [("a", "v1"), (SECRET_URL, SECRET), ("b", "v1")]),
            epoch_id=0, mode="mor", lsn_col="lsn")
    # a second version of the secret row, so HISTORY holds two copies
    t.merge(src(spark, [(SECRET_URL, SECRET + "-v2"), ("a", "v2")], lsn0=10),
            epoch_id=1, mode="mor", lsn_col="lsn")
    return t


def _disk_has(path, needle: str) -> bool:
    for fn in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        with open(fn, "rb") as fh:
            if needle.encode() in fh.read():
                return True
    return False


def test_erase_removes_bytes_and_history(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    v_pre = t.current_version()
    assert _disk_has(tmp_table_dir, SECRET)
    res = erase_rows(t, F.col("url") == SECRET_URL, epoch_id="erase-1")
    assert res.delete_applied and res.files_removed > 0
    # live state: secret gone, others intact at their latest versions
    got = {(r["url"], r["text"]) for r in t.scan().collect()}
    assert got == {("a", "v2"), ("b", "v1")}
    # the KEY and the PAYLOAD are gone from every byte on disk
    assert not _disk_has(tmp_table_dir, SECRET)
    assert not _disk_has(tmp_table_dir, SECRET_URL)
    # time travel to the pre-erase world is gone
    with pytest.raises(SnapshotExpired):
        t.scan(version=v_pre).collect()
    # the logical-delete epoch stays exactly-once
    from clever_canal_spark.plans import delete_where

    assert not delete_where(t, F.col("url") == SECRET_URL, epoch_id="erase-1").applied


def test_erase_refuses_while_tags_pin_history(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    t.create_tag("audit", 2)
    with pytest.raises(ValueError, match="named refs pin"):
        erase_rows(t, F.col("url") == SECRET_URL, epoch_id="erase-1")
    t.drop_tag("audit")
    erase_rows(t, F.col("url") == SECRET_URL, epoch_id="erase-1")
    assert not _disk_has(tmp_table_dir, SECRET)


def test_erase_changelog_delete_visible_before_collapse(spark, tmp_table_dir):
    """A consumer that drained BEFORE the erase saw normal D markers; one
    that comes later finds the range expired (documented ordering)."""
    t = seeded(spark, tmp_table_dir)
    v0 = t.current_version()
    erase_rows(t, F.col("url") == SECRET_URL, epoch_id="erase-1")
    with pytest.raises(SnapshotExpired):
        t.scan_changes(v0).collect()


def test_erase_no_match_is_cheap_noop(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    v0 = t.current_version()
    res = erase_rows(t, "url = 'absent'", epoch_id="erase-none")
    assert res.delete_applied and res.files_removed == 0
    # no rewrite, no retention collapse: history intact
    assert t.scan(version=v0).count() == 3
    # replay of the same epoch falls through the full (idempotent) path
    res2 = erase_rows(t, "url = 'absent'", epoch_id="erase-none")
    assert not res2.delete_applied

def test_erase_replay_after_crash_purges_tombstones(spark, tmp_table_dir):
    """Crash between the logical delete and the physical rewrite: the
    replay's key capture must find the TOMBSTONES (the live scan is
    already empty at that point) or the PII-bearing tombstone rows —
    key AND full pre-image — survive the 'successful' erase forever."""
    from clever_canal_spark.plans import delete_where

    t = seeded(spark, tmp_table_dir)
    # step 2 of the protocol committed, then the process died
    assert delete_where(t, F.col("url") == SECRET_URL, epoch_id="erase-1").applied
    assert _disk_has(tmp_table_dir, SECRET)  # tombstone carries the payload
    res = erase_rows(t, F.col("url") == SECRET_URL, epoch_id="erase-1")
    assert not res.delete_applied  # the delete epoch replayed as a no-op
    assert not _disk_has(tmp_table_dir, SECRET)
    assert not _disk_has(tmp_table_dir, SECRET_URL)
    got = {(r["url"], r["text"]) for r in t.scan().collect()}
    assert got == {("a", "v2"), ("b", "v1")}
