"""MetadataFS seam: the lake's metadata layer against non-POSIX stores.

MemFS proves the seam is real (every metadata operation runs against a
dict under a lock — no POSIX anywhere); ArrowFS proves the pyarrow
FileSystem mapping end-to-end including the data plane (Spark writes the
parquet locally, ArrowFS handles every manifest/move/footer/GC call)."""

import os

import pytest
from pyspark.sql import types as T

from clever_canal_spark.lake import ArrowFS, LakeTable, MemFS
from clever_canal_spark.lake.table import CommitConflict

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_object_store_paths_pass_through_verbatim(spark):
    """A URI path (s3://...) or any explicit-fs path must NOT be run
    through os.path.abspath — that would rewrite it into a local key
    space ('/cwd/s3:/bucket/t') and break every metadata op against the
    store. Schemeless default-fs paths keep the historical abspath."""
    t = LakeTable(spark, "s3://bucket/tbl")
    assert t.path == "s3://bucket/tbl"
    t2 = LakeTable(spark, "bucket/tbl", fs=MemFS())
    assert t2.path == "bucket/tbl"
    t3 = LakeTable(spark, "somewhere/local")
    assert os.path.isabs(t3.path)


def test_memfs_metadata_lifecycle(spark):
    """Create / evolve / epoch-register / time-travel / expire / truncate —
    the full metadata surface — on a store that has no POSIX behind it."""
    fs = MemFS()
    t = LakeTable.create(spark, "/mem/pages", SCHEMA, merge_key=["url"], fs=fs)
    assert t.exists() and t.current_version() == 1
    # reopen against the same store
    t2 = LakeTable(spark, "/mem/pages", fs=fs)
    assert t2.current_version() == 1

    t2.add_column("lang", "string")
    t2.rename_column("lang", "language")
    assert "language" in [f["name"] for f in t2.snapshot().current_fields()]
    assert len(t2.schema_history()) == 3

    t2.commit_epoch_marker(0, {"n_events": 0})
    assert t2.is_epoch_committed(0)
    assert t2.commit_epoch_marker(0) is None  # replay no-op

    # time travel across the store
    assert "language" not in [f["name"] for f in t2.snapshot(version=1).current_fields()]

    v = t2.truncate_rows(100)
    assert v is not None and t2.truncate_rows(100) is None

    expired = t2.expire_snapshots(keep_last=2)
    assert expired and t2.current_version() == v


def test_memfs_commit_is_atomic(spark):
    fs = MemFS()
    t = LakeTable.create(spark, "/mem/race", SCHEMA, merge_key=["url"], fs=fs)
    a = LakeTable(spark, "/mem/race", fs=fs)
    b = LakeTable(spark, "/mem/race", fs=fs)
    sa, sb = a.snapshot(), b.snapshot()
    a._write_snapshot(a._child(sa, operation="writer-a"))
    with pytest.raises(CommitConflict):
        b._write_snapshot(b._child(sb, operation="writer-b"))
    assert t.snapshot().operation == "writer-a"


def test_memfs_driver_append_and_vacuum(spark):
    """append_pylist + vacuum run fully through the seam (parquet bytes
    land in the MemFS dict, footers read back from it)."""
    fs = MemFS()
    t = LakeTable.create(spark, "/mem/metrics", SCHEMA, merge_key=["url"], fs=fs)
    t.append_pylist([{"url": "u1", "warc_ts": None, "text": "x"}], epoch_id=7)
    assert t.is_epoch_committed(7)
    files = t.snapshot().files
    assert len(files) == 1 and files[0]["rows"] == 1
    # vacuum sees no orphans (the file is referenced)
    out = t.vacuum(orphan_ttl_s=0.0)
    assert out["removed_files"] == []


def test_arrowfs_end_to_end(spark, tmp_table_dir):
    """Full data-path drive with ArrowFS over pyarrow's LocalFileSystem:
    merge (Spark write + fs move + fs footer read), scan, compact,
    expire+vacuum — every manifest operation through the Arrow API."""
    from pyarrow.fs import LocalFileSystem

    fs = ArrowFS(LocalFileSystem(), single_writer=True)
    path = os.path.join(tmp_table_dir, "arrow_pages")
    t = LakeTable.create(spark, path, SCHEMA, merge_key=["url"], n_buckets=4, fs=fs)

    rows = [(f"u{i}", None, f"t{i}", "U", i) for i in range(50)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, op string, lsn bigint"
    )
    mr = t.merge(df, epoch_id=0, mode="mor", lsn_col="lsn")
    assert mr.applied and t.scan().count() == 50
    # replay no-op
    assert t.merge(df, epoch_id=0, mode="mor", lsn_col="lsn").applied is False

    upd = spark.createDataFrame(
        [("u1", None, "t1-new", "U", 100), ("u2", None, None, "D", 101)],
        "url string, warc_ts timestamp, text string, op string, lsn bigint",
    )
    t.merge(upd, epoch_id=1, mode="mor", lsn_col="lsn")
    got = {r["url"]: r["text"] for r in t.scan().collect()}
    assert got["u1"] == "t1-new" and "u2" not in got and len(got) == 49

    t.compact()
    assert t.scan().count() == 49
    t.expire_snapshots(keep_last=1)
    t.vacuum(orphan_ttl_s=0.0)
    assert t.scan().count() == 49


def test_arrowfs_multi_writer_refused(spark, tmp_table_dir):
    from pyarrow.fs import LocalFileSystem

    fs = ArrowFS(LocalFileSystem())
    with pytest.raises(NotImplementedError, match="conditional PUT"):
        LakeTable.create(
            spark, os.path.join(tmp_table_dir, "mw"), SCHEMA, merge_key=["url"], fs=fs
        )
