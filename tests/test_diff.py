"""snapshot_diff (lake/diff.py) semantics: NET changes only — a key
updated then reverted inside the span disappears; rewritten-identical
values are excluded; A/U/D classes come from key presence, not value
nullability."""

import tempfile

from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.diff import snapshot_diff
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig, apply_epoch


def _batch(spark, rows):
    # rows: (url, text, op, lsn)
    df = spark.createDataFrame(rows, "url string, text string, op string, lsn long")
    img = F.struct(
        F.col("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    return (
        df.select(
            "lsn",
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
            F.lit("ROW").alias("kind"),
            F.lit("cc").alias("schema_name"),
            F.lit("pages").alias("table_name"),
            "op",
            F.lit(0).cast("long").alias("txn_id"),
            F.lit(1).cast("long").alias("server_id"),
            F.lit(None).cast("string").alias("gtid"),
            F.when(F.col("op") != "I", img).alias("before"),
            F.when(F.col("op") != "D", img).alias("after"),
        )
        .withColumn("ddl_type", F.lit(None).cast("string"))
        .withColumn("ddl_sql", F.lit(None).cast("string"))
        .withColumn("ddl_column", F.lit(None).cast("string"))
        .withColumn("ddl_new_name", F.lit(None).cast("string"))
        .withColumn("ddl_new_type", F.lit(None).cast("string"))
        .withColumn("props", F.lit(None).cast("map<string,string>"))
    )


def test_snapshot_diff_net_changes(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAGE_SCHEMA, merge_key=["url", "warc_ts"],
        n_buckets=2,
    )
    cfg = ApplyConfig(transform=False, merge_mode="mor")
    # epoch 0: k1=a, k2=b, k4=d
    apply_epoch(spark, _batch(spark, [
        ("k1", "a", "I", 1), ("k2", "b", "I", 2), ("k4", "d", "I", 3),
    ]), 0, table, cfg)
    v1 = table.current_version()
    # epoch 1: k1 -> a2 ; k3 added ; k4 deleted ; k2 rewritten identical
    apply_epoch(spark, _batch(spark, [
        ("k1", "a2", "U", 10), ("k3", "c", "I", 11),
        ("k4", None, "D", 12), ("k2", "b", "U", 13),
    ]), 1, table, cfg)
    # epoch 2: k1 reverted back to a
    apply_epoch(spark, _batch(spark, [("k1", "a", "U", 20)]), 2, table, cfg)

    out = snapshot_diff(table, from_version=v1, value_cols=["text"])
    got = {r.url: (r.old_text, r.new_text, r.change) for r in out.collect()}
    # k1 update+revert nets out; k2 identical rewrite excluded
    assert got == {
        "k3": (None, "c", "A"),
        "k4": ("d", None, "D"),
    }

    # mid-span diff still sees the k1 update as U
    mid = snapshot_diff(table, from_version=v1,
                        to_version=table.current_version() - 1,
                        value_cols=["text"])
    by_key = {r.url: (r.old_text, r.new_text, r.change) for r in mid.collect()}
    assert by_key["k1"] == ("a", "a2", "U")


def test_snapshot_diff_across_schema_evolution(spark, tmp_path):
    """The span crosses ADD / RENAME / widen DDLs: value columns resolve
    by field id, added columns read null on the old side, and the diff
    does not crash on either schema boundary."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), PAGE_SCHEMA, merge_key=["url", "warc_ts"],
        n_buckets=2,
    )
    cfg = ApplyConfig(transform=False, merge_mode="mor")
    apply_epoch(spark, _batch(spark, [("k1", "a", "I", 1)]), 0, table, cfg)
    v1 = table.current_version()
    apply_epoch(spark, _batch(spark, [("k2", "c", "I", 10)]), 1, table, cfg)
    # evolve between the endpoints: add a column, rename text -> body —
    # before the field-id fix either DDL made the diff throw
    # UNRESOLVED_COLUMN (old side selected by the NEW snapshot's names)
    table.add_column("quality", "double")
    table.rename_column("text", "body")

    out = snapshot_diff(table, from_version=v1)  # default vals: NEW schema
    got = {r.url: (r.old_body, r.new_body, r.old_quality, r.change)
           for r in out.collect()}
    # k1 unchanged (text==body via field id, quality null both sides) -> absent
    assert got == {"k2": (None, "c", None, "A")}


def test_snapshot_diff_expired_endpoint_raises(spark, tmp_path):
    """An expired from_version surfaces as SnapshotExpired (with rebuild
    guidance), the same contract scan_changes gives — not a bare
    FileNotFoundError on the log path."""
    import pytest

    from clever_canal_spark.lake import SnapshotExpired

    table = LakeTable.create(
        spark, str(tmp_path / "texp"), PAGE_SCHEMA, merge_key=["url", "warc_ts"],
        n_buckets=2,
    )
    cfg = ApplyConfig(transform=False, merge_mode="mor")
    apply_epoch(spark, _batch(spark, [("k1", "a", "I", 1)]), 0, table, cfg)
    v1 = table.current_version()
    apply_epoch(spark, _batch(spark, [("k1", "a2", "U", 2)]), 1, table, cfg)
    apply_epoch(spark, _batch(spark, [("k1", "a3", "U", 3)]), 2, table, cfg)
    table.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired):
        snapshot_diff(table, from_version=v1)
