"""Dataset publishing (operators/publish.py): deterministic shard
membership, order-independent integrity checksums, and tamper
detection via verify_dataset."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.publish import (
    publish_dataset,
    read_manifest,
    verify_dataset,
)


def _corpus(spark, n=200, salt=""):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"text{salt} of doc "), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_publish_roundtrip_and_determinism(spark, tmp_table_dir):
    d1 = os.path.join(tmp_table_dir, "out1")
    d2 = os.path.join(tmp_table_dir, "out2")
    m1 = publish_dataset(_corpus(spark), d1, n_shards=8)
    # a differently-partitioned but identical input publishes the SAME
    # manifest (membership + checksum are pure functions of content)
    m2 = publish_dataset(_corpus(spark).repartition(13), d2, n_shards=8)
    assert m1["shards"] == m2["shards"]
    assert m1["total_rows"] == 200
    assert sorted(m1["columns"]) == ["doc_id", "lang", "text"]
    assert read_manifest(d1) == m1
    # every shard dir is written by one task: exactly one parquet file
    for k in m1["shards"]:
        files = glob.glob(os.path.join(d1, f"shard={k}", "*.parquet"))
        assert len(files) == 1, (k, files)
    # read-back rows match the input exactly
    back = spark.read.parquet(d1)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200
    assert verify_dataset(spark, d1)["ok"]


def test_content_change_moves_checksum(spark, tmp_table_dir):
    d1 = os.path.join(tmp_table_dir, "a")
    d2 = os.path.join(tmp_table_dir, "b")
    m1 = publish_dataset(_corpus(spark), d1, n_shards=4)
    m2 = publish_dataset(_corpus(spark, salt="X"), d2, n_shards=4)
    # same membership (ids unchanged), different checksums (text moved)
    assert {k: v["rows"] for k, v in m1["shards"].items()} == \
           {k: v["rows"] for k, v in m2["shards"].items()}
    assert all(m1["shards"][k]["checksum"] != m2["shards"][k]["checksum"]
               for k in m1["shards"])


def test_verify_detects_missing_shard(spark, tmp_table_dir):
    d = os.path.join(tmp_table_dir, "out")
    m = publish_dataset(_corpus(spark), d, n_shards=4)
    victim = sorted(m["shards"])[0]
    shutil.rmtree(os.path.join(d, f"shard={victim}"))
    check = verify_dataset(spark, d)
    assert not check["ok"]
    fields = {(x["shard"], x["field"]) for x in check["mismatches"]}
    assert (int(victim), "rows") in fields
    assert (int(victim), "checksum") in fields


def test_null_id_refused(spark, tmp_table_dir):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="nulls"):
        publish_dataset(df, os.path.join(tmp_table_dir, "out"), n_shards=2)
