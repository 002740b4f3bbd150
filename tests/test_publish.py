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


def test_diff_datasets(spark, tmp_table_dir):
    """Per-shard diff: manifest-identical shards skipped with zero data
    I/O (the read plan's files exclude their dirs), row multiset
    differences exact, schema migration refused."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.publish import (
        diff_datasets, publish_dataset,
    )

    a_dir = os.path.join(tmp_table_dir, "a")
    b_dir = os.path.join(tmp_table_dir, "b")
    base = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    publish_dataset(base, a_dir, n_shards=8)
    # v2: drop one known doc, edit another
    v2 = base.filter(F.col("doc_id") != 17).withColumn(
        "text",
        F.when(F.col("doc_id") == 23, F.lit("edited")).otherwise(F.col("text")),
    )
    publish_dataset(v2, b_dir, n_shards=8)

    out = diff_datasets(spark, a_dir, b_dir)
    rows = {r["shard"]: r for r in out.collect()}
    assert len(rows) == 8
    assert sum(r["n_only_a"] for r in rows.values()) == 2   # dropped + old text
    assert sum(r["n_only_b"] for r in rows.values()) == 1   # new text
    assert sum(r["rows_a"] for r in rows.values()) == 200
    assert sum(r["rows_b"] for r in rows.values()) == 199
    changed = [k for k, r in rows.items() if r["changed"]]
    assert 1 <= len(changed) <= 2  # docs 17 and 23's shards only
    for k, r in rows.items():
        if not r["changed"]:
            assert r["n_only_a"] == 0 and r["n_only_b"] == 0

    # zero data I/O on unchanged shards: the diff plan reads only the
    # CHANGED shard directories
    read = {f for f in out.inputFiles()}
    for k, r in rows.items():
        touched = any(f"shard={k}/" in f for f in read)
        assert touched == r["changed"], (k, r["changed"])

    # identical publishes: all unchanged, no files read at all
    same = diff_datasets(spark, a_dir, a_dir)
    assert same.filter(F.col("changed")).count() == 0
    assert not same.inputFiles()

    # column-set mismatch is a schema migration, not a diff
    c_dir = os.path.join(tmp_table_dir, "c")
    publish_dataset(base.withColumn("extra", F.lit(1)), c_dir, n_shards=8)
    with pytest.raises(ValueError, match="schema migration"):
        diff_datasets(spark, a_dir, c_dir)
