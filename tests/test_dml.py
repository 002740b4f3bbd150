"""Bulk DML (plans/dml.py): DELETE WHERE / UPDATE WHERE as change events
through the exactly-once merge — changelog, views, and LWW all hold."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.rollup import create_rollup, sync_rollup
from clever_canal_spark.plans import delete_where, update_where

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)
TS = "2024-01-01 00:00:00"


def make_table(spark, path):
    return LakeTable.create(spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2)


def feed(spark, rows, lsn0=0):
    """rows: (url, text, lang) — all upserts."""
    df = spark.createDataFrame(
        [(u, TS, x, g, "U", lsn0 + i) for i, (u, x, g) in enumerate(rows)],
        "url string, warc_ts string, text string, lang string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(t):
    return {(r["url"], r["text"], r["lang"]) for r in t.scan().collect()}


def seeded(spark, path):
    t = make_table(spark, path)
    t.merge(
        feed(spark, [("a", "1", "en"), ("b", "2", "de"), ("c", "3", "de"), ("d", "4", "fr")]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    return t


def test_delete_where_removes_matches_only(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    res = delete_where(t, "lang = 'de'", epoch_id="dml-1")
    assert res.applied
    assert state(t) == {("a", "1", "en"), ("d", "4", "fr")}
    # changelog carries ordinary D markers for downstream consumers
    ch = t.scan_changes(res.version - 1, res.version)
    ops = {(r["url"], r["__op"]) for r in ch.collect()}
    assert ops == {("b", "D"), ("c", "D")}


def test_delete_where_exactly_once_and_reopen(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    v1 = delete_where(t, "lang = 'de'", epoch_id="dml-1").version
    # same epoch replayed: no-op, version unchanged (also from a reopen)
    assert not delete_where(t, "lang = 'de'", epoch_id="dml-1").applied
    t2 = LakeTable(spark, tmp_table_dir)
    assert not delete_where(t2, "lang = 'de'", epoch_id="dml-1").applied
    assert t2.current_version() == v1


def test_dml_lsn_wins_over_lagging_shard(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)  # seeds at lsn 0..3
    res = delete_where(t, "url = 'b'", epoch_id="dml-1")
    assert res.lsn == 4  # frontier(3) + 1
    # a lagging shard re-delivers b at an OLDER lsn — must stay deleted
    t.merge(feed(spark, [("b", "stale", "de")], lsn0=2), epoch_id=9,
            mode="mor", lsn_col="lsn")
    assert ("b", "stale", "de") not in state(t)
    # but a genuinely newer event resurrects it (DML is an event, not a wall)
    t.merge(feed(spark, [("b", "new", "de")], lsn0=10), epoch_id=10,
            mode="mor", lsn_col="lsn")
    assert ("b", "new", "de") in state(t)


def test_update_where_sets_values(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    res = update_where(
        t, F.col("lang") == "de",
        {"lang": F.lit("redacted"), "text": F.concat(F.col("text"), F.lit("!"))},
        epoch_id="dml-u",
    )
    assert res.applied
    assert state(t) == {
        ("a", "1", "en"), ("b", "2!", "redacted"), ("c", "3!", "redacted"), ("d", "4", "fr"),
    }
    assert not update_where(t, "lang = 'de'", {"lang": "'x'"}, epoch_id="dml-u").applied


def test_update_where_refuses_key_and_unknown_columns(spark, tmp_table_dir):
    t = seeded(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="merge-key"):
        update_where(t, "lang = 'de'", {"url": "'u2'"}, epoch_id="x")
    with pytest.raises(ValueError, match="unknown column"):
        update_where(t, "lang = 'de'", {"nope": "'v'"}, epoch_id="x")


def test_maintained_view_absorbs_dml(spark, tmp_table_dir):
    """The rollup view synced across a DML epoch equals a from-scratch
    rebuild — the reason DML is events, not a file rewrite."""
    t = seeded(spark, tmp_table_dir)
    view = create_rollup(spark, tmp_table_dir + "-view", group_col="url")
    sync_rollup(view, t)
    delete_where(t, "lang = 'de'", epoch_id="dml-1")
    update_where(t, "url = 'a'", {"text": "'9'"}, epoch_id="dml-2")
    sync_rollup(view, t)
    got = {
        (r["url"], r["n_upserts"], r["n_deletes"])
        for r in view.scan().select("url", "n_upserts", "n_deletes").collect()
    }
    # seed: 1 upsert each; dml-1 deletes b,c; dml-2 re-upserts a
    assert got == {("a", 2, 0), ("b", 1, 1), ("c", 1, 1), ("d", 1, 0)}


def test_update_where_swap_uses_pre_image(spark, tmp_table_dir):
    """SET text = lang, lang = text must SWAP (SQL UPDATE semantics:
    every expression sees the pre-image), not duplicate one side."""
    t = seeded(spark, tmp_table_dir)
    update_where(
        t, "url = 'a'",
        {"text": F.col("lang"), "lang": F.col("text")},
        epoch_id="swap",
    )
    row = {r["url"]: (r["text"], r["lang"]) for r in t.scan().collect()}
    assert row["a"] == ("en", "1")

def test_update_where_casts_set_exprs_to_declared_types(spark, tmp_table_dir):
    """SET views = 0 parses as IntegerType; without a cast to the column's
    declared BIGINT the MOR delta file's physical parquet type would differ
    from its siblings under the same schema_version and poison every later
    mixed-footer read (PARQUET_COLUMN_DATA_TYPE_MISMATCH)."""
    import glob
    import os

    import pyarrow.parquet as pq

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("views", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url", "warc_ts"], n_buckets=2)
    df = spark.createDataFrame(
        [("a", TS, 7, "U", 0), ("b", TS, 9, "U", 1)],
        "url string, warc_ts string, views long, op string, lsn long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    t.merge(df, epoch_id=0, mode="mor", lsn_col="lsn")
    res = update_where(t, "url = 'a'", {"views": "0"}, epoch_id="dml-t")
    assert res.applied
    # every parquet file on disk stores views as INT64
    for fn in glob.glob(os.path.join(tmp_table_dir, "**", "*.parquet"), recursive=True):
        sch = pq.read_schema(fn)
        if "views" in sch.names:
            assert str(sch.field("views").type) == "int64", fn
    # and the mixed base+delta read works
    got = {(r["url"], r["views"]) for r in t.scan().collect()}
    assert got == {("a", 0), ("b", 9)}
