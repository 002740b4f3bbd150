"""winner_delta_stream: custom stateful streaming dedup via
applyInPandasWithState — per-key max-LSN state across micro-batches,
emitting only advanced winners (stale/redelivered rows are swallowed)."""

import os
import time

from pyspark.sql import functions as F

from clever_canal_spark.streaming.stateful import WINNER_DELTA_SCHEMA, winner_delta_stream

IN_SCHEMA = "url string, warc_ts timestamp, lsn long, op string, text string"
TS = "2024-01-01 00:00:00"


def _write_batch(spark, d, name, rows):
    """File-stream sources don't recurse: stage the write, then land the
    part file FLAT in the source dir (the feed's rotation shape)."""
    import glob
    import shutil

    df = spark.createDataFrame(
        [(u, TS, l, o, x) for u, l, o, x in rows],
        "url string, warc_ts string, lsn long, op string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    stage = os.path.join(d, f".stage-{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(d, f"{name}.parquet"))
    shutil.rmtree(stage)


def test_winner_delta_across_microbatches(spark, tmp_table_dir):
    src_dir = os.path.join(tmp_table_dir, "stream-src")
    out_dir = os.path.join(tmp_table_dir, "out")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    os.makedirs(src_dir, exist_ok=True)

    # batch 1: two keys, in-batch duplicate for 'a' (winner lsn=5)
    _write_batch(spark, src_dir, "b1", [("a", 3, "U", "a3"), ("a", 5, "U", "a5"), ("b", 4, "U", "b4")])

    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        winner_delta_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: stale 'a' (lsn=4, must be swallowed by state), new 'b' winner,
    # and a brand-new key
    _write_batch(spark, src_dir, "b2", [("a", 4, "U", "a4-stale"), ("b", 9, "D", None), ("c", 7, "U", "c7")])
    q = (
        winner_delta_stream(
            spark.readStream.schema(IN_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src_dir)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.schema(WINNER_DELTA_SCHEMA).parquet(out_dir)
    rows = {(r["url"], r["lsn"], r["op"]) for r in out.collect()}
    # emitted: a@5 and b@4 from batch 1; b@9(D) and c@7 from batch 2.
    # NOT emitted: a@3 (lost in-batch), a@4 (stale vs state).
    assert rows == {("a", 5, "U"), ("b", 4, "U"), ("b", 9, "D"), ("c", 7, "U")}


def test_winner_delta_tws_across_microbatches(spark, tmp_table_dir):
    """The transformWithState (StatefulProcessor) twin must behave
    identically to the legacy form on the same two-batch scenario.
    Requires protobuf (the tws control channel) — skipped in containers
    without it; runs on any real cluster."""
    import pytest

    pytest.importorskip("google.protobuf")
    from clever_canal_spark.streaming.stateful import winner_delta_stream_tws

    src_dir = os.path.join(tmp_table_dir, "tws-src")
    out_dir = os.path.join(tmp_table_dir, "tws-out")
    ckpt = os.path.join(tmp_table_dir, "tws-ckpt")
    os.makedirs(src_dir, exist_ok=True)
    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    _write_batch(spark, src_dir, "b1",
                 [("a", 3, "U", "a3"), ("a", 5, "U", "a5"), ("b", 4, "U", "b4")])

    def drain():
        q = (
            winner_delta_stream_tws(
                spark.readStream.schema(IN_SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(src_dir)
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        drain()
        _write_batch(spark, src_dir, "b2",
                     [("a", 4, "U", "a4-stale"), ("b", 9, "D", None), ("c", 7, "U", "c7")])
        drain()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    out = spark.read.schema(WINNER_DELTA_SCHEMA).parquet(out_dir)
    rows = {(r["url"], r["lsn"], r["op"]) for r in out.collect()}
    assert rows == {("a", 5, "U"), ("b", 4, "U"), ("b", 9, "D"), ("c", 7, "U")}
