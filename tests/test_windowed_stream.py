"""Watermarked windowed aggregation: batch twin correctness + streaming
late-data semantics (late-within-slack updates its window; later than the
watermark is dropped; state is evicted)."""

import os
import time

from pyspark.sql import Row, functions as F

from clever_canal_spark.model import CHANGE_EVENT_SCHEMA
from clever_canal_spark.streaming import windowed_event_counts


def _event(lsn, ts, kind="ROW", op="U", table="pages"):
    return Row(
        lsn=lsn, ts=ts, kind=kind, schema_name="cc", table_name=table,
        op=op if kind == "ROW" else None, txn_id=lsn // 10, server_id=1,
        gtid=None, before=None, after=None, ddl_type=None, ddl_sql=None,
        ddl_column=None, ddl_new_name=None, ddl_new_type=None, props=None,
    )


def _ts(minute, second=0):
    import datetime

    return datetime.datetime(2024, 1, 1, 12, minute, second)


def test_windowed_counts_batch_twin(spark):
    rows = [
        _event(1, _ts(0, 10)), _event(2, _ts(0, 50), op="D"),
        _event(3, _ts(1, 10)), _event(4, _ts(1, 20), kind="HEARTBEAT"),
        _event(5, _ts(3, 0), table="other"),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = {
        (str(r["window_start"]), r["table_name"]): r
        for r in windowed_event_counts(df, "1 minute").collect()
    }
    w0 = out[("2024-01-01 12:00:00", "pages")]
    assert w0["n_events"] == 2 and w0["n_deletes"] == 1 and w0["lsn_max"] == 2
    w1 = out[("2024-01-01 12:01:00", "pages")]
    assert w1["n_events"] == 2 and w1["n_rows"] == 1 and w1["n_heartbeats"] == 1
    assert out[("2024-01-01 12:03:00", "other")]["n_events"] == 1


def test_windowed_stream_watermark_late_data(spark, tmp_path):
    """File-stream drive: batch 1 establishes the watermark; batch 2
    carries one late-but-within-slack event (must update its window) and
    one event older than the watermark (must be dropped)."""
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_slice(name, rows):
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = [
            f for f in os.listdir(tmp_path / name) if f.endswith(".parquet")
        ][0]
        os.rename(str(tmp_path / name / src), os.path.join(feed, f"{name}.parquet"))

    # batch 1: events at 12:00 and 12:10 → watermark after batch = 12:10 - 2min = 12:08
    write_slice("a", [_event(1, _ts(0, 30)), _event(2, _ts(10, 0))])

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    agg = windowed_event_counts(stream, "1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("winagg")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (str(r["window_start"]), r["n_events"])
            for r in spark.sql("SELECT * FROM winagg").collect()
        }
        assert ("2024-01-01 12:00:00", 1) in first
        assert ("2024-01-01 12:10:00", 1) in first

        time.sleep(1.1)  # distinct mtime so file order is deterministic
        # batch 2: 12:09:30 is late but >= watermark (12:08) → its window
        # updates; 12:01:00 is older than the watermark → dropped
        write_slice("b", [_event(3, _ts(9, 30)), _event(4, _ts(1, 0))])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM winagg").collect()
        emitted = {(str(r["window_start"]), r["n_events"]) for r in rows}
        assert ("2024-01-01 12:09:00", 1) in emitted  # late-within-slack kept
        assert not any(w == "2024-01-01 12:01:00" for w, _ in emitted)  # too-late dropped
    finally:
        q.stop()


def test_sessionized_stream_merges_across_batches(spark, tmp_path):
    """session_window streaming (append mode — the only mode Spark
    supports for session aggregations): an event in a later micro-batch
    that lands within the gap of an OPEN session merges into it, and the
    session is emitted exactly once when the watermark closes it; a
    still-open session is held back."""
    from clever_canal_spark.streaming import sessionized_counts

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_slice(name, rows):
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = [f for f in os.listdir(tmp_path / name) if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / name / src), os.path.join(feed, f"{name}.parquet"))

    write_slice("a", [_event(1, _ts(0, 0)), _event(2, _ts(30, 0), table="other")])

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    agg = sessionized_counts(
        stream, ["table_name"], gap="10 minutes", watermark="5 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessagg")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(1.1)
        # within 10 min of the open 'other' session at 12:30 -> must merge
        write_slice("b", [_event(3, _ts(35, 0), table="other")])
        q.processAllAvailable()
        time.sleep(1.1)
        # far-future event advances the watermark past every open session
        write_slice("c", [_event(4, _ts(0, 0).replace(hour=14))])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessagg").collect()
        got = {
            (r["table_name"], str(r["session_start"]), str(r["session_end"]),
             r["n_events"])
            for r in rows
        }
        # merged cross-batch session emitted ONCE with both events
        assert ("other", "2024-01-01 12:30:00", "2024-01-01 12:35:00", 2) in got
        assert ("pages", "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1) in got
        # the 14:00 session is still open -> held back by append mode
        assert not any(s.startswith("2024-01-01 14:") for _, s, _, _ in got)
        assert len([r for r in rows if r["table_name"] == "other"]) == 1
    finally:
        q.stop()


def test_windowed_distinct_registers_stream_matches_batch_twin(spark, tmp_path):
    """HLL register build as a watermarked streaming agg: update-mode
    emissions reconcile by max (registers are monotone); the final state
    must equal the batch twin over the rows the watermark kept, and the
    too-late row must be dropped."""
    from clever_canal_spark.streaming import windowed_distinct_registers

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_slice(name, rows):
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = [f for f in os.listdir(tmp_path / name) if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / name / src), os.path.join(feed, f"{name}.parquet"))

    batch1 = [_event(1, _ts(0, 10)), _event(2, _ts(0, 50)), _event(100, _ts(10, 0))]
    write_slice("a", batch1)
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    regs = windowed_distinct_registers(
        stream, F.col("lsn"), "1 minute", watermark="2 minutes", b=4
    )
    q = (
        regs.writeStream.outputMode("update")
        .format("memory")
        .queryName("hllregs")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(1.1)
        # 12:09:30 late-within-slack (kept), 12:01:00 below watermark (dropped)
        write_slice("b", [_event(3, _ts(9, 30)), _event(4, _ts(1, 0))])
        q.processAllAvailable()
        streamed = {}
        for r in spark.sql("SELECT * FROM hllregs").collect():
            k = (str(r["window_start"]), r["bucket"])
            streamed[k] = max(streamed.get(k, 0), r["r"])
    finally:
        q.stop()

    kept = [_event(1, _ts(0, 10)), _event(2, _ts(0, 50)), _event(100, _ts(10, 0)),
            _event(3, _ts(9, 30))]
    twin = {
        (str(r["window_start"]), r["bucket"]): r["r"]
        for r in windowed_distinct_registers(
            spark.createDataFrame(kept, CHANGE_EVENT_SCHEMA),
            F.col("lsn"), "1 minute", b=4,
        ).collect()
    }
    assert streamed == twin
    assert not any(w.startswith("2024-01-01 12:01") for w, _ in streamed)


def test_windowed_distinct_registers_duplicates_are_free(spark):
    """Duplicate items in a window leave its registers unchanged (HLL add
    is idempotent) — the property that makes update-mode reconcile-by-max
    and at-least-once sinks safe."""
    from clever_canal_spark.streaming import windowed_distinct_registers

    once = [_event(i, _ts(0, i % 50)) for i in range(1, 21)]
    twice = once + [_event(i, _ts(0, (i * 7) % 50)) for i in range(1, 21)]
    def regs(rows):
        return sorted(
            map(tuple, windowed_distinct_registers(
                spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA),
                F.col("lsn"), "1 minute", b=4,
            ).collect())
        )
    assert regs(once) == regs(twice)


def test_windowed_value_histogram_stream_matches_batch_twin(spark, tmp_path):
    """Histogram build as a watermarked streaming count-agg: update-mode
    emissions reconcile by max (per-bin counts only grow under append);
    final state must equal the batch twin over the watermark-kept rows."""
    from clever_canal_spark.streaming import windowed_value_histogram

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_slice(name, rows):
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = [f for f in os.listdir(tmp_path / name) if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / name / src), os.path.join(feed, f"{name}.parquet"))

    write_slice("a", [_event(5, _ts(0, 10)), _event(9, _ts(0, 50)),
                      _event(300, _ts(10, 0))])
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    regs = windowed_value_histogram(stream, "lsn", "1 minute", watermark="2 minutes")
    q = (
        regs.writeStream.outputMode("update")
        .format("memory")
        .queryName("histregs")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(1.1)
        # 12:09:30 late-within-slack (kept), 12:01:00 below watermark (dropped)
        write_slice("b", [_event(7, _ts(9, 30)), _event(4, _ts(1, 0))])
        q.processAllAvailable()
        streamed = {}
        for r in spark.sql("SELECT * FROM histregs").collect():
            k = (str(r["window_start"]), r["bin"])
            streamed[k] = max(streamed.get(k, 0), r["n"])
    finally:
        q.stop()

    kept = [_event(5, _ts(0, 10)), _event(9, _ts(0, 50)), _event(300, _ts(10, 0)),
            _event(7, _ts(9, 30))]
    twin = {
        (str(r["window_start"]), r["bin"]): r["n"]
        for r in windowed_value_histogram(
            spark.createDataFrame(kept, CHANGE_EVENT_SCHEMA), "lsn", "1 minute"
        ).collect()
    }
    assert streamed == twin
    assert not any(w.startswith("2024-01-01 12:01") for w, _ in streamed)
