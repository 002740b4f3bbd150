"""Stream-stream interval join (streaming/joins.py): batch-twin
semantics (hand-pinned bounds/ties), streaming inner matches across
micro-batches with bounded state, and leftOuter's null emission once
the watermark proves no match can arrive."""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.streaming.joins import interval_join_stream

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minute, second=0):
    return T0 + dt.timedelta(minutes=minute, seconds=second)


def _clicks(spark, rows):
    return spark.createDataFrame(rows, "user_id long, c_ts timestamp, click_id long")


def _purch(spark, rows):
    return spark.createDataFrame(rows, "user_id long, p_ts timestamp, purchase_id long")


def test_batch_bounds_inclusive_and_key_scoped(spark):
    clicks = _clicks(spark, [(1, _m(0), 10), (2, _m(0), 20)])
    purch = _purch(spark, [
        (1, _m(0), 100),      # gap 0: inclusive lower bound
        (1, _m(30), 101),     # gap exactly 30m: inclusive upper bound
        (1, _m(30, 1), 102),  # 1s past: excluded
        (2, _m(5), 200),      # other user's click only
    ])
    out = interval_join_stream(
        clicks, purch, ["user_id"], "c_ts", "p_ts",
        lower="0 seconds", upper="30 minutes",
    )
    got = sorted((r.click_id, r.purchase_id) for r in out.collect())
    assert got == [(10, 100), (10, 101), (20, 200)]


def test_batch_negative_lower_bound(spark):
    # attribution windows that open BEFORE the anchor: purchase up to
    # 5 min before the click still matches
    clicks = _clicks(spark, [(1, _m(10), 10)])
    purch = _purch(spark, [
        (1, _m(6), 100),   # 4 min before: in
        (1, _m(4), 101),   # 6 min before: out
        (1, _m(12), 102),  # after: in
    ])
    out = interval_join_stream(
        clicks, purch, ["user_id"], "c_ts", "p_ts",
        lower="-5 minutes", upper="30 minutes",
    )
    assert sorted(r.purchase_id for r in out.collect()) == [100, 102]


def test_clashing_payload_columns_refused(spark):
    clicks = _clicks(spark, [(1, _m(0), 10)]).withColumnRenamed("click_id", "x")
    purch = _purch(spark, [(1, _m(1), 100)]).withColumnRenamed("purchase_id", "x")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join_stream(clicks, purch, ["user_id"], "c_ts", "p_ts")


def _drive_stream(spark, tmp, how, slices):
    """File-stream drive: write (clicks, purchases) slices one at a
    time, processing all available after each, into a memory sink."""
    cdir, pdir = os.path.join(tmp, "c"), os.path.join(tmp, "p")
    os.makedirs(cdir), os.makedirs(pdir)

    def _slice(target, df, name):
        stage = os.path.join(tmp, "stage", name)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part), os.path.join(target, name + ".parquet"))

    clicks = spark.readStream.schema(
        "user_id long, c_ts timestamp, click_id long"
    ).parquet(cdir)
    purch = spark.readStream.schema(
        "user_id long, p_ts timestamp, purchase_id long"
    ).parquet(pdir)
    joined = interval_join_stream(
        clicks, purch, ["user_id"], "c_ts", "p_ts",
        lower="0 seconds", upper="10 minutes", how=how,
        watermark="5 minutes",
    )
    name = f"ij_{how}_{abs(hash(tmp)) % 10**8}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        for i, (crows, prows) in enumerate(slices):
            time.sleep(1.1)  # distinct mtimes: deterministic file order
            if crows:
                _slice(cdir, _clicks(spark, crows), f"c{i}")
            if prows:
                _slice(pdir, _purch(spark, prows), f"p{i}")
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"select * from {name}")


def test_stream_inner_matches_across_batches(spark, tmp_table_dir):
    out = _drive_stream(spark, tmp_table_dir, "inner", [
        # batch 1: click alone — no output yet, state buffers it
        ([(1, _m(0), 10)], []),
        # batch 2: its purchase arrives within the window -> match
        ([], [(1, _m(3), 100)]),
        # batch 3: a purchase outside any window -> nothing
        ([], [(1, _m(40), 101)]),
    ])
    got = sorted((r.click_id, r.purchase_id) for r in out.collect())
    assert got == [(10, 100)]


def test_stream_left_outer_emits_null_after_watermark(spark, tmp_table_dir):
    out = _drive_stream(spark, tmp_table_dir, "leftOuter", [
        # c1 gets a match; c2 never will
        ([(1, _m(0), 10), (2, _m(0), 20)], [(1, _m(2), 100)]),
        # advance both watermarks far past c2's window (+10m, 5m slack)
        ([(9, _m(60), 90)], [(9, _m(60, 1), 900)]),
        # one more batch so the closed state flushes
        ([(9, _m(70), 91)], [(9, _m(70, 1), 901)]),
    ])
    rows = {r.click_id: r.purchase_id for r in out.collect()}
    assert rows[10] == 100
    assert 20 in rows and rows[20] is None  # no-conversion record, null-padded


def test_dedup_within_watermark_stream(spark, tmp_table_dir):
    """dropDuplicatesWithinWatermark wrapper: a redelivery of the same
    key in a LATER micro-batch (within the watermark) is suppressed;
    distinct keys pass; batch inputs take the plain-dropDuplicates twin."""
    import time

    from clever_canal_spark.streaming import dedup_events_within_watermark

    src = os.path.join(tmp_table_dir, "src")
    os.makedirs(src)

    def _slice(df, name):
        stage = os.path.join(tmp_table_dir, "stage", name)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part), os.path.join(src, name + ".parquet"))

    def _ev(rows):
        return spark.createDataFrame(rows, "k long, ts timestamp, payload string")

    stream = spark.readStream.schema("k long, ts timestamp, payload string") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    out = dedup_events_within_watermark(stream, ["k"], "ts", "10 minutes")
    name = f"ddw_{abs(hash(tmp_table_dir)) % 10**8}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ckpt"))
        .start()
    )
    try:
        _slice(_ev([(1, _m(0), "first"), (2, _m(1), "other")]), "a")
        q.processAllAvailable()
        time.sleep(1.1)
        # redelivery of k=1 within the watermark + one genuinely new key
        _slice(_ev([(1, _m(2), "dup"), (3, _m(2), "new")]), "b")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.k: r.payload for r in spark.sql(f"select * from {name}").collect()}
    assert rows == {1: "first", 2: "other", 3: "new"}

    # batch twin: finite input, plain dedup
    batch = _ev([(1, _m(0), "x"), (1, _m(5), "y"), (2, _m(0), "z")])
    got = dedup_events_within_watermark(batch, ["k"], "ts")
    assert got.count() == 2
