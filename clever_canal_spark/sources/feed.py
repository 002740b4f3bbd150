"""Change-event feed sources — the binlog-tail analog.

The reference tails a MySQL binlog over the wire (MysqlConnection.dump,
MysqlConnection.java:157-182) or a local binlog directory with file rotation
(LocalBinLogConnection.java:75-120 + BinLogFileQueue). The Spark-native
equivalent of "tail a directory of rotating log files" is the file stream
source: ``readStream.parquet(dir)`` picks up newly arriving files in order,
checkpoints which files are consumed (the position store), and
``maxFilesPerTrigger`` plays the get-batch sizing knob
(MemoryEventStoreWithBuffer.get, BatchMode.java:11-23).

Positions: the reference's EntryPosition (journalName, offset) is our
``lsn``; "start from timestamp T" (MysqlConnection.java:210-213) is a plain
``ts >= T`` predicate — pushed into the parquet scan by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import CHANGE_EVENT_SCHEMA


def read_feed(spark: SparkSession, path: str, since_ts=None, since_lsn: int | None = None) -> DataFrame:
    """Batch read of a feed directory (cold backfill / replay)."""
    df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    if since_ts is not None:
        df = df.filter(F.col("ts") >= F.lit(since_ts))
    if since_lsn is not None:
        df = df.filter(F.col("lsn") >= F.lit(since_lsn))
    return df


def read_feed_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a feed directory (the dump loop).

    Batch admission mirrors Canal's get(batchSize) dual units
    (CanalServerWithEmbedded.java getWithoutAck: ITEMSIZE vs MEMSIZE):
    ``max_files_per_trigger`` counts rotation units (ITEMSIZE analog),
    ``max_bytes_per_trigger`` bounds admitted bytes per micro-batch
    (MEMSIZE analog — Spark's file source admits whole files up to the
    byte budget, always at least one). Mutually exclusive, as in Spark."""
    if max_files_per_trigger and max_bytes_per_trigger:
        raise ValueError(
            "max_files_per_trigger and max_bytes_per_trigger are mutually "
            "exclusive batch-admission units (pick ITEM- or MEM-bounded)"
        )
    r = spark.readStream.schema(CHANGE_EVENT_SCHEMA).option("pathGlobFilter", "*.parquet")
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger:
        r = r.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return r.parquet(path)


def write_feed_slices(
    feed: DataFrame, path: str, n_slices: int, n_events: int, files_per_slice: int = 1
) -> list[str]:
    """Materialize a feed DataFrame as ``n_slices`` LSN-range parquet
    'binlog files' under ``path`` (rotation fixture for streaming tests —
    the BinLogFileQueue analog). Returns the slice paths in order.

    ``files_per_slice > 1`` splits each slice into several files so the
    micro-batch scan parallelizes (a single large parquet file is one row
    group → one task; real feeds arrive as many files)."""
    import shutil

    os.makedirs(path, exist_ok=True)
    size = n_events // n_slices + (1 if n_events % n_slices else 0)
    out = []
    for i in range(n_slices):
        tmp = os.path.join(path, f".stage-{i}")
        sl = feed.filter((F.col("lsn") >= i * size) & (F.col("lsn") < (i + 1) * size))
        sl = sl.coalesce(1) if files_per_slice == 1 else sl.repartition(files_per_slice)
        sl.write.mode("overwrite").parquet(tmp)
        parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        for j, part in enumerate(parts):
            dest = os.path.join(path, f"binlog-{i:06d}-{j:03d}.parquet")
            os.rename(os.path.join(tmp, part), dest)
            out.append(dest)
        shutil.rmtree(tmp)
    return out


def first_position(df: DataFrame) -> dict | None:
    """min-LSN position in a feed/batch (CanalEventUtils.min analog)."""
    r = df.agg(F.min("lsn").alias("lsn"), F.min("ts").alias("ts")).collect()[0]
    return None if r["lsn"] is None else {"lsn": r["lsn"], "ts": r["ts"]}


def latest_position(df: DataFrame) -> dict | None:
    r = df.agg(F.max("lsn").alias("lsn"), F.max("ts").alias("ts")).collect()[0]
    return None if r["lsn"] is None else {"lsn": r["lsn"], "ts": r["ts"]}


def lsn_continuity_audit(
    feed: DataFrame, lsn_col: str = "lsn", bucket: int = 100_000
) -> DataFrame:
    """Holes in a dense LSN stream, as (gap_start, gap_end, missing) rows
    — the ops-side twin of Canal's position-continuity guarantee
    (LogPosition/meta store ensure the server never skips an offset;
    reference: CanalLogPositionManager semantics). A file-shipped feed
    has no server enforcing that, so lost slices / truncated files show
    up as silent data loss unless audited.

    Scale shape: NO global window. LSNs dedup-shuffle once, then
    intra-bucket gaps use a window partitioned by ``lsn DIV bucket``
    (parallel, bounded partitions) and inter-bucket gaps compare each
    bucket's max against the next PRESENT bucket's min over the tiny
    per-bucket aggregate frame (≤ max_lsn/bucket rows — 10⁴ rows at
    10¹⁰ events with the default bucket). Wholly-missing buckets fall
    out of the inter-bucket leg (lag skips to the previous present
    bucket), so arbitrarily large holes are one row, never enumerated."""
    d = (
        feed.select(F.col(lsn_col).cast("long").alias("lsn"))
        .distinct()
        .withColumn("b", F.expr(f"lsn DIV {bucket}"))
    )
    from pyspark.sql import Window

    w_intra = Window.partitionBy("b").orderBy("lsn")
    intra = (
        d.withColumn("__prev", F.lag("lsn").over(w_intra))
        .filter(F.col("__prev").isNotNull() & (F.col("lsn") > F.col("__prev") + 1))
        .select(
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col("lsn") - 1).alias("gap_end"),
        )
    )
    mm = d.groupBy("b").agg(F.min("lsn").alias("__mn"), F.max("lsn").alias("__mx"))
    w_inter = Window.orderBy("b")
    inter = (
        mm.withColumn("__pmx", F.lag("__mx").over(w_inter))
        .filter(F.col("__pmx").isNotNull() & (F.col("__mn") > F.col("__pmx") + 1))
        .select(
            (F.col("__pmx") + 1).alias("gap_start"),
            (F.col("__mn") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(inter).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("missing"),
    )


def duplicate_lsn_audit(feed: DataFrame, lsn_col: str = "lsn") -> DataFrame:
    """LSNs appearing more than once — the other feed-integrity failure
    (a re-shipped slice or a producer retry without idempotence). One
    hash agg; (lsn, n_dups)."""
    return (
        feed.groupBy(F.col(lsn_col).cast("long").alias("lsn"))
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )
