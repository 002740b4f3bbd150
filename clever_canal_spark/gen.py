"""Deterministic synthetic change-event feed over Common-Crawl-style pages.

Plays the role of the binlog (the engine is source-agnostic above the byte
decoder — SURVEY.md §2.1 S6): an ordered stream of I/U/D row events with
before/after images, transaction framing, heartbeats, and interleaved DDL
rows, over a zipf-skewed url population (exercises the hot-key salting path).

Spark-first determinism: every column is pure arithmetic over
``spark.range(n)``'s ``id`` (a Knuth multiplicative mix, no ``rand()``), so
the feed is identical regardless of partition layout or cluster size, and
generation is embarrassingly parallel — the same code generates 10^4 events
for tests and 10^10 on a cluster.

LSN = ``id`` (unique, monotonic — the collapsed (journalName, offset) order,
EntryPosition.java:108-115). Multiple events hit the same (url, warc_ts) key
through a small per-url version count, so LWW dedup is exercised.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .model import (
    DDL_ADD_COLUMN,
    KIND_DDL,
    KIND_HEARTBEAT,
    KIND_ROW,
)

_MIX1 = 2654435761  # Knuth multiplicative hash constants
_MIX2 = 2246822519
_MIX3 = 3266489917
_M31 = 2**31


@dataclass
class DdlSpec:
    """One DDL event injected at a fixed LSN."""

    lsn: int
    ddl_type: str = DDL_ADD_COLUMN
    column: str = ""
    new_name: str = ""
    new_type: str = ""
    sql: str = ""


@dataclass
class FeedConfig:
    n_events: int = 10_000
    n_urls: int = 1_000
    versions_per_url: int = 3
    zipf_s: float = 3.0          # larger → more skew toward url 0
    seed: int = 42
    txn_size: int = 10
    heartbeat_every: int = 0     # 0 = no heartbeats; else every k-th lsn
    insert_pct: int = 20         # % I; % D below; rest U
    delete_pct: int = 10
    schema_name: str = "cc"
    table_name: str = "pages"
    base_ts: str = "2024-01-01 00:00:00"
    html_kb: int = 0  # extra filler body per page (realistic CC pages are KBs)
    ddls: list[DdlSpec] = dc_field(default_factory=list)


_FILLER = (
    "<p>Lorem ipsum dolor sit amet, the consectetur adipiscing elit, sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua for the web.</p>"
)  # 144 chars


def _mix(col: Column, mult: int, seed: int) -> Column:
    """Pseudo-uniform int in [0, 2^31) from id — pure deterministic."""
    return F.pmod((col + F.lit(seed)) * F.lit(mult), F.lit(_M31))


def _u01(col: Column, mult: int, seed: int) -> Column:
    return _mix(col, mult, seed) / F.lit(float(_M31))


def generate_feed(
    spark: SparkSession,
    cfg: FeedConfig,
    id_start: int = 0,
    id_end: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the change-event DataFrame (schema = model.CHANGE_EVENT_SCHEMA
    column set; text/lang left null — filled by the transform stage).

    ``id_start``/``id_end``/``num_partitions`` generate an LSN sub-range
    directly (contiguous ``spark.range`` partitions — no shuffle), so feed
    materialization is embarrassingly parallel slice by slice."""
    lsn = F.col("id")
    df = spark.range(id_start, id_end if id_end is not None else cfg.n_events,
                     1, num_partitions)

    # zipf-ish skew: u^s concentrates mass at url_id 0
    u = _u01(lsn, _MIX1, cfg.seed)
    url_id = F.floor(F.pow(u, F.lit(cfg.zipf_s)) * F.lit(cfg.n_urls)).cast("long")
    version = _mix(lsn, _MIX2, cfg.seed * 7 + 1) % F.lit(cfg.versions_per_url)
    opsel = _mix(lsn, _MIX3, cfg.seed * 13 + 5) % F.lit(100)

    url = F.concat(F.lit("https://example.org/page/"), url_id.cast("string"))
    base = F.to_timestamp(F.lit(cfg.base_ts))
    warc_ts = base + F.make_interval(hours=version)
    ev_ts = base + F.make_interval(secs=lsn.cast("double"))

    op = (
        F.when(opsel < cfg.insert_pct, F.lit("I"))
        .when(opsel < cfg.insert_pct + cfg.delete_pct, F.lit("D"))
        .otherwise(F.lit("U"))
    )

    def html_body(rev: Column) -> Column:
        return F.concat(
            F.lit("<html><head><title>Page "),
            url_id.cast("string"),
            F.lit("</title></head><body><h1>Doc "),
            url_id.cast("string"),
            F.lit(" v"),
            version.cast("string"),
            F.lit("</h1><p>Content revision "),
            rev.cast("string"),
            F.lit(" of page "),
            url_id.cast("string"),
            F.lit(".</p><p>The quick brown fox jumps over the lazy dog "),
            F.pmod(rev, F.lit(7)).cast("string"),
            F.lit(" times.</p>"),
            F.repeat(F.lit(_FILLER), max(cfg.html_kb * 1024 // len(_FILLER), 0)),
            F.lit("</body></html>"),
        )

    def image(rev: Column) -> Column:
        return F.struct(
            url.alias("url"),
            warc_ts.alias("warc_ts"),
            F.encode(html_body(rev), "UTF-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )

    after = F.when(op != "D", image(lsn)).otherwise(F.lit(None))
    before = F.when(op != "I", image(lsn - 1)).otherwise(F.lit(None))

    kind = F.lit(KIND_ROW)
    if cfg.heartbeat_every:
        kind = F.when(
            lsn % cfg.heartbeat_every == F.lit(cfg.heartbeat_every - 1), F.lit(KIND_HEARTBEAT)
        ).otherwise(kind)
    ddl_lsns = [d.lsn for d in cfg.ddls]
    if ddl_lsns:
        kind = F.when(lsn.isin(ddl_lsns), F.lit(KIND_DDL)).otherwise(kind)

    def ddl_col(attr: str) -> Column:
        c = F.lit(None).cast("string")
        for d in cfg.ddls:
            c = F.when(lsn == d.lsn, F.lit(getattr(d, attr) or None)).otherwise(c)
        return c

    is_row = kind == KIND_ROW
    out = df.select(
        lsn.alias("lsn"),
        ev_ts.alias("ts"),
        kind.alias("kind"),
        F.lit(cfg.schema_name).alias("schema_name"),
        F.lit(cfg.table_name).alias("table_name"),
        F.when(is_row, op).alias("op"),
        (lsn / cfg.txn_size).cast("long").alias("txn_id"),
        F.lit(1).cast("long").alias("server_id"),
        F.concat(F.lit("srv1:"), (lsn / cfg.txn_size).cast("long").cast("string")).alias("gtid"),
        F.when(is_row, before).alias("before"),
        F.when(is_row, after).alias("after"),
        ddl_col("ddl_type").alias("ddl_type"),
        ddl_col("sql").alias("ddl_sql"),
        ddl_col("column").alias("ddl_column"),
        ddl_col("new_name").alias("ddl_new_name"),
        ddl_col("new_type").alias("ddl_new_type"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("props"),
    )
    return out


def materialize_feed(
    spark: SparkSession,
    cfg: FeedConfig,
    path: str,
    n_slices: int,
    files_per_slice: int = 16,
) -> list[str]:
    """Write the feed as ``n_slices`` LSN-range slices of ``files_per_slice``
    parquet files each — generated per-slice with contiguous range
    partitions (zero shuffles; the whole feed never exists at once)."""
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    size = cfg.n_events // n_slices + (1 if cfg.n_events % n_slices else 0)
    out = []
    for i in range(n_slices):
        lo, hi = i * size, min((i + 1) * size, cfg.n_events)
        if lo >= hi:
            break
        sl = generate_feed(spark, cfg, id_start=lo, id_end=hi, num_partitions=files_per_slice)
        tmp = os.path.join(path, f".stage-{i}")
        sl.write.mode("overwrite").parquet(tmp)
        parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        for j, part in enumerate(parts):
            dest = os.path.join(path, f"binlog-{i:06d}-{j:03d}.parquet")
            os.rename(os.path.join(tmp, part), dest)
            out.append(dest)
        shutil.rmtree(tmp)
    return out


def reference_apply(rows: list[dict]) -> dict[tuple, dict]:
    """Single-threaded Python reference apply — the golden-replay oracle
    (mirror of an ordered Canal client consuming get→ack in order,
    CanalServerWithEmbedded.java:273-351): replay row events in LSN order,
    LWW per (url, warc_ts); D deletes, I/U set the after-image.

    ``rows`` are collected feed rows (dicts). Returns final state keyed by
    (url, warc_ts).
    """
    state: dict[tuple, dict] = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        if r["kind"] != KIND_ROW:
            continue
        if r["op"] == "D":
            img = r["before"]
            if img is not None:
                state.pop((img["url"], img["warc_ts"]), None)
        else:
            img = r["after"]
            state[(img["url"], img["warc_ts"])] = dict(img.asDict() if hasattr(img, "asDict") else img)
    return state
