"""Chunked resumable backfill (plans.bootstrap_in_chunks) — the DBLog/
Debezium incremental-snapshot shape on LWW reconciliation: chunk epochs
are exactly-once, resume skips committed chunks with zero jobs, and a
live tail interleaved ANYWHERE between chunks commutes (seed rows at
as_of_lsn lose to any later tail event)."""

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import bootstrap_epoch, bootstrap_in_chunks

AS_OF = 100


def _snap(spark, n=12):
    return spark.createDataFrame(
        [(f"u{i}", "2024-01-01 00:00:00", None, f"seed{i}", "en") for i in range(n)],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _tbl(spark, d):
    return LakeTable.create(
        spark, d, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )


def _tail(spark, table, rows):
    """rows: (url, text_or_None_for_delete, lsn)."""
    df = spark.createDataFrame(
        [(u, "2024-01-01 00:00:00", None, t, "en", "D" if t is None else "U", l)
         for u, t, l in rows],
        "url string, warc_ts string, html binary, text string, lang string, "
        "op string, lsn long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    table.merge(df, epoch_id=f"tail-{rows[0][2]}", mode="mor", lsn_col="lsn")


def _state(table):
    return sorted(
        (r["url"], r["text"]) for r in table.scan().select("url", "text").collect()
    )


def test_chunked_equals_oneshot(spark, tmp_table_dir):
    import tempfile

    a = _tbl(spark, tmp_table_dir)
    r = bootstrap_in_chunks(a, _snap(spark), AS_OF, n_chunks=4)
    assert r["applied"] == 4 and r["skipped"] == 0
    b = _tbl(spark, tempfile.mkdtemp(prefix="ccs-bchunk-"))
    bootstrap_epoch(b, _snap(spark), AS_OF)
    assert _state(a) == _state(b)
    # full replay: all chunks skip, version frozen, zero epochs re-run
    v = a.current_version()
    r2 = bootstrap_in_chunks(a, _snap(spark), AS_OF, n_chunks=4)
    assert r2["skipped"] == 4 and r2["applied"] == 0
    assert a.current_version() == v


def test_crash_resume_skips_committed_chunks(spark, tmp_table_dir):
    t = _tbl(spark, tmp_table_dir)
    snap = _snap(spark)
    # "crash" after two chunks: seed them with the ids the full run uses
    for i in (0, 1):
        chunk = snap.filter(
            F.pmod(F.xxhash64(F.col("url"), F.col("warc_ts")), F.lit(4)) == i
        )
        bootstrap_epoch(t, chunk, AS_OF, epoch_id=f"bootstrap.{i:05d}of4")
    r = bootstrap_in_chunks(t, snap, AS_OF, n_chunks=4)
    assert r["skipped"] == 2 and r["applied"] == 2
    assert len(_state(t)) == 12


def test_tail_interleaved_between_chunks_commutes(spark, tmp_table_dir):
    import tempfile

    snap = _snap(spark)
    keys4 = {
        i: [r["url"] for r in snap.filter(
            F.pmod(F.xxhash64(F.col("url"), F.col("warc_ts")), F.lit(4)) == i
        ).collect()]
        for i in range(4)
    }
    # pick one key from an early chunk and one from a late chunk
    early, late = keys4[0][0], keys4[3][0]

    a = _tbl(spark, tmp_table_dir)
    for i in (0, 1):
        bootstrap_epoch(
            t := a,
            snap.filter(
                F.pmod(F.xxhash64(F.col("url"), F.col("warc_ts")), F.lit(4)) == i
            ),
            AS_OF,
            epoch_id=f"bootstrap.{i:05d}of4",
        )
    # the tail races ahead: updates a seeded key, deletes + updates keys
    # whose chunks have NOT landed yet
    _tail(spark, a, [(early, "tail-upd-early", 500),
                     (late, "tail-upd-late", 501),
                     (keys4[2][0], None, 502)])
    r = bootstrap_in_chunks(a, snap, AS_OF, n_chunks=4)
    assert r["skipped"] == 2 and r["applied"] == 2

    b = _tbl(spark, tempfile.mkdtemp(prefix="ccs-bchunk-"))
    bootstrap_epoch(b, snap, AS_OF)
    _tail(spark, b, [(early, "tail-upd-early", 500),
                     (late, "tail-upd-late", 501),
                     (keys4[2][0], None, 502)])
    assert _state(a) == _state(b)
    got = dict(_state(a))
    assert got[early] == "tail-upd-early" and got[late] == "tail-upd-late"
    assert keys4[2][0] not in got  # late-arriving seed lost to the delete


def test_n_chunks_validation(spark, tmp_table_dir):
    t = _tbl(spark, tmp_table_dir)
    with pytest.raises(ValueError):
        bootstrap_in_chunks(t, _snap(spark), AS_OF, n_chunks=0)
