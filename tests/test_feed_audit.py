"""Feed-integrity audits: LSN holes (including the bucket-boundary and
whole-bucket-missing shapes the bucketed derivation must not drop) and
duplicate offsets."""

from pyspark.sql import functions as F

from clever_canal_spark.sources.feed import (
    duplicate_lsn_audit,
    lsn_continuity_audit,
)


def _feed(spark, lsns):
    return spark.createDataFrame([(int(x),) for x in lsns], "lsn bigint")


def _gaps(df):
    return sorted(tuple(r) for r in df.collect())


def test_no_gaps_is_empty(spark):
    assert _gaps(lsn_continuity_audit(_feed(spark, range(100)), bucket=16)) == []


def test_intra_bucket_hole(spark):
    lsns = [x for x in range(40) if x not in (5, 6, 7)]
    assert _gaps(lsn_continuity_audit(_feed(spark, lsns), bucket=100)) == [(5, 7, 3)]


def test_hole_straddling_bucket_boundary_is_one_row(spark):
    """Hole 14..17 spans the bucket edge at 16 (bucket=16): the last
    present lsn sits in bucket 0, the next in bucket 1 — the inter-bucket
    leg must emit the WHOLE hole as one row, and the intra leg nothing."""
    lsns = [x for x in range(40) if not 14 <= x <= 17]
    assert _gaps(lsn_continuity_audit(_feed(spark, lsns), bucket=16)) == [(14, 17, 4)]


def test_wholly_missing_bucket_is_one_row(spark):
    """Buckets [16,32) entirely absent: lag over the per-bucket frame
    skips to the previous PRESENT bucket — one row covering 16..31, the
    hole never enumerated."""
    lsns = list(range(16)) + list(range(32, 48))
    assert _gaps(lsn_continuity_audit(_feed(spark, lsns), bucket=16)) == [(16, 31, 16)]


def test_duplicates_within_input_are_not_gaps(spark):
    """A duplicated lsn must not confuse the distinct-based gap scan."""
    lsns = list(range(20)) + [7, 7, 13]
    assert _gaps(lsn_continuity_audit(_feed(spark, lsns), bucket=8)) == []
    dups = {r["lsn"]: r["n_dups"] for r in duplicate_lsn_audit(_feed(spark, lsns)).collect()}
    assert dups == {7: 3, 13: 2}


def test_custom_lsn_column(spark):
    df = spark.createDataFrame([(0,), (1,), (4,)], "event_id bigint")
    assert _gaps(lsn_continuity_audit(df, lsn_col="event_id", bucket=2)) == [(2, 3, 2)]
    assert duplicate_lsn_audit(df, lsn_col="event_id").count() == 0
