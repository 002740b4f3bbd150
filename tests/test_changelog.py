"""Incremental changelog reads + property-based LWW (hypothesis)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clever_canal_spark.gen import FeedConfig, generate_feed
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.operators import lww_dedup, salted_lww_dedup
from clever_canal_spark.plans import ApplyConfig, apply_epoch


def test_scan_changes_between_epochs(spark, tmp_table_dir):
    feed = generate_feed(spark, FeedConfig(n_events=600, n_urls=60, seed=41)).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig(merge_mode="mor", transform=False, compact_every=0)
    v0 = table.current_version()
    apply_epoch(spark, feed.filter(F.col("lsn") < 300), 0, table, cfg)
    v1 = table.current_version()
    apply_epoch(spark, feed.filter(F.col("lsn") >= 300), 1, table, cfg)
    v2 = table.current_version()

    # epoch 1's changes = winners of the second half, deletes included
    ch = table.scan_changes(v1, v2)
    assert set(ch.columns) >= {"url", "warc_ts", "__lsn", "__op"}
    lsns = [r["__lsn"] for r in ch.select("__lsn").collect()]
    assert lsns and all(lsn >= 300 for lsn in lsns)
    ops = {r["__op"] for r in ch.select("__op").distinct().collect()}
    assert "D" in ops or "U" in ops or "I" in ops
    # full-range changes cover both epochs
    assert table.scan_changes(v0, v2).count() == table.scan_changes(v0, v1).count() + ch.count()
    feed.unpersist()


def test_scan_changes_excludes_compaction_rewrites(spark, tmp_table_dir):
    feed = generate_feed(spark, FeedConfig(n_events=400, n_urls=40, seed=43)).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig(merge_mode="mor", transform=False, compact_every=0)
    apply_epoch(spark, feed.filter(F.col("lsn") < 200), 0, table, cfg)
    v1 = table.current_version()
    apply_epoch(spark, feed.filter(F.col("lsn") >= 200), 1, table, cfg)
    n_changes_before = table.scan_changes(v1).count()
    table.compact()
    v3 = table.current_version()
    # compaction rewrote everything, but the changelog since v1 must still
    # be only epoch 1's writes, not the rewritten base
    assert table.scan_changes(v1, v3).count() == n_changes_before
    feed.unpersist()


def test_changed_rows_hint_matches_scan_changes(spark, tmp_table_dir):
    """changed_rows_hint (O(metadata), zero jobs) equals the actual
    scan_changes row count — it sums the same file entries' recorded
    stats — and survives compaction the same way the changelog does."""
    feed = generate_feed(spark, FeedConfig(n_events=400, n_urls=40, seed=47)).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig(merge_mode="mor", transform=False, compact_every=0)
    v0 = table.current_version()
    apply_epoch(spark, feed.filter(F.col("lsn") < 200), 0, table, cfg)
    v1 = table.current_version()
    apply_epoch(spark, feed.filter(F.col("lsn") >= 200), 1, table, cfg)
    v2 = table.current_version()
    assert table.changed_rows_hint(v1, v2) == table.scan_changes(v1, v2).count()
    assert table.changed_rows_hint(v0, v2) == table.scan_changes(v0, v2).count()
    table.compact()
    v3 = table.current_version()
    assert table.changed_rows_hint(v1, v3) == table.scan_changes(v1, v3).count()
    # empty range → 0, not None
    assert table.changed_rows_hint(v2, v2) == 0
    feed.unpersist()


# --- property-based LWW ---------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key id
        st.integers(min_value=0, max_value=1),   # version
        st.text(alphabet="abcxyz", min_size=0, max_size=4),  # payload
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None)
@given(events_strategy)
def test_lww_property_matches_python(spark_global, events):
    """For arbitrary event lists (unique LSN = list index), Spark LWW ==
    Python dict replay, for both the plain and salted implementations."""
    spark = spark_global
    rows = [(f"k{k}", f"v{v}", i, p) for i, (k, v, p) in enumerate(events)]
    df = spark.createDataFrame(rows, "url string, warc_ts string, lsn long, val string")
    want = {}
    for url, warc, lsn, val in rows:  # already in lsn order
        want[(url, warc)] = (lsn, val)
    got = {
        (r["url"], r["warc_ts"]): (r["lsn"], r["val"])
        for r in lww_dedup(df, ["url", "warc_ts"]).collect()
    }
    assert got == want
    got_salted = {
        (r["url"], r["warc_ts"]): (r["lsn"], r["val"])
        for r in salted_lww_dedup(df, ["url", "warc_ts"], n_salts=3).collect()
    }
    assert got_salted == want


# session-scoped fixture alias usable inside @given (function-scoped
# fixtures don't mix with hypothesis)
import pytest


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
