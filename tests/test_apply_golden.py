"""Golden replay: Spark apply pipeline vs the single-threaded Python
reference apply (the Canal-client-semantics oracle) — final table state must
match row-for-row, including byte-identical extracted text per url
(north-rule invariant)."""

from pyspark.sql import functions as F

from clever_canal_spark.functions.transforms import extract_text_from_html, tag_language
from clever_canal_spark.gen import FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig, apply_epoch


def _final_state(table):
    return {
        (r["url"], str(r["warc_ts"])): (bytes(r["html"]) if r["html"] is not None else None,
                                        r["text"], r["lang"])
        for r in table.scan().collect()
    }


def _oracle_state(feed_rows):
    state = reference_apply(feed_rows)
    out = {}
    for (url, warc_ts), img in state.items():
        html = bytes(img["html"])
        text = extract_text_from_html(html)
        out[(url, str(warc_ts))] = (html, text, tag_language(text))
    return out


def run_replay(spark, tmp_dir, cfg_feed, cfg_apply, n_epochs=4):
    feed = generate_feed(spark, cfg_feed).cache()
    table = LakeTable.create(
        spark, tmp_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=8
    )
    epoch_size = cfg_feed.n_events // n_epochs + 1
    for e in range(n_epochs):
        batch = feed.filter(
            (F.col("lsn") >= e * epoch_size) & (F.col("lsn") < (e + 1) * epoch_size)
        )
        apply_epoch(spark, batch, e, table, cfg_apply)
    rows = feed.collect()
    feed.unpersist()
    return _final_state(table), _oracle_state(rows)


def test_golden_replay_small(spark, tmp_table_dir):
    got, want = run_replay(
        spark,
        tmp_table_dir,
        FeedConfig(n_events=2_000, n_urls=150, versions_per_url=2, seed=42),
        ApplyConfig(),
    )
    assert got == want
    assert len(got) > 50


def test_golden_replay_salted_identical(spark, tmp_table_dir):
    got, want = run_replay(
        spark,
        tmp_table_dir,
        FeedConfig(n_events=2_000, n_urls=50, versions_per_url=2, zipf_s=5.0, seed=7),
        ApplyConfig(dedup_strategy="max_by", salted=True, n_salts=8),
    )
    assert got == want


def test_epoch_replay_idempotent(spark, tmp_table_dir):
    cfgf = FeedConfig(n_events=500, n_urls=40, seed=11)
    feed = generate_feed(spark, cfgf).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig()
    b0 = feed.filter(F.col("lsn") < 250)
    b1 = feed.filter(F.col("lsn") >= 250)
    apply_epoch(spark, b0, 0, table, cfg)
    apply_epoch(spark, b0, 0, table, cfg)  # replay same epoch
    v = table.current_version()
    apply_epoch(spark, b0, 0, table, cfg)
    assert table.current_version() == v  # no new snapshot
    apply_epoch(spark, b1, 1, table, cfg)
    got = _final_state(table)
    want = _oracle_state(feed.collect())
    feed.unpersist()
    assert got == want


def test_golden_replay_mor_with_compaction(spark, tmp_table_dir):
    """Merge-on-read apply (delta files + LWW reconcile at scan) with a
    forced compaction mid-stream must equal the oracle exactly."""
    got, want = run_replay(
        spark,
        tmp_table_dir,
        FeedConfig(n_events=2_000, n_urls=150, versions_per_url=2, seed=42),
        ApplyConfig(merge_mode="mor", compact_every=3),
        n_epochs=4,
    )
    assert got == want


def test_mor_time_travel_and_idempotence(spark, tmp_table_dir):
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.plans import apply_epoch

    feed = generate_feed(spark, FeedConfig(n_events=400, n_urls=40, seed=13)).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig(merge_mode="mor", compact_every=0)  # no auto-compact
    b0 = feed.filter(F.col("lsn") < 200)
    b1 = feed.filter(F.col("lsn") >= 200)
    apply_epoch(spark, b0, 0, table, cfg)
    v_mid = table.current_version()
    state_mid = {(r["url"], str(r["warc_ts"])) for r in table.scan().collect()}
    apply_epoch(spark, b1, 1, table, cfg)
    apply_epoch(spark, b1, 1, table, cfg)  # replay — must not duplicate deltas
    assert {(r["url"], str(r["warc_ts"])) for r in table.scan(version=v_mid).collect()} == state_mid
    # explicit compaction preserves state
    before = _final_state(table)
    table.compact()
    assert table.snapshot().delta_files == []
    assert _final_state(table) == before
    feed.unpersist()


def test_golden_replay_deferred_dedup(spark, tmp_table_dir):
    """dedup_strategy='defer': every event lands as a delta row; the MOR
    scan LWW must still produce exactly the oracle state."""
    got, want = run_replay(
        spark,
        tmp_table_dir,
        FeedConfig(n_events=2_000, n_urls=120, versions_per_url=2, seed=99),
        ApplyConfig(merge_mode="mor", dedup_strategy="defer", compact_every=3),
        n_epochs=4,
    )
    assert got == want


def test_defer_requires_mor(spark, tmp_table_dir):
    import pytest

    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.plans import apply_epoch

    feed = generate_feed(spark, FeedConfig(n_events=50, n_urls=10, seed=1))
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    with pytest.raises(ValueError, match="defer"):
        apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="cow", dedup_strategy="defer"))


def test_bootstrap_then_tail(spark, tmp_table_dir):
    """Snapshot-then-tail: seed at as_of_lsn, then replay a feed straddling
    it — pre-snapshot events lose to the seed, post-snapshot events win;
    bootstrap replays idempotently."""
    from pyspark.sql import functions as F

    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans import ApplyConfig, apply_epoch
    from clever_canal_spark.plans.apply import bootstrap_epoch

    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    snap = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", None, "seed1", "en"),
         ("u2", "2024-01-01 00:00:00", None, "seed2", "en")],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    r = bootstrap_epoch(table, snap, as_of_lsn=100)
    assert r.applied and r.versions
    r2 = bootstrap_epoch(table, snap, as_of_lsn=100)
    assert not r2.versions  # idempotent replay

    def ev(lsn, url, text):
        img = F.struct(
            F.lit(url).alias("url"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(text).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        return (
            spark.range(1)
            .select(
                F.lit(lsn).cast("long").alias("lsn"),
                F.current_timestamp().alias("ts"),
                F.lit("ROW").alias("kind"),
                F.lit("cc").alias("schema_name"),
                F.lit("pages").alias("table_name"),
                F.lit("U").alias("op"),
                F.lit(0).cast("long").alias("txn_id"),
                F.lit(1).cast("long").alias("server_id"),
                F.lit(None).cast("string").alias("gtid"),
                img.alias("before"),
                img.alias("after"),
                F.lit(None).cast("string").alias("ddl_type"),
                F.lit(None).cast("string").alias("ddl_sql"),
                F.lit(None).cast("string").alias("ddl_column"),
                F.lit(None).cast("string").alias("ddl_new_name"),
                F.lit(None).cast("string").alias("ddl_new_type"),
                F.lit(None).cast("map<string,string>").alias("props"),
            )
        )

    # lsn=50 (pre-snapshot, already reflected) must LOSE; lsn=150 must WIN
    feed = ev(50, "u1", "stale-update").unionByName(ev(150, "u2", "fresh-update"))
    apply_epoch(spark, feed, 1, table, ApplyConfig(transform=False, merge_mode="mor"))
    state = {r["url"]: r["text"] for r in table.scan().collect()}
    assert state == {"u1": "seed1", "u2": "fresh-update"}
