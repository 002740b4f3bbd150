"""Footer-hints fast path: parquet-metadata epoch facts (zero Spark jobs),
the observe()-based single-pass apply, bytes-mode epoch admission, and the
winner-join broadcast auto-guard."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.filters import EventFilterConfig, apply_event_filters
from clever_canal_spark.gen import DdlSpec, FeedConfig, generate_feed
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import CHANGE_EVENT_SCHEMA, EPOCH_METRICS_SCHEMA, PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.plans.apply import _dedup_flatten, _effective_strategy, apply_epoch
from clever_canal_spark.streaming import FeedFollower
from clever_canal_spark.streaming.follower import footer_hints


def _feed(spark, d, n=2000, ddls=(), n_files=4):
    cfg = FeedConfig(n_events=n, n_urls=100, seed=9, ddls=list(ddls))
    generate_feed(spark, cfg).repartition(n_files).write.mode("overwrite").parquet(d)
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def test_footer_hints_no_ddl(spark, tmp_table_dir):
    files = _feed(spark, f"{tmp_table_dir}/feed", n=2000)
    h = footer_hints(files)
    assert h.n_events == 2000
    assert h.ddl_possible is False
    assert h.lsn_min == 0 and h.lsn_max == 1999


def test_footer_hints_detects_ddl(spark, tmp_table_dir):
    files = _feed(
        spark, f"{tmp_table_dir}/feed", n=2000,
        ddls=[DdlSpec(lsn=500, column="rank", new_type="bigint")],
    )
    h = footer_hints(files)
    assert h.ddl_possible is not False  # True (or unknown) — never a false negative


def test_fast_path_matches_slow_path(spark, tmp_table_dir):
    """Same feed applied via the hints fast path and the conservative path
    must produce identical table state AND an equivalent metrics row."""
    files = _feed(spark, f"{tmp_table_dir}/feed", n=3000)
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(*files)
    cfg = ApplyConfig(merge_mode="mor")

    results = {}
    for label, hints in (("slow", None), ("fast", footer_hints(files))):
        t = LakeTable.create(
            spark, f"{tmp_table_dir}/t-{label}", PAGE_SCHEMA,
            merge_key=["url", "warc_ts"], n_buckets=4,
        )
        m = LakeTable.create(
            spark, f"{tmp_table_dir}/m-{label}", EPOCH_METRICS_SCHEMA,
            merge_key=["epoch_id"], n_buckets=1,
        )
        res = apply_epoch(spark, batch, 0, t, cfg, metrics_table=m, hints=hints)
        assert res.applied
        rows = {(r["url"], str(r["warc_ts"]), r["text"]) for r in t.scan().collect()}
        mrow = m.scan().collect()[0]
        results[label] = (rows, {
            k: mrow[k] for k in ("n_events", "n_rows", "n_upserts", "n_deletes",
                                 "n_ddl", "n_heartbeats", "lsn_min", "lsn_max")
        })
        # lineage recorded in the epoch registry too
        lin = t.committed_epochs()["0"]
        assert lin["n_events"] == 3000

    assert results["slow"][0] == results["fast"][0]
    assert results["slow"][1] == results["fast"][1]


def test_fast_path_replay_idempotent(spark, tmp_table_dir):
    files = _feed(spark, f"{tmp_table_dir}/feed", n=1000)
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(*files)
    t = LakeTable.create(
        spark, f"{tmp_table_dir}/t", PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    cfg = ApplyConfig(merge_mode="mor")
    r1 = apply_epoch(spark, batch, 0, t, cfg, hints=footer_hints(files))
    v1 = t.current_version()
    r2 = apply_epoch(spark, batch, 0, t, cfg, hints=footer_hints(files))
    assert r1.applied and not r2.applied
    assert t.current_version() == v1


def test_bytes_mode_epoch_cuts(spark, tmp_table_dir):
    files = _feed(spark, f"{tmp_table_dir}/feed", n=4000, n_files=8)
    sizes = [os.path.getsize(p) for p in files]
    t = LakeTable.create(
        spark, f"{tmp_table_dir}/t", PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    f = FeedFollower(
        spark, f"{tmp_table_dir}/feed", f"{tmp_table_dir}/ckpt", t,
        ApplyConfig(merge_mode="mor"),
        max_files_per_epoch=100, max_bytes_per_epoch=int(sum(sizes) / 3),
    )
    groups = f._cut_epochs(files)
    assert len(groups) >= 3
    assert [p for g in groups for p in g] == files  # order + completeness
    budget = f.max_bytes_per_epoch
    for g in groups:
        # each group fits the budget unless it is a single over-budget file
        assert len(g) == 1 or sum(os.path.getsize(p) for p in g) <= budget


def test_broadcast_guard_falls_back_to_salted(spark, tmp_table_dir):
    """Over-limit epochs must plan NO BroadcastHashJoin (salted max_by)."""
    cfg = ApplyConfig(transform=False, broadcast_winner_limit=100)
    strategy, salted = _effective_strategy(cfg, n_row_events=1000)
    assert (strategy, salted) == ("max_by", True)
    d = f"{tmp_table_dir}/feed"
    generate_feed(spark, FeedConfig(n_events=500, n_urls=50, seed=5)).write.mode(
        "overwrite"
    ).parquet(d)
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(d)
    rows = apply_event_filters(batch, EventFilterConfig()).filter(F.col("kind") == "ROW")
    src = _dedup_flatten(rows, cfg, strategy=strategy, salted=salted)
    jvm = spark._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        src._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" not in plan
    # under the limit the broadcast winner-join remains
    strategy2, _ = _effective_strategy(cfg, n_row_events=50)
    assert strategy2 == "winner_join"


def test_winner_join_keeps_duplicate_lsn_keys(spark):
    """Two keys sharing one LSN (one event, several rowdata — the
    reference's RowChange model): the key+lsn semi-join must keep both
    winners; an lsn-only join would pass non-winner rows through."""
    from clever_canal_spark.gen import FeedConfig as _FC  # noqa: F401 (style parity)
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    page = lambda u, txt: {"url": u, "warc_ts": ts, "html": None, "text": txt, "lang": None}
    rows = [
        # key A: two versions, winner lsn=7
        dict(lsn=5, kind="ROW", op="U", after=page("A", "a-old"), before=None),
        dict(lsn=7, kind="ROW", op="U", after=page("A", "a-new"), before=None),
        # key B shares lsn=5 with A's LOSER — must still win for B
        dict(lsn=5, kind="ROW", op="U", after=page("B", "b-only"), before=None),
    ]
    full = [
        {**{f.name: None for f in CHANGE_EVENT_SCHEMA.fields}, **r} for r in rows
    ]
    df = spark.createDataFrame(full, CHANGE_EVENT_SCHEMA)
    out = _dedup_flatten(df, ApplyConfig(transform=False), strategy="winner_join")
    got = {(r["url"], r["text"], r["lsn"]) for r in out.collect()}
    assert got == {("A", "a-new", 7), ("B", "b-only", 5)}


def test_lag_and_throughput_view(spark, tmp_table_dir):
    """Consumer-lag gauge (footer arithmetic, no jobs) + throughput view."""
    from clever_canal_spark.streaming import throughput_view

    _feed(spark, f"{tmp_table_dir}/feed", n=3000, n_files=6)
    t = LakeTable.create(
        spark, f"{tmp_table_dir}/t", PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    m = LakeTable.create(
        spark, f"{tmp_table_dir}/m", EPOCH_METRICS_SCHEMA, merge_key=["epoch_id"], n_buckets=1
    )
    f = FeedFollower(
        spark, f"{tmp_table_dir}/feed", f"{tmp_table_dir}/ckpt", t,
        ApplyConfig(merge_mode="mor"), metrics_table=m, max_files_per_epoch=2,
    )
    lag0 = f.lag()
    assert lag0["pending_files"] == 6 and lag0["pending_events"] == 3000
    assert lag0["applied_lsn_max"] is None
    f.run_available()
    lag1 = f.lag()
    assert lag1["pending_files"] == 0 and lag1["pending_events"] == 0
    assert lag1["applied_lsn_max"] == lag1["feed_head_lsn"] == 2999
    tv = {r["epoch_id"]: r for r in throughput_view(m).collect()}
    assert len(tv) == 3
    assert all(r["events_per_sec"] > 0 for r in tv.values())
    assert tv[2]["cum_events_per_sec"] > 0
