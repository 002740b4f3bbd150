"""Prometheus exposition rendering (clever-canal-prometheus analog).

The reference's collectors (impl/EntryCollector.java:32-33,
impl/StoreCollector.java:33-43) expose consume counters and store
put/ack gauges to a scraper. Here the same numbers live in the
epoch-metrics LakeTable + the follower's lag() dict; render_metrics
turns both into the text/plain;version=0.0.4 format. Expected values
are hand-computed from the rows we insert — the renderer is driver-side
string work, so the test is exact."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.gen import FeedConfig, generate_feed
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import EPOCH_METRICS_SCHEMA, PAGE_SCHEMA
from clever_canal_spark.plans.apply import ApplyConfig
from clever_canal_spark.sources import write_feed_slices
from clever_canal_spark.streaming import CdcPipeline
from clever_canal_spark.streaming.prometheus import render_metrics


def _parse(body: str) -> dict:
    """exposition text -> {metric_name_with_labels: float}"""
    out = {}
    for line in body.strip().splitlines():
        if line.startswith("#"):
            continue
        name, val = line.rsplit(" ", 1)
        out[name] = float(val)
    return out


def test_render_from_pipeline_metrics(spark, tmp_table_dir):
    src_dir = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=400, n_urls=30, seed=5)
    feed = generate_feed(spark, cfgf)
    write_feed_slices(feed, src_dir, n_slices=2, n_events=cfgf.n_events)

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    metrics = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "metrics"), EPOCH_METRICS_SCHEMA,
        merge_key=["epoch_id"], n_buckets=2,
    )
    CdcPipeline(
        spark, src_dir, os.path.join(tmp_table_dir, "ckpt"), table,
        ApplyConfig(), metrics_table=metrics, max_files_per_trigger=1,
    ).run_until_drained()

    body = render_metrics(metrics, labels={"destination": "pages"})
    vals = _parse(body)
    lab = '{destination="pages"}'

    # counters aggregate over every epoch row — cross-check vs the table
    mrows = metrics.scan().collect()
    assert vals[f"ccs_events_total{lab}"] == sum(r["n_events"] for r in mrows) == 400
    assert vals[f"ccs_rows_total{lab}"] == sum(r["n_rows"] for r in mrows)
    assert vals[f"ccs_upserts_total{lab}"] == sum(r["n_upserts"] for r in mrows)
    assert vals[f"ccs_deletes_total{lab}"] == sum(r["n_deletes"] for r in mrows)
    assert vals[f"ccs_epochs_total{lab}"] == 2
    last = max(mrows, key=lambda r: r["epoch_id"])
    assert vals[f"ccs_last_epoch_id{lab}"] == last["epoch_id"]
    assert vals[f"ccs_last_epoch_events{lab}"] == last["n_events"]
    assert vals[f"ccs_applied_lsn{lab}"] == last["lsn_max"]
    assert vals[f"ccs_snapshot_version{lab}"] == last["snapshot_version"]

    # exposition hygiene: HELP/TYPE precede every sample, counters end _total
    lines = body.splitlines()
    for i, line in enumerate(lines):
        if line.startswith("# TYPE"):
            _, _, name, typ = line.split(" ")
            assert lines[i - 1].startswith(f"# HELP {name} ")
            assert lines[i + 1].startswith(name)
            if typ == "counter":
                assert name.endswith("_total")
    feed.unpersist()


def test_render_lag_gauges(spark, tmp_table_dir):
    """Follower lag() plugs in as the put-minus-ack gauge set."""
    from clever_canal_spark.streaming import FeedFollower

    src_dir = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=300, n_urls=20, seed=7)
    feed = generate_feed(spark, cfgf)
    write_feed_slices(feed, src_dir, n_slices=3, n_events=cfgf.n_events)
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    metrics = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "metrics"), EPOCH_METRICS_SCHEMA,
        merge_key=["epoch_id"], n_buckets=2,
    )
    # hold back two of the three slices so the feed head outruns the ack
    import glob
    import shutil

    hold = os.path.join(tmp_table_dir, "hold")
    os.makedirs(hold)
    held = sorted(glob.glob(os.path.join(src_dir, "*.parquet")))[1:]
    for p in held:
        shutil.move(p, os.path.join(hold, os.path.basename(p)))
    fol = FeedFollower(
        spark, src_dir, os.path.join(tmp_table_dir, "ckpt"), table,
        ApplyConfig(), metrics_table=metrics,
    )
    fol.run_available()  # consumes the one visible slice
    for p in held:
        shutil.move(os.path.join(hold, os.path.basename(p)), p)

    vals = _parse(render_metrics(metrics, lag=fol.lag()))
    head = feed.agg(F.max("lsn")).collect()[0][0]
    assert vals["ccs_feed_head_lsn"] == head
    assert vals["ccs_lag_events"] == 200  # two slices of 100 unconsumed
    assert vals["ccs_pending_files"] == 2
    feed.unpersist()


def test_render_hotkey_metrics_from_rollup(spark, tmp_table_dir):
    """Top-k hot-group gauges off a changelog rollup view: exact values
    (hand-computed from the merged change rows), deterministic tie order,
    label-value escaping for data-derived group names."""
    from pyspark.sql import types as T

    from clever_canal_spark.lake import LakeTable, create_rollup, sync_rollup
    from clever_canal_spark.streaming import render_hotkey_metrics

    schema = T.StructType([
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), schema,
        merge_key=["url"], n_buckets=4,
    )
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v"), "url", n_buckets=4)
    rows = [
        ("hot", "a", "I", 1), ("hot", "b", "U", 2), ("hot", None, "D", 3),
        ('q"\\ote', "c", "I", 4),
        ("cold", "d", "I", 5),
    ]
    t.merge(
        spark.createDataFrame(rows, "url string, text string, op string, lsn bigint"),
        epoch_id=0, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_rollup(view, t) >= 1

    body = render_hotkey_metrics(view, top_k=2, labels={"destination": "pages"})
    lines = [l for l in body.splitlines() if not l.startswith("#")]

    # consumed-version gauge rides the registry (== source lake version)
    assert lines[0] == (
        f'ccs_rollup_consumed_version{{destination="pages"}} {t.current_version()}'
    )
    # top-2 by n_changes: "hot" (3 rows) then the tie broken by group
    # name — "cold" < 'q"\ote' lexicographically
    assert 'ccs_hotkey_changes{destination="pages",url="hot"} 3' in lines
    assert 'ccs_hotkey_changes{destination="pages",url="cold"} 1' in lines
    # quote/backslash in a data-derived label value must be escaped out
    assert all('q"' not in l for l in lines)
    assert 'ccs_hotkey_deletes{destination="pages",url="hot"} 1' in lines
    assert 'ccs_hotkey_last_lsn{destination="pages",url="hot"} 3' in lines
    # top_k honored: exactly 2 sample lines per hotkey gauge
    assert sum(l.startswith("ccs_hotkey_changes{") for l in lines) == 2


def test_hotkey_static_label_collision_rejected(spark, tmp_table_dir):
    import pytest as _pytest
    from pyspark.sql import types as T

    from clever_canal_spark.lake import LakeTable, create_rollup, sync_rollup
    from clever_canal_spark.streaming import render_hotkey_metrics

    view = create_rollup(spark, os.path.join(tmp_table_dir, "vc"), "url",
                         n_buckets=2)
    with _pytest.raises(ValueError, match="collides"):
        render_hotkey_metrics(view, labels={"url": "static"})


def test_render_sketch_metrics(spark, tmp_table_dir):
    """HLL + histogram view gauges in one scrape body: consumed-version
    gauges, per-group estimates, quantile upper brackets; deterministic
    ordering; static-label collision rejected."""
    import os

    import pytest
    from pyspark.sql import functions as F, types as T

    from clever_canal_spark.lake import (
        LakeTable, create_hist_view, create_hll_view,
        sync_hist_view, sync_hll_view,
    )
    from clever_canal_spark.streaming import render_sketch_metrics

    schema = T.StructType([
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(spark, os.path.join(tmp_table_dir, "src"), schema,
                         merge_key=["url"], n_buckets=4)
    rows = [(f"d{i % 2}/p{i}", "x" * (i + 1), "I", i + 1) for i in range(20)]
    t.merge(spark.createDataFrame(rows, "url string, text string, op string, lsn bigint"),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    domain = F.split(F.col("url"), "/").getItem(0)
    hll = create_hll_view(spark, os.path.join(tmp_table_dir, "h"), "domain", b=4)
    hist = create_hist_view(spark, os.path.join(tmp_table_dir, "g"), "domain")
    sync_hll_view(hll, t, item_expr=F.col("url"), group_expr=domain)
    sync_hist_view(hist, t, value_expr=F.length("text"), group_expr=domain)

    body = render_sketch_metrics(hll_view=hll, hist_view=hist,
                                 labels={"destination": "pages"})
    assert 'ccs_hll_distinct{destination="pages",domain="d0"}' in body
    assert 'ccs_hist_q990_hi{destination="pages",domain="d1"}' in body
    assert f"ccs_hll_consumed_version{{destination=\"pages\"}} {t.current_version()}" in body
    # byte-identical on re-render (fresh objects)
    body2 = render_sketch_metrics(
        hll_view=LakeTable(spark, os.path.join(tmp_table_dir, "h")),
        hist_view=LakeTable(spark, os.path.join(tmp_table_dir, "g")),
        labels={"destination": "pages"},
    )
    assert body2 == body
    with pytest.raises(ValueError):
        render_sketch_metrics(hll_view=hll, labels={"domain": "x"})


def test_consumer_metrics_render(spark, tmp_table_dir):
    """Zero-job per-subscriber lag gauges: acked cursor + versions
    behind per client; byte-stable across renders."""
    from pyspark.sql import types as T

    from clever_canal_spark.lake import Consumer, LakeTable
    from clever_canal_spark.streaming import render_consumer_metrics

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url"], n_buckets=2)
    t.merge(
        spark.createDataFrame([("u1", 1, "I", 1)],
                              "url string, n long, op string, lsn long"),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    a = Consumer(t, "dash", start_after=0)
    b = Consumer(t, "etl", start_after=0)
    batch = a.get_without_ack()
    a.ack(batch.batch_id)
    t.merge(
        spark.createDataFrame([("u2", 2, "I", 2)],
                              "url string, n long, op string, lsn long"),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    body = render_consumer_metrics(t)
    head = t.current_version()
    assert f'ccs_consumer_table_version {head}' in body
    assert 'ccs_consumer_acked_version{client="dash"}' in body
    assert 'ccs_consumer_versions_behind{client="etl"} ' in body
    dash_behind = [l for l in body.splitlines()
                   if l.startswith('ccs_consumer_versions_behind{client="dash"}')]
    etl_behind = [l for l in body.splitlines()
                  if l.startswith('ccs_consumer_versions_behind{client="etl"}')]
    assert int(dash_behind[0].split()[-1]) < int(etl_behind[0].split()[-1])
    assert render_consumer_metrics(t) == body
