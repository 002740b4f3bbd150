"""Changelog-maintained link graph (operators/graph_index.py):
incremental edge maintenance == from-scratch rebuild, exactly-once
replay, multi-version urls, truncate mirroring, fresh-process reopen."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.operators.graph import pagerank
from clever_canal_spark.operators.graph_index import (
    build_link_graph,
    link_graph_pagerank,
    open_link_graph,
    sync_link_graph_from_lake,
    _edges_of,
)

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def html_for(*targets):
    return "".join(f'<a href="{t}">x</a>' for t in targets).encode()


def mk_pages(spark, path):
    return LakeTable.create(
        spark, path, PAGES, merge_key=["url", "warc_ts"], n_buckets=4
    )


def apply_rows(table, rows, epoch, op="U"):
    """rows: [(url, ts_str, html_bytes_or_None)]"""
    spark = table.spark
    df = spark.createDataFrame(
        [(u, t, h) for u, t, h in rows],
        "url string, warc_ts string, html binary",
    ).select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"), "html",
        F.lit(op).alias("op"),
        (F.lit(epoch * 100) + F.monotonically_increasing_id() % 50)
        .cast("long").alias("lsn"),
    )
    table.merge(df, epoch_id=epoch, mode="mor", lsn_col="lsn")


def edge_set(lg):
    return {(r["src"], r["dst"]) for r in lg.edges.scan().collect()}


def rebuild_set(table, url_col="url", html_col="html"):
    return {
        (r["src"], r["dst"])
        for r in _edges_of(table.scan(), url_col, html_col, False).collect()
    }


@pytest.fixture()
def dirs():
    d1 = tempfile.mkdtemp(prefix="ccs-lgp-")
    d2 = tempfile.mkdtemp(prefix="ccs-lgi-")
    yield d1, d2
    shutil.rmtree(d1, ignore_errors=True)
    shutil.rmtree(d2, ignore_errors=True)


def test_bootstrap_then_incremental_equals_rebuild(spark, dirs):
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [
        ("http://a/1", "2024-01-01 00:00:00", html_for("http://b/1", "http://b/2")),
        ("http://a/2", "2024-01-01 00:00:00", html_for("http://a/1")),
    ], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    assert edge_set(lg) == {
        ("http://a/1", "http://b/1"),
        ("http://a/1", "http://b/2"),
        ("http://a/2", "http://a/1"),
    }
    assert sync_link_graph_from_lake(lg, t) == 0  # already current

    # update a/1 (edge b/2 -> c/9: one kept, one stale, one new),
    # insert a/3, leave a/2 untouched
    apply_rows(t, [
        ("http://a/1", "2024-01-01 00:00:00", html_for("http://b/1", "http://c/9")),
        ("http://a/3", "2024-01-01 00:00:00", html_for("http://b/1")),
    ], epoch=1)
    assert sync_link_graph_from_lake(lg, t) > 0
    assert edge_set(lg) == rebuild_set(t) == {
        ("http://a/1", "http://b/1"),
        ("http://a/1", "http://c/9"),
        ("http://a/2", "http://a/1"),
        ("http://a/3", "http://b/1"),
    }


def test_delete_drops_all_edges_of_the_page(spark, dirs):
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [
        ("http://a/1", "2024-01-01 00:00:00", html_for("http://b/1")),
        ("http://a/2", "2024-01-01 00:00:00", html_for("http://b/1")),
    ], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    apply_rows(t, [("http://a/1", "2024-01-01 00:00:00", None)], epoch=1, op="D")
    sync_link_graph_from_lake(lg, t)
    assert edge_set(lg) == {("http://a/2", "http://b/1")} == rebuild_set(t)


def test_multi_version_url_keeps_sibling_edges(spark, dirs):
    """The page key is (url, warc_ts): when one version of a url changes,
    the untouched sibling's edges must survive the per-url recompute."""
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [
        ("http://a/1", "2024-01-01 00:00:00", html_for("http://old/1")),
        ("http://a/1", "2024-06-01 00:00:00", html_for("http://new/1")),
    ], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    # change only the June version
    apply_rows(t, [
        ("http://a/1", "2024-06-01 00:00:00", html_for("http://new/2")),
    ], epoch=1)
    sync_link_graph_from_lake(lg, t)
    assert edge_set(lg) == {
        ("http://a/1", "http://old/1"),  # sibling row untouched
        ("http://a/1", "http://new/2"),
    } == rebuild_set(t)


def test_replay_and_lost_cursor_are_idempotent(spark, dirs):
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [("http://a/1", "2024-01-01 00:00:00", html_for("http://b/1"))], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    apply_rows(t, [("http://a/1", "2024-01-01 00:00:00", html_for("http://b/2"))], epoch=1)
    sync_link_graph_from_lake(lg, t)
    before = edge_set(lg)
    v = lg.edges.current_version()
    # crash AFTER merge but BEFORE cursor write: rewind the cursor
    from clever_canal_spark.operators._cursor import write_lake_cursor
    write_lake_cursor(gd, 2)
    sync_link_graph_from_lake(lg, t)
    assert edge_set(lg) == before
    assert lg.edges.current_version() == v  # epoch-keyed merge no-opped


def test_truncate_mirrors_as_metadata(spark, dirs):
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [("http://a/1", "2024-01-01 00:00:00", html_for("http://b/1"))], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    t.truncate_rows(lsn=10_000)
    sync_link_graph_from_lake(lg, t)
    assert edge_set(lg) == set()
    # post-truncate inserts land normally (lsn above the watermark)
    apply_rows(t, [("http://a/9", "2024-01-01 00:00:00", html_for("http://b/9"))],
               epoch=200)
    sync_link_graph_from_lake(lg, t)
    assert edge_set(lg) == {("http://a/9", "http://b/9")}


def test_fresh_process_reopen_and_pagerank(spark, dirs):
    pd, gd = dirs
    t = mk_pages(spark, pd)
    apply_rows(t, [
        ("http://a/1", "2024-01-01 00:00:00", html_for("http://a/2")),
        ("http://a/2", "2024-01-01 00:00:00", html_for("http://a/1", "http://a/3")),
        ("http://a/3", "2024-01-01 00:00:00", html_for("http://a/1")),
    ], epoch=0)
    lg = build_link_graph(t, gd, n_buckets=4)
    reopened = open_link_graph(spark, gd)
    assert reopened.url_col == "url" and reopened.html_col == "html"
    assert sync_link_graph_from_lake(reopened, t) == 0
    got = {r["node"]: r["rank_e12"]
           for r in link_graph_pagerank(reopened, n_iter=3).collect()}
    batch = {r["node"]: r["rank_e12"]
             for r in pagerank(reopened.edges.scan(), n_iter=3).collect()}
    assert got == batch and len(got) == 3
