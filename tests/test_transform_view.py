"""Materialized transform view (lake/transform_view.py): incremental
state == from-scratch recompute after every wave, filter exits
tombstone, out-of-order source events converge (version-domain
ordinal), truncates mirror, replays no-op, fresh-process reopen, exact
reseed after retention expiry."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    SnapshotExpired,
    create_transform_view,
    open_transform_view,
    reseed_transform_view,
    sync_transform_view,
    transform_view_cursor,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

EXPRS = {
    "n_chars": "CAST(length(text) AS INT)",
    "head": "upper(substr(text, 1, 4))",
}


@pytest.fixture()
def dirs():
    d = [tempfile.mkdtemp(prefix=f"ccs-tv-{i}-") for i in range(3)]
    yield d
    for p in d:
        shutil.rmtree(p, ignore_errors=True)


def mk(spark, path):
    return LakeTable.create(spark, path, SCHEMA, merge_key=["url"], n_buckets=4)


def wave(spark, rows):
    return spark.createDataFrame(
        rows, "url string, text string, lang string, op string, lsn long"
    )


def recompute(source, row_filter=None):
    live = source.scan()
    if row_filter:
        live = live.filter(row_filter)
    return live.select(
        "url", *[F.expr(e).alias(n) for n, e in EXPRS.items()]
    )


def assert_view_exact(view, source, row_filter=None):
    a, b = view.scan(), recompute(source, row_filter)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_equals_recompute(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(
        wave(spark, [(f"u{i}", f"body {i}", "en", "U", i + 1) for i in range(10)]),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    view = create_transform_view(src, dirs[1], EXPRS)
    assert_view_exact(view, src)
    src.merge(
        wave(spark, [("u3", "rewritten page three", "en", "U", 100),
                     ("u5", None, None, "D", 101),
                     ("u77", "fresh", "de", "U", 102)]),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    assert sync_transform_view(view, src) > 0
    assert_view_exact(view, src)
    assert view.scan().filter("url = 'u3'").collect()[0]["head"] == "REWR"
    assert view.scan().filter("url = 'u5'").count() == 0
    assert sync_transform_view(view, src) == 0  # replay


def test_filter_exit_tombstones(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [("u1", "t1", "en", "U", 1), ("u2", "t2", "de", "U", 2)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS, row_filter="lang = 'en'")
    assert {r["url"] for r in view.scan().collect()} == {"u1"}
    src.merge(wave(spark, [("u1", "t1", "fr", "U", 10),   # exits predicate
                           ("u2", "t2", "en", "U", 11)]),  # enters it
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_transform_view(view, src)
    assert {r["url"] for r in view.scan().collect()} == {"u2"}
    assert_view_exact(view, src, "lang = 'en'")


def test_out_of_order_source_event_converges(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [("k", "new text", "en", "U", 20)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS)
    # a stale shard delivers lsn 10 in a LATER source epoch: the source
    # keeps 'new text'; the view must re-derive what the source decided,
    # not apply the raw stale event
    src.merge(wave(spark, [("k", "old text!", "en", "U", 10)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_transform_view(view, src)
    assert view.scan().collect()[0]["head"] == "NEW "
    assert_view_exact(view, src)


def test_truncate_mirrors(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [(f"u{i}", f"t{i}", "en", "U", i + 1) for i in range(5)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS)
    src.truncate_rows(1000)
    src.merge(wave(spark, [("w1", "after", "fr", "U", 2000)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    sync_transform_view(view, src)
    assert [r["url"] for r in view.scan().collect()] == ["w1"]
    assert_view_exact(view, src)


def test_fresh_reopen_and_cursor(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [("u1", "t1", "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    create_transform_view(src, dirs[1], EXPRS)
    view = open_transform_view(spark, dirs[1])
    assert transform_view_cursor(view) == src.current_version()
    assert sync_transform_view(view, src) == 0
    with pytest.raises(ValueError, match="not a transform view"):
        open_transform_view(spark, dirs[0])


def test_key_clash_rejected(spark, dirs):
    src = mk(spark, dirs[0])
    with pytest.raises(ValueError, match="re-derive key"):
        create_transform_view(src, dirs[1], {"url": "upper(url)"})


def test_exact_reseed_after_expiry(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [(f"u{i}", f"t{i}", "en", "U", i + 1) for i in range(6)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS)
    src.merge(wave(spark, [("u0", "changed", "en", "U", 100)]),
              epoch_id=1, mode="mor", lsn_col="lsn")
    src.merge(wave(spark, [("u1", None, None, "D", 101)]),
              epoch_id=2, mode="mor", lsn_col="lsn")
    src.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired):
        sync_transform_view(view, src)
    reseed_transform_view(view, src)
    assert_view_exact(view, src)
    # normal tailing resumes — and later updates still win (ordinal sanity)
    assert sync_transform_view(view, src) == 0
    src.merge(wave(spark, [("u0", "changed again", "en", "U", 200)]),
              epoch_id=3, mode="mor", lsn_col="lsn")
    sync_transform_view(view, src)
    assert view.scan().filter("url = 'u0'").collect()[0]["n_chars"] == 13
    assert_view_exact(view, src)


def test_cow_source_also_works(spark, dirs):
    # state-diff maintenance reads pinned states, never raw markers, so a
    # COW-with-LSN source (which re-emits co-bucketed rows into
    # scan_changes) must converge identically. COW WITHOUT lsn_col is NOT
    # changelog-consumable: its anti-join delete leaves no tombstone, so
    # scan_changes never names the deleted key (docstring-documented).
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [(f"u{i}", f"t{i}", "en", "U", i + 1) for i in range(8)]),
              epoch_id=0, mode="cow", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS)
    src.merge(wave(spark, [("u2", "changed body", "en", "U", 100),
                           ("u4", None, None, "D", 101)]),
              epoch_id=1, mode="cow", lsn_col="lsn")
    sync_transform_view(view, src)
    assert_view_exact(view, src)
    assert view.scan().filter("url = 'u4'").count() == 0


def test_bounded_catchup_in_chunks(spark, dirs):
    src = mk(spark, dirs[0])
    src.merge(wave(spark, [("u1", "t1", "en", "U", 1)]),
              epoch_id=0, mode="mor", lsn_col="lsn")
    view = create_transform_view(src, dirs[1], EXPRS)
    for i in range(1, 4):
        src.merge(wave(spark, [(f"w{i}", f"tw{i}", "en", "U", 100 + i)]),
                  epoch_id=i, mode="mor", lsn_col="lsn")
    mid = transform_view_cursor(view) + 2
    assert sync_transform_view(view, src, to_version=mid) == 2
    assert transform_view_cursor(view) == mid
    assert sync_transform_view(view, src) > 0
    assert_view_exact(view, src)
