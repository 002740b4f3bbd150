"""Exact GROUP-BY aggregate view (lake/agg_view.py): retraction-correct
MIN/MAX maintenance. Incremental state must equal a from-scratch
aggregate of the source's live rows after EVERY wave — the waves are
built to hit each maintenance path: non-extreme delete (additive fold,
no rescan), extreme delete (group re-derivation), update moving a key
between groups, all-rows-gone tombstone, null values, truncate mirror,
replay no-op, fresh-process reopen, retention-expiry reseed."""

import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.agg_view import (
    agg_view_cursor,
    create_agg_view,
    open_agg_view,
    reseed_agg_view,
    sync_agg_view,
)
from clever_canal_spark.lake.table import SnapshotExpired

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("lang", T.StringType()),
    T.StructField("size", T.LongType()),
])


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lang string, size long, op string, lsn bigint"
    )


def _mk_src(spark, tmp):
    return LakeTable.create(
        spark, os.path.join(tmp, "src"), SCHEMA, merge_key=["url"], n_buckets=4
    )


def _expected(source):
    """From-scratch aggregate of the live state — the view's contract."""
    return sorted(
        map(tuple,
            source.scan()
            .filter(F.col("lang").isNotNull())
            .groupBy(F.col("lang").alias("group_key"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("size").alias("n_vals"),
                F.sum("size").alias("sum_val"),
                F.min("size").alias("min_val"),
                F.max("size").alias("max_val"),
            )
            .collect())
    )


def _state(view):
    return sorted(map(tuple, view.scan().collect()))


def _apply(t, spark, rows, epoch):
    t.merge(_changes(spark, rows), epoch_id=epoch, op_col="op", mode="mor",
            lsn_col="lsn")


def test_every_maintenance_path_matches_rebuild(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [
        ("u1", "en", 10, "I", 1), ("u2", "en", 30, "I", 2),
        ("u3", "en", 20, "I", 3), ("u4", "de", 7, "I", 4),
        ("u5", "de", None, "I", 5),            # null value: counts a row only
    ], 1)
    view = create_agg_view(t, os.path.join(tmp_table_dir, "v"), "lang", "size")
    assert _state(view) == _expected(t)
    assert agg_view_cursor(view) == t.current_version()

    waves = [
        # non-extreme delete (u3=20 is neither min nor max of en) +
        # plain insert: the additive path
        [("u3", None, None, "D", 10), ("u6", "en", 25, "I", 11)],
        # extreme delete: u2=30 IS the en max -> group re-derivation
        [("u2", None, None, "D", 20)],
        # extreme delete at the MIN end: u1=10 is the en min
        [("u1", None, None, "D", 30)],
        # update moves a key between groups: u4 leaves de (its max),
        # enters en; de keeps only the null-value row
        [("u4", "en", 99, "U", 40)],
        # value update within a group, touching the min (25 -> 1)
        [("u6", "en", 1, "U", 50)],
        # whole-group removal: de's last row goes -> tombstone
        [("u5", None, None, "D", 60)],
        # group reappears after tombstone
        [("u7", "de", 5, "I", 70)],
    ]
    for i, rows in enumerate(waves):
        _apply(t, spark, rows, 100 + i)
        assert sync_agg_view(view, t) >= 1
        assert _state(view) == _expected(t), f"wave {i}: {rows}"
    assert agg_view_cursor(view) == t.current_version()


def test_unchanged_cow_reemits_are_filtered(spark, tmp_table_dir):
    # a COW-with-lsn source re-emits untouched co-bucketed rows in the
    # changelog; the per-key endpoint diff must cancel them out
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA,
        merge_key=["url"], n_buckets=1,  # everything co-bucketed
    )
    t.merge(_changes(spark, [("u1", "en", 10, "I", 1), ("u2", "en", 30, "I", 2)]),
            epoch_id=1, op_col="op", mode="cow", lsn_col="lsn")
    view = create_agg_view(t, os.path.join(tmp_table_dir, "v"), "lang", "size")
    t.merge(_changes(spark, [("u3", "de", 5, "I", 10)]),
            epoch_id=2, op_col="op", mode="cow", lsn_col="lsn")
    assert sync_agg_view(view, t) >= 1
    assert _state(view) == _expected(t)


def test_replay_noop_and_fresh_reopen(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [("u1", "en", 10, "I", 1)], 1)
    vpath = os.path.join(tmp_table_dir, "v")
    view = create_agg_view(t, vpath, "lang", "size")
    _apply(t, spark, [("u2", "en", 3, "I", 2)], 2)
    assert sync_agg_view(view, t) >= 1
    before = _state(view)
    # replay: same head -> 0 consumed, state unchanged
    assert sync_agg_view(view, t) == 0
    assert _state(view) == before
    # fresh object reopen: cursor from the epoch registry, no sidecar
    again = open_agg_view(spark, vpath)
    assert agg_view_cursor(again) == t.current_version()
    assert sync_agg_view(again, t) == 0
    assert _state(again) == before


def test_truncate_mirrors_as_full_refresh(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [("u1", "en", 10, "I", 1), ("u2", "de", 5, "I", 2)], 1)
    view = create_agg_view(t, os.path.join(tmp_table_dir, "v"), "lang", "size")
    t.truncate_rows(100)
    _apply(t, spark, [("u3", "fr", 7, "I", 200)], 2)
    assert sync_agg_view(view, t) >= 1
    assert _state(view) == _expected(t)
    assert [r.group_key for r in view.scan().collect()] == ["fr"]


def test_retention_expiry_reseed_exact(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [("u1", "en", 10, "I", 1)], 1)
    view = create_agg_view(t, os.path.join(tmp_table_dir, "v"), "lang", "size")
    for i in range(3):
        _apply(t, spark, [(f"w{i}", "en", 100 + i, "I", 10 + i)], 2 + i)
    t.expire_snapshots(keep_last=1)
    try:
        sync_agg_view(view, t)
        raised = False
    except SnapshotExpired:
        raised = True
    assert raised
    reseed_agg_view(view, t)
    assert _state(view) == _expected(t)
    # normal tailing resumes
    _apply(t, spark, [("u9", "de", 2, "I", 99)], 50)
    assert sync_agg_view(view, t) >= 1
    assert _state(view) == _expected(t)


def test_additive_path_never_scans_source(spark, tmp_table_dir, monkeypatch):
    """The 100-TB contract: a sync whose retractions touch no stored
    extreme must not read the source table at all (``source.scan`` is
    wired into the merge plan ONLY when the recompute set is non-empty).
    An extreme retraction in the next wave must then call it."""
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [
        ("u1", "en", 10, "I", 1), ("u2", "en", 30, "I", 2),
        ("u3", "en", 20, "I", 3),
    ], 1)
    view = create_agg_view(t, os.path.join(tmp_table_dir, "v"), "lang", "size")

    calls = []
    real_scan = LakeTable.scan

    def spy(self, *a, **k):
        if self.path == t.path:
            calls.append(k)
        return real_scan(self, *a, **k)

    monkeypatch.setattr(LakeTable, "scan", spy)
    # non-extreme delete + insert: additive, no source scan
    _apply(t, spark, [("u3", None, None, "D", 10), ("u4", "en", 25, "I", 11)], 2)
    assert sync_agg_view(view, t) >= 1
    assert calls == []
    assert _state(view) == _expected(t)  # (this itself scans the source)
    # extreme delete (u2=30 is the max): recompute path reads the source
    calls.clear()
    _apply(t, spark, [("u2", None, None, "D", 20)], 3)
    assert sync_agg_view(view, t) >= 1
    assert len(calls) == 1
    monkeypatch.undo()
    assert _state(view) == _expected(t)


def test_agg_view_rides_cdc_pipeline_sync_hooks(spark, tmp_table_dir):
    """Streaming composability: the agg view maintained per micro-batch
    via CdcPipeline(sync_hooks=...); post-drain state must equal a
    from-scratch GROUP BY of the lake, and an idle re-drain must not
    move the view (exactly-once on consumed lake version)."""
    import os as _os

    from clever_canal_spark.filters import EventFilterConfig
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.lake.agg_view import create_agg_view, sync_agg_view
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import CdcPipeline

    src = _os.path.join(tmp_table_dir, "feed")
    ckpt = _os.path.join(tmp_table_dir, "ckpt")
    cfgf = FeedConfig(n_events=600, n_urls=40, seed=7)
    write_feed_slices(generate_feed(spark, cfgf), src, n_slices=3,
                      n_events=cfgf.n_events)
    pages = LakeTable.create(
        spark, _os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    view = create_agg_view(
        pages, _os.path.join(tmp_table_dir, "aggv"),
        "lang", "CAST(length(text) AS INT)",
    )
    pipe = CdcPipeline(
        spark, src, ckpt, pages,
        ApplyConfig(filters=EventFilterConfig(), merge_mode="mor"),
        sync_hooks=(lambda t: sync_agg_view(view, t),),
    )
    pipe.run_until_drained()

    def recomp():
        return sorted(
            map(tuple,
                pages.scan().filter(F.col("lang").isNotNull())
                .groupBy(F.col("lang").alias("group_key"))
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.count(F.length("text")).alias("n_vals"),
                     F.sum(F.length("text")).alias("sum_val"),
                     F.min(F.length("text")).alias("min_val"),
                     F.max(F.length("text")).alias("max_val"))
                .collect())
        )

    got = _state(view)
    assert got == recomp() and got
    v = view.current_version()
    pipe.run_until_drained()
    assert view.current_version() == v


def test_multi_value_columns_match_rebuild(spark, tmp_table_dir):
    """value_exprs={name: expr} form: per-name column quadruples, shared
    n_rows; an extreme retraction on ONE column re-derives the group for
    all; state equals a from-scratch rebuild after every wave."""
    t = _mk_src(spark, tmp_table_dir)
    _apply(t, spark, [
        ("u1", "en", 10, "I", 1), ("u2", "en", 30, "I", 2),
        ("u3", "en", 20, "I", 3), ("u4", "de", 7, "I", 4),
    ], 1)
    view = create_agg_view(
        t, os.path.join(tmp_table_dir, "v"), "lang",
        value_exprs={"size": "size", "double_size": "size * 2"},
    )

    def expected():
        return sorted(map(tuple,
            t.scan().filter(F.col("lang").isNotNull())
            .groupBy(F.col("lang").alias("group_key"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("size").alias("n_size"),
                F.sum("size").alias("sum_size"),
                F.min("size").alias("min_size"),
                F.max("size").alias("max_size"),
                F.count(F.expr("size * 2")).alias("n_double_size"),
                F.sum(F.expr("size * 2")).alias("sum_double_size"),
                F.min(F.expr("size * 2")).alias("min_double_size"),
                F.max(F.expr("size * 2")).alias("max_double_size"),
            ).collect()))

    assert sorted(view.scan().columns) == sorted(
        ["group_key", "n_rows",
         "n_size", "sum_size", "min_size", "max_size",
         "n_double_size", "sum_double_size", "min_double_size",
         "max_double_size"])
    assert _state(view) == expected()
    waves = [
        [("u3", None, None, "D", 10)],           # non-extreme: additive
        [("u2", None, None, "D", 20)],           # extreme on BOTH: recompute
        [("u5", "en", 1, "I", 30)],              # new min
        [("u5", None, None, "D", 40)],           # min retraction: recompute
    ]
    for i, rows in enumerate(waves):
        _apply(t, spark, rows, 100 + i)
        assert sync_agg_view(view, t) >= 1
        assert _state(view) == expected(), f"wave {i}"


def test_create_arg_validation(spark, tmp_table_dir):
    import pytest as _pytest

    t = _mk_src(spark, tmp_table_dir)
    with _pytest.raises(ValueError, match="exactly one"):
        create_agg_view(t, os.path.join(tmp_table_dir, "x"), "lang")
    with _pytest.raises(ValueError, match="exactly one"):
        create_agg_view(t, os.path.join(tmp_table_dir, "x"), "lang",
                        value_expr="size", value_exprs={"a": "size"})
    with _pytest.raises(ValueError, match="identifiers"):
        create_agg_view(t, os.path.join(tmp_table_dir, "x"), "lang",
                        value_exprs={"bad name": "size"})
