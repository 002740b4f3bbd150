"""Changelog-synced HLL sketch view (lake/sketch_view.py): incremental
register maintenance equals a from-scratch sketch of the change stream;
exactly-once across replays and fresh-process reopen; deletes and
duplicate delivery never move a monotone ever-seen estimate."""

import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    create_hll_view,
    hll_view_config,
    hll_view_estimates,
    sync_hll_view,
)
from clever_canal_spark.operators.sketch import hll_card, hll_regs_dense, hll_add

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("text", T.StringType()),
])


def _changes(spark, rows):
    return spark.createDataFrame(rows, "url string, text string, op string, lsn bigint")


def _mk_src(spark, tmp, name):
    return LakeTable.create(
        spark, os.path.join(tmp, name), SCHEMA, merge_key=["url"], n_buckets=4
    )


def _domain(url_col="url"):
    return F.split(F.col(url_col), "/").getItem(0)


def _ests(view):
    return {r[0]: r[1] for r in hll_view_estimates(view).collect()}


def _regs(view):
    gcol = view.snapshot().merge_key[0]
    return {r[gcol]: list(r["regs"]) for r in view.scan().collect()}


def test_incremental_sync_equals_from_scratch_sketch(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_hll_view(
        spark, os.path.join(tmp_table_dir, "v"), "domain", b=4, n_buckets=4
    )
    assert hll_view_config(view) == {"kind": "hll", "b": 4}

    waves = [
        [(f"d{i % 3}/p{i}", f"t{i}", "I", i + 1) for i in range(30)],
        [(f"d{i % 3}/p{i}", f"t{i}x", "U", 100 + i) for i in range(10)]
        + [(f"d{i % 3}/q{i}", f"u{i}", "I", 200 + i) for i in range(20)],
    ]
    for e, rows in enumerate(waves):
        t.merge(_changes(spark, rows), epoch_id=e, op_col="op", mode="mor", lsn_col="lsn")
        assert sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain()) >= 1

    # from-scratch sketch over the ENTIRE change stream == maintained state
    all_changes = t.scan_changes(0).select(
        _domain().alias("domain"), F.col("url").alias("s")
    )
    scratch = {
        r["domain"]: list(r["regs"])
        for r in hll_regs_dense(all_changes, ["domain"], "s", b=4).collect()
    }
    assert _regs(view) == scratch

    # estimates agree with the row-form estimator on the same registers
    row_form = {
        r["domain"]: r["hll_distinct"]
        for r in hll_card(
            hll_add(all_changes, ["domain"], "s", b=4), ["domain"], b=4
        ).collect()
    }
    assert _ests(view) == row_form


def test_deletes_and_duplicates_do_not_move_the_estimate(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_hll_view(
        spark, os.path.join(tmp_table_dir, "v"), "domain", b=4, n_buckets=4
    )
    t.merge(_changes(spark, [(f"a/p{i}", "x", "I", i + 1) for i in range(20)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain())
    before = _ests(view)

    # deletes of seen keys + re-inserts of already-seen urls: ever-seen
    # distinct is unchanged
    t.merge(_changes(spark, [("a/p0", None, "D", 100), ("a/p1", None, "D", 101),
                             ("a/p2", "x", "I", 102), ("a/p3", "x", "U", 103)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain()) >= 1
    assert _ests(view) == before


def test_payload_item_skips_delete_markers(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_hll_view(
        spark, os.path.join(tmp_table_dir, "v"), "domain", b=4, n_buckets=4
    )
    t.merge(_changes(spark, [("a/p1", "alpha", "I", 1), ("a/p2", "beta", "I", 2)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_hll_view(view, t, item_expr=F.col("text"), group_expr=_domain())
    before = _ests(view)
    # a delete marker has a null payload -> contributes nothing, sync still
    # advances the cursor (metadata-only when no items at all)
    t.merge(_changes(spark, [("a/p1", None, "D", 10)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_hll_view(view, t, item_expr=F.col("text"), group_expr=_domain()) >= 1
    assert _ests(view) == before
    assert sync_hll_view(view, t, item_expr=F.col("text"), group_expr=_domain()) == 0


def test_exactly_once_reopen_and_replay(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    vpath = os.path.join(tmp_table_dir, "v")
    view = create_hll_view(spark, vpath, "domain", b=4, n_buckets=4)
    t.merge(_changes(spark, [(f"a/p{i}", "x", "I", i + 1) for i in range(10)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain())
    state, v = _regs(view), view.current_version()

    # fresh object (fresh-process analog): cursor lives in the view's own
    # registry; config is read back from sketch.json
    view2 = LakeTable(spark, vpath)
    assert hll_view_config(view2)["b"] == 4
    assert sync_hll_view(view2, t, item_expr=F.col("url"), group_expr=_domain()) == 0
    assert view2.current_version() == v
    assert _regs(view2) == state

    # replaying into an already-registered consumed version no-ops
    assert sync_hll_view(
        view2, t, item_expr=F.col("url"), group_expr=_domain(),
        to_version=t.current_version(),
    ) == 0


def test_start_after_skips_history(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    t.merge(_changes(spark, [("a/old", "x", "I", 1)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    view = create_hll_view(
        spark, os.path.join(tmp_table_dir, "v"), "domain", b=4, n_buckets=4,
        start_after=t.current_version(),
    )
    t.merge(_changes(spark, [("b/new", "y", "I", 2)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain())
    assert set(_ests(view)) == {"b"}
