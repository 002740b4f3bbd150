"""Changelog-synced count-min view (lake/sketch_view.py): incremental
turnstile maintenance equals a from-scratch sketch of the change stream;
deletes subtract; exactly-once across replays and fresh-process reopen."""

import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    cms_view_config,
    cms_view_estimate,
    create_cms_view,
    sync_cms_view,
)
from clever_canal_spark.operators.sketch import cms_add

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


def _state(view):
    return sorted(map(tuple, view.scan().select("depth", "slot", "cnt").collect()))


def _est(spark, view, items):
    probes = spark.createDataFrame([(i,) for i in items], "item string")
    return {
        r["item"]: r["cms_count"]
        for r in cms_view_estimate(view, probes, "item").collect()
    }


def test_incremental_sync_equals_from_scratch_sketch(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_cms_view(spark, os.path.join(tmp_table_dir, "v"), d=3, w=64)
    assert cms_view_config(view) == {"kind": "cms", "d": 3, "w": 64}

    waves = [
        [(f"d{i % 3}/p{i}", f"t{i}", "I", i + 1) for i in range(30)],
        [(f"d{i % 3}/p{i}", None, "D", 100 + i) for i in range(10)]
        + [(f"d{i % 3}/q{i}", f"u{i}", "I", 200 + i) for i in range(20)],
    ]
    for e, rows in enumerate(waves):
        t.merge(_changes(spark, rows), epoch_id=e, op_col="op", mode="mor", lsn_col="lsn")
        assert sync_cms_view(view, t, item_expr=_domain()) >= 1

    # from-scratch turnstile sketch over the ENTIRE change stream ==
    # maintained state (net-zero slots excluded on both sides)
    all_rows = t.scan_changes(0).select(
        _domain().alias("__item"), F.col("__op").alias("__op")
    ).filter(F.col("__op") != "U")
    scratch = sorted(
        map(
            tuple,
            cms_add(
                all_rows, [], "__item", d=3, w=64,
                weight_sql="CASE WHEN __op = 'D' THEN CAST(-1 AS BIGINT) ELSE CAST(1 AS BIGINT) END",
            ).filter(F.col("cnt") != 0).collect(),
        )
    )
    assert _state(view) == scratch

    # per-domain live-key estimate: d0 saw 10I+4D(p0,p3,p6,p9)... compute
    # exact from the stream and require estimate >= exact per domain
    exact = {
        r["__item"]: r["net"]
        for r in all_rows.groupBy("__item")
        .agg(F.sum(F.when(F.col("__op") == "D", -1).otherwise(1)).alias("net"))
        .collect()
    }
    est = _est(spark, view, list(exact))
    assert all(est[k] >= exact[k] for k in exact)


def test_deletes_subtract(spark, tmp_table_dir):
    # the turnstile property the HLL view deliberately lacks: removing
    # keys moves the estimate back down (exactly, at wide w)
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_cms_view(spark, os.path.join(tmp_table_dir, "v"), d=3, w=2048)
    t.merge(_changes(spark, [(f"a/p{i}", "x", "I", i + 1) for i in range(5)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 5}

    t.merge(_changes(spark, [("a/p0", None, "D", 10), ("a/p1", None, "D", 11),
                             ("a/p2", "y", "U", 12)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_cms_view(view, t, item_expr=_domain()) >= 1
    # 2 deletes subtract, the update is net-zero
    assert _est(spark, view, ["a"]) == {"a": 3}
    # unseen item estimates 0
    assert _est(spark, view, ["zzz"]) == {"zzz": 0}


def test_update_only_range_advances_cursor_metadata_only(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_cms_view(spark, os.path.join(tmp_table_dir, "v"), d=2, w=32)
    t.merge(_changes(spark, [("a/p1", "x", "I", 1)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    state, v = _state(view), view.current_version()

    t.merge(_changes(spark, [("a/p1", "x2", "U", 5)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_cms_view(view, t, item_expr=_domain()) >= 1
    assert _state(view) == state
    assert view.current_version() > v  # cursor advanced (marker commit)
    assert sync_cms_view(view, t, item_expr=_domain()) == 0


def test_exactly_once_reopen_and_replay(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    vpath = os.path.join(tmp_table_dir, "v")
    view = create_cms_view(spark, vpath, d=3, w=256)
    t.merge(_changes(spark, [(f"a/p{i}", "x", "I", i + 1) for i in range(10)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    state, v = _state(view), view.current_version()

    # fresh object (fresh-process analog): cursor + geometry persist
    view2 = LakeTable(spark, vpath)
    assert cms_view_config(view2) == {"kind": "cms", "d": 3, "w": 256}
    assert sync_cms_view(view2, t, item_expr=_domain()) == 0
    assert view2.current_version() == v
    assert _state(view2) == state
    # replay into the registered consumed version no-ops (never double-adds)
    assert sync_cms_view(view2, t, item_expr=_domain(),
                         to_version=t.current_version()) == 0
    assert _est(spark, view2, ["a"]) == {"a": 10}


def test_start_after_skips_history(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir, "src")
    t.merge(_changes(spark, [("a/old", "x", "I", 1)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    view = create_cms_view(
        spark, os.path.join(tmp_table_dir, "v"), d=3, w=256,
        start_after=t.current_version(),
    )
    t.merge(_changes(spark, [("b/new", "y", "I", 2)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a", "b"]) == {"a": 0, "b": 1}


def test_collapsed_markers_net_correctly(spark, tmp_table_dir):
    """The pre-dedup collapse shapes that broke marker arithmetic
    (r3 review): an epoch's LWW flatten keeps only the last op per key,
    so an insert superseded in the same micro-batch arrives as a lone
    'D' (or 'U') marker. State-based netting must count the TRUE
    liveness change, not the marker."""
    t = _mk_src(spark, tmp_table_dir, "src")
    view = create_cms_view(spark, os.path.join(tmp_table_dir, "v"), d=3, w=2048)

    # collapsed I+D: a never-live key whose only marker is 'D' -> net 0
    # (marker arithmetic would drive the slots to -1)
    t.merge(_changes(spark, [("a/p1", "x", "I", 1), ("a/ghost", None, "D", 2)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 1}

    # collapsed I+U: a new key whose only marker is 'U' -> net +1
    # (marker arithmetic would add 0, then the later legitimate delete
    # would net the key's lifetime to -1)
    t.merge(_changes(spark, [("a/p2", "y", "U", 3)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 2}

    t.merge(_changes(spark, [("a/p2", None, "D", 4)]),
            epoch_id=2, op_col="op", mode="mor", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 1}

    # delete + same-range reinsert across epochs consumed in ONE sync:
    # key live at both endpoints -> net 0 whatever happened in between
    t.merge(_changes(spark, [("a/p1", None, "D", 5)]),
            epoch_id=3, op_col="op", mode="mor", lsn_col="lsn")
    t.merge(_changes(spark, [("a/p1", "x2", "I", 6)]),
            epoch_id=4, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_cms_view(view, t, item_expr=_domain()) == 2
    assert _est(spark, view, ["a"]) == {"a": 1}


def test_cow_source_does_not_double_count(spark, tmp_table_dir):
    """COW merges rewrite surviving co-bucketed rows and scan_changes
    re-emits them; state-based netting sees before==after for the
    re-emitted keys and nets 0 — the CMS view is exact under EITHER
    merge mode (unlike the additive rollup/hist views)."""
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA, merge_key=["url"],
        n_buckets=1,  # one bucket: every COW commit rewrites every row
    )
    view = create_cms_view(spark, os.path.join(tmp_table_dir, "v"), d=3, w=2048)
    t.merge(_changes(spark, [(f"a/p{i}", "x", "I", i + 1) for i in range(4)]),
            epoch_id=0, op_col="op", mode="cow", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 4}

    # hot-key update rewrites the whole bucket; cold keys re-emit
    t.merge(_changes(spark, [("a/p0", "x2", "U", 10)]),
            epoch_id=1, op_col="op", mode="cow", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 4}

    # and a COW delete subtracts exactly once despite the rewrite
    t.merge(_changes(spark, [("a/p1", None, "D", 11)]),
            epoch_id=2, op_col="op", mode="cow", lsn_col="lsn")
    sync_cms_view(view, t, item_expr=_domain())
    assert _est(spark, view, ["a"]) == {"a": 3}
