"""Changelog-synced histogram view (lake/sketch_view.py): incremental
bin maintenance equals a from-scratch histogram of the change stream;
quantile brackets from the view alone; exactly-once across reopen."""

import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    create_hist_view,
    hist_view_quantiles,
    sync_hist_view,
)
from clever_canal_spark.operators.sketch import hist_add

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("text", T.StringType()),
])


def _changes(spark, rows):
    return spark.createDataFrame(rows, "url string, text string, op string, lsn bigint")


def _mk_src(spark, tmp):
    return LakeTable.create(
        spark, os.path.join(tmp, "src"), SCHEMA, merge_key=["url"], n_buckets=4
    )


def _domain(url_col="url"):
    return F.split(F.col(url_col), "/").getItem(0)


def _state(view):
    return sorted(map(tuple, view.scan().select("domain", "bin", "n").collect()))


def test_incremental_sync_equals_from_scratch(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    view = create_hist_view(spark, os.path.join(tmp_table_dir, "v"), "domain")

    waves = [
        [(f"d{i % 2}/p{i}", "x" * (i + 1), "I", i + 1) for i in range(20)],
        [(f"d{i % 2}/q{i}", "y" * (i * 50 + 1), "I", 100 + i) for i in range(10)]
        + [("d0/p0", None, "D", 200)],
    ]
    for e, rows in enumerate(waves):
        t.merge(_changes(spark, rows), epoch_id=e, op_col="op", mode="mor", lsn_col="lsn")
        assert sync_hist_view(
            view, t, value_expr=F.length("text"), group_expr=_domain()
        ) >= 1

    # from-scratch histogram over the ENTIRE change stream (null values —
    # the delete marker's payload — skipped) == maintained state
    all_rows = t.scan_changes(0).select(
        _domain().alias("domain"), F.length("text").alias("__v")
    ).filter(F.col("__v").isNotNull())
    scratch = sorted(map(tuple, hist_add(all_rows, ["domain"], "__v").collect()))
    assert _state(view) == scratch

    # quantiles off the view bracket the exact stream quantile
    qs = {
        (r["domain"], r["q_permille"]): (r["est_lo"], r["est_hi"])
        for r in hist_view_quantiles(view, [500, 990]).collect()
    }
    vals = sorted(
        r["__v"] for r in all_rows.filter(F.col("domain") == "d0").collect()
    )
    for q in (500, 990):
        exact = vals[-(-q * len(vals) // 1000) - 1]
        lo, hi = qs[("d0", q)]
        assert lo <= exact <= hi


def test_exactly_once_reopen_and_replay(spark, tmp_table_dir):
    t = _mk_src(spark, tmp_table_dir)
    vpath = os.path.join(tmp_table_dir, "v")
    view = create_hist_view(spark, vpath, "domain")
    t.merge(_changes(spark, [(f"a/p{i}", "x" * (10 * i + 1), "I", i + 1)
                             for i in range(8)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    sync_hist_view(view, t, value_expr=F.length("text"), group_expr=_domain())
    state, v = _state(view), view.current_version()

    view2 = LakeTable(spark, vpath)
    assert sync_hist_view(view2, t, value_expr=F.length("text"),
                          group_expr=_domain()) == 0
    assert view2.current_version() == v
    assert _state(view2) == state
    assert sync_hist_view(view2, t, value_expr=F.length("text"),
                          group_expr=_domain(),
                          to_version=t.current_version()) == 0


def test_on_negative_policies(spark, tmp_table_dir):
    """A negative value inside a sync is a poison pill under the default
    (hist_add raises, and a streaming hook would replay the same epoch
    forever) — 'clamp' counts it into bin 0, 'skip' drops it; both let
    the cursor advance."""
    import pytest

    t = _mk_src(spark, tmp_table_dir)
    # value = length(text), negative encoded via a signed marker column:
    # use the text itself as an int value
    val = F.col("text").cast("long")

    t.merge(_changes(spark, [("a/p1", "4", "I", 1), ("a/p2", "-7", "I", 2)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")

    v_err = create_hist_view(spark, os.path.join(tmp_table_dir, "verr"), "domain")
    with pytest.raises(Exception, match="negative"):
        sync_hist_view(v_err, t, value_expr=val, group_expr=_domain())

    v_clamp = create_hist_view(spark, os.path.join(tmp_table_dir, "vclamp"), "domain")
    assert sync_hist_view(v_clamp, t, value_expr=val, group_expr=_domain(),
                          on_negative="clamp") >= 1
    st = sorted(map(tuple, v_clamp.scan().select("domain", "bin", "n").collect()))
    assert st == [("a", 0, 1), ("a", 3, 1)]  # -7 -> bin 0; 4 -> bin 3

    v_skip = create_hist_view(spark, os.path.join(tmp_table_dir, "vskip"), "domain")
    assert sync_hist_view(v_skip, t, value_expr=val, group_expr=_domain(),
                          on_negative="skip") >= 1
    st = sorted(map(tuple, v_skip.scan().select("domain", "bin", "n").collect()))
    assert st == [("a", 3, 1)]

    with pytest.raises(ValueError, match="on_negative"):
        sync_hist_view(v_skip, t, value_expr=val, on_negative="bogus")
