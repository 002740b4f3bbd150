"""Maintained-view bootstrap (snapshot-then-tail): seeding an empty
rollup/HLL/CMS/histogram view from the source's LIVE state at a pinned
version, so a view can be put on a long-lived table whose early
changelog is past retention (full-history sync raises SnapshotExpired)
WITHOUT discarding the rows that exist now (start_after's trade).
CMS is replay-equivalent (net liveness == live state); rollup/HLL/hist
seeds are documented floors over pre-bootstrap history."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    SnapshotExpired,
    bootstrap_cms_view,
    bootstrap_hist_view,
    bootstrap_hll_view,
    bootstrap_rollup,
    create_cms_view,
    create_hist_view,
    create_hll_view,
    create_rollup,
    sync_cms_view,
    sync_hist_view,
    sync_hll_view,
    sync_rollup,
)
from clever_canal_spark.operators.sketch import cms_add, hist_add, hll_regs_dense

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


def _aged_source(spark, tmp, name="src"):
    """Three epochs of history (inserts, updates, a delete), then early
    snapshots expired — the long-lived-table shape a bootstrap exists
    for. Live state afterwards: d0/a (lsn 10), d0/b (lsn 11), d1/c
    (lsn 3) — d1/gone was deleted."""
    t = _mk_src(spark, tmp, name)
    t.merge(
        _changes(spark, [("d0/a", "x", "I", 1), ("d1/gone", "g", "I", 2),
                         ("d1/c", "z", "I", 3)]),
        epoch_id=0, op_col="op", mode="mor", lsn_col="lsn",
    )
    t.merge(
        _changes(spark, [("d0/a", "x2", "U", 10), ("d0/b", "y", "I", 11)]),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    t.merge(
        _changes(spark, [("d1/gone", None, "D", 12)]),
        epoch_id=2, op_col="op", mode="mor", lsn_col="lsn",
    )
    t.expire_snapshots(keep_last=1)
    return t


def test_full_history_sync_raises_after_expiry(spark, tmp_table_dir):
    t = _aged_source(spark, tmp_table_dir)
    v = create_rollup(spark, os.path.join(tmp_table_dir, "v0"), "url", n_buckets=4)
    with pytest.raises(SnapshotExpired):
        sync_rollup(v, t)


def test_bootstrap_rollup_seeds_live_state_then_tails(spark, tmp_table_dir):
    t = _aged_source(spark, tmp_table_dir)
    view = create_rollup(
        spark, os.path.join(tmp_table_dir, "v1"), "domain", n_buckets=4
    )
    seeded = bootstrap_rollup(view, t, group_expr=_domain())
    assert seeded == t.current_version()

    state = {
        r["domain"]: (r["n_changes"], r["n_upserts"], r["n_deletes"], r["last_lsn"])
        for r in view.scan().collect()
    }
    # one upsert per LIVE row; the deleted key and superseded versions
    # left no trace (documented floor)
    assert state == {"d0": (2, 2, 0, 11), "d1": (1, 1, 0, 3)}

    # tailing from the seed keeps the additive contract exact
    t.merge(
        _changes(spark, [("d0/a", None, "D", 20), ("d2/new", "n", "I", 21)]),
        epoch_id=3, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_rollup(view, t, group_expr=_domain()) >= 1
    state = {
        r["domain"]: (r["n_changes"], r["n_upserts"], r["n_deletes"], r["last_lsn"])
        for r in view.scan().collect()
    }
    assert state == {
        "d0": (3, 2, 1, 20),
        "d1": (1, 1, 0, 3),
        "d2": (1, 1, 0, 21),
    }


def test_bootstrap_hll_regs_equal_direct_sketch_of_live_state(spark, tmp_table_dir):
    t = _aged_source(spark, tmp_table_dir)
    view = create_hll_view(
        spark, os.path.join(tmp_table_dir, "v2"), "domain", b=4, n_buckets=4
    )
    assert bootstrap_hll_view(
        view, t, item_expr=F.col("url"), group_expr=_domain()
    ) == t.current_version()

    got = {r["domain"]: list(r["regs"]) for r in view.scan().collect()}
    want_df = hll_regs_dense(
        t.scan().select(_domain().alias("domain"), F.col("url").alias("__item")),
        ["domain"], "__item", 4, regs_col="regs",
    )
    want = {r["domain"]: list(r["regs"]) for r in want_df.collect()}
    assert got == want  # register-for-register: seed IS the live sketch

    # monotone growth on tail: a new url can only raise registers
    t.merge(_changes(spark, [("d0/late", "w", "I", 30)]), epoch_id=3,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_hll_view(view, t, item_expr=F.col("url"), group_expr=_domain()) >= 1
    after = {r["domain"]: list(r["regs"]) for r in view.scan().collect()}
    assert all(a >= b for a, b in zip(after["d0"], got["d0"]))


def test_bootstrap_cms_is_replay_equivalent(spark, tmp_table_dir):
    """The CMS view's state-diff semantics make bootstrap+tail land the
    IDENTICAL sketch a full-history sync builds — assert slot-for-slot
    against a twin view that replayed everything (history retained)."""
    def build(name, tmp):
        t = _mk_src(spark, tmp, name)
        t.merge(_changes(spark, [("d0/a", "x", "I", 1), ("d1/gone", "g", "I", 2),
                                 ("d1/c", "z", "I", 3)]),
                epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
        t.merge(_changes(spark, [("d0/a", "x2", "U", 10), ("d0/b", "y", "I", 11)]),
                epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
        t.merge(_changes(spark, [("d1/gone", None, "D", 12)]),
                epoch_id=2, op_col="op", mode="mor", lsn_col="lsn")
        return t

    t_full = build("srcA", tmp_table_dir)
    v_full = create_cms_view(spark, os.path.join(tmp_table_dir, "vA"), d=3, w=32)
    assert sync_cms_view(v_full, t_full, item_expr=_domain()) >= 1

    t_boot = build("srcB", tmp_table_dir)
    t_boot.expire_snapshots(keep_last=1)
    v_boot = create_cms_view(spark, os.path.join(tmp_table_dir, "vB"), d=3, w=32)
    assert bootstrap_cms_view(v_boot, t_boot, item_expr=_domain()) == (
        t_boot.current_version()
    )

    def slots(v):
        return sorted(map(tuple, v.scan().select("depth", "slot", "cnt").collect()))

    assert slots(v_boot) == slots(v_full)

    # and the equivalence survives tailing the same new epoch on both
    new = [("d1/c", None, "D", 20), ("d2/n", "n", "I", 21)]
    for t, v in ((t_full, v_full), (t_boot, v_boot)):
        t.merge(_changes(spark, new), epoch_id=3, op_col="op", mode="mor",
                lsn_col="lsn")
        assert sync_cms_view(v, t, item_expr=_domain()) >= 1
    assert slots(v_boot) == slots(v_full)


def test_bootstrap_hist_bins_equal_direct_histogram_of_live_state(
    spark, tmp_table_dir
):
    t = _aged_source(spark, tmp_table_dir)
    view = create_hist_view(spark, os.path.join(tmp_table_dir, "v3"), "domain")
    assert bootstrap_hist_view(
        view, t, value_expr=F.length("text").cast("long"), group_expr=_domain()
    ) == t.current_version()

    got = sorted(map(tuple, view.scan().select("domain", "bin", "n").collect()))
    want_df = hist_add(
        t.scan().select(_domain().alias("domain"),
                        F.length("text").cast("long").alias("__v")),
        ["domain"], "__v",
    )
    want = sorted(map(tuple, want_df.select("domain", "bin", "n").collect()))
    assert got == want

    # tail adds changelog observations on top of the seed
    t.merge(_changes(spark, [("d0/a", "longer-text", "U", 30)]), epoch_id=3,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_hist_view(
        view, t, value_expr=F.length("text").cast("long"), group_expr=_domain()
    ) >= 1
    total = sum(r["n"] for r in view.scan().collect())
    assert total == sum(r[2] for r in want) + 1


def test_bootstrap_guards_and_idempotence(spark, tmp_table_dir):
    t = _aged_source(spark, tmp_table_dir)
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v4"), "url", n_buckets=4)
    assert bootstrap_rollup(view, t) == t.current_version()
    # second bootstrap: cursor already set -> no-op (idempotent reopen)
    assert bootstrap_rollup(view, t) == 0
    # fresh-object reopen keeps the cursor (registry, no sidecar)
    assert bootstrap_rollup(LakeTable(spark, view.path), t) == 0
    assert sync_rollup(view, t) == 0  # seed IS current

    # a start_after view already has a cursor: bootstrap declines
    v_sa = create_rollup(spark, os.path.join(tmp_table_dir, "v5"), "url",
                         n_buckets=4, start_after=t.current_version())
    assert bootstrap_rollup(v_sa, t) == 0

    # a view with data but no cursor is a contract error, not a merge
    v_bad = create_rollup(spark, os.path.join(tmp_table_dir, "v6"), "url",
                          n_buckets=4)
    v_bad.merge(
        spark.createDataFrame(
            [("u", 1, 1, 0, 1, "U", 1)],
            "url string, n_changes long, n_upserts long, n_deletes long, "
            "last_lsn long, op string, lsn bigint",
        ),
        epoch_id=0, op_col="op", mode="mor", lsn_col="lsn",
    )
    # epoch 0 registers no cursor advance past 0? merge stamps epoch 0;
    # cursor reads max committed epoch = 0 -> still "unbootstrapped",
    # but the view is non-empty: must refuse rather than double-seed
    with pytest.raises(ValueError):
        bootstrap_rollup(v_bad, t)


def test_bootstrap_empty_source_and_all_deleted_state(spark, tmp_table_dir):
    # empty source: nothing to seed — the cursor stamps at the create
    # version (a fresh table is already version 1) and the tail starts
    # there
    t = _mk_src(spark, tmp_table_dir, "src_empty")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v7"), "url", n_buckets=4)
    assert bootstrap_rollup(view, t) == t.current_version()
    assert view.scan().count() == 0
    t.merge(_changes(spark, [("a", "x", "I", 1)]), epoch_id=0,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    assert view.scan().count() == 1

    # all-deleted live state: cursor stamps via marker, tail still works
    t2 = _mk_src(spark, tmp_table_dir, "src_dead")
    t2.merge(_changes(spark, [("a", "x", "I", 1)]), epoch_id=0,
             op_col="op", mode="mor", lsn_col="lsn")
    t2.merge(_changes(spark, [("a", None, "D", 2)]), epoch_id=1,
             op_col="op", mode="mor", lsn_col="lsn")
    v2 = create_rollup(spark, os.path.join(tmp_table_dir, "v8"), "url", n_buckets=4)
    assert bootstrap_rollup(v2, t2) == t2.current_version()
    assert v2.scan().count() == 0
    assert sync_rollup(v2, t2) == 0  # cursor at head despite empty seed
    t2.merge(_changes(spark, [("b", "y", "I", 3)]), epoch_id=2,
             op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(v2, t2) >= 1
    assert v2.scan().count() == 1
