"""Incrementally-maintained JOIN view (lake/join_view.py): a fact table
enriched by a dimension table, both CDC-fed — recompute-based delta,
two-source atomic cursor, inner/left modes, bootstrap."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.join_view import (
    bootstrap_join_view,
    create_join_view,
    join_view_cursor,
    sync_join_view,
)

ORDERS = T.StructType(
    [
        T.StructField("oid", T.LongType()),
        T.StructField("cust", T.StringType()),
        T.StructField("amt", T.LongType()),
    ]
)
CUSTOMERS = T.StructType(
    [
        T.StructField("cust", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("region", T.StringType()),
    ]
)


@pytest.fixture()
def dirs():
    ds = [tempfile.mkdtemp(prefix=f"ccs-jv-{i}-") for i in range(3)]
    yield ds
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def mk_sources(spark, dirs):
    left = LakeTable.create(spark, dirs[0], ORDERS, merge_key=["oid"], n_buckets=2)
    right = LakeTable.create(spark, dirs[1], CUSTOMERS, merge_key=["cust"], n_buckets=2)
    return left, right


def orders_batch(spark, rows, lsn0):
    """rows: (oid, cust, amt, op)"""
    return spark.createDataFrame(
        [(o, c, a, op, lsn0 + i) for i, (o, c, a, op) in enumerate(rows)],
        "oid long, cust string, amt long, op string, lsn long",
    )


def cust_batch(spark, rows, lsn0):
    """rows: (cust, tier, region, op)"""
    return spark.createDataFrame(
        [(c, t, g, op, lsn0 + i) for i, (c, t, g, op) in enumerate(rows)],
        "cust string, tier string, region string, op string, lsn long",
    )


def recompute(left, right, how):
    return {
        (r["oid"], r["cust"], r["amt"], r["tier"], r["region"])
        for r in left.scan()
        .join(right.scan(), on="cust", how=how)
        .select("oid", "cust", "amt", "tier", "region")
        .collect()
    }


def view_state(view):
    return {
        (r["oid"], r["cust"], r["amt"], r["tier"], r["region"])
        for r in view.scan().collect()
    }


def test_inner_join_view_tracks_both_changelogs(spark, dirs):
    """Left inserts/updates/deletes AND right updates/deletes all land;
    after every sync the view equals a from-scratch recompute."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    left.merge(
        orders_batch(spark, [(1, "a", 10, "I"), (2, "b", 20, "I"), (3, "zz", 30, "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    right.merge(
        cust_batch(spark, [("a", "gold", "eu", "I"), ("b", "iron", "us", "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    consumed = sync_join_view(view, left, right)
    assert consumed[0] > 0 and consumed[1] > 0
    # order 3 has no customer: absent under inner
    assert view_state(view) == recompute(left, right, "inner")
    assert (1, "a", 10, "gold", "eu") in view_state(view)

    # right UPDATE refreshes every joined order; right DELETE drops its
    # orders; left delete + insert in the same wave
    right.merge(
        cust_batch(spark, [("a", "silver", "eu", "U"), ("b", None, None, "D")], 10),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    left.merge(
        orders_batch(spark, [(2, "b", 21, "U"), (1, None, None, "D"), (4, "a", 40, "I")], 10),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right)
    got = view_state(view)
    assert got == recompute(left, right, "inner")
    assert got == {(4, "a", 40, "silver", "eu")}  # b gone, 1 deleted, 3 unmatched
    assert join_view_cursor(view) == (left.current_version(), right.current_version())


def test_left_join_view_null_payload_then_filled(spark, dirs):
    """how='left': unmatched orders survive with null enrichment and get
    filled when the dimension row arrives later (right-delta path must
    touch them)."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"], how="left")
    left.merge(orders_batch(spark, [(1, "a", 10, "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    assert view_state(view) == {(1, "a", 10, None, None)}
    right.merge(
        cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn"
    )
    sync_join_view(view, left, right)
    assert view_state(view) == {(1, "a", 10, "gold", "eu")}
    # dimension delete reverts to null payload, not a view delete
    right.merge(
        cust_batch(spark, [("a", None, None, "D")], 10), epoch_id=1, mode="mor", lsn_col="lsn"
    )
    sync_join_view(view, left, right)
    assert view_state(view) == {(1, "a", 10, None, None)}


def test_sync_idempotent_and_fresh_process_resume(spark, dirs):
    """A second sync at the same heads is a no-op; a fresh LakeTable
    object (new process analog) reads the cursor from the registry and
    replaying pinned target versions no-ops inside merge."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    left.merge(orders_batch(spark, [(1, "a", 10, "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    lv, rv = left.current_version(), right.current_version()
    assert sync_join_view(view, left, right) != (0, 0)
    v_after = view.current_version()
    assert sync_join_view(view, left, right) == (0, 0)
    assert view.current_version() == v_after

    view2 = LakeTable(spark, dirs[2])
    assert join_view_cursor(view2) == (lv, rv)
    # pinned replay of the consumed range: the epoch is registered -> no-op
    assert sync_join_view(view2, left, right, to_left=lv, to_right=rv) == (0, 0)
    assert view2.current_version() == v_after
    assert view_state(view2) == {(1, "a", 10, "gold", "eu")}


def test_create_validation(spark, dirs):
    left, right = mk_sources(spark, dirs)
    with pytest.raises(ValueError, match="merge key"):
        create_join_view(spark, dirs[2], left, right, on=["oid"])
    with pytest.raises(ValueError, match="how"):
        create_join_view(spark, dirs[2], left, right, on=["cust"], how="full")
    # payload collision: give right a column named like a left one
    coll = T.StructType(
        [T.StructField("cust", T.StringType()), T.StructField("amt", T.LongType())]
    )
    d = tempfile.mkdtemp(prefix="ccs-jv-coll-")
    try:
        r2 = LakeTable.create(spark, d, coll, merge_key=["cust"], n_buckets=2)
        with pytest.raises(ValueError, match="collides"):
            create_join_view(spark, dirs[2], left, r2, on=["cust"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bootstrap_after_retention_then_tail(spark, dirs):
    """Aged left source (early snapshots expired): first sync raises
    SnapshotExpired; bootstrap seeds from both heads, the cursor lands
    there atomically, and a later wave tails incrementally."""
    from clever_canal_spark.lake.table import SnapshotExpired

    left, right = mk_sources(spark, dirs)
    for e in range(3):
        left.merge(
            orders_batch(spark, [(e + 1, "a", 10 * (e + 1), "I")], 10 * e),
            epoch_id=e, mode="mor", lsn_col="lsn",
        )
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    left.compact()
    left.expire_snapshots(keep_last=1)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    with pytest.raises(SnapshotExpired):
        sync_join_view(view, left, right)
    lv, rv = bootstrap_join_view(view, left, right)
    assert (lv, rv) == (left.current_version(), right.current_version())
    assert view_state(view) == recompute(left, right, "inner")
    # idempotent reopen
    assert bootstrap_join_view(LakeTable(spark, dirs[2]), left, right) == (0, 0)
    # tail a post-bootstrap wave
    left.merge(orders_batch(spark, [(9, "a", 90, "I")], 100), epoch_id=9, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    assert (9, "a", 90, "gold", "eu") in view_state(view)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_view_randomized_soak(spark, dirs, how):
    """Seeded random interleaving of left/right upserts and deletes across
    6 waves with syncs randomly skipped (multi-wave ranges): after every
    sync the maintained state must equal the from-scratch recompute."""
    import random

    rng = random.Random(20260819 if how == "inner" else 20260820)
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"], how=how)
    custs = [f"c{i}" for i in range(6)]
    lsn = 0
    live_oids: set[int] = set()
    live_custs: set[str] = set()
    for wave in range(6):
        lrows = []
        for _ in range(rng.randint(1, 8)):
            oid = rng.randint(1, 25)
            if live_oids and rng.random() < 0.25:
                oid = rng.choice(sorted(live_oids))
                lrows.append((oid, None, None, "D"))
                live_oids.discard(oid)
            else:
                lrows.append((oid, rng.choice(custs), rng.randint(1, 99), "U"))
                live_oids.add(oid)
        left.merge(orders_batch(spark, lrows, lsn), epoch_id=wave, mode="mor", lsn_col="lsn")
        lsn += len(lrows)
        if rng.random() < 0.8:
            rrows = []
            for _ in range(rng.randint(1, 4)):
                c = rng.choice(custs)
                if c in live_custs and rng.random() < 0.3:
                    rrows.append((c, None, None, "D"))
                    live_custs.discard(c)
                else:
                    rrows.append((c, rng.choice(["gold", "iron"]), f"r{rng.randint(0, 3)}", "U"))
                    live_custs.add(c)
            # intra-batch LWW: keep the LAST op per cust only
            seen: dict[str, tuple] = {}
            for r in rrows:
                seen[r[0]] = r
            right.merge(
                cust_batch(spark, list(seen.values()), lsn),
                epoch_id=wave, mode="mor", lsn_col="lsn",
            )
            lsn += len(seen)
        if rng.random() < 0.7 or wave == 5:
            sync_join_view(view, left, right)
            assert view_state(view) == recompute(left, right, how), f"wave {wave}"


def test_join_view_as_pipeline_sync_hook(spark, tmp_table_dir):
    """The join view rides CdcPipeline's sync_hooks: pages (the piped
    sink) enriched by a lang-keyed dimension, synced after every
    micro-batch; re-draining the same checkpoint must not corrupt the
    view (recompute-idempotent apply), and a dimension update between
    drains refreshes the joined rows."""
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import CdcPipeline

    src = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    cfgf = FeedConfig(n_events=600, n_urls=40, seed=11)
    feed = generate_feed(spark, cfgf)
    write_feed_slices(feed, src, n_slices=3, n_events=cfgf.n_events)

    pages = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    langs = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "langs"),
        T.StructType(
            [T.StructField("lang", T.StringType()), T.StructField("family", T.StringType())]
        ),
        merge_key=["lang"], n_buckets=2,
    )
    langs.merge(
        spark.createDataFrame(
            [("en", "germanic", "I", 0), ("de", "germanic", "I", 1), ("fr", "romance", "I", 2)],
            "lang string, family string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    view = create_join_view(
        spark, os.path.join(tmp_table_dir, "view"), pages, langs,
        on=["lang"], how="left",
    )
    pipe = CdcPipeline(
        spark, src, ckpt, pages, ApplyConfig(merge_mode="mor"),
        sync_hooks=(lambda t: sync_join_view(view, t, langs),),
    )
    pipe.run_until_drained()

    def recomp():
        return {
            (r["url"], str(r["warc_ts"]), r["family"])
            for r in pages.scan()
            .join(langs.scan(), on="lang", how="left")
            .select("url", "warc_ts", "family")
            .collect()
        }

    got = {
        (r["url"], str(r["warc_ts"]), r["family"]) for r in view.scan().collect()
    }
    assert got == recomp() and got
    # idle re-drain: nothing double-applied
    v = view.current_version()
    pipe.run_until_drained()
    assert view.current_version() == v
    # dimension change between drains: next drain's hook refreshes it
    langs.merge(
        spark.createDataFrame(
            [("en", "west-germanic", "U", 10)], "lang string, family string, op string, lsn long"
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, pages, langs)
    got2 = {(r["url"], str(r["warc_ts"]), r["family"]) for r in view.scan().collect()}
    assert got2 == recomp()
    assert any(f == "west-germanic" for _, _, f in got2)


def test_right_delta_probe_shuffle_fallback(spark, dirs):
    """broadcast_key_limit=0 forces the right-delta probe onto the
    shuffle semi-join path — results must be identical to the broadcast
    path (the no-OOM-cliff guard, same shape as the apply path's
    winner-join fallback)."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    left.merge(
        orders_batch(spark, [(1, "a", 10, "I"), (2, "b", 20, "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    right.merge(
        cust_batch(spark, [("a", "gold", "eu", "I"), ("b", "iron", "us", "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right, broadcast_key_limit=0)
    right.merge(
        cust_batch(spark, [("a", "silver", "eu", "U")], 10),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right, broadcast_key_limit=0)
    assert view_state(view) == recompute(left, right, "inner")
    assert (1, "a", 10, "silver", "eu") in view_state(view)


def test_join_views_compose(spark, dirs):
    """A join view is itself a MOR-fed LakeTable, so it can be the LEFT
    source of ANOTHER join view — two-hop enrichment (orders ⋈ customers
    ⋈ regions) maintained incrementally end-to-end."""
    import tempfile as _tf

    left, right = mk_sources(spark, dirs)
    regions = LakeTable.create(
        spark, _tf.mkdtemp(prefix="ccs-jv-reg-"),
        T.StructType(
            [T.StructField("region", T.StringType()), T.StructField("zone", T.StringType())]
        ),
        merge_key=["region"], n_buckets=2,
    )
    v1 = create_join_view(spark, dirs[2], left, right, on=["cust"])
    v2 = create_join_view(
        spark, _tf.mkdtemp(prefix="ccs-jv-v2-"), v1, regions, on=["region"], how="left"
    )
    left.merge(orders_batch(spark, [(1, "a", 10, "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    regions.merge(
        spark.createDataFrame([("eu", "emea", "I", 0)], "region string, zone string, op string, lsn long"),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    sync_join_view(v1, left, right)
    sync_join_view(v2, v1, regions)
    got = {
        (r["oid"], r["cust"], r["tier"], r["region"], r["zone"])
        for r in v2.scan().collect()
    }
    assert got == {(1, "a", "gold", "eu", "emea")}
    # upstream dimension change ripples through both hops
    right.merge(
        cust_batch(spark, [("a", "iron", "us", "U")], 10), epoch_id=1, mode="mor", lsn_col="lsn"
    )
    sync_join_view(v1, left, right)
    sync_join_view(v2, v1, regions)
    got2 = {
        (r["oid"], r["cust"], r["tier"], r["region"], r["zone"])
        for r in v2.scan().collect()
    }
    assert got2 == {(1, "a", "iron", "us", None)}  # us region absent -> left-null


def test_left_truncate_mirrors_into_view(spark, dirs):
    """A left-source TRUNCATE is metadata-only upstream (no D markers),
    so the sync must mirror it: the view empties, then tails only
    post-truncate changes; a truncate with nothing after it advances the
    cursor against an empty view."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    left.merge(
        orders_batch(spark, [(1, "a", 10, "I"), (2, "a", 20, "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right)
    assert len(view_state(view)) == 2
    # truncate, nothing after: view empties, cursor advances
    left.truncate_rows(100)
    sync_join_view(view, left, right)
    assert view_state(view) == set()
    assert join_view_cursor(view) == (left.current_version(), right.current_version())
    # post-truncate insert tails normally; pre-truncate rows stay gone
    left.merge(orders_batch(spark, [(3, "a", 30, "I")], 200), epoch_id=1, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    assert view_state(view) == recompute(left, right, "inner") == {(3, "a", 30, "gold", "eu")}


def test_left_truncate_and_reinsert_one_sync(spark, dirs):
    """Truncate AND later inserts inside ONE sync range: the mirror
    empties first, then the post-truncate changes land."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    left.merge(orders_batch(spark, [(1, "a", 10, "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    left.truncate_rows(100)
    left.merge(orders_batch(spark, [(2, "a", 20, "I")], 200), epoch_id=1, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    assert view_state(view) == recompute(left, right, "inner") == {(2, "a", 20, "gold", "eu")}


def test_right_truncate_full_refresh(spark, dirs):
    """A dimension TRUNCATE stales every row's enrichment: the sync falls
    back to a full refresh — inner drops unmatched orders, left nulls
    them; a new dimension row after the truncate re-enriches."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"], how="left")
    right.merge(
        cust_batch(spark, [("a", "gold", "eu", "I"), ("b", "iron", "us", "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    left.merge(
        orders_batch(spark, [(1, "a", 10, "I"), (2, "b", 20, "I")], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right)
    right.truncate_rows(100)
    right.merge(cust_batch(spark, [("a", "silver", "eu", "I")], 200), epoch_id=1, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    got = view_state(view)
    assert got == recompute(left, right, "left")
    assert got == {(1, "a", 10, "silver", "eu"), (2, "b", 20, None, None)}


def test_source_schema_divergence_raises_clearly(spark, dirs):
    """A source rename/drop of a view-carried column fails the sync with
    a clear recreate-the-view error instead of an UNRESOLVED_COLUMN deep
    in the plan; a source ADD is harmless (projected away)."""
    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"])
    left.merge(orders_batch(spark, [(1, "a", 10, "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    # ADD on either side: fine
    left.add_column("note", "string")
    right.add_column("flag", "string")
    left.merge(
        spark.createDataFrame(
            [(2, "a", 20, "x", "U", 50)],
            "oid long, cust string, amt long, note string, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    sync_join_view(view, left, right)
    assert (2, "a", 20, "gold", "eu") in view_state(view)
    # RENAME of a carried column: clear error
    right.rename_column("tier", "grade")
    right.merge(
        spark.createDataFrame(
            [("a", "iron", "us", None, "U", 60)],
            "cust string, grade string, region string, flag string, op string, lsn long",
        ),
        epoch_id=2, mode="mor", lsn_col="lsn",
    )
    with pytest.raises(ValueError, match="recreate the view"):
        sync_join_view(view, left, right)


def test_lag_gauge_and_bucket_bounded_write(spark, dirs):
    """join_view_lag reads three manifests, no jobs; and a sync touching
    ONE key writes delta files in exactly that key's bucket — the
    manifest-level proof of the O(affected) write claim."""
    from clever_canal_spark.lake.join_view import join_view_lag

    left, right = mk_sources(spark, dirs)
    view = create_join_view(spark, dirs[2], left, right, on=["cust"], n_buckets=8)
    right.merge(cust_batch(spark, [("a", "gold", "eu", "I")], 0), epoch_id=0, mode="mor", lsn_col="lsn")
    left.merge(
        orders_batch(spark, [(i, "a", 10 * i, "I") for i in range(1, 9)], 0),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    assert join_view_lag(view, left, right) == {
        "left": left.current_version(), "right": right.current_version()
    }
    sync_join_view(view, left, right)
    assert join_view_lag(view, left, right) == {"left": 0, "right": 0}

    # one-key update -> delta files confined to that key's bucket
    before = {f["path"] for f in view.snapshot().delta_files}
    left.merge(orders_batch(spark, [(3, "a", 999, "U")], 50), epoch_id=1, mode="mor", lsn_col="lsn")
    sync_join_view(view, left, right)
    new = [f for f in view.snapshot().delta_files if f["path"] not in before]
    assert new and len({f["bucket"] for f in new}) == 1
    assert (3, "a", 999, "gold", "eu") in view_state(view)
