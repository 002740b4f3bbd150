"""Changelog rollup view (lake/rollup.py): additive maintenance equals
a from-scratch aggregate of the change stream; exactly-once across
replays and reopen; out-of-order shard LSNs never drop counts."""

import os

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable, create_rollup, hot_groups, sync_rollup

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("text", T.StringType()),
])


def _changes(spark, rows):
    return spark.createDataFrame(rows, "url string, text string, op string, lsn bigint")


def _mk(spark, tmp, name):
    return LakeTable.create(
        spark, os.path.join(tmp, name), SCHEMA, merge_key=["url"], n_buckets=4
    )


def _state(view):
    return {
        r["url"]: (r["n_changes"], r["n_upserts"], r["n_deletes"], r["last_lsn"])
        for r in view.scan().collect()
    }


def test_rollup_tracks_change_stream(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, "src")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v"), "url", n_buckets=4)

    t.merge(_changes(spark, [("a", "x", "I", 1), ("b", "y", "I", 2)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    assert _state(view) == {"a": (1, 1, 0, 1), "b": (1, 1, 0, 2)}

    # epoch 1: a updated twice, b deleted. A raw merge() writes BOTH a-rows
    # to the delta (pre-dedup lives in apply_epoch, not merge), so the
    # rollup counts 3 changelog rows for a — change TRAFFIC, by design
    t.merge(_changes(spark, [("a", "x2", "U", 10), ("a", "x3", "U", 11),
                             ("b", None, "D", 12)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    assert _state(view) == {"a": (3, 3, 0, 11), "b": (2, 1, 1, 12)}

    # already current -> no-op, version unchanged
    v = view.current_version()
    assert sync_rollup(view, t) == 0
    assert view.current_version() == v

    assert {r["url"] for r in hot_groups(view, 2).collect()} == {"a", "b"}


def test_rollup_single_sync_spans_epochs_and_reopen(spark, tmp_table_dir):
    """One sync over several lake versions equals per-version syncs; the
    cursor lives in the view's own epoch registry, so a fresh-object
    reopen resumes with no sidecar."""
    t = _mk(spark, tmp_table_dir, "src2")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v2"), "url", n_buckets=4)
    t.merge(_changes(spark, [("a", "x", "I", 1)]), epoch_id=0,
            op_col="op", mode="mor", lsn_col="lsn")
    t.merge(_changes(spark, [("a", "y", "U", 5), ("c", "z", "I", 6)]), epoch_id=1,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 2
    assert _state(view) == {"a": (2, 2, 0, 5), "c": (1, 1, 0, 6)}

    reopened = LakeTable(spark, view.path)
    assert sync_rollup(reopened, t) == 0  # cursor survives reopen


def test_rollup_out_of_order_shard_lsn(spark, tmp_table_dir):
    """A LATER epoch carrying a LOWER feed lsn (lagging shard) must still
    add its counts — the merge ordinal is the consumed lake version, not
    the feed lsn."""
    t = _mk(spark, tmp_table_dir, "src3")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v3"), "url", n_buckets=4)
    t.merge(_changes(spark, [("a", "new", "U", 100)]), epoch_id=0,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    t.merge(_changes(spark, [("a", "old", "U", 50)]), epoch_id=1,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    # both stream winners counted; last_lsn stays at the frontier
    assert _state(view) == {"a": (2, 2, 0, 100)}


def test_rollup_sync_reads_only_touched_buckets(spark, tmp_table_dir, monkeypatch):
    """The read-modify-write must prune the view read to the buckets the
    delta's groups hash into — never a full view scan (the property that
    keeps a sync O(changes) at 10^10 groups)."""
    t = _mk(spark, tmp_table_dir, "src5")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v5"), "url", n_buckets=8)
    t.merge(_changes(spark, [(f"u{i}", "x", "I", i + 1) for i in range(64)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1  # seed: every view bucket populated

    seen = {}
    orig = LakeTable._reconciled

    def spy(self, snap, buckets=None, keep_deletes=False):
        if self.path == view.path:
            seen["buckets"] = buckets
        return orig(self, snap, buckets=buckets, keep_deletes=keep_deletes)

    monkeypatch.setattr(LakeTable, "_reconciled", spy)
    t.merge(_changes(spark, [("u3", "y", "U", 100)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    assert seen["buckets"] is not None and len(seen["buckets"]) == 1
    monkeypatch.undo()
    assert _state(view)["u3"] == (2, 2, 0, 100)


def test_rollup_start_after_skips_history(spark, tmp_table_dir):
    """create_rollup(start_after=head) begins counting at NOW — required
    for long-lived tables (O(changes), not O(history)) and for tables
    whose early snapshots were expired."""
    from clever_canal_spark.lake import SnapshotExpired

    t = _mk(spark, tmp_table_dir, "src6")
    t.merge(_changes(spark, [("a", "x", "I", 1)]), epoch_id=0,
            op_col="op", mode="mor", lsn_col="lsn")
    t.merge(_changes(spark, [("a", "y", "U", 2)]), epoch_id=1,
            op_col="op", mode="mor", lsn_col="lsn")
    t.expire_snapshots(keep_last=1)

    # a 0-cursor view cannot tail past retention: clear contract error
    v0 = create_rollup(spark, os.path.join(tmp_table_dir, "v6a"), "url", n_buckets=4)
    import pytest
    with pytest.raises(SnapshotExpired):
        sync_rollup(v0, t)

    # start_after=head: tail only what comes next
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v6b"), "url",
                         n_buckets=4, start_after=t.current_version())
    assert sync_rollup(view, t) == 0
    t.merge(_changes(spark, [("b", "z", "I", 3)]), epoch_id=2,
            op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t) >= 1
    assert _state(view) == {"b": (1, 1, 0, 3)}  # history before NOW not counted


batches_strategy = st.lists(  # 1-3 epochs of 1-6 change rows each
    st.lists(
        st.tuples(st.integers(0, 3), st.booleans()),  # (key idx, is_delete)
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=3,
)


@settings(max_examples=8, deadline=None)
@given(batches_strategy)
def test_rollup_property_matches_python(spark, tmp_path_factory, batches):
    """For arbitrary epoch batches, per-sync incremental maintenance ==
    one-shot rebuild == a Python reference over the raw change rows.
    (`spark` is session-scoped in conftest, so hypothesis's function-
    scoped-fixture health check does not apply.)"""
    base = str(tmp_path_factory.mktemp("rollupprop"))
    t = _mk(spark, base, "src")
    view = create_rollup(spark, os.path.join(base, "v"), "url", n_buckets=2)
    lsn, want = 0, {}
    for e, batch in enumerate(batches):
        rows = []
        for k, is_d in batch:
            lsn += 1
            key = f"k{k}"
            rows.append((key, None if is_d else f"t{lsn}", "D" if is_d else "U", lsn))
            n, u, d, _ = want.get(key, (0, 0, 0, 0))
            want[key] = (n + 1, u + (0 if is_d else 1), d + (1 if is_d else 0), lsn)
        t.merge(_changes(spark, rows), epoch_id=e, op_col="op", mode="mor", lsn_col="lsn")
        assert sync_rollup(view, t) >= 1  # per-epoch incremental sync
    assert _state(view) == want
    fresh = create_rollup(spark, os.path.join(base, "vf"), "url", n_buckets=2)
    sync_rollup(fresh, t)  # one-shot over the whole changelog
    assert _state(fresh) == want


def test_rollup_marker_only_version_advances_cursor(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, "src4")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v4"), "url", n_buckets=4)
    t.commit_epoch_marker(0)
    assert sync_rollup(view, t) >= 1
    assert _state(view) == {}
    assert sync_rollup(view, t) == 0  # cursor advanced past the marker


def test_rollup_derived_group_expr(spark, tmp_table_dir):
    """group_expr: the view groups by an expression DERIVED from the
    source merge key (here a url prefix) — the hypertable/continuous-
    aggregate shape. Counts must land under the derived group, including
    for delete rows (key-derived groups are well-defined on D markers)."""
    t = _mk(spark, tmp_table_dir, "srcg")
    view = create_rollup(spark, os.path.join(tmp_table_dir, "vg"), "shard",
                         n_buckets=4)
    t.merge(_changes(spark, [("apple", "x", "I", 1), ("avocado", "y", "U", 2),
                             ("banana", None, "D", 3)]),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t, group_expr=F.substring("url", 1, 1)) >= 1
    got = {r["shard"]: (r["n_changes"], r["n_upserts"], r["n_deletes"], r["last_lsn"])
           for r in view.scan().collect()}
    assert got == {"a": (2, 2, 0, 2), "b": (1, 0, 1, 3)}
    # second wave keeps adding under the derived groups
    t.merge(_changes(spark, [("apple", "z", "U", 9)]),
            epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_rollup(view, t, group_expr=F.substring("url", 1, 1)) >= 1
    assert {r["shard"]: r["n_changes"] for r in view.scan().collect()} == {"a": 3, "b": 1}


def test_pipeline_maintains_rollup_per_microbatch(spark, tmp_table_dir):
    """CdcPipeline(rollup_view=...) keeps the view in lockstep with the
    sink across micro-batches, stays exactly-once across a re-drain of
    the same checkpoint, and picks up a second feed wave. COW sinks are
    refused."""
    import pytest as _pytest

    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.lake import rollup_cursor
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans.apply import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import CdcPipeline

    src = os.path.join(tmp_table_dir, "feed")
    cfgf = FeedConfig(n_events=400, n_urls=30, seed=11)
    feed = generate_feed(spark, cfgf)
    write_feed_slices(feed, src, n_slices=2, n_events=cfgf.n_events)

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    view = create_rollup(spark, os.path.join(tmp_table_dir, "v"), "url",
                         n_buckets=4)
    with _pytest.raises(ValueError, match="mor"):
        CdcPipeline(spark, src, os.path.join(tmp_table_dir, "ck0"), table,
                    ApplyConfig(merge_mode="cow"), rollup_view=view)

    ckpt = os.path.join(tmp_table_dir, "ckpt")
    pipe = CdcPipeline(spark, src, ckpt, table,
                       ApplyConfig(merge_mode="mor", transform=False),
                       max_files_per_trigger=1, rollup_view=view)
    pipe.run_until_drained()
    assert rollup_cursor(view) == table.current_version()
    state1 = {r["url"]: r["n_changes"] for r in view.scan().collect()}
    assert sum(state1.values()) > 0

    # re-drain with nothing new: no replays, no double counts
    pipe.run_until_drained()
    assert {r["url"]: r["n_changes"] for r in view.scan().collect()} == state1

    # second wave lands in the same source dir under LATER slice names
    # (write_feed_slices numbers from 0, which would overwrite wave 1)
    import shutil

    feed2 = generate_feed(spark, FeedConfig(n_events=200, n_urls=30, seed=12))
    stage = os.path.join(tmp_table_dir, "wave2")
    for i, f in enumerate(write_feed_slices(feed2, stage, n_slices=1,
                                            n_events=200)):
        shutil.move(f, os.path.join(src, f"binlog-9{i:05d}-000.parquet"))
    pipe.run_until_drained()
    state2 = {r["url"]: r["n_changes"] for r in view.scan().collect()}
    assert sum(state2.values()) > sum(state1.values())
    assert rollup_cursor(view) == table.current_version()
    feed.unpersist(); feed2.unpersist()


def test_cow_sync_hooks_guard(spark, tmp_table_dir):
    """The COW guard covers the generic sync_hooks mechanism, not just
    the rollup_view field: an additive consumer plugged in as a hook
    would double-count COW re-emits. The explicit opt-out exists for
    LWW-idempotent / state-diff hooks."""
    import os

    import pytest

    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans.apply import ApplyConfig
    from clever_canal_spark.streaming.pipeline import CdcPipeline

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "sink"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=2,
    )
    hook = lambda t: None  # noqa: E731
    with pytest.raises(ValueError, match="sync_hooks under merge_mode='cow'"):
        CdcPipeline(spark, "/tmp/nope", "/tmp/nope-ck", table,
                    ApplyConfig(merge_mode="cow"), sync_hooks=(hook,))
    # opt-out constructs; mor constructs
    CdcPipeline(spark, "/tmp/nope", "/tmp/nope-ck", table,
                ApplyConfig(merge_mode="cow"), sync_hooks=(hook,),
                allow_cow_sync_hooks=True)
    CdcPipeline(spark, "/tmp/nope", "/tmp/nope-ck", table,
                ApplyConfig(merge_mode="mor"), sync_hooks=(hook,))
