"""Named refs (tags), shallow clone, and write-audit-publish branches."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import (
    LakeTable,
    PublishConflict,
    branch_table,
    drop_branch,
    fork_branch,
    list_branches,
    publish_branch,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)
TS = "2024-01-01 00:00:00"


def make_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=n_buckets
    )


def src(spark, pairs, op="U", lsn0=0):
    """pairs: [(url, text)]; fixed warc_ts; lsn = lsn0 + index."""
    df = spark.createDataFrame(
        [(u, TS, x, op, lsn0 + i) for i, (u, x) in enumerate(pairs)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(t, **scan_kw):
    return {(r["url"], r["text"]) for r in t.scan(**scan_kw).collect()}


# -- tags -------------------------------------------------------------------


def test_tag_create_resolve_scan_drop(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    v = t.create_tag("after-e0")
    t.merge(src(spark, [("a", "v2")], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
    assert t.resolve_ref("after-e0") == v
    assert state(t, ref="after-e0") == {("a", "v1")}
    assert state(t) == {("a", "v2")}
    with pytest.raises(ValueError):
        t.scan(version=v, ref="after-e0")  # mutually exclusive
    with pytest.raises(ValueError):
        t.create_tag("after-e0")  # immutable
    t.drop_tag("after-e0")
    with pytest.raises(ValueError):
        t.resolve_ref("after-e0")
    with pytest.raises(ValueError):
        t.create_tag("bad/name")


def test_tag_pins_against_expire(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    tagged = t.create_tag("keep")
    for e in range(1, 4):
        t.merge(src(spark, [("a", f"v{e+1}")], lsn0=10 * e), epoch_id=e,
                mode="mor", lsn_col="lsn")
    expired = t.expire_snapshots(keep_last=1)
    assert tagged not in expired  # pinned
    assert state(t, ref="keep") == {("a", "v1")}  # time travel by name survives
    with pytest.raises(Exception):
        t.snapshot(1)  # untagged old snapshot really expired


# -- shallow clone ----------------------------------------------------------


def test_clone_reads_source_and_diverges(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1"), ("b", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    c = t.clone_to(tmp_table_dir + "-clone")
    try:
        assert state(c) == state(t) == {("a", "v1"), ("b", "v1")}
        # clone diverges without touching the source
        c.merge(src(spark, [("a", "c1")], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
        assert state(c) == {("a", "c1"), ("b", "v1")}
        assert state(t) == {("a", "v1"), ("b", "v1")}
        # source vacuum can't eat files the source still references; the
        # clone keeps reading them
        t.vacuum(orphan_ttl_s=0)
        assert state(c) == {("a", "c1"), ("b", "v1")}
        # clone vacuum sweeps only its own data dir — source intact
        c.vacuum(orphan_ttl_s=0)
        assert state(t) == {("a", "v1"), ("b", "v1")}
        # exactly-once carried over: the source's epoch no-ops on the clone
        assert not c.merge(src(spark, [("z", "dup")]), epoch_id=0,
                           mode="mor", lsn_col="lsn").applied
        with pytest.raises(ValueError):
            t.clone_to(tmp_table_dir + "-clone")  # dest exists
    finally:
        import shutil

        shutil.rmtree(tmp_table_dir + "-clone", ignore_errors=True)


# -- write-audit-publish ----------------------------------------------------


def test_wap_fast_forward_publish(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1"), ("b", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "audit-e1")
    assert "audit-e1" in list_branches(t)
    b.merge(src(spark, [("a", "v2"), ("c", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    # audit: branch shows the staged state, main is untouched
    assert state(b) == {("a", "v2"), ("b", "v1"), ("c", "v1")}
    assert state(t) == {("a", "v1"), ("b", "v1")}
    v = publish_branch(t, "audit-e1")
    assert t.current_version() == v
    assert state(t) == {("a", "v2"), ("b", "v1"), ("c", "v1")}
    # sealed: the branch name is finished
    assert "audit-e1" not in list_branches(t)
    with pytest.raises(ValueError):
        branch_table(t, "audit-e1")
    # exactly-once survived the publish: the branch's epoch no-ops on main
    assert not t.merge(src(spark, [("z", "dup")]), epoch_id=1,
                       mode="mor", lsn_col="lsn").applied


def test_wap_drop_is_rollback(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "bad-batch")
    b.merge(src(spark, [("a", "OOPS")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    drop_branch(t, "bad-batch")
    assert "bad-batch" not in list_branches(t)
    assert state(t) == {("a", "v1")}
    # the rejected epoch never committed — replaying it on main applies
    assert t.merge(src(spark, [("a", "v2")], lsn0=10), epoch_id=1,
                   mode="mor", lsn_col="lsn").applied


def test_wap_fast_forward_conflict_and_reparent(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    b.merge(src(spark, [("b", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    # main advances under the branch
    t.merge(src(spark, [("c", "v1")], lsn0=20), epoch_id=2, mode="mor", lsn_col="lsn")
    with pytest.raises(PublishConflict):
        publish_branch(t, "wap")
    # additive re-parent is allowed explicitly; LWW by lsn reconciles
    publish_branch(t, "wap", require_fast_forward=False)
    assert state(t) == {("a", "v1"), ("b", "v1"), ("c", "v1")}


def test_wap_same_epoch_both_sides_refused(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    b.merge(src(spark, [("b", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    t.merge(src(spark, [("b", "OTHER")], lsn0=10), epoch_id=1, mode="mor", lsn_col="lsn")
    with pytest.raises(PublishConflict, match="BOTH"):
        publish_branch(t, "wap", require_fast_forward=False)


def test_wap_nonadditive_branch_refused(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    b.merge(src(spark, [("b", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    b.compact()  # rewrites shared files → no longer re-parentable
    with pytest.raises(PublishConflict, match="additive"):
        publish_branch(t, "wap")
    drop_branch(t, "wap")


def test_wap_schema_change_refused(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    b.add_column("lang", "string")
    with pytest.raises(PublishConflict, match="schema"):
        publish_branch(t, "wap")
    drop_branch(t, "wap")


def test_wap_empty_branch_publish_noop(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    fork_branch(t, "idle")
    v0 = t.current_version()
    assert publish_branch(t, "idle") == v0  # nothing staged → no new snapshot


def test_sealed_branch_data_swept_after_compaction(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    b.merge(src(spark, [("b", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    publish_branch(t, "wap")
    bdir = os.path.join(t.path, "_branches", "wap")
    assert os.path.isdir(bdir)
    # main still references _branches/wap/data files → vacuum keeps them
    t.vacuum(orphan_ttl_s=0)
    assert state(t) == {("a", "v1"), ("b", "v1")}
    # compaction folds those rows into main's own data dir; expire the old
    # snapshots that still reference the branch files, then vacuum retires
    # the sealed dir entirely
    t.compact()
    t.expire_snapshots(keep_last=1)
    res = t.vacuum(orphan_ttl_s=0)
    assert res["removed_sealed_branches"] == 1
    assert not os.path.isdir(bdir)
    assert state(t) == {("a", "v1"), ("b", "v1")}


def test_fork_pins_parent_against_gc(spark, tmp_table_dir):
    """A branch reads main's files by absolute path — the fork's wap-{name}
    pin tag must keep them alive through a main-side expire + compact +
    vacuum cycle, and be released on publish/drop."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1"), ("b", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "wap")
    assert t.resolve_ref("wap-wap") == t.current_version()
    # main moves on aggressively: more epochs, compaction, retention, GC
    for e in range(1, 4):
        t.merge(src(spark, [("a", f"v{e+1}")], lsn0=10 * e), epoch_id=e,
                mode="mor", lsn_col="lsn")
    t.compact()
    t.expire_snapshots(keep_last=1)
    t.vacuum(orphan_ttl_s=0)
    # the branch still reads its fork-time state
    assert state(b) == {("a", "v1"), ("b", "v1")}
    drop_branch(t, "wap")
    with pytest.raises(ValueError):
        t.resolve_ref("wap-wap")  # pin released with the branch
    # and a publish releases it too
    b2 = fork_branch(t, "wap2")
    b2.merge(src(spark, [("c", "v1")], lsn0=99), epoch_id=9,
             mode="mor", lsn_col="lsn", compact_every=0)
    publish_branch(t, "wap2")
    with pytest.raises(ValueError):
        t.resolve_ref("wap-wap2")


def test_history_operation_log(spark, tmp_table_dir):
    """DESCRIBE HISTORY analog: the retained chain, newest first, with
    the operations that produced it — publish and tags included."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1")]), epoch_id=0, mode="mor", lsn_col="lsn")
    b = fork_branch(t, "h")
    b.merge(src(spark, [("b", "v1")], lsn0=10), epoch_id=1,
            mode="mor", lsn_col="lsn", compact_every=0)
    publish_branch(t, "h")
    h = t.history()
    assert [e["version"] for e in h] == [3, 2, 1]
    assert h[0]["operation"].startswith("publish:h@")
    assert h[1]["operation"] == "merge-mor:epoch=0"
    assert h[2]["operation"] == "create"
    assert h[0]["n_committed_epochs"] == 2 and h[0]["rows"] >= 2
    t.expire_snapshots(keep_last=1)
    assert [e["version"] for e in t.history()] == [3]
