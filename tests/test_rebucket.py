"""Partition evolution (LakeTable.rebucket): metadata-only bucket-count
change with spec-aware pruning, incremental COW migration, and the eager
migrate_bucket_spec rewrite."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable

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


def src(spark, rows, lsn0=0):
    df = spark.createDataFrame(
        [(u, TS, x, "D" if x is None else "U", lsn0 + i) for i, (u, x) in enumerate(rows)],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(t):
    return {(r["url"], r["text"]) for r in t.scan().collect()}


ROWS = [(f"u{i}", f"v{i}") for i in range(40)]


def test_rebucket_is_metadata_only_and_reads_stay_exact(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="mor", lsn_col="lsn")
    paths_before = {f["path"] for f in t.snapshot().files + t.snapshot().delta_files}
    v = t.rebucket(8)
    snap = t.snapshot()
    assert snap.version == v and snap.n_buckets == 8
    # zero data movement: identical file paths, old spec stamped
    assert {f["path"] for f in snap.files + snap.delta_files} == paths_before
    assert all(f["nb"] == 4 for f in snap.files + snap.delta_files)
    assert state(t) == set(ROWS)
    # point reads across the spec boundary
    looked = t.lookup(url="u7")
    assert {r["text"] for r in looked.collect()} == {"v7"}
    # pruning stays EXACT across the spec change: the point read opens a
    # strict subset of the table's files (old-spec residue matching)
    n_read = len(set(looked.inputFiles()))
    assert 0 < n_read < len(snap.files + snap.delta_files)
    got = {r["url"] for r in t.scan_for_keys(["u3", "u17"]).collect()}
    assert got == {"u3", "u17"}


def test_lww_reconciles_across_mixed_specs(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="mor", lsn_col="lsn")
    t.rebucket(8)
    # post-rebucket deltas (new spec) must out-order pre-rebucket base rows
    t.merge(src(spark, [("u7", "v7-new"), ("u9", None)], lsn0=100),
            epoch_id=1, mode="mor", lsn_col="lsn")
    assert ("u7", "v7-new") in state(t)
    assert not any(u == "u9" for u, _ in state(t))
    # and a LOWER-lsn late arrival after the spec change still loses
    t.merge(src(spark, [("u7", "stale")], lsn0=1), epoch_id=2, mode="mor", lsn_col="lsn")
    assert ("u7", "v7-new") in state(t)
    # lookup reconciles old-spec base + new-spec delta for the same key
    assert {r["text"] for r in t.lookup(url="u7").collect()} == {"v7-new"}
    assert t.lookup(url="u9").count() == 0


def test_rebucket_refuses_non_nesting_counts(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    with pytest.raises(ValueError, match="multiple or divisor"):
        t.rebucket(6)
    with pytest.raises(ValueError, match="already"):
        t.rebucket(4)
    t.rebucket(2)  # halving nests too
    assert t.snapshot().n_buckets == 2


def test_compact_folds_mixed_spec_deltas(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="mor", lsn_col="lsn")
    t.rebucket(8)
    t.merge(src(spark, [("u7", "v7-new")], lsn0=100), epoch_id=1,
            mode="mor", lsn_col="lsn")
    t.compact()
    snap = t.snapshot()
    assert snap.delta_files == []
    expected = (set(ROWS) - {("u7", "v7")}) | {("u7", "v7-new")}
    assert state(t) == expected
    assert {r["text"] for r in t.lookup(url="u7").collect()} == {"v7-new"}


def test_migrate_bucket_spec_rewrites_stale_files_only(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="mor", lsn_col="lsn")
    t.rebucket(8)
    before = state(t)
    v0 = t.current_version()
    v = t.migrate_bucket_spec()
    snap = t.snapshot()
    assert v == snap.version
    assert all((f.get("nb") or snap.n_buckets) == 8 for f in snap.files + snap.delta_files)
    assert state(t) == before
    # a rewrite of already-delivered rows: the changelog stays silent
    assert t.scan_changes(v0, v).count() == 0
    assert t.migrate_bucket_spec() is None


def test_cow_merge_migrates_touched_old_files(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="cow")
    t.rebucket(8)
    t.merge(src(spark, [("u7", "v7-new")], lsn0=100), epoch_id=1,
            mode="cow", lsn_col="lsn")
    snap = t.snapshot()
    expected = (set(ROWS) - {("u7", "v7")}) | {("u7", "v7-new")}
    assert state(t) == expected
    # the old-spec file covering u7's bucket was rewritten under spec 8;
    # old-spec files for untouched buckets survive untouched
    stale = [f for f in snap.files if (f.get("nb") or 8) != 8]
    fresh = [f for f in snap.files if (f.get("nb") or 8) == 8]
    assert fresh and stale and len(stale) < 4


def test_time_travel_across_rebucket(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    t.merge(src(spark, ROWS), epoch_id=0, mode="mor", lsn_col="lsn")
    v_pre = t.current_version()
    t.rebucket(8)
    t.merge(src(spark, [("u7", "v7-new")], lsn0=100), epoch_id=1,
            mode="mor", lsn_col="lsn")
    old = {(r["url"], r["text"]) for r in t.scan(version=v_pre).collect()}
    assert old == set(ROWS)


def test_randomized_soak_rebucket_merge_compact(spark, tmp_table_dir):
    """Seeded random interleaving of MOR/COW merges, nesting rebuckets,
    compactions, and a spec migration — final state and point lookups
    must match a dict-based reference apply (LWW by lsn, deletes erase)."""
    import random

    rnd = random.Random(42)
    t = make_table(spark, tmp_table_dir, n_buckets=4)
    ref: dict[str, tuple[int, str | None]] = {}  # url -> (lsn, text|None)
    lsn = 0
    nb = 4
    urls = [f"u{i}" for i in range(30)]
    for epoch in range(12):
        batch = []
        for _ in range(rnd.randint(3, 8)):
            u = rnd.choice(urls)
            delete = rnd.random() < 0.25
            batch.append((u, None if delete else f"v{lsn}"))
            prev = ref.get(u)
            if prev is None or lsn > prev[0]:
                ref[u] = (lsn, None if delete else f"v{lsn}")
            lsn += 1
        mode = rnd.choice(["mor", "mor", "cow"])
        t.merge(src(spark, batch, lsn0=lsn - len(batch)), epoch_id=epoch,
                mode=mode, lsn_col="lsn")
        roll = rnd.random()
        if roll < 0.25:
            new_nb = nb * 2 if (nb == 2 or rnd.random() < 0.5) else nb // 2
            t.rebucket(new_nb)
            nb = new_nb
        elif roll < 0.4:
            t.compact()
        elif roll < 0.5:
            t.migrate_bucket_spec()
    expected = {(u, v) for u, (_, v) in ref.items() if v is not None}
    assert state(t) == expected
    # bucket-pruned point reads agree with the reference for live, deleted,
    # and never-seen keys
    for u in ["u0", "u7", "u13", "u29", "nope"]:
        got = {r["text"] for r in t.lookup(url=u).collect()}
        want = ref.get(u)
        if want is None or want[1] is None:
            assert got == set(), u
        else:
            assert got == {want[1]}, u
    # a final full migration + compaction changes nothing
    t.migrate_bucket_spec()
    t.compact()
    assert state(t) == expected
