"""LakeTable: atomic commits, merge semantics, schema evolution, time travel,
exactly-once epoch registry."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def make_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=n_buckets
    )


def rows_of(df):
    return {(r["url"], str(r["warc_ts"]), r["text"]) for r in df.collect()}


def src(spark, triples, op="U"):
    df = spark.createDataFrame(
        [(u, t, x) for u, t, x in triples], "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    return df.withColumn("op", F.lit(op))


def test_create_scan_empty(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    assert t.scan().count() == 0
    assert t.current_version() == 1


def test_merge_insert_update_delete(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    r1 = t.merge(src(spark, [("a", "2024-01-01 00:00:00", "v1"), ("b", "2024-01-01 00:00:00", "v1")]), epoch_id=0)
    assert r1.applied
    assert rows_of(t.scan()) == {
        ("a", "2024-01-01 00:00:00", "v1"),
        ("b", "2024-01-01 00:00:00", "v1"),
    }
    # update a, insert c
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", "v2"), ("c", "2024-01-01 00:00:00", "v1")]), epoch_id=1)
    assert rows_of(t.scan()) == {
        ("a", "2024-01-01 00:00:00", "v2"),
        ("b", "2024-01-01 00:00:00", "v1"),
        ("c", "2024-01-01 00:00:00", "v1"),
    }
    # delete b
    t.merge(src(spark, [("b", "2024-01-01 00:00:00", None)], op="D"), epoch_id=2)
    assert {r[0] for r in rows_of(t.scan())} == {"a", "c"}


def test_merge_same_url_different_warc_ts_are_distinct_keys(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(
        src(spark, [("a", "2024-01-01 00:00:00", "v0"), ("a", "2024-01-01 01:00:00", "v1")]),
        epoch_id=0,
    )
    assert t.scan().count() == 2


def test_epoch_idempotence(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    s = src(spark, [("a", "2024-01-01 00:00:00", "v1")])
    r1 = t.merge(s, epoch_id=7)
    v = t.current_version()
    r2 = t.merge(s, epoch_id=7)  # replay
    assert r1.applied and not r2.applied
    assert t.current_version() == v
    assert t.scan().count() == 1
    assert t.is_epoch_committed(7)


def test_merge_prunes_untouched_buckets(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n_buckets=8)
    many = [(f"u{i}", "2024-01-01 00:00:00", f"v{i}") for i in range(64)]
    t.merge(src(spark, many), epoch_id=0)
    files_before = {f["path"]: f for f in t.snapshot().files}
    r = t.merge(src(spark, [("u1", "2024-01-01 00:00:00", "new")]), epoch_id=1)
    assert r.touched_buckets == 1
    files_after = t.snapshot().files
    untouched_kept = [f for f in files_after if f["path"] in files_before]
    # 7 of 8 buckets' files must carry over by reference
    kept_buckets = {f["bucket"] for f in untouched_kept}
    assert len(kept_buckets) == 7
    assert rows_of(t.scan()) >= {("u1", "2024-01-01 00:00:00", "new")}
    assert t.scan().count() == 64


def test_schema_evolution_add_rename_widen(spark, tmp_table_dir):
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        T.StructType(
            [T.StructField("url", T.StringType()), T.StructField("n", T.IntegerType())]
        ),
        merge_key=["url"],
        n_buckets=2,
    )
    df = spark.createDataFrame([("a", 1), ("b", 2)], "url string, n int").withColumn(
        "op", F.lit("U")
    )
    t.merge(df, epoch_id=0)

    t.add_column("score", "double")
    out = {r["url"]: r for r in t.scan().collect()}
    assert out["a"]["score"] is None

    t.rename_column("n", "count")
    out = {r["url"]: r for r in t.scan().collect()}
    assert out["b"]["count"] == 2  # old files read through field-id mapping

    t.widen_column("count", "bigint")
    assert dict(t.scan().dtypes)["count"] == "bigint"
    # new write in evolved schema; old + new files reconcile
    df2 = spark.createDataFrame(
        [("c", 3, 0.5)], "url string, count bigint, score double"
    ).withColumn("op", F.lit("U"))
    t.merge(df2, epoch_id=1)
    out = {r["url"]: (r["count"], r["score"]) for r in t.scan().collect()}
    assert out == {"a": (1, None), "b": (2, None), "c": (3, 0.5)}

    with pytest.raises(ValueError):
        t.widen_column("url", "int")


def test_time_travel(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", "v1")]), epoch_id=0)
    v1 = t.current_version()
    t.merge(src(spark, [("a", "2024-01-01 00:00:00", "v2")]), epoch_id=1)
    assert rows_of(t.scan(version=v1)) == {("a", "2024-01-01 00:00:00", "v1")}
    assert rows_of(t.scan()) == {("a", "2024-01-01 00:00:00", "v2")}


def test_commit_conflict(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    snap = t.snapshot()
    c1 = t._child(snap, operation="x")
    c2 = t._child(snap, operation="y")
    t._write_snapshot(c1)
    with pytest.raises(CommitConflict):
        t._write_snapshot(c2)


def test_lookup_point_read_prunes_buckets(spark, tmp_table_dir, monkeypatch):
    """lookup(url=...) must reconcile ONLY the key's bucket files."""
    t = make_table(spark, tmp_table_dir, n_buckets=8)
    rows = [(f"u{i}", "2024-01-01 00:00:00", f"v{i}") for i in range(64)]
    t.merge(src(spark, rows), epoch_id=0)
    t.merge(src(spark, [("u7", "2024-01-01 00:00:00", "v7b")]), epoch_id=1)

    seen_files = []
    orig = LakeTable._read_files

    def spy(self, snap, files, hidden=False):
        seen_files.append(list(files))
        return orig(self, snap, files, hidden)

    monkeypatch.setattr(LakeTable, "_read_files", spy)
    out = t.lookup(url="u7").collect()
    assert [(r["url"], r["text"]) for r in out] == [("u7", "v7b")]
    total_files = len(t.snapshot().files)
    read = sum(len(fs) for fs in seen_files)
    assert read < total_files, (read, total_files)  # bucket-pruned

    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.lookup(text="nope")  # bucket key column missing


def test_per_file_lsn_lineage(spark, tmp_table_dir):
    """Every MOR delta file records the source-LSN range that produced it
    (per-partition lineage, footer stats at write time); lineage() exposes
    file → (bucket, rows, lsn range, snapshot) with zero Spark jobs."""
    t = make_table(spark, tmp_table_dir)
    s1 = src(spark, [("u1", "2024-01-01 00:00:00", "a"),
                     ("u2", "2024-01-01 00:00:00", "b")]).withColumn(
        "lsn", F.when(F.col("url") == "u1", F.lit(10)).otherwise(F.lit(20)))
    t.merge(s1, epoch_id=0, mode="mor", lsn_col="lsn")
    s2 = src(spark, [("u3", "2024-01-01 00:00:00", "c")]).withColumn("lsn", F.lit(30))
    t.merge(s2, epoch_id=1, mode="mor", lsn_col="lsn")

    lin = t.lineage()
    deltas = [f for f in lin if f["kind"] == "delta"]
    assert deltas and all(f["lsn_min"] is not None for f in deltas)
    assert min(f["lsn_min"] for f in deltas) == 10
    assert max(f["lsn_max"] for f in deltas) == 30
    assert sum(f["rows"] for f in deltas) == 3
    # epoch-0 files only cover lsn <= 20; epoch-1 file covers exactly 30
    e1_files = [f for f in deltas if f["lsn_min"] == 30]
    assert e1_files and all(f["lsn_max"] == 30 for f in e1_files)

    # compaction folds deltas into base; lineage survives (base files keep
    # __lsn stats) and the delta list empties
    t.compact()
    lin2 = t.lineage()
    assert not [f for f in lin2 if f["kind"] == "delta"]
    base = [f for f in lin2 if f["kind"] == "base" and f["rows"]]
    assert min(f["lsn_min"] for f in base) == 10
    assert max(f["lsn_max"] for f in base) == 30


def test_expire_snapshots_and_vacuum(spark, tmp_table_dir):
    """Retention GC: expired snapshots disappear from the log; vacuum
    removes data files only expired snapshots referenced (plus stale
    .stage dirs), never files a retained snapshot needs, and never files
    younger than the orphan TTL."""
    import os

    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("u1", "2024-01-01 00:00:00", "a")]), epoch_id=0)
    t.merge(src(spark, [("u1", "2024-01-01 00:00:00", "b")]), epoch_id=1)  # rewrites u1's bucket
    t.merge(src(spark, [("u2", "2024-01-01 00:00:00", "c")]), epoch_id=2)
    v_head = t.current_version()
    n_data_before = len(os.listdir(os.path.join(tmp_table_dir, "data")))
    os.makedirs(os.path.join(tmp_table_dir, ".stage-dead"))

    expired = t.expire_snapshots(keep_last=1)
    assert expired and t.current_version() == v_head
    import pytest

    with pytest.raises(FileNotFoundError):
        t.snapshot(expired[0])

    # TTL guard: nothing young gets deleted
    res = t.vacuum(orphan_ttl_s=3600)
    assert not res["removed_files"] and res["removed_stage_dirs"] == 0

    res = t.vacuum(orphan_ttl_s=0)
    assert res["removed_files"] and res["removed_stage_dirs"] == 1
    # the live state is intact and fully readable
    assert rows_of(t.scan()) == {
        ("u1", "2024-01-01 00:00:00", "b"),
        ("u2", "2024-01-01 00:00:00", "c"),
    }
    # every retained-referenced file survived
    snap = t.snapshot()
    for f in snap.files + snap.delta_files:
        assert os.path.exists(os.path.join(tmp_table_dir, f["path"]))
    assert len(os.listdir(os.path.join(tmp_table_dir, "data"))) < n_data_before

    # incremental reads from a cursor below the retention window raise
    # the REBUILD contract, not a bare FileNotFoundError
    from clever_canal_spark.lake.table import SnapshotExpired

    with pytest.raises(SnapshotExpired, match="rebuild the consumer"):
        t.scan_changes(expired[0], v_head)
    with pytest.raises(SnapshotExpired, match="rebuild the consumer"):
        t.truncates_between(expired[0], v_head)


def test_lookup_prunes_files_by_key_range(spark, tmp_table_dir, monkeypatch):
    """Within a bucket, a point read must skip files whose footer
    [key_min, key_max] range excludes the probe (Iceberg bound-pruning
    analog): 3 MOR epochs with disjoint url ranges land 3 delta files in
    ONE bucket; lookup('m1') may open only the middle one."""
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=1
    )
    for e, urls in enumerate([("a1", "a2"), ("m1", "m2"), ("z1", "z2")]):
        d = src(spark, [(u, "2024-01-01 00:00:00", f"v{e}") for u in urls])
        t.merge(d.withColumn("lsn", F.lit(e + 1).cast("long")),
                epoch_id=e, op_col="op", mode="mor", lsn_col="lsn")
    snap = t.snapshot()
    assert len(snap.delta_files) == 3
    assert all(f.get("key_min") and f.get("key_max") for f in snap.delta_files)

    read = []
    orig = LakeTable._read_files

    def spy(self, s, files, hidden=False):
        read.extend(files)
        return orig(self, s, files, hidden=hidden)

    monkeypatch.setattr(LakeTable, "_read_files", spy)
    got = rows_of(t.lookup(url="m1"))
    monkeypatch.undo()
    assert got == {("m1", "2024-01-01 00:00:00", "v1")}
    assert len(read) == 1  # only the m-range file was opened

    # scan_for_keys prunes the same way, keeping every covering file
    read.clear()
    monkeypatch.setattr(LakeTable, "_read_files", spy)
    got2 = {r["url"] for r in t.scan_for_keys(["a1", "z2"]).collect()}
    monkeypatch.undo()
    assert got2 == {"a1", "z2"} and len(read) == 2

    # full scans are untouched by stats pruning
    assert t.scan().count() == 6


def test_timestamp_bucket_key_commits_without_stats(spark, tmp_table_dir):
    """Key-range stats are recorded only for JSON-representable scalar
    types — a timestamp bucket key must commit fine (stats skipped), not
    crash the snapshot serialization."""
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, merge_key=["warc_ts", "url"], n_buckets=2
    )
    d = src(spark, [("u1", "2024-01-01 00:00:00", "a")])
    t.merge(d.withColumn("lsn", F.lit(1).cast("long")),
            epoch_id=0, op_col="op", mode="mor", lsn_col="lsn")
    files = t.snapshot().delta_files
    assert files and all(f.get("key_min") is None for f in files)
    import datetime

    got = rows_of(t.lookup(warc_ts=datetime.datetime(2024, 1, 1), url="u1"))
    assert got == {("u1", "2024-01-01 00:00:00", "a")}


def test_schema_history(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    t.add_column("score", "double")
    t.rename_column("score", "rank")
    hist = t.schema_history()
    assert [h["schema_version"] for h in hist] == [0, 1, 2]
    assert hist[-1]["current"] and not hist[0]["current"]
    assert "rank" in [f["name"] for f in hist[-1]["fields"]]
    assert "score" in [f["name"] for f in hist[1]["fields"]]


def test_compact_clusters_rows_by_key(spark, tmp_table_dir):
    """compact(cluster=True) — the Iceberg sort-order rewrite analog —
    must physically order every rewritten bucket file by (bucket key,
    merge key, __lsn) so pushed-down key predicates can skip row groups
    inside big base files; the logical table must be unchanged."""
    import pyarrow.parquet as pq

    t = make_table(spark, tmp_table_dir, n_buckets=2)
    # interleaved keys across several MOR epochs -> write-order is jumbled
    for e in range(3):
        triples = [
            (f"u{(i * 7) % 10}", f"2024-01-0{e + 1} 00:00:00", f"v{e}-{i}")
            for i in range(10)
        ]
        df = src(spark, triples).withColumn("lsn", F.lit(e * 100) + F.monotonically_increasing_id())
        t.merge(df, epoch_id=e, mode="mor", lsn_col="lsn")
    before = rows_of(t.scan())
    assert t.compact() is not None
    assert rows_of(t.scan()) == before  # rewrite is logically invisible

    snap = t.snapshot()
    assert snap.delta_files == [] and snap.files
    checked_rows = 0
    for f in snap.files:
        tbl = pq.read_table(f"{t.path}/{f['path']}", columns=["url", "warc_ts", "__lsn"])
        keys = list(zip(tbl.column("url").to_pylist(),
                        [str(x) for x in tbl.column("warc_ts").to_pylist()],
                        tbl.column("__lsn").to_pylist()))
        assert keys == sorted(keys), f["path"]
        checked_rows += len(keys)
    assert checked_rows >= 20  # the fixture actually exercised multi-row files


def test_epoch_registry_pruning(spark, tmp_table_dir, monkeypatch):
    """The committed-epoch registry is bounded: beyond the retention
    depth the oldest distinct epoch ids collapse into the snapshot's
    watermark — per-commit metadata stays O(retention) however long a
    sync loop runs — while idempotence (is_epoch_committed) and the
    lag frontier (lsn_max) survive the pruning."""
    import os

    from clever_canal_spark.lake import table as table_mod

    monkeypatch.setattr(table_mod, "_EPOCH_RETENTION", 8)
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "treg"),
        T.StructType([T.StructField("k", T.StringType(), False)]),
        merge_key=["k"], n_buckets=2,
    )
    for e in range(20):
        assert t.commit_epoch_marker(e, {"lsn_max": 100 + e}) is not None

    snap = t.snapshot()
    # registry bounded at the retention depth; watermark took the rest
    assert len(snap.committed_epochs) == 8
    assert sorted(int(k) for k in snap.committed_epochs) == list(range(12, 20))
    assert snap.epoch_watermark == 11
    assert snap.epoch_watermark_lsn_max == 111  # frontier of the pruned span

    # idempotence must hold for EVERY epoch ever committed, pruned or not
    for e in range(20):
        assert t.is_epoch_committed(e), e
        assert t.commit_epoch_marker(e) is None  # replay no-ops
    # an id above the watermark that never committed is NOT committed
    assert not t.is_epoch_committed(25)
    # segment keys share their parent epoch's prefix
    assert t.is_epoch_committed("5:0")

    # fresh-object reopen reads the same state (watermark persisted)
    t2 = LakeTable(spark, t.path)
    assert t2.snapshot().epoch_watermark == 11
    assert t2.is_epoch_committed(0)


def test_rollup_cursor_survives_registry_pruning(spark, tmp_table_dir, monkeypatch):
    """A view whose entire registry pruned into the watermark still
    reports the right cursor (max consumed version)."""
    import os

    from clever_canal_spark.lake import rollup as rollup_mod
    from clever_canal_spark.lake import table as table_mod
    from clever_canal_spark.lake.rollup import rollup_cursor

    monkeypatch.setattr(table_mod, "_EPOCH_RETENTION", 4)
    v = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "vreg"),
        T.StructType([T.StructField("g", T.StringType(), False)]),
        merge_key=["g"], n_buckets=2,
    )
    for ver in range(3, 15):
        v.commit_epoch_marker(ver)
    assert rollup_cursor(v) == 14
    assert len(v.snapshot().committed_epochs) == 4
