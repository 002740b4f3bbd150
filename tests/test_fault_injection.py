"""Systematic crash-fault injection over the MetadataFS seam.

The hand-picked crash tests (test_lake / test_follower / the soaks)
kill the writer at a few interesting points; this file proves the
general claim behind them: **every** prefix of the commit protocol's
mutating metadata operations leaves the table recoverable. A FaultFS
wrapper raises *instead of executing* the k-th mutation — the writer
"crashes" having completed exactly the first k-1 — and k sweeps from 1
until the whole protocol runs fault-free, so every crash point between
two metadata mutations is exercised, not just the ones a human thought
of.

Invariants asserted after every injected crash, from a fresh reopen:

- metadata parses (no torn snapshot — the exclusive-create commit is
  the only way state becomes visible),
- the logical table equals exactly the pre-epoch or the post-epoch
  state (all-or-nothing: staged/moved data files are invisible until
  the snapshot references them),
- the exactly-once epoch registry agrees with the visible state,
- vacuum(orphan_ttl_s=0) reclaims crash litter without changing the
  logical table, and
- replaying the SAME epoch converges to the post-epoch state and
  ``applied`` is True iff the crashed attempt had not committed.

Reference contract: a crashed consumer must converge on redelivery and
never double-apply (CanalServerWithEmbedded.java:253-398 get/ack/
rollback); here the "consumer" is the lake commit protocol itself.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.fs import LocalFS, MetadataFS

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)
TS = "2024-01-01 00:00:00"
SWEEP_CAP = 80  # runaway guard, far above any real mutation count


class InjectedFault(OSError):
    pass


class FaultFS(MetadataFS):
    """Raises InjectedFault instead of executing the ``fail_at``-th
    mutating operation (1-based), and keeps failing afterwards — a dead
    process performs no further writes, including except/finally
    cleanup. Reads always succeed (we model writer death, not storage
    corruption). ``fail_at=0`` disables injection (pure op counter)."""

    def __init__(self, inner: MetadataFS, fail_at: int = 0):
        self._inner = inner
        self.fail_at = fail_at
        self.mutations = 0
        self.trace: list = []

    def _mutate(self, op: str, path: str) -> None:
        self.mutations += 1
        self.trace.append((op, path))
        if self.fail_at and self.mutations >= self.fail_at:
            raise InjectedFault(f"mutation #{self.mutations}: {op} {path}")

    # mutators -------------------------------------------------------
    def makedirs(self, path):
        self._mutate("makedirs", path)
        self._inner.makedirs(path)

    def write_text_exclusive(self, path, text):
        self._mutate("write_text_exclusive", path)
        self._inner.write_text_exclusive(path, text)

    def write_bytes(self, path, data):
        self._mutate("write_bytes", path)
        self._inner.write_bytes(path, data)

    def move(self, src, dst):
        self._mutate("move", dst)
        self._inner.move(src, dst)

    def remove(self, path):
        self._mutate("remove", path)
        self._inner.remove(path)

    def rmtree(self, path):
        self._mutate("rmtree", path)
        self._inner.rmtree(path)

    # reads ----------------------------------------------------------
    def listdir(self, path):
        return self._inner.listdir(path)

    def read_text(self, path):
        return self._inner.read_text(path)

    def open_binary(self, path):
        return self._inner.open_binary(path)

    def exists(self, path):
        return self._inner.exists(path)

    def isdir(self, path):
        return self._inner.isdir(path)

    def mtime(self, path):
        return self._inner.mtime(path)


def _src(spark, rows, op_default="U"):
    """rows: (url, text_or_None, lsn[, op]) at the shared TS key."""
    data = [
        (r[0], TS, r[1], int(r[2]), (r[3] if len(r) > 3 else op_default))
        for r in rows
    ]
    return spark.createDataFrame(
        data, "url string, warc_ts string, text string, lsn long, op string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def _state(t, version=None):
    return {
        (r["url"], r["text"]) for r in t.scan(version=version).collect()
    }


E0 = [("a", "v1", 10), ("b", "v1", 11), ("c", "v1", 12)]
# epoch 1: update a, insert d, delete b — all three op kinds in one epoch
E1 = [("a", "v2", 20), ("d", "v1", 21), ("b", None, 22, "D")]
STATE0 = {("a", "v1"), ("b", "v1"), ("c", "v1")}
STATE1 = {("a", "v2"), ("c", "v1"), ("d", "v1")}


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_every_merge_crash_prefix_recovers(spark, tmp_table_dir, mode):
    k, faults_seen = 1, 0
    while True:
        d = os.path.join(tmp_table_dir, f"{mode}-k{k}")
        t = LakeTable.create(
            spark, d, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
        )
        t.merge(_src(spark, E0), epoch_id=0, mode=mode, lsn_col="lsn")
        assert _state(t) == STATE0

        ffs = FaultFS(LocalFS(), fail_at=k)
        fired = False
        try:
            LakeTable(spark, d, fs=ffs).merge(
                _src(spark, E1), epoch_id=1, mode=mode, lsn_col="lsn"
            )
        except InjectedFault:
            fired = True
        if not fired:
            # the whole protocol issued < k mutations: sweep complete
            assert _state(LakeTable(spark, d)) == STATE1
            break
        faults_seen += 1

        # fresh "process": recover and check the invariants
        r = LakeTable(spark, d)
        st = _state(r)
        committed = r.is_epoch_committed(1)
        assert st in (STATE0, STATE1), f"torn state after fault at k={k}: {st}"
        assert committed == (st == STATE1), (
            f"registry/state disagree at k={k}: committed={committed} state={st}"
        )
        # crash litter (orphan stage dirs / unreferenced data files) is
        # reclaimable without changing the logical table
        r.vacuum(orphan_ttl_s=0.0)
        assert _state(r) == st
        # redelivery converges, exactly once
        res = r.merge(_src(spark, E1), epoch_id=1, mode=mode, lsn_col="lsn")
        assert res.applied == (not committed)
        assert _state(r) == STATE1
        assert not r.merge(
            _src(spark, E1), epoch_id=1, mode=mode, lsn_col="lsn"
        ).applied

        k += 1
        assert k < SWEEP_CAP, f"runaway sweep: trace={ffs.trace}"
    # the protocol really has multiple distinct crash points (staged-file
    # moves, stage cleanup, snapshot commit at minimum)
    assert faults_seen >= 3, f"only {faults_seen} mutation points found"


def test_every_compaction_crash_prefix_is_invisible(spark, tmp_table_dir):
    """Compaction is a pure rewrite: a crash at ANY point must leave the
    logical table byte-identical, and a later compact() must succeed.
    Each k compacts a zero-copy shallow clone of one shared MOR table
    (clone writes land in the clone's dir; the parent is never touched)."""
    base_dir = os.path.join(tmp_table_dir, "base")
    base = LakeTable.create(
        spark, base_dir, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    base.merge(_src(spark, E0), epoch_id=0, mode="mor", lsn_col="lsn")
    base.merge(_src(spark, E1), epoch_id=1, mode="mor", lsn_col="lsn")
    assert _state(base) == STATE1
    assert base.snapshot().delta_files, "fixture must have deltas to fold"

    k, faults_seen = 1, 0
    while True:
        d = os.path.join(tmp_table_dir, f"clone-k{k}")
        base.clone_to(d)
        ffs = FaultFS(LocalFS(), fail_at=k)
        fired = False
        try:
            LakeTable(spark, d, fs=ffs).compact()
        except InjectedFault:
            fired = True
        r = LakeTable(spark, d)
        assert _state(r) == STATE1, f"compaction crash at k={k} changed the table"
        if not fired:
            assert not r.snapshot().delta_files
            break
        faults_seen += 1
        # recovery: the retry folds the deltas and the table is unchanged
        r.vacuum(orphan_ttl_s=0.0)
        assert _state(r) == STATE1
        r.compact()
        assert _state(r) == STATE1
        assert not r.snapshot().delta_files
        k += 1
        assert k < SWEEP_CAP, f"runaway sweep: trace={ffs.trace}"
    assert faults_seen >= 2, f"only {faults_seen} mutation points found"


def test_fault_on_first_mutation_of_create(spark, tmp_table_dir):
    """Creation itself is all-or-nothing: a crash during create leaves no
    table (exists() False), and a clean retry succeeds in place."""
    d = os.path.join(tmp_table_dir, "t")
    with pytest.raises(InjectedFault):
        LakeTable.create(
            spark, d, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2,
            fs=FaultFS(LocalFS(), fail_at=3),
        )
    assert not LakeTable(spark, d).exists()
    t = LakeTable.create(
        spark, d, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    assert t.exists() and t.current_version() == 1


def test_every_rebucket_migrate_crash_prefix_recovers(spark, tmp_table_dir):
    """Partition evolution under the same all-prefixes sweep: rebucket is
    one snapshot commit (crash → old spec, retry succeeds); a crashed
    migrate_bucket_spec is invisible (pure rewrite, like compaction) and
    a retry completes the migration."""
    base_dir = os.path.join(tmp_table_dir, "base")
    base = LakeTable.create(
        spark, base_dir, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    base.merge(_src(spark, E0), epoch_id=0, mode="mor", lsn_col="lsn")
    base.merge(_src(spark, E1), epoch_id=1, mode="mor", lsn_col="lsn")

    # -- rebucket: metadata-only, so the sweep is short but must still be
    # all-or-nothing under every prefix
    k = 1
    while True:
        d = os.path.join(tmp_table_dir, f"rb-k{k}")
        base.clone_to(d)
        ffs = FaultFS(LocalFS(), fail_at=k)
        fired = False
        try:
            LakeTable(spark, d, fs=ffs).rebucket(4)
        except InjectedFault:
            fired = True
        r = LakeTable(spark, d)
        assert _state(r) == STATE1
        if not fired:
            assert r.snapshot().n_buckets == 4
            break
        assert r.snapshot().n_buckets == 2  # crash → fully old spec
        r.rebucket(4)
        assert r.snapshot().n_buckets == 4 and _state(r) == STATE1
        k += 1
        assert k < SWEEP_CAP

    # -- migrate: pure rewrite, crash at any prefix leaves the table
    # byte-identical and still fully readable under the mixed spec
    mig_src = os.path.join(tmp_table_dir, "mig-src")
    base.clone_to(mig_src)
    mig = LakeTable(spark, mig_src)
    mig.rebucket(4)
    k, faults_seen = 1, 0
    while True:
        d = os.path.join(tmp_table_dir, f"mig-k{k}")
        mig.clone_to(d)
        ffs = FaultFS(LocalFS(), fail_at=k)
        fired = False
        try:
            LakeTable(spark, d, fs=ffs).migrate_bucket_spec()
        except InjectedFault:
            fired = True
        r = LakeTable(spark, d)
        assert _state(r) == STATE1, f"migrate crash at k={k} changed the table"
        if not fired:
            snap = r.snapshot()
            assert all((f.get("nb") or 4) == 4 for f in snap.files + snap.delta_files)
            break
        faults_seen += 1
        r.vacuum(orphan_ttl_s=0.0)
        assert _state(r) == STATE1
        r.migrate_bucket_spec()
        assert _state(r) == STATE1
        k += 1
        assert k < SWEEP_CAP
    assert faults_seen >= 2
