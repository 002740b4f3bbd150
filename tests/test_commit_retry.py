"""Optimistic commit retry for concurrent MOR committers.

Two writers race on the same snapshot version; the loser's already-written
delta entries re-parent onto the winner's head and the CAS retries — the
Iceberg commit loop (additive delta manifests + LWW-on-__lsn reconciliation
make concurrent MOR merges commutative). The race is injected
DETERMINISTICALLY: writer A's filesystem seam runs writer B's whole commit
just before A's snapshot CAS, so A's first attempt always conflicts.
"""

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


def make_table(spark, path):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )


def src(spark, triples, lsn, op="U"):
    df = spark.createDataFrame(
        [(u, t, x) for u, t, x in triples], "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    return df.withColumn("op", F.lit(op)).withColumn("lsn", F.lit(lsn).cast("long"))


class _RaceFS:
    """Delegating MetadataFS proxy: before the FIRST exclusive snapshot
    write (the commit CAS), run ``interloper()`` — another writer's full
    commit — so the wrapped writer's attempt deterministically loses."""

    def __init__(self, inner, interloper):
        self._inner = inner
        self._interloper = interloper
        self.fired = False

    def write_text_exclusive(self, path, text):
        import os

        if not self.fired and os.path.basename(path).startswith("v"):
            self.fired = True
            self._interloper()
        return self._inner.write_text_exclusive(path, text)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def rows_of(t):
    return {(r["url"], r["text"]) for r in t.scan().collect()}


def test_concurrent_mor_commits_retry_and_union(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    writer_b = LakeTable(spark, tmp_table_dir)

    def b_commits():
        writer_b.merge(
            src(spark, [("b1", "2024-01-01 00:00:00", "from-b")], lsn=20),
            epoch_id=2, mode="mor", lsn_col="lsn",
        )

    writer_a = LakeTable(spark, tmp_table_dir, fs=_RaceFS(t._fs, b_commits))
    r = writer_a.merge(
        src(spark, [("a1", "2024-01-01 00:00:00", "from-a")], lsn=10),
        epoch_id=1, mode="mor", lsn_col="lsn", commit_retries=2,
    )
    assert r.applied
    fresh = LakeTable(spark, tmp_table_dir)
    assert rows_of(fresh) == {("a1", "from-a"), ("b1", "from-b")}
    assert fresh.is_epoch_committed(1) and fresh.is_epoch_committed(2)
    # A's retried commit sits ON TOP of B's (linear history, no lost update)
    ops = [h["operation"] for h in fresh.history()]
    assert ops[0] == "merge-mor:epoch=1" and ops[1] == "merge-mor:epoch=2"


def test_conflict_without_retries_still_raises(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    writer_b = LakeTable(spark, tmp_table_dir)

    def b_commits():
        writer_b.merge(
            src(spark, [("b1", "2024-01-01 00:00:00", "from-b")], lsn=20),
            epoch_id=2, mode="mor", lsn_col="lsn",
        )

    writer_a = LakeTable(spark, tmp_table_dir, fs=_RaceFS(t._fs, b_commits))
    with pytest.raises(CommitConflict):
        writer_a.merge(
            src(spark, [("a1", "2024-01-01 00:00:00", "from-a")], lsn=10),
            epoch_id=1, mode="mor", lsn_col="lsn",
        )
    # loser's work is invisible; a re-run applies exactly once
    fresh = LakeTable(spark, tmp_table_dir)
    assert rows_of(fresh) == {("b1", "from-b")}
    fresh.merge(
        src(spark, [("a1", "2024-01-01 00:00:00", "from-a")], lsn=10),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    assert rows_of(fresh) == {("a1", "from-a"), ("b1", "from-b")}


def test_same_epoch_raced_applies_exactly_once(spark, tmp_table_dir):
    """If the interloper committed the SAME epoch id, the loser must come
    back applied=False (exactly-once across competing workers)."""
    t = make_table(spark, tmp_table_dir)
    writer_b = LakeTable(spark, tmp_table_dir)

    def b_commits_same_epoch():
        writer_b.merge(
            src(spark, [("x", "2024-01-01 00:00:00", "winner")], lsn=20),
            epoch_id=7, mode="mor", lsn_col="lsn",
        )

    writer_a = LakeTable(spark, tmp_table_dir, fs=_RaceFS(t._fs, b_commits_same_epoch))
    r = writer_a.merge(
        src(spark, [("x", "2024-01-01 00:00:00", "loser")], lsn=10),
        epoch_id=7, mode="mor", lsn_col="lsn", commit_retries=3,
    )
    assert not r.applied
    fresh = LakeTable(spark, tmp_table_dir)
    assert rows_of(fresh) == {("x", "winner")}
    # the loser's orphaned delta files are reclaimable, not referenced
    fresh.compact()
    fresh.vacuum(orphan_ttl_s=0)
    assert rows_of(LakeTable(spark, tmp_table_dir)) == {("x", "winner")}


def test_concurrent_truncate_refuses_reparent(spark, tmp_table_dir):
    """A TRUNCATE that lands mid-race erases state at-or-below its LSN
    watermark; re-parenting a delta whose rows sit below it would
    resurrect erased rows — the retry must refuse, not silently apply."""
    t = make_table(spark, tmp_table_dir)
    t.merge(
        src(spark, [("old", "2024-01-01 00:00:00", "pre")], lsn=5),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    writer_b = LakeTable(spark, tmp_table_dir)

    def b_truncates():
        writer_b.truncate_rows(lsn=50)

    writer_a = LakeTable(spark, tmp_table_dir, fs=_RaceFS(t._fs, b_truncates))
    with pytest.raises(CommitConflict, match="TRUNCATE"):
        writer_a.merge(
            src(spark, [("a1", "2024-01-01 00:00:00", "from-a")], lsn=10),
            epoch_id=1, mode="mor", lsn_col="lsn", commit_retries=2,
        )
    assert rows_of(LakeTable(spark, tmp_table_dir)) == set()
    # rows ABOVE the watermark re-parent fine under the same race
    writer_c = LakeTable(
        spark, tmp_table_dir,
        fs=_RaceFS(t._fs, lambda: writer_b.merge(
            src(spark, [("b2", "2024-01-01 00:00:00", "late-b")], lsn=70),
            epoch_id=3, mode="mor", lsn_col="lsn",
        )),
    )
    r = writer_c.merge(
        src(spark, [("a2", "2024-01-01 00:00:00", "late-a")], lsn=60),
        epoch_id=2, mode="mor", lsn_col="lsn", commit_retries=2,
    )
    assert r.applied
    assert rows_of(LakeTable(spark, tmp_table_dir)) == {
        ("a2", "late-a"), ("b2", "late-b")
    }


def test_cow_conflict_never_retries(spark, tmp_table_dir):
    """COW rewrites buckets read from the PRE-conflict base — a retry
    would silently drop the interloper's rows, so COW must raise even
    when retries were requested."""
    t = make_table(spark, tmp_table_dir)
    writer_b = LakeTable(spark, tmp_table_dir)

    def b_commits():
        writer_b.merge(
            src(spark, [("b1", "2024-01-01 00:00:00", "from-b")], lsn=20)
            .drop("lsn"),
            epoch_id=2,
        )

    writer_a = LakeTable(spark, tmp_table_dir, fs=_RaceFS(t._fs, b_commits))
    with pytest.raises(CommitConflict):
        writer_a.merge(
            src(spark, [("a1", "2024-01-01 00:00:00", "from-a")], lsn=10)
            .drop("lsn"),
            epoch_id=1, commit_retries=5,
        )
