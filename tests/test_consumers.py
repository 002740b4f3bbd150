"""Multi-subscriber consumer cursors over the lake changelog.

The reference keeps one durable cursor + an in-memory unacked-batch list
PER CLIENT (MemoryMetaManager.java:19-318) and serves them through
getWithoutAck / ack / rollback (CanalServerWithEmbedded.java:253-398).
These tests drive the Spark analog (lake/consumers.py): N independent
consumers tail one LakeTable, each at its own pace; unacked batches are
redelivered byte-identically after a crash; duplicate ack/rollback are
tolerated no-ops."""

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import Consumer, LakeTable, MemFS

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def make_table(spark, path, fs=None):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url"], n_buckets=4, fs=fs
    )


def mor(table, rows, epoch, op="U"):
    """One MOR epoch: rows = [(url, text, lsn)]."""
    df = table.spark.createDataFrame(
        [(u, x, l) for u, x, l in rows], "url string, text string, lsn long"
    ).withColumn("op", F.lit(op))
    table.merge(df, epoch_id=epoch, mode="mor", lsn_col="lsn")


def delivered(batch):
    return {(r["url"], r["text"], r["__op"], r["__lsn"]) for r in batch.df.collect()}


def test_independent_consumers_each_pace(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    v0 = t.current_version()
    mor(t, [("a", "v1", 1), ("b", "v1", 2)], epoch=0)
    mor(t, [("a", "v2", 3)], epoch=1)
    mor(t, [("b", None, 4)], epoch=2, op="D")

    slow = Consumer(t, "slow", start_after=v0)
    fast = Consumer(t, "fast", start_after=v0)

    # fast drains everything in one batch
    fb = fast.get(max_versions=None)
    assert fb is not None and fast.get() is None
    assert fb.from_version == v0 and fb.to_version == t.current_version()

    # slow drains version-by-version; the union equals fast's one batch
    union = set()
    n_batches = 0
    while (b := slow.get_without_ack(max_versions=1)) is not None:
        union |= delivered(b)
        slow.ack(b.batch_id)
        n_batches += 1
    assert n_batches == 3
    assert union == delivered(fb)
    assert delivered(fb) == {
        r for r in (
            ("a", "v1", "U", 1), ("b", "v1", "U", 2),
            ("a", "v2", "U", 3), ("b", None, "D", 4),
        )
    }

    # registry sees both, with independent (here equal) cursors
    cursors = Consumer.list_all(t)
    assert set(cursors) == {"slow", "fast"}
    assert cursors["slow"] == cursors["fast"] == t.current_version()


def test_crash_redelivers_unacked_batch(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    v0 = t.current_version()
    mor(t, [("a", "v1", 1)], epoch=0)
    mor(t, [("a", "v2", 2)], epoch=1)

    c = Consumer(t, "billing", start_after=v0)
    b1 = c.get_without_ack(max_versions=1)
    got = delivered(b1)
    # crash before ack: the object dies, only the durable cursor survives
    del c
    c2 = Consumer(t, "billing")  # resubscribe — seed must NOT overwrite
    assert c2.cursor() == v0
    rb = c2.get_without_ack(max_versions=1)
    assert (rb.from_version, rb.to_version) == (b1.from_version, b1.to_version)
    assert delivered(rb) == got  # byte-identical redelivery
    c2.ack(rb.batch_id)
    assert c2.cursor() == rb.to_version


def test_ack_is_high_water_and_duplicate_tolerant(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    v0 = t.current_version()
    mor(t, [("a", "v1", 1)], epoch=0)
    mor(t, [("b", "v1", 2)], epoch=1)
    c = Consumer(t, "c", start_after=v0)
    b1 = c.get_without_ack(max_versions=1)
    b2 = c.get_without_ack(max_versions=1)
    assert b2.from_version == b1.to_version  # pipelined slices are contiguous
    # acking the NEWER batch implicitly acks the older one
    c.ack(b2.batch_id)
    assert c.cursor() == b2.to_version
    c.ack(b2.batch_id)  # duplicate ack: no-op
    c.ack(b1.batch_id)  # older-than-cursor ack: no-op
    with pytest.raises(KeyError):
        c.ack(b2.batch_id + 999)  # never delivered


def test_rollback_redelivers_from_cursor(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    v0 = t.current_version()
    mor(t, [("a", "v1", 1)], epoch=0)
    mor(t, [("b", "v1", 2)], epoch=1)
    c = Consumer(t, "c", start_after=v0)
    b1 = c.get_without_ack(max_versions=1)
    c.get_without_ack(max_versions=1)
    c.rollback()
    nxt = c.get_without_ack()  # one batch covering both rolled-back slices
    assert nxt.from_version == v0 and nxt.to_version == t.current_version()
    # duplicate rollback of an acked batch is tolerated
    c.ack(nxt.batch_id)
    c.rollback(b1.batch_id)
    with pytest.raises(KeyError):
        c.rollback(nxt.batch_id + 999)


def test_new_subscriber_defaults_to_head(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    mor(t, [("a", "v1", 1)], epoch=0)
    c = Consumer(t, "late")  # default seed = current head
    assert c.get_without_ack() is None  # history not replayed
    mor(t, [("a", "v2", 2)], epoch=1)
    b = c.get_without_ack()
    assert delivered(b) == {("a", "v2", "U", 2)}


def test_truncate_surfaces_in_batch(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    v0 = t.current_version()
    mor(t, [("a", "v1", 1)], epoch=0)
    t.truncate_rows(5)
    mor(t, [("b", "v1", 6)], epoch=1)
    c = Consumer(t, "mirror", start_after=v0)
    b = c.get_without_ack()
    assert [tr["lsn"] for tr in b.truncates] == [5]
    assert delivered(b) == {("a", "v1", "U", 1), ("b", "v1", "U", 6)}


def test_unsubscribe_and_memfs_cursor_lifecycle(spark):
    """The cursor store rides MetadataFS only — full subscribe / seed /
    ack-file / list / unsubscribe lifecycle on MemFS (no POSIX)."""
    fs = MemFS()
    t = make_table(spark, "/mem/pages", fs=fs)
    c = Consumer(t, "m1", start_after=0)
    assert Consumer.list_all(t) == {"m1": 0}
    c._write_cursor(7)  # durable ack write path, pruning included
    assert Consumer(t, "m1").cursor() == 7
    c.unsubscribe()
    assert Consumer.list_all(t) == {}
    with pytest.raises(ValueError):
        Consumer(t, "../evil")


def test_downstream_mirror_via_consumer_protocol(spark, tmp_table_dir):
    """The full replication contract: a second LakeTable maintained ONLY
    through the consumer protocol (get_without_ack -> merge -> ack, one
    idempotent mirror epoch per batch_id) converges to the source table —
    including across a consumer crash that redelivers an applied-but-
    unacked batch (the mirror's epoch registry absorbs the replay)."""
    src_t = make_table(spark, f"{tmp_table_dir}/src")
    mirror = make_table(spark, f"{tmp_table_dir}/mirror")
    v0 = src_t.current_version()
    mor(src_t, [("a", "v1", 1), ("b", "v1", 2)], epoch=0)
    mor(src_t, [("a", "v2", 3), ("c", "v1", 4)], epoch=1)
    mor(src_t, [("b", None, 5)], epoch=2, op="D")

    def apply_batch(b):
        mirror.merge(
            b.df, epoch_id=b.batch_id, mode="mor",
            op_col="__op", lsn_col="__lsn",
        )

    c = Consumer(src_t, "mirror", start_after=v0)
    b1 = c.get_without_ack(max_versions=1)
    apply_batch(b1)
    # CRASH between apply and ack: redelivery must not double-apply
    del c
    c2 = Consumer(src_t, "mirror")
    rb = c2.get_without_ack(max_versions=1)
    assert rb.batch_id == b1.batch_id
    apply_batch(rb)  # replayed epoch -> merge no-ops via the registry
    c2.ack(rb.batch_id)
    while (b := c2.get_without_ack(max_versions=1)) is not None:
        apply_batch(b)
        c2.ack(b.batch_id)

    src_rows = {(r["url"], r["text"]) for r in src_t.scan().collect()}
    mir_rows = {(r["url"], r["text"]) for r in mirror.scan().collect()}
    assert mir_rows == src_rows == {("a", "v2"), ("c", "v1")}


def test_empty_client_id_rejected(spark, tmp_table_dir):
    """'' would resolve the cursor dir to the _consumers root: shared
    cursors, invisible to list_all, and unsubscribe() rmtree'ing every
    other client's durable state."""
    import os

    import pytest
    from pyspark.sql import types as T

    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.lake.consumers import Consumer

    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tcid"),
        T.StructType([T.StructField("k", T.StringType(), False)]),
        merge_key=["k"], n_buckets=1,
    )
    with pytest.raises(ValueError, match="plain name"):
        Consumer(t, "")
