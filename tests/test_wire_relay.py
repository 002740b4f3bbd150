"""State-level wire relay: table A's changelog exported as FlatMessage
documents (the MQ topic a reference deployment publishes), consumed back
through the real decode path, and merged into table B — final state
parity proves the encode/decode pair composes into the full
node→MQ→consumer chain, not just a per-message round trip."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.sources.flat_message import (
    decode_flat_message,
    export_flat_messages,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("lang", T.StringType()),
    ]
)


@pytest.fixture()
def dirs():
    d = [tempfile.mkdtemp(prefix=f"ccs-relay-{i}-") for i in range(2)]
    yield d
    for p in d:
        shutil.rmtree(p, ignore_errors=True)


def test_changelog_through_wire_format_rebuilds_state(spark, dirs):
    a = LakeTable.create(spark, dirs[0], SCHEMA, merge_key=["url"], n_buckets=4)
    a.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "en", "I", i + 1) for i in range(12)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    a.merge(
        spark.createDataFrame(
            [("u3", 99, "de", "U", 100), ("u5", None, None, "D", 101)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )

    # publish: one FlatMessage JSON per change row (typed cols as strings)
    msgs = export_flat_messages(
        a, 0, database="cc", table_name="pages",
        data_cols=[
            ("url", "coalesce(CAST(url AS STRING), '')"),
            ("rank", "coalesce(CAST(rank AS STRING), '')"),
            ("lang", "coalesce(CAST(lang AS STRING), '')"),
        ],
    )

    # consume: real decode path -> typed frame -> ordinary LWW merge
    dec = decode_flat_message(msgs, "value")
    typed = dec.select(
        F.element_at("data", "url").alias("url"),
        F.expr("try_cast(element_at(data, 'rank') AS int)").alias("rank"),
        F.when(
            F.element_at("data", "lang") == "", F.lit(None)
        ).otherwise(F.element_at("data", "lang")).alias("lang"),
        F.col("op"),
        F.col("es").cast("long").alias("lsn"),
    )
    b = LakeTable.create(spark, dirs[1], SCHEMA, merge_key=["url"], n_buckets=4)
    b.merge(typed, epoch_id=0, mode="mor", lsn_col="lsn")

    left, right = b.scan(), a.scan()
    assert left.schema == right.schema
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0
    assert left.filter(F.col("url") == "u5").count() == 0  # delete relayed
    assert left.filter(F.col("url") == "u3").collect()[0]["rank"] == 99


def test_incremental_export_connector(spark, dirs, tmp_table_dir):
    """export_flat_messages_to_dir: durable-cursor MQ connector — each
    call ships only the new versions as a deterministically-named batch
    dir; replay with no news is a no-op; the crash window (batch
    written, cursor not) re-exports the same message set over the same
    dir; a fresh process resumes from the cursor file."""
    import json
    import os

    from clever_canal_spark.sources.flat_message import (
        export_flat_messages_to_dir,
    )

    t = LakeTable.create(spark, dirs[0], SCHEMA, merge_key=["url"], n_buckets=4)
    out = os.path.join(tmp_table_dir, "mq")
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "en", "I", i + 1) for i in range(8)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    r1 = export_flat_messages_to_dir(t, out, database="cc", table_name="pages")
    assert r1["consumed"] >= 1 and r1["n_messages"] == 8
    assert os.path.basename(r1["path"]).startswith("batch-00000001-")
    # nothing new -> no-op, no new dirs
    assert export_flat_messages_to_dir(t, out)["consumed"] == 0
    dirs1 = sorted(d for d in os.listdir(out) if d.startswith("batch-"))
    assert len(dirs1) == 1

    # wave 2: update + delete ship as exactly the delta
    t.merge(
        spark.createDataFrame(
            [("u3", 99, "de", "U", 100), ("u5", None, None, "D", 101)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    r2 = export_flat_messages_to_dir(t, out, database="cc", table_name="pages")
    assert r2["consumed"] == 1 and r2["n_messages"] == 2
    lines = [json.loads(r.value)
             for r in spark.read.text(r2["path"]).collect()]
    assert sorted(m["type"] for m in lines) == ["DELETE", "UPDATE"]
    assert all(m["database"] == "cc" and m["table"] == "pages" for m in lines)

    # crash window: cursor lost after the batch wrote -> re-export
    # produces the same line SET over the same directory
    before = sorted(r.value for r in spark.read.text(r2["path"]).collect())
    with open(os.path.join(out, "_cursor.json")) as fh:
        cur = json.load(fh)
    os.remove(os.path.join(out, "_cursor.json"))
    # reset cursor to the pre-wave-2 version (as a crash there would see)
    with open(os.path.join(out, "_cursor.json"), "w") as fh:
        json.dump({"version": cur["version"] - r2["consumed"]}, fh)
    r3 = export_flat_messages_to_dir(t, out, database="cc", table_name="pages")
    assert r3["path"] == r2["path"]
    after = sorted(r.value for r in spark.read.text(r3["path"]).collect())
    assert after == before


def test_partitioned_export_queue_layout(spark, dirs, tmp_table_dir):
    """mq= routing on the connector: batch dirs gain a
    mq_topic=/mq_partition= queue layout, every key's messages stay in
    one partition across batches, and the line SET equals the
    unpartitioned export's."""
    import json
    import os

    from clever_canal_spark.sources.flat_message import (
        export_flat_messages,
        export_flat_messages_to_dir,
    )
    from clever_canal_spark.sources.mq_partition import MQRoutingConfig

    mq = MQRoutingConfig(
        topic="pages", partitions_num=4,
        partition_hash=(("cc\\.pages", ("$pk$",)),),
    )
    t = LakeTable.create(spark, dirs[0], SCHEMA, merge_key=["url"], n_buckets=4)
    out = os.path.join(tmp_table_dir, "mqp")
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "en", "I", i + 1) for i in range(16)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    r1 = export_flat_messages_to_dir(
        t, out, database="cc", table_name="pages", mq=mq)
    assert r1["n_messages"] == 16
    subdirs = sorted(os.listdir(r1["path"]))
    assert any(d == "mq_topic=pages" for d in subdirs)
    parts = sorted(os.listdir(os.path.join(r1["path"], "mq_topic=pages")))
    assert all(p.startswith("mq_partition=") for p in parts)
    assert 1 <= len(parts) <= 4

    # key -> partition map from wave 1
    back = spark.read.text(r1["path"])  # partition discovery adds cols
    w1 = {
        json.loads(r["value"])["data"][0]["url"]: r["mq_partition"]
        for r in back.collect()
    }
    assert len(w1) == 16

    # wave 2 touches two keys: same partitions as wave 1
    t.merge(
        spark.createDataFrame(
            [("u3", 99, "de", "U", 100), ("u5", None, None, "D", 101)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    r2 = export_flat_messages_to_dir(
        t, out, database="cc", table_name="pages", mq=mq)
    for r in spark.read.text(r2["path"]).collect():
        url = json.loads(r["value"])["data"][0]["url"]
        assert r["mq_partition"] == w1[url]

    # content parity with the unpartitioned encode (same line SET)
    flat = sorted(
        r["value"]
        for r in export_flat_messages(
            t, 0, r1["consumed"], database="cc", table_name="pages"
        ).collect()
    )
    got = sorted(r["value"] for r in spark.read.text(r1["path"]).collect())
    assert got == flat


def test_consumer_tail_get_ack(spark, dirs, tmp_table_dir):
    """tail_flat_messages: the Canal-client get/ack loop over the file
    queue — per-partition subtree tail, durable cursor, crash-before-ack
    redelivery, nothing-new no-op."""
    import os

    from clever_canal_spark.sources.flat_message import (
        export_flat_messages_to_dir,
        tail_flat_messages,
    )
    from clever_canal_spark.sources.mq_partition import MQRoutingConfig

    mq = MQRoutingConfig(topic="pages", partitions_num=2,
                         partition_hash=(("cc\\.pages", ("$pk$",)),))
    t = LakeTable.create(spark, dirs[0], SCHEMA, merge_key=["url"], n_buckets=4)
    out = os.path.join(tmp_table_dir, "q")
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "en", "I", i + 1) for i in range(12)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    export_flat_messages_to_dir(t, out, database="cc", table_name="pages", mq=mq)

    cur = os.path.join(tmp_table_dir, "worker0.json")
    df0, ack0 = tail_flat_messages(spark, out, cur, topic="pages", partition=0)
    df1, ack1 = tail_flat_messages(
        spark, out, os.path.join(tmp_table_dir, "worker1.json"),
        topic="pages", partition=1)
    n0 = df0.count() if df0 is not None else 0
    n1 = df1.count() if df1 is not None else 0
    assert n0 + n1 == 12 and n0 > 0 and n1 > 0

    # crash before ack: same messages redelivered
    again, _ = tail_flat_messages(spark, out, cur, topic="pages", partition=0)
    assert again.count() == n0
    ack0()
    none_new, _ = tail_flat_messages(spark, out, cur, topic="pages", partition=0)
    assert none_new is None

    # wave 2: only the delta arrives; per-key partition stability means
    # u3's update lands in the partition that saw its insert
    t.merge(
        spark.createDataFrame(
            [("u3", 99, "de", "U", 100)],
            "url string, rank int, lang string, op string, lsn long",
        ),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    export_flat_messages_to_dir(t, out, database="cc", table_name="pages", mq=mq)
    w0, a0 = tail_flat_messages(spark, out, cur, topic="pages", partition=0)
    w1b, _ = tail_flat_messages(
        spark, out, os.path.join(tmp_table_dir, "worker1.json"),
        topic="pages", partition=1)
    got0 = [] if w0 is None else [r["data"]["url"] for r in w0.collect()]
    got1 = [] if w1b is None else [r["data"]["url"] for r in w1b.collect()]
    # worker1 never acked wave 1 — it re-sees wave 1 + maybe the update
    assert sorted(set(got0) | set(got1) - {f"u{i}" for i in range(12)}) \
        in ([], ["u3"])
    assert ("u3" in got0) + ("u3" in got1) == 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="both topic and partition"):
        tail_flat_messages(spark, out, cur, topic="pages")
