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
