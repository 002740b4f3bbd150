"""Row-level provenance (lake/provenance.py): winner lsn/op, pruned
can-contain file set with introducing commits, and the registry epochs
whose LSN range covers the row — including provenance of an absence
(tombstoned key) and survival across compaction + retention expiry."""

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clever_canal_spark.lake import LakeTable, row_provenance

SCHEMA = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("rank", T.IntegerType())]
)


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="ccs-prov-")
    t = LakeTable.create(spark, d, SCHEMA, merge_key=["url"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "U", i + 1) for i in range(10)],
            "url string, rank int, op string, lsn long",
        ),
        epoch_id=0, lineage={"lsn_min": 1, "lsn_max": 10},
        mode="mor", lsn_col="lsn",
    )
    t.merge(
        spark.createDataFrame(
            [("u3", 99, "U", 100), ("u5", None, "D", 101)],
            "url string, rank int, op string, lsn long",
        ),
        epoch_id=1, lineage={"lsn_min": 100, "lsn_max": 101},
        mode="mor", lsn_col="lsn",
    )
    yield t
    shutil.rmtree(d, ignore_errors=True)


def test_winner_file_and_epoch(spark, table):
    p = row_provenance(table, url="u3")
    assert p["found"] and p["row"] == {"lsn": 100, "op": "U"}
    assert [e["epoch_id"] for e in p["epochs"]] == ["1"]
    assert all(f["lsn_min"] <= 100 <= f["lsn_max"] for f in p["files"])
    assert all(f["introduced_version"] is not None for f in p["files"])
    # an epoch-0 row maps to epoch 0 and to a file introduced earlier
    q = row_provenance(table, url="u7")
    assert q["row"] == {"lsn": 8, "op": "U"}
    assert [e["epoch_id"] for e in q["epochs"]] == ["0"]
    assert max(f["introduced_version"] for f in q["files"]) < max(
        f["introduced_version"] for f in p["files"]
    )


def test_tombstone_provenance(spark, table):
    p = row_provenance(table, url="u5")
    assert p["found"] and p["row"] == {"lsn": 101, "op": "D"}
    assert [e["epoch_id"] for e in p["epochs"]] == ["1"]


def test_absent_key_and_missing_bucket_cols(spark, table):
    assert row_provenance(table, url="nope")["found"] is False
    with pytest.raises(ValueError, match="bucket key"):
        row_provenance(table, rank=3)


def test_survives_compaction_and_expiry(spark, table):
    table.compact()
    table.expire_snapshots(keep_last=2)
    p = row_provenance(table, url="u3")
    assert p["found"] and p["row"]["lsn"] == 100
    # epoch registry carried through compaction; files now the compacted
    # base, introduced by the compact commit
    assert [e["epoch_id"] for e in p["epochs"]] == ["1"]
    assert all(f["introduced_operation"].startswith("compact") for f in p["files"])
