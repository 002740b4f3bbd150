"""End-to-end smoke of scripts/lake_admin.py: the maintenance commands
drive a real table across two processes."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _admin(table_dir, *argv):
    env = {**os.environ, "PYTHONPATH": REPO}
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "lake_admin.py"),
         "--table-dir", table_dir, *argv],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )


@pytest.fixture(scope="module")
def admin_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("admin") / "pages")
    t = LakeTable.create(spark, d, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2)
    src = spark.createDataFrame(
        [(f"u{i}", "2024-01-01 00:00:00", f"v{i}", "U", i) for i in range(10)],
        "url string, warc_ts string, text string, op string, lsn long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    t.merge(src, epoch_id=0, mode="mor", lsn_col="lsn")
    return d


def test_admin_fsck_history_refs(admin_table):
    r = _admin(admin_table, "fsck")
    assert r.returncode == 0 and "0 finding(s)" in r.stdout
    r = _admin(admin_table, "history")
    ops = [json.loads(x)["operation"] for x in r.stdout.splitlines()
           if x.startswith("{")]
    assert any(op.startswith("merge") for op in ops)
    r = _admin(admin_table, "tag", "audit")
    assert r.returncode == 0
    r = _admin(admin_table, "refs")
    assert any(json.loads(x)["name"] == "audit" for x in r.stdout.splitlines()
               if x.startswith("{"))
    assert _admin(admin_table, "untag", "audit").returncode == 0


def test_admin_maintenance_chain(admin_table, spark):
    assert "compact ->" in _admin(admin_table, "compact").stdout
    assert "rebucket -> v" in _admin(admin_table, "rebucket", "4").stdout
    assert "migrate-spec -> v" in _admin(admin_table, "migrate-spec").stdout
    out = _admin(admin_table, "delete-where", "url = 'u3'", "--epoch", "adm-1")
    assert "applied=True" in out.stdout
    t = LakeTable(spark, admin_table)
    assert t.lookup(url="u3").count() == 0
    assert t.snapshot().n_buckets == 4
    r = _admin(admin_table, "vacuum", "--ttl", "0")
    assert r.returncode == 0 and "vacuum:" in r.stdout
