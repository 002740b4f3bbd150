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


def test_maintenance_advisor_findings_then_clean(spark, tmp_table_dir):
    """Every advisory signal fires on a deliberately messy table, and the
    corresponding maintenance actions clear them all (zero Spark jobs in
    the report itself — it only reads the manifest log and listings)."""
    import os

    from pyspark.sql import functions as F, types as T

    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.lake.advisor import maintenance_report

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url"], n_buckets=2)
    for e in range(4):
        df = spark.createDataFrame(
            [(f"u{i}", e * 100 + i, "U", e * 100 + i) for i in range(30)],
            "url string, n long, op string, lsn long",
        )
        t.merge(df, epoch_id=e, mode="mor", lsn_col="lsn")
    t.rebucket(4)              # stale-spec files until migrated
    t.create_tag("pin")
    # orphan: a data file no snapshot references
    orphan = os.path.join(tmp_table_dir, "data", "zz-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1junkPAR1")

    rep = maintenance_report(t, keep_target=3)
    actions = {(f["action"], f["severity"]) for f in rep}
    assert ("compact", "advise") in actions          # pending deltas
    assert ("migrate_bucket_spec", "advise") in actions
    assert ("expire_snapshots", "advise") in actions
    assert ("vacuum", "advise") in actions
    assert ("set_stats_cols", "info") in actions
    assert ("tags", "info") in actions

    # run the advised maintenance; advise findings must clear
    t.drop_tag("pin")
    t.compact()
    t.migrate_bucket_spec()
    t.expire_snapshots(keep_last=2)
    t.vacuum(orphan_ttl_s=0)
    t.set_stats_cols(["n"])
    rep2 = maintenance_report(t, keep_target=3)
    assert not [f for f in rep2 if f["severity"] == "advise"], rep2


def test_advisor_small_files_and_empty_table(spark, tmp_table_dir):
    """A bucket holding one big and several tiny base files triggers the
    small-file compaction signal; a fresh empty table reports nothing."""
    from pyspark.sql import types as T

    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.lake.advisor import maintenance_report

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url"], n_buckets=1)
    assert maintenance_report(t) == []
    big = [(f"u{i}", i, "I", i) for i in range(200)]
    t.merge(
        spark.createDataFrame(big, "url string, n long, op string, lsn long"),
        epoch_id=0, mode="cow", lsn_col="lsn",
    )
    for e in range(1, 4):  # tiny COW epochs leave small per-epoch files?
        t.merge(
            spark.createDataFrame(
                [(f"v{e}", e, "I", 1000 + e)], "url string, n long, op string, lsn long"
            ),
            epoch_id=e, mode="mor", lsn_col="lsn",
        )
    t.compact()  # fold deltas: bases now one big + small files from compact
    rep = maintenance_report(t)
    # after compact everything folded into one base per bucket: the
    # small-file signal must NOT fire on a healthy layout
    assert not [f for f in rep if f["action"] == "compact"], rep


def test_apply_maintenance_clears_advise_findings(spark, tmp_table_dir):
    """apply_maintenance executes the advise rows in dependency order
    (compact -> migrate -> expire -> vacuum) through the same public
    APIs, leaves info rows alone, and the post-apply report has no
    advise findings. A tagged version keeps its pin (expire refuses)."""
    import os

    from pyspark.sql import types as T

    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.lake.advisor import (
        apply_maintenance,
        maintenance_report,
    )

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url"], n_buckets=2)
    for e in range(4):
        df = spark.createDataFrame(
            [(f"u{i}", e * 100 + i, "U", e * 100 + i) for i in range(30)],
            "url string, n long, op string, lsn long",
        )
        t.merge(df, epoch_id=e, mode="mor", lsn_col="lsn")
    t.rebucket(4)
    orphan = os.path.join(tmp_table_dir, "data", "zz-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1junkPAR1")

    ran = apply_maintenance(t, keep_target=3, vacuum_ttl_s=0)
    assert [r["action"] for r in ran] == [
        "compact", "migrate_bucket_spec", "expire_snapshots", "vacuum"
    ]
    rep = maintenance_report(t, keep_target=3)
    assert not [f for f in rep if f["severity"] == "advise"], rep
    assert not os.path.exists(orphan)
    # info finding (stats cols) survives untouched — never auto-applied
    assert ("set_stats_cols", "info") in {(f["action"], f["severity"]) for f in rep}
    # nothing due -> nothing runs
    assert apply_maintenance(t, keep_target=3, vacuum_ttl_s=0) == []


def test_status_command_zero_job_summary(spark, tmp_table_dir):
    """`lake_admin status`: manifest-only health summary — version,
    rows, deltas, epochs, consumers, advise count; parses as JSON."""
    import json as _json
    import subprocess
    import sys

    from pyspark.sql import types as T

    from clever_canal_spark.lake import Consumer, LakeTable

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, merge_key=["url"], n_buckets=2)
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "I", i + 1) for i in range(20)],
            "url string, n long, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    t.create_tag("rel")
    Consumer(t, "cli-client")
    spark2 = None  # CLI runs its own session
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "lake_admin.py"),
         "--table-dir", tmp_table_dir, "status"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=300,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    body = r.stdout[r.stdout.index("{"):r.stdout.rindex("}") + 1]
    doc = _json.loads(body)
    assert doc["version"] >= 2 and doc["rows_in_deltas"] == 20
    assert doc["tags"] == {"rel": doc["tags"]["rel"]}
    assert "cli-client" in doc["consumers"]
    assert doc["committed_epochs"] >= 1
    assert doc["advise_due"] >= 1          # pending deltas -> compact due
    assert "[admin] status:" in r.stdout


def test_feed_audit_cli(spark, tmp_path):
    """`lake_admin feed-audit` needs no --table-dir, prints JSON findings,
    and exits 1 on any finding / 0 on a clean feed."""
    import json as _json

    from pyspark.sql import functions as F

    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.sources.feed import write_feed_slices

    feed = generate_feed(spark, FeedConfig(n_events=1200))
    clean = str(tmp_path / "clean")
    holey = str(tmp_path / "holey")
    write_feed_slices(feed, clean, n_slices=2, n_events=1200)
    write_feed_slices(
        feed.filter(~F.col("lsn").between(600, 604)), holey,
        n_slices=2, n_events=1200,
    )
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(d):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "lake_admin.py"),
             "feed-audit", "--feed-dir", d],
            env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
        )

    ok = run(clean)
    assert ok.returncode == 0, ok.stdout[-800:] + ok.stderr[-800:]
    assert "0 gap(s)" in ok.stdout

    bad = run(holey)
    assert bad.returncode == 1
    rows = [_json.loads(l) for l in bad.stdout.splitlines() if l.startswith("{")]
    assert {"kind": "gap", "gap_start": 600, "gap_end": 604, "missing": 5} in rows
