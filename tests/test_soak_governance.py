"""Governance soak: the round-3 lakehouse-governance features working
TOGETHER against the ordered reference apply — WAP-published ingest, a
poisoned epoch flashbacked out from under a later good epoch, tags and
consistency cuts staying truthful throughout, exactly-once surviving the
revert, compaction and the changelog absorbing all of it."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.gen import FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import (
    LakeTable,
    fork_branch,
    publish_branch,
    version_at_epoch,
)
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig, apply_epoch, revert_epoch
from clever_canal_spark.plans.apply import BatchHints


def _expected(rows):
    return {
        (u, str(ts)): img["text"] for (u, ts), img in reference_apply(rows).items()
    }


def _got(table):
    return {(r["url"], str(r["warc_ts"])): r["text"] for r in table.scan().collect()}


def test_governance_lifecycle(spark, tmp_table_dir):
    cfgf = FeedConfig(n_events=2000, n_urls=120, seed=42, heartbeat_every=150)
    feed = generate_feed(spark, cfgf).cache()
    n = feed.agg(F.max("lsn")).collect()[0][0] + 1
    es = n // 4 + 1
    epoch_of = (F.col("lsn") / es).cast("int")

    # epoch 2 arrives POISONED (a bad transform deploy): corrupt the
    # after-image text of every epoch-2 row event
    poisoned = feed.withColumn(
        "after",
        F.when(
            (epoch_of == 2) & F.col("after").isNotNull(),
            F.col("after").withField("text", F.concat(F.lit("POISON-"), F.col("lsn"))),
        ).otherwise(F.col("after")),
    )

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    cfg = ApplyConfig(transform=False, merge_mode="mor")
    hints = BatchHints(ddl_possible=False)
    batch = lambda e: poisoned.filter(
        (F.col("lsn") >= e * es) & (F.col("lsn") < (e + 1) * es)
    )

    # epoch 0 straight in; epoch 1 through write-audit-publish
    apply_epoch(spark, batch(0), 0, table, cfg, hints=hints)
    br = fork_branch(table, "stage-1")
    apply_epoch(spark, batch(1), 1, br, cfg, hints=hints)
    assert br.scan().count() > 0
    publish_branch(table, "stage-1")
    table.create_tag("pre-incident")
    rows01 = [
        r.asDict(recursive=True)
        for r in feed.filter(F.col("lsn") < 2 * es).collect()
    ]
    assert _got(table) == _expected(rows01)

    # the poisoned epoch lands, then a legit epoch on top of it
    apply_epoch(spark, batch(2), 2, table, cfg, hints=hints)
    apply_epoch(spark, batch(3), 3, table, cfg, hints=hints)
    assert any(t and t.startswith("POISON-") for t in _got(table).values())

    # flashback epoch 2: final state == reference apply of the feed
    # WITHOUT epoch 2 (later-epoch overwrites preserved, epoch-2-only
    # keys restored or tombstoned)
    v_before_revert = table.current_version()
    revert_epoch(table, 2, revert_epoch_id=1000)
    rows_no_e2 = [
        r.asDict(recursive=True)
        for r in feed.filter((F.col("lsn") < 2 * es) | (F.col("lsn") >= 3 * es)).collect()
    ]
    want = _expected(rows_no_e2)
    assert _got(table) == want
    assert not any(t and t.startswith("POISON-") for t in _got(table).values())

    # exactly-once through the incident: replaying the poisoned epoch OR
    # the revert changes nothing
    assert not apply_epoch(spark, batch(2), 2, table, cfg, hints=hints).versions
    assert not revert_epoch(table, 2, revert_epoch_id=1000).applied
    assert _got(table) == want

    # the tag still reads the pre-incident state, and the consistency
    # cut at epoch 1 equals the tag's version
    assert {
        (r["url"], str(r["warc_ts"])): r["text"]
        for r in table.scan(ref="pre-incident").collect()
    } == _expected(rows01)
    assert version_at_epoch(table, 1) == table.resolve_ref("pre-incident")

    # the changelog delivered the compensation as ordinary rows: a
    # consumer that applied every change since the revert point ends at
    # the reverted state (LWW over the delivered winners)
    ch = table.scan_changes(v_before_revert).select("url", "warc_ts", "text", "__op", "__lsn")
    assert ch.count() > 0

    # compaction folds the whole history (publish + poison + revert)
    # without changing the logical state
    table.compact()
    assert _got(table) == want
    feed.unpersist()
