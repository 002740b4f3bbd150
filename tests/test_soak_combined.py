"""Combined soak: multi-shard feed + heartbeats + mid-stream DDL (one from
raw SQL) + bytes-capped epochs + crash-resume mid-run + auto-compaction,
all in ONE scenario — final state must equal the ordered Python reference
apply and the schema must have evolved."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.functions.transforms import extract_text_from_html, tag_language
from clever_canal_spark.gen import DdlSpec, FeedConfig, generate_feed, reference_apply
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import DDL_ADD_COLUMN, PAGE_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.sources import write_feed_slices
from clever_canal_spark.streaming import FeedFollower


def test_soak_everything_at_once(spark, tmp_table_dir):
    cfgf = FeedConfig(
        n_events=2000, n_urls=120, seed=99, heartbeat_every=100,
        ddls=[
            DdlSpec(lsn=700, ddl_type=DDL_ADD_COLUMN, column="quality",
                    new_type="double", sql="ALTER TABLE cc.pages ADD COLUMN quality double"),
            DdlSpec(lsn=1400, sql="ALTER TABLE cc.pages ADD COLUMN fetch_ms BIGINT"),
        ],
    )
    feed = generate_feed(spark, cfgf).cache()
    s1, s2 = os.path.join(tmp_table_dir, "s1"), os.path.join(tmp_table_dir, "s2")
    slices = write_feed_slices(feed, s1, n_slices=8, n_events=cfgf.n_events)
    os.makedirs(s2)
    for i, p in enumerate(slices):
        if i % 2 == 1:
            os.rename(p, os.path.join(s2, os.path.basename(p)))

    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    total_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d in (s1, s2) for f in os.listdir(d)
    )
    mk = lambda: FeedFollower(
        spark, [s1, s2], ckpt, table,
        ApplyConfig(merge_mode="mor", compact_every=2),
        max_files_per_epoch=3, max_bytes_per_epoch=total_bytes // 4,
    )

    from clever_canal_spark.lake import (
        create_cms_view,
        create_hist_view,
        create_hll_view,
        create_rollup,
        sync_cms_view,
        sync_hist_view,
        sync_hll_view,
        sync_rollup,
    )

    view = create_rollup(spark, os.path.join(tmp_table_dir, "rollup"),
                         "url", n_buckets=4)
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    hll = create_hll_view(spark, os.path.join(tmp_table_dir, "hll"),
                          "domain", b=4, n_buckets=4)
    cms = create_cms_view(spark, os.path.join(tmp_table_dir, "cms"), d=3, w=64)
    hist = create_hist_view(spark, os.path.join(tmp_table_dir, "hist"), "domain")

    def sync_sketches():
        sync_hll_view(hll, table, item_expr=F.col("url"), group_expr=domain)
        sync_cms_view(cms, table, item_expr=domain)
        sync_hist_view(hist, table, value_expr=F.length("text"),
                       group_expr=domain)

    # first follower "crashes" after draining only shard1's early files:
    # simulate by consuming with shard2 files hidden, then restoring
    hidden = os.path.join(tmp_table_dir, "hidden")
    os.rename(s2, hidden)
    os.makedirs(s2)
    r1 = mk().run_available()
    assert r1 and all(r.applied for r in r1)
    sync_rollup(view, table)  # mid-run sync (pre-crash state)
    sync_sketches()
    os.rmdir(s2)
    os.rename(hidden, s2)

    # fresh follower instance (same checkpoint) finishes the rest
    r2 = mk().run_available()
    assert r2 and all(r.applied for r in r2)
    # and a third pass is a no-op
    assert mk().run_available() == []
    sync_rollup(view, table)
    sync_sketches()

    # rollup invariant: incremental (two syncs straddling the crash, with
    # compactions interleaved) == one-shot rebuild over the full changelog
    fresh = create_rollup(spark, os.path.join(tmp_table_dir, "rollup2"),
                          "url", n_buckets=4)
    sync_rollup(fresh, table)
    as_map = lambda v: {
        r["url"]: (r["n_changes"], r["n_upserts"], r["n_deletes"], r["last_lsn"])
        for r in v.scan().collect()
    }
    assert as_map(view) == as_map(fresh)

    # sketch-view invariants: two syncs straddling the crash (with
    # compactions interleaved) == one-shot rebuild over the full changelog
    hll2 = create_hll_view(spark, os.path.join(tmp_table_dir, "hll2"),
                           "domain", b=4, n_buckets=4)
    cms2 = create_cms_view(spark, os.path.join(tmp_table_dir, "cms2"), d=3, w=64)
    hist2 = create_hist_view(spark, os.path.join(tmp_table_dir, "hist2"), "domain")
    sync_hll_view(hll2, table, item_expr=F.col("url"), group_expr=domain)
    sync_cms_view(cms2, table, item_expr=domain)
    sync_hist_view(hist2, table, value_expr=F.length("text"), group_expr=domain)
    rows = lambda v, cols: sorted(map(tuple, v.scan().select(*cols).collect()))
    assert rows(hll, ["domain", "regs"]) == rows(hll2, ["domain", "regs"])
    assert rows(cms, ["depth", "slot", "cnt"]) == rows(cms2, ["depth", "slot", "cnt"])
    assert rows(hist, ["domain", "bin", "n"]) == rows(hist2, ["domain", "bin", "n"])

    # final state == ordered reference apply (text byte-identical)
    want = {}
    for (url, warc_ts), img in reference_apply(feed.collect()).items():
        text = extract_text_from_html(bytes(img["html"]))
        want[(url, str(warc_ts))] = (text, tag_language(text))
    got = {
        (r["url"], str(r["warc_ts"])): (r["text"], r["lang"])
        for r in table.scan().collect()
    }
    assert got == want

    # both DDLs landed (one structured, one SQL-text-only)
    cols = [f.name for f in table.schema().fields]
    assert "quality" in cols and "fetch_ms" in cols
    # compaction ran (compact_every=2) and lineage survived it
    ops = [table.snapshot(v).operation for v in
           range(2, table.current_version() + 1)]
    assert any(op == "compact" for op in ops)
    lin = table.lineage()
    live = [f for f in lin if f["rows"]]
    assert live and all(f["lsn_max"] is not None for f in live if f["kind"] == "base")
    feed.unpersist()
