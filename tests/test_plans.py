"""Physical-plan assertions: the plans we designed for are the plans Spark
actually runs (pushdown, pruning, broadcast, whole-stage codegen)."""

from pyspark.sql import functions as F

from clever_canal_spark.filters import EventFilterConfig, apply_event_filters
from clever_canal_spark.gen import FeedConfig, generate_feed
from clever_canal_spark.model import CHANGE_EVENT_SCHEMA
from clever_canal_spark.plans import ApplyConfig
from clever_canal_spark.plans.apply import _dedup_flatten


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _write_feed(spark, tmp_table_dir, n=500):
    p = f"{tmp_table_dir}/feed"
    generate_feed(spark, FeedConfig(n_events=n, n_urls=50, seed=5)).write.mode(
        "overwrite"
    ).parquet(p)
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(p)


def test_filters_push_into_scan(spark, tmp_table_dir):
    """Event-class + kind filters must reach the parquet scan as
    PushedFilters — the parse-stage-filter placement rule (F3)."""
    batch = _write_feed(spark, tmp_table_dir)
    filtered = apply_event_filters(batch, EventFilterConfig())
    plan = _plan(filtered.select("lsn", "kind"))
    assert "PushedFilters: [" in plan
    assert "kind" in plan.split("PushedFilters:")[1][:200]


def test_stats_scan_prunes_columns(spark, tmp_table_dir):
    """The stats pass must not read the html payload: ReadSchema limited
    to the referenced columns (column pruning through the filters)."""
    batch = _write_feed(spark, tmp_table_dir)
    filtered = apply_event_filters(batch, EventFilterConfig())
    agg = filtered.agg(F.count("*"), F.min("lsn"), F.max("lsn"))
    plan = _plan(agg)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema and "after" not in read_schema
    assert "lsn" in read_schema


def test_winner_join_is_broadcast_semi(spark, tmp_table_dir):
    """The dedup join must plan as BroadcastHashJoin LeftSemi (no shuffle
    of the payload side)."""
    batch = _write_feed(spark, tmp_table_dir)
    rows = apply_event_filters(batch, EventFilterConfig()).filter(F.col("kind") == "ROW")
    src = _dedup_flatten(rows, ApplyConfig(transform=False))
    plan = _plan(src)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the payload side must NOT appear under an Exchange hashpartitioning
    # caused by the join itself (broadcast exchange only)
    assert "BroadcastExchange" in plan


def test_whole_stage_codegen_covers_filter_project(spark, tmp_table_dir):
    batch = _write_feed(spark, tmp_table_dir)
    filtered = apply_event_filters(batch, EventFilterConfig()).select("lsn", "op")
    plan = _plan(filtered)
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "[codegen id :" in plan


def test_multiprobe_ann_plans_broadcast(spark):
    """The probe list must broadcast; the candidate filter is a hash join
    on the bucket, never a cartesian scan of the corpus."""
    from clever_canal_spark.operators.similarity import ann_multiprobe_topk
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ann_multiprobe_topk(emb, emb.filter(F.col("vec_id") == 0), k=10,
                              n_planes=4, radius=2)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_assign_plans_broadcast_centroids(spark):
    """Centroids are the broadcast side of the assignment cross join —
    vectors never shuffle during index build."""
    from clever_canal_spark.operators.similarity import ivf_assign
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(ivf_assign(emb, centroid_mod=64))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_jaccard_hot_shingle_filter_is_broadcast_anti(spark):
    """The stop-shingle DF cap distributes as a broadcast anti-join (the
    hot list is tiny by construction)."""
    from clever_canal_spark.operators.dedup import ngram_jaccard_pairs
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(ngram_jaccard_pairs(docs, max_df=100))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_admission_gate_plan_payload_free(spark, tmp_table_dir):
    """The admission gate's shuffles carry fingerprints, never payloads:
    every join is broadcast (no SortMergeJoin / cartesian on the epoch
    path), and the winner agg hashes BEFORE the shuffle so page text
    never rides an Exchange."""
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.dedup_index import build_dedup_index
    from clever_canal_spark.plans import dedup_admission

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body of document number "), F.col("id")).alias("text"),
    )
    idx = build_dedup_index(spark, docs, tmp_table_dir + "/didx")
    batch = spark.range(1000, 1100).select(
        F.lit("I").alias("op"),
        F.col("id").alias("lsn"),
        F.struct(
            F.col("id").cast("string").alias("url"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.concat(F.lit("body of document number "), F.col("id") % 150).alias("text"),
        ).alias("after"),
    )
    out = dedup_admission(batch, idx).batch
    plan = _plan(out)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the pre-agg projection reduces events to (doc_id, fp, lsn): the md5
    # feeds partial_max_by BELOW the exchange, so no payload text column
    # appears in any shuffle input
    assert "max_by" in plan and "md5" in plan
    lines = plan.splitlines()
    agg_inputs = [l for l in lines if "partial_max_by" in l]
    assert agg_inputs, "winner agg missing from plan"
    assert all("after#" not in l or "md5" in l for l in agg_inputs)
