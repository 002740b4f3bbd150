"""Persisted ANN index: build-once/probe-many parity with the inline
operators, file-level bucket pruning in the probe path, and the absence of
any corpus-wide assignment job at query time (VERDICT r2 items 4/5)."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.operators.ann_index import (
    ann_indexed_topk,
    build_ivf_index,
    build_lsh_index,
    ivf_indexed_topk,
    open_ann_index,
)
from clever_canal_spark.operators.similarity import ann_multiprobe_topk, ivf_topk
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lsh_indexed_matches_inline(spark, tmp_table_dir):
    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_indexed_topk(idx, queries, k=20, radius=2)
    for qid in (0, 1, 2):
        inline = ann_multiprobe_topk(
            emb, emb.filter(F.col("vec_id") == qid), k=20, n_planes=4, radius=2
        )
        assert _rows(got.filter(F.col("query_id") == qid).select("vec_id", "dot_e9")) == _rows(
            inline.select("vec_id", "dot_e9")
        ), f"query {qid} diverges from inline multiprobe"


def test_lsh_probe_prunes_files(spark, tmp_table_dir):
    """A 1-query radius-0 probe must read strictly fewer index files than
    the table holds, and must never touch the corpus parquet."""
    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=8, n_buckets=16)
    all_files = {f["path"] for f in idx.vectors.lineage()}
    assert len(all_files) >= 8, "fixture too small to exercise pruning"
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # cache the query batch so its lineage does not surface the corpus scan
    queries = queries.localCheckpoint()
    out = ann_indexed_topk(idx, queries, k=10, radius=0)
    touched = {p for p in out.inputFiles()}
    index_touched = {p for p in touched if tmp_table_dir in p}
    assert 0 < len(index_touched) < len(all_files), (len(index_touched), len(all_files))
    assert not any("embeddings.parquet" in p for p in touched)


def test_ivf_indexed_matches_inline_and_skips_assignment(spark, tmp_table_dir):
    emb = _emb(spark)
    idx = build_ivf_index(spark, emb, tmp_table_dir + "/ivf", centroid_mod=32)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # checkpoint the 1-row query batch so its own corpus read does not
    # surface in the probe plan we assert on
    queries = queries.localCheckpoint()
    got = ivf_indexed_topk(idx, queries, k=50, n_probes=4)
    inline = ivf_topk(emb, emb.filter(F.col("vec_id") == 0), k=50, centroid_mod=32, n_probes=4)
    assert _rows(got.select("vec_id", "dot_e9")) == _rows(inline.select("vec_id", "dot_e9"))
    # the O(n*centroids) max_by assignment ran at BUILD time only: the
    # probe plan must not contain it, and must not read the corpus
    plan = _plan(got)
    assert "max_by" not in plan
    assert "embeddings.parquet" not in plan


def test_open_ann_index_roundtrip(spark, tmp_table_dir):
    emb = _emb(spark)
    build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    idx = open_ann_index(spark, tmp_table_dir + "/lsh")
    assert idx.n_planes == 4
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert ann_indexed_topk(idx, queries, k=5, radius=1).count() == 5

    build_ivf_index(spark, emb, tmp_table_dir + "/ivf", centroid_mod=32)
    ivf = open_ann_index(spark, tmp_table_dir + "/ivf")
    assert ivf.centroid_mod == 32
    assert ivf_indexed_topk(ivf, queries, k=5).count() == 5


def test_scan_for_keys_multi_point(spark, tmp_table_dir):
    """scan_for_keys == full-scan filter, while reading only the probed
    buckets' files (the lookup generalization the index probes ride on)."""
    emb = _emb(spark)
    t = LakeTable.create(
        spark,
        tmp_table_dir + "/t",
        emb.schema,
        merge_key=["vec_id"],
        n_buckets=8,
    )
    t.append(emb)
    want = _rows(emb.filter(F.col("vec_id").isin([3, 7, 11])))
    got_df = t.scan_for_keys([3, 7, 11])
    assert _rows(got_df) == want
    all_files = {f["path"] for f in t.lineage()}
    assert 0 < len(set(got_df.inputFiles())) < len(all_files)
    assert t.scan_for_keys([]).count() == 0
