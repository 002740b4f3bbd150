"""Deterministic train/val/test splitting: proportions, stability,
salt re-deal, and the leakage guard (group-hashed assignment)."""

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.text import assign_splits


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_proportions_and_determinism(spark):
    out = assign_splits(_ids(spark)).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert 0.87 <= counts["train"] / 2000 <= 0.93
    # identical assignment under repartition (no RNG state)
    a = {r["doc_id"]: r["split"] for r in assign_splits(_ids(spark)).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_splits(_ids(spark).repartition(13)).collect()
    }
    assert a == b


def test_salt_redeals(spark):
    a = {r["doc_id"]: r["split"] for r in assign_splits(_ids(spark)).collect()}
    c = {
        r["doc_id"]: r["split"]
        for r in assign_splits(_ids(spark), salt="fold2").collect()
    }
    assert a != c, "a new salt must re-deal the assignment"


def test_group_split_never_straddles(spark):
    """Every member of a group lands in the same split — the leakage
    guard that keeps near-dups out of opposite folds."""
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("cluster_id")
    )
    out = assign_splits(df, group_col="cluster_id")
    n_violations = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert n_violations == 0


def test_weight_validation(spark):
    with pytest.raises(ValueError, match="sum to 1000000"):
        assign_splits(_ids(spark), weights_ppm={"train": 1})
    with pytest.raises(ValueError, match="negative"):
        assign_splits(
            _ids(spark),
            weights_ppm={"train": 1_100_000, "val": -100_000},
        )
