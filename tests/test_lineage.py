"""Column lineage for maintained views (lake/lineage.py): drop-one
probing resolves exactly the referenced source columns, zero jobs;
rename_impact gives the pre-flight DDL answer; a view already broken by
a rename reports valid=False."""

import os

from pyspark.sql import types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.lake.agg_view import create_agg_view
from clever_canal_spark.lake.lineage import (
    expr_lineage,
    rename_impact,
    view_lineage,
)
from clever_canal_spark.lake.transform_view import create_transform_view

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("rank", T.LongType()),
])


def test_expr_lineage_resolves_references(spark):
    lin = expr_lineage(spark, SCHEMA, {
        "a": "length(text)",
        "b": "concat(upper(lang), CAST(rank AS STRING))",
        "c": "1 + 2",                       # no references
        "bad": "length(nope)",              # unresolvable
    })
    assert lin["a"] == {"refs": ["text"], "valid": True}
    assert lin["b"] == {"refs": ["lang", "rank"], "valid": True}
    assert lin["c"] == {"refs": [], "valid": True}
    assert lin["bad"] == {"refs": [], "valid": False}


def test_view_lineage_and_rename_impact(spark, tmp_table_dir):
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA,
        merge_key=["url"], n_buckets=2,
    )
    tv = create_transform_view(
        src, os.path.join(tmp_table_dir, "tv"),
        exprs={"n_chars": "CAST(length(text) AS INT)",
               "tag": "upper(lang)"},
        row_filter="rank > 0",
    )
    lin = view_lineage(tv, src)
    assert lin["n_chars"]["refs"] == ["text"]
    assert lin["tag"]["refs"] == ["lang"]
    assert lin["row_filter"]["refs"] == ["rank"]
    assert rename_impact(tv, src, "text") == ["n_chars"]
    assert rename_impact(tv, src, "url") == []          # key: pass-through
    av = create_agg_view(
        src, os.path.join(tmp_table_dir, "av"), "lang", "length(text)"
    )
    lin2 = view_lineage(av, src)
    assert lin2["group_key"]["refs"] == ["lang"]
    assert lin2["value"]["refs"] == ["text"]
    assert rename_impact(av, src, "lang") == ["group_key"]


def test_broken_view_reports_invalid(spark, tmp_table_dir):
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA,
        merge_key=["url"], n_buckets=2,
    )
    tv = create_transform_view(
        src, os.path.join(tmp_table_dir, "tv"),
        exprs={"n_chars": "length(text)"},
    )
    src.rename_column("text", "body")
    lin = view_lineage(tv, src)
    assert lin["n_chars"]["valid"] is False
    assert "n_chars" in rename_impact(tv, src, "anything")
