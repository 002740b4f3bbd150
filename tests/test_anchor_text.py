"""Anchor-text extraction (operators/graph.py extract_anchor_texts /
anchor_text_profile): hand-pinned expectations — nested markup stripped,
whitespace collapsed, relative hrefs and empty anchors dropped,
duplicate (src, dst, anchor) counted once per source."""

from pyspark.sql import functions as F

from clever_canal_spark.operators.graph import (
    anchor_text_profile,
    extract_anchor_texts,
)


def _pages(spark):
    rows = [
        # nested <b>, multiline whitespace, plus a relative link to drop
        ("http://a.com/1",
         '<a href="http://t.com/x"><b>Click</b>\n  here</a>'
         '<a href="/rel">rel</a>'),
        # same (dst, anchor) twice on ONE page -> one ref
        ("http://a.com/2",
         '<a href="http://t.com/x">here</a><a href="http://t.com/x">here</a>'),
        # empty anchor -> extract keeps it, profile drops it
        ("http://a.com/3", '<a href="http://t.com/x"></a>'),
        # self-link drops
        ("http://a.com/4", '<a href="http://a.com/4">me</a>'),
        # second source saying "here" about the same target
        ("http://a.com/5", '<a href="http://t.com/x">here </a>'),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_anchor_texts_pinned(spark):
    got = {
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchor_texts(_pages(spark)).collect()
    }
    assert ("http://a.com/1", "http://t.com/x", "Click here") in got
    assert ("http://a.com/3", "http://t.com/x", "") in got
    assert not any(dst == "/rel" for _, dst, _ in got)
    assert not any(src == "http://a.com/4" for src, _, _ in got)


def test_anchor_profile_counts_distinct_sources(spark):
    prof = {
        (r["dst"], r["anchor"]): r["n_refs"]
        for r in anchor_text_profile(_pages(spark)).collect()
    }
    # page 2 repeats the link -> 1; page 5 trims to the same anchor -> +1
    assert prof[("http://t.com/x", "here")] == 2
    assert prof[("http://t.com/x", "Click here")] == 1
    # empty anchors never reach the profile
    assert all(a != "" for _, a in prof)


def test_truncation_and_binary_html(spark):
    rows = [("http://a.com/1",
             ('<a href="http://t.com/y">' + "w" * 300 + "</a>").encode())]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_anchor_texts(df, max_anchor_chars=10).collect()
    assert out[0]["anchor"] == "w" * 10
