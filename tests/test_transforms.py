"""Vectorized transform units: determinism (byte-identical text), edge
cases, pandas-UDF == plain-function equivalence, multimodal plumbing."""

from pyspark.sql import functions as F

from clever_canal_spark.functions.transforms import (
    enrich_udf,
    extract_text_from_html,
    tag_language,
)
from clever_canal_spark.operators.multimodal import (
    decode_image_fake,
    decode_image_real,
    extract_media_meta,
)


from hypothesis import given, settings, strategies as st

from clever_canal_spark.functions.transforms import (
    _extract_text_spec,
    _tag_language_spec,
)

# html-ish fragments biased toward the constructs the passes interact on:
# tags, comments, script spans, entities (incl. &Tab;/&NewLine; which decode
# to whitespace AFTER the byte passes), runs of mixed whitespace, non-ASCII,
# and invalid UTF-8.
_FRAGS = st.sampled_from(
    [b"<p>", b"</div>", b"<br/>", b"<SCRIPT>x=1</script>", b"<style>a{}</style>",
     b"<!--", b"-->", b"<!-- c -->", b"<", b">", b"<<p>a>", b"<a <!-- b --> c>",
     b"&amp;", b"&nbsp;", b"&Tab;", b"&NewLine;", b"the and", b"der und",
     b"le la", b"\xe7\x9a\x84 \xe6\x98\xaf", b"\xff\xfe", b" ", b"  ", b"\t",
     b"\r\n", b"\n\n", b"\v\f", b"word", b"O'Neil won't", b"123the the123",
     b"\xc3\xa9t\xc3\xa9", b"x\xa0y"]
)
_HTMLISH = st.lists(_FRAGS, max_size=30).map(b"".join)


@settings(max_examples=300, deadline=None)
@given(_HTMLISH)
def test_extract_text_equals_spec(html):
    assert extract_text_from_html(html) == _extract_text_spec(html)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_extract_text_equals_spec_random_bytes(html):
    assert extract_text_from_html(html) == _extract_text_spec(html)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_tag_language_equals_spec(text):
    assert tag_language(text) == _tag_language_spec(text)


@settings(max_examples=200, deadline=None)
@given(_HTMLISH)
def test_tag_language_equals_spec_on_extracted(html):
    t = extract_text_from_html(html)
    assert tag_language(t) == _tag_language_spec(t)


def test_extract_text_basic():
    html = b"<html><head><title>T</title><script>var x=1;</script></head><body><h1>Head</h1><p>Para one.</p><p>Para&nbsp;two &amp; more.</p><!-- c --></body></html>"
    t = extract_text_from_html(html)
    assert t == "T\nHead\nPara one.\nPara\xa0two & more."
    assert extract_text_from_html(None) is None
    assert extract_text_from_html(b"") == ""


def test_extract_text_deterministic_invalid_utf8():
    t1 = extract_text_from_html(b"<p>ok \xff\xfe bytes</p>")
    t2 = extract_text_from_html(b"<p>ok \xff\xfe bytes</p>")
    assert t1 == t2 and "�" in t1


def test_tag_language_cases():
    assert tag_language("the cat and the dog is here for the win") == "en"
    assert tag_language("der hund und die katze ist nicht da") == "de"
    assert tag_language("le chat est dans la maison pour les amis") == "fr"
    assert tag_language("xyzzy qwerty") == "und"
    assert tag_language("") == "und"
    assert tag_language(None) is None


def test_enrich_udf_matches_plain_functions(spark):
    htmls = [
        b"<html><body><p>the quick brown fox and the dog</p></body></html>",
        b"<p>der hund und die katze ist</p>",
        None,
        b"",
    ]
    df = spark.createDataFrame([(h,) for h in htmls], "html binary")
    out = df.select(enrich_udf(F.col("html")).alias("e")).collect()
    for h, r in zip(htmls, out):
        want_text = extract_text_from_html(h)
        assert r["e"]["text"] == want_text
        assert r["e"]["lang"] == tag_language(want_text)


def test_multimodal_stub_and_real(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_real(b"abc")
    assert decode_image_fake(None)["format"] == "none"
    m1, m2 = decode_image_fake(b"payload-x"), decode_image_fake(b"payload-x")
    assert m1 == m2  # deterministic

    df = spark.createDataFrame(
        [(1, b"aaaa"), (2, b"bbbbbb"), (3, None)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in extract_media_meta(df).collect()}
    assert out[1]["n_bytes"] == 4 and out[2]["n_bytes"] == 6 and out[3]["n_bytes"] == 0
    assert out[1]["format"] in ("png", "jpeg", "webp", "gif")
    assert out[1]["width"] >= 64 and out[1]["height"] >= 64
