"""Content-defined chunking: exact coverage, shift resistance, edge
shapes (short/empty docs)."""

from pyspark.sql import functions as F

from clever_canal_spark.operators.dedup import (
    content_defined_chunks,
    shared_chunks,
)

_PASSAGE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the forest until nightfall while owls watch silently"
) * 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunks_cover_text_exactly(spark):
    """Chunks are contiguous, non-empty, and concatenate back to the
    original text — start/end arithmetic pinned end to end."""
    df = _docs(spark, [(1, _PASSAGE), (2, "short one"), (3, "x" * 16)])
    out = content_defined_chunks(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {1: _PASSAGE, 2: "short one", 3: "x" * 16}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        pos = 1
        rebuilt = ""
        for r in rows:
            assert r["chunk_start"] == pos, (doc_id, r)
            assert r["chunk_len"] >= 1
            rebuilt += texts[doc_id][r["chunk_start"] - 1 : r["chunk_start"] - 1 + r["chunk_len"]]
            pos += r["chunk_len"]
        assert rebuilt == texts[doc_id], doc_id


def test_short_doc_is_single_chunk(spark):
    rows = content_defined_chunks(_docs(spark, [(1, "tiny")])).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_start"], rows[0]["chunk_len"]) == (1, 4)


def test_empty_doc_has_no_chunks(spark):
    assert content_defined_chunks(_docs(spark, [(1, "")])).count() == 0


def test_shift_resistance(spark):
    """A one-char prefix edit shifts every byte offset of doc 2 — the
    content-picked boundaries must still re-align on the common passage
    and produce shared fingerprints (the property position-keyed exact
    matching cannot have)."""
    a = "PREFIX_A " * 3 + _PASSAGE
    b = "z" + a[8:]
    sh = shared_chunks(content_defined_chunks(_docs(spark, [(1, a), (2, b)])))
    rows = sh.collect()
    assert rows, "no shared chunks found despite a common 250-char passage"
    assert all(r["n_docs"] == 2 for r in rows)


def test_min_len_filters_micro_chunks(spark):
    df = _docs(spark, [(1, _PASSAGE), (2, _PASSAGE)])
    ch = content_defined_chunks(df)
    strict = shared_chunks(ch, min_len=10_000)
    assert strict.count() == 0
    loose = shared_chunks(ch, min_len=1)
    assert loose.count() > 0


def test_chunk_dup_pairs_and_boilerplate_cap(spark):
    """Three docs sharing the passage pair up (3 pairs); a chunk shared
    by more docs than the cap expands to NOTHING (boilerplate guard)."""
    from clever_canal_spark.operators.dedup import chunk_dup_pairs

    rows = [(i, f"DOC{i} " * 2 + _PASSAGE * 3) for i in (1, 2, 3)]
    ch = content_defined_chunks(_docs(spark, rows))
    pairs = {(r["doc_a"], r["doc_b"]) for r in chunk_dup_pairs(ch).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    capped = chunk_dup_pairs(ch, max_docs_per_chunk=2)
    assert capped.count() == 0, "cap must drop chunks shared too widely"


def test_chunks_match_python_reference_model(spark):
    """Deterministic pseudo-random corpus (incl. quotes, digits, unicode,
    whitespace runs) checked against a pure-Python Horner/boundary/md5
    reference — pins the Spark expression chain (ascii() codepoints,
    1-based substring, span assembly) to the spec independently of the
    DuckDB twin."""
    import hashlib
    import random

    P, M, W, D = 31, 1_000_000_007, 16, 64
    rng = random.Random(42)
    alphabet = "abcdefgh XY.,'\"09\té世"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))))
        for i in range(60)
    ]

    def ref_chunks(text):
        cuts = []
        for i in range(max(len(text) - W + 1, 0)):
            acc = 0
            for ch in text[i : i + W]:
                acc = (acc * P + ord(ch)) % M
            if acc % D == 0:
                cuts.append(i + W - 1)  # 0-based inclusive end
        starts = [0] + [e + 1 for e in cuts]
        ends = cuts + [len(text) - 1]
        out = []
        for idx, (s, e) in enumerate(zip(starts, ends)):
            if e < s:
                continue
            chunk = text[s : e + 1]
            out.append((idx, s + 1, e - s + 1,
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()))
        return out

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {}
    for r in content_defined_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_hash"])
        )
    for doc_id, text in docs:
        want = ref_chunks(text)
        assert sorted(got.get(doc_id, [])) == sorted(want), (doc_id, text)


def test_chunk_dup_fraction_hand_pinned(spark):
    """Three docs: a fully-syndicated pair and a unique doc — the pair's
    fraction must be high (only their distinct prefixes differ), the
    unique doc's 0; min_len must gate micro-chunk mass out of BOTH
    numerator and denominator."""
    from clever_canal_spark.operators.dedup import chunk_dup_fraction

    rows = [
        (1, "alpha header " + _PASSAGE * 3),
        (2, "beta headline " + _PASSAGE * 3),
        (3, "wholly original content about deep sea currents " * 6),
    ]
    ch = content_defined_chunks(_docs(spark, rows))
    out = {r["doc_id"]: r for r in chunk_dup_fraction(ch).collect()}
    assert out[3]["dup_len"] == 0 and out[3]["dup_frac_e6"] == 0
    for d in (1, 2):
        assert out[d]["dup_frac_e6"] > 500_000, out[d]
        assert 0 < out[d]["dup_len"] <= out[d]["total_len"]
    # a doc whose every chunk is unique still reports its full mass
    assert out[3]["total_len"] > 0


def test_rolling_expr_matches_spec_expr_hypothesis(spark):
    """The O(len) rolling-recurrence cut expression must be bit-identical
    to the O(len·w) windowed spec expression (_cdc_cut_ends_expr — the
    shared-dialect form the DuckDB oracles replay). Hypothesis corpus in
    ONE Spark job: unicode, quotes, newlines, boundary lengths w−1/w/w+1."""
    from hypothesis import given, settings, strategies as st

    from clever_canal_spark.operators.dedup import (
        _cdc_cut_ends_expr,
        _cdc_cut_ends_rolling_expr,
    )

    collected = []

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(codec="utf-8"), max_size=90))
    def _collect(t):
        collected.append(t)

    _collect()
    texts = collected + ["", "x" * 15, "y" * 16, "z" * 17, _PASSAGE]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    chars = "transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    both = (
        df.select("doc_id", "text", F.expr(chars).alias("__chars"))
        .select(
            "doc_id",
            F.expr(_cdc_cut_ends_expr("text")).alias("spec"),
            F.expr(_cdc_cut_ends_rolling_expr("__chars")).alias("rolling"),
        )
        .collect()
    )
    assert len(both) == len(texts)
    for r in both:
        assert r["spec"] == r["rolling"], (r["doc_id"], texts[r["doc_id"]])
