"""Round-3 text/sampling/encode additions: Gopher-style quality filter,
deterministic stratified sampling, FlatMessage JSON encode."""

import json

import pyspark.sql.functions as F

from clever_canal_spark.operators.text import gopher_quality, stratified_sample
from clever_canal_spark.sources.flat_message import encode_flat_message_expr


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the hills in "
    "a long afternoon of chasing rabbits and birds under the warm sun"
)


def test_gopher_hand_cases(spark):
    rows = [
        (1, GOOD, "en"),                            # passes everything
        (2, "short text", "en"),                    # r_len fails (<10 tokens)
        (3, "a b c d e f g h i j k l m n o p", "en"),  # 1-char tokens: r_wordlen fails
        (4, GOOD + " ###### ## ### #### # ## ##", "en"),  # symbol-heavy tail
        (5, GOOD.replace("the", "xxx").replace("and", "yyy")
             .replace("to", "zz").replace("of", "qq").replace("in", "ww"), "en"),
        (6, "12345 67890 11111 22222 33333 " * 8, "en"),  # digits dominate
    ]
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(_docs(spark, rows)).collect()}
    assert out[1]["passes"] == 1 and all(out[1][k] == 1 for k in
                                         ("r_len", "r_wordlen", "r_symbol", "r_stop", "r_digit"))
    assert out[2]["r_len"] == 0 and out[2]["passes"] == 0
    assert out[3]["r_wordlen"] == 0 and out[3]["passes"] == 0
    assert out[4]["r_symbol"] == 0 and out[4]["passes"] == 0
    assert out[5]["r_stop"] == 0 and out[5]["passes"] == 0
    assert out[6]["r_digit"] == 0 and out[6]["passes"] == 0


def test_stratified_sample_exact_n_deterministic(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = _docs(spark, rows)
    s1 = stratified_sample(df, "lang", 10)
    got = s1.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 10, "de": 10, "fr": 10}
    # deterministic under a different physical partitioning
    s2 = stratified_sample(df.repartition(7), "lang", 10)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    # nested-subsample property: rk<=5 of the N=10 sample == the N=5 sample
    s5 = stratified_sample(df, "lang", 5)
    assert sorted(map(tuple, s1.filter("rk <= 5").collect())) == sorted(
        map(tuple, s5.collect())
    )


def test_stratified_sample_small_stratum(spark):
    # a stratum smaller than N yields all its rows, no padding
    rows = [(1, "a", "en"), (2, "b", "en"), (3, "c", "de")]
    out = stratified_sample(_docs(spark, rows), "lang", 5).collect()
    assert len(out) == 3


def test_flat_message_encode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "I", 'has "quote"'), (2, "D", "back\\slash"), (3, "U", "plain")],
        "id bigint, op string, note string",
    )
    expr = encode_flat_message_expr(
        "'db1'", "'t1'", "op", "id",
        pk_names=["id"],
        data_cols=[("note", "note"), ("idc", "CAST(id AS STRING)")],
        dialect="spark",
    )
    out = {r["id"]: r["msg"] for r in df.select("id", F.expr(expr).alias("msg")).collect()}
    m1 = json.loads(out[1])
    assert m1["type"] == "INSERT" and m1["database"] == "db1" and m1["table"] == "t1"
    assert m1["pkNames"] == ["id"] and m1["isDdl"] is False
    assert m1["data"] == [{"note": 'has "quote"', "idc": "1"}]
    assert json.loads(out[2])["type"] == "DELETE"
    assert json.loads(out[2])["data"][0]["note"] == "back\\slash"
    assert json.loads(out[3])["type"] == "UPDATE"
    # fixed key order: the canonical byte encoding is stable
    assert out[3].startswith('{"database":"db1","table":"t1","type":"UPDATE","es":3,')


def test_repetition_hand_cases(spark):
    from clever_canal_spark.operators.text import repetition_stats

    rows = [
        (1, "a b a b a b", "en"),       # grams: ab,ba,ab,ba,ab -> top=3/5
        (2, "w x y z", "en"),           # 3 distinct grams, top=1
        (3, "solo", "en"),              # <2 tokens: no row
        (4, "t t t t t t t t t t t", "en"),  # 10x "t t" -> fully repetitive
    ]
    out = {r["doc_id"]: r.asDict() for r in
           repetition_stats(_docs(spark, rows)).collect()}
    assert 3 not in out and len(out) == 3
    assert out[1] == {"doc_id": 1, "n_grams": 5, "n_distinct_grams": 2,
                      "top_gram_count": 3, "dup_grams": 3, "repetitive": 1}
    # top=1 never flags, however short the doc (the 10% rule alone
    # would mark every <=10-gram doc repetitive)
    assert out[2] == {"doc_id": 2, "n_grams": 3, "n_distinct_grams": 3,
                      "top_gram_count": 1, "dup_grams": 0, "repetitive": 0}
    assert out[4]["top_gram_count"] == 10 and out[4]["repetitive"] == 1


def test_contamination_hand_cases(spark):
    from clever_canal_spark.operators.text import benchmark_contamination

    # docs 0 and 202 are the eval set (% 101 == 0); doc 50 shares an
    # eval 3-gram twice, doc 7 shares nothing
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (50, "x alpha beta gamma y alpha beta gamma z", "en"),
        (7, "unrelated words entirely here today", "en"),
        (202, "alpha beta gamma delta echo", "en"),
    ]
    out = {r["doc_id"]: r.asDict() for r in
           benchmark_contamination(_docs(spark, rows)).collect()}
    assert set(out) == {50}
    # doc 50's 3-grams hitting the eval set: "alpha beta gamma" twice,
    # nothing else -> 2 hit occurrences of 1 distinct gram
    assert out[50]["n_hits"] == 2 and out[50]["n_hit_grams"] == 1


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — the corpus side never
    shuffles into a sort-merge join (100-TB contract)."""
    from clever_canal_spark.operators.text import benchmark_contamination
    from tests.test_plans import _plan

    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3}", "en") for i in range(250)]
    plan = _plan(benchmark_contamination(_docs(spark, rows)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_hand_cases(spark):
    from clever_canal_spark.operators.text import sequence_pack

    rows = [
        (1, "a b c d e", "s1"),     # 5 tokens, starts bin 0 offset 0
        (2, "f g h", "s1"),         # before=5 -> bin 0 offset 5
        (3, "i j k l", "s1"),       # before=8 -> straddles: bin 1 offset 0
        (9, "x y", "s2"),           # other partition restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["doc_id"]: r.asDict()
           for r in sequence_pack(df, budget=8, part_col="source").collect()}
    assert out[1]["tokens_before"] == 0 and out[1]["bin_id"] == 0
    assert out[2] == {"doc_id": 2, "source": "s1", "n_tokens": 3,
                      "tokens_before": 5, "bin_id": 0, "offset_in_bin": 5}
    assert out[3]["tokens_before"] == 8 and out[3]["bin_id"] == 1 \
        and out[3]["offset_in_bin"] == 0
    assert out[9]["tokens_before"] == 0 and out[9]["bin_id"] == 0


def test_source_mix_exact_rates_and_nesting(spark):
    from clever_canal_spark.operators.text import source_mix

    rows = [(i, f"t{i}", "a" if i < 40 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = source_mix(df, rates_pct={"a": 25}, default_pct=50).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # exactly floor(pct*n/100) per source
    assert len(by_src["a"]) == 10   # 25% of 40
    assert len(by_src["b"]) == 30   # 50% of 60
    # determinism + nesting: the 25% 'a' sample is a prefix of the 50% one
    half = {r["doc_id"] for r in
            source_mix(df, rates_pct={"a": 50}, default_pct=50).collect()
            if r["source"] == "a"}
    quarter = {r["doc_id"] for r in by_src["a"]}
    assert quarter <= half


def test_pii_scrub_hand_cases(spark):
    """Hand-computed expectations — deliberately NOT the shared-regex
    oracle, so a bug in the patterns themselves can't pass by
    construction."""
    from clever_canal_spark.operators.text import pii_scrub

    rows = [
        (1, "mail bob.smith+x@corp.example.co today"),
        (2, "server at 10.0.3.77 and 192.168.001.001 rebooted"),
        (3, "call 555-867-5309 or 555 123 4567 now"),
        (4, "no pii here at all"),
        (5, "a@b.io pings 1.2.3.4 then 555-000-1111"),
        (6, "half matches: user@nodot 999.999 12-34-56"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> today"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[2]["clean_text"] == "server at <IP> and <IP> rebooted"
    assert out[2]["n_ips"] == 2
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_phones"] == 2
    assert out[4]["clean_text"] == rows[3][1]
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["clean_text"] == "<EMAIL> pings <IP> then <PHONE>"
    # near-misses must NOT be redacted
    assert out[6]["clean_text"] == rows[5][1]
    assert (out[6]["n_emails"], out[6]["n_ips"], out[6]["n_phones"]) == (0, 0, 0)


def test_pii_scrub_overlapping_spans(spark):
    """When the email rule swallows an embedded IP ('10.0.0.1@example.com'),
    the IP count must be 0 — counts always equal the placeholders actually
    emitted, never matches against spans a prior rule already consumed."""
    from clever_canal_spark.operators.text import pii_scrub

    rows = [(1, "reach 10.0.0.1@example.com now"),
            (2, "plain 10.0.0.1 stays an ip")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "reach <EMAIL> now"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[2]["clean_text"] == "plain <IP> stays an ip"
    assert out[2]["n_ips"] == 1


def test_vocab_topk_hand_cases(spark):
    from clever_canal_spark.operators.text import vocab_topk

    rows = [
        (1, "spark spark shuffle"),
        (2, "spark  join"),         # double space -> no empty token
        (3, "join shuffle join"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [(r["word"], r["n_total"], r["n_docs"]) for r in vocab_topk(df, k=2).collect()]
    assert got == [("join", 3, 2), ("spark", 3, 2)]  # tie broken by word
    full = {r["word"]: (r["n_total"], r["n_docs"]) for r in vocab_topk(df, k=10).collect()}
    assert full == {"join": (3, 2), "spark": (3, 2), "shuffle": (2, 2)}


def test_length_histogram_hand_cases(spark):
    from clever_canal_spark.operators.text import length_histogram

    rows = [(1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, "abcd"), (6, "x" * 8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["len_bin"]: (r["n_docs"], r["min_len"], r["max_len"])
           for r in length_histogram(df).collect()}
    # "" clamps to 1 -> bin 0; bin edges land exactly on powers of two
    assert got == {0: (2, 0, 1), 1: (2, 2, 3), 2: (1, 4, 4), 3: (1, 8, 8)}


def test_paragraph_dedup_hand_cases(spark):
    from clever_canal_spark.operators.text import paragraph_dedup

    rows = [
        (1, "alpha\nshared line\nbeta"),
        (2, "shared line\ngamma"),       # loses 'shared line' to doc 1
        (3, "shared line"),              # everything claimed -> empty
        (4, "delta\n\nepsilon"),         # empty line dropped, not deduped
        (5, "alpha"),                    # 'alpha' belongs to doc 1 idx 0
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}
    assert out[1] == {"doc_id": 1, "clean_text": "alpha\nshared line\nbeta",
                      "n_kept": 3, "n_lines": 3}
    assert out[2] == {"doc_id": 2, "clean_text": "gamma", "n_kept": 1, "n_lines": 2}
    assert out[3] == {"doc_id": 3, "clean_text": "", "n_kept": 0, "n_lines": 1}
    assert out[4] == {"doc_id": 4, "clean_text": "delta\nepsilon",
                      "n_kept": 2, "n_lines": 2}
    assert out[5]["clean_text"] == "" and out[5]["n_lines"] == 1


def test_boilerplate_strip_hand_cases(spark):
    from clever_canal_spark.operators.text import boilerplate_strip

    cookie = "accept our cookies"
    rows = [
        (1, f"{cookie}\nreal content one"),
        (2, f"{cookie}\nreal content two"),
        (3, f"{cookie}\nreal content three"),
        (4, "rare line\nreal content four"),
        (5, "rare line\nreal content five"),  # df=2 == max_df -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in boilerplate_strip(df, max_df=2).collect()}
    # cookie banner occurs in 3 docs > max_df=2 -> stripped everywhere
    assert out[1]["clean_text"] == "real content one"
    assert out[2]["clean_text"] == "real content two"
    assert out[3]["clean_text"] == "real content three"
    # 'rare line' df=2 is NOT over the threshold -> kept in place
    assert out[4]["clean_text"] == "rare line\nreal content four"
    assert out[5]["clean_text"] == "rare line\nreal content five"
    assert out[1]["n_kept"] == 1 and out[1]["n_lines"] == 2


def test_line_ops_plan_shapes(spark):
    """boilerplate: hot-line list broadcasts into the anti-join;
    paragraph dedup: winner semi-join, never a corpus-wide window."""
    jvm = spark._jvm

    def _plan(df):
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    from clever_canal_spark.operators.text import boilerplate_strip, paragraph_dedup

    rows = [(i, f"line {i % 3}\nbody {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pb = _plan(boilerplate_strip(df))
    assert "BroadcastHashJoin" in pb and "LeftAnti" in pb
    pp = _plan(paragraph_dedup(df))
    assert "Window" not in pp and "LeftSemi" in pp


def test_normalize_text_hand_cases(spark):
    from clever_canal_spark.operators.text import normalize_text

    rows = [
        (1, "plain text stays"),
        (2, "bell\x07and\x1bescape"),
        (3, "  padded   with\t\ttabs  "),
        (4, "keep\nnewlines\nintact"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in normalize_text(df).collect()}
    assert out[1] == {"doc_id": 1, "clean_text": "plain text stays", "n_removed": 0}
    assert out[2]["clean_text"] == "bellandescape"
    assert out[2]["n_removed"] == 2
    assert out[3]["clean_text"] == "padded with tabs"
    assert out[4]["clean_text"] == "keep\nnewlines\nintact"


def test_boilerplate_strip_broadcast_opt_out(spark):
    """broadcast_hot=False must not force a driver-side broadcast: the
    anti-join plans as a shuffle join (AQE may still convert it at
    runtime), and results are identical to the default path."""
    from clever_canal_spark.operators.text import boilerplate_strip

    jvm = spark._jvm

    def _plan(df):
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    rows = [(i, f"line {i % 3}\nbody {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    forced = boilerplate_strip(df, max_df=2)
    loose = boilerplate_strip(df, max_df=2, broadcast_hot=False)
    pf, pl = _plan(forced), _plan(loose)
    assert "BroadcastHashJoin" in pf and "LeftAnti" in pf
    # without the hint the STATIC anti-join is a shuffle join (AQE may
    # still convert at runtime; the point is no forced driver broadcast)
    assert "SortMergeJoin" in pl or "ShuffledHashJoin" in pl
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, forced.collect()))


def test_paragraph_dedup_properties(spark):
    """Two invariants stronger than any fixture: (1) conservation — total
    kept lines == corpus-wide distinct lines; (2) idempotence — running
    the dedup over its own output keeps every line."""
    import pyspark.sql.functions as F

    from clever_canal_spark.operators.text import paragraph_dedup

    # adversarial mix: heavy cross-doc dup, self-dup inside one doc,
    # fully-claimed docs, unique docs
    rows = [(i, "\n".join(f"l{(i * 7 + j) % 11}" for j in range(5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = paragraph_dedup(df)
    n_distinct = (
        df.select(F.explode(F.split("text", "\n")).alias("l"))
        .filter(F.col("l") != "").distinct().count()
    )
    assert out.agg(F.sum("n_kept")).first()[0] == n_distinct
    # note: within-doc repeated lines also collapse to one — by design
    again = paragraph_dedup(
        out.filter(F.col("n_kept") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    assert again.filter(F.col("n_kept") != F.col("n_lines")).count() == 0


def test_pii_counts_equal_emitted_placeholders_property(spark):
    """Property over adversarial generated strings: each count column
    equals the number of its placeholders in clean_text (counts report
    emitted redactions, never raw-text matches a prior rule consumed)."""
    import random

    rng = random.Random(7)
    frags = ["word", "a@b.co", "10.0.0.1", "555-123-4567", "x@1.2.3.4",
             "10.0.0.1@example.com", "v2.0", "a.b", "999-99-9999",
             "call 555 123 4567", "." , "@", "e@f.g.io", "7.8.9.10"]
    rows = [(i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 12))))
            for i in range(120)]
    from clever_canal_spark.operators.text import pii_scrub

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for r in pii_scrub(df).collect():
        c = r["clean_text"]
        assert c.count("<EMAIL>") == r["n_emails"], (r["doc_id"], c)
        assert c.count("<IP>") == r["n_ips"], (r["doc_id"], c)
        assert c.count("<PHONE>") == r["n_phones"], (r["doc_id"], c)


# -- chunk_windows (per-doc sliding-window chunking) -------------------------

def test_chunk_windows_hand_cases(spark):
    from clever_canal_spark.operators.text import chunk_windows

    rows = [
        (1, "a b c d e f g", "en"),   # n=7, chunk 3 step 2 -> 3 windows
        (2, "x y", "en"),             # fits one window
        (3, "", "en"),                # empty -> no chunks
        (4, None, "en"),              # null -> no chunks
        (5, "  p   q  r ", "en"),     # whitespace runs canonicalize
    ]
    out = chunk_windows(_docs(spark, rows), chunk_tokens=3, overlap=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (0, 3, "a b c"),
        (1, 1): (2, 3, "c d e"),
        (1, 2): (4, 3, "e f g"),
        (2, 0): (0, 2, "x y"),
        (5, 0): (0, 3, "p q r"),
    }


def test_chunk_windows_tail_and_overlap_properties(spark):
    """Every doc's last window reaches the tail; consecutive windows
    overlap by exactly `overlap` tokens (except the final window, which
    may overlap more); stitching step-sized prefixes + the last window
    reconstructs the canonicalized document."""
    from clever_canal_spark.operators.text import chunk_windows

    texts = [
        (i, " ".join(f"t{i}w{j}" for j in range(n)), "en")
        for i, n in enumerate([1, 5, 6, 7, 11, 12, 13, 24, 25])
    ]
    chunk, ov, step = 6, 2, 4
    out = chunk_windows(_docs(spark, texts), chunk_tokens=chunk, overlap=ov)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate([1, 5, 6, 7, 11, 12, 13, 24, 25]):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        expect = 1 if n <= chunk else (n - chunk + step - 1) // step + 1
        assert len(chunks) == expect, (n, len(chunks))
        last = chunks[-1]
        assert last["start_token"] + last["n_chunk_tokens"] == n  # tail reached
        toks = [f"t{i}w{j}" for j in range(n)]
        for c in chunks:
            s = c["start_token"]
            assert c["chunk_text"].split(" ") == toks[s:s + chunk]
        stitched = []
        for c in chunks[:-1]:
            stitched += c["chunk_text"].split(" ")[:step]
        stitched = stitched[: last["start_token"]] + last["chunk_text"].split(" ")
        assert stitched == toks  # lossless reconstruction


def test_chunk_windows_no_shuffle_plan(spark):
    """Documents are independent: the chunking plan must contain NO
    Exchange — a map-only 1->N explode."""
    from clever_canal_spark.operators.text import chunk_windows

    df = chunk_windows(_docs(spark, [(1, "a b c", "en")]), chunk_tokens=2, overlap=1)
    jvm = df._sc._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan


# -- token_rarity (CCNet-style rarity counts) --------------------------------

def test_token_rarity_hand_case(spark):
    from clever_canal_spark.operators.text import token_rarity

    rows = [
        (1, "the cat sat", "en"),     # the:2 cat:1 sat:2 (corpus-wide)
        (2, "the sat sat rare", "en"),
        (3, "", "en"),                # no tokens -> no row
    ]
    out = {r["doc_id"]: r.asDict() for r in token_rarity(_docs(spark, rows)).collect()}
    # corpus tf: the=2, cat=1, sat=3, rare=1
    assert set(out) == {1, 2}
    assert out[1] == {"doc_id": 1, "n_tokens": 3, "n_distinct": 3,
                      "tf_sum": 2 + 1 + 3, "min_tf": 1}
    assert out[2] == {"doc_id": 2, "n_tokens": 4, "n_distinct": 3,
                      "tf_sum": 2 + 3 * 2 + 1, "min_tf": 1}


# -- bm25_topk (keyword retrieval) -------------------------------------------

def test_bm25_hand_case(spark):
    """Single-term query over a 3-doc corpus — score computed by hand.
    N=3, S=3+6+3=12. term 'cat': df=2 (docs 1,2).
    idf_e6 = round(ln((3-2+0.5)/(2+0.5)+1)*1e6) = round(ln(1.6)*1e6) = 470004.
    doc1: tf=1, dl=3 -> tfn = 22*1*12/(10*12*1+3*12+9*3*3) = 264/237
    doc2: tf=2, dl=6 -> tfn = 22*2*12/(10*12*2+3*12+9*6*3) = 528/438
    """
    import math
    from clever_canal_spark.operators.text import bm25_topk

    rows = [
        (1, "cat sat mat", "en"),
        (2, "cat cat dog dog dog dog", "en"),
        (3, "bird bird bird", "en"),
    ]
    out = {r["doc_id"]: r["score_e6"]
           for r in bm25_topk(_docs(spark, rows), ["cat"], k=10).collect()}
    idf_e6 = round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1) * 1e6)
    assert set(out) == {1, 2}  # doc 3 has no query term -> filtered
    assert out[1] == round(idf_e6 * (264 / 237))
    assert out[2] == round(idf_e6 * (528 / 438))
    assert out[2] > out[1]  # higher tf saturates but still wins here


def test_bm25_absent_term_contributes_zero(spark):
    from clever_canal_spark.operators.text import bm25_topk

    rows = [(1, "cat sat", "en"), (2, "dog ran", "en")]
    both = bm25_topk(_docs(spark, rows), ["cat", "unicorn"], k=10).collect()
    solo = bm25_topk(_docs(spark, rows), ["cat"], k=10).collect()
    assert {(r["doc_id"], r["score_e6"]) for r in both} == \
           {(r["doc_id"], r["score_e6"]) for r in solo}


def test_bm25_rare_term_outscores_common_at_equal_tf(spark):
    """idf must dominate when tf and dl are equal: a doc matching the
    rare term beats a doc matching the everywhere-term."""
    from clever_canal_spark.operators.text import bm25_topk

    rows = [
        (1, "common rare", "en"),
        (2, "common other", "en"),
        (3, "common thing", "en"),
    ]
    out = bm25_topk(_docs(spark, rows), ["rare"], k=1).collect()
    assert out[0]["doc_id"] == 1


def test_bm25_plan_no_wide_shuffle(spark):
    """The only Exchange allowed is the 1-row stats reduce (SinglePartition)
    and its broadcast — never a corpus-keyed repartition."""
    from clever_canal_spark.operators.text import bm25_topk

    df = bm25_topk(_docs(spark, [(1, "a b", "en")]), ["a"], k=5)
    jvm = df._sc._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    import re
    for m in re.finditer(r"(?<!Broadcast)Exchange (\w+)", plan):
        assert m.group(1) in ("SinglePartition,", "SinglePartition"), plan
    assert "TakeOrdered" in plan


# -- mix_weights (training-mixture reweighting) -------------------------------

def test_mix_weights_hand_case(spark):
    """2 strata, 4+1 docs: en weight = (1/2 × 5) / 4 = 0.625; de weight =
    (1/2 × 5) / 1 = 2.5 → de doc gets 2 or 3 copies, en docs 0 or 1."""
    from clever_canal_spark.operators.text import mix_weights

    rows = [(i, "x", "en") for i in range(4)] + [(9, "x", "de")]
    out = {r["doc_id"]: r.asDict() for r in mix_weights(
        _docs(spark, rows), {"en": (1, 2), "de": (1, 2)}).collect()}
    assert out[9]["weight_e6"] == 2500000
    assert out[9]["n_copies"] in (2, 3)
    for i in range(4):
        assert out[i]["weight_e6"] == 625000
        assert out[i]["n_copies"] in (0, 1)


def test_mix_weights_untargeted_stratum_audited_drop(spark):
    from clever_canal_spark.operators.text import mix_weights

    rows = [(1, "x", "en"), (2, "x", "zz")]
    out = {r["doc_id"]: r.asDict() for r in mix_weights(
        _docs(spark, rows), {"en": (1, 1)}).collect()}
    assert out[2]["weight_e6"] == 0 and out[2]["n_copies"] == 0
    assert out[1]["weight_e6"] == 2000000 and out[1]["n_copies"] == 2


def test_mix_weights_deterministic_across_runs(spark):
    from clever_canal_spark.operators.text import mix_weights

    rows = [(i, "x", "en" if i % 3 else "de") for i in range(30)]
    tgt = {"en": (1, 3), "de": (2, 3)}
    a = sorted(tuple(r) for r in mix_weights(_docs(spark, rows), tgt).collect())
    b = sorted(tuple(r) for r in mix_weights(
        _docs(spark, rows).repartition(7), tgt).collect())
    assert a == b


def test_mix_weights_expected_mix_converges(spark):
    """Over many docs the copy-weighted mix must sit near the target
    (the fractional keep is unbiased)."""
    from clever_canal_spark.operators.text import mix_weights

    rows = [(i, "x", "en" if i % 4 else "de") for i in range(400)]
    tgt = {"en": (1, 2), "de": (1, 2)}
    out = mix_weights(_docs(spark, rows), tgt).collect()
    copies = {}
    for r in out:
        copies[r["lang"]] = copies.get(r["lang"], 0) + r["n_copies"]
    total = sum(copies.values())
    assert abs(copies["en"] / total - 0.5) < 0.05
    assert abs(copies["de"] / total - 0.5) < 0.05


# -- search_snippets / langid_confusion ---------------------------------------

def test_search_snippets_hand_case(spark):
    from clever_canal_spark.operators.text import search_snippets

    rows = [
        (1, ("x " * 50) + "needle in the middle " + ("y " * 50), "en"),
        (2, "needle at the start of it all", "en"),
        (3, "nothing relevant here", "en"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in search_snippets(_docs(spark, rows), "needle",
                                    k=5, window_chars=10).collect()}
    assert set(out) == {1, 2}
    assert out[2]["match_at"] == 1
    assert out[2]["snippet"].startswith("needle")  # window clamps at start
    assert "needle" in out[1]["snippet"]
    assert len(out[1]["snippet"]) == 2 * 10 + len("needle")


def test_langid_confusion_counts(spark):
    from clever_canal_spark.operators.text import langid_confusion

    rows = [
        (1, "the cat and the dog of the house", "en"),   # en -> en
        (2, "der hund und die katze ist nicht da", "de"),  # de -> de
        (3, "zzz qqq www", "en"),                          # en -> und
    ]
    out = {(r["lang"], r["pred_lang"]): r["n_docs"]
           for r in langid_confusion(_docs(spark, rows)).collect()}
    assert out == {("en", "en"): 1, ("de", "de"): 1, ("en", "und"): 1}


def test_lang_id_null_text_is_und(spark):
    """NULL text must classify as 'und' with 0 hits — not fall through
    the CASE chain to 'es' (null-coalesced hit counts)."""
    from clever_canal_spark.operators.text import lang_id, langid_confusion

    rows = [(1, None, "en"), (2, "the cat and the dog of it", "en")]
    out = {r["doc_id"]: r.asDict() for r in lang_id(_docs(spark, rows)).collect()}
    assert out[1]["pred_lang"] == "und" and out[1]["en_hits"] == 0
    assert out[2]["pred_lang"] == "en"
    conf = {(r["lang"], r["pred_lang"]) for r in
            langid_confusion(_docs(spark, rows)).collect()}
    assert ("en", "und") in conf and ("en", "es") not in conf


def test_hybrid_rejects_multi_row_query(spark):
    import pytest
    from clever_canal_spark.operators.similarity import hybrid_rrf_topk

    docs = _docs(spark, [(1, "a b", "en")]).select("doc_id", "text")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="ONE query row"):
        hybrid_rrf_topk(docs, emb, ["a"], emb, k=2, n_dims=2)


def test_bm25_phrase_tf_hand_case(spark):
    """Phrase tf: OVERLAPPING count of exact token-sequence starts,
    whitespace-run-insensitive; phrase presence beats scattered words."""
    import pytest
    from clever_canal_spark.operators.text import bm25_topk

    rows = [
        (1, "big data big data big", "en"),      # "big data" x2
        (2, "big stuff and data here now", "en"),  # words apart: tf 0
        (3, "big\t data  big   data", "en"),     # whitespace runs: x2
        (4, "data big", "en"),                   # reversed: tf 0
    ]
    out = {r["doc_id"]: r["score_e6"]
           for r in bm25_topk(_docs(spark, rows), ["big data"], k=10).collect()}
    assert set(out) == {1, 3}
    # doc 3 (dl=4) outscores doc 1 (dl=5) at equal tf
    assert out[3] > out[1]
    # overlap semantics (Lucene convention): "a a a" has TWO starts
    # of "a a" — verify via a corpus where tf drives the only difference
    solo = bm25_topk(_docs(spark, [(9, "a a a", "en"), (7, "a a x", "en"),
                                   (8, "b c d", "en")]),
                     ["a a"], k=5).collect()
    assert [r["doc_id"] for r in solo] == [9, 7]  # tf 2 beats tf 1 at equal dl
    # the BATCH probe stays unigram-only (single probe serves phrases
    # from the positional postings — tests/test_text_index.py)
    from clever_canal_spark.operators.text_index import probe_bm25_batch

    with pytest.raises(ValueError, match="unigram-only"):
        probe_bm25_batch(None, [(1, ["big data"])], k=5)


def test_canonical_url_hand_cases(spark):
    from clever_canal_spark.operators.text import canonical_url

    cases = {
        "HTTP://Example.COM:80/a/?b=2&a=1#frag": "http://example.com/a?a=1&b=2",
        "https://Host.net:443/x": "https://host.net/x",
        "https://host.net:8443/x/": "https://host.net:8443/x",  # non-default port kept
        "http://h.com": "http://h.com/",
        "http://h.com/?": "http://h.com/",
        "http://h.com/A/B/?z=1&&y=2": "http://h.com/A/B?y=2&z=1",  # case-sensitive path
        "not a url at all #tag": "not a url at all",  # conservative pass-through
        "http://h.com/a//": "http://h.com/a",   # whole trailing run drops
        "http://h.com///": "http://h.com/",     # all-slash path is root
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = {r["url"]: r["c"] for r in
           df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    assert out == cases
    # idempotence: canonicalizing a canonical URL is a no-op
    df2 = spark.createDataFrame([(v,) for v in cases.values()], "url string")
    out2 = {r["url"]: r["c"] for r in
            df2.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    assert all(k == v for k, v in out2.items())


def test_dup_spans_hand_case(spark):
    """Two docs share an exact 10-word passage: each gets ONE maximal
    span covering exactly it; a doc repeating its own phrase (one doc)
    is NOT flagged; a unique doc emits nothing."""
    from clever_canal_spark.operators.dedup import dup_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota"),
            (3, "totally unrelated words that appear nowhere else at all"),
            (4, "self self self self self self self self self self self"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
           for r in dup_spans(docs, n=4, min_docs=2).collect()}
    # doc 1: shared passage = words 3..12 -> 4-gram starts 3..9 (7 grams)
    assert out[1] == (3, 12, 7)
    # doc 2: words 1..10 -> starts 1..7
    assert out[2] == (1, 10, 7)
    assert 3 not in out
    assert 4 not in out  # intra-doc repetition alone never flags


def test_dup_spans_splits_non_adjacent_runs(spark):
    """Two shared phrases separated by unique words yield two spans."""
    from clever_canal_spark.operators.dedup import dup_spans

    a = "one two three four"
    b = "five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{a} xxqz yyqz {b}"),
            (2, f"{a} aaqz bbqz ccqz {b}"),
        ],
        "doc_id bigint, text string",
    )
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in dup_spans(docs, n=4, min_docs=2).collect()
        if r["doc_id"] == 1
    )
    assert spans == [(1, 4), (7, 10)]


def test_cut_spans_hand_case(spark):
    """Span words drop, survivors re-join; no-span docs pass through
    UNCHANGED (same object, not re-tokenized); a fully-covered doc cuts
    to the empty string."""
    from clever_canal_spark.operators.dedup import cut_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "keep me intact"), (3, "x y z")],
        "doc_id bigint, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 4), (1, 6, 6), (3, 1, 3)],
        "doc_id bigint, span_start bigint, span_end bigint",
    )
    out = {r["doc_id"]: r["clean_text"] for r in cut_spans(docs, spans).collect()}
    assert out == {1: "a e", 2: "keep me intact", 3: ""}


def test_shingle_short_and_null_texts(spark, tmp_table_dir):
    """Texts shorter than one 3-char shingle must yield an EMPTY shingle
    array (DuckDB generate_series(1,0) semantics), not crash: Spark's
    sequence(1,0) is DESCENDING [1,0], so the old greatest()-based guard
    fed element_at an out-of-range index for any len<3 doc."""
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.dedup import minhash_signature
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index, probe_exact,
    )
    from clever_canal_spark.operators.text import shingle_hashes_expr

    df = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, None), (5, "abcdef")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["sh"] for r in
          df.select("doc_id", F.expr(shingle_hashes_expr("text")).alias("sh")).collect()}
    assert sh[0] == [] and sh[1] == [] and sh[2] == []
    assert sh[4] is None
    assert len(sh[3]) == 1 and len(sh[5]) == 4
    # short docs flow through the whole MinHash family: null signature,
    # no bands, no candidates — never an executor crash
    assert minhash_signature(df).count() == 6
    idx = build_dedup_index(
        spark, df.filter(F.col("text").isNotNull()), tmp_table_dir + "/short-didx"
    )
    dup = probe_exact(idx, spark.createDataFrame([(9, "ab")], "doc_id long, text string"))
    assert dup.count() == 1  # exact dedup still works on short texts (md5 path)


# ---------------------------------------------------------------------------
# linear_quality_score (fastText-style hashing-trick classifier)
# ---------------------------------------------------------------------------


def test_linear_quality_score_hand_case(spark):
    from clever_canal_spark.operators.text import linear_quality_score

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    # explicit 2-bucket model so the expectation is hand-computable
    import hashlib

    def bucket(tok, d=4096):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d

    w = spark.createDataFrame(
        [(bucket("aa"), 10), (bucket("bb"), -7)],
        "feature_id int, weight_e6 long",
    )
    got = {r["doc_id"]: r.asDict() for r in linear_quality_score(docs, w).collect()}
    assert got[1]["n_tokens"] == 3
    assert got[1]["score_e6"] == 10 + (-7) + 10
    assert got[1]["avg_e6"] == 13 // 3
    # empty and null docs: zero tokens, bias-only score
    for d in (2, 3):
        assert got[d] == {"doc_id": d, "n_tokens": 0, "score_e6": 0, "avg_e6": 0}


def test_linear_quality_score_negative_division_truncates_toward_zero(spark):
    from clever_canal_spark.operators.text import linear_quality_score

    docs = spark.createDataFrame([(1, "xx yy")], "doc_id long, text string")
    import hashlib

    def bucket(tok, d=4096):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d

    w = spark.createDataFrame(
        [(bucket("xx"), -10), (bucket("yy"), 3)], "feature_id int, weight_e6 long"
    )
    got = linear_quality_score(docs, w).collect()[0]
    # sum -7 over 2 tokens: toward-zero gives -3 (floor would give -4) —
    # DIV == DuckDB's `//`, pinned so the oracle contract can't drift
    assert got["score_e6"] == -7 and got["avg_e6"] == -3


def test_linear_quality_score_unknown_tokens_score_zero(spark):
    from clever_canal_spark.operators.text import (
        hashed_weights,
        linear_quality_score,
    )

    docs = spark.createDataFrame([(1, "q w e")], "doc_id long, text string")
    # left join: tokens hashing to absent feature ids contribute 0 but
    # still count toward n_tokens (fastText's OOV-bucket behavior at D
    # buckets means absent ids only happen with a partial weight export)
    w = hashed_weights(spark, n_features=4096).filter("feature_id < 0")  # empty
    got = linear_quality_score(docs, w).collect()[0]
    assert got["n_tokens"] == 3 and got["score_e6"] == 0


# ---------------------------------------------------------------------------
# learn_bpe_merges (distributed BPE trainer)
# ---------------------------------------------------------------------------


def _ref_bpe(texts, n_merges):
    """Pure-Python reference twin: same tokenizer, same greedy-leftmost
    fold application, same (count desc, pair lexicographic) tie-break."""
    import collections
    import re

    vocab = collections.Counter()
    for t in texts:
        for w in re.findall(r"\S+", t or ""):
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, n_merges + 1):
        cnt = collections.Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, c))
        for w in syms:
            new = []
            for x in syms[w]:
                if new and new[-1] == l and x == r:
                    new[-1] = l + r
                else:
                    new.append(x)
            syms[w] = new
    return merges


def test_bpe_hand_case(spark):
    from clever_canal_spark.operators.text import learn_bpe_merges

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    got = learn_bpe_merges(docs, n_merges=3)
    # 'lo' appears in 5 words (freq 3+1+1); 'ne' in 3; first merge is the
    # most frequent pair: ('l','o') count 5... 'ow' also 5 and 'e'+'w' 3;
    # ties break lexicographically: ('l','o') < ('o','w')
    assert got[0] == (1, "l", "o", 5)
    assert got[1] == (2, "lo", "w", 5)
    ref = _ref_bpe(["low low low lower lowest", "new newer newest"], 3)
    assert got == ref


def test_bpe_matches_reference_on_wider_corpus(spark):
    from clever_canal_spark.operators.text import learn_bpe_merges

    texts = [
        f"doc {i} banana bandana ananas band{i % 3} the band played on"
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = learn_bpe_merges(docs, n_merges=10)
    assert got == _ref_bpe(texts, 10)
    assert len(got) == 10


def test_bpe_stops_when_no_pairs_remain(spark):
    from clever_canal_spark.operators.text import learn_bpe_merges

    docs = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    got = learn_bpe_merges(docs, n_merges=5)
    assert got == []  # single-char words: nothing adjacent to merge


def test_bpe_token_counts_match_reference_application(spark):
    from clever_canal_spark.operators.text import bpe_token_counts

    texts = ["low lower low a", "newest lowest low", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_token_counts(docs, n_merges=4).collect()}

    # reference: train with the twin, apply the fold per word
    import collections
    import re

    merges = _ref_bpe(texts, 4)

    def apply(word):
        syms = list(word)
        for _, l, r, _c in merges:
            new = []
            for x in syms:
                if new and new[-1] == l and x == r:
                    new[-1] = l + r
                else:
                    new.append(x)
            syms = new
        return len(syms)

    for i, t in enumerate(texts):
        words = re.findall(r"\S+", t)
        assert got[i] == (len(words), sum(apply(w) for w in words)), i
    assert got[2] == (0, 0)  # empty doc


def test_hash_embed_normalized_and_deterministic(spark):
    from clever_canal_spark.operators.text import hash_embed

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, ""), (3, None), (4, "alpha beta gamma alpha")],
        "doc_id long, text string",
    )
    out = {r["vec_id"]: r["embedding"] for r in hash_embed(docs, n_dims=16).collect()}
    import math

    # unit L2 norm for non-empty text
    assert abs(math.fsum(x * x for x in out[1]) - 1.0) < 1e-12
    # empty and null docs: the zero vector, not NULL/NaN
    assert out[2] == [0.0] * 16 and out[3] == [0.0] * 16
    # identical text → identical vector (and repeated tokens accumulate:
    # some |component| corresponds to count 2 before normalization)
    assert out[1] == out[4]
    nonzero = [abs(x) for x in out[1] if x != 0.0]
    assert max(nonzero) / min(nonzero) > 1.5  # the doubled token dominates


def test_hash_embed_feeds_similarity_stack(spark):
    from clever_canal_spark.operators.similarity import brute_force_topk
    from clever_canal_spark.operators.text import hash_embed

    docs = spark.createDataFrame(
        [(i, f"topic{'AB'[i % 2]} words shared tail {i}") for i in range(10)],
        "doc_id long, text string",
    )
    emb = hash_embed(docs, n_dims=64)
    q = emb.filter("vec_id = 0").select("embedding")
    top = brute_force_topk(emb, q, k=3).collect()
    # self is the best match; per-element e9 rounding puts the self-dot
    # within a hair of 1e9
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["dot_e9"] - 1_000_000_000) <= 64
    assert top[1]["dot_e9"] < top[0]["dot_e9"]


def test_cluster_downweights(spark):
    """Soft dedup: a 3-doc near-dup cluster gets weight 333333 each (~1
    doc total mass); singletons keep 1000000."""
    from clever_canal_spark.operators.dedup import cluster_downweights

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight ") * 3
    docs = spark.createDataFrame(
        [(0, base), (1, base + "x"), (2, base + "y"),
         (3, "completely different text about spark engines and lakes "
             "with nothing shared at all in any shingle window here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in cluster_downweights(docs).collect()}
    assert len(got) == 4
    assert got[0]["cluster_size"] == 3 and got[0]["weight_e6"] == 333333
    assert got[1]["cluster_id"] == got[0]["cluster_id"] == 0
    assert got[3]["cluster_size"] == 1 and got[3]["weight_e6"] == 1000000
    # mass conservation within the truncation bound
    total = sum(r["weight_e6"] for r in got.values())
    assert 1_999_998 <= total <= 2_000_000


def test_bpe_encode_ids_hand_pinned(spark):
    """Hand-walked tiny corpus: 2 merges over 'aa ab aa' ->
    merge1 ('a','a')->'aa'; vocab syms: 'aa'->['aa'], 'ab'->['a','b'].
    merge2 best remaining pair ('a','b')->'ab'. Final syms:
    'aa'->['aa'], 'ab'->['ab']. Distinct symbols sorted: [aa, ab] ->
    ids {aa:0, ab:1}."""
    from clever_canal_spark.operators.text import bpe_encode_ids

    docs = spark.createDataFrame(
        [(0, "aa ab aa"), (1, "ab"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode_ids(docs, n_merges=2).collect()}
    assert got[0]["ids"] == [0, 1, 0] and got[0]["n_tokens"] == 3
    assert got[1]["ids"] == [1]
    assert got[2]["ids"] == [] and got[2]["n_tokens"] == 0
    assert got[3]["ids"] == []

    # order preservation under repartition
    got2 = {
        r["doc_id"]: r["ids"]
        for r in bpe_encode_ids(docs.repartition(7), n_merges=2).collect()
    }
    assert got2[0] == [0, 1, 0]


def test_weighted_sample_expectation_and_determinism(spark):
    from pyspark.sql import functions as F

    from clever_canal_spark.operators.dedup import weighted_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.lit(250_000).cast("bigint").alias("weight_e6"),  # keep ~25%
    )
    kept = weighted_sample(df)
    n = kept.count()
    assert 850 <= n <= 1150  # 4000 * 0.25 = 1000 ± hash noise
    # deterministic + repartition-stable
    again = {r["doc_id"] for r in weighted_sample(df.repartition(13)).collect()}
    assert {r["doc_id"] for r in kept.collect()} == again
    # salt re-deal changes the set but not the rate much
    other = weighted_sample(df, salt="other")
    assert {r["doc_id"] for r in other.collect()} != again
    # weight 1e6 keeps everything; 0 keeps nothing
    full = df.withColumn("weight_e6", F.lit(1_000_000).cast("bigint"))
    assert weighted_sample(full).count() == 4000
    none = df.withColumn("weight_e6", F.lit(0).cast("bigint"))
    assert weighted_sample(none).count() == 0


def test_c4_line_filter_hand_pinned(spark):
    from clever_canal_spark.operators.text import c4_line_filter

    good = "This is a perfectly fine sentence with many words."
    docs = spark.createDataFrame(
        [
            (0, f"{good}\nshort one\n{good}\n{good}"),            # ok
            (1, f"{good}\nPlease enable JavaScript right now.\n{good}\n{good}"),
            (2, f"No terminal punctuation on this line at all\n{good}\n{good}\n{good}"),
            (3, f"{good}\nLorem ipsum dolor sit amet today.\n{good}\n{good}"),
            (4, f"{good}\ncode {{x}} brace. {good}\n{good}\n{good}"),
            (5, f"{good}\n{good}"),                                # < 3 lines kept
            (6, None),
            (7, 'He said "stop here."\nShe asked why not?\nQuote ends now.”'),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert got[0]["doc_ok"] and got[0]["n_lines_kept"] == 3
    assert "short one" not in got[0]["text"]
    # javascript LINE dropped but doc survives (3 good lines remain)
    assert got[1]["doc_ok"] and "JavaScript" not in got[1]["text"]
    assert got[2]["doc_ok"] and got[2]["n_lines_kept"] == 3
    assert not got[3]["doc_ok"]     # lorem ipsum poisons the doc
    assert not got[4]["doc_ok"]     # curly brace
    assert not got[5]["doc_ok"]     # too few surviving lines
    assert not got[6]["doc_ok"] and got[6]["text"] == ""
    # terminal punctuation includes ? and close quotes
    assert got[7]["n_lines_kept"] == 3
