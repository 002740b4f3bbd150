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
