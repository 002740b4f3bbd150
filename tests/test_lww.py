"""LWW dedup: plain vs salted equivalence, out-of-order arrival, ties by
unique LSN."""

from pyspark.sql import functions as F

from clever_canal_spark.operators import lww_dedup, salted_lww_dedup


def mk(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts string, lsn long, val string")


def as_map(df):
    return {(r["url"], r["warc_ts"]): (r["lsn"], r["val"]) for r in df.collect()}


def test_lww_keeps_max_lsn(spark):
    df = mk(
        spark,
        [
            ("a", "t1", 1, "x"),
            ("a", "t1", 5, "y"),
            ("a", "t1", 3, "z"),
            ("b", "t1", 2, "p"),
        ],
    )
    out = as_map(lww_dedup(df, ["url", "warc_ts"]))
    assert out == {("a", "t1"): (5, "y"), ("b", "t1"): (2, "p")}


def test_lww_out_of_order_arrival_is_irrelevant(spark):
    rows = [("a", "t1", i, f"v{i}") for i in (9, 1, 7, 3, 5, 0, 8, 2, 6, 4)]
    out = as_map(lww_dedup(mk(spark, rows), ["url", "warc_ts"]))
    assert out == {("a", "t1"): (9, "v9")}


def test_salted_equals_plain(spark):
    # hot key: 1000 events on one key, few on others
    rows = [("hot", "t1", i, f"v{i}") for i in range(1000)]
    rows += [(f"u{i}", "t1", 10_000 + i, "w") for i in range(50)]
    df = mk(spark, rows)
    plain = as_map(lww_dedup(df, ["url", "warc_ts"]))
    for n_salts in (1, 4, 16):
        salted = as_map(salted_lww_dedup(df, ["url", "warc_ts"], n_salts=n_salts))
        assert salted == plain


def test_salted_distinct_warc_ts_keys(spark):
    df = mk(spark, [("a", "t1", 1, "x"), ("a", "t2", 2, "y")])
    out = as_map(salted_lww_dedup(df, ["url", "warc_ts"], n_salts=4))
    assert out == {("a", "t1"): (1, "x"), ("a", "t2"): (2, "y")}
