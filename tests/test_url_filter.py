"""URL curation gate (text.url_quality_signals) — hand-pinned rows per
signal class, blocklist suffix semantics in both the literal-array and
broadcast-DataFrame paths, and the map-only plan guarantee."""

from pyspark.sql import functions as F

from clever_canal_spark.operators.text import url_quality_signals

CASES = [
    # url, set of expected raised flags (empty = clean); signals are
    # independent — an IPv4 host is legitimately ALSO digit-heavy
    ("https://example.com/path/x", set()),
    ("http://93.184.216.34/watch", {"f_ip_host", "f_digit_host"}),
    ("https://best-casino.bet/play", {"f_keyword"}),
    ("https://shop.example.com/Casino-royale-review", {"f_keyword"}),  # path, case
    ("https://ads.tracker.example/pixel", {"f_blocked"}),
    ("https://tracker.example/x", {"f_blocked"}),       # exact domain
    ("https://nottracker.example/x", set()),            # NOT a suffix match
    ("http://h4812957.com/p", {"f_digit_host"}),
    ("https://example.com/a/b/c/d/e/f/g/h/i/x", {"f_deep_path"}),
    ("https://example.com/p?sid=" + "x" * 220, {"f_long_query"}),
    ("HTTPS://EXAMPLE.com:443/ok#frag", set()),         # port+fragment stripped
]

FLAGS = ["f_ip_host", "f_blocked", "f_keyword", "f_digit_host",
         "f_deep_path", "f_long_query"]


def _check(rows):
    got = {r["url"]: r for r in rows}
    for url, flags in CASES:
        r = got[url]
        for f in FLAGS:
            assert r[f] == (f in flags), (url, f, r[f])
        assert r["url_ok"] == (not flags), url


def test_hand_pinned_signals_list_blocklist(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    out = url_quality_signals(df, blocked_domains=("tracker.example",))
    _check(out.collect())


def test_dataframe_blocklist_broadcast_path(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    bl = spark.createDataFrame([("tracker.example",)], "domain string")
    out = url_quality_signals(df, blocked_domains=bl)
    _check(out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan


def test_list_mode_is_map_only(spark):
    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    plan = url_quality_signals(
        df, blocked_domains=("b.example",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_thresholds_are_tunable(spark):
    df = spark.createDataFrame(
        [("https://example.com/a/b/c/x?q=12345",)], "url string"
    )
    strict = url_quality_signals(df, max_path_depth=2, max_query_len=3).first()
    assert strict["f_deep_path"] and strict["f_long_query"]
    loose = url_quality_signals(df).first()
    assert loose["url_ok"]


def test_host_quality_report_hand_pinned(spark):
    from clever_canal_spark.operators.text import host_quality_report

    good = "the quick brown fox and the lazy dog of the farm jumped again"
    junk = "zzz qqq"   # no stopwords, <10 tokens -> quality 1
    rows = [
        # clean host, 2 good docs -> not a candidate
        ("https://good.example/a", good),
        ("https://good.example/b", good),
        # flagged host: casino keyword on both pages -> flag_pct path
        ("https://casino.example/a", good),
        ("https://casino.example/b", good),
        # low-quality host: clean urls, junk text -> quality_floor path
        ("https://lowq.example/a", junk),
        ("https://lowq.example/b", junk),
        # single bad page -> min_docs gate holds it back
        ("https://lone.example/x", junk),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["host"]: r for r in host_quality_report(df).collect()}
    assert not got["good.example"]["blocklist_candidate"]
    assert got["good.example"]["n_flagged"] == 0
    assert got["casino.example"]["blocklist_candidate"]
    assert got["casino.example"]["n_flagged"] == 2
    assert got["lowq.example"]["blocklist_candidate"]
    assert got["lowq.example"]["sum_quality"] < 2 * 2
    assert not got["lone.example"]["blocklist_candidate"]  # min_docs
