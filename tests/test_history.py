"""Hand-computed cases for the consumer-side materializations
(operators/history.py): SCD2 validity ranges and session gap boundaries.
The DuckDB parity for the full events table rides test_oracle_parity."""

import datetime as dt

from pyspark.sql import functions as F

from clever_canal_spark.operators.history import scd2_history, sessionize


def _feed(spark, rows):
    return spark.createDataFrame(rows, "url string, text string, op string, lsn long")


def test_scd2_insert_update_delete(spark):
    # u1: I@1 -> U@5 -> D@9 : two closed versions, no current row
    # u2: I@2 : one open version
    rows = [
        ("u1", "a", "I", 1),
        ("u2", "x", "I", 2),
        ("u1", "b", "U", 5),
        ("u1", None, "D", 9),
    ]
    out = scd2_history(_feed(spark, rows), ["url"], value_cols=["text"])
    got = {(r.url, r.valid_from_lsn): (r.text, r.valid_to_lsn, r.is_current)
           for r in out.collect()}
    assert got == {
        ("u1", 1): ("a", 5, False),
        ("u1", 5): ("b", 9, False),   # the DELETE closes the range
        ("u2", 2): ("x", None, True),
    }
    # delete events emit no row of their own
    assert len(got) == 3


def test_scd2_current_after_updates(spark):
    rows = [("u1", "a", "I", 1), ("u1", "b", "U", 3), ("u1", "c", "U", 7)]
    out = scd2_history(_feed(spark, rows), ["url"], value_cols=["text"])
    cur = [r for r in out.collect() if r.is_current]
    assert len(cur) == 1 and cur[0].text == "c" and cur[0].valid_from_lsn == 7


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_sessionize_gap_boundary(spark):
    # gap = 10 min; deltas: 9 min (same session), exactly 10 (NEW — the
    # session_window merge rule is strict-less-than), 11 (new)
    rows = [
        (1, _ts(0), 1), (1, _ts(9), 2),            # session 1 (gap 9 < 10)
        (1, _ts(19), 3),                            # +10 exactly -> session 2
        (1, _ts(30), 4),                            # +11 -> session 3
        (2, _ts(0), 5),                             # other key: own session 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize(df, ["user_id"], ts_col="ts", gap="10 minutes",
                     order_tiebreak="event_id")
    got = {(r.user_id, r.session_seq): (r.session_start, r.session_end, r.n_events)
           for r in out.collect()}
    assert got == {
        (1, 1): (_ts(0), _ts(9), 2),
        (1, 2): (_ts(19), _ts(19), 1),
        (1, 3): (_ts(30), _ts(30), 1),
        (2, 1): (_ts(0), _ts(0), 1),
    }


def _n_exchanges(df):
    jvm = df._sc._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    return sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    )


def test_single_shuffle_plans(spark):
    # both materializations must shuffle exactly ONCE (on the key):
    # sessionize's final (key, session_seq) aggregation reuses the
    # window's hashpartitioning(key) — grouping by a superset of the
    # partition key needs no second exchange
    feed = _feed(spark, [("u1", "a", "I", 1)])
    assert _n_exchanges(scd2_history(feed, ["url"], value_cols=["text"])) == 1
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    assert _n_exchanges(
        sessionize(ev, ["user_id"], order_tiebreak="event_id")
    ) == 1


def test_sessionize_matches_spark_session_window(spark):
    # the operator is the batch twin of F.session_window — same merge
    # semantics on a randomized fixture (distinct ts per key so ordering
    # ties can't differ)
    df = (
        spark.range(200)
        .select(
            (F.col("id") % 7).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + (F.hash("id") % 10000 + 10000) % 10000 * 97
            ).alias("ts"),
            F.col("id").alias("event_id"),
        )
        .dropDuplicates(["user_id", "ts"])
    )
    mine = sessionize(df, ["user_id"], ts_col="ts", gap="7 minutes",
                      order_tiebreak="event_id")
    native = (
        df.groupBy("user_id", F.session_window("ts", "7 minutes").alias("w"))
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    a = {(r.user_id, r.session_start, r.session_end, r.n_events)
         for r in mine.collect()}
    b = {(r.user_id, r.session_start, r.session_end, r.n_events)
         for r in native.collect()}
    assert a == b


def _facts(spark, rows):
    return spark.createDataFrame(rows, "url string, lsn long")


def _dims(spark, rows):
    return spark.createDataFrame(rows, "url string, lsn long, seg string")


def test_asof_backward_hand_case(spark):
    from clever_canal_spark.operators.history import asof_join

    facts = _facts(spark, [("u1", 3), ("u1", 5), ("u1", 9), ("u2", 1), ("u3", 7)])
    dims = _dims(spark, [("u1", 5, "b"), ("u1", 8, "c"), ("u1", 1, "a"),
                         ("u2", 4, "z")])
    out = asof_join(facts, dims, ["url"], "lsn")
    got = {(r.url, r.lsn): r.seg for r in out.collect()}
    assert got == {
        ("u1", 3): "a",
        ("u1", 5): "b",    # tie: dim at exactly the fact ts applies
        ("u1", 9): "c",
        ("u2", 1): None,   # fact precedes every dim version -> LEFT null
        ("u3", 7): None,   # key with no dim rows at all
    }
    # every fact survives exactly once
    assert out.count() == 5


def test_asof_null_payload_version_wins(spark):
    """A dim version whose payload VALUE is null must still shadow the
    older version — the struct tag distinguishes 'no version' from 'a
    version carrying null' (a naive last(col, ignorenulls) conflates
    them)."""
    from clever_canal_spark.operators.history import asof_join

    facts = _facts(spark, [("u1", 10)])
    dims = _dims(spark, [("u1", 1, "old"), ("u1", 5, None)])
    out = asof_join(facts, dims, ["url"], "lsn").collect()
    assert out[0].seg is None


def test_asof_forward_direction(spark):
    from clever_canal_spark.operators.history import asof_join

    facts = _facts(spark, [("u1", 3), ("u1", 8), ("u1", 9)])
    dims = _dims(spark, [("u1", 5, "b"), ("u1", 8, "c")])
    out = asof_join(facts, dims, ["url"], "lsn", direction="forward")
    got = {(r.url, r.lsn): r.seg for r in out.collect()}
    assert got == {("u1", 3): "b", ("u1", 8): "c", ("u1", 9): None}


def test_asof_payload_clash_rejected(spark):
    import pytest as _pytest

    from clever_canal_spark.operators.history import asof_join

    facts = spark.createDataFrame([("u1", 1, "x")], "url string, lsn long, seg string")
    dims = _dims(spark, [("u1", 1, "a")])
    with _pytest.raises(ValueError, match="payload columns already exist"):
        asof_join(facts, dims, ["url"], "lsn")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(_facts(spark, [("u1", 1)]), dims, ["url"], "lsn", direction="nearest")


def test_asof_single_shuffle_no_join(spark):
    """The union-window form: ONE hash exchange on the key, and no join
    operator anywhere in the plan (the equi-join+filter alternative
    explodes per-key versions; this is the plan-shape guarantee)."""
    from clever_canal_spark.operators.history import asof_join

    out = asof_join(
        _facts(spark, [("u1", 1)]), _dims(spark, [("u1", 1, "a")]), ["url"], "lsn"
    )
    assert _n_exchanges(out) == 1
    jvm = out._sc._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan


def test_range_join_hand_case(spark):
    """Half-open boundaries, multi-bin intervals, empty intervals, and
    points in untouched bins."""
    from clever_canal_spark.operators.history import range_join

    points = spark.createDataFrame([(0,), (5,), (10,), (99,), (100,), (37,)],
                                   "p long")
    ivals = spark.createDataFrame(
        [("a", 5, 100), ("b", 0, 6), ("c", 50, 50), ("d", 90, 91)],
        "tag string, lo long, hi long",
    )
    out = range_join(points, ivals, "p", "lo", "hi", bin_width=16)
    got = {(r.p, r.tag) for r in out.collect()}
    assert got == {
        (0, "b"), (5, "a"), (5, "b"),   # p=5: lo-inclusive for a
        (10, "a"), (37, "a"), (99, "a"),  # 99 < hi=100
        # p=100 excluded (hi-exclusive); "c" empty; "d" matches nothing here
    }


def test_range_join_keyed_and_brute_force(spark):
    """Keyed variant equals a per-key brute force on a seeded random
    fixture — cross-checks the bin decomposition end to end."""
    import random

    from clever_canal_spark.operators.history import range_join

    rng = random.Random(42)
    pts = [(rng.randrange(3), rng.randrange(200)) for _ in range(120)]
    ivs = []
    for n in range(40):
        lo = rng.randrange(200)
        ivs.append((rng.randrange(3), n, lo, lo + rng.randrange(0, 50)))
    points = spark.createDataFrame(pts, "k long, p long")
    ivals = spark.createDataFrame(ivs, "k long, iid long, lo long, hi long")
    out = range_join(points, ivals, "p", "lo", "hi", bin_width=13, on=["k"])
    got = sorted((r.k, r.p, r.iid) for r in out.collect())
    want = sorted(
        (pk, p, iid)
        for pk, p in pts
        for ik, iid, lo, hi in ivs
        if pk == ik and lo <= p < hi
    )
    assert got == want and len(want) > 50


def test_range_join_validation_and_plan(spark):
    import pytest as _pytest

    from clever_canal_spark.operators.history import range_join

    points = spark.createDataFrame([(1, 2)], "p long, dup long")
    ivals = spark.createDataFrame([(1, 2, 3)], "lo long, hi long, dup long")
    with _pytest.raises(ValueError, match="disjoint"):
        range_join(points, ivals, "p", "lo", "hi", bin_width=4)
    with _pytest.raises(ValueError, match="bin_width"):
        range_join(points.select("p"), ivals.select("lo", "hi"),
                   "p", "lo", "hi", bin_width=0)
    # the whole point of the decomposition: NO nested-loop join node
    out = range_join(points.select("p"), ivals.select("lo", "hi"),
                     "p", "lo", "hi", bin_width=4)
    jvm = out._sc._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_null_ts_dim_never_matches(spark):
    """SQL comparison semantics: a dim version with NULL ts satisfies no
    inequality — it must not sort to the front of the backward window
    and act as an 'oldest version'."""
    from clever_canal_spark.operators.history import asof_join

    facts = _facts(spark, [("u1", 10)])
    dims = spark.createDataFrame([("u1", None, "ghost"), ("u1", 3, "real")],
                                 "url string, lsn long, seg string")
    out = asof_join(facts, dims, ["url"], "lsn").collect()
    assert out[0].seg == "real"
    facts2 = _facts(spark, [("u1", 1)])  # precedes 'real'; ghost must not fill
    out2 = asof_join(facts2, dims, ["url"], "lsn").collect()
    assert out2[0].seg is None


def test_asof_matches_brute_force_both_directions(spark):
    """Seeded random fixture vs a Python brute force — inclusive
    boundaries, duplicated fact timestamps, sparse keys."""
    import random

    from clever_canal_spark.operators.history import asof_join

    rng = random.Random(7)
    facts = [(f"k{rng.randrange(5)}", rng.randrange(100)) for _ in range(150)]
    dims = {}
    while len(dims) < 60:
        dims[(f"k{rng.randrange(6)}", rng.randrange(100))] = None
    dims = [(k, t, f"v{i}") for i, (k, t) in enumerate(sorted(dims))]
    fdf = spark.createDataFrame(facts, "url string, lsn long")
    ddf = spark.createDataFrame(dims, "url string, lsn long, seg string")

    def brute(direction):
        out = []
        for fk, ft in facts:
            cand = [(t, v) for k, t, v in dims if k == fk
                    and (t <= ft if direction == "backward" else t >= ft)]
            if not cand:
                out.append((fk, ft, None))
            elif direction == "backward":
                out.append((fk, ft, max(cand)[1]))
            else:
                out.append((fk, ft, min(cand)[1]))
        return sorted(out)

    for direction in ("backward", "forward"):
        got = sorted(
            (r.url, r.lsn, r.seg)
            for r in asof_join(fdf, ddf, ["url"], "lsn", direction=direction).collect()
        )
        assert got == brute(direction), direction


def test_asof_null_key_and_null_ts_facts(spark):
    """Equi-join NULL semantics: a null-KEY fact matches no dim even when
    a null-key dim row exists (NULL = NULL is not a match); a null-TS
    fact matches nothing in EITHER direction (forward's desc NULLS LAST
    ordering must not hand it the window's final fill)."""
    from clever_canal_spark.operators.history import asof_join

    facts = spark.createDataFrame([(None, 10), ("u1", None)],
                                  "url string, lsn long")
    dims = spark.createDataFrame([(None, 5, "nullkey"), ("u1", 5, "b")],
                                 "url string, lsn long, seg string")
    for direction in ("backward", "forward"):
        rows = asof_join(facts, dims, ["url"], "lsn",
                         direction=direction).collect()
        assert {r.seg for r in rows} == {None}, direction
        assert len(rows) == 2, direction


def test_reserved_internal_names_rejected(spark):
    import pytest as _pytest

    from clever_canal_spark.operators.history import asof_join, range_join

    facts = spark.createDataFrame([("u1", 1, True)],
                                  "url string, lsn long, __is_dim boolean")
    dims = _dims(spark, [("u1", 1, "a")])
    with _pytest.raises(ValueError, match="reserved"):
        asof_join(facts, dims, ["url"], "lsn")
    points = spark.createDataFrame([(1, 2)], "p long, __bin long")
    ivals = spark.createDataFrame([(1, 2)], "lo long, hi long")
    with _pytest.raises(ValueError, match="reserved"):
        range_join(points, ivals, "p", "lo", "hi", bin_width=4)


def test_asof_tolerance_bound(spark):
    """merge_asof-style staleness bound: a version outside tolerance
    yields NULL — never the next-older version."""
    from clever_canal_spark.operators.history import asof_join

    facts = _facts(spark, [("u1", 10), ("u1", 4)])
    dims = _dims(spark, [("u1", 1, "old"), ("u1", 3, "new")])

    def run(tol, direction="backward"):
        out = asof_join(facts, dims, ["url"], "lsn",
                        direction=direction, tolerance=tol)
        return {r.lsn: r.seg for r in out.collect()}

    assert run(None) == {10: "new", 4: "new"}
    assert run(7) == {10: "new", 4: "new"}     # gap 7 and 1, both within
    assert run(5) == {10: None, 4: "new"}      # gap 7 > 5 -> null, not "old"
    assert run(0) == {10: None, 4: None}       # exact-ts matches only
    # forward: fact 4 -> nothing at/after except none; fact at 1?
    ffacts = _facts(spark, [("u1", 1), ("u1", 2)])
    outf = asof_join(ffacts, dims, ["url"], "lsn",
                     direction="forward", tolerance=1)
    got = {r.lsn: r.seg for r in outf.collect()}
    assert got == {1: "old", 2: "new"}         # gaps 0 and 1, both within
    outf2 = asof_join(ffacts, dims, ["url"], "lsn",
                      direction="forward", tolerance=0)
    assert {r.lsn: r.seg for r in outf2.collect()} == {1: "old", 2: None}
