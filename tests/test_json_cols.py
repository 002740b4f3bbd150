"""MySQL JSON column semantics: wire-diff parsing, MySQL function
application rules, dialect expression agreement, and the partial-update
epoch apply (JsonDiffConversion.java:36-147 analog)."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.plans.json_patch import apply_json_diff_epoch
from clever_canal_spark.sources.json_cols import (
    apply_json_diff,
    canonical_json,
    fold_json_value,
    is_json_diff_expr,
    json_get_expr,
    json_malformed_expr,
    json_valid_expr,
    parse_json_diff_text,
)

# --- wire-text parser (print_json_diff inverse) ---------------------------


def test_parse_nested_wire_format():
    """Innermost call = first operation; grouped same-op pairs expand in
    left-to-right order (JsonDiffConversion.print_json_diff grouping)."""
    ops, col = parse_json_diff_text(
        'JSON_INSERT(JSON_REPLACE(doc, \'$.a\', 5), \'$.b\', "x")'
    )
    assert col == "doc"
    assert ops == [("JSON_REPLACE", "$.a", "5"), ("JSON_INSERT", "$.b", '"x"')]

    ops, _ = parse_json_diff_text(
        "JSON_REPLACE(doc, '$.a', 1, '$.b', [1, 2, {\"k\": \"v,)\"}])"
    )
    assert ops[1] == ("JSON_REPLACE", "$.b", '[1, 2, {"k": "v,)"}]')

    # REMOVE takes paths only; unnamed column prints as @index
    ops, col = parse_json_diff_text(
        "JSON_REMOVE(JSON_REPLACE(@2, '$.x', 2), '$.y', '$.z[0]')"
    )
    assert col == "@2"
    assert ops == [
        ("JSON_REPLACE", "$.x", "2"),
        ("JSON_REMOVE", "$.y", None),
        ("JSON_REMOVE", "$.z[0]", None),
    ]


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_json_diff_text("JSON_SET(doc, '$.a', 1)")
    with pytest.raises(ValueError):
        parse_json_diff_text("JSON_REPLACE(doc, '$.a', 1")  # unbalanced


# --- MySQL function semantics (hand-written expectations) -----------------

BASE = '{"a": 1, "arr": [10, 20], "nest": {"k": true}}'


def _d(**kw):
    return canonical_json({"a": 1, "arr": [10, 20], "nest": {"k": True}, **kw})


def test_apply_semantics_hand_written():
    # REPLACE: existing paths only
    assert apply_json_diff(BASE, "JSON_REPLACE(doc, '$.a', 99)") == canonical_json(
        {"a": 99, "arr": [10, 20], "nest": {"k": True}}
    )
    assert apply_json_diff(BASE, "JSON_REPLACE(doc, '$.missing', 99)") == _d()
    # INSERT: absent paths only; array index past the end appends
    assert apply_json_diff(BASE, "JSON_INSERT(doc, '$.b', 7)") == _d(b=7)
    assert apply_json_diff(BASE, "JSON_INSERT(doc, '$.a', 7)") == _d()
    assert apply_json_diff(BASE, "JSON_INSERT(doc, '$.arr[9]', 30)") == canonical_json(
        {"a": 1, "arr": [10, 20, 30], "nest": {"k": True}}
    )
    # ARRAY_INSERT: at index, clamped to end
    assert apply_json_diff(
        BASE, "JSON_ARRAY_INSERT(doc, '$.arr[1]', 15)"
    ) == canonical_json({"a": 1, "arr": [10, 15, 20], "nest": {"k": True}})
    # REMOVE: object member and array element
    assert apply_json_diff(BASE, "JSON_REMOVE(doc, '$.nest.k')") == canonical_json(
        {"a": 1, "arr": [10, 20], "nest": {}}
    )
    assert apply_json_diff(BASE, "JSON_REMOVE(doc, '$.arr[0]')") == canonical_json(
        {"a": 1, "arr": [20], "nest": {"k": True}}
    )
    # unresolvable parent → no-op; NULL doc → NULL; root REPLACE swaps
    assert apply_json_diff(BASE, "JSON_REPLACE(doc, '$.no.such[2]', 1)") == _d()
    assert apply_json_diff(None, "JSON_REPLACE(doc, '$.a', 1)") is None
    assert apply_json_diff('{"a":1}', 'JSON_REPLACE(doc, \'$\', {"z": 0})') == '{"z":0}'
    # quoted member names
    assert (
        apply_json_diff('{"odd key": 1}', "JSON_REPLACE(doc, '$.\"odd key\"', 2)")
        == '{"odd key":2}'
    )


def test_fold_diff_then_image_interleave():
    """A later FULL image resets the accumulator; later diffs build on it."""
    out = fold_json_value(
        '{"a":1}',
        ["JSON_INSERT(doc, '$.b', 2)", '{"c": 3}', "JSON_REPLACE(doc, '$.c', 4)"],
    )
    assert out == '{"c":4}'
    # malformed base passes through raw; malformed diff no-ops
    assert fold_json_value("notjson{", ["JSON_REPLACE(doc, '$.a', 1)"]) == "notjson{"


# --- dialect expressions --------------------------------------------------

_JVALS = [
    '{"a": 1, "b": {"c": "x"}}',
    "[1, 2, 3]",
    "not json {",
    "JSON_REPLACE(doc, '$.a', 5)",
    "JSON_REMOVE(doc, '$.a')",
    None,
]


def _expected_flags(v):
    def valid(s):
        try:
            json.loads(s)
            return True
        except (TypeError, ValueError):
            return False

    is_diff = bool(v) and v.startswith("JSON_")
    return (
        None if v is None else valid(v),
        v is not None and not valid(v) and not is_diff,
        is_diff,
    )


def test_json_exprs_spark(spark):
    df = spark.createDataFrame([(v,) for v in _JVALS], "j string")
    rows = df.select(
        "j",
        F.expr(json_valid_expr("j", "spark")).alias("valid"),
        F.expr(json_malformed_expr("j", "spark")).alias("malformed"),
        F.expr(is_json_diff_expr("j")).alias("is_diff"),
        F.expr(json_get_expr("j", "$.b.c", "spark")).alias("bc"),
    ).collect()
    for r in rows:
        assert (r["valid"], r["malformed"], r["is_diff"]) == _expected_flags(r["j"]), r
    got = {r["j"]: r["bc"] for r in rows}
    assert got['{"a": 1, "b": {"c": "x"}}'] == "x"


def test_json_exprs_duckdb():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE s(j VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?)", [(v,) for v in _JVALS])
    q = (
        f"SELECT j, {json_valid_expr('j', 'duckdb')} AS v,"
        f" {json_malformed_expr('j', 'duckdb')} AS m,"
        f" {is_json_diff_expr('j')} AS d,"
        f" {json_get_expr('j', '$.b.c', 'duckdb')} AS bc FROM s"
    )
    for j, v, m, d, bc in con.sql(q).fetchall():
        assert (v, m, d) == _expected_flags(j), j
        if j == '{"a": 1, "b": {"c": "x"}}':
            assert bc == "x"


# --- epoch apply ----------------------------------------------------------

DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("rank", T.LongType()),
        T.StructField("meta", T.StringType()),  # the MySQL JSON column
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, rank long, meta string, op string, lsn long"
    )


def _state(t):
    return {
        r["url"]: (r["rank"], r["meta"]) for r in t.scan().collect()
    }


def test_apply_json_diff_epoch(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, DOC_SCHEMA, merge_key=["url"])
    # epoch 1: full images
    apply_json_diff_epoch(
        t,
        _batch(
            spark,
            [
                ("u1", 1, '{"tags": ["a"], "n": 1}', "I", 10),
                ("u2", 2, '{"n": 2}', "I", 11),
            ],
        ),
        1,
        json_cols=["meta"],
    )
    st = _state(t)
    assert st["u1"] == (1, canonical_json({"tags": ["a"], "n": 1}))

    # epoch 2: diffs fold onto stored state; plain column LWW still works
    apply_json_diff_epoch(
        t,
        _batch(
            spark,
            [
                ("u1", 5, "JSON_REPLACE(meta, '$.n', 9)", "U", 20),
                ("u1", 6, "JSON_INSERT(meta, '$.tags[5]', \"b\")", "U", 21),
                ("u2", 2, "JSON_REMOVE(meta, '$.n')", "U", 22),
            ],
        ),
        2,
        json_cols=["meta"],
    )
    st = _state(t)
    assert st["u1"] == (6, canonical_json({"tags": ["a", "b"], "n": 9}))
    assert st["u2"] == (2, "{}")

    # epoch 3: diff-then-image-then-diff interleave within one epoch,
    # out-of-order lsns (the fold sorts)
    apply_json_diff_epoch(
        t,
        _batch(
            spark,
            [
                ("u1", 7, "JSON_REPLACE(meta, '$.k', 1)", "U", 32),  # after image
                ("u1", 7, '{"k": 0}', "U", 31),                      # full image
                ("u1", 7, "JSON_INSERT(meta, '$.k', 5)", "U", 30),   # before → dropped
            ],
        ),
        3,
        json_cols=["meta"],
    )
    assert _state(t)["u1"] == (7, '{"k":1}')

    # replay no-ops (exactly-once)
    v = t.current_version()
    res = apply_json_diff_epoch(
        t, _batch(spark, [("u1", 99, '{"x": 1}', "U", 40)]), 3, json_cols=["meta"]
    )
    assert res.applied is False and t.current_version() == v
    assert _state(t)["u1"] == (7, '{"k":1}')


def test_apply_json_diff_delete_and_stale(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, DOC_SCHEMA, merge_key=["url"])
    apply_json_diff_epoch(
        t, _batch(spark, [("u1", 1, '{"a": 1}', "I", 10)]), 1, json_cols=["meta"]
    )
    # delete then re-insert in one epoch: diffs below the delete drop
    apply_json_diff_epoch(
        t,
        _batch(
            spark,
            [
                ("u1", 1, "JSON_REPLACE(meta, '$.a', 7)", "U", 20),  # pre-delete
                ("u1", None, None, "D", 21),
                ("u1", 3, '{"fresh": true}', "I", 22),
                ("u1", 3, "JSON_INSERT(meta, '$.b', 2)", "U", 23),
            ],
        ),
        2,
        json_cols=["meta"],
    )
    assert _state(t)["u1"] == (3, canonical_json({"fresh": True, "b": 2}))

    # a stale diff (lsn below the stored winner) drops whole
    v = t.current_version()
    apply_json_diff_epoch(
        t,
        _batch(spark, [("u1", 9, "JSON_REPLACE(meta, '$.b', 99)", "U", 15)]),
        3,
        json_cols=["meta"],
    )
    assert _state(t)["u1"] == (3, canonical_json({"fresh": True, "b": 2}))
    # the stale-only epoch still committed (replay protection) but wrote
    # no changed rows
    assert t.is_epoch_committed(3)
    assert t.current_version() >= v

    # pure delete folds to a tombstone
    apply_json_diff_epoch(
        t, _batch(spark, [("u1", None, None, "D", 30)]), 4, json_cols=["meta"]
    )
    assert "u1" not in _state(t)


def test_apply_json_diff_rejects_bad_cols(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, DOC_SCHEMA, merge_key=["url"])
    with pytest.raises(ValueError, match="json_cols"):
        apply_json_diff_epoch(
            t, _batch(spark, [("u1", 1, "{}", "I", 1)]), 1, json_cols=["url"]
        )
