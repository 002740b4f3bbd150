"""MQ topic/partition routing (CanalMQConfig.java:1-14 semantics).

The driver oracle replays assignments through the dialect-twin
expressions, which shares the generator with the engine — so the rows
here are HAND-COMPUTED (python hashlib md5) to pin the semantics
independently of that shared code (the r2 classifier-oracle lesson)."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from clever_canal_spark.sources.mq_partition import (
    MQRoutingConfig,
    assign_mq_routing,
    mq_partition_expr,
    mq_topic_expr,
    parse_mq_properties,
)

SEP = chr(31)


def u32mod(key: str, n: int) -> int:
    return int(hashlib.md5(("mq" + key).encode()).hexdigest()[:8], 16) % n


CFG = MQRoutingConfig(
    topic="changes",
    partitions_num=8,
    partition_hash=(
        ("cc\\.click", ("url", "cents")),
        ("cc\\..*", ("$pk$",)),
    ),
    dynamic_topic=(
        ("clicks", "cc\\.click"),
        (None, "cc\\.(view|error)"),
    ),
)

ROWS = [
    # (schema, table, url, cents)
    ("cc", "click", "u7", 655),
    ("cc", "click", "u7", 1231),   # different cents → may move partition
    ("cc", "view", "u7", 163),
    ("cc", "error", "u46", 900),
    ("cc", "signup", None, 12),    # null pk → '' hash, stable
    ("dw", "click", "u7", 655),    # schema mismatch → no rule, partition 0
]


def expected(schema, table, url, cents):
    name = f"{schema}.{table}"
    if name == "cc.click":
        topic = "clicks"
        part = u32mod(f"{url or ''}{SEP}{cents}", 8)
    elif name in ("cc.view", "cc.error"):
        topic = name
        part = u32mod(url or "", 8)
    elif schema == "cc":
        topic = "changes"
        part = u32mod(url or "", 8)
    else:
        topic = "changes"
        part = 0
    return topic, part


def _df(spark):
    return spark.createDataFrame(
        ROWS, "schema_name string, table_name string, url string, cents long"
    )


def test_hand_computed_assignments(spark):
    out = assign_mq_routing(_df(spark), CFG, pk_cols=("url",)).collect()
    assert len(out) == len(ROWS)
    for row, src in zip(out, ROWS):
        topic, part = expected(*src)
        assert (row["mq_topic"], row["mq_partition"]) == (topic, part), src


def test_same_key_same_partition_and_bounds(spark):
    df = spark.range(500).select(
        F.lit("cc").alias("schema_name"),
        F.lit("pages").alias("table_name"),
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("url"),
        F.col("id").alias("cents"),
    )
    out = assign_mq_routing(df, CFG, pk_cols=("url",))
    per_key = out.groupBy("url").agg(
        F.countDistinct("mq_partition").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_key)
    stats = out.agg(F.min("mq_partition"), F.max("mq_partition")).first()
    assert stats[0] >= 0 and stats[1] < 8
    # 50 keys over 8 partitions: every partition should see traffic
    assert out.select("mq_partition").distinct().count() == 8


def test_duckdb_dialect_parity(spark):
    sdf = assign_mq_routing(_df(spark), CFG, pk_cols=("url",))
    got = {
        (r["schema_name"], r["table_name"], r["url"], r["cents"]):
        (r["mq_topic"], r["mq_partition"]) for r in sdf.collect()
    }
    topic = mq_topic_expr(CFG, dialect="duckdb")
    part = mq_partition_expr(CFG, pk_cols=("url",), dialect="duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (schema_name VARCHAR, table_name VARCHAR, "
        "url VARCHAR, cents BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", ROWS)
    for s, tb, u, c, topic_v, part_v in con.execute(
        f"SELECT schema_name, table_name, url, cents, {topic}, {part} FROM t"
    ).fetchall():
        assert got[(s, tb, u, c)] == (topic_v, part_v)


def test_fixed_partition_and_defaults(spark):
    df = _df(spark)
    fixed = MQRoutingConfig(topic="t", partitions_num=4, partition=3)
    out = assign_mq_routing(df, fixed).select("mq_topic", "mq_partition").distinct()
    assert out.collect() == [("t", 3)] or [tuple(r) for r in out.collect()] == [("t", 3)]
    # no hash rules → everything partition 0, static topic
    plain = MQRoutingConfig(topic="t", partitions_num=4)
    vals = assign_mq_routing(df, plain).select("mq_partition").distinct().collect()
    assert [r[0] for r in vals] == [0]


def test_parse_properties_grammar():
    cfg = parse_mq_properties(
        {
            "canal.mq.topic": "changes",
            "canal.mq.partitionsNum": "8",
            "canal.mq.partitionHash": "cc\\.click:url^cents, cc\\..*:$pk$",
            "canal.mq.dynamicTopic": "clicks:cc\\.click,cc\\.(view|error)",
        }
    )
    assert cfg == CFG
    # unprefixed keys + fixed partition
    cfg2 = parse_mq_properties({"topic": "x", "partitionsNum": "2", "partition": "1"})
    assert cfg2.partition == 1 and cfg2.partitions_num == 2


def test_pattern_only_caret_typo_warns():
    """A pattern-only partitionHash entry containing '^' (the column
    separator) is almost certainly a cols-only typo missing its
    'db\\.tbl:' prefix — lenient Canal parsing keeps it a (never-matching)
    table regex, but a warning makes the misroute discoverable."""
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = parse_mq_properties(
            {"canal.mq.topic": "t", "canal.mq.partitionsNum": "4",
             "canal.mq.partitionHash": "url^cents"}
        )
    assert cfg.partition_hash == (("url^cents", ()),)  # parse unchanged
    assert any("column separator" in str(x.message) for x in w)
    # legitimate pattern-only entries stay silent
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        parse_mq_properties(
            {"canal.mq.topic": "t", "canal.mq.partitionsNum": "4",
             "canal.mq.partitionHash": "cc\\..*"}
        )
    assert not w2


def test_config_validation():
    with pytest.raises(ValueError):
        MQRoutingConfig(partitions_num=0)
    with pytest.raises(ValueError):
        MQRoutingConfig(partitions_num=4, partition=4)
    with pytest.raises(ValueError):
        # $pk$ with no pk_cols supplied
        mq_partition_expr(
            MQRoutingConfig(partitions_num=2, partition_hash=(("x", ("$pk$",)),))
        )


def test_table_name_hash_mode(spark):
    """Pattern-only partitionHash entry = Canal's no-pk fallback: hash by
    table name, so a table's whole stream lands on ONE partition. Expected
    partitions hand-computed (python hashlib), independent of the exprs."""
    cfg = parse_mq_properties(
        {"partitionsNum": "8", "partitionHash": "cc\\..*"}
    )
    assert cfg.partition_hash == (("cc\\..*", ()),)
    df = _df(spark)
    got = {
        (r["schema_name"], r["table_name"], r["mq_partition"])
        for r in assign_mq_routing(df, cfg).select(
            "schema_name", "table_name", "mq_partition"
        ).collect()
    }
    for sch, tab, _u, _c in ROWS:
        want = u32mod(f"{sch}.{tab}", 8) if sch == "cc" else 0
        assert (sch, tab, want) in got, (sch, tab, want, got)
    # every row of one table shares its partition: cc.click appears once
    assert len({p for s, t, p in got if (s, t) == ("cc", "click")}) == 1
    # duckdb dialect agrees on the table-hash expression
    con = duckdb.connect()
    con.execute("CREATE TABLE r(schema_name VARCHAR, table_name VARCHAR)")
    con.executemany(
        "INSERT INTO r VALUES (?, ?)", [(s, t) for s, t, _u, _c in ROWS]
    )
    dexpr = mq_partition_expr(cfg, dialect="duckdb")
    for (s, t), p in zip(
        [(s, t) for s, t, _u, _c in ROWS],
        [r[0] for r in con.sql(f"SELECT {dexpr} FROM r").fetchall()],
    ):
        want = u32mod(f"{s}.{t}", 8) if s == "cc" else 0
        assert p == want, (s, t, p, want)


def test_routing_is_map_only(spark):
    plan = assign_mq_routing(
        _df(spark), CFG, pk_cols=("url",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
