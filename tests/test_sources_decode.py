"""DDL-SQL parser (python twin ↔ generated SQL classifier agreement) and
FlatMessage stringly-typed decode (unsigned promotion ladder, row-image
explode)."""

from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import PAGE_SCHEMA
from clever_canal_spark.plans.ddl import apply_ddl_idempotent
from clever_canal_spark.sources.ddl_sql import (
    ddl_classify_exprs,
    parse_ddl,
)
from clever_canal_spark.sources.flat_message import (
    FLAT_MESSAGE_SCHEMA,
    decode_row_images,
    decode_value_expr,
)

STATEMENTS = [
    "ALTER TABLE cc.pages ADD COLUMN quality double",
    "ALTER TABLE `cc`.`pages` RENAME COLUMN lang TO language",
    "alter table pages MODIFY COLUMN rank bigint",
    "ALTER IGNORE TABLE cc.pages ADD score float",
    "/* hint */ CREATE TABLE IF NOT EXISTS cc.extra (id bigint)",
    "CREATE TEMPORARY TABLE scratch (x int)",
    "DROP TABLE IF EXISTS cc.extra",
    "TRUNCATE TABLE cc.pages",
    "TRUNCATE cc.pages",
    "RENAME TABLE cc.old TO cc.new",
    "CREATE UNIQUE INDEX idx_url ON cc.pages (url)",
    "DROP INDEX idx_url ON cc.pages",
    "INSERT INTO cc.pages VALUES (1)",
    "REPLACE INTO cc.pages VALUES (1)",
    "UPDATE cc.pages SET x = 1",
    "DELETE FROM cc.pages",
    "SET NAMES utf8",
]


def test_python_twin_matches_sql_classifier(spark):
    """parse_ddl (driver-side) and ddl_classify_exprs (vectorized) must
    agree on every statement — same patterns, two evaluators."""
    df = spark.createDataFrame([(s,) for s in STATEMENTS], "stmt string")
    exprs = ddl_classify_exprs("stmt", "spark", default_schema="cc")
    got = {
        r["stmt"]: r.asDict()
        for r in df.select("stmt", *[F.expr(e).alias(k) for k, e in exprs.items()]).collect()
    }
    for s in STATEMENTS:
        p = parse_ddl(s, default_schema="cc")
        g = got[s]
        assert g["stmt_class"] == p["stmt_class"], (s, g["stmt_class"], p["stmt_class"])
        assert g["schema_name"] == p["schema_name"], s
        assert g["table_name"] == p["table_name"], s
        assert g["ddl_type"] == (p["ddl_type"] or ""), s
        assert g["ddl_column"] == (p["ddl_column"] or ""), s
        assert g["ddl_new_name"] == (p["ddl_new_name"] or ""), s
        assert g["ddl_new_type"] == (p["ddl_new_type"] or ""), s


def test_parse_ddl_classification():
    assert parse_ddl("ALTER TABLE cc.pages ADD COLUMN q double")["ddl_type"] == "ADD_COLUMN"
    p = parse_ddl("ALTER TABLE t RENAME COLUMN a TO b")
    assert (p["ddl_type"], p["ddl_column"], p["ddl_new_name"]) == ("RENAME_COLUMN", "a", "b")
    p = parse_ddl("ALTER TABLE t MODIFY c bigint")
    assert (p["ddl_type"], p["ddl_new_type"]) == ("WIDEN_TYPE", "bigint")
    assert parse_ddl("DROP TABLE t")["stmt_class"] == "ERASE"
    assert parse_ddl("SELECT 1")["stmt_class"] == "QUERY"


def test_sql_text_ddl_applies_to_lake(spark, tmp_table_dir):
    """A DDL row carrying only SQL text evolves the table schema, and the
    replay is idempotent; non-evolution DDL (index) is a no-op."""
    t = LakeTable.create(spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"])
    row = {"ddl_type": None, "ddl_sql": "ALTER TABLE cc.pages ADD COLUMN quality double"}
    assert apply_ddl_idempotent(t, row) is True
    assert "quality" in [f.name for f in t.schema().fields]
    assert apply_ddl_idempotent(t, row) is False  # replay no-op
    assert apply_ddl_idempotent(t, {"ddl_type": None, "ddl_sql": "CREATE INDEX i ON cc.pages (url)"}) is False
    assert apply_ddl_idempotent(
        t, {"ddl_type": None, "ddl_sql": "ALTER TABLE cc.pages RENAME COLUMN quality TO score"}
    ) is True
    assert "score" in [f.name for f in t.schema().fields]


def test_unsigned_promotion_ladder(spark):
    """LogEventConvert.java:694-725: raw signed readings of unsigned
    columns promote by +2^bits; bigint promotes past bigint to decimal."""
    df = spark.createDataFrame([(1,)], "x int")
    cases = [
        ("'-1'", "tinyint unsigned", "255"),
        ("'100'", "tinyint unsigned", "100"),
        ("'-1'", "smallint unsigned", "65535"),
        ("'-1'", "mediumint unsigned", "16777215"),
        ("'-1'", "int(10) unsigned", "4294967295"),
        ("'-1'", "bigint(20) unsigned", "18446744073709551615"),
        ("'-5'", "bigint unsigned", "18446744073709551611"),
        ("'-7'", "int(11)", "-7"),  # signed: no promotion
        ("NULL", "int unsigned", None),
    ]
    exprs = [
        F.expr(f"CAST({decode_value_expr(raw, mt)} AS STRING)").alias(f"c{i}")
        for i, (raw, mt, _) in enumerate(cases)
    ]
    row = df.select(*exprs).collect()[0]
    for i, (raw, mt, want) in enumerate(cases):
        assert row[f"c{i}"] == want, (raw, mt, row[f"c{i}"], want)


def test_decode_row_images(spark):
    """FlatMessage → typed before/after rows: data/old maps explode and
    decode; inserts have null before-images."""
    msgs = [
        {
            "id": 1, "database": "cc", "table": "t", "pkNames": ["id"],
            "isDdl": False, "type": "UPDATE", "es": 1000, "ts": 2000, "sql": None,
            "sqlType": {"id": 4, "n": 4}, "mysqlType": {"id": "int(10) unsigned", "n": "int"},
            "data": [{"id": "-1", "n": "5"}, {"id": "7", "n": "8"}],
            "old": [{"id": "-1", "n": "4"}, {"id": "7", "n": "6"}],
        },
        {
            "id": 2, "database": "cc", "table": "t", "pkNames": ["id"],
            "isDdl": False, "type": "INSERT", "es": 3000, "ts": 4000, "sql": None,
            "sqlType": {"id": 4, "n": 4}, "mysqlType": {"id": "int(10) unsigned", "n": "int"},
            "data": [{"id": "9", "n": "1"}],
            "old": None,
        },
    ]
    df = spark.createDataFrame(msgs, FLAT_MESSAGE_SCHEMA)
    out = decode_row_images(df, [("id", "int(10) unsigned"), ("n", "int")])
    rows = {(r["id"], r["row_idx"]): r for r in out.collect()}
    assert rows[(1, 0)]["after_id"] == 4294967295  # -1 promoted
    assert rows[(1, 0)]["before_n"] == 4 and rows[(1, 0)]["op"] == "U"
    assert rows[(1, 1)]["after_id"] == 7 and rows[(1, 1)]["before_n"] == 6
    assert rows[(2, 0)]["op"] == "I" and rows[(2, 0)]["before_id"] is None
    assert rows[(2, 0)]["after_id"] == 9
