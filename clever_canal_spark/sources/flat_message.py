"""Stringly-typed value decode — the Canal FlatMessage / Column-proto edge.

The reference's core parse job is turning binlog row images into
stringly-typed columns plus JDBC type ids: ``Column{value: string, sqlType:
int, mysqlType: string}`` (EntryProtocol.proto:145-147), with the JSON-feed
shape ``FlatMessage{data: list<map<string,string>>, sqlType, mysqlType}``
(FlatMessage.java:10-35). Consumers re-typing those strings must apply the
**unsigned promotion ladder** (LogEventConvert.java:694-725): a raw signed
value that's negative for an UNSIGNED column gets the 2^bits offset added
and the type promoted one level — tinyint→smallint(int), smallint→int,
mediumint→int, int→bigint, bigint→decimal(20,0) — and TEXT-vs-BLOB splits
by charset (LogEventConvert.java:758-775: text→string, blob→binary).

Spark-first: every decode is a JVM ``CAST`` / ``CASE`` expression over
``element_at(data, 'col')`` — codegen'd, no Python. The expression strings
are dialect-neutral (valid Spark SQL and DuckDB SQL) so the driver's
DuckDB oracle replays the exact same ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# FlatMessage-shaped feed (FlatMessage.java:10-35): one row per message,
# data/old hold one map per affected row-image.
FLAT_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
        T.StructField("isDdl", T.BooleanType()),
        T.StructField("type", T.StringType()),  # INSERT / UPDATE / DELETE
        T.StructField("es", T.LongType()),      # source event ms
        T.StructField("ts", T.LongType()),      # delivery ms
        T.StructField("sql", T.StringType()),
        T.StructField("sqlType", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("mysqlType", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)

# 2^bits offsets, named after the reference's constants
# (LogEventConvert TINYINT_MAX_VALUE..BIGINT_MAX_VALUE, used at :694-725)
_UNSIGNED_OFFSET = {
    "tinyint": 256,
    "smallint": 65536,
    "mediumint": 16777216,
    "int": 4294967296,
    "integer": 4294967296,
    "bigint": 18446744073709551616,
}


def decode_value_expr(value_expr: str, mysql_type: str) -> str:
    """SQL expression decoding one stringly value to its engine type,
    applying the unsigned promotion ladder for raw signed inputs.

    ``mysql_type`` is the declared MySQL column type, e.g. ``'int(10)
    unsigned'``, ``'varchar(255)'``, ``'datetime'``. The produced SQL is
    valid in both Spark and DuckDB (CAST/CASE only)."""
    mt = mysql_type.strip().lower()
    # base type = first token before any (length) or UNSIGNED/ZEROFILL
    base = mt.split("(")[0].split()[0]
    unsigned = "unsigned" in mt
    v = value_expr
    if base in ("tinyint", "smallint", "mediumint", "int", "integer", "bigint"):
        if not unsigned:
            target = "BIGINT" if base == "bigint" else "INT"
            return f"CAST({v} AS {target})"
        off = _UNSIGNED_OFFSET[base]
        if base == "bigint":
            # promoted past bigint: decimal(20,0) holds [0, 2^64)
            c = f"CAST({v} AS DECIMAL(20,0))"
            return f"(CASE WHEN {c} < 0 THEN {c} + {off} ELSE {c} END)"
        target = "BIGINT" if base in ("int", "integer") else "INT"
        c = f"CAST({v} AS {target})"
        return f"(CASE WHEN {c} < 0 THEN {c} + {off} ELSE {c} END)"
    if base in ("float",):
        return f"CAST({v} AS FLOAT)"
    if base in ("double", "real"):
        return f"CAST({v} AS DOUBLE)"
    if base in ("decimal", "numeric"):
        inner = mt[mt.find("(") :] if "(" in mt else "(38,9)"
        return f"CAST({v} AS DECIMAL{inner})"
    if base in ("datetime", "timestamp"):
        return f"CAST({v} AS TIMESTAMP)"
    if base == "date":
        return f"CAST({v} AS DATE)"
    if base in ("bit", "boolean", "bool"):
        return f"(CAST({v} AS INT) != 0)"
    if base in ("blob", "binary", "varbinary", "longblob", "mediumblob", "tinyblob"):
        # BLOB: the wire string preserves bytes via latin-1 (the reference's
        # ISO-8859-1 trick, LogEventConvert.java:767-771); TEXT stays string
        return f"encode({v}, 'ISO-8859-1')"
    return v  # char/varchar/text/enum/set/json → string as-is


def decode_row_images(
    df: DataFrame,
    columns: list[tuple[str, str]],
    data_col: str = "data",
    old_col: str = "old",
) -> DataFrame:
    """FlatMessage rows → one row per row-image with typed columns.

    ``columns``: [(name, mysql_type), ...] — the table spec (the reference
    gets this from TableMeta; a Spark job declares it or derives it from
    the first message's ``mysqlType`` map). ``after_<name>`` columns decode
    ``data``; ``before_<name>`` decode ``old`` (null-filled for inserts,
    matching FlatMessage's sparse ``old`` maps). All decodes are JVM casts.
    """
    exploded = df.select(
        "id", "database", "table", "type", "es",
        F.posexplode_outer(F.col(data_col)).alias("row_idx", "__after"),
    )
    olds = df.select(
        "id", F.posexplode_outer(F.col(old_col)).alias("row_idx", "__before")
    )
    joined = exploded.join(olds, on=["id", "row_idx"], how="left")
    cols = [
        F.expr(decode_value_expr(f"element_at(__after, '{name}')", mt)).alias(f"after_{name}")
        for name, mt in columns
    ] + [
        F.expr(decode_value_expr(f"element_at(__before, '{name}')", mt)).alias(f"before_{name}")
        for name, mt in columns
    ]
    return joined.select(
        "id", "database", "table",
        F.expr("CASE type WHEN 'INSERT' THEN 'I' WHEN 'DELETE' THEN 'D' ELSE 'U' END").alias("op"),
        "row_idx", "es", *cols,
    )
