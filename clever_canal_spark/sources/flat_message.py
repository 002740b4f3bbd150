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

Spark-first: every decode is a JVM ``TRY_CAST`` / ``CASE`` expression over
``element_at(data, 'col')`` — codegen'd, no Python. The expression strings
are dialect-neutral (valid Spark SQL and DuckDB SQL) so the driver's
DuckDB oracle replays the exact same ladder.
"""

from __future__ import annotations

import re

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

# MySQL charset name → (Spark-native decode() charset | None, Python codec).
# The reference maps 200+ MySQL charsets to Java charset names
# (CharsetConversion.java:1-389); this covers the names that occur on
# column definitions. Spark 4 restricts decode()/encode() to seven
# charsets — anything outside that set routes through the Arrow codec UDF
# (:func:`decode_charset_udf`). Wire contract: non-UTF-8 TEXT columns ship
# their raw bytes latin-1-escaped in the string (the same ISO-8859-1
# byte-preserving trick the BLOB path uses, LogEventConvert.java:767-771).
_MYSQL_CHARSETS = {
    "latin1": ("ISO-8859-1", "latin-1"),
    "ascii": ("US-ASCII", "ascii"),
    "utf8": ("UTF-8", "utf-8"),
    "utf8mb3": ("UTF-8", "utf-8"),
    "utf8mb4": ("UTF-8", "utf-8"),
    "utf16": ("UTF-16", "utf-16"),
    "utf16le": ("UTF-16LE", "utf-16-le"),
    "ucs2": ("UTF-16BE", "utf-16-be"),
    "utf32": ("UTF-32", "utf-32"),
    "gbk": (None, "gbk"),
    "gb2312": (None, "gb2312"),
    "gb18030": (None, "gb18030"),
    "big5": (None, "big5"),
    "sjis": (None, "shift_jis"),
    "cp932": (None, "cp932"),
    "ujis": (None, "euc-jp"),
    "euckr": (None, "euc-kr"),
    "latin2": (None, "iso8859-2"),
    "latin5": (None, "iso8859-9"),
    "greek": (None, "iso8859-7"),
    "hebrew": (None, "iso8859-8"),
    "cp1250": (None, "cp1250"),
    "cp1251": (None, "cp1251"),
    "cp1256": (None, "cp1256"),
    "cp1257": (None, "cp1257"),
    "tis620": (None, "tis-620"),
    "koi8r": (None, "koi8-r"),
}

# the default: feeds ship UTF-8 text as proper strings, no conversion
_UTF8_FAMILY = ("utf8", "utf8mb3", "utf8mb4")

_TEXT_BASES = (
    "char", "varchar", "text", "tinytext", "mediumtext", "longtext",
    "enum", "set",
)

_CHARSET_PAT = re.compile(r"(?:character\s+set|charset)[\s=]+(\w+)", re.IGNORECASE)


def column_charset(mysql_type: str) -> str | None:
    """The declared column charset (``TEXT CHARACTER SET latin1`` /
    ``varchar(20) charset gbk``), lowercased; None when unspecified
    (→ the documented UTF-8 default)."""
    m = _CHARSET_PAT.search(mysql_type)
    return m.group(1).lower() if m else None


def decode_charset_udf(charset: str):
    """Arrow-batched pandas UDF decoding latin-1-escaped wire bytes with a
    Python codec — the route for charsets outside Spark's restricted
    ``decode()`` set (gbk, big5, shift_jis, … — CharsetConversion.java's
    long tail). Unmappable bytes replace, never throw (poison-pill rule)."""
    import codecs

    import pandas as pd  # noqa: F401 — annotation target below
    from pyspark.sql.functions import pandas_udf

    codec = _MYSQL_CHARSETS.get(charset.lower(), (None, charset.lower()))[1]
    # validate the codec DRIVER-SIDE: an unknown name would otherwise
    # LookupError inside every executor batch — the exact poison-pill
    # failure this module's TRY_CAST discipline exists to prevent
    try:
        codecs.lookup(codec)
    except LookupError as e:
        raise ValueError(
            f"MySQL charset {charset!r} has no Python codec ({codec!r}) — "
            f"add a mapping to _MYSQL_CHARSETS or pre-convert the feed"
        ) from e

    def _dec(v):
        return v.map(
            lambda s: None
            if s is None
            else s.encode("latin-1", errors="replace").decode(codec, errors="replace")
        )

    _dec.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")


def _time_parts(v: str) -> tuple[str, str, str, str, str, str]:
    """Shared-dialect sub-expressions for TIME decode: (sign, h, m, s,
    frac_micros, seconds_field)."""
    a = f"(CASE WHEN left({v}, 1) = '-' THEN substr({v}, 2) ELSE {v} END)"
    sp = f"split_part({a}, ':', 3)"
    h = f"TRY_CAST(split_part({a}, ':', 1) AS BIGINT)"
    m = f"TRY_CAST(split_part({a}, ':', 2) AS BIGINT)"
    s = f"TRY_CAST(split_part({sp}, '.', 1) AS BIGINT)"
    frac = (
        f"(CASE WHEN instr({sp}, '.') > 0 "
        f"THEN TRY_CAST(rpad(split_part({sp}, '.', 2), 6, '0') AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
    )
    sign = f"(CASE WHEN left({v}, 1) = '-' THEN -1 ELSE 1 END)"
    return sign, h, m, s, frac, sp


def _time_micros_expr(v: str) -> str:
    sign, h, m, s, frac, _ = _time_parts(v)
    return f"({sign} * ((({h} * 60 + {m}) * 60 + {s}) * 1000000 + {frac}))"


def decode_value_expr(value_expr: str, mysql_type: str, dialect: str = "spark") -> str:
    """SQL expression decoding one stringly value to its engine type,
    applying the unsigned promotion ladder for raw signed inputs.

    ``mysql_type`` is the declared MySQL column type, e.g. ``'int(10)
    unsigned'``, ``'varchar(255)'``, ``'datetime'``. The produced SQL is
    valid in both Spark and DuckDB (TRY_CAST/CASE only). TRY_CAST, not
    CAST: Spark 4 defaults to ANSI mode, where one malformed wire value
    would throw and kill the whole batch — a poison pill. TRY_CAST nulls
    it instead, and :func:`malformed_value_expr` flags exactly those rows
    so the caller can dead-letter them.

    ``dialect`` matters only for charset-bearing text types (``TEXT
    CHARACTER SET latin1``): the Spark form is a real byte-recovering
    ``decode(encode(v, 'ISO-8859-1'), cs)``, while the DuckDB oracle twin
    is the roundtrip identity for single-byte identity charsets
    (latin1/ascii — wire codepoints == bytes == decoded codepoints) and
    unsupported otherwise. Charsets outside Spark's restricted decode()
    set raise — route those through :func:`decode_charset_udf`. Columns
    without a charset clause keep the UTF-8-default passthrough, emitted
    identically for every dialect (back-compatible shared SQL)."""
    mt = mysql_type.strip().lower()
    # base type = first token before any (length) or UNSIGNED/ZEROFILL
    base = mt.split("(")[0].split()[0]
    unsigned = "unsigned" in mt
    v = value_expr
    if base in _TEXT_BASES:
        cs = column_charset(mt)
        if cs and cs not in _UTF8_FAMILY:
            jvm = _MYSQL_CHARSETS.get(cs, (None, None))[0]
            if dialect == "duckdb":
                if cs in ("latin1", "ascii"):
                    return v  # byte↔codepoint identity roundtrip
                raise ValueError(
                    f"charset {cs!r} has no DuckDB-expressible decode twin"
                )
            if jvm is None:
                raise ValueError(
                    f"charset {cs!r} is outside Spark's native decode() set — "
                    "use decode_charset_udf"
                )
            return f"decode(encode({v}, 'ISO-8859-1'), '{jvm}')"
        return v
    if base == "year":
        # RowsLogBuffer.java:191-199 formats YEAR as the plain number;
        # Spark has no YEAR type — INT is the faithful engine shape
        return f"TRY_CAST({v} AS INT)"
    if base == "time":
        # 'HH:MM:SS[.ffffff]', hours up to 838, optionally negative
        # (RowsLogBuffer.java:200-211); Spark has no TIME type —
        # microseconds-since-midnight BIGINT is the faithful shape
        return _time_micros_expr(v)
    if base in ("tinyint", "smallint", "mediumint", "int", "integer", "bigint"):
        if not unsigned:
            target = "BIGINT" if base == "bigint" else "INT"
            return f"TRY_CAST({v} AS {target})"
        off = _UNSIGNED_OFFSET[base]
        if base == "bigint":
            # promoted past bigint: decimal(20,0) holds [0, 2^64)
            c = f"TRY_CAST({v} AS DECIMAL(20,0))"
            return f"(CASE WHEN {c} < 0 THEN {c} + {off} ELSE {c} END)"
        target = "BIGINT" if base in ("int", "integer") else "INT"
        c = f"TRY_CAST({v} AS {target})"
        return f"(CASE WHEN {c} < 0 THEN {c} + {off} ELSE {c} END)"
    if base in ("float",):
        return f"TRY_CAST({v} AS FLOAT)"
    if base in ("double", "real"):
        return f"TRY_CAST({v} AS DOUBLE)"
    if base in ("decimal", "numeric"):
        # only the balanced (p,s) group: 'decimal(10,2) unsigned' must not
        # leak the UNSIGNED/ZEROFILL suffix into the CAST (parse error)
        inner = (
            mt[mt.find("(") : mt.find(")") + 1]
            if "(" in mt and ")" in mt
            else "(38,9)"
        )
        return f"TRY_CAST({v} AS DECIMAL{inner})"
    if base in ("datetime", "timestamp"):
        return f"TRY_CAST({v} AS TIMESTAMP)"
    if base == "date":
        return f"TRY_CAST({v} AS DATE)"
    if base in ("bit", "boolean", "bool"):
        return f"(TRY_CAST({v} AS INT) != 0)"
    if base in (
        "blob", "binary", "varbinary", "longblob", "mediumblob", "tinyblob",
        # the GEOMETRY family decodes exactly like BLOB — "copy from BLOB
        # or TEXT" (RowsLogBuffer.java:1099-1117; type tag at :250): the
        # wire value is the WKB payload. Spark has no geometry type;
        # BINARY keeps every byte for a downstream spatial reader instead
        # of mangling WKB through a string column.
        "geometry", "point", "linestring", "polygon", "multipoint",
        "multilinestring", "multipolygon", "geometrycollection",
        "geomcollection",
    ):
        # BLOB: the wire string preserves bytes via latin-1 (the reference's
        # ISO-8859-1 trick, LogEventConvert.java:767-771); TEXT stays string.
        # DuckDB's encode() takes no charset (always UTF-8), so the oracle
        # twin is byte-identical only for ASCII-range payloads — fixtures
        # keep oracle blobs ASCII; the full 0x00-0xFF range is pinned by
        # the pytest truth table (test_geometry_decode_byte_preserving).
        if dialect == "duckdb":
            return f"encode({v})"
        return f"encode({v}, 'ISO-8859-1')"
    return v  # char/varchar/text/enum/set/json → string as-is


def malformed_value_expr(value_expr: str, mysql_type: str) -> str:
    """Boolean SQL: the raw wire string is present but would NOT survive
    the typed decode — i.e. :func:`decode_value_expr`'s CAST yields null
    for a non-null input (the decoder's TRY_CAST nulls silently; the flag
    makes the loss explicit so callers can dead-letter the row instead of
    ingesting a hole). TRY_CAST spells identically in Spark and DuckDB,
    so the expression is shared-dialect like the decoder itself. String,
    enum/set/json, and BLOB (latin-1 byte-preserving encode) decodes can
    never lose a value → constant ``false``."""
    mt = mysql_type.strip().lower()
    base = mt.split("(")[0].split()[0]
    v = value_expr
    if base in ("tinyint", "smallint", "mediumint", "int", "integer", "bigint"):
        unsigned = "unsigned" in mt
        if base == "bigint" and unsigned:
            target = "DECIMAL(20,0)"
        elif base == "bigint" or (unsigned and base in ("int", "integer")):
            target = "BIGINT"
        else:
            target = "INT"
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS {target}) IS NULL)"
    if base in ("float", "double", "real"):
        t = "FLOAT" if base == "float" else "DOUBLE"
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS {t}) IS NULL)"
    if base in ("decimal", "numeric"):
        inner = (
            mt[mt.find("(") : mt.find(")") + 1]
            if "(" in mt and ")" in mt
            else "(38,9)"
        )
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS DECIMAL{inner}) IS NULL)"
    if base in ("datetime", "timestamp"):
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS TIMESTAMP) IS NULL)"
    if base == "date":
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS DATE) IS NULL)"
    if base in ("bit", "boolean", "bool"):
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS INT) IS NULL)"
    if base == "year":
        return f"({v} IS NOT NULL AND TRY_CAST({v} AS INT) IS NULL)"
    if base == "time":
        _, h, m, s, _, _ = _time_parts(v)
        return (
            f"({v} IS NOT NULL AND "
            f"({h} IS NULL OR {m} IS NULL OR {s} IS NULL))"
        )
    return "false"


def decode_row_images(
    df: DataFrame,
    columns: list[tuple[str, str]],
    data_col: str = "data",
    old_col: str = "old",
    malformed_col: str | None = None,
) -> DataFrame:
    """FlatMessage rows → one row per row-image with typed columns.

    ``columns``: [(name, mysql_type), ...] — the table spec (the reference
    gets this from TableMeta; a Spark job declares it or derives it from
    the first message's ``mysqlType`` map). ``after_<name>`` columns decode
    ``data``; ``before_<name>`` decode ``old`` (null-filled for inserts,
    matching FlatMessage's sparse ``old`` maps). All decodes are JVM casts.

    ``malformed_col`` names an optional boolean flag column: true when ANY
    image value present on the wire would be silently nulled by its typed
    decode (its TRY_CAST comes back NULL) — the dead-letter routing signal.
    Route flagged rows to a quarantine table instead of merging a hole:
    ``good = out.filter(~F.col(flag)); dlq = out.filter(F.col(flag))``.
    The reference surfaces these as parse exceptions that stall the batch
    (LogEventConvert parse errors); here the batch keeps flowing and the
    poison rows carry their evidence with them.
    """
    # align data[i] with old[i] by ZIPPING inside each message row — no
    # (id, row_idx) join: FlatMessage ids are per-destination batch ids
    # that reset on server restart, so id is NOT unique in a frame and a
    # join would cross-match before-images across colliding messages
    # (and cost a shuffle). arrays_zip pads the shorter side with null
    # (old is null/sparse for inserts); coalesce keeps a null/empty data
    # array producing one null row-image, as posexplode_outer did.
    empty = F.array().cast("array<map<string,string>>")
    base = df.select(
        "id", "database", "table", "type", "es",
        F.coalesce(F.col(data_col), empty).alias("__d"),
        F.coalesce(F.col(old_col), empty).alias("__o"),
    )
    joined = base.select(
        "id", "database", "table", "type", "es",
        F.posexplode_outer(F.arrays_zip("__d", "__o")).alias("row_idx", "__z"),
    ).select(
        "id", "database", "table", "type", "es", "row_idx",
        F.col("__z.__d").alias("__after"), F.col("__z.__o").alias("__before"),
    )
    def _dec(side: str, name: str, mt: str) -> F.Column:
        raw = f"element_at({side}, '{name}')"
        try:
            return F.expr(decode_value_expr(raw, mt))
        except ValueError:
            # charset outside Spark's native decode() set → Arrow codec UDF
            return decode_charset_udf(column_charset(mt))(F.expr(raw))

    cols = [
        _dec("__after", name, mt).alias(f"after_{name}") for name, mt in columns
    ] + [
        _dec("__before", name, mt).alias(f"before_{name}") for name, mt in columns
    ]
    if malformed_col is not None:
        terms = [
            malformed_value_expr(f"element_at({side}, '{name}')", mt)
            for name, mt in columns
            for side in ("__after", "__before")
        ]
        terms = [t for t in terms if t != "false"]
        flag = " OR ".join(terms) if terms else "false"
        cols.append(F.expr(flag).alias(malformed_col))
    return joined.select(
        "id", "database", "table",
        F.expr("CASE type WHEN 'INSERT' THEN 'I' WHEN 'DELETE' THEN 'D' ELSE 'U' END").alias("op"),
        "row_idx", "es", *cols,
    )


def _slit(s: str, dialect: str) -> str:
    """Python string → SQL string literal for the dialect. Spark string
    literals process backslash escapes (and need quotes escaped with a
    backslash); DuckDB's are standard SQL (backslash literal, single
    quote doubled). Same seam as ddl_sql._p."""
    if dialect == "spark":
        body = s.replace("\\", "\\\\").replace("'", "\\'")
    else:
        body = s.replace("'", "''")
    return "'" + body + "'"


def encode_flat_message_expr(
    database_expr: str,
    table_expr: str,
    op_expr: str,
    es_expr: str,
    pk_names: list[str],
    data_cols: list[tuple[str, str]],
    dialect: str = "spark",
) -> str:
    """One FlatMessage JSON document per change row, as a SQL string
    expression rendered for ``dialect`` ('spark' | 'duckdb') from one
    template — the ENCODE twin of `decode_row_images`, i.e. the wire
    format the reference's clients consume (FlatMessage.java:10-35;
    serialized by the MQ sinks).

    Built by string concatenation with a fixed key order rather than
    ``to_json``: engines disagree on struct-to-JSON spacing/key order, and
    a wire format needs ONE canonical byte encoding. ``data_cols``:
    [(json_key, value_sql_expr_yielding_string), ...]; values are
    JSON-escaped (quote and backslash — the feeds this encodes carry no
    control characters; a real deployment extends the replace chain the
    same way). ``op_expr`` must yield I/U/D; the encoder maps it to
    Canal's INSERT/UPDATE/DELETE spellings.
    """

    def lit(s: str) -> str:
        return _slit(s, dialect)

    def esc(expr: str) -> str:
        # backslash first, then quote — JSON escaping for string values
        return (
            f"replace(replace({expr}, {lit(chr(92))}, {lit(chr(92) * 2)}), "
            f"{lit(chr(34))}, {lit(chr(92) + chr(34))})"
        )

    ty = (
        f"CASE {op_expr} WHEN 'I' THEN 'INSERT' "
        "WHEN 'D' THEN 'DELETE' ELSE 'UPDATE' END"
    )
    pks = ",".join('"' + p + '"' for p in pk_names)
    parts: list[str] = [
        lit('{"database":"'), database_expr,
        lit('","table":"'), table_expr,
        lit('","type":"'), ty,
        lit('","es":'), f"CAST({es_expr} AS STRING)",
        lit(f',"pkNames":[{pks}],"isDdl":false,"data":[{{'),
    ]
    for i, (k, v) in enumerate(data_cols):
        sep = "," if i else ""
        # NULL values encode as JSON null — a bare NULL would propagate
        # through the whole || chain and silently void the entire message
        quoted = f"({lit(chr(34))} || {esc(v)} || {lit(chr(34))})"
        parts += [
            lit(f'{sep}"{k}":'),
            f"(CASE WHEN {v} IS NULL THEN 'null' ELSE {quoted} END)",
        ]
    parts.append(lit("}]}"))
    return " || ".join(parts)


FLAT_MESSAGE_SPARK_SCHEMA = (
    "database string, table string, type string, es bigint, "
    "pkNames array<string>, isDdl boolean, sql string, "
    "data array<map<string,string>>, old array<map<string,string>>"
)


def decode_flat_message(df, json_col: str = "value"):
    """DECODE twin of :func:`encode_flat_message_expr` — the MQ-consumer
    ingestion path (a client of the reference's RocketMQ/Kafka sinks
    parses exactly this document, FlatMessage.java:10-35): one output row
    per entry of the ``data`` array, with Canal's INSERT/UPDATE/DELETE
    spellings mapped back to I/U/D and values as the string map the
    stringly-typed feed carries (downstream, `decode_row_images` applies
    the per-type promotion ladder exactly as for any flat feed).

    Real Canal messages carry more than this repo's encoder emits, and
    the decoder must not lose it: ``old`` (the UPDATE before-image maps,
    aligned to ``data`` by position — zipped row-wise, never joined) and
    DDL / empty-data messages (``data`` null, ``sql`` set), which emit
    ONE row with a null ``data`` map so a consumer driving schema
    evolution still sees them (filter ``is_ddl`` / null data when only
    row images matter).

    JVM-side ``from_json`` with an explicit schema — never a Python JSON
    loop — so a Kafka topic of FlatMessage bytes feeds `apply_epoch` at
    full codegen speed: round trip decode(encode(x)) == x is oracle- and
    pytest-pinned."""
    from pyspark.sql import functions as F

    parsed = df.select(F.from_json(F.col(json_col), FLAT_MESSAGE_SPARK_SCHEMA).alias("m"))
    empty = F.array().cast("array<map<string,string>>")
    base = parsed.select(
        F.col("m.database").alias("schema_name"),
        F.col("m.table").alias("table_name"),
        F.expr(
            "CASE m.type WHEN 'INSERT' THEN 'I' WHEN 'DELETE' THEN 'D' ELSE 'U' END"
        ).alias("op"),
        F.col("m.es").alias("es"),
        F.col("m.pkNames").alias("pk_names"),
        F.col("m.isDdl").alias("is_ddl"),
        F.col("m.sql").alias("sql"),
        F.coalesce(F.col("m.data"), empty).alias("__d"),
        F.coalesce(F.col("m.old"), empty).alias("__o"),
    )
    return base.select(
        "schema_name", "table_name", "op", "es", "pk_names", "is_ddl", "sql",
        F.posexplode_outer(F.arrays_zip("__d", "__o")).alias("row_idx", "__z"),
    ).select(
        "schema_name", "table_name", "op", "es", "pk_names", "is_ddl", "sql",
        "row_idx",
        F.col("__z.__d").alias("data"),
        F.col("__z.__o").alias("old_data"),
    )


def export_flat_messages(
    table,
    from_version: int,
    to_version: int | None = None,
    database: str = "db",
    table_name: str = "t",
    data_cols: list[tuple[str, str]] | None = None,
    mq=None,
):
    """MQ-sink BACKFILL (the CanalMQProducer replay story): the lake's
    incremental changelog between two snapshots re-serialized as
    canonical FlatMessage wire documents — one JSON per change row,
    ``es`` = the row's source LSN, delete markers as DELETE messages.
    A downstream that lost its topic (or a brand-new consumer group)
    re-materializes from the lake instead of the (long-gone) binlog.

    ``data_cols`` defaults to every current string-typed column,
    null-coalesced to '' (the canonical encoder emits strings; extend
    with explicit exprs for typed columns). Returns one ``value`` string
    column; O(changes) file-diff read, encode is pure JVM exprs.

    ``mq`` (an MQRoutingConfig) adds ``mq_topic``/``mq_partition``
    columns routed per CanalMQConfig semantics — ``$pk$`` expands to the
    table's merge key — so the caller can ship a PARTITIONED queue
    layout with per-key ordering preserved."""
    from pyspark.sql import functions as F

    snap = table.snapshot()
    if data_cols is None:
        data_cols = [
            (f["name"], f"coalesce(CAST({f['name']} AS STRING), '')")
            for f in snap.current_fields()
            if f["type"] == "string"
        ]
    msg = encode_flat_message_expr(
        f"'{database}'",
        f"'{table_name}'",
        "__op",
        "__lsn",
        pk_names=list(snap.merge_key),
        data_cols=data_cols,
        dialect="spark",
    )
    ch = table.scan_changes(from_version, to_version)
    if mq is None:
        return ch.select(F.expr(msg).alias("value"))
    # collision-safe temporary: a payload column named `value` (a common
    # KV shape) would otherwise make the final select AMBIGUOUS_REFERENCE
    # against the encoded-message alias riding next to ch.columns
    out = ch.select(F.expr(msg).alias("__ccs_value"), *ch.columns)
    from .mq_partition import assign_mq_routing

    routed = assign_mq_routing(
        out,
        mq,
        pk_cols=list(snap.merge_key),
        schema_col=f"'{database}'",
        table_col=f"'{table_name}'",
    )
    return routed.select(
        F.col("__ccs_value").alias("value"), "mq_topic", "mq_partition"
    )


def export_flat_messages_to_dir(
    table,
    out_dir: str,
    database: str = "db",
    table_name: str = "t",
    data_cols: "list[tuple[str, str]] | None" = None,
    to_version: int | None = None,
    mq=None,
) -> dict:
    """Incremental MQ-sink connector: ship the lake changelog to a
    directory of FlatMessage JSONL batches with a durable resume cursor
    — the CanalMQProducer delivery loop (D7/D8) rebuilt as files a
    downstream queue loader tails (CanalMQProducer.java send loop;
    MQMessageUtils partitioning).

    Layout: each call that finds new versions writes
    ``{out_dir}/batch-{from+1:08d}-{head:08d}/part-*.txt`` (one
    FlatMessage JSON per line, ``es`` = source LSN) and then atomically
    replaces ``{out_dir}/_cursor.json``. Batch directory names are a
    pure function of the consumed version range, and the content is a
    deterministic re-serialization of the changelog slice (the same
    line SET; part-file splits may differ) — so the crash window
    (batch written, cursor not) re-exports the same messages over the
    same directory: downstream sees at-least-once DIRECTORIES with
    exactly-once CONTENT, and takes them in name order. Returns
    ``{consumed, n_messages, path}`` (consumed=0 → nothing new).

    A TRUNCATE inside the range ships nothing for the erased rows (the
    changelog is metadata-only there) — mirror truncates out-of-band,
    same contract as every changelog consumer. ``SnapshotExpired``
    propagates: a connector that fell behind retention must re-seed its
    downstream (the replica's bootstrap story), not silently skip."""
    import json as _json
    import os as _os

    cur_path = _os.path.join(out_dir, "_cursor.json")
    try:
        with open(cur_path) as fh:
            synced = int(_json.load(fh)["version"])
    except FileNotFoundError:
        synced = 0
    head = table.current_version() if to_version is None else int(to_version)
    if head <= synced:
        return {"consumed": 0, "n_messages": 0, "path": None}
    msgs = export_flat_messages(
        table, synced, head, database=database, table_name=table_name,
        data_cols=data_cols, mq=mq,
    )
    batch_dir = _os.path.join(out_dir, f"batch-{synced + 1:08d}-{head:08d}")
    w = msgs.write.mode("overwrite")
    if mq is not None:
        # queue layout: batch-*/mq_topic=T/mq_partition=K/part-*.txt — a
        # loader tails one (topic, partition) subtree per queue partition;
        # per-key ordering holds because one key always hashes to one
        # partition (assign_mq_routing) and directories arrive in name
        # (= version-range) order
        w = w.partitionBy("mq_topic", "mq_partition")
    w.text(batch_dir)
    n = table.spark.read.text(batch_dir).count()
    _os.makedirs(out_dir, exist_ok=True)
    tmp = cur_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"version": head}, fh)
    _os.replace(tmp, cur_path)
    return {"consumed": head - synced, "n_messages": n, "path": batch_dir}


def detect_schema_drift(
    df,
    expected: dict[str, str],
    data_col: str = "data",
    wire_types_col: str | None = None,
):
    """Schema-drift report over a stringly-typed image stream: the feed's
    OBSERVED shape vs the lake's DECLARED shape, for drift that arrives
    WITHOUT a DDL event (the reference only evolves on captured DDL —
    FlatMessage consumers routinely see upstream changes first as row
    images / mysqlType maps that quietly stopped matching).

    ``expected`` maps column → declared MySQL type (the lake's view of
    the source table). Emits one row per finding, ``(column_name, finding,
    n_rows, wire_type)``:

    - ``unknown_column`` — a map key no declared column explains;
      n_rows = images carrying it (the signal an un-captured ADD COLUMN
      happened upstream).
    - ``missing_column`` — a declared column present in ZERO images.
      Partial images are normal (sparse updates), total absence is the
      un-captured DROP COLUMN signal; n_rows = 0 by construction.
    - ``type_violation`` — a present value the declared type's decode
      would silently null (:func:`malformed_value_expr` — the DLQ flag,
      aggregated per column); n_rows = lossy images.
    - ``type_changed`` — only with ``wire_types_col``: the message's own
      declared ``mysqlType`` disagrees with ``expected`` (normalized
      case/whitespace); n_rows = images, wire_type = max() of the
      offending declarations (deterministic pick).

    Scale shape: ONE vocabulary-bounded shuffle (explode of map KEYS
    only — values never move) partial-aggregated per column name, plus
    ONE 1-row conditional-sum aggregate for the per-declared-column
    checks, unpivoted driver-free via stack(). The expected-column frame
    is a schema-sized literal. No UDFs, no corpus-keyed shuffle."""
    from pyspark.sql import functions as F

    if not expected:
        raise ValueError("detect_schema_drift needs at least one expected column")
    spark = df.sparkSession
    cols = sorted(expected)
    exp_df = spark.createDataFrame([(c,) for c in cols], "column_name string")

    # presence per observed key: the only shuffle, keyed by column NAME
    presence = (
        df.select(F.explode(F.map_keys(F.col(data_col))).alias("column_name"))
        .groupBy("column_name")
        .agg(F.count("*").alias("n_rows"))
    )
    unknown = (
        presence.join(F.broadcast(exp_df), on="column_name", how="left_anti")
        .select(
            "column_name",
            F.lit("unknown_column").alias("finding"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.lit(None).cast("string").alias("wire_type"),
        )
    )
    # anti joins build their RIGHT side: broadcast presence (vocabulary-
    # bounded — one row per distinct observed column name), never the
    # stream; a left-side broadcast hint is unsupported and ignored.
    missing = (
        exp_df
        .join(F.broadcast(presence), on="column_name", how="left_anti")
        .select(
            "column_name",
            F.lit("missing_column").alias("finding"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(None).cast("string").alias("wire_type"),
        )
    )

    # per-declared-column checks: ONE 1-row aggregate, stack()-unpivoted
    aggs = []
    for i, c in enumerate(cols):
        v = f"element_at({data_col}, '{c}')"
        aggs.append(
            F.expr(
                f"sum(CASE WHEN {malformed_value_expr(v, expected[c])} THEN 1 ELSE 0 END)"
            ).cast("long").alias(f"viol{i}")
        )
        if wire_types_col is not None:
            norm = f"lower(trim(element_at({wire_types_col}, '{c}')))"
            bad = f"({norm} IS NOT NULL AND {norm} <> '{expected[c].strip().lower()}')"
            aggs.append(
                F.expr(f"sum(CASE WHEN {bad} THEN 1 ELSE 0 END)").cast("long").alias(f"chg{i}")
            )
            aggs.append(
                F.expr(f"max(CASE WHEN {bad} THEN {norm} END)").alias(f"wt{i}")
            )
    one = df.agg(*aggs)
    viol_stack = ", ".join(f"'{c}', viol{i}" for i, c in enumerate(cols))
    viol = one.selectExpr(
        f"stack({len(cols)}, {viol_stack}) AS (column_name, n_rows)"
    ).where(F.col("n_rows") > 0).select(
        "column_name",
        F.lit("type_violation").alias("finding"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.lit(None).cast("string").alias("wire_type"),
    )
    parts = [unknown, missing, viol]
    if wire_types_col is not None:
        chg_stack = ", ".join(f"'{c}', chg{i}, wt{i}" for i, c in enumerate(cols))
        chg = one.selectExpr(
            f"stack({len(cols)}, {chg_stack}) AS (column_name, n_rows, wire_type)"
        ).where(F.col("n_rows") > 0).select(
            "column_name",
            F.lit("type_changed").alias("finding"),
            F.col("n_rows").cast("long").alias("n_rows"),
            "wire_type",
        )
        parts.append(chg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def evolve_from_drift(
    table,
    df,
    data_col: str = "data",
    infer_types: bool = True,
) -> list[dict]:
    """Opt-in schema auto-evolution from OBSERVED drift — the Delta
    ``mergeSchema`` / Snowflake schema-evolution analog for the DDL-less
    channel: every ``unknown_column`` a batch of stringly-typed images
    carries is added to the lake schema, so the next
    ``decode_row_images`` pass can materialize it instead of dropping it
    on the floor. The DDL-event path (``plans.apply_ddl_idempotent``)
    remains the authoritative evolution channel; this is the fallback
    for upstreams whose DDL is not captured.

    Type inference (``infer_types``): ONE 1-row aggregate over the batch
    counts, per unknown column, the non-null values that fail TRY_CAST
    to BIGINT / DOUBLE / TIMESTAMP; the narrowest type with ZERO failures
    wins (bigint → double → timestamp → string), all-null columns fall
    back to string. Deterministic for a given batch, all JVM expressions.
    ``infer_types=False`` adds everything as string (the reference's own
    wire representation).

    Idempotent: a column that already exists (replayed batch, concurrent
    evolve) is skipped, so crash-replay cannot double-add. Returns the
    actions taken: ``[{column, type, n_rows}, ...]`` sorted by column
    name (deterministic apply order)."""
    from pyspark.sql import functions as F

    snap = table.snapshot()
    known = {f["name"] for f in snap.current_fields()}
    present = (
        df.select(F.explode(F.map_keys(F.col(data_col))).alias("column_name"))
        .groupBy("column_name")
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    unknown = sorted(
        (r["column_name"], int(r["n_rows"]))
        for r in present
        if r["column_name"] not in known
    )
    if not unknown:
        return []
    types: dict[str, str] = {c: "string" for c, _ in unknown}
    if infer_types:
        aggs = []
        for i, (c, _) in enumerate(unknown):
            v = f"element_at({data_col}, '{c}')"
            aggs.append(F.expr(f"count({v})").alias(f"nn{i}"))
            for t, sql_t in (("b", "BIGINT"), ("d", "DOUBLE"), ("t", "TIMESTAMP")):
                aggs.append(
                    F.expr(
                        f"sum(CASE WHEN {v} IS NOT NULL AND "
                        f"TRY_CAST({v} AS {sql_t}) IS NULL THEN 1 ELSE 0 END)"
                    ).alias(f"{t}{i}")
                )
        row = df.agg(*aggs).collect()[0]
        for i, (c, _) in enumerate(unknown):
            if row[f"nn{i}"] == 0:
                types[c] = "string"  # all-null: no evidence, widest wins
            elif row[f"b{i}"] == 0:
                types[c] = "bigint"
            elif row[f"d{i}"] == 0:
                types[c] = "double"
            elif row[f"t{i}"] == 0:
                types[c] = "timestamp"
    actions = []
    for c, n in unknown:
        cur = {f["name"] for f in table.snapshot().current_fields()}
        if c in cur:
            continue  # concurrent/replayed evolve already added it
        table.add_column(c, types[c])
        actions.append({"column": c, "type": types[c], "n_rows": n})
    return actions


def tail_flat_messages(
    spark,
    mq_dir: str,
    cursor_file: str | None = None,
    topic: str | None = None,
    partition: int | None = None,
):
    """Consumer side of the MQ-export loop — the Canal client's
    get/ack rebuilt over the file-queue layout (CanalServerWithEmbedded
    getWithoutAck/ack): read every batch directory newer than this
    consumer's durable cursor, in name (= version-range) order, and
    return the decoded messages plus the ack handle.

    ``topic``/``partition`` select one subtree of a routed export
    (``mq_topic=T/mq_partition=K`` — one queue worker per partition,
    per-key ordering guaranteed by the producer's hash routing); omit
    both for an unrouted export. Returns ``(df, ack)`` where ``df`` is
    the decoded FlatMessage frame (None when nothing new) and ``ack()``
    atomically advances the cursor past everything returned — crash
    before ack re-delivers the same batches (at-least-once, the
    rollback/redelivery contract; dedupe downstream by (lsn, pk) or
    merge LWW, which is idempotent anyway)."""
    import json as _json
    import os as _os

    if (topic is None) != (partition is None):
        raise ValueError("pass both topic and partition, or neither")
    cursor_file = cursor_file or _os.path.join(mq_dir, "_consumer.json")
    try:
        with open(cursor_file) as fh:
            consumed = _json.load(fh)["batch"]
    except FileNotFoundError:
        consumed = ""
    batches = sorted(
        d for d in _os.listdir(mq_dir)
        if d.startswith("batch-") and d > consumed
    )
    paths = []
    for b in batches:
        p = _os.path.join(mq_dir, b)
        if topic is not None:
            p = _os.path.join(p, f"mq_topic={topic}", f"mq_partition={partition}")
        if _os.path.isdir(p):
            paths.append(p)

    def ack():
        if not batches:
            return
        tmp = cursor_file + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump({"batch": batches[-1]}, fh)
        _os.replace(tmp, cursor_file)

    if not paths:
        return (None, ack)
    raw = spark.read.text(paths)
    return (decode_flat_message(raw, "value"), ack)
