"""Raw DDL-SQL parsing (T5) — the SimpleDdlParser analog, Spark-first.

The reference classifies the SQL text of a QUERY/DDL binlog event into an
event type and extracts the target table (SimpleDdlParser.java:23-47
patterns, parse() order at :49-110; production uses the Druid AST parser,
DruidDdlParser.java:1-200, with SimpleDdlParser as fallback —
LogEventConvert.java:198-247). This module re-expresses that classifier in
two forms that must agree:

1. :func:`ddl_classify_exprs` — **vectorized SQL expressions** (regexp
   built-ins, JVM-side, whole-stage codegen; no UDF) for classifying a
   DataFrame column of SQL text. The expression strings are generated per
   dialect ('spark' | 'duckdb') from one source, so the DuckDB oracle runs
   the *same* classifier — the driver's value-hash check covers it.
2. :func:`parse_ddl` — a driver-side Python twin used by the DDL channel
   (``plans/ddl.py``) when a DDL event carries only ``ddl_sql`` text: it
   fills the structured ``ddl_type/ddl_column/ddl_new_name/ddl_new_type``
   fields that drive LakeTable schema evolution.

Statement classes mirror the reference's EventType names
(CanalEntry EventType via SimpleDdlParser.parse): ALTER, CREATE, ERASE
(drop table), TRUNCATE, RENAME, CINDEX, DINDEX, INSERT, UPDATE, DELETE,
QUERY (fallback).
"""

from __future__ import annotations

import re

from ..model import DDL_ADD_COLUMN, DDL_RENAME_COLUMN, DDL_WIDEN_TYPE

# ---------------------------------------------------------------------------
# Shared pattern source (written in DuckDB/RE2-compatible syntax with single
# backslashes; doubled for Spark SQL string literals, which process escapes)
# ---------------------------------------------------------------------------

# /* ... */ block comments, non-nesting (SimpleDdlParser.removeComment)
COMMENT_PAT = r"/\*[^*]*\*+(?:[^/*][^*]*\*+)*/"

# classification patterns (SimpleDdlParser.java:23-47), anchored like the
# reference; table token = first run of non-(space, paren, semicolon)
_T = r"[^ \t\n(;]+"
ALTER_PAT = rf"(?i)^ALTER\s+(IGNORE\s+)?TABLE\s+({_T})"
CREATE_PAT = rf"(?i)^CREATE\s+(TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_T})"
DROP_PAT = rf"(?i)^DROP\s+(TEMPORARY\s+)?TABLE\s+(IF\s+EXISTS\s+)?({_T})"
TRUNCATE_PAT = rf"(?i)^TRUNCATE\s+(TABLE\s+)?({_T})"
RENAME_PAT = rf"(?i)^RENAME\s+TABLE\s+({_T})\s+TO\s+({_T})"
CINDEX_PAT = rf"(?i)^CREATE\s+(UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?INDEX\s+.*\s+ON\s+({_T})"
DINDEX_PAT = rf"(?i)^DROP\s+INDEX\s+.*\s+ON\s+({_T})"
INSERT_PAT = r"(?i)^(INSERT|MERGE|REPLACE)\b"
UPDATE_PAT = r"(?i)^UPDATE\b"
DELETE_PAT = r"(?i)^DELETE\b"

# ALTER sub-operations → the engine's three schema evolutions
# (MySQL grammar: ADD [COLUMN], RENAME COLUMN ... TO ..., MODIFY [COLUMN])
ADD_COL_PAT = r"(?i)\bADD\s+(COLUMN\s+)?`?(\w+)`?\s+(\w+(\([0-9, ]+\))?)"
RENAME_COL_PAT = r"(?i)\bRENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?"
MODIFY_PAT = r"(?i)\bMODIFY\s+(COLUMN\s+)?`?(\w+)`?\s+(\w+(\([0-9, ]+\))?)"

# MySQL type → engine (Spark DDL) type; promotion-aware mapping used for
# ADD/MODIFY targets. MODIFY to a wider class maps onto widen_column's
# ladder (lake/table.py _WIDEN_OK — the LogEventConvert.java:694-725 analog).
_MYSQL_TO_ENGINE = [
    (("tinyint", "smallint", "mediumint", "int", "integer", "year"), "int"),
    (("bigint",), "bigint"),
    (("float",), "float"),
    (("double", "real"), "double"),
    (("decimal", "numeric"), "decimal(38,0)"),
    (("datetime", "timestamp", "date"), "timestamp"),
    (("blob", "binary", "varbinary", "longblob", "mediumblob", "tinyblob"), "binary"),
]


def _engine_type(mysql_type: str) -> str:
    base = mysql_type.split("(")[0].strip().lower()
    for names, out in _MYSQL_TO_ENGINE:
        if base in names:
            return out
    return "string"  # char/varchar/text/enum/set/json/... all land on string


def _type_case_sql(type_expr: str) -> str:
    """CASE expression mapping a raw MySQL type token to the engine type —
    same table as :func:`_engine_type`, dialect-neutral SQL."""
    branches = []
    for names, out in _MYSQL_TO_ENGINE:
        in_list = ", ".join(f"'{n}'" for n in names)
        branches.append(f"WHEN lower(split_part({type_expr}, '(', 1)) IN ({in_list}) THEN '{out}'")
    return "CASE " + " ".join(branches) + " WHEN " + type_expr + " = '' THEN '' ELSE 'string' END"


def _p(pat: str, dialect: str) -> str:
    """Pattern → SQL string literal for the dialect (Spark string literals
    process backslash escapes; DuckDB's don't)."""
    body = pat.replace("\\", "\\\\") if dialect == "spark" else pat
    return "'" + body + "'"


def clean_sql_expr(sql_col: str, dialect: str) -> str:
    """Strip /* */ comments + trim (SimpleDdlParser.removeComment)."""
    pat = _p(COMMENT_PAT, dialect)
    if dialect == "duckdb":
        return f"trim(regexp_replace({sql_col}, {pat}, ' ', 'g'))"
    return f"trim(regexp_replace({sql_col}, {pat}, ' '))"


def ddl_classify_exprs(sql_col: str, dialect: str, default_schema: str = "") -> dict[str, str]:
    """Column-name → SQL expression classifying ``sql_col`` DDL text.

    Output columns: ``stmt_class``, ``schema_name``, ``table_name``,
    ``ddl_type``, ``ddl_column``, ``ddl_new_name``, ``ddl_new_type``.
    Non-matching extracts yield '' (both engines agree on that)."""
    c = clean_sql_expr(sql_col, dialect)

    def ex(pat: str, group: int) -> str:
        return f"regexp_extract({c}, {_p(pat, dialect)}, {group})"

    def m(pat: str) -> str:
        return f"({ex(pat, 0)} != '')"

    stmt_class = (
        "CASE "
        f"WHEN {m(ALTER_PAT)} THEN 'ALTER' "
        f"WHEN {m(CINDEX_PAT)} THEN 'CINDEX' "
        f"WHEN {m(DINDEX_PAT)} THEN 'DINDEX' "
        f"WHEN {m(CREATE_PAT)} THEN 'CREATE' "
        f"WHEN {m(DROP_PAT)} THEN 'ERASE' "
        f"WHEN {m(TRUNCATE_PAT)} THEN 'TRUNCATE' "
        f"WHEN {m(RENAME_PAT)} THEN 'RENAME' "
        f"WHEN {m(INSERT_PAT)} THEN 'INSERT' "
        f"WHEN {m(UPDATE_PAT)} THEN 'UPDATE' "
        f"WHEN {m(DELETE_PAT)} THEN 'DELETE' "
        "ELSE 'QUERY' END"
    )
    # raw table token per class (backticks stripped after)
    raw_ref = (
        "CASE "
        f"WHEN {m(ALTER_PAT)} THEN {ex(ALTER_PAT, 2)} "
        f"WHEN {m(CINDEX_PAT)} THEN {ex(CINDEX_PAT, 2)} "
        f"WHEN {m(DINDEX_PAT)} THEN {ex(DINDEX_PAT, 1)} "
        f"WHEN {m(CREATE_PAT)} THEN {ex(CREATE_PAT, 3)} "
        f"WHEN {m(DROP_PAT)} THEN {ex(DROP_PAT, 3)} "
        f"WHEN {m(TRUNCATE_PAT)} THEN {ex(TRUNCATE_PAT, 2)} "
        f"WHEN {m(RENAME_PAT)} THEN {ex(RENAME_PAT, 1)} "
        "ELSE '' END"
    )
    ref = f"replace({raw_ref}, '`', '')"
    schema_name = (
        f"CASE WHEN instr({ref}, '.') > 0 THEN split_part({ref}, '.', 1) "
        f"WHEN {ref} = '' THEN '' ELSE '{default_schema}' END"
    )
    table_name = (
        f"CASE WHEN instr({ref}, '.') > 0 THEN split_part({ref}, '.', 2) ELSE {ref} END"
    )

    is_alter = m(ALTER_PAT)
    add_col, add_type = ex(ADD_COL_PAT, 2), ex(ADD_COL_PAT, 3)
    ren_old, ren_new = ex(RENAME_COL_PAT, 1), ex(RENAME_COL_PAT, 2)
    mod_col, mod_type = ex(MODIFY_PAT, 2), ex(MODIFY_PAT, 3)
    ddl_type = (
        f"CASE WHEN {is_alter} AND {add_col} != '' THEN '{DDL_ADD_COLUMN}' "
        f"WHEN {is_alter} AND {ren_old} != '' THEN '{DDL_RENAME_COLUMN}' "
        f"WHEN {is_alter} AND {mod_col} != '' THEN '{DDL_WIDEN_TYPE}' "
        "ELSE '' END"
    )
    ddl_column = (
        f"CASE WHEN {is_alter} AND {add_col} != '' THEN {add_col} "
        f"WHEN {is_alter} AND {ren_old} != '' THEN {ren_old} "
        f"WHEN {is_alter} AND {mod_col} != '' THEN {mod_col} ELSE '' END"
    )
    ddl_new_name = f"CASE WHEN {is_alter} THEN {ren_new} ELSE '' END"
    raw_type = (
        f"CASE WHEN {is_alter} AND {add_col} != '' THEN {add_type} "
        f"WHEN {is_alter} AND {mod_col} != '' THEN {mod_type} ELSE '' END"
    )
    return {
        "stmt_class": stmt_class,
        "schema_name": schema_name,
        "table_name": table_name,
        "ddl_type": ddl_type,
        "ddl_column": ddl_column,
        "ddl_new_name": ddl_new_name,
        "ddl_new_type": _type_case_sql(raw_type),
    }


def classify_ddl(df, sql_col: str = "ddl_sql", default_schema: str = ""):
    """DataFrame version: add the classification columns (all JVM regexp
    expressions — vectorized, codegen'd, no Python in the path)."""
    from pyspark.sql import functions as F

    exprs = ddl_classify_exprs(sql_col, "spark", default_schema)
    return df.select("*", *[F.expr(e).alias(k) for k, e in exprs.items()])


# ---------------------------------------------------------------------------
# Driver-side twin (the DDL channel applies one row at a time)
# ---------------------------------------------------------------------------

_REMOVE_COMMENT = re.compile(COMMENT_PAT)


def _search(pat: str, s: str) -> re.Match | None:
    return re.search(pat, s)


def parse_ddl(sql: str, default_schema: str = "") -> dict:
    """Parse one DDL statement into the structured ddl-channel fields.
    Mirrors :func:`ddl_classify_exprs` exactly (tested for agreement)."""
    s = _REMOVE_COMMENT.sub(" ", sql or "").strip()
    out = {
        "stmt_class": "QUERY", "schema_name": "", "table_name": "",
        "ddl_type": None, "ddl_column": None, "ddl_new_name": None,
        "ddl_new_type": None,
    }
    for cls, pat, grp in (
        ("ALTER", ALTER_PAT, 2), ("CINDEX", CINDEX_PAT, 2), ("DINDEX", DINDEX_PAT, 1),
        ("CREATE", CREATE_PAT, 3), ("ERASE", DROP_PAT, 3), ("TRUNCATE", TRUNCATE_PAT, 2),
        ("RENAME", RENAME_PAT, 1),
    ):
        mm = _search(pat, s)
        if mm:
            out["stmt_class"] = cls
            ref = (mm.group(grp) or "").replace("`", "")
            if "." in ref:
                out["schema_name"], _, out["table_name"] = ref.partition(".")
            else:
                out["schema_name"], out["table_name"] = (default_schema if ref else ""), ref
            break
    else:
        for cls, pat in (("INSERT", INSERT_PAT), ("UPDATE", UPDATE_PAT), ("DELETE", DELETE_PAT)):
            if _search(pat, s):
                out["stmt_class"] = cls
                break
        return out

    if out["stmt_class"] == "ALTER":
        if (mm := _search(ADD_COL_PAT, s)) is not None:
            out.update(ddl_type=DDL_ADD_COLUMN, ddl_column=mm.group(2),
                       ddl_new_type=_engine_type(mm.group(3)))
        elif (mm := _search(RENAME_COL_PAT, s)) is not None:
            out.update(ddl_type=DDL_RENAME_COLUMN, ddl_column=mm.group(1),
                       ddl_new_name=mm.group(2))
        elif (mm := _search(MODIFY_PAT, s)) is not None:
            out.update(ddl_type=DDL_WIDEN_TYPE, ddl_column=mm.group(2),
                       ddl_new_type=_engine_type(mm.group(3)))
    return out
