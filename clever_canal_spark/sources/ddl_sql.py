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

from ..model import (
    DDL_ADD_COLUMN,
    DDL_DROP_COLUMN,
    DDL_RENAME_COLUMN,
    DDL_RETYPE,
    DDL_SET_DEFAULT,
)

# ---------------------------------------------------------------------------
# Shared pattern source (written in DuckDB/RE2-compatible syntax with single
# backslashes; doubled for Spark SQL string literals, which process escapes)
# ---------------------------------------------------------------------------

# /* ... */ block comments, non-nesting (SimpleDdlParser.removeComment)
COMMENT_PAT = r"/\*[^*]*\*+(?:[^/*][^*]*\*+)*/"

# classification patterns (SimpleDdlParser.java:23-47), anchored like the
# reference; table token = first run of non-(space, paren, semicolon,
# comma) — the comma exclusion keeps multi-pair RENAME statements
# ("a TO b, c TO d") from capturing a trailing comma in a pair's target
_T = r"[^ \t\n(;,]+"
ALTER_PAT = rf"(?i)^ALTER\s+(IGNORE\s+)?TABLE\s+({_T})"
CREATE_PAT = rf"(?i)^CREATE\s+(TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_T})"
DROP_PAT = rf"(?i)^DROP\s+(TEMPORARY\s+)?TABLE\s+(IF\s+EXISTS\s+)?({_T})"
TRUNCATE_PAT = rf"(?i)^TRUNCATE\s+(TABLE\s+)?({_T})"
RENAME_PAT = rf"(?i)^RENAME\s+TABLE\s+({_T})\s+TO\s+({_T})"
# every `old TO new` pair of a (possibly multi-table) RENAME statement —
# the reference chains them via RENAME_REMNANT_PATTERN + renameTableResult
# (SimpleDdlParser.java:32,72-84); the atomic-swap idiom
# `RENAME TABLE t TO t_old, t_new TO t` carries TWO pairs
RENAME_PAIR_PAT = rf"(?i)({_T})\s+TO\s+({_T})"
CINDEX_PAT = rf"(?i)^CREATE\s+(UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?INDEX\s+.*\s+ON\s+({_T})"
DINDEX_PAT = rf"(?i)^DROP\s+INDEX\s+.*\s+ON\s+({_T})"
INSERT_PAT = r"(?i)^(INSERT|MERGE|REPLACE)\b"
UPDATE_PAT = r"(?i)^UPDATE\b"
DELETE_PAT = r"(?i)^DELETE\b"

# ALTER sub-operations → the engine's four schema evolutions
# (MySQL grammar: ADD [COLUMN], DROP [COLUMN], RENAME COLUMN ... TO ...,
# MODIFY [COLUMN], CHANGE [COLUMN] old new type). A statement may carry
# SEVERAL comma-separated clauses (Druid AST iterates all alter items,
# DruidDdlParser.java:1-200) — the classifier extracts them ALL
# (regexp_extract_all / re.finditer), not just the first.
#
# `ADD`/`DROP` are overloaded in MySQL: `ADD INDEX|KEY|CONSTRAINT|...` and
# `DROP INDEX|PRIMARY KEY|...` are NOT column operations. RE2 (the DuckDB
# oracle's engine) has no lookahead, so exclusion happens on the EXTRACTED
# name: a clause whose name token is one of the keywords below — and was
# not backtick-quoted — is discarded. (`ADD \`key\` int` stays a column:
# quoting is how MySQL spells a reserved-word column.)
ADD_COL_PAT = (
    # MariaDB's `ADD [COLUMN] IF NOT EXISTS` is consumed NON-capturing so
    # group numbers hold (the r3-verdict bug: `IF` parsed as the column
    # name and the real column never reached the lake schema)
    r"(?i)\bADD\s+(COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s+(\w+(\([0-9, ]+\))?)"
    # modifier run between type and DEFAULT: CHARACTER SET / COLLATE ride
    # along (a `varchar CHARACTER SET utf8mb4 NOT NULL DEFAULT 'x'` column
    # previously LOST its initial default — the charset tokens broke the run)
    r"((\s+NOT\s+NULL|\s+NULL|\s+UNSIGNED|\s+CHARACTER\s+SET\s+\w+|\s+COLLATE\s+\w+)*"
    r"\s+DEFAULT\s+('[^']*'|[^\s,;]+))?"
)

# MySQL's parenthesized multi-add: `ADD [COLUMN] (a int, b decimal(10,2))`.
# The body (group 2) allows ONE level of nested parens (type arguments);
# fragments are normalized to plain `ADD <frag>` clauses and re-fed through
# ADD_COL_PAT, so exclusion/default/type logic is shared by construction.
# Before splitting on ',', type-argument parens are stripped — engine-type
# mapping keys on the base name only (_MYSQL_TO_ENGINE), so nothing is
# lost; a quoted DEFAULT containing ',' or '(' inside a paren group is the
# documented limit of this form.
ADD_GROUP_PAT = r"(?i)\bADD\s+(COLUMN\s+)?\(((?:[^()]|\([^()]*\))*)\)"
_TYPE_ARGS_PAT = r"\([^()]*\)"

# DEFAULT tokens that are NOT materializable constants (non-deterministic
# server-side functions, or an explicit NULL = the no-default default) —
# the initial-default channel ignores them rather than failing the DDL
_DEFAULT_NON_CONSTANT = (
    "NULL", "CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP()", "NOW()",
    "LOCALTIME", "LOCALTIMESTAMP", "CURRENT_DATE", "CURRENT_DATE()",
    "UUID()",
)
DROP_COL_PAT = r"(?i)\bDROP\s+(COLUMN\s+)?(?:IF\s+EXISTS\s+)?`?(\w+)`?"
RENAME_COL_PAT = r"(?i)\bRENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?"
MODIFY_PAT = r"(?i)\bMODIFY\s+(COLUMN\s+)?`?(\w+)`?\s+(\w+(\([0-9, ]+\))?)"
CHANGE_PAT = r"(?i)\bCHANGE\s+(COLUMN\s+)?`?(\w+)`?\s+`?(\w+)`?\s+(\w+(\([0-9, ]+\))?)"

# `ALTER TABLE t ALTER [COLUMN] x SET DEFAULT <literal>` / `... DROP
# DEFAULT` — MySQL's default-change clause. The reference's TableMeta
# tracks defaultValue per field (TableMeta.java:23-126, applied via
# MemoryTableMeta.java:67-88); here it becomes a SET_DEFAULT op updating
# the field's WRITE default (the initial-default stays frozen — existing
# rows never change, matching both MySQL and Iceberg-v3 semantics).
# Groups: 2=name, 3='SET ...' full clause (empty for DROP), 4=value.
# The statement head `ALTER TABLE t` can never match: `TABLE` would have
# to be followed by SET/DROP DEFAULT, which the table name interrupts.
ALTER_DEFAULT_PAT = (
    r"(?i)\bALTER\s+(COLUMN\s+)?`?(\w+)`?\s+"
    r"((SET)\s+DEFAULT\s+('[^']*'|[^\s,;]+)|DROP\s+DEFAULT)"
)

# ALTER-embedded TABLE rename: `ALTER TABLE t RENAME [TO|AS] u` (bare
# `RENAME u` is also legal MySQL). The reference's Druid parser emits a
# RENAME event for SQLAlterTableRename (DruidDdlParser.java:49-70) — a
# pure-rename ALTER reclassifies to RENAME here with the target exposed as
# ``ddl_rename_to``; mixed statements stay ALTER (column evolution wins)
# with the target still populated. RE2 has no lookahead, so
# `RENAME COLUMN/INDEX/KEY ...` exclusion happens on the extracted token
# (backtick-quoted targets are never excluded).
ALTER_RENAME_PAT = r"(?i)\bRENAME\s+(TO\s+|AS\s+)?(`?[A-Za-z_][^\s(;,]*`?)"
RENAME_EXCLUDE_KEYWORDS = ("COLUMN", "INDEX", "KEY")

# Clause DETECTION runs on literal-blanked text so a keyword inside a
# string (COMMENT = 'drop column x') never classifies. Blanking is
# split-on-quote, length-preserving — see :func:`_blank_literals` (Python)
# and the split/transform twin inside :func:`ddl_classify_exprs` (SQL,
# both dialects); MySQL's '' doubling blanks pairwise, an unbalanced
# quote blanks the tail in all three evaluators.

# ALTER-embedded index DDL → the reference's C_INDEX / D_INDEX event
# classes (DruidDdlParser.java:49-70: SQLAlterTableAddIndex → C_INDEX,
# AddConstraint-with-SQLUnique → C_INDEX, DropIndex/DropKey/DropConstraint
# → D_INDEX; DROP FOREIGN KEY / CHECK fall to plain ALTER). PRIMARY KEY
# ops are index-family BOTH ways: ADD PRIMARY KEY reaches C_INDEX through
# the AddConstraint-with-SQLUnique branch (Druid's SQLPrimaryKey IS a
# SQLUnique), and DROP PRIMARY KEY routes to D_INDEX symmetrically so
# consumers following the C_INDEX signal see the matching teardown.
# A pure-index ALTER classifies as CINDEX/DINDEX so event-class consumers
# can route on it; mixed statements stay ALTER (column evolution wins) with
# the index clauses still counted in ddl_n_index_ops.
ADD_INDEX_CLAUSE_PAT = (
    r"(?i)\bADD\s+(?:(?:UNIQUE|FULLTEXT|SPATIAL|PRIMARY)\s+)?(?:INDEX|KEY)\b"
    r"|\bADD\s+UNIQUE\b"
    r"|\bADD\s+CONSTRAINT\s+(?:`?\w+`?\s+)?UNIQUE\b"
)
DROP_INDEX_CLAUSE_PAT = r"(?i)\bDROP\s+(?:INDEX|KEY|CONSTRAINT|PRIMARY\s+KEY)\b"

# name tokens that mean the ADD/DROP clause is index/constraint/partition
# DDL, not a column op (SimpleDdlParser passes these through untyped)
ADD_EXCLUDE_KEYWORDS = (
    "INDEX", "KEY", "CONSTRAINT", "UNIQUE", "PRIMARY", "FULLTEXT",
    "SPATIAL", "FOREIGN", "PARTITION", "CHECK",
)
DROP_EXCLUDE_KEYWORDS = (
    "INDEX", "KEY", "CONSTRAINT", "PRIMARY", "FOREIGN", "PARTITION",
    "CHECK", "TABLE", "TEMPORARY",
    # `ALTER COLUMN x DROP DEFAULT` — the DROP token is a default-change
    # clause, not a column drop (a real column named `default` must be
    # backtick-quoted, which the exclusion convention already honors)
    "DEFAULT",
)
# name tokens that mean an ALTER ... SET/DROP DEFAULT match is not a
# column default clause (defensive only — see ALTER_DEFAULT_PAT's note)
ALTER_DEFAULT_EXCLUDE_KEYWORDS = ("TABLE",)

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
    process backslash escapes; DuckDB's don't). Single quotes inside the
    pattern (the DEFAULT-literal alternation) escape per dialect."""
    if dialect == "spark":
        body = pat.replace("\\", "\\\\").replace("'", "\\'")
    else:
        body = pat.replace("'", "''")
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

    # -- multi-clause ALTER machinery (arrays of full clause matches) ------
    # dialect seams: array length, safe first element (''-coalesced)
    def alen(arr: str) -> str:
        return f"size({arr})" if dialect == "spark" else f"len({arr})"

    def afirst(arr: str) -> str:
        if dialect == "spark":
            return f"coalesce(get({arr}, 0), '')"  # 0-based, NULL-safe
        return f"coalesce(({arr})[1], '')"         # 1-based, NULL on empty

    # list/regex seams the two dialects spell differently (lambda `filter`
    # is spelled identically in both — existing precedent in clause_arr)
    def amap(arr: str, lam: str) -> str:
        fn = "transform" if dialect == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def acat(a: str, b: str) -> str:
        fn = "concat" if dialect == "spark" else "list_concat"
        return f"{fn}({a}, {b})"

    def asplit(s_: str, sep: str) -> str:
        fn = "split" if dialect == "spark" else "string_split"
        return f"{fn}({s_}, '{sep}')"

    def rrall(s_: str, pat: str, rep: str) -> str:
        # replace ALL matches (Spark default; DuckDB needs the 'g' flag)
        flag = "" if dialect == "spark" else ", 'g'"
        return f"regexp_replace({s_}, {_p(pat, dialect)}, '{rep}'{flag})"

    # literal-blanked text for clause DETECTION, LENGTH-PRESERVING: split
    # on the quote char, blank literal-content segments to spaces, rejoin
    # with quotes — the SQL twin of the Python :func:`_blank_literals`
    # (`'drop column x'` → `'             '`). A clause keyword inside a
    # string literal (COMMENT = 'drop column x') can never classify as an
    # operation; quotes and statement length survive, so the blanked and
    # raw forms stay position-comparable. Spark's transform index is
    # 0-based (literal content = odd segments), DuckDB's is 1-based (even
    # segments); an unbalanced quote blanks the tail in both — same as
    # the Python split form.
    _q39 = "chr(39)"
    if dialect == "spark":
        _blank_lam = "(x, i) -> CASE WHEN i % 2 = 1 THEN repeat(' ', length(x)) ELSE x END"
        cq = f"array_join(transform(split({c}, {_q39}), {_blank_lam}), {_q39})"
    else:
        _blank_lam = "(x, i) -> CASE WHEN i % 2 = 0 THEN repeat(' ', length(x)) ELSE x END"
        cq = f"array_to_string(list_transform(string_split({c}, {_q39}), {_blank_lam}), {_q39})"

    def clause_arr(pat: str, exclude: tuple[str, ...] = (), src: str | None = None) -> str:
        """Array of full-match clause strings, keyword-excluded. The lambda
        re-extracts the name from each clause; a backtick anywhere in the
        clause marks a quoted (reserved-word) column name — never excluded."""
        arr = f"regexp_extract_all({src or cq}, {_p(pat, dialect)}, 0)"
        if not exclude:
            return arr
        kws = ", ".join(f"'{k}'" for k in exclude)
        name = f"upper(regexp_extract(x, {_p(pat, dialect)}, 2))"
        return f"filter({arr}, x -> instr(x, '`') > 0 OR {name} NOT IN ({kws}))"

    # ADD clause DETECTION runs on the blanked text too (an ADD-COLUMN-
    # shaped substring inside a string literal must never fabricate an
    # op); the raw-text twin arrays exist ONLY to recover the DEFAULT
    # literal, which blanking erases — see the flat-default rule below.
    adds = clause_arr(ADD_COL_PAT, ADD_EXCLUDE_KEYWORDS)
    adds_raw = clause_arr(ADD_COL_PAT, ADD_EXCLUDE_KEYWORDS, src=c)
    drops = clause_arr(DROP_COL_PAT, DROP_EXCLUDE_KEYWORDS)
    rens = clause_arr(RENAME_COL_PAT)
    mods = clause_arr(MODIFY_PAT)
    chgs = clause_arr(CHANGE_PAT)
    # ALTER [COLUMN] x SET/DROP DEFAULT — the default-change clause
    # (TableMeta.java:23-126 defaultValue tracking). Same two-pass split:
    # detection blanked, value recovered from the raw twin.
    setdefs = clause_arr(ALTER_DEFAULT_PAT, ALTER_DEFAULT_EXCLUDE_KEYWORDS)
    setdefs_raw = clause_arr(
        ALTER_DEFAULT_PAT, ALTER_DEFAULT_EXCLUDE_KEYWORDS, src=c
    )

    # parenthesized multi-add `ADD [COLUMN] (a int, b decimal(10,2))`:
    # extract EVERY group body (a statement may carry several `ADD (...)`
    # clauses — regexp_extract_all, matching the twin's finditer), strip
    # type-argument parens (the engine-type map keys on the base name
    # only), split on ',', flatten, normalize fragments to full
    # `ADD <frag>` clause strings — the SAME per-clause extraction
    # (ADD_COL_PAT groups, keyword exclusion) then applies unchanged.
    def grp_adds(src: str) -> str:
        grp_bodies = f"regexp_extract_all({src}, {_p(ADD_GROUP_PAT, dialect)}, 2)"
        gfrag_lists = amap(grp_bodies, f"b -> {asplit(rrall('b', _TYPE_ARGS_PAT, ''), ',')}")
        gfrags = amap(f"flatten({gfrag_lists})", "x -> concat('ADD ', trim(x))")
        gname = f"upper(regexp_extract(x, {_p(ADD_COL_PAT, dialect)}, 2))"
        gkws = ", ".join(f"'{k}'" for k in ADD_EXCLUDE_KEYWORDS)
        return (
            f"filter({gfrags}, x -> {gname} != '' "
            f"AND (instr(x, '`') > 0 OR {gname} NOT IN ({gkws})))"
        )

    # plain clauses first, then group fragments — the flat-field rule the
    # Python twin mirrors (_FLAT_PRECEDENCE: 'add' before 'gadd')
    adds_all = acat(adds, grp_adds(cq))
    adds_all_raw = acat(adds_raw, grp_adds(c))

    # ALTER-embedded TABLE rename targets (RENAME [TO|AS] u), token-excluded.
    # Detection runs on the LITERAL-BLANKED text: a clause keyword inside a
    # quoted string (`COMMENT = 'we rename to v2'`) must not classify — the
    # same blanking the non-ADD clause arrays use (ADD stays on the raw
    # text because its DEFAULT literal rides in the clause string).
    ren_tbl_raw = f"regexp_extract_all({cq}, {_p(ALTER_RENAME_PAT, dialect)}, 2)"
    rkws = ", ".join(f"'{k}'" for k in RENAME_EXCLUDE_KEYWORDS)
    ren_tbls = (
        f"filter({ren_tbl_raw}, x -> instr(x, '`') > 0 "
        f"OR upper(replace(x, '`', '')) NOT IN ({rkws}))"
    )

    # ALTER-embedded index clauses (C_INDEX/D_INDEX channel)
    idx_adds = f"regexp_extract_all({cq}, {_p(ADD_INDEX_CLAUSE_PAT, dialect)}, 0)"
    idx_drops = f"regexp_extract_all({cq}, {_p(DROP_INDEX_CLAUSE_PAT, dialect)}, 0)"
    n_col_ops = (
        f"({alen(adds_all)} + {alen(drops)} + {alen(rens)} + {alen(mods)} "
        f"+ {alen(chgs)} + {alen(setdefs)})"
    )
    stmt_class = (
        "CASE "
        # pure-index ALTER → the event class the reference's Druid parser
        # emits for that alter item (CINDEX wins when both kinds appear)
        f"WHEN {is_alter} AND {n_col_ops} = 0 AND {alen(idx_adds)} > 0 THEN 'CINDEX' "
        f"WHEN {is_alter} AND {n_col_ops} = 0 AND {alen(idx_drops)} > 0 THEN 'DINDEX' "
        # pure table-rename ALTER → RENAME (SQLAlterTableRename,
        # DruidDdlParser.java:49-70); mixed statements stay ALTER
        f"WHEN {is_alter} AND {n_col_ops} = 0 AND {alen(idx_adds)} = 0 "
        f"AND {alen(idx_drops)} = 0 AND {alen(ren_tbls)} > 0 THEN 'RENAME' "
        f"WHEN {is_alter} THEN 'ALTER' "
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

    def first_grp(arr: str, pat: str, grp: int) -> str:
        return f"regexp_extract({afirst(arr)}, {_p(pat, dialect)}, {grp})"

    add_col, add_type = first_grp(adds_all, ADD_COL_PAT, 2), first_grp(adds_all, ADD_COL_PAT, 3)
    drop_col = first_grp(drops, DROP_COL_PAT, 2)
    ren_old, ren_new = first_grp(rens, RENAME_COL_PAT, 1), first_grp(rens, RENAME_COL_PAT, 2)
    mod_col, mod_type = first_grp(mods, MODIFY_PAT, 2), first_grp(mods, MODIFY_PAT, 3)
    chg_old, chg_new = first_grp(chgs, CHANGE_PAT, 2), first_grp(chgs, CHANGE_PAT, 3)
    chg_type = first_grp(chgs, CHANGE_PAT, 4)
    sd_col = first_grp(setdefs, ALTER_DEFAULT_PAT, 2)

    # FLAT fields report the first clause by CLASS precedence (add > drop >
    # rename > change > modify) — deterministic and dialect-agreed; the full
    # position-ordered clause list drives actual schema evolution through
    # the driver twin (parse_ddl()["ops"]). ddl_n_ops counts every valid
    # column clause so multi-clause statements are visible in the output.
    ddl_type = (
        f"CASE WHEN NOT {is_alter} THEN '' "
        f"WHEN {add_col} != '' THEN '{DDL_ADD_COLUMN}' "
        f"WHEN {drop_col} != '' THEN '{DDL_DROP_COLUMN}' "
        f"WHEN {ren_old} != '' THEN '{DDL_RENAME_COLUMN}' "
        f"WHEN {chg_old} != '' THEN '{DDL_RENAME_COLUMN}' "
        f"WHEN {mod_col} != '' THEN '{DDL_RETYPE}' "
        f"WHEN {sd_col} != '' THEN '{DDL_SET_DEFAULT}' "
        "ELSE '' END"
    )
    ddl_column = (
        f"CASE WHEN NOT {is_alter} THEN '' "
        f"WHEN {add_col} != '' THEN {add_col} "
        f"WHEN {drop_col} != '' THEN {drop_col} "
        f"WHEN {ren_old} != '' THEN {ren_old} "
        f"WHEN {chg_old} != '' THEN {chg_old} "
        f"WHEN {mod_col} != '' THEN {mod_col} "
        f"WHEN {sd_col} != '' THEN {sd_col} ELSE '' END"
    )
    ddl_new_name = (
        f"CASE WHEN NOT {is_alter} THEN '' "
        f"WHEN {add_col} != '' OR {drop_col} != '' THEN '' "
        f"WHEN {ren_old} != '' THEN {ren_new} "
        f"WHEN {chg_old} != '' THEN {chg_new} ELSE '' END"
    )
    raw_type = (
        f"CASE WHEN NOT {is_alter} THEN '' "
        f"WHEN {add_col} != '' THEN {add_type} "
        f"WHEN {drop_col} != '' THEN '' "
        f"WHEN {ren_old} != '' THEN '' "
        f"WHEN {chg_old} != '' THEN {chg_type} "
        f"WHEN {mod_col} != '' THEN {mod_type} ELSE '' END"
    )
    n_ops = f"CASE WHEN {is_alter} THEN {n_col_ops} ELSE 0 END"
    # DEFAULT literal recovery, two-pass: detection ran on blanked text
    # (zero phantom ops), but blanking erased the literal's content — so
    # the VALUE re-extracts from the raw-text twin array, picking the
    # first raw clause whose column name matches the first detected
    # clause's name. A raw-only (phantom, literal-embedded) clause with a
    # DIFFERENT name is skipped by the name match; a phantom sharing the
    # real clause's exact name could still win the flat field — the
    # documented residual corner (per-op defaults in the driver twin's
    # ``ops`` list are span-exact and unaffected).
    nc = ", ".join(f"'{t}'" for t in _DEFAULT_NON_CONSTANT)

    def named_first(raw_arr: str, pat: str, name: str) -> str:
        return afirst(
            f"filter({raw_arr}, x -> regexp_extract(x, {_p(pat, dialect)}, 2) = {name})"
        )

    def norm_default(raw: str) -> str:
        # quotes stripped; non-constant tokens (CURRENT_TIMESTAMP & co)
        # and NULL land on '' (= no materializable default)
        return (
            f"CASE WHEN upper({raw}) IN ({nc}) THEN '' "
            f"WHEN left({raw}, 1) = {_q39} "
            f"THEN substr({raw}, 2, greatest(length({raw}) - 2, 0)) "
            f"ELSE {raw} END"
        )

    add_default_raw = f"regexp_extract({named_first(adds_all_raw, ADD_COL_PAT, add_col)}, {_p(ADD_COL_PAT, dialect)}, 7)"
    sd_value_raw = f"regexp_extract({named_first(setdefs_raw, ALTER_DEFAULT_PAT, sd_col)}, {_p(ALTER_DEFAULT_PAT, dialect)}, 5)"
    ddl_default = (
        f"CASE WHEN NOT {is_alter} THEN '' "
        f"WHEN {add_col} != '' THEN {norm_default(add_default_raw)} "
        # SET DEFAULT carries its literal; DROP DEFAULT extracts '' (group
        # 5 absent) and normalizes to '' — the cleared-default signal
        f"WHEN {sd_col} != '' THEN {norm_default(sd_value_raw)} "
        "ELSE '' END"
    )
    # rename target: ALTER-embedded (`RENAME [TO|AS] u`) or the statement
    # form (`RENAME TABLE a TO b` → group 2); '' everywhere else
    ddl_rename_to = (
        f"replace(CASE WHEN {is_alter} THEN {afirst(ren_tbls)} "
        f"WHEN {m(RENAME_PAT)} THEN {ex(RENAME_PAT, 2)} "
        "ELSE '' END, '`', '')"
    )
    # rename-pair count: a RENAME TABLE statement may carry several
    # `old TO new` pairs (the atomic-swap idiom; SimpleDdlParser.java:72-84
    # chains them) — multi-pair statements are visible here, pairs
    # themselves ride the driver twin (parse_ddl()["rename_pairs"]).
    # An ALTER counts at most one (its single RENAME [TO|AS] clause).
    pairs_arr = f"regexp_extract_all({c}, {_p(RENAME_PAIR_PAT, dialect)}, 0)"
    n_renames = (
        f"CASE WHEN {is_alter} THEN least({alen(ren_tbls)}, 1) "
        f"WHEN {m(RENAME_PAT)} THEN {alen(pairs_arr)} ELSE 0 END"
    )
    return {
        "stmt_class": stmt_class,
        "schema_name": schema_name,
        "table_name": table_name,
        "ddl_type": ddl_type,
        "ddl_column": ddl_column,
        "ddl_new_name": ddl_new_name,
        "ddl_new_type": _type_case_sql(raw_type),
        "ddl_default": ddl_default,
        "ddl_rename_to": ddl_rename_to,
        "ddl_n_renames": f"CAST({n_renames} AS BIGINT)",
        "ddl_n_ops": f"CAST({n_ops} AS BIGINT)",
        # index clauses counted separately: mixed ALTERs stay class ALTER
        # but consumers routing on the C_INDEX/D_INDEX signal still see it
        "ddl_n_index_ops": (
            f"CAST(CASE WHEN {is_alter} THEN {alen(idx_adds)} + {alen(idx_drops)} "
            "ELSE 0 END AS BIGINT)"
        ),
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


def _blank_literals(s: str) -> str:
    """Single-quoted literal CONTENT → spaces, LENGTH-PRESERVED (quotes
    kept), so clause detection cannot match keywords inside strings while
    every match position still refers to the original statement text —
    the cross-class clause ordering in :func:`_clause_ops` and the
    raw-span DEFAULT recovery in :func:`_add_op_from_match` depend on
    positions being identical across the raw and blanked forms.

    Split-on-quote form (not regex) so an UNBALANCED quote blanks the
    tail — exactly what the generated SQL classifiers' split/transform
    blanking does in both dialects; the three evaluators must agree on
    malformed input too."""
    parts = s.split("'")
    return "'".join(
        p if i % 2 == 0 else " " * len(p) for i, p in enumerate(parts)
    )


def _norm_default_token(raw_default: str | None) -> str | None:
    """DEFAULT token → stored value: quotes stripped; non-constant tokens
    (CURRENT_TIMESTAMP & co) and NULL → None (no materializable default)."""
    if raw_default is None or raw_default.upper() in _DEFAULT_NON_CONSTANT:
        return None
    if raw_default.startswith("'"):
        return raw_default[1:-1]
    return raw_default


def _add_op_from_match(fm: re.Match, raw: str | None = None) -> dict | None:
    """Build the ADD_COLUMN op dict from an ADD_COL_PAT match — shared by
    the plain-clause and paren-group loops (keyword exclusion + DEFAULT
    normalization live ONCE). None when the clause is index/constraint
    DDL, not a column op.

    ``raw``: the original (unblanked) statement when ``fm`` matched the
    literal-BLANKED text — the DEFAULT literal re-reads from the raw text
    at the match's group-7 span (valid because blanking is
    length-preserving), so detection can't be fooled by literals while
    the extracted default keeps its real content."""
    if fm.group(2).upper() in ADD_EXCLUDE_KEYWORDS and "`" not in fm.group(0):
        return None
    if fm.group(7) is None:
        raw_default = None
    elif raw is not None:
        raw_default = raw[fm.start(7):fm.end(7)]
    else:
        raw_default = fm.group(7)
    return {
        "ddl_type": DDL_ADD_COLUMN, "ddl_column": fm.group(2),
        "ddl_new_name": None, "ddl_new_type": _engine_type(fm.group(3)),
        "ddl_default": _norm_default_token(raw_default),
    }


def _clause_ops(s: str) -> list[dict]:
    """Every column sub-operation in an ALTER statement, in clause order
    (re.finditer per pattern, merged by match position — the Druid-AST
    iterate-all-items analog). Keyword-named ADD/DROP clauses (index /
    constraint / partition DDL) are excluded unless backtick-quoted."""
    found: list[tuple[int, dict]] = []
    # EVERY clause family's DETECTION runs on literal-blanked text
    # (positions preserved — _blank_literals keeps length) so a keyword
    # inside a string (COMMENT = 'drop column x', DEFAULT 'add column y
    # int') never classifies; the DEFAULT-bearing families (ADD, ALTER
    # SET DEFAULT) recover the literal's content from the raw text at the
    # blanked match's span.
    sq = _blank_literals(s)
    # parenthesized multi-add: group DETECTED on blanked text (a
    # parenthesized-add-shaped literal never fabricates ops), body read
    # from the RAW span so fragment defaults keep their content;
    # fragments normalized to `ADD <frag>` and fed through ADD_COL_PAT so
    # name/type/default/exclusion logic is shared. Ops keep the GROUP's
    # statement position (cross-class clause order is what schema
    # evolution applies); fragment index breaks ties in-group. A quoted
    # default containing ',' or '(' inside a group body remains the
    # documented limit of this form (the body splits on ',').
    for gm in re.finditer(ADD_GROUP_PAT, sq):
        body = re.sub(_TYPE_ARGS_PAT, "", s[gm.start(2):gm.end(2)])
        for j, frag in enumerate(f.strip() for f in body.split(",")):
            if not frag:
                continue
            fm = re.search(ADD_COL_PAT, f"ADD {frag}")
            if fm is None:
                continue
            op = _add_op_from_match(fm)
            if op is not None:
                found.append((gm.start() + j, {**op, "_src": "gadd"}))
    for mm in re.finditer(ADD_COL_PAT, sq):
        op = _add_op_from_match(mm, raw=s)
        if op is not None:
            found.append((mm.start(), {**op, "_src": "add"}))
    for mm in re.finditer(ALTER_DEFAULT_PAT, sq):
        if (
            mm.group(2).upper() in ALTER_DEFAULT_EXCLUDE_KEYWORDS
            and "`" not in mm.group(0)
        ):
            continue
        if mm.group(4):  # SET DEFAULT <literal> (group 4 = the SET token)
            default = _norm_default_token(s[mm.start(5):mm.end(5)])
        else:  # DROP DEFAULT — explicit cleared-default signal
            default = None
        found.append((mm.start(), {
            "ddl_type": DDL_SET_DEFAULT, "ddl_column": mm.group(2),
            "ddl_new_name": None, "ddl_new_type": None,
            "ddl_default": default, "_src": "setdef",
        }))
    for mm in re.finditer(DROP_COL_PAT, sq):
        if mm.group(2).upper() in DROP_EXCLUDE_KEYWORDS and "`" not in mm.group(0):
            continue
        found.append((mm.start(), {
            "ddl_type": DDL_DROP_COLUMN, "ddl_column": mm.group(2),
            "ddl_new_name": None, "ddl_new_type": None, "_src": "drop",
        }))
    for mm in re.finditer(RENAME_COL_PAT, sq):
        found.append((mm.start(), {
            "ddl_type": DDL_RENAME_COLUMN, "ddl_column": mm.group(1),
            "ddl_new_name": mm.group(2), "ddl_new_type": None, "_src": "ren",
        }))
    for mm in re.finditer(MODIFY_PAT, sq):
        found.append((mm.start(), {
            "ddl_type": DDL_RETYPE, "ddl_column": mm.group(2),
            "ddl_new_name": None, "ddl_new_type": _engine_type(mm.group(3)),
            "_src": "mod",
        }))
    for mm in re.finditer(CHANGE_PAT, sq):
        found.append((mm.start(), {
            "ddl_type": DDL_RENAME_COLUMN, "ddl_column": mm.group(2),
            "ddl_new_name": mm.group(3), "ddl_new_type": _engine_type(mm.group(4)),
            "_src": "chg",
        }))
    return [op for _, op in sorted(found, key=lambda t: t[0])]


def _index_clause_ops(s: str) -> list[str]:
    """ALTER-embedded index clauses in position order: 'CINDEX' per
    ADD INDEX/KEY/UNIQUE/PRIMARY KEY/CONSTRAINT-UNIQUE clause, 'DINDEX'
    per DROP INDEX/KEY/CONSTRAINT (DruidDdlParser.java:49-70). Detection
    on literal-blanked text — 'add index' inside a string never counts."""
    sq = _blank_literals(s)
    found = [(mm.start(), "CINDEX") for mm in re.finditer(ADD_INDEX_CLAUSE_PAT, sq)]
    found += [(mm.start(), "DINDEX") for mm in re.finditer(DROP_INDEX_CLAUSE_PAT, sq)]
    return [k for _, k in sorted(found)]


# flat-field precedence by source pattern — mirrors ddl_classify_exprs'
# CASE order exactly (RENAME-pattern clauses outrank CHANGE-pattern ones
# even though both produce DDL_RENAME_COLUMN ops)
_FLAT_PRECEDENCE = ("add", "gadd", "drop", "ren", "chg", "mod", "setdef")


def _raw_add_clauses(s: str) -> list[re.Match]:
    """RAW-text ADD clause matches in the vectorized classifier's array
    order (plain clauses, then paren-group fragments) — the candidate
    list for the flat-field DEFAULT name-match rule below."""
    out = [
        mm for mm in re.finditer(ADD_COL_PAT, s)
        if not (mm.group(2).upper() in ADD_EXCLUDE_KEYWORDS and "`" not in mm.group(0))
    ]
    for gm in re.finditer(ADD_GROUP_PAT, s):
        body = re.sub(_TYPE_ARGS_PAT, "", gm.group(2))
        for frag in (f.strip() for f in body.split(",")):
            if not frag:
                continue
            fm = re.search(ADD_COL_PAT, f"ADD {frag}")
            if fm is None:
                continue
            if fm.group(2).upper() in ADD_EXCLUDE_KEYWORDS and "`" not in fm.group(0):
                continue
            out.append(fm)
    return out


def _flat_default_rule(s: str, src: str, name: str) -> str | None:
    """The FLAT ``ddl_default`` field via the same name-match rule the
    vectorized classifier uses (first RAW clause whose column name equals
    the first DETECTED clause's name) — the two evaluators must agree
    byte-for-byte, and the vectorized side has no match spans to do
    better with. Per-op defaults in ``ops`` stay span-exact; only this
    informational flat field shares the classifier's documented residual
    corner (a literal-embedded phantom clause with the SAME column name
    preceding the real one wins the flat extraction)."""
    if src in ("add", "gadd"):
        for fm in _raw_add_clauses(s):
            if fm.group(2) == name:
                return _norm_default_token(fm.group(7))
        return None
    for mm in re.finditer(ALTER_DEFAULT_PAT, s):
        if (
            mm.group(2).upper() in ALTER_DEFAULT_EXCLUDE_KEYWORDS
            and "`" not in mm.group(0)
        ):
            continue
        if mm.group(2) == name:
            return _norm_default_token(mm.group(5)) if mm.group(4) else None
    return None


def _alter_rename_target(s: str) -> str | None:
    """First ALTER-embedded TABLE-rename target (`RENAME [TO|AS] u`),
    backticks stripped; None when the statement has no table rename.
    `RENAME COLUMN/INDEX/KEY` clauses are excluded on the token unless
    backtick-quoted — same RE2-compatible convention as the ADD/DROP
    keyword exclusion. Detection on literal-blanked text — a COMMENT
    string containing 'rename to v2' must never classify as a rename."""
    for mm in re.finditer(ALTER_RENAME_PAT, _blank_literals(s)):
        tok = mm.group(2)
        if tok.replace("`", "").upper() in RENAME_EXCLUDE_KEYWORDS and "`" not in tok:
            continue
        return tok.replace("`", "")
    return None


def parse_ddl(sql: str, default_schema: str = "") -> dict:
    """Parse one DDL statement into the structured ddl-channel fields.
    Mirrors :func:`ddl_classify_exprs` exactly (tested for agreement).

    ``out["ops"]`` carries EVERY column sub-operation of a multi-clause
    ALTER in clause order — that list is what the DDL channel applies; the
    flat ``ddl_type/ddl_column/...`` fields report the first op by class
    precedence, matching the vectorized classifier's output columns."""
    s = _REMOVE_COMMENT.sub(" ", sql or "").strip()
    out = {
        "stmt_class": "QUERY", "schema_name": "", "table_name": "",
        "ddl_type": None, "ddl_column": None, "ddl_new_name": None,
        "ddl_new_type": None, "ddl_default": None, "ddl_rename_to": None,
        "rename_pairs": [], "ops": [], "index_ops": [],
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

    if out["stmt_class"] == "RENAME":
        # EVERY `old TO new` pair, in statement order — the reference
        # chains multi-table renames (atomic swap `RENAME TABLE t TO
        # t_old, t_new TO t`) via RENAME_REMNANT_PATTERN + the
        # renameTableResult linked list (SimpleDdlParser.java:72-84)
        out["rename_pairs"] = [
            (mm.group(1).replace("`", ""), mm.group(2).replace("`", ""))
            for mm in re.finditer(RENAME_PAIR_PAT, s)
        ]
        if out["rename_pairs"]:
            out["ddl_rename_to"] = out["rename_pairs"][0][1]
        return out

    if out["stmt_class"] == "ALTER":
        ops = _clause_ops(s)
        out["ops"] = [{k: v for k, v in o.items() if k != "_src"} for o in ops]
        out["index_ops"] = _index_clause_ops(s)
        out["ddl_rename_to"] = _alter_rename_target(s)
        if out["ddl_rename_to"]:
            # one pair: this table → target (ALTER carries a single rename)
            ref2 = f"{out['schema_name']}.{out['table_name']}" if out["schema_name"] else out["table_name"]
            out["rename_pairs"] = [(ref2, out["ddl_rename_to"])]
        if not ops and out["index_ops"]:
            # pure-index ALTER reclassifies to the event class (CINDEX wins
            # on a mixed add/drop statement — matches the vectorized CASE)
            out["stmt_class"] = (
                "CINDEX" if "CINDEX" in out["index_ops"] else "DINDEX"
            )
            return out
        if not ops and not out["index_ops"] and out["ddl_rename_to"]:
            # pure table-rename ALTER → the reference's RENAME event class
            # (SQLAlterTableRename, DruidDdlParser.java:49-70); mixed
            # statements stay ALTER with ddl_rename_to still populated
            out["stmt_class"] = "RENAME"
            return out
        for want in _FLAT_PRECEDENCE:
            first = next((o for o in ops if o["_src"] == want), None)
            if first is not None:
                out.update({k: first[k] for k in
                            ("ddl_type", "ddl_column", "ddl_new_name", "ddl_new_type")})
                out["ddl_default"] = first.get("ddl_default")
                if want in ("add", "gadd", "setdef"):
                    # flat field via the vectorized name-match rule (the
                    # per-op default above stays span-exact in ``ops``)
                    out["ddl_default"] = _flat_default_rule(
                        s, want, first["ddl_column"]
                    )
                break
    return out
