"""Canal filter semantics re-expressed as Catalyst-pushable predicates.

Reference behavior (AviaterRegexFilter.java:63-139):

- a filter config is a comma-separated list of Perl regexes over
  ``schema.table``;
- patterns are sorted longest-first and each is anchored ``^…$`` before
  being OR-joined (fixes partial-match ambiguity of the original matcher);
- matching is case-insensitive (target lowercased, :97);
- empty pattern / empty target → a configurable default (true for
  whitelists, false for blacklists — LogEventConvert.java:58, 403-408);
- the same filter applies at parse stage AND sink stage
  (EntryEventSink.doFilter, EntryEventSink.java:151-162) — here it is ONE
  DataFrame ``rlike`` predicate placed before any UDF so Catalyst can push
  it into the scan (SURVEY.md §4: keep filters ahead of UDFs).

Field projection (per-table column white/blacklists,
AbstractEventParser.java:74-99 + LogEventConvert.needField:937-943) becomes
struct re-projection — column pruning Catalyst propagates to the reader.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from .model import KIND_HEARTBEAT, KIND_ROW


def compile_canal_regex(pattern: str) -> str | None:
    """Comma-separated Perl regexes → one anchored, longest-first-ordered,
    OR-joined regex usable with ``rlike`` (and DuckDB ``regexp_matches``).
    Returns None for an empty config (caller applies the default)."""
    if not pattern:
        return None
    parts = [p for p in pattern.split(",") if p]
    if not parts:
        return None
    parts.sort(key=len, reverse=True)
    return "|".join(f"^{p}$" for p in parts)


def canal_name_predicate(
    col: Column, pattern: str, default_empty: bool = True
) -> Column:
    """Boolean Column implementing ``AviaterRegexFilter.filter`` over a
    name column (case-insensitive, anchored)."""
    compiled = compile_canal_regex(pattern)
    if compiled is None:
        return F.lit(default_empty)
    return F.when(col.isNull() | (col == ""), F.lit(default_empty)).otherwise(
        F.lower(col).rlike(compiled)
    )


def canal_simple_predicate(
    col: Column, pattern: str, default_empty: bool = True
) -> Column:
    """Exact-list filter (AviaterSimpleFilter.java:1-46): comma-separated
    literal names, case-insensitive membership; empty target → default."""
    if not pattern:
        return F.lit(default_empty)
    names = [p.strip().lower() for p in pattern.split(",") if p.strip()]
    return F.when(col.isNull() | (col == ""), F.lit(default_empty)).otherwise(
        F.lower(col).isin(names)
    )


@dataclass
class EventFilterConfig:
    """Instance filter config (ref: CanalInstanceWithManager wiring +
    LogEventConvert flags, LogEventConvert.java:58-70)."""

    table_whitelist: str = ""   # comma-separated regexes over schema.table
    table_blacklist: str = ""   # same, inverted (nameBlackFilter)
    field_whitelist: dict[str, list[str]] = field(default_factory=dict)  # "schema.table" -> cols
    field_blacklist: dict[str, list[str]] = field(default_factory=dict)
    filter_dml_insert: bool = False
    filter_dml_update: bool = False
    filter_dml_delete: bool = False
    filter_ddl: bool = False          # filterQueryDdl
    filter_rows: bool = False         # filterRows (drop all row events)
    drop_heartbeats: bool = True      # HeartBeatEntryEventHandler.java:15-35
    # drop index-only DDL (the C_INDEX/D_INDEX event classes,
    # EntryProtocol.proto:26-59 / DruidDdlParser.java:49-70) while keeping
    # schema-evolution DDL — routes on the classified stmt_class when the
    # frame carries one, else on classifying ddl_sql inline
    filter_index_ddl: bool = False
    # EL-style value predicate (AviaterELFilter.java:1-34): a boolean SQL
    # expression over event columns, e.g.
    # "schema_name = 'cc' AND coalesce(after.lang, '') != 'xx'".
    # Validated at apply time (must analyze against the frame AND be
    # boolean-typed — a typo'd column or non-boolean expression raises,
    # never silently drops everything); NULL evaluates to drop, matching
    # Aviater's boolean contract. Joined into the same pushable predicate
    # as the table filters, so it stays BEFORE every UDF in the plan.
    #
    # DELIBERATE DIVERGENCE from upstream: the predicate applies to ROW
    # events ONLY. The reference's AviaterELFilter evaluates the
    # expression against EVERY entry, DDL included (:25-33) — but here
    # non-ROW events carry NULL payload columns, so a value predicate
    # would NULL-evaluate and silently eat schema-evolution statements
    # (found and fixed in round 4's self-review). To exclude non-ROW
    # events, use ``table_white/blacklist`` (they apply to every kind) or
    # ``filter_ddl``; a header-only predicate cannot be expressed through
    # el_filter by design.
    el_filter: str = ""


def qualified_name(df_schema_col: Column, table_col: Column) -> Column:
    return F.concat_ws(".", df_schema_col, table_col)


def compile_el_predicate(df: DataFrame, el: str) -> Column:
    """Validate + compile an EL-style value predicate
    (AviaterELFilter.java:1-34: operators filter entries on field-value
    expressions via config). Validation is analysis-only (no job): the
    expression must resolve against the frame and type as BOOLEAN —
    anything else raises ValueError naming the expression, instead of a
    runtime surprise deep in a stream. NULL → drop (null-safe equality
    with true), matching the reference's boolean filter contract."""
    try:
        dt = df.select(F.expr(el).alias("__el")).schema[0].dataType
    except Exception as e:  # Parse/AnalysisException subclasses vary by path
        raise ValueError(
            f"el_filter does not analyze against the frame: {el!r}: {e}"
        ) from e
    if dt.typeName() != "boolean":
        raise ValueError(f"el_filter must be boolean, got {dt.simpleString()}: {el!r}")
    return F.expr(el).eqNullSafe(F.lit(True))


def apply_event_filters(df: DataFrame, cfg: EventFilterConfig) -> DataFrame:
    """Apply table white/blacklist + event-class filters to a change-event
    DataFrame. Placed first in the plan: plain predicates, fully pushable."""
    name = qualified_name(F.col("schema_name"), F.col("table_name"))
    pred = F.lit(True)
    if cfg.table_whitelist:
        pred = pred & canal_name_predicate(name, cfg.table_whitelist, default_empty=True)
    if cfg.table_blacklist:
        pred = pred & ~canal_name_predicate(name, cfg.table_blacklist, default_empty=False)
    if cfg.drop_heartbeats:
        pred = pred & (F.col("kind") != F.lit(KIND_HEARTBEAT))
    # event-class flags (LogEventConvert.java:64-70, 280-321)
    if cfg.filter_dml_insert:
        pred = pred & ~((F.col("kind") == KIND_ROW) & (F.col("op") == "I"))
    if cfg.filter_dml_update:
        pred = pred & ~((F.col("kind") == KIND_ROW) & (F.col("op") == "U"))
    if cfg.filter_dml_delete:
        pred = pred & ~((F.col("kind") == KIND_ROW) & (F.col("op") == "D"))
    if cfg.filter_ddl:
        pred = pred & (F.col("kind") != F.lit("DDL"))
    if cfg.filter_rows:
        pred = pred & (F.col("kind") != F.lit(KIND_ROW))
    if cfg.el_filter:
        # the EL predicate judges ROW VALUES (AviaterELFilter filters
        # entries on field values) — non-ROW events (DDL, heartbeats,
        # txn markers) carry NULL payload columns, which would evaluate
        # the predicate NULL → drop. Gate on kind so schema-evolution
        # statements are never silently filtered by a value predicate.
        pred = pred & (
            (F.col("kind") != KIND_ROW) | compile_el_predicate(df, cfg.el_filter)
        )
    if cfg.filter_index_ddl:
        if "stmt_class" in df.columns:
            cls = F.col("stmt_class")
        else:
            # classify inline from the DDL SQL text (JVM regexp CASE, same
            # generated classifier as the cdc_ddl_parse oracle)
            from .sources.ddl_sql import ddl_classify_exprs

            cls = F.expr(ddl_classify_exprs("ddl_sql", "spark")["stmt_class"])
        pred = pred & ~(
            (F.col("kind") == F.lit("DDL")) & cls.isin("CINDEX", "DINDEX")
        )
    return df.filter(pred)


def project_fields(df: DataFrame, cfg: EventFilterConfig, struct_cols=("before", "after")) -> DataFrame:
    """Per-table field white/blacklist → struct re-projection.

    Reference drops non-listed columns from row images at parse time
    (LogEventConvert.java:791-797); here the kept subset is re-packed into
    the before/after structs (dropped fields become null so the struct type
    stays stable across tables — Spark columns are schema-fixed, unlike the
    reference's variable-length column lists).
    """
    if not cfg.field_whitelist and not cfg.field_blacklist:
        return df
    name = qualified_name(F.col("schema_name"), F.col("table_name"))
    out = df
    for sc in struct_cols:
        struct_fields = [f.name for f in df.schema[sc].dataType.fields]
        new_fields = []
        for fname in struct_fields:
            keep = F.lit(True)
            for tbl, cols in cfg.field_whitelist.items():
                keep = F.when(name == tbl, F.lit(fname in cols)).otherwise(keep)
            for tbl, cols in cfg.field_blacklist.items():
                keep = F.when(name == tbl, F.lit(fname not in cols)).otherwise(keep)
            new_fields.append(
                F.when(keep, F.col(f"{sc}.{fname}")).otherwise(F.lit(None)).alias(fname)
            )
        out = out.withColumn(
            sc, F.when(F.col(sc).isNull(), F.lit(None)).otherwise(F.struct(*new_fields))
        )
    return out
