"""DDL-channel application — the TableMeta-TSDB analog.

Reference: DDL arrives in-stream as a row entry with ``isDdl=true`` + SQL
text (LogEventConvert.java:236-246), is applied to the schema store at its
binlog position (MemoryTableMeta.apply, MemoryTableMeta.java:67-88), and the
event store isolates it in its own delivered batch so clients always see
DML-before / DDL / DML-after in order (MemoryEventStoreWithBuffer.java:389-417).

Here a DDL row carries structured fields (``ddl_type``, ``ddl_column``,
``ddl_new_name``, ``ddl_new_type``) and applies to the LakeTable's schema.
Application is **idempotent** — a crash between a segment merge and its DDL
apply replays the DDL, which must then be a no-op (the exactly-once rule
covers schema changes too).
"""

from __future__ import annotations

from ..lake import LakeTable
from ..model import DDL_ADD_COLUMN, DDL_RENAME_COLUMN, DDL_WIDEN_TYPE


def apply_ddl_idempotent(table: LakeTable, ddl_row: dict) -> bool:
    """Apply one DDL-channel row; returns True if a schema change happened,
    False if it was already applied (replay no-op).

    A row may carry only raw SQL text (``ddl_sql``) — the real-binlog shape
    (LogEventConvert.java:236-246 emits the statement text; the reference
    parses it with DruidDdlParser/SimpleDdlParser). Here the structured
    fields are recovered by :func:`..sources.ddl_sql.parse_ddl` and then
    applied identically. Statements that aren't one of the three supported
    schema evolutions (index DDL, TRUNCATE, table-level ops) are no-ops for
    the lake schema, matching the reference's pass-through behavior."""
    # fall back to SQL parsing when the structured fields are absent OR
    # incomplete (e.g. a row constructed with only ``ddl_sql`` text but a
    # defaulted ddl_type) — a half-filled row must never reach the schema
    # store, where a null column name would poison every later read
    if ddl_row.get("ddl_sql") and not (
        ddl_row.get("ddl_type") and ddl_row.get("ddl_column")
    ):
        from ..sources.ddl_sql import parse_ddl

        parsed = parse_ddl(ddl_row["ddl_sql"])
        if not parsed["ddl_type"]:
            return False  # classified, but not a schema evolution we track
        ddl_row = {**ddl_row, **{k: parsed[k] for k in
                                 ("ddl_type", "ddl_column", "ddl_new_name", "ddl_new_type")}}
    names = {f["name"]: f for f in table.snapshot().current_fields()}
    t = ddl_row["ddl_type"]
    if not ddl_row.get("ddl_column"):
        raise ValueError(
            f"DDL row has ddl_type={t!r} but no ddl_column and no parseable "
            f"ddl_sql ({ddl_row.get('ddl_sql')!r})"
        )
    if t == DDL_ADD_COLUMN:
        if ddl_row["ddl_column"] in names:
            return False
        table.add_column(ddl_row["ddl_column"], ddl_row["ddl_new_type"] or "string")
        return True
    if t == DDL_RENAME_COLUMN:
        if ddl_row["ddl_column"] not in names and ddl_row["ddl_new_name"] in names:
            return False  # already renamed
        table.rename_column(ddl_row["ddl_column"], ddl_row["ddl_new_name"])
        return True
    if t == DDL_WIDEN_TYPE:
        cur = names.get(ddl_row["ddl_column"])
        if cur is None:
            raise ValueError(f"widen of unknown column {ddl_row['ddl_column']}")
        if cur["type"] == ddl_row["ddl_new_type"]:
            return False
        table.widen_column(ddl_row["ddl_column"], ddl_row["ddl_new_type"])
        return True
    raise ValueError(f"unknown ddl_type {t}")
