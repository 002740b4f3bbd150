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
from ..model import (
    DDL_ADD_COLUMN,
    DDL_DROP_COLUMN,
    DDL_RENAME_COLUMN,
    DDL_RETYPE,
    DDL_SET_DEFAULT,
    DDL_TRUNCATE,
    DDL_WIDEN_TYPE,
)


def apply_ddl_idempotent(table: LakeTable, ddl_row: dict) -> bool:
    """Apply one DDL-channel row; returns True if any schema change
    happened, False if it was already applied (replay no-op).

    A row may carry only raw SQL text (``ddl_sql``) — the real-binlog shape
    (LogEventConvert.java:236-246 emits the statement text; the reference
    parses it with DruidDdlParser/SimpleDdlParser). The structured fields
    are recovered by :func:`..sources.ddl_sql.parse_ddl`; a multi-clause
    ALTER yields SEVERAL sub-operations (``parsed["ops"]``, clause order —
    the Druid AST iterate-all-items analog) and every one applies.
    Statements that aren't a supported schema evolution (index DDL,
    CREATE/DROP table) are no-ops for the lake schema, matching the
    reference's pass-through behavior. TRUNCATE is the exception: the
    lake IS the sink, so it applies as `LakeTable.truncate_rows` at the
    statement's feed LSN (metadata-only drop-all-files commit).

    Replay after a crash mid-statement is safe: each sub-op re-checks the
    current schema, so already-applied clauses no-op individually."""
    # fall back to SQL parsing when the structured fields are absent OR
    # incomplete (e.g. a row constructed with only ``ddl_sql`` text but a
    # defaulted ddl_type) — a half-filled row must never reach the schema
    # store, where a null column name would poison every later read
    if ddl_row.get("ddl_sql") and not (
        ddl_row.get("ddl_type") and ddl_row.get("ddl_column")
    ):
        from ..sources.ddl_sql import parse_ddl

        parsed = parse_ddl(ddl_row["ddl_sql"])
        if parsed["stmt_class"] == "TRUNCATE":
            # statement-level row erasure, not a column op — parse_ddl's
            # ``ops`` list stays column-only (classifier agreement)
            return _apply_one(table, {"ddl_type": DDL_TRUNCATE}, ddl_row)
        ops = parsed["ops"]
        if not ops:
            return False  # classified, but not a schema evolution we track
    else:
        ops = [{k: ddl_row.get(k) for k in
                ("ddl_type", "ddl_column", "ddl_new_name", "ddl_new_type",
                 "ddl_default")}]
    changed = False
    for op in ops:
        changed = _apply_one(table, op, ddl_row) or changed
    return changed


def _widen_ok():
    from ..lake.table import _WIDEN_OK

    return _WIDEN_OK


def _apply_one(table: LakeTable, op: dict, ddl_row: dict) -> bool:
    names = {f["name"]: f for f in table.snapshot().current_fields()}
    t = op["ddl_type"]
    if t == DDL_TRUNCATE:
        # idempotence lives in the LSN watermark, not column presence
        lsn = int(ddl_row.get("lsn") or 0)
        if lsn <= 0:
            raise ValueError("TRUNCATE apply requires the DDL row's feed lsn")
        return table.truncate_rows(lsn) is not None
    if not op.get("ddl_column"):
        raise ValueError(
            f"DDL op has ddl_type={t!r} but no ddl_column and no parseable "
            f"ddl_sql ({ddl_row.get('ddl_sql')!r})"
        )
    if t == DDL_ADD_COLUMN:
        if op["ddl_column"] in names:
            return False
        table.add_column(
            op["ddl_column"],
            op["ddl_new_type"] or "string",
            default=op.get("ddl_default"),
        )
        return True
    if t == DDL_DROP_COLUMN:
        if op["ddl_column"] not in names:
            return False  # already dropped (replay)
        table.drop_column(op["ddl_column"])
        return True
    if t == DDL_RENAME_COLUMN:
        renamed = False
        if op["ddl_column"] == op["ddl_new_name"]:
            # ``CHANGE COLUMN a a bigint`` — MySQL's retype-without-rename
            # idiom; there is no rename to perform, only the widen below
            pass
        elif op["ddl_column"] not in names and op["ddl_new_name"] in names:
            pass  # already renamed (crash replay) — still re-check the widen
        else:
            table.rename_column(op["ddl_column"], op["ddl_new_name"])
            renamed = True
        # CHANGE COLUMN carries a type as well — widen when it's a legal
        # promotion; same-or-narrower types are a rename-only no-op. The
        # widen re-check runs on the replay path too: a crash between the
        # rename commit and the widen commit must not lose the type change.
        nt = op.get("ddl_new_type")
        widened = False
        if nt:
            cur = {f["name"]: f for f in table.snapshot().current_fields()}.get(
                op["ddl_new_name"]
            )
            if (
                cur is not None
                and cur["type"] != nt
                and (cur["type"], nt) in _widen_ok()
            ):
                table.widen_column(op["ddl_new_name"], nt)
                widened = True
        return renamed or widened
    if t == DDL_SET_DEFAULT:
        # ALTER COLUMN x SET/DROP DEFAULT (TableMeta defaultValue,
        # TableMeta.java:23-126 via MemoryTableMeta.java:67-88): update
        # the field's WRITE default; initial-default stays frozen so
        # existing rows never change. Idempotence: replay of an applied
        # change sees the identical stored value and no-ops.
        cur = names.get(op["ddl_column"])
        if cur is None:
            raise ValueError(f"SET DEFAULT on unknown column {op['ddl_column']}")
        new = op.get("ddl_default")
        from ..lake.table import _validate_default

        validated = None if new is None else _validate_default(new, cur["type"])
        if "write_default" in cur and cur["write_default"] == validated:
            return False  # already applied (replay)
        if "write_default" not in cur and validated is None and (
            cur.get("initial_default") is None
        ):
            return False  # DROP DEFAULT on a column that never had one
        table.set_default(op["ddl_column"], new)
        return True
    if t in (DDL_WIDEN_TYPE, DDL_RETYPE):
        cur = names.get(op["ddl_column"])
        if cur is None:
            raise ValueError(f"widen of unknown column {op['ddl_column']}")
        if cur["type"] == op["ddl_new_type"]:
            return False
        if (t == DDL_RETYPE or ddl_row.get("ddl_sql")) and (
            cur["type"], op["ddl_new_type"]
        ) not in _widen_ok():
            # RETYPE (the SQL-channel MODIFY tag — classifier cannot know
            # widen-ness without the live schema) and SQL-text rows: a
            # non-widening retype is a validated no-op for the lake schema
            # — a valid upstream statement must never crash the apply
            # loop; consumers alert on the refused RETYPE via the tag.
            # Direct structured WIDEN_TYPE keeps the hard error.
            return False
        table.widen_column(op["ddl_column"], op["ddl_new_type"])
        return True
    raise ValueError(f"unknown ddl_type {t}")
