"""Bulk row-level DML: DELETE WHERE / UPDATE WHERE as change events.

The Iceberg ``DELETE FROM`` / ``UPDATE`` analog, expressed the way a CDC
lake wants it: instead of rewriting files behind the changelog's back, the
matching live rows become ordinary compensation events (op 'D' or 'U' at
an LSN above the table frontier) and flow through the same exactly-once
:meth:`LakeTable.merge` as feed epochs. Everything downstream — MOR
changelog (``scan_changes``), maintained views (rollup / HLL / CMS / hist
syncs), named consumers, the persisted dedup/ANN/text indexes — absorbs
the mutation as normal change rows, and replaying the DML epoch no-ops.

This mirrors the reference's position that every state change is an event
(EntryProtocol.proto EventType DELETE/UPDATE); the reference has no bulk
DML because its sink is someone else's database — here the lake IS the
sink, so bulk DML must exist and must not fork the consistency story.

Scale shape: one predicate-pushed scan of the live table (column-pruned to
the matching rows), then the standard O(batch) MOR delta write (or
touched-bucket COW). The predicate reaches the parquet scan unchanged —
no driver-side key collection, no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..lake.table import LakeTable, MergeResult
from .flashback import _frontier_lsn

__all__ = ["DmlResult", "delete_where", "update_where"]


@dataclass
class DmlResult:
    applied: bool
    version: int
    lsn: int | None = None


def _pred(predicate: Column | str) -> Column:
    return F.expr(predicate) if isinstance(predicate, str) else predicate


def _source(
    table: LakeTable, predicate: Column | str, lsn: int | None
) -> tuple[DataFrame, int, list[str]]:
    snap = table.snapshot()
    cols = [f["name"] for f in snap.current_fields()]
    dml_lsn = lsn if lsn is not None else (_frontier_lsn(table) or 0) + 1
    live = table.scan().filter(_pred(predicate))
    return live, dml_lsn, cols


def delete_where(
    table: LakeTable,
    predicate: Column | str,
    epoch_id,
    lsn: int | None = None,
    mode: str = "mor",
) -> DmlResult:
    """Delete every live row matching ``predicate`` — as 'D' change events.

    The events carry the row's current image (the CDC before-image
    convention) and an LSN above the table frontier, so they win LWW
    against anything already stored AND against any lagging shard
    re-delivering older events afterwards. Exactly-once rides the normal
    epoch registry: a replay with the same ``epoch_id`` is a no-op
    (checked before any Spark job runs).
    """
    if epoch_id is not None and table.is_epoch_committed(epoch_id):
        return DmlResult(applied=False, version=table.current_version())
    live, dml_lsn, cols = _source(table, predicate, lsn)
    src = live.select(
        *cols,
        F.lit(dml_lsn).cast("long").alias("__dml_lsn"),
        F.lit("D").alias("__dml_op"),
    )
    res: MergeResult = table.merge(
        src,
        epoch_id=epoch_id,
        lineage={"op": "delete_where", "lsn_max": dml_lsn},
        op_col="__dml_op",
        lsn_col="__dml_lsn",
        mode=mode,
    )
    return DmlResult(applied=res.applied, version=res.version, lsn=dml_lsn)


def update_where(
    table: LakeTable,
    predicate: Column | str,
    set_exprs: dict[str, Column | str],
    epoch_id,
    lsn: int | None = None,
    mode: str = "mor",
) -> DmlResult:
    """Rewrite every live row matching ``predicate`` — as 'U' change events.

    ``set_exprs`` maps column name → new-value expression (Column or SQL
    string, evaluated against the row's current image). Merge-key columns
    are refused: changing a key is a delete+insert, not an update — do it
    explicitly so the changelog says what happened.
    """
    if epoch_id is not None and table.is_epoch_committed(epoch_id):
        return DmlResult(applied=False, version=table.current_version())
    snap = table.snapshot()
    bad = sorted(set(set_exprs) & set(snap.merge_key))
    if bad:
        raise ValueError(
            f"update_where cannot set merge-key column(s) {bad}; "
            "delete the old key and insert the new one instead"
        )
    unknown = sorted(set(set_exprs) - {f["name"] for f in snap.current_fields()})
    if unknown:
        raise ValueError(f"update_where: unknown column(s) {unknown}")
    live, dml_lsn, cols = _source(table, predicate, lsn)
    # one projection, every set-expression evaluated against the PRE-image
    # (SQL UPDATE semantics: SET a = b, b = a swaps — a sequential
    # withColumn chain would instead feed a's new value into b). Each set
    # expression is cast to the column's DECLARED type: a narrower literal
    # (SET views = 0 → IntegerType) would otherwise write a delta file
    # whose physical parquet type differs from sibling files of the same
    # schema_version, poisoning every later mixed-footer read.
    types = {f["name"]: f["type"] for f in snap.current_fields()}
    updated = live.select(
        *[
            (_pred(set_exprs[c]).cast(types[c]).alias(c) if c in set_exprs else F.col(c))
            for c in cols
        ]
    )
    src = updated.select(
        *cols,
        F.lit(dml_lsn).cast("long").alias("__dml_lsn"),
        F.lit("U").alias("__dml_op"),
    )
    res: MergeResult = table.merge(
        src,
        epoch_id=epoch_id,
        lineage={"op": "update_where", "lsn_max": dml_lsn},
        op_col="__dml_op",
        lsn_col="__dml_lsn",
        mode=mode,
    )
    return DmlResult(applied=res.applied, version=res.version, lsn=dml_lsn)
