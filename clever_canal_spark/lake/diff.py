"""Snapshot diff — net row changes between two retained table versions.

The Iceberg changelog/diff read analog (``create_changelog_view``), and
the reconciliation primitive a downstream consumer uses to audit what a
span of CDC epochs did to the table: full-outer join the two snapshot
scans on the merge key and keep rows whose values differ.

Contrast with ``LakeTable.scan_changes``: the changelog returns the
WINNNERS applied per epoch (one row per key per epoch, including
winners that wrote the same value again); the diff returns the NET
state change — a key that was updated and then reverted inside the
span disappears, a rewritten-identical value is excluded.

Scale: both sides are bucket-colocated parquet scans of the SAME table,
so the join shuffles each side once on the key (at Iceberg scale the
storage-partitioned join removes even that). Output is bounded by the
number of touched keys, not table size, after the value filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .table import LakeTable


def snapshot_diff(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Net changes between ``from_version`` and ``to_version`` (default
    head): one row per key whose value set differs, with the old and new
    images and a change class ``A`` (added), ``U`` (updated), ``D``
    (deleted)."""
    # schemas may differ between the two versions (the engine's own DDL
    # channel adds/renames/widens columns routinely): resolve value columns
    # by FIELD ID, in the NEW schema's names — a renamed column compares
    # old-name-vs-new-name as the same field, a column added inside the
    # span reads as null on the old side, a dropped column leaves the diff
    # (current-schema semantics, the Iceberg changelog-view rule).
    # explicit versions go through the retention-aware read: a span
    # endpoint already expired by expire_snapshots raises SnapshotExpired
    # with the rebuild instruction (same contract as scan_changes), not a
    # bare FileNotFoundError on the log path
    old_snap = table._snapshot_retained(from_version)
    new_snap = (
        table.snapshot() if to_version is None
        else table._snapshot_retained(to_version)
    )
    key = new_snap.merge_key
    old = table.scan(version=from_version)
    new = table.scan(version=to_version)
    new_fields = {f["name"]: f for f in new_snap.current_fields()}
    old_by_id = {f["id"]: f for f in old_snap.current_fields()}
    vals = value_cols if value_cols is not None else [
        c for c in new.columns if c not in key
    ]
    def _old_side(c):
        nf = new_fields.get(c)
        of = old_by_id.get(nf["id"]) if nf else None
        if of is None:  # field didn't exist at from_version
            return F.lit(None).cast(nf["type"] if nf else "string")
        # cast through the new type so a widened column compares cleanly
        return F.col(of["name"]).cast(nf["type"])
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    # presence is decided by the join side, not value nullability: a key
    # present with all-null values is still present — detect via a
    # side-marker instead of value columns
    o2 = old.select(*key, F.lit(True).alias("__in_old"),
                    *[_old_side(c).alias(f"old_{c}") for c in vals])
    n2 = new.select(*key, F.lit(True).alias("__in_new"),
                    *[F.col(c).alias(f"new_{c}") for c in vals])
    j = o2.join(n2, on=list(key), how="full_outer")
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    change = (
        F.when(~in_old, F.lit("A"))
        .when(~in_new, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        j.withColumn("change", change)
        .filter(~in_old | ~in_new | changed)
        .drop("__in_old", "__in_new")
    )
