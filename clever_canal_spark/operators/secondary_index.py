"""CDC-maintained secondary index: point lookups by a NON-key attribute
without scanning the table — the Hudi record-level-index / DB secondary-
index analog, maintained from the changelog like the other persisted
indexes (dedup, ANN, text, link graph).

The index is itself a LakeTable keyed ``(val, <source merge key>)`` and
physically bucketed by ``val``, so a probe for one value reads ONE index
bucket (further key-range/bloom-pruned by the ordinary lookup machinery)
and then fetches exactly the matching source rows bucket-pruned — two
delta-sized reads regardless of table size.

Maintenance is STATE-DIFF, not marker arithmetic (the CMS-view lesson:
``apply_epoch`` pre-dedups each epoch, so I/D markers under-count): each
sync reads the changed keys' rows at the range's two PINNED endpoint
versions, diffs the (val, key) pair sets, and merges additions as U and
disappearances as D in one idempotent MOR epoch. The LWW ordinal is the
consumed lake VERSION (a pair can disappear at v5 and reappear at v9 —
the reappearance must win the reconcile), and the cursor is the index's
own epoch registry — crash-atomic with the data, no sidecar cursor, a
fresh-process reopen resumes by construction.

The value expression (a SQL string over source columns) persists in
``_log/secindex.json`` so ``open_secondary_index`` reopens without the
caller restating it.

Reference seam: the reference delivers rows and leaves indexing to the
sink store (its MemoryMetaManager tracks cursors, not values); this is
the sink-side capability a consumer of ES/HBase adapters gets from the
store, rebuilt lake-native.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ckpt import free_checkpoint
from ..lake.rollup import rollup_cursor
from ..lake.table import LakeTable

_SIDECAR = "secindex.json"


@dataclass
class SecondaryIndex:
    entries: LakeTable
    value_expr: str
    src_key: list[str]
    path: str


def _cfg_path(path: str) -> str:
    return os.path.join(path, "_log", _SIDECAR)


def _pairs(table: LakeTable, rows: DataFrame, value_expr: str, key: list[str]) -> DataFrame:
    return rows.select(
        F.expr(value_expr).cast("string").alias("val"), *key
    ).filter(F.col("val").isNotNull()).distinct()


def build_secondary_index(
    table: LakeTable,
    path: str,
    value_expr: str,
    n_buckets: int = 16,
) -> SecondaryIndex:
    """Bootstrap from the source's current state (the one corpus-sized
    read) and pin the cursor at that version. NULL values are not
    indexed (SQL-index convention; a probe for NULL is a table-scan
    question, not a point query)."""
    head = table.current_version()
    snap = table.snapshot(head)
    key = list(snap.merge_key)
    import pyspark.sql.types as T

    probe = table.scan(version=head).select(
        F.expr(value_expr).cast("string").alias("val"), *key
    )
    schema = T.StructType(
        [probe.schema["val"]] + [probe.schema[k] for k in key]
    )
    idx = LakeTable.create(
        table.spark, path, schema,
        merge_key=["val", *key], bucket_key=["val"], n_buckets=n_buckets,
    )
    seed = _pairs(table, table.scan(version=head), value_expr, key)
    idx.merge(
        seed.withColumn("op", F.lit("U"))
            .withColumn("lsn", F.lit(int(head)).cast("long")),
        epoch_id=head, mode="mor", lsn_col="lsn",
    )
    with open(_cfg_path(path), "w") as fh:
        json.dump({"value_expr": value_expr, "src_key": key}, fh)
    return SecondaryIndex(idx, value_expr, key, path)


def open_secondary_index(spark: SparkSession, path: str) -> SecondaryIndex:
    with open(_cfg_path(path)) as fh:
        cfg = json.load(fh)
    return SecondaryIndex(
        LakeTable(spark, path), cfg["value_expr"], list(cfg["src_key"]), path
    )


def sync_secondary_index(idx: SecondaryIndex, table: LakeTable) -> int:
    """Advance to the source head. Work: O(changes + changed keys' rows
    at the two endpoints + their index entries) — never a scan of either
    table. Returns lake versions consumed (0 = already current)."""
    head = table.current_version()
    synced = rollup_cursor(idx.entries)
    if head <= synced:
        return 0
    truncs = table.truncates_between(synced, head)
    synced_from = synced
    if truncs:
        # the source erased everything at the watermark — mirror in the
        # index's own lsn domain (= lake versions) and tail from there
        last = truncs[-1]
        idx.entries.truncate_rows(last["version"] - 1)
        synced_from = last["version"]
        if synced_from >= head:
            idx.entries.commit_epoch_marker(head)
            return head - synced
    key = idx.src_key
    keys = (
        table.scan_changes(synced_from, head)
        .select(*key).distinct().localCheckpoint(eager=True)
    )
    try:
        old = (
            _pairs(table, table.scan_for_keys_df(keys, version=synced_from),
                   idx.value_expr, key)
            if synced_from > 0
            else keys.limit(0).select(
                F.lit(None).cast("string").alias("val"), *key
            )
        )
        new = _pairs(table, table.scan_for_keys_df(keys, version=head),
                     idx.value_expr, key)
        on = ["val", *key]
        adds = new.join(old, on=on, how="left_anti").withColumn("op", F.lit("U"))
        drops = old.join(new, on=on, how="left_anti").withColumn("op", F.lit("D"))
        delta = adds.unionByName(drops).withColumn(
            "lsn", F.lit(int(head)).cast("long")
        )
        res = idx.entries.merge(delta, epoch_id=head, mode="mor", lsn_col="lsn")
        if not res.applied or res.rows_written == 0:
            # merge() no-ops an already-committed epoch before any write;
            # an empty delta still needs the cursor to advance
            idx.entries.commit_epoch_marker(head)
    finally:
        free_checkpoint(keys)
    return head - synced


def probe_secondary(
    idx: SecondaryIndex, table: LakeTable, value
) -> DataFrame:
    """Live source rows whose indexed value equals ``value`` — one index
    bucket read + a bucket-pruned source fetch of exactly the matching
    keys. The index is exact (state-diff maintained), so no re-filter of
    the fetched rows is needed; the defensive re-check is one JVM
    predicate and keeps a mid-probe concurrent writer from surfacing a
    row that changed since the index's consumed version."""
    probe = idx.entries.spark.createDataFrame(
        [(str(value),)], "val string"
    )
    keys = idx.entries.scan_for_keys_df(probe).select(*idx.src_key)
    rows = table.scan_for_keys_df(keys)
    return rows.filter(
        F.expr(idx.value_expr).cast("string") == F.lit(str(value))
    )


def reseed_secondary_index(idx: SecondaryIndex, table: LakeTable) -> int:
    """Recover an index whose cursor fell below the source's snapshot
    retention (``sync_secondary_index`` raises :class:`SnapshotExpired`):
    diff the index entries against the source's LIVE pairs at the pinned
    head and repair in ONE idempotent epoch — adds for missing pairs,
    tombstones for stale ones. Unlike the sketch views (whose history is
    unknowable once expired), the secondary index is a pure function of
    current state, so the reseed is EXACT, and it reads the index + the
    live table once instead of rebuilding into a new directory. Returns
    the new consumed version."""
    head = table.current_version()
    key = idx.src_key
    want = _pairs(table, table.scan(version=head), idx.value_expr, key)
    have = idx.entries.scan()
    on = ["val", *key]
    adds = want.join(have, on=on, how="left_anti").withColumn("op", F.lit("U"))
    drops = have.join(want, on=on, how="left_anti").withColumn("op", F.lit("D"))
    delta = adds.unionByName(drops).withColumn(
        "lsn", F.lit(int(head)).cast("long")
    )
    res = idx.entries.merge(delta, epoch_id=head, mode="mor", lsn_col="lsn")
    if not res.applied or res.rows_written == 0:
        idx.entries.commit_epoch_marker(head)
    return head
