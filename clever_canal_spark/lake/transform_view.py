"""Materialized transform view: a derived LakeTable (per-row SQL-expr
transforms + optional predicate) maintained incrementally from a source
lake's changelog — the medallion bronze→silver pattern, CDC-native.

Where the replica (``lake/replica.py``) mirrors the source row-for-row
and the join view enriches across two tables, the transform view keeps
``SELECT key, f(row) AS ... FROM source WHERE p(row)`` materialized.

Maintenance is STATE-DIFF in the lake-VERSION domain, the maintained-
view discipline (``lake/_viewsync.py`` step 5), NOT raw changelog
shipping in the feed-LSN domain:

- each sync re-derives the CHANGED keys from the source's live state at
  the pinned head (bucket-pruned ``scan_for_keys_df`` — O(changes),
  never a table scan): present-and-matching rows upsert their derived
  images, absent or filter-failing keys tombstone;
- the LWW ordinal is the consumed lake version — monotone by
  construction, so an out-of-order shard putting a lower feed LSN in a
  later epoch still converges (the re-derivation reads what the SOURCE
  decided, not the raw event), a COW source's re-emitted rows fold to
  identical images, and recovery has a sound ordinal to write at;
- the cursor lives in ``_log/transformview.json`` beside the persisted
  exprs, replaced atomically after the merge; ``epoch_id = consumed
  version`` makes replays no-op.

Contracts:

- **Transforms must be DETERMINISTIC** SQL expressions over the source
  row — replays and reseeds recompute them.
- **Fixed schema.** Source column ADDs don't propagate; renaming or
  dropping a column an expr references fails the next sync with the
  analysis error — recreate the view (mirroring schema changes THROUGH
  arbitrary exprs is not decidable).
- **TRUNCATEs mirror as metadata** (scan_changes emits no rows for
  them): the view truncates at (truncate version - 1) in its own
  version-domain LSNs and tails from the truncate.
- The view is a pure function of source state, so recovery from
  retention expiry is EXACT: :func:`reseed_transform_view` diffs the
  view against the derived live state in one epoch at the head version.

Source-mode requirement (shared by every changelog consumer): MOR, or
COW **with** ``lsn_col``. A COW merge WITHOUT an LSN column deletes by
anti-join — no tombstone lands in any file, so ``scan_changes`` never
names the deleted key and downstream state silently keeps it.

Per-row Python transforms (the Arrow-UDF html→text path) stay on the
ingest side (``plans/apply.py`` transforms) where their cost is paid
once per event; this view is for JVM-expressible derivations over an
already-materialized lake.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ckpt import free_checkpoint
from .table import LakeTable

_SIDECAR = "transformview.json"


def _cfg_path(path: str) -> str:
    return os.path.join(path, "_log", _SIDECAR)


def _read_cfg(path: str) -> dict:
    try:
        with open(_cfg_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"{path} is not a transform view (no {_SIDECAR}); "
            f"create_transform_view first"
        )


def _write_cfg(path: str, cfg: dict) -> None:
    tmp = _cfg_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cfg, fh)
    os.replace(tmp, _cfg_path(path))


def _fresh(
    live: DataFrame, key: list[str], exprs: dict[str, str],
    row_filter: str | None,
) -> DataFrame:
    """Live source rows → derived upsert images."""
    if row_filter is not None:
        live = live.filter(F.coalesce(F.expr(row_filter), F.lit(False)))
    return live.select(
        *key, *[F.expr(e).alias(n) for n, e in exprs.items()],
        F.lit("U").alias("op"),
    )


def _delta_for_keys(
    source: LakeTable, keys: DataFrame, key: list[str],
    exprs: dict[str, str], row_filter: str | None,
    head: int, ordinal: int,
) -> DataFrame:
    """Re-derive ``keys`` from the source's live state at ``head``:
    U images for present-and-matching rows, D for the rest."""
    live = source.scan_for_keys_df(keys, version=head)
    fresh = _fresh(live, key, exprs, row_filter)
    gone = keys.join(fresh.select(*key), on=key, how="left_anti").select(
        *key,
        *[F.lit(None).alias(n) for n in exprs],
        F.lit("D").alias("op"),
    )
    return fresh.unionByName(gone).withColumn(
        "lsn", F.lit(int(ordinal)).cast("long")
    )


def create_transform_view(
    source: LakeTable,
    path: str,
    exprs: dict[str, str],
    row_filter: str | None = None,
    n_buckets: int | None = None,
) -> LakeTable:
    """Create the view and seed it from the source's current state (the
    one table-sized read). ``exprs`` maps view column name → SQL over
    source columns; the source's merge-key columns pass through and must
    not be re-derived."""
    head = source.current_version()
    snap = source.snapshot(head)
    key = list(snap.merge_key)
    clash = sorted(set(exprs) & set(key))
    if clash:
        raise ValueError(f"exprs must not re-derive key column(s) {clash}")
    probe = source.scan(version=head).select(
        *key, *[F.expr(e).alias(n) for n, e in exprs.items()]
    )
    view = LakeTable.create(
        source.spark, path, probe.schema,
        merge_key=key, bucket_key=list(snap.bucket_key),
        n_buckets=n_buckets or snap.n_buckets,
    )
    seed = _fresh(source.scan(version=head), key, exprs, row_filter)
    view.merge(
        seed.withColumn("lsn", F.lit(int(head)).cast("long")),
        epoch_id=head, mode="mor", lsn_col="lsn",
    )
    _write_cfg(path, {"version": head, "exprs": exprs,
                      "row_filter": row_filter})
    return view


def open_transform_view(spark: SparkSession, path: str) -> LakeTable:
    _read_cfg(path)  # validates
    return LakeTable(spark, path)


def transform_view_config(path_or_view) -> dict:
    path = getattr(path_or_view, "path", path_or_view)
    return _read_cfg(path)


def transform_view_cursor(path_or_view) -> int:
    return int(transform_view_config(path_or_view)["version"])


def sync_transform_view(
    view: LakeTable, source: LakeTable, to_version: int | None = None
) -> int:
    """Advance the view to the source head (or ``to_version`` — bounded
    catch-up: a lagged view consumes history in operator-chosen chunks,
    each step exactly-once) in one idempotent MOR epoch. Work:
    O(changes + changed keys' live rows + touched view buckets).
    Returns source versions consumed (0 = already current)."""
    cfg = _read_cfg(view.path)
    synced = int(cfg["version"])
    head = source.current_version() if to_version is None else int(to_version)
    if head <= synced:
        return 0
    key = list(source.snapshot(head).merge_key)
    truncs = source.truncates_between(synced, head)
    synced_from = synced
    if truncs:
        # view LSNs are consumed source versions: erase everything the
        # view derived before the truncate, then tail from it
        last = truncs[-1]
        view.truncate_rows(last["version"] - 1)
        synced_from = last["version"]
    if synced_from < head:
        keys = (
            source.scan_changes(synced_from, head)
            .select(*key).distinct().localCheckpoint(eager=True)
        )
        try:
            delta = _delta_for_keys(
                source, keys, key, cfg["exprs"], cfg["row_filter"],
                head=head, ordinal=head,
            )
            res = view.merge(delta, epoch_id=head, mode="mor", lsn_col="lsn")
            if not res.applied or res.rows_written == 0:
                view.commit_epoch_marker(head)
        finally:
            free_checkpoint(keys)
    else:
        view.commit_epoch_marker(head)
    _write_cfg(view.path, {**cfg, "version": head})
    return head - synced


def reseed_transform_view(view: LakeTable, source: LakeTable) -> int:
    """EXACT recovery after the cursor fell below the source's snapshot
    retention (``sync_transform_view`` raises ``SnapshotExpired``):
    re-derive the live state at the pinned head, tombstone view keys the
    source no longer yields, upsert the rest — one idempotent epoch at
    the head-version ordinal (monotone above every stored row's).
    Returns the new consumed version."""
    cfg = _read_cfg(view.path)
    head = source.current_version()
    key = list(source.snapshot(head).merge_key)
    fresh = _fresh(
        source.scan(version=head), key, cfg["exprs"], cfg["row_filter"]
    )
    stale = view.scan().select(*key).join(
        fresh.select(*key), on=key, how="left_anti"
    ).select(
        *key,
        *[F.lit(None).alias(n) for n in cfg["exprs"]],
        F.lit("D").alias("op"),
    )
    delta = fresh.unionByName(stale).withColumn(
        "lsn", F.lit(int(head)).cast("long")
    )
    res = view.merge(delta, epoch_id=head, mode="mor", lsn_col="lsn")
    if not res.applied or res.rows_written == 0:
        view.commit_epoch_marker(head)
    _write_cfg(view.path, {**cfg, "version": head})
    return head
