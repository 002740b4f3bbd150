"""Downstream replica: a second LakeTable kept in lockstep with a source
lake by changelog shipping — the delivery half of the reference's
node→sink pipeline (CanalServerWithEmbedded.java get/ack feeding the MQ /
downstream adapters) re-expressed as an incremental lake-to-lake mirror.

Why this is the Spark-first shape at 100 TB: the source's changelog
(``scan_changes``) is a file-diff read — O(changes), never a table scan —
and the replica applies it with the ordinary MOR merge (bucketed delta
append, no target read), so steady-state replication cost is proportional
to the change rate on BOTH ends regardless of table size. Schema changes
ship as metadata-only commits (field-id diff → add/rename/widen/drop),
and TRUNCATEs mirror as metadata, so the only data bytes that ever move
are changed rows.

Correctness contract:

- **Bootstrap carries tombstones.** ``create_replica`` seeds from the
  source's reconciled winners *including delete winners* (with their
  LSNs): a late out-of-order event below a deleted key's tombstone LSN
  must lose on the replica exactly as it loses on the source — seeding
  from the live view only would let the replica resurrect the key.
- **Exactly-once.** Each sync merges with ``epoch_id = consumed source
  version``; replays no-op inside ``merge``. The sidecar (consumed
  version + field-id map + subscription) is one atomically-replaced JSON
  file written *after* the merge — a crash between them re-runs an
  idempotent sync.
- **Schema mirroring is state-diff, not DDL replay.** The sidecar maps
  source field ids to replica field ids; at each sync the source's
  head schema is diffed against the replica's actual current schema
  through that map (drops → renames (cycle-safe) → widens → adds), so a
  crash mid-mirror replays idempotently — every op checks the replica's
  real state first, and an add interrupted before the sidecar update is
  adopted by name rather than re-raised as "column exists".
- **Filtered subscription** (``row_filter``, the sink-side counterpart
  of the reference's subscription filters, §2.3): an update that moves a
  row OUT of the predicate ships as a delete marker — including at
  bootstrap, where a non-matching winner seeds as a tombstone at its own
  LSN, so a later out-of-order matching image below it cannot resurrect
  a key the filtered view never showed. The replica state is exactly
  "source rows WHERE filter", with the same LWW calls.
- **Column projection** (``columns``): a FIXED field-id subscription
  resolved at create time — renames/widens/drops of subscribed fields
  mirror; columns the source adds later do NOT join the subscription
  (subscribe-time projection, Canal's field whitelist analog). The
  ``row_filter`` still evaluates against the FULL source row before
  projection.
- **Source mode.** Exact change shipping wants a MOR source (delta files
  hold exactly the applied winners). A COW source converges too — its
  commits re-emit unchanged co-bucketed rows, which the replica's LWW
  merge folds to the same state — PROVIDED it merges with ``lsn_col``:
  a COW merge without an LSN deletes by anti-join, leaving no tombstone
  for ``scan_changes`` to ship, and the replica would keep the row.

Reference parity: the store→consumer delivery loop is
``CanalServerWithEmbedded.java:200-320`` (get/ack cursoring); TableMeta
propagation to consumers is ``MemoryTableMeta.java:67-88``; row/field
subscription filtering is ``AviaterRegexFilter`` + field white/blacklists
(§2.3). Here the cursor is the sidecar version, the meta channel is the
field-id diff, and the filters run as JVM predicates on the changelog.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .table import LakeTable

_SIDECAR = "replica.json"


def _read_sidecar(path: str) -> dict:
    try:
        with open(os.path.join(path, _SIDECAR)) as fh:
            d = json.load(fh)
            d["idmap"] = {int(k): int(v) for k, v in d["idmap"].items()}
            d.setdefault("row_filter", None)
            d.setdefault("subset", False)
            return d
    except FileNotFoundError:
        raise ValueError(
            f"{path} is not a replica (no {_SIDECAR}); create_replica first"
        )


def _write_sidecar(
    path: str, version: int, idmap: dict[int, int],
    row_filter: str | None, subset: bool,
) -> None:
    tmp = os.path.join(path, f".{_SIDECAR}.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {"version": int(version),
             "idmap": {str(k): int(v) for k, v in idmap.items()},
             "row_filter": row_filter, "subset": bool(subset)}, fh,
        )
    os.replace(tmp, os.path.join(path, _SIDECAR))


def replica_cursor(path: str) -> int:
    """Last consumed SOURCE version — driver-side JSON read, zero jobs."""
    return int(_read_sidecar(path)["version"])


def replica_lag(replica: LakeTable, source: LakeTable) -> dict:
    """Zero-job lag gauge: source versions not yet shipped."""
    head = source.current_version()
    synced = replica_cursor(replica.path)
    return {"source_version": head, "synced_version": synced,
            "versions_behind": max(0, head - synced)}


def _ship(
    frame: DataFrame, row_filter: str | None,
    key_cols: list[str], out_cols: list[str],
) -> DataFrame:
    """Project a winners/changelog frame (full source row + op/lsn) into
    the replica's merge input. With a filter, a U image outside the
    predicate ships as a D marker (null payload) — the filtered view's
    tombstone — at the row's own LSN."""
    if row_filter is None:
        return frame.select(*[F.col(c) for c in out_cols], "op", "lsn")
    keep = F.coalesce(F.expr(row_filter), F.lit(False))
    op = F.when((F.col("op") != "D") & ~keep, F.lit("D")).otherwise(F.col("op"))
    cols = [
        F.col(c) if c in key_cols
        else F.when(op == "D", F.lit(None)).otherwise(F.col(c)).alias(c)
        for c in out_cols
    ]
    return frame.select(*cols, op.alias("op"), F.col("lsn"))


def create_replica(
    source: LakeTable,
    path: str,
    n_buckets: int | None = None,
    row_filter: str | None = None,
    columns: list[str] | None = None,
) -> LakeTable:
    """Bootstrap a replica at ``path`` from the source's current state
    (the one table-sized read replication ever costs) and pin the cursor
    at that version. Rows keep their source LSNs — including delete
    winners — so every post-bootstrap LWW decision matches the source's.

    ``row_filter``: SQL predicate over source columns — the replica holds
    exactly the matching rows (non-matching images become tombstones).
    ``columns``: fixed column subscription (must cover the merge/bucket
    keys); later source ADDs stay out of the subscription."""
    head = source.current_version()
    snap = source.snapshot(head)
    src_fields = snap.current_fields()
    if columns is not None:
        need = set(snap.merge_key) | set(snap.bucket_key)
        missing = sorted(need - set(columns))
        if missing:
            raise ValueError(f"columns must include key column(s) {missing}")
        unknown = sorted(set(columns) - {f["name"] for f in src_fields})
        if unknown:
            raise ValueError(f"unknown column(s) {unknown}")
        sub_fields = [f for f in src_fields if f["name"] in set(columns)]
    else:
        sub_fields = src_fields
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField(f["name"], T.DataType.fromDDL(f["type"]))
         for f in sub_fields]
    )
    replica = LakeTable.create(
        source.spark, path, schema,
        merge_key=list(snap.merge_key),
        bucket_key=list(snap.bucket_key),
        n_buckets=n_buckets or snap.n_buckets,
    )
    if snap.truncate_lsn:
        # mirror the source's truncate watermark — every live/changelog row
        # is above it (the source's own merge guard), so this only protects
        # the replica against stray below-watermark writes
        replica.truncate_rows(snap.truncate_lsn)
    rep_fields = replica.snapshot().current_fields()
    # created in source-schema order → positional zip is the id map
    idmap = {int(s["id"]): int(r["id"]) for s, r in zip(sub_fields, rep_fields)}
    out_cols = [f["name"] for f in sub_fields]
    winners = source._reconciled(snap, keep_deletes=True).withColumn(
        "op", F.col("__op")
    ).withColumn("lsn", F.col("__lsn").cast("long"))
    replica.merge(
        _ship(winners, row_filter, list(snap.merge_key), out_cols),
        epoch_id=head, mode="mor", lsn_col="lsn",
    )
    _write_sidecar(path, head, idmap, row_filter, columns is not None)
    return replica


def _mirror_schema(
    replica: LakeTable,
    idmap: dict[int, int],
    head_fields: list[dict],
    subscribe_new: bool = True,
) -> dict[int, int]:
    """Diff the source's head schema against the replica's ACTUAL current
    schema through the field-id map and apply drops → renames (cycle-safe
    via temp names) → widens → adds. Every op is guarded on the replica's
    real state, so a crash-replay of a half-applied mirror is a no-op for
    the already-applied half. ``subscribe_new=False`` (column-projected
    replicas) skips the adds — the subscription is fixed at create time.
    Returns the updated id map."""
    idmap = dict(idmap)
    head_by_id = {int(f["id"]): f for f in head_fields}

    def rep_by_id() -> dict[int, dict]:
        return {int(f["id"]): f for f in replica.snapshot().current_fields()}

    cur = rep_by_id()
    # 1. drops: source field id vanished
    for sfid in list(idmap):
        if sfid not in head_by_id:
            rf = cur.get(idmap[sfid])
            if rf is not None:
                replica.drop_column(rf["name"])
                cur = rep_by_id()
            del idmap[sfid]
    # 2. renames, cycle-safe: apply any rename whose target name is free;
    # if none is (a pure swap cycle), vacate one via a temp name
    pending = {
        sfid: head_by_id[sfid]["name"]
        for sfid in idmap
        if sfid in head_by_id
        and idmap[sfid] in cur
        and cur[idmap[sfid]]["name"] != head_by_id[sfid]["name"]
    }
    while pending:
        names = {f["name"] for f in cur.values()}
        progressed = False
        for sfid, new in list(pending.items()):
            old = cur[idmap[sfid]]["name"]
            if old == new:  # crash-replay: already applied
                del pending[sfid]
                progressed = True
            elif new not in names:
                replica.rename_column(old, new)
                cur = rep_by_id()
                names = {f["name"] for f in cur.values()}
                del pending[sfid]
                progressed = True
        if pending and not progressed:
            sfid = next(iter(pending))
            old = cur[idmap[sfid]]["name"]
            replica.rename_column(old, f"__mirror_tmp_{sfid}")
            cur = rep_by_id()
    # 3. widens
    for sfid, rfid in idmap.items():
        hf = head_by_id.get(sfid)
        if hf is not None and rfid in cur and cur[rfid]["type"] != hf["type"]:
            replica.widen_column(cur[rfid]["name"], hf["type"])
            cur = rep_by_id()
    if not subscribe_new:
        return idmap
    # 4. adds: new source field ids. If a crash landed the add but not the
    # sidecar, adopt the existing same-named unclaimed column by name.
    claimed = set(idmap.values())
    for sfid, hf in head_by_id.items():
        if sfid in idmap:
            continue
        existing = [
            f for f in cur.values()
            if f["name"] == hf["name"] and int(f["id"]) not in claimed
        ]
        if existing:
            rfid = int(existing[0]["id"])
        else:
            replica.add_column(hf["name"], hf["type"])
            cur = rep_by_id()
            rfid = max(
                int(f["id"]) for f in cur.values() if f["name"] == hf["name"]
            )
        idmap[sfid] = rfid
        claimed.add(rfid)
    return idmap


def sync_replica(
    replica: LakeTable, source: LakeTable, to_version: int | None = None
) -> int:
    """Advance the replica to the source's head (or ``to_version``):
    mirror schema changes (metadata-only), mirror TRUNCATEs, ship the
    changelog slice with one idempotent MOR merge keyed by the consumed
    source version. Returns source versions consumed (0 = already
    current).

    ``to_version`` bounds one catch-up step — a replica that lagged far
    behind ships history in operator-chosen chunks (the MEM_SIZE batch
    admission analog at the lake layer) by calling this in a loop; each
    step is exactly-once on its own consumed version."""
    side = _read_sidecar(replica.path)
    synced, idmap = int(side["version"]), side["idmap"]
    row_filter, subset = side["row_filter"], side["subset"]
    head = source.current_version() if to_version is None else int(to_version)
    if head <= synced:
        return 0
    head_snap = source.snapshot(head)  # raises if expired/absent
    idmap = _mirror_schema(
        replica, idmap, head_snap.current_fields(), subscribe_new=not subset
    )
    truncs = source.truncates_between(synced, head)
    synced_from = synced
    if truncs:
        last = truncs[-1]
        replica.truncate_rows(last["lsn"])
        synced_from = last["version"]
    if synced_from < head:
        # post-mirror, the subscribed columns carry the source's head
        # names — the replica's own schema IS the output projection
        out_cols = [f["name"] for f in replica.snapshot().current_fields()]
        changes = source.scan_changes(synced_from, head).withColumn(
            "op", F.col("__op")
        ).withColumn("lsn", F.col("__lsn").cast("long"))
        replica.merge(
            _ship(changes, row_filter, list(head_snap.merge_key), out_cols),
            epoch_id=head, mode="mor", lsn_col="lsn",
        )
    _write_sidecar(replica.path, head, idmap, row_filter, subset)
    return head - synced
