"""Incrementally-maintained JOIN view — two CDC tables kept joined.

Every other maintained view here aggregates ONE source's changelog
(rollup, HLL/CMS/histogram sketches). The join view maintains the other
staple: a fact table ENRICHED by a dimension table, both CDC-fed — the
materialized ``orders ⋈ customers`` every warehouse keeps. The reference
ships each table's stream separately and leaves the join to the client
(one MQ topic per subscribed table, CanalMQProducer); here the joined
state is a first-class lake table the engine keeps in lockstep with
BOTH sources' changelogs.

Shape and contract:

- The join is **many-to-one enrichment**: the view is keyed by the LEFT
  table's merge key, and the join columns must be exactly the RIGHT
  table's merge key (each left row matches ≤1 right row). That is the
  join whose incremental maintenance needs no join-state explosion;
  arbitrary m:n stream joins are out of scope by design.
- ``how='inner'`` drops unmatched left rows from the view (and a right
  delete removes its left rows); ``how='left'`` keeps them with null
  right payload.
- Maintenance is **recompute-based, not algebraic**: each sync
  recomputes exactly the AFFECTED left keys against the two sources'
  pinned head versions, so the apply is idempotent — re-emitted rows
  (COW rewrites, replays) cost extra work, never wrong results. The
  additive views must be MOR-fed; this one merely prefers it.

Per sync, with L = left changes and R = right changes since the cursor:

1. affected = keys(L) ∪ keys(left@lv2 whose join cols hit keys(R)) —
   the right-delta probe is a SEMI join against the (broadcast) changed
   right keys; the left scan it probes prunes like any lake scan, and
   O(affected) bounds everything downstream.
2. recomputed = left@lv2 ⋈ right@rv2, semi-joined to affected.
3. upserts = recomputed; deletes = affected ∖ recomputed (covers left
   deletes in both modes and right deletes under ``inner``). Join-view
   tombstones carry no pre-image (null payload).
4. ONE ``merge(epoch_id=encode(lv2, rv2), mode='mor')`` — both cursors
   commit atomically with the data in the view's own epoch registry
   (crash replay lands in a registered epoch and no-ops).

Two-source cursor: the registry's epoch id is ``lv·2³¹ + rv``. Both
cursors only advance, so the encoding is monotone and
``join_view_cursor`` is just a decode of the registry max (same
watermark-collapse behavior as ``rollup_cursor``).

Reference mapping: the client-side join this replaces is the consumer
pattern over CanalMQProducer topics (one FlatMessage stream per table);
Canal itself has no cross-table materialization surface.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession, functions as F, types as T

from ..ckpt import free_checkpoint as _free_checkpoint
from .table import LakeTable

_CFG_NAME = "joinview.json"
_SHIFT = 1 << 31


def _cfg_path(view: LakeTable) -> str:
    return f"{view._log_path}/{_CFG_NAME}"


def join_view_config(view: LakeTable) -> dict:
    """The persisted join spec (``{"on": {...}, "how": ..., ...}``)."""
    return json.loads(view._fs.read_text(_cfg_path(view)))


def _encode(lv: int, rv: int) -> int:
    return int(lv) * _SHIFT + int(rv)


def join_view_cursor(view: LakeTable) -> tuple[int, int]:
    """(left, right) lake versions this view has consumed — decoded from
    the view's own committed-epoch registry (atomic with each merge)."""
    snap = view.snapshot()
    enc = max(
        (int(e) for e in snap.committed_epochs),
        default=max(snap.epoch_watermark, 0),
    )
    return enc // _SHIFT, enc % _SHIFT


def _normalize_on(on, right_key: list[str]) -> dict[str, str]:
    if isinstance(on, dict):
        m = {str(k): str(v) for k, v in on.items()}
    else:
        m = {str(c): str(c) for c in on}
    if sorted(m.values()) != sorted(right_key):
        raise ValueError(
            f"join columns must be exactly the right table's merge key "
            f"{right_key} (got {sorted(m.values())}) — the view maintains "
            "many-to-one enrichment, not arbitrary joins"
        )
    return m


def create_join_view(
    spark: SparkSession,
    path: str,
    left: LakeTable,
    right: LakeTable,
    on,
    how: str = "inner",
    right_cols: list[str] | None = None,
    n_buckets: int | None = None,
) -> LakeTable:
    """An empty join view over ``left ⋈ right``.

    ``on``: left join columns — a list (same names both sides) or a
    ``{left_col: right_col}`` mapping; must cover exactly the right
    table's merge key. ``right_cols``: right payload columns to carry
    (default: all non-key); names must not collide with left columns.
    The view is keyed by the left merge key and bucketed like the left
    table by default, so left-driven syncs land in the same buckets the
    left table's own changes hash into."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    lsnap, rsnap = left.snapshot(), right.snapshot()
    m = _normalize_on(on, list(rsnap.merge_key))
    lfields = lsnap.current_fields()
    lnames = [f["name"] for f in lfields]
    for lc in m:
        if lc not in lnames:
            raise ValueError(f"unknown left join column {lc!r}")
    rfields = {f["name"]: f for f in rsnap.current_fields()}
    payload = (
        list(right_cols)
        if right_cols is not None
        else [n for n in rfields if n not in set(m.values())]
    )
    for rc in payload:
        if rc not in rfields:
            raise ValueError(f"unknown right column {rc!r}")
        if rc in set(rsnap.merge_key):
            raise ValueError(f"right key column {rc!r} cannot be payload")
        if rc in lnames:
            raise ValueError(
                f"right payload column {rc!r} collides with a left column — "
                "rename one side or exclude it via right_cols"
            )
    schema = T.StructType(
        [
            T.StructField(f["name"], T.DataType.fromDDL(f["type"]))
            for f in lfields
        ]
        + [
            T.StructField(n, T.DataType.fromDDL(rfields[n]["type"]))
            for n in payload
        ]
    )
    view = LakeTable.create(
        spark,
        path,
        schema,
        merge_key=list(lsnap.merge_key),
        n_buckets=n_buckets if n_buckets is not None else lsnap.n_buckets,
    )
    view._fs.write_text_exclusive(
        _cfg_path(view),
        json.dumps({"kind": "join", "on": m, "how": how, "right_cols": payload}),
    )
    return view


def sync_join_view(
    view: LakeTable,
    left: LakeTable,
    right: LakeTable,
    to_left: int | None = None,
    to_right: int | None = None,
    broadcast_key_limit: int = 5_000_000,
) -> tuple[int, int]:
    """Advance the view to both sources' heads (or pinned versions);
    returns (left, right) versions consumed — (0, 0) = already current.

    Recompute-based and therefore idempotent per affected key: correct
    whether the sources are MOR- or COW-fed (COW re-emits only inflate
    the affected set). A source whose early changelog is past retention
    raises SnapshotExpired on the first sync — seed with
    :func:`bootstrap_join_view` instead.

    ``broadcast_key_limit``: the right-delta probe broadcasts the changed
    right keys only while their count (one O(changes) count job) stays at
    or under this; above it the probe falls back to a shuffle semi-join —
    the same no-OOM-cliff guard the apply path's winner join uses
    (plans/apply.py broadcast_winner_limit)."""
    cfg = join_view_config(view)
    m: dict[str, str] = cfg["on"]
    how: str = cfg["how"]
    payload: list[str] = cfg["right_cols"]
    lv2 = left.current_version() if to_left is None else int(to_left)
    rv2 = right.current_version() if to_right is None else int(to_right)
    lv1, rv1 = join_view_cursor(view)
    if lv2 < lv1 or rv2 < rv1:
        raise ValueError(
            f"target versions ({lv2}, {rv2}) behind cursor ({lv1}, {rv1})"
        )
    if (lv2, rv2) == (lv1, rv1):
        return (0, 0)
    enc = _encode(lv2, rv2)
    vsnap = view.snapshot()
    lkey = list(vsnap.merge_key)
    jcols = list(m)

    # schema-divergence guard: the view's columns were fixed at create;
    # a source rename/drop since then would otherwise surface as an
    # opaque UNRESOLVED_COLUMN deep in the sync plan. Source ADDs are
    # fine (the select below projects them away).
    vcols_all = {f["name"] for f in vsnap.current_fields()}
    lnames = {f["name"] for f in left.snapshot(lv2).current_fields()}
    rnames = {f["name"] for f in right.snapshot(rv2).current_fields()}
    missing_l = sorted((vcols_all - set(payload)) - lnames)
    missing_r = sorted(
        [c for c in payload if c not in rnames]
        + [m[lc] for lc in jcols if m[lc] not in rnames]
    )
    if missing_l or missing_r:
        raise ValueError(
            f"source schema diverged from the view's: left is missing "
            f"{missing_l}, right is missing {missing_r} — a source column "
            "the view carries was renamed or dropped; recreate the view "
            "(or re-add the column) before syncing"
        )

    left_at = left.scan(version=lv2)
    parts = []
    aux: list = []
    # TRUNCATE mirroring: a source truncate is metadata-only upstream (no
    # D markers in the changelog — truncates_between docstring), so mirror
    # it as metadata here. LEFT truncate: every view row derives from a
    # now-gone left row — empty the view (idempotent by its watermark;
    # enc-1 never gates the upcoming merge, whose lsn is enc) and tail
    # left changes from the truncate version only. RIGHT truncate: every
    # row's enrichment is stale — affected = ALL live left keys (the
    # recompute-from-scratch fallback; deliberate, a dimension truncate is
    # rare and corpus-sized by nature).
    l_truncs = left.truncates_between(lv1, lv2) if lv2 > lv1 else []
    r_truncs = right.truncates_between(rv1, rv2) if rv2 > rv1 else []
    lv_from = lv1
    if l_truncs:
        view.truncate_rows(enc - 1)
        lv_from = l_truncs[-1]["version"]
    if r_truncs:
        parts.append(left_at.select(*lkey))
    if lv2 > lv_from:
        parts.append(left.scan_changes(lv_from, lv2).select(*lkey))
    if rv2 > rv1 and not r_truncs:
        # changed right keys, renamed to the left join-column names; the
        # per-sync right delta is O(changes) — broadcast for the probe,
        # guarded so a bootstrap-scale right range cannot OOM the driver
        # (falls back to a shuffle semi-join). The guard reads the range's
        # FILE-STAT row total first (O(metadata), zero jobs — an upper
        # bound on distinct keys, so under-the-limit is always
        # broadcast-safe); only a stats-less range pays an exact count().
        rkeys = (
            right.scan_changes(rv1, rv2)
            .select(*[F.col(m[lc]).alias(lc) for lc in jcols])
            .distinct()
            .localCheckpoint(eager=False)
        )
        aux.append(rkeys)
        hint = right.changed_rows_hint(rv1, rv2)
        n_keys = hint if hint is not None else rkeys.count()
        probe = (
            F.broadcast(rkeys) if n_keys <= broadcast_key_limit else rkeys
        )
        parts.append(
            left_at.join(probe, on=jcols, how="left_semi").select(*lkey)
        )
    if not parts:
        # the whole range was a left truncate with nothing after it —
        # the view is already emptied; advance the cursor metadata-only
        view.commit_epoch_marker(enc)
        return (lv2 - lv1, rv2 - rv1)
    affected = parts[0]
    for p in parts[1:]:
        affected = affected.unionByName(p)
    affected = affected.distinct().localCheckpoint(eager=False)
    try:
        if not affected.take(1):
            view.commit_epoch_marker(enc)
            return (lv2 - lv1, rv2 - rv1)
        # right side renamed to left join names so the equi-join and the
        # view schema line up; payload columns keep their right names
        right_at = right.scan(version=rv2).select(
            *[F.col(m[lc]).alias(lc) for lc in jcols], *payload
        )
        recomputed = (
            left_at.join(affected, on=lkey, how="left_semi")
            .join(right_at, on=jcols, how=how)
        )
        vcols = [f["name"] for f in vsnap.current_fields()]
        upserts = recomputed.select(
            *vcols, F.lit("U").alias("op")
        )
        types = {f["name"]: f["type"] for f in vsnap.current_fields()}
        deletes = affected.join(
            recomputed.select(*lkey), on=lkey, how="left_anti"
        ).select(
            *[
                F.col(c) if c in lkey else F.lit(None).cast(types[c]).alias(c)
                for c in vcols
            ],
            F.lit("D").alias("op"),
        )
        src = upserts.unionByName(deletes).withColumn(
            "lsn", F.lit(enc).cast("long")
        )
        view.merge(src, epoch_id=enc, op_col="op", mode="mor", lsn_col="lsn")
        return (lv2 - lv1, rv2 - rv1)
    finally:
        _free_checkpoint(affected)
        for a in aux:
            _free_checkpoint(a)


def bootstrap_join_view(
    view: LakeTable, left: LakeTable, right: LakeTable
) -> tuple[int, int]:
    """Seed an EMPTY join view from both sources' CURRENT state — the
    snapshot-then-tail path when a source's early changelog is past
    retention (the two-source analog of ``_viewsync.bootstrap_view``).
    Returns the (left, right) versions captured; (0, 0) = already
    consuming (idempotent reopen)."""
    lv, rv = join_view_cursor(view)
    if (lv, rv) != (0, 0):
        return (0, 0)
    lv2, rv2 = left.current_version(), right.current_version()
    if lv2 <= 0 and rv2 <= 0:
        return (0, 0)
    vsnap = view.snapshot()
    if vsnap.files or vsnap.delta_files:
        raise ValueError(
            "bootstrap_join_view requires an empty view — it seeds initial state"
        )
    cfg = join_view_config(view)
    m, how, payload = cfg["on"], cfg["how"], cfg["right_cols"]
    jcols = list(m)
    enc = _encode(lv2, rv2)
    right_at = right.scan(version=rv2).select(
        *[F.col(m[lc]).alias(lc) for lc in jcols], *payload
    )
    vcols = [f["name"] for f in vsnap.current_fields()]
    seed = (
        left.scan(version=lv2)
        .join(right_at, on=jcols, how=how)
        .select(*vcols, F.lit("U").alias("op"), F.lit(enc).cast("long").alias("lsn"))
        .localCheckpoint(eager=False)
    )
    try:
        if not seed.take(1):
            view.commit_epoch_marker(enc)
            return (lv2, rv2)
        view.merge(seed, epoch_id=enc, op_col="op", mode="mor", lsn_col="lsn")
        return (lv2, rv2)
    finally:
        _free_checkpoint(seed)


def join_view_lag(view: LakeTable, left: LakeTable, right: LakeTable) -> dict:
    """Zero-job staleness gauge: how many lake versions each source is
    ahead of the view's cursor (``{"left": n, "right": n}``) — the
    number a scheduler alerts on, read from three manifest logs only."""
    lv, rv = join_view_cursor(view)
    return {
        "left": max(left.current_version() - lv, 0),
        "right": max(right.current_version() - rv, 0),
    }
