"""Exact GROUP-BY aggregate view with retraction-correct MIN/MAX —
the incremental-view-maintenance piece the additive rollup cannot do.

``lake/rollup.py`` maintains aggregates that are ADDITIVE over the
changelog (counts, frontier max) and therefore counts *traffic*. This
view materializes ``SELECT g, count(*), count(v), sum(v), min(v),
max(v) FROM source [WHERE p] GROUP BY g`` over the source's CURRENT
STATE — which means deletes and updates must *retract* their old
contribution. Counts and sums retract additively; MIN/MAX do not (the
aggregate is not invertible: removing the current minimum says nothing
about the runner-up). The classic maintenance algorithm (Gupta &
Mumick's bag-algebra view maintenance; Flink retract streams do the
same) is implemented here Spark-first:

1. changed keys = the changelog slice's distinct keys (O(changes));
2. per-key state diff between the PINNED endpoint versions
   (``scan_for_keys_df(version=synced/head)`` — bucket-pruned reads,
   the ``sync_cms_view`` discipline): a key contributes a −1 retraction
   of its old (group, value) and a +1 addition of its new one;
   unchanged keys cancel out and are filtered before any aggregation;
3. per-group fold onto the view's current rows (bucket-pruned
   read-modify-write): counts and sums add; MIN/MAX fold with
   ``least``/``greatest`` against the ADDED values only;
4. a group needs RE-DERIVATION exactly when a retracted value ties-or-
   beats the stored extreme (``rem_min <= stored_min`` or
   ``rem_max >= stored_max``) — only those groups re-aggregate from the
   source's live state at the head (one scan filtered by a broadcast
   semi-join on the recompute set, which is empty on the vast majority
   of syncs: deleting a non-extreme row never rescans anything);
5. groups whose row count folds to zero tombstone.

Exactness: integer-typed value expressions fold bit-exactly (the
incremental state equals a from-scratch rebuild, asserted in tests);
floating-point sums accumulate the usual re-association drift, same as
any retracting stream aggregation — prefer integer-quantized exprs
(the repo-wide *_e6 stance) when equality matters.

Scale shape: per sync the work is O(changes) + O(changed keys' rows at
both endpoints) + O(touched view buckets) + (rarely) O(rows of
recomputed groups). Nothing corpus-sized is read unless an extreme is
retracted, and then only the affected groups' rows survive the
broadcast semi-join's filter.

Null semantics match SQL aggregation: ``n_rows`` counts all live rows,
``n_vals``/``sum_val``/``min_val``/``max_val`` ignore null values;
``sum_val``/``min_val``/``max_val`` are null iff ``n_vals`` is 0. Rows
whose GROUP expression is null are excluded from the view entirely
(the group is the merge key; a null key has no row — documented
deviation from SQL's null group).

Cursor = the view's own committed-epoch registry (``rollup_cursor``),
epoch id = consumed source version: replays no-op inside ``merge``,
fresh-process reopen needs no sidecar read (the sidecar
``aggview.json`` carries only the immutable expressions).

Source-mode requirement (shared by every changelog consumer): MOR, or
COW **with** ``lsn_col``. COW re-emits of untouched co-bucketed rows
are harmless here — the per-key endpoint diff filters them out as
unchanged. A TRUNCATE in the consumed range triggers a full refresh at
the head (affected groups = all of them), like the join view's
right-side truncate.

Reference anchor: clever-canal ships raw row events to sinks
(CanalEventSink); warehouse consumers maintaining GROUP-BY dashboards
from that stream need exactly this retract-fold-or-recompute loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ckpt import free_checkpoint
from .rollup import rollup_cursor
from .table import LakeTable

_SIDECAR = "aggview.json"
_AGG_COLS = ("n_rows", "n_vals", "sum_val", "min_val", "max_val")


def _cfg_path(path: str) -> str:
    return os.path.join(path, "_log", _SIDECAR)


def _read_cfg(path: str) -> dict:
    try:
        with open(_cfg_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"{path} is not an aggregate view (no {_SIDECAR}); "
            f"create_agg_view first"
        )


def _write_cfg(path: str, cfg: dict) -> None:
    tmp = _cfg_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cfg, fh)
    os.replace(tmp, _cfg_path(path))


def _images(live: DataFrame, cfg: dict, extra: list[str] | None = None) -> DataFrame:
    """Live source rows → (extra key cols, group_key, __v), filtered and
    null-group-dropped."""
    if cfg["row_filter"] is not None:
        live = live.filter(F.coalesce(F.expr(cfg["row_filter"]), F.lit(False)))
    return live.select(
        *(extra or []),
        F.expr(cfg["group_expr"]).alias("group_key"),
        F.expr(cfg["value_expr"]).alias("__v"),
    ).filter(F.col("group_key").isNotNull())


def _aggregate(images: DataFrame) -> DataFrame:
    """(group_key, __v) rows → exact per-group aggregate rows."""
    return images.groupBy("group_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("__v").alias("n_vals"),
        F.sum("__v").alias("sum_val"),
        F.min("__v").alias("min_val"),
        F.max("__v").alias("max_val"),
    )


def create_agg_view(
    source: LakeTable,
    path: str,
    group_expr: str,
    value_expr: str,
    row_filter: str | None = None,
    n_buckets: int = 16,
) -> LakeTable:
    """Create the view and seed it from the source's current state (the
    one always-table-sized read). ``group_expr``/``value_expr`` are SQL
    over source columns; both must be deterministic (replays, reseeds
    and recomputes re-evaluate them)."""
    head = source.current_version()
    cfg = {"group_expr": group_expr, "value_expr": value_expr,
           "row_filter": row_filter}
    seed = _aggregate(_images(source.scan(version=head), cfg))
    view = LakeTable.create(
        source.spark, path, seed.schema,
        merge_key=["group_key"], n_buckets=n_buckets,
    )
    seed = seed.localCheckpoint(eager=False)
    try:
        if seed.take(1):
            view.merge(
                seed.withColumn("op", F.lit("U"))
                    .withColumn("lsn", F.lit(int(head)).cast("long")),
                epoch_id=head, op_col="op", mode="mor", lsn_col="lsn",
            )
        else:
            view.commit_epoch_marker(head)
    finally:
        free_checkpoint(seed)
    _write_cfg(path, cfg)
    return view


def open_agg_view(spark: SparkSession, path: str) -> LakeTable:
    _read_cfg(path)  # validates
    return LakeTable(spark, path)


def agg_view_config(path_or_view) -> dict:
    path = getattr(path_or_view, "path", path_or_view)
    return _read_cfg(path)


def agg_view_cursor(view: LakeTable) -> int:
    """Source version the view has consumed — zero Spark jobs."""
    return rollup_cursor(view)


def _refresh_all(view: LakeTable, source: LakeTable, cfg: dict, head: int) -> None:
    """Recompute every group at ``head``, tombstone the stale ones — one
    idempotent epoch. The truncate-mirror and retention-recovery path."""
    fresh = _aggregate(_images(source.scan(version=head), cfg))
    stale = view.scan().select("group_key").join(
        fresh.select("group_key"), on="group_key", how="left_anti"
    ).select(
        "group_key",
        *[F.lit(None).alias(c) for c in _AGG_COLS],
        F.lit("D").alias("op"),
    )
    delta = fresh.withColumn("op", F.lit("U")).unionByName(stale).withColumn(
        "lsn", F.lit(int(head)).cast("long")
    )
    res = view.merge(delta, epoch_id=head, op_col="op", mode="mor", lsn_col="lsn")
    if not res.applied or res.rows_written == 0:
        view.commit_epoch_marker(head)


def reseed_agg_view(view: LakeTable, source: LakeTable) -> int:
    """EXACT recovery after the cursor fell below snapshot retention
    (``sync_agg_view`` raises ``SnapshotExpired``): the view is a pure
    function of source state, so one full refresh at the head repairs it
    precisely. Returns the new consumed version."""
    cfg = _read_cfg(view.path)
    head = source.current_version()
    _refresh_all(view, source, cfg, head)
    return head


def sync_agg_view(
    view: LakeTable, source: LakeTable, to_version: int | None = None
) -> int:
    """Advance the view to the source head (or ``to_version`` — bounded
    catch-up) in one idempotent MOR epoch. Returns source versions
    consumed (0 = already current)."""
    cfg = _read_cfg(view.path)
    synced = rollup_cursor(view)
    head = source.current_version() if to_version is None else int(to_version)
    if head <= synced:
        return 0
    if source.truncates_between(synced, head):
        # metadata-only erasure: the changelog names no rows, affected
        # groups are unknowable from the slice — full refresh at head
        _refresh_all(view, source, cfg, head)
        return head - synced

    key = list(source.snapshot(head).merge_key)
    changed = (
        source.scan_changes(synced, head)
        .select(*key).distinct().localCheckpoint(eager=True)
    )
    try:
        old = _images(source.scan_for_keys_df(changed, version=synced), cfg, key)
        new = _images(source.scan_for_keys_df(changed, version=head), cfg, key)
        o = old.select(
            *key, F.col("group_key").alias("g_o"), F.col("__v").alias("v_o"),
            F.lit(True).alias("p_o"),
        )
        n = new.select(
            *key, F.col("group_key").alias("g_n"), F.col("__v").alias("v_n"),
            F.lit(True).alias("p_n"),
        )
        pair = o.join(n, on=key, how="full")
        unchanged = (
            F.col("p_o").isNotNull() & F.col("p_n").isNotNull()
            & F.col("g_o").eqNullSafe(F.col("g_n"))
            & F.col("v_o").eqNullSafe(F.col("v_n"))
        )
        contrib = (
            pair.filter(~unchanged)
            .select(
                F.explode(
                    F.array(
                        F.when(F.col("p_o").isNotNull(), F.struct(
                            F.col("g_o").alias("g"), F.col("v_o").alias("v"),
                            F.lit(-1).cast("long").alias("s"),
                        )),
                        F.when(F.col("p_n").isNotNull(), F.struct(
                            F.col("g_n").alias("g"), F.col("v_n").alias("v"),
                            F.lit(1).cast("long").alias("s"),
                        )),
                    )
                ).alias("c")
            )
            .filter(F.col("c").isNotNull())
            .select("c.g", "c.v", "c.s")
        )
        delta = contrib.groupBy(F.col("g").alias("group_key")).agg(
            F.sum("s").alias("dn_rows"),
            F.sum(F.when(F.col("v").isNotNull(), F.col("s")).otherwise(F.lit(0)))
             .alias("dn_vals"),
            F.sum(F.col("s") * F.col("v")).alias("dsum"),
            F.min(F.when(F.col("s") > 0, F.col("v"))).alias("add_min"),
            F.max(F.when(F.col("s") > 0, F.col("v"))).alias("add_max"),
            F.min(F.when(F.col("s") < 0, F.col("v"))).alias("rem_min"),
            F.max(F.when(F.col("s") < 0, F.col("v"))).alias("rem_max"),
        ).localCheckpoint(eager=False)
        fold = None
        try:
            if not delta.take(1):
                view.commit_epoch_marker(head)
                return head - synced
            cur = view.scan_for_keys_df(delta.select("group_key")).select(
                "group_key", *_AGG_COLS
            )
            fold = delta.join(cur, on="group_key", how="left")
            n_rows2 = F.coalesce("n_rows", F.lit(0)) + F.col("dn_rows")
            n_vals2 = F.coalesce("n_vals", F.lit(0)) + F.col("dn_vals")
            recompute = (
                F.col("rem_min").isNotNull() & F.col("min_val").isNotNull()
                & (F.col("rem_min") <= F.col("min_val"))
            ) | (
                F.col("rem_max").isNotNull() & F.col("max_val").isNotNull()
                & (F.col("rem_max") >= F.col("max_val"))
            )
            # checkpoint the fold: the recompute-set probe below and the
            # merge source both read it, and the empty-set fast path
            # must not pay the diff twice
            fold = fold.withColumn(
                "__recompute", F.coalesce(recompute, F.lit(False))
            ).localCheckpoint(eager=False)
            folded = (
                fold.filter(~F.col("__recompute"))
                .select(
                    "group_key",
                    n_rows2.alias("n_rows"),
                    n_vals2.alias("n_vals"),
                    F.when(
                        n_vals2 > 0,
                        F.coalesce("sum_val", F.lit(0)) + F.coalesce("dsum", F.lit(0)),
                    ).alias("sum_val"),
                    F.when(n_vals2 > 0, F.least("min_val", "add_min")).alias("min_val"),
                    F.when(n_vals2 > 0, F.greatest("max_val", "add_max")).alias("max_val"),
                )
            )
            ups = folded.filter(F.col("n_rows") > 0).withColumn("op", F.lit("U"))
            tomb = folded.filter(F.col("n_rows") <= 0).select(
                "group_key",
                *[F.lit(None).alias(c) for c in _AGG_COLS],
                F.lit("D").alias("op"),
            )
            rg = fold.filter(F.col("__recompute")).select("group_key")
            out = ups.unionByName(tomb)
            # gate the source scan on the recompute set actually being
            # non-empty: a lazy union would wire a full source read into
            # EVERY sync's merge plan — the empty set (the common case:
            # no extreme was retracted) must stay O(changes)
            if rg.take(1):
                rec = _aggregate(
                    _images(source.scan(version=head), cfg)
                    .join(F.broadcast(rg), on="group_key", how="left_semi")
                ).withColumn("op", F.lit("U"))
                rec_tomb = rg.join(
                    rec.select("group_key"), on="group_key", how="left_anti"
                ).select(
                    "group_key",
                    *[F.lit(None).alias(c) for c in _AGG_COLS],
                    F.lit("D").alias("op"),
                )
                out = out.unionByName(rec).unionByName(rec_tomb)
            out = out.withColumn("lsn", F.lit(int(head)).cast("long"))
            res = view.merge(out, epoch_id=head, op_col="op", mode="mor",
                             lsn_col="lsn")
            if not res.applied or res.rows_written == 0:
                view.commit_epoch_marker(head)
            return head - synced
        finally:
            free_checkpoint(fold)
            free_checkpoint(delta)
    finally:
        free_checkpoint(changed)
