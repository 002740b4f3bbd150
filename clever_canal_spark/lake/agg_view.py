"""Exact GROUP-BY aggregate view with retraction-correct MIN/MAX —
the incremental-view-maintenance piece the additive rollup cannot do.

``lake/rollup.py`` maintains aggregates that are ADDITIVE over the
changelog (counts, frontier max) and therefore counts *traffic*. This
view materializes ``SELECT g, count(*), count(v), sum(v), min(v),
max(v), ... FROM source [WHERE p] GROUP BY g`` — one or several value
expressions — over the source's CURRENT STATE, which means deletes and
updates must *retract* their old contribution. Counts and sums retract
additively; MIN/MAX do not (the aggregate is not invertible: removing
the current minimum says nothing about the runner-up). The classic
maintenance algorithm (Gupta & Mumick's bag-algebra view maintenance;
Flink retract streams do the same) is implemented here Spark-first:

1. changed keys = the changelog slice's distinct keys (O(changes));
2. per-key state diff between the PINNED endpoint versions
   (``scan_for_keys_df(version=synced/head)`` — bucket-pruned reads,
   the ``sync_cms_view`` discipline): a key contributes a −1 retraction
   of its old (group, values) and a +1 addition of its new one;
   unchanged keys cancel out and are filtered before any aggregation;
3. per-group fold onto the view's current rows (bucket-pruned
   read-modify-write): counts and sums add; MIN/MAX fold with
   ``least``/``greatest`` against the ADDED values only;
4. a group needs RE-DERIVATION exactly when a retracted value ties-or-
   beats the stored extreme of ANY value column (``rem_min <=
   stored_min`` or ``rem_max >= stored_max``) — only those groups
   re-aggregate from the source's live state at the head (one scan
   filtered by a broadcast semi-join on the recompute set, which is
   empty on the vast majority of syncs: deleting a non-extreme row
   never rescans anything);
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

Null semantics match SQL aggregation: ``n_rows`` counts all live rows;
per value column ``v``, its count/sum/min/max ignore null values and
sum/min/max are null iff the count is 0. Rows whose GROUP expression is
null are excluded from the view entirely (the group is the merge key; a
null key has no row — documented deviation from SQL's null group).

Column naming: the single-expression form (``value_expr="..."``) keeps
the legacy schema ``n_vals/sum_val/min_val/max_val``; the
multi-expression form (``value_exprs={"size": "...", "rank": "..."}``)
emits ``n_<name>/sum_<name>/min_<name>/max_<name>`` per entry.

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


def _vals(cfg: dict) -> dict[str, str]:
    """{name: expr} regardless of cfg vintage (legacy single-expr cfgs
    map to the one name 'val')."""
    if "value_exprs" in cfg:
        return dict(cfg["value_exprs"])
    return {"val": cfg["value_expr"]}


def _names(cfg: dict, k: str) -> tuple[str, str, str, str]:
    """(count, sum, min, max) column names for value ``k``."""
    if "value_exprs" in cfg:
        return (f"n_{k}", f"sum_{k}", f"min_{k}", f"max_{k}")
    return ("n_vals", "sum_val", "min_val", "max_val")


def _agg_cols(cfg: dict) -> list[str]:
    out = ["n_rows"]
    for k in _vals(cfg):
        out.extend(_names(cfg, k))
    return out


def _images(live: DataFrame, cfg: dict, extra: list[str] | None = None) -> DataFrame:
    """Live source rows → (extra key cols, group_key, __v_<k>...),
    filtered and null-group-dropped."""
    if cfg["row_filter"] is not None:
        live = live.filter(F.coalesce(F.expr(cfg["row_filter"]), F.lit(False)))
    return live.select(
        *(extra or []),
        F.expr(cfg["group_expr"]).alias("group_key"),
        *[F.expr(e).alias(f"__v_{k}") for k, e in _vals(cfg).items()],
    ).filter(F.col("group_key").isNotNull())


def _aggregate(images: DataFrame, cfg: dict) -> DataFrame:
    """(group_key, __v_<k>...) rows → exact per-group aggregate rows."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for k in _vals(cfg):
        cn, sn, mn, xn = _names(cfg, k)
        v = f"__v_{k}"
        aggs += [
            F.count(v).alias(cn), F.sum(v).alias(sn),
            F.min(v).alias(mn), F.max(v).alias(xn),
        ]
    return images.groupBy("group_key").agg(*aggs)


def create_agg_view(
    source: LakeTable,
    path: str,
    group_expr: str,
    value_expr: str | None = None,
    row_filter: str | None = None,
    n_buckets: int = 16,
    value_exprs: dict[str, str] | None = None,
) -> LakeTable:
    """Create the view and seed it from the source's current state (the
    one always-table-sized read). ``group_expr`` and the value
    expression(s) are SQL over source columns; all must be deterministic
    (replays, reseeds and recomputes re-evaluate them). Pass EITHER
    ``value_expr`` (legacy column names) OR ``value_exprs`` ({name:
    expr} — per-name column quadruples)."""
    if (value_expr is None) == (value_exprs is None):
        raise ValueError("pass exactly one of value_expr / value_exprs")
    if value_exprs is not None and not value_exprs:
        raise ValueError("value_exprs must be non-empty")
    head = source.current_version()
    cfg: dict = {"group_expr": group_expr, "row_filter": row_filter}
    if value_exprs is not None:
        bad = [k for k in value_exprs if not k.isidentifier()]
        if bad:
            raise ValueError(f"value names must be identifiers: {bad}")
        cfg["value_exprs"] = dict(value_exprs)
    else:
        cfg["value_expr"] = value_expr
    seed = _aggregate(_images(source.scan(version=head), cfg), cfg)
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


def _tombstone(cfg: dict, frame: DataFrame) -> DataFrame:
    return frame.select(
        "group_key",
        *[F.lit(None).alias(c) for c in _agg_cols(cfg)],
        F.lit("D").alias("op"),
    )


def _refresh_all(view: LakeTable, source: LakeTable, cfg: dict, head: int) -> None:
    """Recompute every group at ``head``, tombstone the stale ones — one
    idempotent epoch. The truncate-mirror and retention-recovery path."""
    fresh = _aggregate(_images(source.scan(version=head), cfg), cfg)
    stale = _tombstone(cfg, view.scan().select("group_key").join(
        fresh.select("group_key"), on="group_key", how="left_anti"
    ))
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
    vals = _vals(cfg)
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
            *key, F.col("group_key").alias("g_o"),
            *[F.col(f"__v_{k}").alias(f"vo_{k}") for k in vals],
            F.lit(True).alias("p_o"),
        )
        n = new.select(
            *key, F.col("group_key").alias("g_n"),
            *[F.col(f"__v_{k}").alias(f"vn_{k}") for k in vals],
            F.lit(True).alias("p_n"),
        )
        pair = o.join(n, on=key, how="full")
        unchanged = (
            F.col("p_o").isNotNull() & F.col("p_n").isNotNull()
            & F.col("g_o").eqNullSafe(F.col("g_n"))
        )
        for k in vals:
            unchanged = unchanged & F.col(f"vo_{k}").eqNullSafe(F.col(f"vn_{k}"))
        contrib = (
            pair.filter(~unchanged)
            .select(
                F.explode(
                    F.array(
                        F.when(F.col("p_o").isNotNull(), F.struct(
                            F.col("g_o").alias("g"),
                            *[F.col(f"vo_{k}").alias(f"v_{k}") for k in vals],
                            F.lit(-1).cast("long").alias("s"),
                        )),
                        F.when(F.col("p_n").isNotNull(), F.struct(
                            F.col("g_n").alias("g"),
                            *[F.col(f"vn_{k}").alias(f"v_{k}") for k in vals],
                            F.lit(1).cast("long").alias("s"),
                        )),
                    )
                ).alias("c")
            )
            .filter(F.col("c").isNotNull())
            .select("c.g", *[f"c.v_{k}" for k in vals], "c.s")
        )
        d_aggs = [F.sum("s").alias("dn_rows")]
        for k in vals:
            v = F.col(f"v_{k}")
            d_aggs += [
                F.sum(F.when(v.isNotNull(), F.col("s")).otherwise(F.lit(0)))
                 .alias(f"dn_{k}"),
                F.sum(F.col("s") * v).alias(f"dsum_{k}"),
                F.min(F.when(F.col("s") > 0, v)).alias(f"addmin_{k}"),
                F.max(F.when(F.col("s") > 0, v)).alias(f"addmax_{k}"),
                F.min(F.when(F.col("s") < 0, v)).alias(f"remmin_{k}"),
                F.max(F.when(F.col("s") < 0, v)).alias(f"remmax_{k}"),
            ]
        delta = contrib.groupBy(F.col("g").alias("group_key")).agg(
            *d_aggs
        ).localCheckpoint(eager=False)
        fold = None
        try:
            if not delta.take(1):
                view.commit_epoch_marker(head)
                return head - synced
            cur = view.scan_for_keys_df(delta.select("group_key")).select(
                "group_key", *_agg_cols(cfg)
            )
            fold = delta.join(cur, on="group_key", how="left")
            n_rows2 = F.coalesce("n_rows", F.lit(0)) + F.col("dn_rows")
            recompute = F.lit(False)
            for k in vals:
                _, _, mn, xn = _names(cfg, k)
                recompute = recompute | (
                    F.col(f"remmin_{k}").isNotNull() & F.col(mn).isNotNull()
                    & (F.col(f"remmin_{k}") <= F.col(mn))
                ) | (
                    F.col(f"remmax_{k}").isNotNull() & F.col(xn).isNotNull()
                    & (F.col(f"remmax_{k}") >= F.col(xn))
                )
            # checkpoint the fold: the recompute-set probe below and the
            # merge source both read it, and the empty-set fast path
            # must not pay the diff twice
            fold = fold.withColumn(
                "__recompute", F.coalesce(recompute, F.lit(False))
            ).localCheckpoint(eager=False)
            fold_cols = ["group_key", n_rows2.alias("n_rows")]
            for k in vals:
                cn, sn, mn, xn = _names(cfg, k)
                nv2 = F.coalesce(cn, F.lit(0)) + F.col(f"dn_{k}")
                fold_cols += [
                    nv2.alias(cn),
                    F.when(
                        nv2 > 0,
                        F.coalesce(sn, F.lit(0))
                        + F.coalesce(f"dsum_{k}", F.lit(0)),
                    ).alias(sn),
                    F.when(nv2 > 0, F.least(mn, f"addmin_{k}")).alias(mn),
                    F.when(nv2 > 0, F.greatest(xn, f"addmax_{k}")).alias(xn),
                ]
            folded = fold.filter(~F.col("__recompute")).select(*fold_cols)
            ups = folded.filter(F.col("n_rows") > 0).withColumn("op", F.lit("U"))
            tomb = _tombstone(cfg, folded.filter(F.col("n_rows") <= 0))
            rg = fold.filter(F.col("__recompute")).select("group_key")
            out = ups.unionByName(tomb)
            # gate the source scan on the recompute set actually being
            # non-empty: a lazy union would wire a full source read into
            # EVERY sync's merge plan — the empty set (the common case:
            # no extreme was retracted) must stay O(changes)
            if rg.take(1):
                rec = _aggregate(
                    _images(source.scan(version=head), cfg)
                    .join(F.broadcast(rg), on="group_key", how="left_semi"),
                    cfg,
                ).withColumn("op", F.lit("U"))
                rec_tomb = _tombstone(cfg, rg.join(
                    rec.select("group_key"), on="group_key", how="left_anti"
                ))
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
