"""Column-level lineage for maintained views — which SOURCE columns
feed each VIEW column, derived from the stored expressions without
running a single Spark job.

The maintained views persist their defining SQL exprs (transform view:
``exprs`` + ``row_filter``; agg view: ``group_expr``/``value_expr``/
``row_filter``). When a source column is about to be renamed or
dropped, the operator's question is "which views break, on which
columns?" — the schema-divergence ValueError answers it only AFTER the
fact, at the next sync. This answers it up front.

Mechanism: drop-one-column probing against an EMPTY frame of the
source schema. For each expr, analyze it once against the full schema
(unresolvable exprs report ``valid=False`` — the already-broken case),
then re-analyze with each candidate column dropped: analysis failing
without a column proves the expr references it. Analysis is
driver-only Catalyst work (milliseconds, zero jobs, zero reads) and —
unlike regexing SQL text — understands quoting, case-insensitivity,
nested functions and shadowing, because it IS the resolver that will
run at sync time.

O(exprs × columns) analysis calls; both counts are schema-sized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .table import LakeTable


def expr_lineage(
    spark: SparkSession, schema, exprs: dict[str, str]
) -> dict[str, dict]:
    """``{expr_name: {"refs": [source cols], "valid": bool}}`` for SQL
    exprs over a frame of ``schema`` (a StructType)."""
    empty = spark.createDataFrame([], schema)
    cols = list(empty.columns)
    out: dict[str, dict] = {}
    for name, e in exprs.items():
        try:
            empty.select(F.expr(e))
        except Exception:
            out[name] = {"refs": [], "valid": False}
            continue
        refs = []
        for c in cols:
            try:
                empty.drop(c).select(F.expr(e))
            except Exception:
                refs.append(c)
        out[name] = {"refs": refs, "valid": True}
    return out


def _view_exprs(cfg: dict) -> dict[str, str]:
    """The named exprs a view config defines, row_filter included."""
    if "exprs" in cfg:  # transform view
        named = dict(cfg["exprs"])
    else:  # agg view
        named = {"group_key": cfg["group_expr"], "value": cfg["value_expr"]}
    if cfg.get("row_filter"):
        named["row_filter"] = cfg["row_filter"]
    return named


def view_lineage(view: LakeTable, source: LakeTable) -> dict[str, dict]:
    """Lineage of a transform or agg view against its source's CURRENT
    schema. Works for any view whose sidecar carries SQL exprs
    (``transformview.json`` / ``aggview.json``). A view column whose
    ``valid`` is False already no longer resolves — its referenced
    column was renamed/dropped since creation."""
    from .agg_view import _read_cfg as _agg_cfg
    from .transform_view import _read_cfg as _tv_cfg

    cfg = None
    for reader in (_tv_cfg, _agg_cfg):
        try:
            cfg = reader(view.path)
            break
        except ValueError:
            continue
    if cfg is None:
        raise ValueError(f"{view.path} is not a transform or aggregate view")
    schema = source.snapshot().spark_schema()
    return expr_lineage(view.spark, schema, _view_exprs(cfg))


def rename_impact(
    view: LakeTable, source: LakeTable, column: str
) -> list[str]:
    """View columns that break if ``column`` is renamed or dropped on
    the source — the pre-flight check for a DDL. Empty list = safe."""
    lin = view_lineage(view, source)
    return sorted(
        name for name, info in lin.items()
        if not info["valid"] or column in info["refs"]
    )
