"""Changelog-synced HLL sketch view — incrementally-maintained distinct
counting over the CDC stream.

The rollup view (``lake/rollup.py``) keeps ADDITIVE per-key aggregates;
this view keeps the other mergeable family a 100-TB ingest needs:
**distinct cardinality per group** — distinct urls per domain, distinct
shingles per source — where an exact COUNT(DISTINCT) would shuffle every
distinct value on every refresh. State is one dense HyperLogLog register
array per group (``operators/sketch.py``); a sync builds registers from
ONLY the new changelog rows, reads the current registers of JUST the
touched groups (bucket-pruned), element-wise-maxes, and LWW-merges back.
Per sync the work is O(changes) + O(touched buckets' view rows) — the
corpus is never rescanned.

Semantics: the estimate is **distinct items EVER SEEN** in the change
stream — a monotone statistic, which is exactly what an HLL register
supports (registers only grow). Three consequences, all deliberate:

- Deletes don't decrement (the item WAS seen); payload-derived items on
  a delete marker are null (the changelog carries no before-image) and
  are skipped — both consistent with ever-seen.
- Duplicate delivery is harmless: HLL add is idempotent, so unlike the
  additive rollup this view tolerates COW re-emits — either merge mode
  feeds it correctly.
- TRUNCATE does not reset it (same stance as the rollup: history is the
  point). Consumers needing current-state distinct counts aggregate
  ``scan()`` instead.

Exactly-once: identical contract to ``sync_rollup`` — the merge commits
under the consumed lake version in the view's own epoch registry, so a
crash between merge and cursor replays into a registered epoch and
no-ops; and because the merged registers are monotone, the
consumed-version LWW ordinal is always safe.

The sketch parameter ``b`` is persisted at create time in the view's log
directory (``sketch.json``, atomic create), so any process reopening the
view syncs with the same register geometry.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.sketch import (
    cms_add,
    cms_estimate,
    hist_add,
    hist_quantiles,
    hll_card_from_regs_expr,
    hll_merge_regs_expr,
    hll_regs_dense,
)
from .table import LakeTable

_CFG_NAME = "sketch.json"


def _cfg_path(view: LakeTable) -> str:
    return f"{view._log_path}/{_CFG_NAME}"


def hll_view_config(view: LakeTable) -> dict:
    """The persisted sketch geometry (``{"kind": "hll", "b": ...}``)."""
    return json.loads(view._fs.read_text(_cfg_path(view)))


def create_hll_view(
    spark: SparkSession,
    path: str,
    group_col: str,
    group_type: str = "string",
    b: int = 12,
    n_buckets: int = 16,
    start_after: int = 0,
) -> LakeTable:
    """An empty sketch view: one row per group carrying a dense m=2^b
    register array, keyed and physically bucketed by the group column
    (each sync's read-modify-write touches only the delta's buckets).

    ``start_after`` as in :func:`~clever_canal_spark.lake.rollup.create_rollup`:
    the lake version to begin tailing AFTER (0 = full retained history on
    first sync; pass ``table.current_version()`` for a from-now view or
    when early snapshots were expired).

    Default ``b=12`` (m=4096 registers -> ~1.6% stderr, 16 KiB/group);
    tests use small b. Raw-estimator validity floor: expected cardinality
    should exceed ~2.5*2^b (see ``operators/sketch.py``)."""
    schema = T.StructType(
        [
            T.StructField(group_col, T.DataType.fromDDL(group_type), nullable=False),
            T.StructField("regs", T.ArrayType(T.IntegerType())),
        ]
    )
    view = LakeTable.create(
        spark, path, schema, merge_key=[group_col], n_buckets=n_buckets
    )
    view._fs.write_text_exclusive(
        _cfg_path(view), json.dumps({"kind": "hll", "b": int(b)})
    )
    if start_after > 0:
        view.commit_epoch_marker(int(start_after))
    return view


def sync_hll_view(
    view: LakeTable,
    table: LakeTable,
    item_expr,
    group_expr=None,
    to_version: int | None = None,
) -> int:
    """Advance the sketch view to ``table``'s head (or ``to_version``):
    register the new changelog rows' items, element-wise-max onto the
    touched groups' current registers, merge back. Returns lake versions
    consumed (0 = already current). Cursor = the view's own max committed
    epoch id, exactly like the rollup — reopening in a fresh process
    resumes with no sidecar state.

    ``item_expr``: the value whose distinct count is tracked (a Column
    over the changelog row — e.g. the url key, or a payload expression).
    Null items (payload expressions on delete markers) are skipped.
    ``group_expr`` defaults to the view's key column by name; like the
    rollup it should derive from the source MERGE-KEY columns so delete
    markers group correctly — though here a payload-derived group merely
    skips D rows (null group filtered with null item) rather than
    corrupting counts.

    Protocol shared with the rollup/CMS/histogram views
    (``lake/_viewsync.py``); the merge ordinal is safe here even
    against COW re-emits because the register merge is monotone."""
    from ._viewsync import sync_view

    b = int(hll_view_config(view)["b"])
    m = 1 << b

    def build_delta(synced, head, vsnap):
        gcol = vsnap.merge_key[0]
        gexpr = group_expr if group_expr is not None else F.col(gcol)
        items = (
            table.scan_changes(synced, head)
            .select(gexpr.alias(gcol), item_expr.alias("__item"))
            .filter(F.col("__item").isNotNull() & F.col(gcol).isNotNull())
        )
        return hll_regs_dense(items, [gcol], "__item", b, regs_col="_d_regs"), []

    return sync_view(
        view,
        table,
        to_version,
        build_delta,
        cur_select=[("regs", "_old_regs")],
        merge_payload=lambda: [
            F.expr(hll_merge_regs_expr("_old_regs", "_d_regs", m)).alias("regs")
        ],
    )


def bootstrap_hll_view(
    view: LakeTable, table: LakeTable, item_expr, group_expr=None
) -> int:
    """Seed an empty HLL view from the source's LIVE state: register
    every live row's item at the pinned current version, stamp the
    cursor there, tail incrementally after (the snapshot-then-tail path
    for tables whose early changelog is past retention). The estimate's
    meaning becomes "distinct(live at bootstrap ∪ seen since)" — a
    floor on true ever-seen, since items whose every row was deleted
    before the bootstrap left no trace. Returns the seeded version
    (0 = view already has a cursor; a source with no live
    rows stamps a cursor marker at the current version)."""
    from ._viewsync import bootstrap_view

    b = int(hll_view_config(view)["b"])
    gcol = view.snapshot().merge_key[0]
    gexpr = group_expr if group_expr is not None else F.col(gcol)

    def build_seed(version):
        items = (
            table.scan(version=version)
            .select(gexpr.alias(gcol), item_expr.alias("__item"))
            .filter(F.col("__item").isNotNull() & F.col(gcol).isNotNull())
        )
        return hll_regs_dense(items, [gcol], "__item", b, regs_col="regs")

    return bootstrap_view(view, table, build_seed)


def create_cms_view(
    spark: SparkSession,
    path: str,
    d: int = 4,
    w: int = 1024,
    n_buckets: int = 4,
    start_after: int = 0,
) -> LakeTable:
    """An empty changelog-synced count-min view: the ADDITIVE sketch
    sibling of the HLL view — per-item NET frequency (inserts minus
    deletes) over an unbounded item domain in d*w fixed rows.

    Where the rollup keeps EXACT additive counts per group (row count =
    #distinct groups), the CMS view bounds state at d*w rows however many
    distinct items flow past — the trade a 100-TB url stream forces — and
    answers point queries with the classic one-sided error (when all true
    nets are >= 0, estimate >= truth, over by <= 2N/w w.p. 1-2^-d).

    Semantics and contract (all inherited from the sketch's LINEARITY):

    - The view counts NET KEY TRANSITIONS, decided from TABLE STATE at
      the sync range's two endpoints: a key live at the new endpoint but
      not the old adds +1, the reverse adds -1, unchanged liveness adds
      0. Deletes SUBTRACT — the turnstile property the monotone HLL
      registers cannot provide — and a key-derived ``item_expr`` tracks
      live-key frequency exactly (collisions aside) **whatever the
      change stream looks like**: an insert superseded by a delete
      inside one pre-deduped epoch (whose lone changelog marker is the
      'D'), mislabeled ops from a REPLACE-style upstream, and COW
      re-emits of surviving co-bucketed rows all net to their true
      liveness change, because liveness is read from the table, never
      inferred from op markers. ``item_expr`` MUST derive from the
      source MERGE-KEY columns (it is evaluated on the key set — the
      changelog carries no before-images, so a payload-derived item
      could not be decremented anyway).
    - Either merge mode feeds it CORRECTLY; COW merely costs more (the
      re-emitted keys enlarge the endpoint existence probes before
      netting to zero). The additive rollup/hist views remain MOR-only.
    - TRUNCATE is metadata-only and emits no changelog rows, so
      truncate-erased keys keep their counts (history stance shared
      with the rollup and HLL view — and a sketch cannot subtract keys
      it is never shown); rebuild the view after ``truncate_rows`` if
      live-exactness matters. Exact current-state counts always come
      from ``scan()``.

    Exactly-once: identical to ``sync_rollup`` — the merge commits under
    the consumed lake version in the view's own epoch registry, so crash
    replays land in a registered epoch and no-op; deltas are never
    double-added. Geometry (d, w) persists in ``sketch.json``."""
    schema = T.StructType(
        [
            T.StructField("depth", T.IntegerType(), nullable=False),
            T.StructField("slot", T.IntegerType(), nullable=False),
            T.StructField("cnt", T.LongType()),
        ]
    )
    view = LakeTable.create(
        spark, path, schema, merge_key=["depth", "slot"], n_buckets=n_buckets
    )
    view._fs.write_text_exclusive(
        _cfg_path(view), json.dumps({"kind": "cms", "d": int(d), "w": int(w)})
    )
    if start_after > 0:
        view.commit_epoch_marker(int(start_after))
    return view


def cms_view_config(view: LakeTable) -> dict:
    """The persisted sketch geometry (``{"kind": "cms", "d": ..., "w": ...}``)."""
    return json.loads(view._fs.read_text(_cfg_path(view)))


def sync_cms_view(
    view: LakeTable,
    table: LakeTable,
    item_expr,
    to_version: int | None = None,
) -> int:
    """Advance the CMS view to ``table``'s head (or ``to_version``):
    compute each changed key's NET liveness transition (+1 appeared,
    -1 disappeared, 0 unchanged) from the table's state at the range's
    two endpoint versions, sketch the non-zero transitions, add onto
    the current counts of just the touched slots (bucket-pruned
    read-modify-write), merge back. Returns lake versions consumed
    (0 = already current). Cursor = the view's own max committed epoch,
    exactly like the rollup — a fresh-process reopen resumes with no
    sidecar state.

    Why state-diff instead of trusting the I/D markers: ``apply_epoch``
    pre-dedups each epoch to one LWW winner per key, so an insert
    superseded in the same micro-batch never emits its 'I' marker —
    marker arithmetic would subtract a key that was never added. The
    endpoint reads are version-pinned ``scan_for_keys_df`` probes
    restricted to the CHANGED keys' buckets (column-pruned to the key
    columns), so per sync the work stays O(changes) + O(touched
    buckets) — the corpus is never rescanned, and both endpoint
    snapshots are already within retention by ``scan_changes``'s own
    contract. Crash replay re-reads the same pinned versions, so a
    replayed sync recomputes the identical delta and no-ops into the
    registered epoch. Protocol shared with the other maintained views
    (``lake/_viewsync.py``)."""
    from ._viewsync import sync_view

    cfg = cms_view_config(view)
    d, w = int(cfg["d"]), int(cfg["w"])
    tkey = list(table.snapshot().merge_key)

    def build_delta(synced, head, vsnap):
        keys = (
            table.scan_changes(synced, head)
            .select(*tkey)
            .distinct()
            .localCheckpoint(eager=False)
        )
        # liveness at the two pinned endpoints, restricted to the changed
        # keys (bucket-pruned; synced=0 predates the first version — the
        # before-side is empty by definition)
        in_old = (
            table.scan_for_keys_df(keys, version=synced)
            .select(*tkey, F.lit(True).alias("__in_old"))
            if synced > 0
            else keys.limit(0).select(*tkey, F.lit(True).alias("__in_old"))
        )
        in_new = table.scan_for_keys_df(keys, version=head).select(
            *tkey, F.lit(True).alias("__in_new")
        )
        trans = (
            keys.join(in_old, on=tkey, how="left")
            .join(in_new, on=tkey, how="left")
            .select(
                item_expr.alias("__item"),
                F.when(
                    F.col("__in_old").isNull() & F.col("__in_new").isNotNull(),
                    F.lit(1),
                )
                .when(
                    F.col("__in_old").isNotNull() & F.col("__in_new").isNull(),
                    F.lit(-1),
                )
                .otherwise(F.lit(0))
                .alias("__w"),
            )
            .filter((F.col("__w") != 0) & F.col("__item").isNotNull())
        )
        delta = (
            cms_add(trans, [], "__item", d, w, weight_sql="CAST(__w AS BIGINT)")
            .filter(F.col("cnt") != 0)  # net-zero slots leave state untouched
            .withColumnRenamed("cnt", "_d_cnt")
        )
        return delta, [keys]

    return sync_view(
        view,
        table,
        to_version,
        build_delta,
        cur_select=[("cnt", "cnt")],
        merge_payload=lambda: [
            (F.coalesce("cnt", F.lit(0)) + F.col("_d_cnt")).alias("cnt")
        ],
    )


def bootstrap_cms_view(view: LakeTable, table: LakeTable, item_expr) -> int:
    """Seed an empty CMS view from the source's LIVE state: +1 per live
    key at the pinned current version. Because the CMS view tracks NET
    KEY LIVENESS (state-diffed, see ``sync_cms_view``), this seed is
    REPLAY-EQUIVALENT, not an approximation: the net of any change
    history is exactly the liveness at its endpoint, so bootstrap+tail
    lands the identical sketch a full-history sync would have — the one
    member of the view family whose snapshot-then-tail path loses
    nothing. ``item_expr`` must derive from the source merge-key columns
    (the sync's decrement contract). Returns the seeded version (0 =
    view already has a cursor; a source with no live
    rows stamps a cursor marker at the current version)."""
    from ._viewsync import bootstrap_view

    cfg = cms_view_config(view)
    d, w = int(cfg["d"]), int(cfg["w"])
    tkey = list(table.snapshot().merge_key)

    def build_seed(version):
        live = (
            table.scan(version=version)
            .select(*tkey)
            .select(item_expr.alias("__item"))
            .filter(F.col("__item").isNotNull())
        )
        return cms_add(live, [], "__item", d, w).filter(F.col("cnt") != 0)

    return bootstrap_view(view, table, build_seed)


def cms_view_estimate(
    view: LakeTable, probes: DataFrame, item_col: str, out_col: str = "cms_count"
) -> DataFrame:
    """Point-query the maintained sketch for each probe row: the view's
    d*w rows are broadcast (``operators/sketch.py cms_estimate``), so the
    probe side never shuffles — and the SOURCE table is never touched."""
    cfg = cms_view_config(view)
    return cms_estimate(
        view.scan().select("depth", "slot", "cnt"),
        probes,
        item_col,
        [],
        d=int(cfg["d"]),
        w=int(cfg["w"]),
        out_col=out_col,
    )


def create_hist_view(
    spark: SparkSession,
    path: str,
    group_col: str,
    group_type: str = "string",
    n_buckets: int = 4,
    start_after: int = 0,
) -> LakeTable:
    """An empty changelog-synced log2-histogram view: per-group quantile
    state — (group, bin, n) rows, <= 64 bins per group — completing the
    maintained-view family (rollup = exact additive counts, HLL =
    distinct, CMS = frequency, this = QUANTILES). The use is per-group
    percentile gauges over a changelog-derived value (payload size,
    apply lag, doc length): ``hist_view_quantiles`` answers p50/p99 per
    group from the view alone, within the one-doubling bracket, and the
    state merges across shards/epochs by per-bin sum without revisiting
    raw values.

    Contract: ADDITIVE like the rollup and the CMS view — **the source
    must be MOR-fed** (COW re-emits would double-count), values are
    counted per CHANGELOG ROW as it flies by (history stance: deletes
    don't retract the distribution — each marker's value was observed;
    a TRUNCATE doesn't reset it), and exactly-once comes from the
    consumed-version epoch registry exactly as in ``sync_rollup``."""
    schema = T.StructType(
        [
            T.StructField(group_col, T.DataType.fromDDL(group_type), nullable=False),
            T.StructField("bin", T.IntegerType(), nullable=False),
            T.StructField("n", T.LongType()),
        ]
    )
    view = LakeTable.create(
        spark, path, schema, merge_key=[group_col, "bin"], n_buckets=n_buckets
    )
    view._fs.write_text_exclusive(
        _cfg_path(view), json.dumps({"kind": "hist"})
    )
    if start_after > 0:
        view.commit_epoch_marker(int(start_after))
    return view


def sync_hist_view(
    view: LakeTable,
    table: LakeTable,
    value_expr,
    group_expr=None,
    to_version: int | None = None,
    on_negative: str = "error",
) -> int:
    """Advance the histogram view to ``table``'s head (or ``to_version``):
    bin ONLY the new changelog rows' values, add onto the touched
    (group, bin) counts (bucket-pruned read-modify-write), merge back.
    Returns lake versions consumed. Null values (e.g. a payload
    expression on a delete marker, which carries no before-image) are
    skipped; null groups likewise — like the rollup, ``group_expr``
    should derive from merge-key columns when delete markers matter.

    ``on_negative`` decides what a NEGATIVE value does — ``hist_add``
    raises on negatives by design, and inside a streaming sync hook
    that raise is a poison pill: the micro-batch dies, the restart
    replays the same epoch, and the pipeline can never advance. A
    value that can go negative in production (a clock-skewed lag, a
    corrupt size) should pick an explicit policy:

    - ``"error"`` (default): keep hist_add's raise — right for values
      that are negative only if the pipeline itself is broken.
    - ``"clamp"``: negatives count into bin 0 (the ``<= 0`` bin) — the
      distribution keeps every observation, slightly left-biased.
    - ``"skip"``: negatives are dropped like nulls — the distribution
      is over valid observations only."""
    if on_negative not in ("error", "clamp", "skip"):
        raise ValueError(f"on_negative must be error|clamp|skip, got {on_negative!r}")
    from ._viewsync import sync_view

    def build_delta(synced, head, vsnap):
        gcol = vsnap.merge_key[0]
        gexpr = group_expr if group_expr is not None else F.col(gcol)
        rows = (
            table.scan_changes(synced, head)
            .select(gexpr.alias(gcol), value_expr.alias("__v"))
            .filter(F.col("__v").isNotNull() & F.col(gcol).isNotNull())
        )
        if on_negative == "clamp":
            rows = rows.withColumn("__v", F.greatest(F.col("__v"), F.lit(0)))
        elif on_negative == "skip":
            rows = rows.filter(F.col("__v") >= 0)
        return hist_add(rows, [gcol], "__v").withColumnRenamed("n", "_d_n"), []

    return sync_view(
        view,
        table,
        to_version,
        build_delta,
        cur_select=[("n", "n")],
        merge_payload=lambda: [
            (F.coalesce("n", F.lit(0)) + F.col("_d_n")).alias("n")
        ],
    )


def bootstrap_hist_view(
    view: LakeTable,
    table: LakeTable,
    value_expr,
    group_expr=None,
    on_negative: str = "error",
) -> int:
    """Seed an empty histogram view from the source's LIVE state: bin
    every live row's value at the pinned current version, stamp the
    cursor, tail after. The distribution's meaning becomes "live values
    at bootstrap + changelog observations since" — observations whose
    rows were superseded or deleted before the bootstrap left no trace
    (same floor caveat as the rollup seed). ``on_negative`` as in
    ``sync_hist_view``. Returns the seeded version (0 = view already
    has a cursor; a source with no live
    rows stamps a cursor marker at the current version)."""
    if on_negative not in ("error", "clamp", "skip"):
        raise ValueError(f"on_negative must be error|clamp|skip, got {on_negative!r}")
    from ._viewsync import bootstrap_view

    gcol = view.snapshot().merge_key[0]
    gexpr = group_expr if group_expr is not None else F.col(gcol)

    def build_seed(version):
        rows = (
            table.scan(version=version)
            .select(gexpr.alias(gcol), value_expr.alias("__v"))
            .filter(F.col("__v").isNotNull() & F.col(gcol).isNotNull())
        )
        if on_negative == "clamp":
            rows = rows.withColumn("__v", F.greatest(F.col("__v"), F.lit(0)))
        elif on_negative == "skip":
            rows = rows.filter(F.col("__v") >= 0)
        return hist_add(rows, [gcol], "__v")

    return bootstrap_view(view, table, build_seed)


def hist_view_quantiles(view: LakeTable, qs_permille: list[int]) -> DataFrame:
    """Per-group quantile brackets from the stored bins — a scan of the
    view only (O(groups x 64) rows), never the source table."""
    gcol = view.snapshot().merge_key[0]
    return hist_quantiles(view.scan().select(gcol, "bin", "n"), [gcol], qs_permille)


def hll_view_estimates(view: LakeTable, out_col: str = "hll_distinct") -> DataFrame:
    """Per-group cardinality estimates from the stored registers — a
    scan of the view only (O(#groups), never the source table)."""
    b = int(hll_view_config(view)["b"])
    gcol = view.snapshot().merge_key[0]
    return view.scan().select(
        gcol, F.expr(hll_card_from_regs_expr(b, "regs")).alias(out_col)
    )
