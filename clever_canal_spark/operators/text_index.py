"""Persisted inverted text index: BM25 probes read ONLY the query
terms' posting buckets — never the corpus.

`text.bm25_topk` is the right shape for an ad-hoc query over a scanned
corpus: one projection pass + a 1-row stats reduce. But a retrieval
service answering many queries against a 10¹⁰-document corpus must not
re-tokenize 100 TB of text per query. This module is the incremental
shape — the third member of the index family (exact/near-dup:
`dedup_index.py`; vectors: `ann_index.py`), maintained from the lake
changelog like the other two:

- **build** (once): two LakeTables. ``postings`` (tok, doc_id, tf, dl)
  is keyed ``(tok, doc_id)`` and BUCKETED BY ``tok``, so a query's
  terms map to a handful of physical buckets and the probe reads an
  O(terms/n_buckets) fraction of the index. ``fwd`` (doc_id, toks, dl)
  is the forward index keyed by ``doc_id`` — it exists because postings
  maintenance needs each changed document's OLD token set (a doc update
  that drops a token must tombstone that posting; the changelog carries
  no before-images), and its ``dl`` column doubles as the corpus-stats
  source.
- **probe** (per query batch): ``scan_for_keys(terms)`` on postings
  (bucket-pruned); per-term df falls out of the pruned read itself;
  global (N, Σdl) reads the maintained 1-row stats view (O(1) — a full
  ``fwd.dl`` aggregate here would be the one O(corpus) read left on
  the serving path; legacy stats-less indexes still take it). Scoring
  is byte-identical to `text.bm25_topk` (same integer-exact idf-e6 /
  rational-tf arithmetic), which the tests assert by equivalence.
- **maintain** (per epoch): `sync_text_index_from_lake` tails
  ``scan_changes``. Changed docs' old token sets come from a
  bucket-pruned ``fwd.scan_for_keys_df`` read; dropped/deleted tokens
  become posting tombstones, new token counts become upserts. Postings
  merge FIRST, fwd merge LAST: a crash replays into committed epochs
  (registry no-ops) while the delta — which is derived from the OLD fwd
  state — recomputes identically until the fwd merge lands. Corpus
  stats (N, Σdl) live in a maintained 1-row agg_view over fwd (synced
  with each epoch, self-healing at probe time) — no sidecar to drift,
  and the probe's only non-bucket read is O(1), not O(corpus).

The reference engine has no text-retrieval surface — this is part of
the beyond-reference webtext-analytics layer (prompt requirement).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..ckpt import free_checkpoint as _free_checkpoint
from ..lake import LakeTable
from ._cursor import read_lake_cursor as _read_lake_cursor, write_lake_cursor as _write_lake_cursor
from .text import TOKEN_RE, bm25_contrib_sql

_SIDECAR = "index.json"

_FWD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("dl", T.IntegerType()),
    ]
)

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("tok", T.StringType(), nullable=False),
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        # 1-based token ordinals of each occurrence (sorted) — what makes
        # the index POSITIONAL: phrase probes intersect these instead of
        # falling back to a corpus scan. ~4 bytes per token occurrence,
        # the standard positional-postings overhead.
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


@dataclass
class TextIndex:
    fwd: LakeTable
    postings: LakeTable
    path: str
    # maintained 1-row corpus-stats view (n_docs, Σdl) — None on a
    # legacy (pre-stats) index, where probes fall back to the fwd scan
    stats: "LakeTable | None" = None


def _corpus_stats(index: TextIndex):
    """BM25's corpus stats (n_docs, Σdl) as a broadcast 1-row frame.

    With the maintained stats view this is an O(1) read: the view is a
    constant-group agg_view over fwd, synced by the index maintenance
    functions; the probe-side sync call is a zero-job cursor check when
    current and self-heals the crash window (fwd committed, view not)
    in one O(delta) epoch. Without it (legacy index), the old full
    ``fwd.scan()`` aggregate runs — correct, but O(corpus) input bytes
    per probe, which is exactly the read the stats view deletes from
    the serving path."""
    if index.stats is None:
        return F.broadcast(
            index.fwd.scan().agg(
                F.count("*").alias("n_docs"), F.sum("dl").alias("s_dl")
            )
        )
    from ..lake import SnapshotExpired
    from ..lake.agg_view import reseed_agg_view, sync_agg_view

    try:
        sync_agg_view(index.stats, index.fwd)
    except SnapshotExpired:
        reseed_agg_view(index.stats, index.fwd)
    return F.broadcast(
        index.stats.scan().select(
            F.col("n_rows").alias("n_docs"), F.col("sum_dl").alias("s_dl")
        )
    )


def _toks(text_col: str):
    # null text tokenizes to the empty array (size 0, not -1)
    return F.coalesce(
        F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)"),
        F.array().cast("array<string>"),
    )


def _fwd_rows(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, toks=DISTINCT sorted tokens, dl) — one per doc, empty
    docs included (they count toward N with dl=0)."""
    t = _toks(text_col)
    return df.select(
        "doc_id",
        F.sort_array(F.array_distinct(t)).alias("toks"),
        F.size(t).cast("int").alias("dl"),
    )


def _posting_rows(df: DataFrame, text_col: str) -> DataFrame:
    """(tok, doc_id, tf, dl, positions) — the corpus-shuffle explode;
    bootstrap and per-delta maintenance only, never the probe path.
    ``positions`` are 1-based token ordinals (sorted)."""
    t = _toks(text_col)
    exploded = df.select(
        "doc_id",
        F.size(t).cast("int").alias("dl"),
        F.posexplode(t).alias("pos", "tok"),
    )
    return (
        exploded.groupBy("tok", "doc_id")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.first("dl").alias("dl"),
            F.sort_array(F.collect_list(F.col("pos") + 1)).alias("positions"),
        )
        .select("tok", "doc_id", "tf", "dl", "positions")
    )


def build_text_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    n_buckets: int = 16,
) -> TextIndex:
    """Bootstrap from a (doc_id, text) corpus — the one full tokenize
    the index ever costs."""
    fwd = LakeTable.create(
        spark, os.path.join(path, "fwd"), _FWD_SCHEMA,
        merge_key=["doc_id"], n_buckets=n_buckets,
    )
    postings = LakeTable.create(
        spark, os.path.join(path, "postings"), _POSTINGS_SCHEMA,
        merge_key=["tok", "doc_id"], bucket_key=["tok"], n_buckets=n_buckets,
    )
    lsn0 = F.lit(0).cast("long")
    postings.merge(
        _posting_rows(corpus, text_col)
        .withColumn("op", F.lit("U")).withColumn("lsn", lsn0),
        epoch_id=0, op_col="op", mode="mor", lsn_col="lsn",
    )
    fwd.merge(
        _fwd_rows(corpus, text_col)
        .withColumn("op", F.lit("U")).withColumn("lsn", lsn0),
        epoch_id=0, op_col="op", mode="mor", lsn_col="lsn",
    )
    from ..lake.agg_view import create_agg_view

    stats = create_agg_view(
        fwd, os.path.join(path, "stats"), group_expr="'all'",
        value_exprs={"dl": "dl"}, n_buckets=1,
    )
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump({"n_buckets": n_buckets, "format": 2, "positional": True}, fh)
    return TextIndex(fwd=fwd, postings=postings, path=path, stats=stats)


def open_text_index(spark: SparkSession, path: str) -> TextIndex:
    with open(os.path.join(path, _SIDECAR)) as fh:
        meta = json.load(fh)
    if meta.get("format", 1) < 2:
        # format 1 postings lack the positions column — opening one
        # would fail at phrase-probe or sync time with an opaque
        # unresolved-column error; fail at open with the remedy instead
        raise ValueError(
            f"text index at {path} is format {meta.get('format', 1)} "
            "(pre-positional); rebuild it with build_text_index[_from_lake]"
        )
    stats_dir = os.path.join(path, "stats")
    return TextIndex(
        fwd=LakeTable(spark, os.path.join(path, "fwd")),
        postings=LakeTable(spark, os.path.join(path, "postings")),
        path=path,
        stats=LakeTable(spark, stats_dir)
        if os.path.isdir(stats_dir) else None,
    )


def _phrase_tf_rows(posts: DataFrame, phrase: str) -> DataFrame:
    """(term, doc_id, tf, dl) for one phrase, from POSITIONAL postings:
    per doc, intersect each word's position list — tf = |{p ∈ P₁ :
    p+j-1 ∈ Pⱼ ∀j}|, the overlapping start count, exactly the corpus
    path's slice-count semantics. L−1 doc_id equi-joins over the
    already-pruned posting rows; a doc missing any word drops out (tf
    would be 0)."""
    words = phrase.split()
    base = posts.where(F.col("tok") == words[0]).select(
        "doc_id", "dl", F.col("positions").alias("p0")
    )
    for j, w in enumerate(words[1:], start=1):
        base = base.join(
            posts.where(F.col("tok") == w).select(
                "doc_id", F.col("positions").alias(f"p{j}")
            ),
            "doc_id",
        )
    L = len(words)

    def _starts(p):
        cond = F.lit(True)
        for j in range(1, L):
            cond = cond & F.array_contains(F.col(f"p{j}"), p + j)
        return cond

    tf = F.size(F.filter(F.col("p0"), _starts)).cast("int")
    return base.select(
        F.lit(phrase).alias("term"), "doc_id", tf.alias("tf"), "dl"
    ).where(F.col("tf") > 0)


def probe_bm25(index: TextIndex, terms: list[str], k: int = 25) -> DataFrame:
    """Top-k BM25 over the index — scoring arithmetic byte-identical to
    `text.bm25_topk` (k1=6/5, b=3/4, idf quantized at e6, per-term
    contributions rounded at e6 and summed as BIGINT), so the two paths
    return identical rows on the same corpus state. PHRASE terms
    (whitespace-separated) are served from the positional postings —
    per-word position-list intersection reproduces the corpus path's
    overlapping start count without touching any text.

    Reads: the query words' posting buckets (``scan_for_keys`` — bucket
    + file-range pruned; a phrase reads its words' buckets) and the
    1-row corpus-stats view (``_corpus_stats`` — O(1); the fwd
    aggregate only on legacy stats-less indexes). A term with no
    postings simply contributes nothing — matching the corpus path,
    where df=0 forces tf=0 everywhere."""
    if not terms:
        raise ValueError("probe_bm25 needs at least one query term")
    terms = [" ".join(t.split()) for t in terms]
    if any(not t for t in terms):
        raise ValueError("query terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("query terms must be distinct")
    unigrams = [t for t in terms if " " not in t]
    phrases = [t for t in terms if " " in t]
    words = sorted({w for ph in phrases for w in ph.split()} | set(unigrams))
    stats = _corpus_stats(index)
    posts = index.postings.scan_for_keys(words)
    tf_parts = []
    if unigrams:
        tf_parts.append(
            posts.where(F.col("tok").isin(unigrams)).select(
                F.col("tok").alias("term"), "doc_id", "tf", "dl"
            )
        )
    for ph in phrases:
        tf_parts.append(_phrase_tf_rows(posts, ph))
    tfs = tf_parts[0]
    for part in tf_parts[1:]:
        tfs = tfs.unionByName(part)
    dfs = tfs.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tfs.join(F.broadcast(dfs), "term")
        .crossJoin(stats)
        .select(
            "doc_id",
            "dl",
            F.expr(bm25_contrib_sql("tf", "df", "dl")).alias("contrib_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"), F.sum("contrib_e6").alias("score_e6"))
        .where(F.col("score_e6") > 0)
        .orderBy(F.col("score_e6").desc(), F.col("doc_id"))
        .limit(k)
    )




def apply_text_index_changes(
    index: TextIndex,
    changes: DataFrame,
    text_col: str = "text",
    epoch_id: int | None = None,
) -> None:
    """Maintain the index from a CDC-style change batch — (doc_id, text,
    op, lsn), op ∈ {I,U,D} (I≡U; text may be null for D).

    Intra-batch LWW first, then the old token set for every touched doc
    comes from ONE bucket-pruned ``fwd.scan_for_keys_df`` read. Posting
    rows: upserts for every token of a live doc's new text, tombstones
    for dropped tokens (old ∖ new) and for every token of a deleted
    doc. Merge order is postings FIRST, fwd LAST — the delta derives
    from the OLD fwd state, so a crash between the two merges recomputes
    it identically on replay (the committed postings epoch no-ops)."""
    w0 = (
        changes.groupBy("doc_id")
        .agg(F.max_by(F.struct(text_col, "op", "lsn"), F.col("lsn")).alias("__w"))
        .select("doc_id", f"__w.{text_col}", "__w.op", "__w.lsn")
        # materialize the winners BEFORE scan_for_keys_df's bucket-id
        # collect — otherwise the changelog read + LWW agg would run for
        # the collect AND again for every downstream use
        .localCheckpoint()
    )
    old = index.fwd.scan_for_keys_df(w0.select("doc_id")).select(
        "doc_id", F.col("toks").alias("old_toks")
    )
    # second materialization: both merges below derive from this join, and
    # without it each would re-read the fwd buckets; it also pins the
    # PRE-merge fwd state for the fwd merge's own source, independent of
    # evaluation order
    w = (
        w0.join(old, "doc_id", "left")
        .withColumn(
            "old_toks", F.coalesce("old_toks", F.array().cast("array<string>"))
        )
        .localCheckpoint()
    )
    live = w.filter(F.col("op") != "D")
    dead = w.filter(F.col("op") == "D")

    new_posts = _posting_rows(live.select("doc_id", text_col), text_col).join(
        w.select("doc_id", "lsn"), "doc_id"
    ).select("tok", "doc_id", "tf", "dl", "positions",
             F.lit("U").alias("op"), "lsn")
    dropped = live.select(
        "doc_id", "lsn",
        F.explode(
            F.array_except("old_toks", F.array_distinct(_toks(text_col)))
        ).alias("tok"),
    )
    erased = dead.select("doc_id", "lsn", F.explode("old_toks").alias("tok"))
    tombstones = dropped.unionByName(erased).select(
        "tok", "doc_id",
        F.lit(None).cast("int").alias("tf"), F.lit(None).cast("int").alias("dl"),
        F.lit(None).cast("array<int>").alias("positions"),
        F.lit("D").alias("op"), "lsn",
    )
    index.postings.merge(
        new_posts.unionByName(tombstones),
        epoch_id=epoch_id, op_col="op", mode="mor", lsn_col="lsn",
    )

    fwd_src = _fwd_rows(live.select("doc_id", text_col), text_col).join(
        w.select("doc_id", "lsn"), "doc_id"
    ).select("doc_id", "toks", "dl", F.lit("U").alias("op"), "lsn").unionByName(
        dead.select(
            "doc_id",
            F.lit(None).cast("array<string>").alias("toks"),
            F.lit(None).cast("int").alias("dl"),
            F.lit("D").alias("op"), "lsn",
        )
    )
    index.fwd.merge(fwd_src, epoch_id=epoch_id, op_col="op", mode="mor", lsn_col="lsn")
    # keep the corpus-stats view current so PROBES stay pure readers
    # (their own sync call is then a zero-job cursor check); a crash
    # between the fwd merge and this sync self-heals at the next probe
    if index.stats is not None:
        from ..lake.agg_view import sync_agg_view

        sync_agg_view(index.stats, index.fwd)
    # release both checkpoints' storage blocks — a per-micro-batch sync
    # must not accumulate them until GC (ckpt.py)
    _free_checkpoint(w0)
    _free_checkpoint(w)


def sync_text_index_from_lake(
    index: TextIndex,
    table: LakeTable,
    text_col: str = "text",
    doc_id_expr=None,
) -> int:
    """Tail a LakeTable's changelog into the text index — same contract
    as `dedup_index.sync_from_lake`: file-diff changelog read, stable
    ``doc_id`` from the merge key (``xxhash64`` default), ONE index
    epoch keyed by the consumed lake version (exactly-once via the merge
    registry), TRUNCATE mirrored as metadata. Returns lake versions
    consumed (0 = already current)."""
    head = table.current_version()
    synced = _read_lake_cursor(index.path)
    if head <= synced:
        return 0
    truncs = table.truncates_between(synced, head)
    if truncs:
        last = truncs[-1]
        index.postings.truncate_rows(last["lsn"])
        index.fwd.truncate_rows(last["lsn"])
        synced_from = last["version"]
        if synced_from >= head:
            _write_lake_cursor(index.path, head)
            return head - synced
    else:
        synced_from = synced
    snap = table.snapshot(head)
    did = doc_id_expr if doc_id_expr is not None else F.xxhash64(*snap.merge_key)
    changes = table.scan_changes(synced_from, head).select(
        did.alias("doc_id"),
        F.col(text_col).alias(text_col),
        F.col("__op").alias("op"),
        F.col("__lsn").alias("lsn"),
    )
    apply_text_index_changes(index, changes, text_col=text_col, epoch_id=head)
    _write_lake_cursor(index.path, head)
    return head - synced


def build_text_index_from_lake(
    table: LakeTable,
    path: str,
    text_col: str = "text",
    doc_id_expr=None,
    n_buckets: int = 16,
) -> TextIndex:
    """Bootstrap from a lake table's CURRENT state and stamp the cursor
    so the first sync starts from this snapshot."""
    head = table.current_version()
    snap = table.snapshot(head)
    did = doc_id_expr if doc_id_expr is not None else F.xxhash64(*snap.merge_key)
    corpus = table.scan(version=head).select(did.alias("doc_id"), F.col(text_col))
    idx = build_text_index(
        table.spark, corpus, path, text_col=text_col, n_buckets=n_buckets
    )
    _write_lake_cursor(path, head)
    return idx


def probe_bm25_batch(
    index: TextIndex,
    queries: list[tuple[int, list[str]]],
    k: int = 25,
) -> DataFrame:
    """Batched BM25: N (query_id, terms) pairs per probe — the text
    analog of `ann_index.ann_indexed_topk`'s batch contract. The term
    UNION across the batch drives ONE bucket-pruned postings read; a
    LOCAL (query_id, tok) DataFrame broadcast-joins candidates to their
    queries; per-term df and the 1-row corpus stats are shared by every
    query in the batch (df is a corpus property, not a query property).
    Per-query top-k is a window rank — each row equals what the
    single-query `probe_bm25` would return (equivalence-tested).
    Output: (query_id, doc_id, dl, score_e6)."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("probe_bm25_batch needs at least one query")
    queries = [(qid, [" ".join(t.split()) for t in terms])
               for qid, terms in queries]
    for qid, terms in queries:
        if not terms or any(not t for t in terms):
            raise ValueError(f"query {qid}: terms must be non-empty")
        if len(set(terms)) != len(terms):
            raise ValueError(f"query {qid}: terms must be distinct")
        if any(" " in t for t in terms):
            raise ValueError(f"query {qid}: the batch probe is "
                             "unigram-only; phrase queries go through "
                             "probe_bm25 / text.bm25_topk")
    pairs = [(int(qid), t) for qid, terms in queries for t in terms]
    if len(set(pairs)) != len(pairs):
        # a repeated query_id re-listing a term would double-count that
        # term's contribution through the qmap join — refuse loudly
        raise ValueError("duplicate (query_id, term) across batch entries")
    spark = index.fwd.spark
    union_terms = sorted({t for _, t in pairs})
    qmap = F.broadcast(
        spark.createDataFrame(pairs, "query_id bigint, tok string")
    )
    stats = _corpus_stats(index)
    posts = index.postings.scan_for_keys(union_terms)
    dfs = posts.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        posts.join(qmap, "tok")
        .join(F.broadcast(dfs), "tok")
        .crossJoin(stats)
        .select(
            "query_id",
            "doc_id",
            "dl",
            F.expr(bm25_contrib_sql("tf", "df", "dl")).alias("contrib_e6"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.first("dl").alias("dl"), F.sum("contrib_e6").alias("score_e6"))
        .where(F.col("score_e6") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def open_or_build_text_index(table: LakeTable, path: str, **kwargs) -> TextIndex:
    """Open the index at ``path`` if its sidecar exists, else bootstrap it
    from ``table``'s current state — the one open/bootstrap decision
    every entry point (run_pipeline drain, --continuous hooks) shares."""
    if os.path.exists(os.path.join(path, _SIDECAR)):
        return open_text_index(table.spark, path)
    return build_text_index_from_lake(table, path, **kwargs)
