"""Persisted inverted text index: build/probe/maintain lifecycle,
incremental == rebuild parity, lake-changelog sync, truncate mirroring,
exactly-once replay, and probe == corpus-path BM25 equivalence."""

import os

from pyspark.sql import functions as F, types as T

from clever_canal_spark.operators.text import bm25_topk
from clever_canal_spark.operators.text_index import (
    apply_text_index_changes,
    build_text_index,
    build_text_index_from_lake,
    open_text_index,
    probe_bm25,
    sync_text_index_from_lake,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark shuffles spark joins spark aggregates in the executor"),
    (3, "columnar storage formats parquet orc and arrow in depth"),
    (4, ""),  # empty doc: counts toward N with dl=0, no postings
]

TERMS = ["spark", "river", "parquet", "unicorn"]  # last one absent


def _state(idx):
    fwd = sorted((r["doc_id"], tuple(r["toks"]), r["dl"])
                 for r in idx.fwd.scan().collect())
    posts = sorted((r["tok"], r["doc_id"], r["tf"], r["dl"],
                    tuple(r["positions"]))
                   for r in idx.postings.scan().collect())
    return fwd, posts


def _bm25_rows(df):
    return [(r["doc_id"], r["dl"], r["score_e6"]) for r in df.collect()]


def test_probe_equals_corpus_path(spark, tmp_table_dir):
    """Index-served BM25 must be row-identical to the corpus-scan BM25
    (same integer-exact arithmetic, same N/S/df inputs — including the
    empty doc in N and an absent query term)."""
    docs = _docs(spark, CORPUS)
    idx = build_text_index(spark, docs, os.path.join(tmp_table_dir, "tidx"))
    assert _bm25_rows(probe_bm25(idx, TERMS, k=10)) == \
        _bm25_rows(bm25_topk(docs, TERMS, k=10))


def test_incremental_equals_rebuild(spark, tmp_table_dir):
    """U (token set changes entirely), D, I through the index == a
    from-scratch build on the final corpus, table-for-table."""
    inc = build_text_index(spark, _docs(spark, CORPUS),
                           os.path.join(tmp_table_dir, "inc"))
    changes = spark.createDataFrame(
        [
            (1, "entirely new words here now", "U", 10),
            (2, None, "D", 11),
            (9, "a ninth document about spark state stores", "I", 12),
        ],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    apply_text_index_changes(inc, changes, epoch_id=1)
    final = [
        (1, "entirely new words here now"),
        (3, CORPUS[2][1]),
        (4, ""),
        (9, "a ninth document about spark state stores"),
    ]
    ref = build_text_index(spark, _docs(spark, final),
                           os.path.join(tmp_table_dir, "ref"))
    assert _state(inc) == _state(ref)
    # and the probe agrees with the corpus path over the final corpus
    assert _bm25_rows(probe_bm25(inc, TERMS, k=10)) == \
        _bm25_rows(bm25_topk(_docs(spark, final), TERMS, k=10))


def test_dropped_token_is_tombstoned(spark, tmp_table_dir):
    """An update that drops a token must remove its posting — the stale
    (tok, doc) row is the classic inverted-index maintenance bug."""
    idx = build_text_index(spark, _docs(spark, CORPUS),
                           os.path.join(tmp_table_dir, "tidx2"))
    # doc 2 currently matches 'spark' with tf=3
    before = {r["doc_id"]: r["tf"] for r in
              idx.postings.scan().where(F.col("tok") == "spark").collect()}
    assert before == {2: 3}
    apply_text_index_changes(
        idx,
        spark.createDataFrame([(2, "no engine words at all", "U", 50)],
                              "doc_id bigint, text string, op string, lsn bigint"),
        epoch_id=1,
    )
    assert idx.postings.scan().where(F.col("tok") == "spark").count() == 0
    # and the probe no longer returns doc 2 for 'spark'
    assert all(r["doc_id"] != 2
               for r in probe_bm25(idx, ["spark"], k=10).collect())


def test_replay_is_noop_and_reopen(spark, tmp_table_dir):
    path = os.path.join(tmp_table_dir, "tidx3")
    idx = build_text_index(spark, _docs(spark, CORPUS), path)
    changes = spark.createDataFrame(
        [(1, "replacement body", "U", 10)],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    apply_text_index_changes(idx, changes, epoch_id=1)
    state = _state(idx)
    v = (idx.fwd.current_version(), idx.postings.current_version())
    # replay the same epoch: both merges must no-op via the registry
    apply_text_index_changes(idx, changes, epoch_id=1)
    assert (idx.fwd.current_version(), idx.postings.current_version()) == v
    # a fresh open sees the same state
    assert _state(open_text_index(spark, path)) == state


def test_sync_from_lake_tails_changelog(spark, tmp_table_dir):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTableHelper(spark, tmp_table_dir, "corpus", schema)
    table.t.append(_docs(spark, CORPUS))
    idx = build_text_index_from_lake(
        table.t, os.path.join(tmp_table_dir, "tidx4"),
        doc_id_expr=F.col("doc_id"),
    )
    changes = spark.createDataFrame(
        [
            (1, "fresh replacement text for document one", "U", 100),
            (2, None, "D", 101),
            (9, "a brand new ninth document arrives late", "I", 102),
        ],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    table.t.merge(changes, epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    assert sync_text_index_from_lake(
        idx, table.t, doc_id_expr=F.col("doc_id")) >= 1
    final = [
        (1, "fresh replacement text for document one"),
        (3, CORPUS[2][1]),
        (4, ""),
        (9, "a brand new ninth document arrives late"),
    ]
    ref = build_text_index(spark, _docs(spark, final),
                           os.path.join(tmp_table_dir, "ref4"))
    assert _state(idx) == _state(ref)
    # already current -> 0 consumed, no new index epochs
    v = (idx.fwd.current_version(), idx.postings.current_version())
    assert sync_text_index_from_lake(
        idx, table.t, doc_id_expr=F.col("doc_id")) == 0
    assert (idx.fwd.current_version(), idx.postings.current_version()) == v


def test_sync_mirrors_truncate(spark, tmp_table_dir):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTableHelper(spark, tmp_table_dir, "corpus5", schema)
    table.t.append(_docs(spark, CORPUS))
    idx = build_text_index_from_lake(
        table.t, os.path.join(tmp_table_dir, "tidx5"),
        doc_id_expr=F.col("doc_id"),
    )
    table.t.truncate_rows(200)
    table.t.merge(
        spark.createDataFrame(
            [(9, "post truncate spark document", "I", 300)],
            "doc_id bigint, text string, op string, lsn bigint"),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_text_index_from_lake(
        idx, table.t, doc_id_expr=F.col("doc_id")) >= 1
    ref = build_text_index(
        spark, _docs(spark, [(9, "post truncate spark document")]),
        os.path.join(tmp_table_dir, "ref5"))
    assert _state(idx) == _state(ref)
    # erased docs must not surface in a probe
    assert {r["doc_id"] for r in probe_bm25(idx, ["spark"], k=10).collect()} \
        == {9}


class LakeTableHelper:
    def __init__(self, spark, base, name, schema):
        from clever_canal_spark.lake import LakeTable

        self.t = LakeTable.create(
            spark, os.path.join(base, name), schema,
            merge_key=["doc_id"], n_buckets=4,
        )


def test_batch_probe_equals_single_probes(spark, tmp_table_dir):
    """Each query's rows in the batch output must equal its single-query
    probe (same scoring, same per-query top-k tie-break)."""
    from clever_canal_spark.operators.text_index import probe_bm25_batch

    idx = build_text_index(spark, _docs(spark, CORPUS),
                           os.path.join(tmp_table_dir, "tidx6"))
    queries = [(1, ["spark", "river"]), (2, ["parquet"]), (3, ["unicorn"])]
    batch = probe_bm25_batch(idx, queries, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["dl"], r["score_e6"]))
    for qid, terms in queries:
        single = _bm25_rows(probe_bm25(idx, terms, k=10))
        got = sorted(by_q.get(qid, []),
                     key=lambda t: (-t[2], t[0]))
        assert got == single, (qid, got, single)
    assert 3 not in by_q  # absent-term query returns nothing


def test_probe_reads_only_term_buckets(spark, tmp_table_dir):
    """The pruning contract, pinned via inputFiles(): a single-term probe's
    postings read must touch strictly fewer files than the full postings
    scan (terms hash to a subset of the 16 buckets)."""
    rows = [(i, f"w{i} w{i} shared") for i in range(64)]
    idx = build_text_index(spark, _docs(spark, rows),
                           os.path.join(tmp_table_dir, "tidx7"))
    all_files = set(idx.postings.scan().inputFiles())
    probe_files = set(idx.postings.scan_for_keys(["w3"]).inputFiles())
    assert probe_files and probe_files < all_files, (
        len(probe_files), len(all_files))
    # and the pruned read still finds the posting
    got = {r["doc_id"] for r in
           idx.postings.scan_for_keys(["w3"]).collect()}
    assert got == {3}


def test_batch_probe_rejects_duplicate_query_term(spark, tmp_table_dir):
    import pytest
    from clever_canal_spark.operators.text_index import probe_bm25_batch

    idx = build_text_index(spark, _docs(spark, CORPUS[:2]),
                           os.path.join(tmp_table_dir, "tidx8"))
    with pytest.raises(ValueError, match="duplicate"):
        probe_bm25_batch(idx, [(1, ["spark"]), (1, ["spark", "river"])], k=5)


def test_bm25_null_text_counts_as_empty(spark):
    """A null-text doc (the D-op convention) must behave as dl=0 — it
    counts toward N but cannot corrupt S with Spark's size(NULL) = -1."""
    rows = [(1, "cat sat", "en"), (2, None, "en"), (3, "cat", "en")]
    no_null = [(1, "cat sat", "en"), (2, "", "en"), (3, "cat", "en")]
    got = _bm25_rows(bm25_topk(
        spark.createDataFrame(rows, "doc_id bigint, text string, lang string"),
        ["cat"], k=5))
    want = _bm25_rows(bm25_topk(
        spark.createDataFrame(no_null, "doc_id bigint, text string, lang string"),
        ["cat"], k=5))
    assert got == want and len(got) == 2


def test_pipeline_sync_hook_maintains_text_index(spark, tmp_table_dir):
    """CdcPipeline(sync_hooks=...) keeps the text index in lockstep with
    the streaming sink per micro-batch; a re-drain of the same
    checkpoint syncs 0 (no double maintenance); state == from-scratch
    rebuild on the final table."""
    from clever_canal_spark.gen import FeedConfig, generate_feed
    from clever_canal_spark.model import PAGE_SCHEMA
    from clever_canal_spark.plans.apply import ApplyConfig
    from clever_canal_spark.sources import write_feed_slices
    from clever_canal_spark.streaming import CdcPipeline
    from clever_canal_spark.lake import LakeTable

    src = os.path.join(tmp_table_dir, "feed6")
    cfgf = FeedConfig(n_events=300, n_urls=25, seed=13)
    write_feed_slices(generate_feed(spark, cfgf), src, n_slices=2,
                      n_events=cfgf.n_events)
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "pages6"), PAGE_SCHEMA,
        merge_key=["url", "warc_ts"], n_buckets=4,
    )
    idx = build_text_index_from_lake(
        table, os.path.join(tmp_table_dir, "tidx6s"))
    pipe = CdcPipeline(
        spark, src, os.path.join(tmp_table_dir, "ck6"), table,
        ApplyConfig(merge_mode="mor", transform=False),
        max_files_per_trigger=1,
        sync_hooks=(lambda t: sync_text_index_from_lake(idx, t),),
    )
    pipe.run_until_drained()
    assert sync_text_index_from_lake(idx, table) == 0  # already at head
    ref = build_text_index_from_lake(
        table, os.path.join(tmp_table_dir, "ref6s"))
    assert _state(idx) == _state(ref)
    # re-drain: no new epochs, index untouched
    v = (idx.fwd.current_version(), idx.postings.current_version())
    pipe.run_until_drained()
    assert (idx.fwd.current_version(), idx.postings.current_version()) == v


def test_phrase_probe_equals_corpus_path(spark, tmp_table_dir):
    """Positional postings serve phrases: probe == corpus path,
    including the overlapping-start case and after an update that
    shifts positions."""
    rows = [(9, "a a a"), (7, "x a a y"), (8, "b c d"),
            (1, "spark joins spark joins spark")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = build_text_index(spark, docs, os.path.join(tmp_table_dir, "ptidx"))
    for terms in (["a a"], ["spark joins", "b"], ["joins spark", "a a", "d"]):
        a = _bm25_rows(bm25_topk(docs, terms, k=10))
        b = _bm25_rows(probe_bm25(idx, terms, k=10))
        assert a == b, (terms, a, b)
    # update shifts doc 9's positions; maintained index must re-agree
    changes = spark.createDataFrame(
        [(9, "z z a a", "U", 5)],
        "doc_id bigint, text string, op string, lsn bigint")
    apply_text_index_changes(idx, changes, epoch_id=1)
    final = [(9, "z z a a"), (7, "x a a y"), (8, "b c d"),
             (1, "spark joins spark joins spark")]
    fdocs = spark.createDataFrame(final, "doc_id bigint, text string")
    assert _bm25_rows(probe_bm25(idx, ["a a"], k=10)) == \
        _bm25_rows(bm25_topk(fdocs, ["a a"], k=10))


def test_corpus_stats_view_o1_and_self_healing(spark, tmp_table_dir):
    """The maintained stats view: probe-side stats read O(1) files (never
    fwd data), equality with the full-scan legacy fallback, and
    self-healing of the crash window (fwd committed, view not)."""
    import os

    from pyspark.sql import functions as F

    from clever_canal_spark.operators.text_index import (
        TextIndex, _corpus_stats, build_text_index, open_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc {i} " + "pad " * i) for i in range(30)],
        "doc_id long, text string",
    )
    path = os.path.join(tmp_table_dir, "tidx")
    build_text_index(spark, docs, path, n_buckets=4)
    idx = open_text_index(spark, path)
    assert idx.stats is not None

    stats = _corpus_stats(idx).collect()[0]
    legacy = TextIndex(fwd=idx.fwd, postings=idx.postings, path=idx.path)
    full = _corpus_stats(legacy).collect()[0]
    assert (stats["n_docs"], stats["s_dl"]) == (full["n_docs"], full["s_dl"])

    # O(1) read: the stats frame touches only the stats view's files
    read = set(_corpus_stats(idx).inputFiles())
    fwd_files = {f for f in idx.fwd.scan().inputFiles()}
    assert read and not (read & fwd_files)

    # crash window: a fwd commit WITHOUT the view sync (direct merge
    # bypasses apply_text_index_changes) — next stats read self-heals
    idx.fwd.merge(
        spark.createDataFrame([(999, ["zz"], 7, "U", 1)],
                              "doc_id long, toks array<string>, dl int, "
                              "op string, lsn long"),
        epoch_id=777, op_col="op", mode="mor", lsn_col="lsn",
    )
    healed = _corpus_stats(idx).collect()[0]
    assert healed["n_docs"] == stats["n_docs"] + 1
    assert healed["s_dl"] == stats["s_dl"] + 7
