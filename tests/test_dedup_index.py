"""Persisted dedup index: build/probe/maintain lifecycle, exactly-once
replay, and incremental == rebuild parity on hand-crafted docs."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.operators.dedup_index import (
    apply_dedup_index_changes,
    build_dedup_index,
    open_dedup_index,
    probe_exact,
    probe_neardup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "an entirely different document about spark shuffles and joins"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # dup of 1
    (4, "columnar storage formats parquet orc and arrow in depth"),
]


def test_probe_exact_hits_and_misses(spark, tmp_table_dir):
    idx = build_dedup_index(spark, _docs(spark, CORPUS),
                            os.path.join(tmp_table_dir, "idx"))
    batch = _docs(spark, [
        (100, CORPUS[0][1]),            # dup of docs 1 and 3
        (101, "something never seen before in the corpus at all"),
    ])
    out = {r["new_doc_id"]: r.asDict() for r in probe_exact(idx, batch).collect()}
    assert set(out) == {100}
    assert out[100]["dup_of_doc_id"] == 1 and out[100]["n_dups"] == 2


def test_probe_neardup_candidates(spark, tmp_table_dir):
    idx = build_dedup_index(spark, _docs(spark, CORPUS),
                            os.path.join(tmp_table_dir, "idx"))
    # identical text shares ALL bands with docs 1 and 3
    batch = _docs(spark, [(200, CORPUS[0][1])])
    out = {r["cand_doc_id"]: r["n_shared_bands"]
           for r in probe_neardup(idx, batch).collect()}
    assert out.get(1) == idx.n_bands and out.get(3) == idx.n_bands


def test_incremental_equals_rebuild(spark, tmp_table_dir):
    """Apply U/D/I through the index, then rebuild from the final corpus —
    both tables must match row-for-row."""
    inc = build_dedup_index(spark, _docs(spark, CORPUS),
                            os.path.join(tmp_table_dir, "inc"))
    changes = spark.createDataFrame(
        [
            (1, "doc one rewritten with wholly new words", "U", 10),
            (2, None, "D", 11),
            (9, "a new arrival about watermarks and state stores", "I", 12),
        ],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    apply_dedup_index_changes(inc, changes, epoch_id=0)
    final = [
        (1, "doc one rewritten with wholly new words"),
        (3, CORPUS[2][1]),
        (4, CORPUS[3][1]),
        (9, "a new arrival about watermarks and state stores"),
    ]
    ref = build_dedup_index(spark, _docs(spark, final),
                            os.path.join(tmp_table_dir, "ref"))

    fps_inc = sorted((r["doc_id"], r["fp"]) for r in inc.fps.scan().collect())
    fps_ref = sorted((r["doc_id"], r["fp"]) for r in ref.fps.scan().collect())
    assert fps_inc == fps_ref
    b_inc = sorted(tuple(r) for r in inc.bands.scan().collect())
    b_ref = sorted(tuple(r) for r in ref.bands.scan().collect())
    assert b_inc == b_ref


def test_replay_is_noop_and_reopen(spark, tmp_table_dir):
    path = os.path.join(tmp_table_dir, "idx")
    idx = build_dedup_index(spark, _docs(spark, CORPUS), path)
    changes = spark.createDataFrame(
        [(2, None, "D", 5)], "doc_id bigint, text string, op string, lsn bigint"
    )
    apply_dedup_index_changes(idx, changes, epoch_id=0)
    v_fps = idx.fps.current_version()
    v_bands = idx.bands.current_version()
    # crash-redelivery: the same epoch replays as a no-op on both tables
    apply_dedup_index_changes(idx, changes, epoch_id=0)
    assert idx.fps.current_version() == v_fps
    assert idx.bands.current_version() == v_bands
    # reopen from the sidecar alone
    idx2 = open_dedup_index(spark, path)
    assert idx2.n_bands == idx.n_bands
    assert idx2.fps.scan().filter(F.col("doc_id") == 2).count() == 0
    assert idx2.fps.scan().count() == 3


def test_probe_plan_broadcasts_delta(spark, tmp_table_dir):
    """Both probes must broadcast the delta side — the index scan never
    shuffles into a sort-merge join."""
    from tests.test_plans import _plan

    idx = build_dedup_index(spark, _docs(spark, CORPUS),
                            os.path.join(tmp_table_dir, "idx"))
    batch = _docs(spark, [(300, "probe text one"), (301, "probe text two")])
    for df in (probe_exact(idx, batch), probe_neardup(idx, batch)):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def _fp_state(idx):
    return sorted(
        (r.doc_id, r.fp) for r in idx.fps.scan().collect()
    )


def _band_state(idx):
    return sorted(
        (r.doc_id, r.band, r.bucket_key) for r in idx.bands.scan().collect()
    )


def test_sync_from_lake_tails_changelog(spark, tmp_table_dir):
    """CDC x webtext composition: the index bootstraps from a lake table,
    then a `sync_from_lake` after each lake merge converges to the
    from-scratch rebuild on the final corpus."""
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.model import change_event_schema  # noqa: F401
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index_from_lake, sync_from_lake,
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "corpus"), schema,
        merge_key=["doc_id"], n_buckets=4,
    )
    table.append(_docs(spark, CORPUS))

    idx = build_dedup_index_from_lake(
        table, os.path.join(tmp_table_dir, "didx"), doc_id_expr=F.col("doc_id")
    )
    assert _fp_state(idx) == _fp_state(
        build_dedup_index(spark, _docs(spark, CORPUS),
                          os.path.join(tmp_table_dir, "ref0"))
    )

    changes = spark.createDataFrame(
        [
            (1, "fresh replacement text for document one", "U", 100),
            (2, None, "D", 101),
            (9, "a brand new ninth document arrives late", "I", 102),
        ],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    table.merge(changes, epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    consumed = sync_from_lake(idx, table, doc_id_expr=F.col("doc_id"))
    assert consumed >= 1

    final = [
        (1, "fresh replacement text for document one"),
        (3, CORPUS[2][1]),
        (4, CORPUS[3][1]),
        (9, "a brand new ninth document arrives late"),
    ]
    ref = build_dedup_index(spark, _docs(spark, final),
                            os.path.join(tmp_table_dir, "ref1"))
    assert _fp_state(idx) == _fp_state(ref)
    assert {(d, b, k) for d, b, k in _band_state(idx)} == set(_band_state(ref))

    # already current -> no-op (and no new index epochs)
    v_before = (idx.fps.current_version(), idx.bands.current_version())
    assert sync_from_lake(idx, table, doc_id_expr=F.col("doc_id")) == 0
    assert (idx.fps.current_version(), idx.bands.current_version()) == v_before


def test_sync_from_lake_mirrors_truncate(spark, tmp_table_dir):
    """A feed TRUNCATE is metadata-only in the lake (no D markers in the
    changelog) — the sync must still erase the index, or a re-crawled
    page would be reported as a duplicate of an erased doc and dropped
    from the corpus silently."""
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index_from_lake, sync_from_lake,
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "corpus3"), schema,
        merge_key=["doc_id"], n_buckets=4,
    )
    table.append(_docs(spark, CORPUS))
    idx = build_dedup_index_from_lake(
        table, os.path.join(tmp_table_dir, "didx3"), doc_id_expr=F.col("doc_id")
    )
    assert table.truncates_between(0) == []
    table.truncate_rows(200)
    assert table.truncates_between(0)[-1]["lsn"] == 200
    # post-truncate re-crawl: doc 9's text matches ERASED doc 2 exactly
    table.merge(
        spark.createDataFrame(
            [(9, CORPUS[1][1], "I", 300)],
            "doc_id bigint, text string, op string, lsn bigint"),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_from_lake(idx, table, doc_id_expr=F.col("doc_id")) >= 1

    # index == from-scratch rebuild on the post-truncate corpus
    ref = build_dedup_index(spark, _docs(spark, [(9, CORPUS[1][1])]),
                            os.path.join(tmp_table_dir, "ref3"))
    assert _fp_state(idx) == _fp_state(ref)
    assert set(_band_state(idx)) == set(_band_state(ref))
    # the re-crawled text must NOT probe as a dup of the erased corpus
    batch = _docs(spark, [(50, CORPUS[0][1])])  # matches erased doc 1/3
    assert probe_exact(idx, batch).count() == 0
    # but a dup of the LIVE post-truncate doc still reports
    batch2 = _docs(spark, [(51, CORPUS[1][1])])  # matches live doc 9
    assert probe_exact(idx, batch2).count() == 1
    # replay: sync is a no-op, truncate watermark holds
    v = (idx.fps.current_version(), idx.bands.current_version())
    assert sync_from_lake(idx, table, doc_id_expr=F.col("doc_id")) == 0
    assert (idx.fps.current_version(), idx.bands.current_version()) == v


def test_sync_from_lake_truncate_at_head(spark, tmp_table_dir):
    """Truncate IS the head version when the sync runs: the index empties
    and the cursor still advances (second sync = 0)."""
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index_from_lake, sync_from_lake,
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "corpus4"), schema,
        merge_key=["doc_id"], n_buckets=4,
    )
    table.append(_docs(spark, CORPUS))
    idx = build_dedup_index_from_lake(
        table, os.path.join(tmp_table_dir, "didx4"), doc_id_expr=F.col("doc_id")
    )
    table.truncate_rows(500)
    assert sync_from_lake(idx, table, doc_id_expr=F.col("doc_id")) >= 1
    assert _fp_state(idx) == []
    assert sync_from_lake(idx, table, doc_id_expr=F.col("doc_id")) == 0


def test_sync_from_lake_default_doc_id_is_stable(spark, tmp_table_dir):
    """With no doc_id_expr, the index keys by xxhash64(merge key) — an
    update to a doc's text must overwrite its rows in place (same id)."""
    from clever_canal_spark.lake import LakeTable
    from clever_canal_spark.operators.dedup_index import (
        build_dedup_index_from_lake, sync_from_lake,
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "corpus2"), schema,
        merge_key=["doc_id"], n_buckets=4,
    )
    table.append(_docs(spark, CORPUS))
    idx = build_dedup_index_from_lake(table, os.path.join(tmp_table_dir, "didx2"))
    n0 = idx.fps.scan().count()
    table.merge(
        spark.createDataFrame([(1, "changed text", "U", 50)],
                              "doc_id bigint, text string, op string, lsn bigint"),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    sync_from_lake(idx, table)
    assert idx.fps.scan().count() == n0  # overwrite, not a second row


def test_chunk_probe_finds_shifted_copy_and_maintains(spark, tmp_table_dir):
    """The chunk signal (build_dedup_index(with_chunks=True)): a copied
    passage behind a DIFFERENT prefix probes back to its indexed source
    (invisible to the exact fp); rewriting the source tombstones its
    stale chunk rows (variable-cardinality maintenance); replay no-ops;
    probing a chunk-less index raises."""
    import pytest as _pytest

    from clever_canal_spark.operators.dedup_index import (
        apply_dedup_index_changes,
        build_dedup_index,
        open_dedup_index,
        probe_chunk_dups,
    )

    body = "".join(
        f"shared syndicated article text number {k} that reads the same on "
        "every mirror of the wire service feed and fills the page with "
        "plenty of ordinary words about weather markets and sport "
        for k in range(3)
    )
    corpus = spark.createDataFrame(
        [(1, "alpha site header before the body " + body),
         (2, "an unrelated page about cooking with garlic and lemon " * 5)],
        "doc_id bigint, text string",
    )
    idx = build_dedup_index(spark, corpus, tmp_table_dir + "/ci", with_chunks=True)
    re = open_dedup_index(spark, tmp_table_dir + "/ci")
    assert re.chunks is not None and re.chunk_min_len == 24

    batch = spark.createDataFrame(
        [(100, "completely different beta prefix " + body),
         (101, "novel content about sailing across the northern sea " * 5)],
        "doc_id bigint, text string",
    )
    pairs = {(r["new_doc_id"], r["cand_doc_id"]): r["n_shared"]
             for r in probe_chunk_dups(re, batch).collect()}
    assert set(pairs) == {(100, 1)} and pairs[(100, 1)] >= 2

    ch = spark.createDataFrame(
        [(1, "totally new text " * 20, "U", 50)],
        "doc_id bigint, text string, op string, lsn bigint",
    )
    apply_dedup_index_changes(re, ch, epoch_id=1)
    assert probe_chunk_dups(open_dedup_index(spark, tmp_table_dir + "/ci"), batch).count() == 0
    apply_dedup_index_changes(open_dedup_index(spark, tmp_table_dir + "/ci"), ch, epoch_id=1)

    plain = build_dedup_index(spark, corpus, tmp_table_dir + "/plainci")
    with _pytest.raises(ValueError, match="without chunk fingerprints"):
        probe_chunk_dups(plain, batch)
