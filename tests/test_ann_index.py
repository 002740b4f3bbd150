"""Persisted ANN index: build-once/probe-many parity with the inline
operators, file-level bucket pruning in the probe path, and the absence of
any corpus-wide assignment job at query time (VERDICT r2 items 4/5)."""

import os

from pyspark.sql import functions as F

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.operators.ann_index import (
    ann_indexed_topk,
    build_ivf_index,
    build_lsh_index,
    ivf_indexed_topk,
    open_ann_index,
)
from clever_canal_spark.operators.similarity import ann_multiprobe_topk, ivf_topk
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lsh_indexed_matches_inline(spark, tmp_table_dir):
    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_indexed_topk(idx, queries, k=20, radius=2)
    for qid in (0, 1, 2):
        inline = ann_multiprobe_topk(
            emb, emb.filter(F.col("vec_id") == qid), k=20, n_planes=4, radius=2
        )
        assert _rows(got.filter(F.col("query_id") == qid).select("vec_id", "dot_e9")) == _rows(
            inline.select("vec_id", "dot_e9")
        ), f"query {qid} diverges from inline multiprobe"


def test_lsh_probe_prunes_files(spark, tmp_table_dir):
    """A 1-query radius-0 probe must read strictly fewer index files than
    the table holds, and must never touch the corpus parquet."""
    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=8, n_buckets=16)
    all_files = {f["path"] for f in idx.vectors.lineage()}
    assert len(all_files) >= 8, "fixture too small to exercise pruning"
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # cache the query batch so its lineage does not surface the corpus scan
    queries = queries.localCheckpoint()
    out = ann_indexed_topk(idx, queries, k=10, radius=0)
    touched = {p for p in out.inputFiles()}
    index_touched = {p for p in touched if tmp_table_dir in p}
    assert 0 < len(index_touched) < len(all_files), (len(index_touched), len(all_files))
    assert not any("embeddings.parquet" in p for p in touched)


def test_ivf_indexed_matches_inline_and_skips_assignment(spark, tmp_table_dir):
    emb = _emb(spark)
    idx = build_ivf_index(spark, emb, tmp_table_dir + "/ivf", centroid_mod=32)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # checkpoint the 1-row query batch so its own corpus read does not
    # surface in the probe plan we assert on
    queries = queries.localCheckpoint()
    got = ivf_indexed_topk(idx, queries, k=50, n_probes=4)
    inline = ivf_topk(emb, emb.filter(F.col("vec_id") == 0), k=50, centroid_mod=32, n_probes=4)
    assert _rows(got.select("vec_id", "dot_e9")) == _rows(inline.select("vec_id", "dot_e9"))
    # the O(n*centroids) max_by assignment ran at BUILD time only: the
    # probe plan must not contain it, and must not read the corpus
    plan = _plan(got)
    assert "max_by" not in plan
    assert "embeddings.parquet" not in plan


def test_open_ann_index_roundtrip(spark, tmp_table_dir):
    emb = _emb(spark)
    build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    idx = open_ann_index(spark, tmp_table_dir + "/lsh")
    assert idx.n_planes == 4
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert ann_indexed_topk(idx, queries, k=5, radius=1).count() == 5

    build_ivf_index(spark, emb, tmp_table_dir + "/ivf", centroid_mod=32)
    ivf = open_ann_index(spark, tmp_table_dir + "/ivf")
    assert ivf.centroid_mod == 32
    assert ivf_indexed_topk(ivf, queries, k=5).count() == 5


def test_scan_for_keys_multi_point(spark, tmp_table_dir):
    """scan_for_keys == full-scan filter, while reading only the probed
    buckets' files (the lookup generalization the index probes ride on)."""
    emb = _emb(spark)
    t = LakeTable.create(
        spark,
        tmp_table_dir + "/t",
        emb.schema,
        merge_key=["vec_id"],
        n_buckets=8,
    )
    t.append(emb)
    want = _rows(emb.filter(F.col("vec_id").isin([3, 7, 11])))
    got_df = t.scan_for_keys([3, 7, 11])
    assert _rows(got_df) == want
    all_files = {f["path"] for f in t.lineage()}
    assert 0 < len(set(got_df.inputFiles())) < len(all_files)
    assert t.scan_for_keys([]).count() == 0


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, op string, lsn long"
    )


def test_incremental_maintenance_lsh(spark, tmp_table_dir):
    """CDC batch against the index: insert a new vector, move an existing
    one (update → different bucket), delete one. Pruned probes must see
    exactly the post-change state — the old bucket must NOT surface the
    moved vector's stale row."""
    from clever_canal_spark.operators.ann_index import apply_index_changes

    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    v1 = emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    neg = [-x for x in v1]  # moves to the complement bucket (all planes flip)
    new_id = 100_000
    apply_index_changes(
        idx,
        _changes(
            spark,
            [
                (new_id, v1, "I", 1_000),   # new vector, same bucket as vec 1
                (1, neg, "U", 1_001),       # vec 1 moves buckets
                (2, None, "D", 1_002),      # vec 2 disappears
            ],
        ),
        epoch_id=0,
    )
    state = {r["vec_id"]: r["bucket"] for r in idx.vectors.scan().collect()}
    dirs = {r["vec_id"]: r["bucket"] for r in idx.directory.scan().collect()}
    assert new_id in state and 2 not in state
    assert state == dirs
    # the moved vector's row lives ONLY in its new bucket: a pruned read
    # of the old bucket must not return vec 1
    old_bucket = dirs[new_id]  # new_id shares vec 1's ORIGINAL bucket
    old_read = idx.vectors.scan_for_keys([old_bucket])
    assert 1 not in {r["vec_id"] for r in old_read.collect()}
    assert new_id in {r["vec_id"] for r in old_read.collect()}
    new_read = idx.vectors.scan_for_keys([dirs[1]])
    got = {r["vec_id"]: r["embedding"] for r in new_read.collect()}
    assert [round(x, 5) for x in got[1]] == [round(x, 5) for x in neg]
    # probes reflect the update end-to-end
    q = spark.createDataFrame([(0, neg)], "query_id long, embedding array<float>")
    top = ann_indexed_topk(idx, q, k=1, radius=0).collect()
    assert top and top[0]["vec_id"] == 1


def test_incremental_maintenance_exactly_once_and_intra_batch(spark, tmp_table_dir):
    from clever_canal_spark.operators.ann_index import apply_index_changes

    emb = _emb(spark)
    idx = build_lsh_index(spark, emb, tmp_table_dir + "/lsh", n_planes=4)
    v1 = emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    neg = [-x for x in v1]
    # same-batch insert->update pair: only the LAST change may materialize
    batch = _changes(spark, [(500_000, v1, "I", 1), (500_000, neg, "U", 2)])
    apply_index_changes(idx, batch, epoch_id=0)
    rows = idx.vectors.scan().filter(F.col("vec_id") == 500_000).collect()
    assert len(rows) == 1
    assert [round(x, 5) for x in rows[0]["embedding"]] == [round(x, 5) for x in neg]
    v_before = (idx.vectors.current_version(), idx.directory.current_version())
    # replaying the committed epoch must no-op both tables
    apply_index_changes(idx, batch, epoch_id=0)
    assert (idx.vectors.current_version(), idx.directory.current_version()) == v_before


def test_incremental_maintenance_ivf(spark, tmp_table_dir):
    from clever_canal_spark.operators.ann_index import apply_index_changes

    emb = _emb(spark)
    idx = build_ivf_index(spark, emb, tmp_table_dir + "/ivf", centroid_mod=32)
    v1 = emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    neg = [-x for x in v1]
    apply_index_changes(
        idx, _changes(spark, [(1, neg, "U", 10), (3, None, "D", 11)]), epoch_id=0
    )
    state = {r["vec_id"]: r["cent_id"] for r in idx.vectors.scan().collect()}
    dirs = {r["vec_id"]: r["cent_id"] for r in idx.directory.scan().collect()}
    assert 3 not in state and state == dirs
    # the new assignment is the true nearest centroid of the new vector
    from clever_canal_spark.operators.similarity import ivf_assign

    one = spark.createDataFrame([(1, neg)], "vec_id long, embedding array<float>")
    cents_corpus = emb  # centroids derive from the ORIGINAL corpus ids
    expected = (
        one.crossJoin(F.broadcast(
            cents_corpus.filter(F.col("vec_id") % 32 == 0).select(
                F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))))
        .select("vec_id", "cent_id",
                F.expr("aggregate(transform(sequence(1, 64), i -> CAST(ROUND(CAST(element_at(embedding, i) AS DOUBLE) * CAST(element_at(cvec, i) AS DOUBLE) * 1e9) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("d"))
        .orderBy(F.col("d").desc(), "cent_id").limit(1).collect()[0]["cent_id"]
    )
    assert state[1] == expected


def test_sync_ann_from_lake(spark, tmp_table_dir):
    """The ANN index tails an embeddings lake table's changelog: bootstrap
    pins the cursor at the build snapshot, each sync folds the changelog
    through apply_index_changes, and the result equals a fresh build from
    the table's final state."""
    from pyspark.sql import types as T

    from clever_canal_spark.operators.ann_index import (
        build_ann_index_from_lake, sync_ann_from_lake,
    )

    emb = _emb(spark).filter(F.col("vec_id") < 40)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), nullable=False),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    table = LakeTable.create(
        spark, tmp_table_dir + "/embcorpus", schema,
        merge_key=["vec_id"], n_buckets=4,
    )
    table.append(emb)
    idx = build_ann_index_from_lake(table, tmp_table_dir + "/lsh", n_planes=4)

    v1 = emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    neg = [-x for x in v1]
    table.merge(
        _changes(spark, [(1, neg, "U", 1_001), (2, None, "D", 1_002),
                         (100_000, v1, "I", 1_003)]),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_ann_from_lake(idx, table) >= 1

    ref = build_ann_index_from_lake(table, tmp_table_dir + "/ref", n_planes=4)
    got = _rows(idx.vectors.scan().select("vec_id", "bucket"))
    want = _rows(ref.vectors.scan().select("vec_id", "bucket"))
    assert got == want
    assert _rows(idx.directory.scan()) == _rows(ref.directory.scan())
    # stale row must not survive in the moved vector's old bucket
    dirs = {r["vec_id"]: r["bucket"] for r in idx.directory.scan().collect()}
    old_read = idx.vectors.scan_for_keys([dirs[100_000]])  # vec 1's old bucket
    assert 1 not in {r["vec_id"] for r in old_read.collect()}
    # already current -> no-op
    v_before = (idx.vectors.current_version(), idx.directory.current_version())
    assert sync_ann_from_lake(idx, table) == 0
    assert (idx.vectors.current_version(), idx.directory.current_version()) == v_before


def test_sync_ann_from_lake_mirrors_truncate(spark, tmp_table_dir):
    """A metadata-only lake TRUNCATE (no changelog D markers) must empty
    the ANN index on sync; post-truncate inserts land normally."""
    from pyspark.sql import types as T

    from clever_canal_spark.operators.ann_index import (
        build_ann_index_from_lake, sync_ann_from_lake,
    )

    emb = _emb(spark).filter(F.col("vec_id") < 40)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), nullable=False),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    table = LakeTable.create(
        spark, tmp_table_dir + "/embtrunc", schema,
        merge_key=["vec_id"], n_buckets=4,
    )
    table.append(emb)
    idx = build_ann_index_from_lake(table, tmp_table_dir + "/lshtrunc", n_planes=4)
    assert idx.vectors.scan().count() == 40

    table.truncate_rows(2_000)
    v1 = emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    table.merge(
        _changes(spark, [(7, v1, "I", 3_000)]),
        epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_ann_from_lake(idx, table) >= 1
    assert {r["vec_id"] for r in idx.vectors.scan().collect()} == {7}
    assert {r["vec_id"] for r in idx.directory.scan().collect()} == {7}
    assert sync_ann_from_lake(idx, table) == 0  # replay no-op

    # IVF family: same mirror semantics on its own table; centroids (the
    # coarse quantizer) survive the truncate — they stay a valid
    # assignment function for post-truncate inserts
    t2 = LakeTable.create(
        spark, tmp_table_dir + "/embtrunc2", schema,
        merge_key=["vec_id"], n_buckets=4,
    )
    t2.append(emb)
    ivf = build_ann_index_from_lake(
        table=t2, path=tmp_table_dir + "/ivftrunc", family="ivf", centroid_mod=4
    )
    n_cents = ivf.centroids.scan().count()
    assert n_cents > 0
    t2.truncate_rows(4_000)
    t2.merge(
        _changes(spark, [(8, v1, "I", 5_000)]),
        epoch_id=2, op_col="op", mode="mor", lsn_col="lsn",
    )
    assert sync_ann_from_lake(ivf, t2) >= 1
    assert {r["vec_id"] for r in ivf.vectors.scan().collect()} == {8}
    assert ivf.centroids.scan().count() == n_cents

    # degenerate-corpus IVF build (no vec_id % mod == 0) must refuse
    # loudly, never build a silently-empty index
    import pytest
    t3 = LakeTable.create(
        spark, tmp_table_dir + "/embtrunc3", schema,
        merge_key=["vec_id"], n_buckets=4,
    )
    t3.append(emb.filter(F.col("vec_id") == 7))
    with pytest.raises(ValueError, match="no centroid candidates"):
        build_ann_index_from_lake(
            table=t3, path=tmp_table_dir + "/ivfempty", family="ivf", centroid_mod=4
        )


def test_string_query_ids(spark, tmp_path):
    """The probe schema inherits the caller's query_id type — request
    UUID strings are as valid as bigints."""
    import pyspark.sql.functions as F

    from clever_canal_spark.operators.ann_index import (
        ann_indexed_topk, build_lsh_index,
    )

    corpus = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> CAST(sin(id * 7 + j) AS FLOAT))"
        ).alias("embedding"),
    )
    idx = build_lsh_index(
        spark, corpus, str(tmp_path / "sidx"), n_planes=3, n_dims=8, n_buckets=2
    )
    q = spark.createDataFrame(
        [("req-a",), ("req-b",)], "query_id string"
    ).withColumn(
        "embedding",
        F.expr("transform(sequence(0, 7), j -> CAST(cos(j) AS FLOAT))"),
    )
    out = ann_indexed_topk(idx, q, k=3, radius=1)
    got = {r["query_id"] for r in out.collect()}
    assert got == {"req-a", "req-b"}


def test_trained_ivf_recall_beats_seeded(spark):
    """The Lloyd's-trained quantizer must lift POOLED recall over the
    sampled seeds at identical knobs (mod-32 lists, 4 probes, 20 queries)
    — the measured claim behind build_ivf_index(train_iters=...). The
    single-query recall probes cannot carry this assertion (one query's
    recall swings either way on quantizer choice); the pooled mean is
    stable on the fixture (seeded 0.404, trained 0.466)."""
    from clever_canal_spark.operators.similarity import (
        centroid_arrays,
        ivf_mean_recall,
        kmeans_centroids,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    seeded = ivf_mean_recall(emb, qs, k=50, centroid_mod=32, n_probes=4)
    cents = centroid_arrays(kmeans_centroids(emb, centroid_mod=32, n_iters=2))
    trained = ivf_mean_recall(
        emb, qs, k=50, centroid_mod=32, n_probes=4, cents=cents
    )
    rs = seeded.collect()[0]
    rt = trained.collect()[0]
    assert rs["k_exact"] == rt["k_exact"] == 20 * 50
    assert rt["recall_e6"] > rs["recall_e6"], (
        f"trained quantizer did not improve pooled recall: "
        f"{rt['recall_e6']} <= {rs['recall_e6']}"
    )


def test_trained_ivf_index_probe_parity_and_sidecar(spark, tmp_table_dir):
    """A train_iters=2 persisted index must (a) round-trip its training
    config through the sidecar, (b) store DOUBLE centroids (float storage
    would break integer-exact parity with the inline trained path), and
    (c) serve probes identical to the inline trained operator — training
    rides the build, never the query."""
    from clever_canal_spark.operators.similarity import ivf_topk_trained

    emb = _emb(spark)
    idx = build_ivf_index(
        spark, emb, tmp_table_dir + "/ivf_t", centroid_mod=32, train_iters=2
    )
    reopened = open_ann_index(spark, tmp_table_dir + "/ivf_t")
    assert reopened.train_iters == 2
    ctype = dict(reopened.centroids.scan().dtypes)["cvec"]
    assert ctype == "array<double>", ctype
    queries = emb.filter(F.col("vec_id").isin([0, 7])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_indexed_topk(reopened, queries, k=50, n_probes=4)
    for qid in (0, 7):
        inline = ivf_topk_trained(
            emb, emb.filter(F.col("vec_id") == qid),
            k=50, centroid_mod=32, n_iters=2, n_probes=4,
        )
        assert _rows(
            got.filter(F.col("query_id") == qid).select("vec_id", "dot_e9")
        ) == _rows(inline.select("vec_id", "dot_e9")), (
            f"query {qid}: trained persisted probe diverges from inline"
        )


def test_ivfpq_full_rerank_equals_plain_ivf_probe(spark, tmp_table_dir):
    """rerank larger than any probed-list total makes the ADC screen a
    pass-through — IVF-PQ output must equal the plain IVF indexed probe
    at the same knobs (pins the screen/rerank plumbing)."""
    from clever_canal_spark.operators.ann_index import ivf_pq_indexed_topk

    emb = _emb(spark)
    pq = build_ivf_index(
        spark, emb, tmp_table_dir + "/pq", centroid_mod=32, pq_subs=8, pq_mod=25
    )
    plain = build_ivf_index(spark, emb, tmp_table_dir + "/plain", centroid_mod=32)
    queries = emb.filter(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_pq_indexed_topk(pq, queries, k=15, n_probes=4, rerank=10_000)
    want = ivf_indexed_topk(plain, queries, k=15, n_probes=4)
    assert _rows(got) == _rows(want)


def test_ivfpq_maintenance_reencodes_and_requires_pq(spark, tmp_table_dir):
    """Incremental changes on a PQ index must re-encode upserts against
    the STORED codebook (a moved vector is findable at its new position
    through the ADC screen), and probing a non-PQ index raises."""
    import pytest as _pytest

    from clever_canal_spark.operators.ann_index import (
        apply_index_changes,
        ivf_pq_indexed_topk,
    )

    emb = _emb(spark)
    idx = build_ivf_index(
        spark, emb, tmp_table_dir + "/pq", centroid_mod=32, pq_subs=8, pq_mod=25
    )
    v450 = emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    ch = spark.createDataFrame(
        [(1, v450, "U", 50), (2, None, "D", 51)],
        "vec_id bigint, embedding array<float>, op string, lsn bigint",
    )
    apply_index_changes(idx, ch, epoch_id=1)
    re = open_ann_index(spark, tmp_table_dir + "/pq")
    q450 = emb.filter(F.col("vec_id") == 450).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ids = [r["vec_id"] for r in ivf_pq_indexed_topk(re, q450, k=5, n_probes=2, rerank=60).collect()]
    assert 1 in ids, f"moved vector not re-encoded into its new list: {ids}"
    assert 2 not in ids
    plain = build_ivf_index(spark, emb, tmp_table_dir + "/plain2", centroid_mod=32)
    with _pytest.raises(ValueError, match="without PQ codes"):
        ivf_pq_indexed_topk(plain, q450)


def test_index_maintenance_crash_between_vectors_and_directory(spark, tmp_table_dir):
    """apply_index_changes commits vectors FIRST, then the directory; a
    crash between the two must replay idempotently (vectors no-op via the
    committed-epoch registry, directory applies) and converge to the same
    state as a clean run — for the PQ-carrying variant too."""
    from clever_canal_spark.operators.ann_index import (
        apply_index_changes,
        ivf_pq_indexed_topk,
        open_ann_index,
    )

    emb = _emb(spark)
    idx = build_ivf_index(
        spark, emb, tmp_table_dir + "/pq", centroid_mod=32, pq_subs=8, pq_mod=25
    )
    ref = build_ivf_index(
        spark, emb, tmp_table_dir + "/ref", centroid_mod=32, pq_subs=8, pq_mod=25
    )
    v450 = emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    ch = spark.createDataFrame(
        [(1, v450, "U", 50), (2, None, "D", 51)],
        "vec_id bigint, embedding array<float>, op string, lsn bigint",
    )
    # crash: directory merge dies after the vectors merge committed
    real_merge = idx.directory.merge

    def boom(*a, **kw):
        raise RuntimeError("injected crash before directory commit")

    idx.directory.merge = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="injected crash"):
            apply_index_changes(idx, ch, epoch_id=1)
    finally:
        idx.directory.merge = real_merge
    assert idx.vectors.is_epoch_committed(1)
    assert not idx.directory.is_epoch_committed(1)

    # recovery: replay the SAME epoch on a fresh handle
    re = open_ann_index(spark, tmp_table_dir + "/pq")
    apply_index_changes(re, ch, epoch_id=1)
    apply_index_changes(ref, ch, epoch_id=1)  # clean twin

    q450 = emb.filter(F.col("vec_id") == 450).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _rows(ivf_pq_indexed_topk(open_ann_index(spark, tmp_table_dir + "/pq"),
                                    q450, k=10, n_probes=4, rerank=60))
    want = _rows(ivf_pq_indexed_topk(ref, q450, k=10, n_probes=4, rerank=60))
    assert got == want
    # directory agrees with vectors (no stale location survives)
    dv = _rows(open_ann_index(spark, tmp_table_dir + "/pq").directory.scan())
    dr = _rows(ref.directory.scan())
    assert dv == dr


def test_hard_negatives_exclusion_and_indexed_parity(spark, tmp_table_dir):
    """Mined negatives must never include the query or ANY of its
    positives; the indexed overfetch twin must agree with the exact
    corpus-path variant whenever the probes cover the candidates
    (n_probes = all lists here — pure plumbing parity)."""
    from clever_canal_spark.operators.similarity import (
        hard_negative_mine,
        hard_negative_mine_indexed,
    )

    emb = _emb(spark)
    pairs = spark.createDataFrame(
        [(0, 3), (0, 123), (7, 450)], "query_id bigint, pos_id bigint"
    )
    exact = hard_negative_mine(emb, pairs, k=10)
    rows = exact.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 7}
    for qid, rs in by_q.items():
        assert len(rs) == 10
        negs = {r["neg_id"] for r in rs}
        assert qid not in negs
        banned = {3, 123} if qid == 0 else {450}
        assert not (negs & banned), (qid, negs & banned)
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))

    idx = build_ivf_index(spark, emb, tmp_table_dir + "/hnidx", centroid_mod=32)
    approx = hard_negative_mine_indexed(idx, emb, pairs, k=10, n_probes=16)
    assert _rows(approx) == _rows(exact)
