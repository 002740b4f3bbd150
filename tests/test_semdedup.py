"""SemDeDup (operators/similarity.semdedup_keepers): k-means-cell
blocked semantic dedup — hand-built cells, keepers, and the documented
cross-cell-miss trade."""

import pytest

from clever_canal_spark.operators.similarity import semdedup_keepers

# 4-dim unit-ish vectors; centroid_mod=2 → even vec_ids are centroids
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),     # centroid A
    (1, [0.999, 0.045, 0.0, 0.0]), # dup of 0 (cos ≈ .999)
    (2, [0.0, 1.0, 0.0, 0.0]),     # centroid B
    (3, [0.045, 0.999, 0.0, 0.0]), # dup of 2
    (5, [0.74, 0.67, 0.0, 0.0]),   # near 7, lands in cell A
    (7, [0.67, 0.74, 0.0, 0.0]),   # near 5, lands in cell B
]


def vec_df(spark, rows=VECS):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def run(spark, **kw):
    out = semdedup_keepers(
        vec_df(spark), centroid_mod=2, tau_e9=900_000_000, n_dims=4, **kw
    )
    return {r["vec_id"]: (r["cent_id"], r["cluster_id"], r["keep"]) for r in out.collect()}


def test_cells_groups_and_keepers(spark):
    got = run(spark)
    # assignment: argmax dot, tie to lowest centroid
    assert got[0][0] == 0 and got[1][0] == 0 and got[5][0] == 0
    assert got[2][0] == 2 and got[3][0] == 2 and got[7][0] == 2
    # dup groups resolve to min-id keepers
    assert got[1] == (0, 0, False) and got[0][2] is True
    assert got[3] == (2, 2, False) and got[2][2] is True


def test_cross_cell_pairs_are_missed_by_design(spark):
    """cos(5,7) ≈ .991 ≥ tau, but they sit in different cells — SemDeDup
    keeps both (the paper's accepted trade for never comparing across
    cells)."""
    got = run(spark)
    assert got[5][2] is True and got[7][2] is True
    assert got[5][1] == 5 and got[7][1] == 7


def test_oversized_cell_guard(spark):
    with pytest.raises(ValueError, match="max_cell_rows"):
        semdedup_keepers(
            vec_df(spark), centroid_mod=2, tau_e9=900_000_000,
            n_dims=4, max_cell_rows=2,
        )
    out = semdedup_keepers(
        vec_df(spark), centroid_mod=2, tau_e9=900_000_000,
        n_dims=4, max_cell_rows=2, on_oversized="keep",
    )
    assert out.count() == len(VECS)


# ---------------------------------------------------------------------------
# kmeans_centroids (integer-exact Lloyd's)
# ---------------------------------------------------------------------------


def test_kmeans_moves_centroids_to_cell_means(spark):
    from clever_canal_spark.operators.similarity import kmeans_centroids

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # seed A
        (1, [0.8, 0.6, 0.0, 0.0]),   # A's cell
        (2, [0.0, 1.0, 0.0, 0.0]),   # seed B
        (3, [0.0, 0.6, 0.8, 0.0]),   # B's cell
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_centroids(df, centroid_mod=2, n_iters=1, n_dims=4)
    got = {(r["cent_id"], r["dim"]): r["mean_e9"] for r in out.collect()}
    # cell A = {0, 1}: mean = (.9, .3, 0, 0); cell B = {2, 3}: (0, .8, .4, 0)
    assert got[(0, 0)] == 900_000_000 and got[(0, 1)] == 300_000_000
    assert got[(2, 1)] == 800_000_000 and got[(2, 2)] == 400_000_000
    assert got[(0, 3)] == 0 and got[(2, 3)] == 0


def test_kmeans_empty_cluster_keeps_seed(spark):
    from clever_canal_spark.operators.similarity import kmeans_centroids

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.141, 0.0, 0.0]),
        (2, [-1.0, 0.0, 0.0, 0.0]),  # seed B: attracts nobody (incl. itself? no — itself)
        (3, [0.95, 0.31, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_centroids(df, centroid_mod=4, n_iters=1, n_dims=4)
    # only vec 0 is a seed here (mod 4) — every vector assigns to it, and
    # a second run with mod 2 gives seed 2 its own singleton cell
    got = {(r["cent_id"], r["dim"]): r["mean_e9"] for r in out.collect()}
    assert {c for c, _ in got} == {0}
    out2 = kmeans_centroids(df, centroid_mod=2, n_iters=1, n_dims=4)
    got2 = {(r["cent_id"], r["dim"]): r["mean_e9"] for r in out2.collect()}
    assert got2[(2, 0)] == -1_000_000_000  # singleton cell: mean = itself


def test_centroid_arrays_roundtrip(spark):
    from clever_canal_spark.operators.similarity import (
        centroid_arrays,
        kmeans_centroids,
    )

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    long_form = kmeans_centroids(df, centroid_mod=2, n_iters=1, n_dims=4)
    arrs = {r["cent_id"]: r["cvec"] for r in centroid_arrays(long_form, n_dims=4).collect()}
    assert set(arrs) == {0, 2} and all(len(v) == 4 for v in arrs.values())


def test_empty_centroid_seed_raises(spark):
    from clever_canal_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_keepers,
    )

    # only odd vec_ids → no seed at any vec_id % 4 == 0
    rows = [(2 * i + 1, [float(i), 1.0, 0.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no centroid seeds"):
        semdedup_keepers(df, centroid_mod=4, n_dims=4)
    with pytest.raises(ValueError, match="no centroid seeds"):
        kmeans_centroids(df, centroid_mod=4, n_dims=4)
