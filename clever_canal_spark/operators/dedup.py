"""Deduplication operators over the documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Scale design:

- exact dedup: hash-groupBy on md5(text) — one shuffle keyed by digest,
  uniform by construction (no salting needed);
- MinHash: signatures are per-row array expressions (no shuffle); LSH bands
  turn near-dup search into an equi-join on (band, bucket) — candidate
  pairs only, never the n² cross join;
- n-gram Jaccard: shingle-explode + self-equi-join on the shingle hash,
  grouped to intersection counts; the ≥τ test is exact integer arithmetic
  (5·|∩| ≥ 4·|∪| for τ=0.8) — no float thresholds;
- SimHash: 16-bit signature from token-hash bit votes, per-row expression.

All hashes are plain polynomial/affine arithmetic (not xxhash) so the DuckDB
oracles compute bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import shingle_hashes_expr

# affine minhash family: h_j(x) = (A_j * x + B_j) mod P
MINHASH_P = 100003
MINHASH_FAMILY = [(31 + 2 * j, 7 + 5 * j) for j in range(6)]
SIMHASH_BITS = 16


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: digest → keeper (min doc_id) + duplicate count."""
    return (
        df.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_docs"))
    )


def minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """k=6 MinHash signature columns mh0..mh5 over 3-char shingle hashes."""
    sh = shingle_hashes_expr(text_col)
    cols = [F.col("doc_id")]
    for j, (a, b) in enumerate(MINHASH_FAMILY):
        cols.append(
            F.expr(
                f"array_min(transform({sh}, h -> ({a}*h + {b}) % {MINHASH_P}))"
            ).alias(f"mh{j}")
        )
    return df.select(*cols)


def minhash_lsh_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH banding (3 bands × 2 rows): near-dup candidate buckets with >1
    member. Joining docs within a bucket is the scale path — candidates
    only, uniform bucket keys."""
    sig = minhash_signature(df, text_col)
    bands = []
    for band in range(3):
        j = 2 * band
        bands.append(
            sig.select(
                "doc_id",
                F.lit(band).alias("band"),
                (F.col(f"mh{j}") * MINHASH_P + F.col(f"mh{j+1}")).alias("bucket_key"),
            )
        )
    exploded = bands[0].unionByName(bands[1]).unionByName(bands[2])
    return (
        exploded.groupBy("band", "bucket_key")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    tau_num: int = 4,
    tau_den: int = 5,
) -> DataFrame:
    """Pairs (a<b) within the same ``group_col`` whose 3-shingle-set Jaccard
    ≥ tau_num/tau_den, by exact integer test tau_den·|∩| ≥ tau_num·|∪|.

    The shingle-hash equi-join is the blocking step: only docs sharing at
    least one shingle ever meet, and the join key (group, shingle) shuffles
    uniformly. At 100 TB you'd add a band-LSH prefilter before this."""
    sh = F.expr(f"array_distinct({shingle_hashes_expr(text_col)})")
    shingled = df.select("doc_id", F.col(group_col).alias("grp"), sh.alias("sh"))
    sizes = shingled.select("doc_id", F.size("sh").alias("n"))
    ex = shingled.select("doc_id", "grp", F.explode("sh").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("un", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.lit(tau_den) * F.col("inter") >= F.lit(tau_num) * F.col("un"))
        .select("doc_a", "doc_b", "inter", "un")
    )


def simhash_expr(text_col: str, bits: int = SIMHASH_BITS) -> str:
    """SQL expression for a ``bits``-wide SimHash over whitespace tokens of
    length ≥ 3 (token hash = 3-char polynomial of its prefix; each bit is
    the sign of the ±1 votes)."""
    tokens = f"filter(split({text_col}, ' '), t -> length(t) >= 3)"
    th = "CAST(ascii(substring(t, 1, 1))*961 + ascii(substring(t, 2, 1))*31 + ascii(substring(t, 3, 1)) AS BIGINT)"
    bit_terms = []
    for k in range(bits):
        vote = (
            f"aggregate({tokens}, CAST(0 AS BIGINT), (acc, t) -> acc + "
            f"(CASE WHEN ({th} div {1 << k}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"(CASE WHEN ({vote}) > 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(bit_terms)


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", F.expr(simhash_expr(text_col)).alias("simhash"))
