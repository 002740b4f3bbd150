"""Dataset publishing: deterministic sharding + integrity manifest —
the last mile of the curation pipeline (scripts/run_curation.py).

A training job consuming a published corpus needs three guarantees the
bare ``write.parquet`` at the end of a pipeline does not give:

1. **Deterministic membership**: which shard a document lands in is a
   pure function of its id (md5-u32 ``pmod n_shards`` — the repo-wide
   CROSS-ENGINE hash convention), NOT of the cluster's
   partitioning, so a re-run of the same input publishes byte-wise the
   same shard membership and data loaders can split work by shard id.
2. **Integrity manifest**: per-shard row counts and an order-
   independent content checksum (the SUM of each row's md5-u32 over
   all published columns, folded in DECIMAL(38,0) so ANSI mode never
   overflows — commutative, so any task order yields the same value;
   md5 on both sides means a DIFFERENT engine can recompute and audit
   the manifest, driver-oracled in ``doc_publish_manifest``), plus the
   schema, written as ``_MANIFEST.json``
   next to the data. Sum-of-hashes is the classic multiset checksum;
   a dropped, duplicated, or bit-flipped row moves it.
3. **Verification**: :func:`verify_dataset` recomputes counts and
   checksums from the files and diffs them against the manifest —
   what a training job runs before trusting a copy (object-store
   transfer, mirror, retention repair).

Scale shape: ONE hash shuffle on the shard id — the write tasks and the
per-shard manifest aggregate ride the same exchange; checksums are
per-row JVM expressions folded by partial aggregation. No driver-side
row data ever; the manifest is O(n_shards).

Reference anchor: the reference delivers event batches to sinks and
leaves corpus layout to the consumer; published-shard manifests are the
webtext-side analog of its batch-ack bookkeeping (delivery you can
verify and resume).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST = "_MANIFEST.json"


def _row_hash(cols: list[str]):
    # per-row content hash over every published column: md5-u32 of the
    # unit-separator-joined string forms (null sentinel \x1enull so
    # (null) and ('') differ) — the repo-wide CROSS-ENGINE hash
    # convention, so ANY engine (the DuckDB oracle included) can
    # re-verify a manifest: ('0x'||substr(md5(x),1,8))::BIGINT is the
    # DuckDB twin. Columns join in sorted-name order (the manifest's
    # ``columns`` field pins it).
    joined = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x1enull")) for c in cols],
    )
    return F.conv(F.md5(joined).substr(1, 8), 16, 10).cast("bigint")


def publish_dataset(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``out_dir`` (parquet, ``shard=<k>`` directories) and a
    ``_MANIFEST.json`` carrying per-shard rows + checksum. Returns the
    manifest dict. Columns are published in sorted name order so the
    checksum column-set is unambiguous; ``id_col`` must be present and
    non-null (null ids raise — membership would be undefined)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    cols = sorted(df.columns)
    n_null = df.filter(F.col(id_col).isNull()).limit(1).count()
    if n_null:
        raise ValueError(f"{id_col} contains nulls — shard membership undefined")
    shard = F.pmod(
        F.conv(F.md5(F.col(id_col).cast("string")).substr(1, 8), 16, 10)
         .cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    out = df.select(*cols).withColumn("shard", shard)
    # one exchange: each write task holds whole shards, so every
    # shard=<k> dir is written by exactly one task (typically one file)
    out = out.repartition(n_shards, "shard")
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    # manifest from what was WRITTEN (read-back, not the input plan):
    # the checksum certifies the files on disk, not the intent
    written = df.sparkSession.read.parquet(out_dir)
    per = (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_hash(cols).cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    shards = {
        int(r["shard"]): {"rows": int(r["rows"]), "checksum": int(r["checksum"])}
        for r in per
    }
    manifest = {
        "format": "ccs-dataset-v1",
        "n_shards": n_shards,
        "id_col": id_col,
        "columns": cols,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": {str(k): shards[k] for k in sorted(shards)},
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _MANIFEST)) as fh:
        return json.load(fh)


def verify_dataset(spark: SparkSession, out_dir: str) -> dict:
    """Recompute per-shard rows + checksums from the published files and
    diff against the manifest. Returns ``{ok, total_rows, mismatches}``
    where ``mismatches`` lists ``{shard, field, manifest, actual}`` rows
    (a missing shard reports rows 0 / checksum None). One job, same
    aggregate shape as publishing."""
    m = read_manifest(out_dir)
    cols = m["columns"]
    df = spark.read.parquet(out_dir)
    per = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in df.groupBy("shard").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_hash(cols).cast("decimal(38,0)")).alias("checksum"),
        ).collect()
    }
    total_actual = sum(v[0] for v in per.values())
    mismatches = []
    for k_str, want in m["shards"].items():
        k = int(k_str)
        rows, checksum = per.pop(k, (0, None))
        if rows != want["rows"]:
            mismatches.append({"shard": k, "field": "rows",
                               "manifest": want["rows"], "actual": rows})
        if checksum != want["checksum"]:
            mismatches.append({"shard": k, "field": "checksum",
                               "manifest": want["checksum"], "actual": checksum})
    for k, (rows, checksum) in sorted(per.items()):
        mismatches.append({"shard": k, "field": "unexpected",
                           "manifest": None, "actual": rows})
    return {
        "ok": not mismatches,
        "total_rows": total_actual,
        "mismatches": mismatches,
    }


def diff_datasets(spark: SparkSession, dir_a: str, dir_b: str) -> DataFrame:
    """Per-shard diff of two published datasets — "what changed between
    the snapshot we trained on and the re-publish?" answered without
    trusting either writer.

    Two levels, and the first is free:

    1. **Manifest screen (zero data I/O)**: shards whose (rows,
       checksum) agree in both manifests are UNCHANGED — identical
       multiset mod hash collision — and their data files are never
       opened. On a routine re-publish that touches 1% of shards, 99%
       of the corpus is skipped here.
    2. **Row-level multiset diff on the differing shards only**: per
       (shard, row-hash) counts from each side, full-outer joined —
       ``n_only_a`` / ``n_only_b`` are the row multiset differences
       (a modified row counts once on each side). Partition pruning
       keeps the read to exactly the differing ``shard=`` directories.

    Output: one row per shard — (shard, rows_a, rows_b, n_only_a,
    n_only_b, changed). Requires both publishes to share n_shards,
    id_col and column set (anything else is a schema migration, not a
    diff)."""
    ma, mb = read_manifest(dir_a), read_manifest(dir_b)
    for field in ("n_shards", "id_col", "columns"):
        if ma[field] != mb[field]:
            raise ValueError(
                f"datasets disagree on {field}: {ma[field]!r} vs {mb[field]!r}"
                " — that is a schema migration, not a diff"
            )
    cols = ma["columns"]
    sa, sb = ma["shards"], mb["shards"]
    unchanged, differing = [], []
    for k in sorted(set(sa) | set(sb), key=int):
        if k in sa and k in sb and sa[k] == sb[k]:
            unchanged.append(int(k))
        else:
            differing.append(int(k))
    rows_of = lambda m, k: m.get(str(k), {}).get("rows", 0)  # noqa: E731
    base = spark.createDataFrame(
        [(k, rows_of(sa, k), rows_of(sb, k)) for k in unchanged + differing],
        "shard int, rows_a long, rows_b long",
    )
    if not differing:
        return base.select(
            "shard", "rows_a", "rows_b",
            F.lit(0).cast("long").alias("n_only_a"),
            F.lit(0).cast("long").alias("n_only_b"),
            F.lit(False).alias("changed"),
        )

    def counts(d):
        # explicit per-directory read, not a partition filter: the skip
        # of unchanged shards is then STATIC (visible in inputFiles(),
        # independent of pushdown) and a shard absent on one side just
        # contributes no paths
        paths = [
            p for k in differing
            if os.path.isdir(p := os.path.join(d, f"shard={k}"))
        ]
        if not paths:
            return None
        return (
            spark.read.option("basePath", d).parquet(*paths)
            .groupBy("shard", _row_hash(cols).alias("h"))
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ca, cb = counts(dir_a), counts(dir_b)
    if ca is None and cb is None:
        raise AssertionError("differing shards but no data dirs on either side")
    if ca is None:
        j = cb.select("shard", F.lit(0).alias("ca"), F.col("c").alias("cb"))
    elif cb is None:
        j = ca.select("shard", F.col("c").alias("ca"), F.lit(0).alias("cb"))
    else:
        j = ca.withColumnRenamed("c", "ca").join(
            cb.withColumnRenamed("c", "cb"), ["shard", "h"], "full"
        ).select(
            "shard",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    diffs = j.groupBy("shard").agg(
        F.sum(F.greatest(F.col("ca") - F.col("cb"), F.lit(0))).alias("n_only_a"),
        F.sum(F.greatest(F.col("cb") - F.col("ca"), F.lit(0))).alias("n_only_b"),
    )
    return (
        base.join(diffs, "shard", "left")
        .select(
            "shard", "rows_a", "rows_b",
            F.coalesce("n_only_a", F.lit(0)).cast("long").alias("n_only_a"),
            F.coalesce("n_only_b", F.lit(0)).cast("long").alias("n_only_b"),
        )
        .withColumn("changed", (F.col("n_only_a") + F.col("n_only_b")) > 0)
    )
