"""Last-writer-wins dedup — the pre-MERGE cardinality reducer.

Reference semantics: events for the same key apply in total LSN order
((journalName, offset) lexicographic, EntryPosition.java:108-115); applying
only the last one per key within a batch yields the same final state because
each event carries a full after-image (RowData, EntryProtocol.proto:154-161).

Spark-first: a single ``groupBy(key).agg(max_by(struct(*), lsn))`` — hash
aggregation with map-side partial combine, no window/sort shuffle. The salted
variant defuses hot-key skew (one url receiving a large share of updates
concentrates a reduce partition): phase 1 aggregates per (key, salt) so the
hot key's rows split across ``n_salts`` reducers; phase 2 reduces the ≤
``n_salts`` survivors per key. Equivalent output by max_by associativity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _payload_cols(df: DataFrame, key: list[str], lsn_col: str) -> list[str]:
    return [c for c in df.columns if c not in key]


def lww_dedup(df: DataFrame, key: list[str], lsn_col: str = "lsn") -> DataFrame:
    """Keep, per key, the row with the maximum LSN. Output columns = input
    columns (key + payload), one row per key. LSN must be unique per event
    (generator/feed guarantee — SURVEY.md §7 risk (d))."""
    payload = _payload_cols(df, key, lsn_col)
    packed = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(lsn_col)).alias("__w")
    out = df.groupBy(*key).agg(packed)
    return out.select(*key, *[F.col(f"__w.{c}").alias(c) for c in payload])


def salted_lww_dedup(
    df: DataFrame,
    key: list[str],
    lsn_col: str = "lsn",
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase max_by with a salt column (hot-key defusal).

    Salt derives from the LSN (uniform over events, independent of the key)
    so a hot key's events spread across ``n_salts`` partial groups. Phase 2's
    input is ≤ n_salts rows per key — negligible skew regardless of the
    original distribution. Result is identical to :func:`lww_dedup`.
    """
    payload = _payload_cols(df, key, lsn_col)
    salt = salt_expr if salt_expr is not None else F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts))
    packed = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(lsn_col)).alias("__w")

    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key, "__salt")
        .agg(packed)
        .select(*key, *[F.col(f"__w.{c}").alias(c) for c in payload])
    )
    phase2 = phase1.groupBy(*key).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col(lsn_col)
        ).alias("__w")
    )
    return phase2.select(*key, *[F.col(f"__w.{c}").alias(c) for c in payload])
