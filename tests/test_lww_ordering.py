"""Out-of-order delivery correctness: LWW-by-LSN must hold ACROSS epochs
(multi-shard group sink, GroupEventSink.java:26-76 — a lagging shard
delivers lower-LSN events in a later epoch), in both merge modes, and
through COW rewrites and compaction (tombstone retention).

Also covers the footer-hints fast path machinery and the broadcast
auto-guard introduced for the same multi-shard scenario.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

TS = "2024-01-01 00:00:00"


def make_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, path, SCHEMA, merge_key=["url", "warc_ts"], n_buckets=n_buckets
    )


def src(spark, rows):
    """rows: (url, text, op, lsn)"""
    df = spark.createDataFrame(
        [(u, TS, x, o, l) for u, x, o, l in rows],
        "url string, warc_ts string, text string, op string, lsn long",
    )
    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))


def state(t):
    return {(r["url"], r["text"]) for r in t.scan().collect()}


def test_cow_stale_upsert_loses(spark, tmp_table_dir):
    """A later epoch delivering a LOWER-LSN update must not overwrite."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "new", "U", 10)]), epoch_id=0, lsn_col="lsn")
    t.merge(src(spark, [("a", "stale", "U", 5)]), epoch_id=1, lsn_col="lsn")
    assert state(t) == {("a", "new")}


def test_cow_stale_upsert_cannot_resurrect_delete(spark, tmp_table_dir):
    """Delete at lsn=20, then a lagging shard upserts at lsn=15 in a later
    epoch: the key must STAY deleted (tombstone retained in COW files)."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1", "U", 10), ("b", "keep", "U", 11)]), epoch_id=0, lsn_col="lsn")
    t.merge(src(spark, [("a", None, "D", 20)]), epoch_id=1, lsn_col="lsn")
    t.merge(src(spark, [("a", "zombie", "U", 15)]), epoch_id=2, lsn_col="lsn")
    assert state(t) == {("b", "keep")}
    # and a genuinely newer upsert DOES revive it
    t.merge(src(spark, [("a", "reborn", "U", 30)]), epoch_id=3, lsn_col="lsn")
    assert state(t) == {("a", "reborn"), ("b", "keep")}


def test_mor_stale_upsert_after_compaction(spark, tmp_table_dir):
    """MOR: delete, compact (folds deltas into base), then a stale upsert —
    compaction must have kept the tombstone so the key stays deleted."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v1", "U", 10)]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", None, "D", 20)]), epoch_id=1, mode="mor", lsn_col="lsn")
    assert t.compact() is not None
    assert state(t) == set()
    t.merge(src(spark, [("a", "zombie", "U", 15)]), epoch_id=2, mode="mor", lsn_col="lsn")
    assert state(t) == set()
    t.merge(src(spark, [("a", "reborn", "U", 30)]), epoch_id=3, mode="mor", lsn_col="lsn")
    assert state(t) == {("a", "reborn")}


def test_shard_interleaving_order_insensitive(spark, tmp_table_dir):
    """The follower's no-barrier claim: any epoch-interleaving of the same
    event set converges to the same final state, in both modes."""
    events = [
        ("a", "a1", "U", 1), ("a", "a2", "U", 4), ("b", "b1", "U", 2),
        ("b", None, "D", 6), ("c", "c1", "U", 3), ("c", "c2", "U", 5),
    ]
    import itertools

    expected = {("a", "a2"), ("c", "c2")}
    for mode in ("cow", "mor"):
        for i, perm in enumerate(itertools.permutations(events, 3)):
            if i >= 4:  # a few deterministic interleavings, not all 120
                break
            rest = [e for e in events if e not in perm]
            d = os.path.join(tmp_table_dir, f"{mode}-{i}")
            t = make_table(spark, d)
            t.merge(src(spark, list(perm)), epoch_id=0, mode=mode, lsn_col="lsn")
            t.merge(src(spark, rest), epoch_id=1, mode=mode, lsn_col="lsn")
            assert state(t) == expected, f"{mode} perm {i}"


def test_compaction_is_incremental(spark, tmp_table_dir):
    """Buckets without deltas must carry their base files BY REFERENCE
    through compaction (byte-identical paths — no O(table) rewrite)."""
    t = make_table(spark, tmp_table_dir, n_buckets=8)
    many = [(f"u{i}", f"v{i}", "U", i) for i in range(64)]
    t.merge(src(spark, many), epoch_id=0, mode="mor", lsn_col="lsn")
    t.compact()
    base = {f["path"]: f for f in t.snapshot().files}
    # one key's bucket gets a delta; others untouched
    t.merge(src(spark, [("u1", "v1b", "U", 100)]), epoch_id=1, mode="mor", lsn_col="lsn")
    snap = t.snapshot()
    delta_buckets = {f["bucket"] for f in snap.delta_files}
    assert len(delta_buckets) == 1
    t.compact()
    after = {f["path"]: f for f in t.snapshot().files}
    untouched_before = {p for p, f in base.items() if f["bucket"] not in delta_buckets}
    assert untouched_before <= set(after), "non-delta bucket files must survive compaction"
    assert state(t) >= {("u1", "v1b"), ("u2", "v2")}


def test_tombstone_purge_watermark(spark, tmp_table_dir):
    """compact(purge_tombstones_below=W) GCs only tombstones with lsn < W."""
    t = make_table(spark, tmp_table_dir)
    t.merge(src(spark, [("a", "v", "U", 1), ("b", "v", "U", 2)]), epoch_id=0, mode="mor", lsn_col="lsn")
    t.merge(src(spark, [("a", None, "D", 10), ("b", None, "D", 50)]), epoch_id=1, mode="mor", lsn_col="lsn")
    t.compact(purge_tombstones_below=20)
    hidden = t._read_files(t.snapshot(), t.snapshot().files, hidden=True)
    tombs = {r["url"] for r in hidden.filter(F.col("__op") == "D").collect()}
    assert tombs == {"b"}  # a's tombstone (lsn 10 < 20) purged, b's kept


def _python_lww_oracle(events):
    """Reference semantics: apply in LSN order (order-insensitivity of the
    engine means ANY delivery order must converge to this)."""
    state = {}
    for url, text, op, lsn in sorted(events, key=lambda e: e[3]):
        if op == "D":
            state.pop(url, None)
        else:
            state[url] = text
    return set(state.items())


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_randomized_replay_matches_ordered_oracle(spark, tmp_table_dir, seed, mode):
    """Randomized event streams (dup keys, deletes, shuffled epoch
    assignment) must converge to the ordered-apply oracle in both modes,
    with a mid-stream compaction in MOR."""
    import random

    rnd = random.Random(seed)
    events = []
    for lsn in range(120):
        url = f"u{rnd.randrange(12)}"
        op = "D" if rnd.random() < 0.25 else "U"
        events.append((url, None if op == "D" else f"v{lsn}", op, lsn))
    shuffled = events[:]
    rnd.shuffle(shuffled)
    thirds = [shuffled[0::3], shuffled[1::3], shuffled[2::3]]

    t = make_table(spark, os.path.join(tmp_table_dir, f"{mode}-{seed}"))
    for e, chunk in enumerate(thirds):
        t.merge(src(spark, chunk), epoch_id=e, mode=mode, lsn_col="lsn")
        if mode == "mor" and e == 1:
            t.compact()
    got = {(r["url"], r["text"]) for r in t.scan().collect()}
    assert got == _python_lww_oracle(events)
