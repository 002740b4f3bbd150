"""Count-min sketch operator: never-undercount guarantee, merge-by-sum
(the distributed contract), turnstile deletes, and hand-checked slot
hashing."""

import hashlib

import pyspark.sql.functions as F

from clever_canal_spark.operators.sketch import cms_add, cms_estimate


def _items(spark, rows):
    return spark.createDataFrame(rows, "g string, item string")


def test_slot_hash_hand_case(spark):
    # One item, d=2: recompute both seeded slots in Python (md5-u32 of
    # '<depth>:<item>') and compare against the sketch rows.
    rows = cms_add(_items(spark, [("a", "hello")]), ["g"], "item", d=2, w=64).collect()
    want = {
        (i, int(hashlib.md5(f"{i}:hello".encode()).hexdigest()[:8], 16) % 64)
        for i in range(2)
    }
    assert {(r["depth"], r["slot"]) for r in rows} == want
    assert all(r["cnt"] == 1 for r in rows)


def test_estimate_never_undercounts(spark):
    # Tiny w forces collisions; min-over-d must still be >= true count
    # for every probed item (all weights positive).
    data = [("a", f"item{i % 30}") for i in range(900)]
    df = _items(spark, data)
    sketch = cms_add(df, ["g"], "item", d=3, w=16)
    probes = df.groupBy("g", "item").agg(F.count("*").alias("exact"))
    est = cms_estimate(sketch, probes, "item", ["g"], d=3, w=16).collect()
    assert len(est) == 30
    assert all(r["cms_count"] >= r["exact"] for r in est)
    # with w comfortably above the distinct count the estimate is exact
    sketch_wide = cms_add(df, ["g"], "item", d=3, w=4096)
    est_wide = cms_estimate(sketch_wide, probes, "item", ["g"], d=3, w=4096).collect()
    assert all(r["cms_count"] == r["exact"] for r in est_wide)


def test_merge_equals_rebuild(spark):
    # Per-slot SUM of two shards' sketches == sketch of the concatenated
    # data: the linearity that makes cross-shard rollups sketch-only.
    left = [("x", f"i{i % 20}") for i in range(300)]
    right = [("x", f"i{(i * 7) % 35}") for i in range(400)]
    sa = cms_add(_items(spark, left), ["g"], "item", d=3, w=32)
    sb = cms_add(_items(spark, right), ["g"], "item", d=3, w=32)
    merged = (
        sa.unionByName(sb)
        .groupBy("g", "depth", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    rebuilt = cms_add(_items(spark, left + right), ["g"], "item", d=3, w=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_turnstile_deletes(spark):
    # CDC mapping I=+1 / D=-1: inserting then deleting a key nets its
    # estimate back to the collision floor (0 when w is wide enough) —
    # the property HLL's monotone registers cannot provide.
    rows = [("x", "keep", "I")] * 5 + [("x", "gone", "I")] * 3 + [("x", "gone", "D")] * 3
    df = spark.createDataFrame(rows, "g string, item string, op string")
    sketch = cms_add(
        df, ["g"], "item", d=3, w=1024,
        weight_sql="CASE WHEN op = 'D' THEN CAST(-1 AS BIGINT) ELSE CAST(1 AS BIGINT) END",
    )
    probes = spark.createDataFrame([("x", "keep"), ("x", "gone")], "g string, item string")
    est = {r["item"]: r["cms_count"] for r in
           cms_estimate(sketch, probes, "item", ["g"], d=3, w=1024).collect()}
    assert est == {"keep": 5, "gone": 0}


def test_unseen_item_estimates_zero(spark):
    df = _items(spark, [("a", "present")])
    sketch = cms_add(df, ["g"], "item", d=4, w=4096)
    probes = spark.createDataFrame([("a", "absent")], "g string, item string")
    est = cms_estimate(sketch, probes, "item", ["g"], d=4, w=4096).collect()
    assert est[0]["cms_count"] == 0


def test_sketch_size_is_bounded(spark):
    # 10k rows over 500 distinct items: the sketch holds at most d*w rows
    # per group — the reason the shuffle stays flat as input grows.
    data = [("a", f"i{i % 500}") for i in range(10_000)]
    sketch = cms_add(_items(spark, data), ["g"], "item", d=4, w=64)
    assert sketch.count() <= 4 * 64


def test_probe_plan_broadcasts_sketch(spark):
    # The sketch side of the lookup join must be broadcast: point queries
    # never shuffle the probe side.
    df = _items(spark, [("a", f"i{i}") for i in range(50)])
    sketch = cms_add(df, ["g"], "item", d=2, w=32)
    probes = df.distinct()
    plan = cms_estimate(sketch, probes, "item", ["g"], d=2, w=32)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
