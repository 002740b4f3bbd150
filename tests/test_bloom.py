"""Bloom filter operator: the no-false-negative guarantee, merge-by-union
(the distributed contract), false-positive sanity, and the broadcast
probe plan."""

import hashlib

import pyspark.sql.functions as F

from clever_canal_spark.operators.sketch import bloom_bits, bloom_might_contain


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "item string")


def test_bit_positions_hand_case(spark):
    # one item, k=2: recompute both seeded positions in Python (md5-u32 of
    # '<seed>:<item>' mod m) and compare against the bit table
    bits = {r["bit"] for r in bloom_bits(_items(spark, ["hello"]), "item",
                                         m_bits=64, k=2).collect()}
    want = {
        int(hashlib.md5(f"{i}:hello".encode()).hexdigest()[:8], 16) % 64
        for i in range(2)
    }
    assert bits == want


def test_no_false_negatives(spark):
    # every inserted item must test positive, at any fill ratio
    vals = [f"url{i}" for i in range(300)]
    df = _items(spark, vals)
    bits = bloom_bits(df, "item", m_bits=512, k=3)  # deliberately saturated
    out = bloom_might_contain(bits, df, "item", m_bits=512, k=3).collect()
    assert len(out) == 300
    assert all(r["might_contain"] == 1 for r in out)


def test_definitely_absent_and_fp_rate(spark):
    # at m ~ 27n bits / k=3 the fp rate is ~0.1%: most absent probes say 0
    present = _items(spark, [f"url{i}" for i in range(300)])
    absent = _items(spark, [f"other{i}" for i in range(300)])
    bits = bloom_bits(present, "item", m_bits=8192, k=3)
    out = bloom_might_contain(bits, absent, "item", m_bits=8192, k=3).collect()
    fps = sum(r["might_contain"] for r in out)
    assert fps <= 15  # ~0.3 expected; 15 = far beyond any plausible noise
    # and an empty filter rejects everything
    empty = bloom_bits(_items(spark, []), "item", m_bits=8192, k=3)
    out2 = bloom_might_contain(empty, absent.limit(5), "item", m_bits=8192, k=3).collect()
    assert all(r["might_contain"] == 0 for r in out2)


def test_merge_equals_rebuild(spark):
    # DISTINCT of two shards' bit tables == bits of the concatenated data
    a = [f"u{i}" for i in range(100)]
    b = [f"u{i}" for i in range(50, 200)]
    ba = bloom_bits(_items(spark, a), "item", m_bits=1024, k=3)
    bb = bloom_bits(_items(spark, b), "item", m_bits=1024, k=3)
    merged = sorted(r["bit"] for r in ba.unionByName(bb).distinct().collect())
    rebuilt = sorted(
        r["bit"] for r in bloom_bits(_items(spark, a + b), "item",
                                     m_bits=1024, k=3).collect()
    )
    assert merged == rebuilt


def test_probe_plan_broadcasts_bits(spark):
    df = _items(spark, [f"u{i}" for i in range(50)])
    bits = bloom_bits(df, "item", m_bits=1024, k=3)
    plan = bloom_might_contain(bits, df, "item", m_bits=1024, k=3)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
