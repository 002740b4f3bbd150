"""GTID-set interval algebra (MysqlGtIdSet/UUIDSet analog) — pure Python,
driver-side position bookkeeping."""

import pytest
from hypothesis import given, strategies as st

from clever_canal_spark.positions import GtidSet, UUIDSet

SID = "726757ad-4455-11e8-ae04-0242ac110002"
SID2 = "6b4d5ec1-0000-11e8-0000-0242ac110003"


def test_parse_roundtrip():
    us = UUIDSet.parse(f"{SID}:1-3:5:7-9")
    assert us.intervals == [(1, 3), (5, 5), (7, 9)]
    assert str(us) == f"{SID}:1-3:5:7-9"


def test_normalize_merges_adjacent_and_overlapping():
    us = UUIDSet(SID, [(4, 6), (1, 3), (8, 10), (5, 9)])
    assert us.intervals == [(1, 10)]
    us2 = UUIDSet(SID, [(1, 2), (4, 5)])
    assert us2.intervals == [(1, 2), (4, 5)]  # gap of one (3) stays split


def test_update_fills_gaps():
    us = UUIDSet.parse(f"{SID}:1-2:4-5")
    us.update(3)
    assert us.intervals == [(1, 5)]


def test_union_contains_subtract():
    a = GtidSet.parse(f"{SID}:1-10,{SID2}:1-3")
    b = GtidSet.parse(f"{SID}:5-15")
    u = a.union(b)
    assert str(u.sets[SID.lower()]) == f"{SID}:1-15"
    assert u.contains(a) and u.contains(b)
    assert not a.contains(b)
    d = b.subtract(a)
    assert d.sets[SID.lower()].intervals == [(11, 15)]
    assert f"{SID}:7" in a
    assert f"{SID}:11" not in a


def test_set_update_single_gtid():
    s = GtidSet()
    for gno in (1, 2, 5, 3):
        s.update(f"{SID}:{gno}")
    assert s.sets[SID.lower()].intervals == [(1, 3), (5, 5)]
    assert s.sets[SID.lower()].low_watermark() == 3


def test_low_watermark_requires_start_at_one():
    assert UUIDSet(SID, [(2, 9)]).low_watermark() == 0


@given(st.sets(st.integers(min_value=1, max_value=200), max_size=60))
def test_property_update_equals_parse(gnos):
    """Adding gnos one at a time == normalizing them all at once."""
    s = GtidSet()
    for g in sorted(gnos, key=lambda x: (x * 2654435761) % 97):  # scrambled order
        s.update(f"{SID}:{g}")
    if gnos:
        expected = UUIDSet(SID, [(g, g) for g in gnos]).intervals
        assert s.sets[SID.lower()].intervals == expected
        for g in gnos:
            assert f"{SID}:{g}" in s
