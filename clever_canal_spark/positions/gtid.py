"""GTID-set parsing and interval algebra — the MysqlGtIdSet/UUIDSet analog.

The reference resumes a GTID-positioned dump from a GTID set string like
``726757ad-4455-11e8-ae04-0242ac110002:1-3:5-9,6b4...:1-30`` (text grammar
per MySQL's gtid_set; UUIDSet.java:14-120 parses one UUID's interval list,
MysqlGtIdSet.java parses the comma-joined set and exposes union/contains
for resume-point arithmetic; GtidLogEvent.java carries one (sid, gno) per
transaction).

The engine uses this driver-side: the follower's resume point per shard is
a GTID set; a delivered transaction's (server_uuid, txn_id) adds to it;
"have I seen this txn" is ``in``; the safe tombstone-GC watermark across
shards is derivable from the sets' low frontiers. Pure Python — position
bookkeeping is metadata, never row data.

Semantics (matching the reference):
- intervals are CLOSED [start, stop] in the text form; adjacent/overlapping
  intervals normalize into one (1-3 + 4-5 → 1-5);
- ``update(gno)`` adds a single transaction number;
- union merges per-UUID interval lists;
- ``contains`` is subset; ``subtract`` returns what's in self but not other.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _normalize(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + coalesce overlapping/adjacent closed intervals."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(intervals):
        if s > e:
            raise ValueError(f"bad interval {s}-{e}")
        if out and s <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@dataclass
class UUIDSet:
    """One server UUID's transaction intervals (UUIDSet.java:14-120)."""

    sid: str
    intervals: list[tuple[int, int]] = field(default_factory=list)

    def __post_init__(self):
        self.sid = self.sid.lower()
        self.intervals = _normalize(self.intervals)

    @staticmethod
    def parse(text: str) -> "UUIDSet":
        """``uuid:1-3:5:7-9`` → UUIDSet (single number = 1-wide interval)."""
        parts = text.strip().split(":")
        if len(parts) < 2:
            raise ValueError(f"not a uuid:intervals form: {text!r}")
        ivs = []
        for p in parts[1:]:
            if "-" in p:
                a, b = p.split("-", 1)
                ivs.append((int(a), int(b)))
            else:
                ivs.append((int(p), int(p)))
        return UUIDSet(parts[0], ivs)

    def __str__(self) -> str:
        return self.sid + "".join(
            f":{s}" if s == e else f":{s}-{e}" for s, e in self.intervals
        )

    def update(self, gno: int) -> None:
        self.intervals = _normalize(self.intervals + [(gno, gno)])

    def union(self, other: "UUIDSet") -> "UUIDSet":
        if other.sid != self.sid:
            raise ValueError("union across different sids")
        return UUIDSet(self.sid, self.intervals + other.intervals)

    def contains_gno(self, gno: int) -> bool:
        return any(s <= gno <= e for s, e in self.intervals)

    def contains(self, other: "UUIDSet") -> bool:
        return all(
            any(s <= os and oe <= e for s, e in self.intervals)
            for os, oe in other.intervals
        )

    def subtract(self, other: "UUIDSet") -> "UUIDSet":
        """Intervals in self not covered by other."""
        result = []
        for s, e in self.intervals:
            segs = [(s, e)]
            for os, oe in other.intervals:
                nxt = []
                for a, b in segs:
                    if oe < a or os > b:
                        nxt.append((a, b))
                        continue
                    if a < os:
                        nxt.append((a, os - 1))
                    if oe < b:
                        nxt.append((oe + 1, b))
                segs = nxt
            result.extend(segs)
        return UUIDSet(self.sid, result)

    def low_watermark(self) -> int:
        """Highest gno G such that every gno ≤ G is contained (0 if the
        first interval doesn't start at 1) — the contiguous frontier."""
        if not self.intervals or self.intervals[0][0] > 1:
            return 0
        return self.intervals[0][1]


@dataclass
class GtidSet:
    """A full gtid_set: {sid → UUIDSet} (MysqlGtIdSet.java)."""

    sets: dict[str, UUIDSet] = field(default_factory=dict)

    @staticmethod
    def parse(text: str) -> "GtidSet":
        out = GtidSet()
        for part in (text or "").replace("\n", "").split(","):
            part = part.strip()
            if not part:
                continue
            us = UUIDSet.parse(part)
            out.sets[us.sid] = us.union(out.sets[us.sid]) if us.sid in out.sets else us
        return out

    def __str__(self) -> str:
        return ",".join(str(self.sets[sid]) for sid in sorted(self.sets))

    def update(self, gtid: str) -> None:
        """Add one transaction: ``uuid:gno`` (the GtidLogEvent shape)."""
        sid, _, gno = gtid.rpartition(":")
        sid = sid.lower()
        if sid in self.sets:
            self.sets[sid].update(int(gno))
        else:
            self.sets[sid] = UUIDSet(sid, [(int(gno), int(gno))])

    def union(self, other: "GtidSet") -> "GtidSet":
        out = GtidSet(dict(self.sets))
        for sid, us in other.sets.items():
            out.sets[sid] = out.sets[sid].union(us) if sid in out.sets else us
        return out

    def contains(self, other: "GtidSet") -> bool:
        return all(
            sid in self.sets and self.sets[sid].contains(us)
            for sid, us in other.sets.items()
        )

    def subtract(self, other: "GtidSet") -> "GtidSet":
        out = GtidSet()
        for sid, us in self.sets.items():
            rem = us.subtract(other.sets[sid]) if sid in other.sets else us
            if rem.intervals:
                out.sets[sid] = rem
        return out

    def __contains__(self, gtid: str) -> bool:
        sid, _, gno = gtid.rpartition(":")
        us = self.sets.get(sid.lower())
        return us is not None and us.contains_gno(int(gno))
