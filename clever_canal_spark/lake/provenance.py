"""Row-level provenance: which file, commit, and ingest epoch produced
the current winner of a key — the per-row drill-down of the table-level
``lineage()`` view (north-star requirement: per-partition lineage from
source LSN range to snapshot; this answers the auditor's follow-up,
"and THIS row?").

Cost shape: one 1-row Spark job to hash the key (the same probe
``lookup`` uses) plus one bucket-pruned, range-pruned, bloom-pruned
reconcile of that key — identical I/O to a point read — then pure
manifest walking: the candidate files come from footer stats, the
introducing commit from the snapshot chain, and the ingest epoch from
the committed-epoch registry's recorded [lsn_min, lsn_max]. Nothing
table-sized anywhere.

Reference: Canal tracks per-batch position ranges in its meta manager
(FileMixedMetaManager.java:35-299) so an operator can answer "which
batch delivered this" — here the question extends through the lake to
the physical file and commit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .table import LakeTable, _bucket_pick, _key_range_pred


def row_provenance(table: LakeTable, **key_vals) -> dict:
    """Provenance of the current winner for ``key_vals`` (all bucket-key
    columns required, non-bucket merge-key columns optional — same
    contract as ``lookup``). Returns::

        {"found": bool,
         "row": {"lsn": int, "op": "U" | "D"},          # winner, if any
         "files": [{"path", "kind", "bucket", "lsn_min", "lsn_max",
                    "introduced_version", "introduced_operation",
                    "committed_at_ms"}, ...],           # can-contain set
         "epochs": [{"epoch_id", ...registry entry}, ...]}  # lsn-range hits

    ``files`` is the pruned can-contain candidate set (bucket ∩ key-range
    ∩ bloom ∩ winner-lsn-range) — at most a handful of files between
    compactions; ``epochs`` lists every registry entry whose recorded
    LSN range covers the winner's LSN (one, unless shard feeds
    interleave ranges). A tombstoned key reports its delete winner
    (op='D') — provenance of an absence is exactly what an erasure
    audit asks for."""
    snap = table.snapshot()
    missing = [c for c in snap.bucket_key if c not in key_vals]
    if missing:
        raise ValueError(f"provenance needs all bucket key columns; missing {missing}")
    cols = {f["name"]: f["type"] for f in snap.current_fields()}
    probe = table.spark.createDataFrame(
        [tuple(key_vals[c] for c in snap.bucket_key)],
        ", ".join(f"{c} {cols[c]}" for c in snap.bucket_key),
    )
    kc = snap.bucket_key[0]
    pr = probe.select(
        table._bucket_col(snap).alias("b"),
        F.xxhash64(kc).alias("h1"),
        F.xxhash64(kc, F.lit(1)).alias("h2"),
    ).collect()[0]
    bucket = int(pr["b"])
    range_pred = _key_range_pred([key_vals[kc]])
    bloom_pred = table._bloom_pred([(pr["h1"], pr["h2"])])
    winner = table._reconciled(
        snap, buckets={bucket}, keep_deletes=True,
        file_pred=lambda f: range_pred(f) and bloom_pred(f),
    )
    for c, v in key_vals.items():
        winner = winner.filter(F.col(c) == F.lit(v))
    hit = winner.select("__lsn", "__op").collect()
    if not hit:
        return {"found": False, "row": None, "files": [], "epochs": []}
    lsn, op = int(hit[0]["__lsn"]), hit[0]["__op"]

    def lsn_pred(f: dict) -> bool:
        lo, hi = f.get("lsn_min"), f.get("lsn_max")
        if lo is None or hi is None:
            return True  # no stats recorded: can-contain, never skip
        return int(lo) <= lsn <= int(hi)

    cand = {
        f["path"]: {**f, "kind": kind}
        for kind, files in (("base", snap.files), ("delta", snap.delta_files))
        for f in _bucket_pick(files, {bucket}, snap.n_buckets)
        if range_pred(f) and bloom_pred(f) and lsn_pred(f)
    }
    # introducing commit per candidate: the OLDEST retained snapshot
    # listing the path — walk the whole chain newest→oldest, overwriting,
    # so the final sighting is the oldest (expired history truncates the
    # walk and the oldest RETAINED sighting stands)
    intro: dict[str, tuple] = {}
    v, s = snap.version, snap
    while True:
        present = {f["path"] for f in s.files + s.delta_files}
        for p in cand:
            if p in present:
                intro[p] = (s.version, s.operation, s.committed_at_ms)
        v = s.parent
        if v is None:
            break
        try:
            s = table.snapshot(v)
        except FileNotFoundError:
            break
    files = [
        {
            "path": p,
            "kind": f["kind"],
            "bucket": f["bucket"],
            "lsn_min": f.get("lsn_min"),
            "lsn_max": f.get("lsn_max"),
            "introduced_version": intro.get(p, (None,))[0],
            "introduced_operation": intro.get(p, (None, None))[1],
            "committed_at_ms": intro.get(p, (None, None, None))[2],
        }
        for p, f in sorted(cand.items())
    ]
    epochs = [
        {"epoch_id": eid, **entry}
        for eid, entry in sorted(snap.committed_epochs.items())
        if entry.get("lsn_min") is not None
        and entry.get("lsn_max") is not None
        and int(entry["lsn_min"]) <= lsn <= int(entry["lsn_max"])
    ]
    return {"found": True, "row": {"lsn": lsn, "op": op},
            "files": files, "epochs": epochs}
