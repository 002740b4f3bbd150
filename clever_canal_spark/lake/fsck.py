"""Table integrity checker — the lake's ``fsck``.

Validates the invariants every other component ASSUMES, so an operator
can prove a table healthy after an incident (storage mishap, manual
surgery, a suspected bad deploy) instead of discovering corruption
through wrong query results:

metadata pass (driver-side, zero Spark jobs):

- every manifest entry's data file exists and its footer row count
  matches the manifest's ``rows``,
- bucket ids are within the file's own bucket spec (``nb`` or the
  snapshot's current count — partition evolution aware),
- schema_version references an existing schema,
- lsn_min ≤ lsn_max, key_min ≤ key_max where recorded,
- the committed-epoch registry's watermark is consistent (no retained
  entry at-or-below it),
- named refs resolve to retained snapshots.

deep pass (``deep=True``, one Spark job per bucket spec):

- every ROW actually lives in the bucket its file claims
  (``pmod(xxhash64(key), nb) == bucket``) — the invariant bucket-pruned
  reads stake correctness on,
- recorded key ranges cover the file's actual key values.

Returns a list of finding dicts (empty = healthy); never raises on a
finding — it is a diagnostic, not a gate.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .table import LakeTable

__all__ = ["check_table"]


def _meta_findings(table: LakeTable, snap) -> list[dict]:
    import pyarrow.parquet as pq

    out: list[dict] = []
    schemas = set(snap.schemas)
    for kind, files in (("base", snap.files), ("delta", snap.delta_files)):
        for f in files:
            path = f["path"] if f["path"].startswith("/") else os.path.join(table.path, f["path"])
            ctx = {"kind": kind, "path": f["path"]}
            if not table._fs.exists(path):
                out.append({**ctx, "check": "file-exists", "detail": "missing data file"})
                continue
            try:
                with table._fs.open_binary(path) as fh:
                    n = pq.ParquetFile(fh).metadata.num_rows
                if f.get("rows") is not None and n != f["rows"]:
                    out.append({**ctx, "check": "row-count",
                                "detail": f"manifest={f['rows']} footer={n}"})
            except Exception as e:  # torn/corrupt footer
                out.append({**ctx, "check": "footer-readable", "detail": str(e)})
            nb = f.get("nb") or snap.n_buckets
            if not (0 <= f["bucket"] < nb):
                out.append({**ctx, "check": "bucket-range",
                            "detail": f"bucket={f['bucket']} nb={nb}"})
            if str(f.get("schema_version")) not in schemas:
                out.append({**ctx, "check": "schema-version",
                            "detail": f"unknown schema_version={f.get('schema_version')}"})
            if (f.get("lsn_min") is not None and f.get("lsn_max") is not None
                    and f["lsn_min"] > f["lsn_max"]):
                out.append({**ctx, "check": "lsn-range",
                            "detail": f"{f['lsn_min']} > {f['lsn_max']}"})
            try:
                if (f.get("key_min") is not None and f.get("key_max") is not None
                        and f["key_min"] > f["key_max"]):
                    out.append({**ctx, "check": "key-range",
                                "detail": f"{f['key_min']!r} > {f['key_max']!r}"})
            except TypeError:
                pass
    wm = snap.epoch_watermark
    if wm >= 0:
        from .table import _epoch_prefix

        stale = [k for k in snap.committed_epochs
                 if (_epoch_prefix(k) is not None and _epoch_prefix(k) <= wm)]
        if stale:
            out.append({"check": "epoch-watermark",
                        "detail": f"entries at-or-below watermark {wm}: {sorted(stale)[:5]}"})
    for name, ref in table.list_refs().items():
        try:
            table._snapshot_retained(ref["version"])
        except Exception:
            out.append({"check": "ref-resolves",
                        "detail": f"tag {name!r} -> expired v{ref['version']}"})
    return out


def _deep_findings(table: LakeTable, snap) -> list[dict]:
    out: list[dict] = []
    # group by (bucket spec, schema_version): files written under an older
    # schema may carry the bucket-key columns under their PRE-RENAME names
    # (rename is metadata-only, by field id) — one mixed read would either
    # fail or hash nulls and report false corruption on a healthy table.
    by_grp: dict[tuple[int, int], list[dict]] = {}
    for f in snap.files + snap.delta_files:
        nb = f.get("nb") or snap.n_buckets
        by_grp.setdefault((nb, f["schema_version"]), []).append(f)
    cur_by_name = {f["name"]: f for f in snap.current_fields()}
    for (nb, sv), files in by_grp.items():
        old_by_id = {f["id"]: f for f in snap.schemas.get(str(sv), [])}
        key_cols = []
        for name in snap.bucket_key:
            o = old_by_id.get(cur_by_name[name]["id"]) if name in cur_by_name else None
            if o is None:
                key_cols = None  # key column absent in this era — cannot check
                break
            key_cols.append(F.col(o["name"]).cast(cur_by_name[name]["type"]))
        if key_cols is None:
            continue
        key0 = key_cols[0]
        claimed = {
            (f["path"] if f["path"].startswith("/") else os.path.join(table.path, f["path"])):
            f["bucket"]
            for f in files if table._fs.exists(
                f["path"] if f["path"].startswith("/") else os.path.join(table.path, f["path"]))
        }
        if not claimed:
            continue
        df = table.spark.read.parquet(*claimed.keys()).select(
            F.input_file_name().alias("__file"),
            F.pmod(F.xxhash64(*key_cols), F.lit(nb)).alias("__b"),
            key0.alias("__k"),
        )
        agg = df.groupBy("__file", "__b").agg(
            F.count("*").alias("n"), F.min("__k").alias("lo"), F.max("__k").alias("hi")
        ).collect()
        for r in agg:
            # input_file_name returns a URI; compare by basename
            base = os.path.basename(r["__file"])
            match = [p for p in claimed if os.path.basename(p) == base]
            if not match:
                continue
            want = claimed[match[0]]
            if r["__b"] != want:
                out.append({
                    "check": "row-bucket", "path": base,
                    "detail": f"{r['n']} row(s) hash to bucket {r['__b']}, "
                              f"file claims {want} (nb={nb})",
                })
    return out


def check_table(table: LakeTable, deep: bool = False) -> list[dict]:
    """Run the integrity checks; see module docstring. Empty list =
    healthy."""
    snap = table.snapshot()
    out = _meta_findings(table, snap)
    if deep:
        out.extend(_deep_findings(table, snap))
    return out
