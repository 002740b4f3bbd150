"""Maintenance advisor — what upkeep is DUE, from metadata alone.

``check_table`` (fsck) answers "is this table broken?"; the advisor
answers the operational sibling: "what maintenance should run next?"
Every signal reads the manifest log and directory listings only — ZERO
Spark jobs, so a scheduler can poll it every few minutes against
thousands of tables (the Iceberg-maintenance / OPTIMIZE-advisor shape;
the reference has no table-maintenance surface at all — its store is a
ring buffer).

Findings are ``{action, severity, metric, detail}`` rows, ``severity``
∈ {"info", "advise"}: *advise* means running ``action`` now has a
concrete payoff; *info* is state worth seeing on a dashboard. Ordering
is deterministic (by action name).

Signals:

- ``compact`` — pending MOR delta files (every scan pays the reconcile
  until folded) and small base files (rows < ~1/8 of the per-bucket
  mean; each file is a task + a footer read at scan time).
- ``migrate_bucket_spec`` — files still written under an older bucket
  spec after ``rebucket``: reads resolve them correctly but prune on
  the OLD modulus, so point reads touch more files than n_buckets
  suggests.
- ``expire_snapshots`` — retained manifest versions beyond
  ``keep_target`` (each one pins its data files against vacuum).
- ``vacuum`` — data files on disk referenced by NO retained snapshot
  (crash-killed writes, post-expire garbage).
- ``set_stats_cols`` — info: no column stats recorded, so
  ``scan_where`` cannot file-prune beyond the bucket key.
- ``tags`` — info: named refs pin their versions against expiry.
"""

from __future__ import annotations

import os

from .table import _DATA_DIR, LakeTable


def _finding(action: str, severity: str, metric, detail: str) -> dict:
    return {"action": action, "severity": severity, "metric": metric, "detail": detail}


def maintenance_report(
    table: LakeTable,
    keep_target: int = 32,
    small_file_frac: float = 0.125,
) -> list[dict]:
    """Advisory findings for ``table`` (possibly empty). Metadata-only:
    no Spark job is ever launched; cost is O(retained snapshots +
    directory entries)."""
    snap = table.snapshot()
    out: list[dict] = []

    # --- compact: pending deltas ---
    if snap.delta_files:
        buckets = {f["bucket"] for f in snap.delta_files}
        rows = sum(f.get("rows") or 0 for f in snap.delta_files)
        out.append(
            _finding(
                "compact",
                "advise",
                len(snap.delta_files),
                f"{len(snap.delta_files)} MOR delta files ({rows} rows) pending "
                f"across {len(buckets)} buckets — every scan reconciles them "
                "until compact() folds them into the bases",
            )
        )

    # --- compact: small base files ---
    by_bucket: dict[tuple, list[int]] = {}
    for f in snap.files:
        r = f.get("rows")
        if r is not None:
            by_bucket.setdefault((f.get("nb") or snap.n_buckets, f["bucket"]), []).append(r)
    small = 0
    for rows_list in by_bucket.values():
        if len(rows_list) < 2:
            continue
        mean = sum(rows_list) / len(rows_list)
        small += sum(1 for r in rows_list if r < mean * small_file_frac)
    if small:
        out.append(
            _finding(
                "compact",
                "advise",
                small,
                f"{small} base files hold <{small_file_frac:.0%} of their "
                "bucket's mean rows — each is a scan task + footer read; "
                "compact() coalesces them",
            )
        )

    # --- migrate_bucket_spec: stale-spec files ---
    stale = [
        f for f in snap.files + snap.delta_files
        if (f.get("nb") or snap.n_buckets) != snap.n_buckets
    ]
    if stale:
        out.append(
            _finding(
                "migrate_bucket_spec",
                "advise",
                len(stale),
                f"{len(stale)} files still under an older bucket spec — "
                "point reads prune on the old modulus until "
                "migrate_bucket_spec() rewrites them",
            )
        )

    # --- expire_snapshots: retained manifest versions ---
    versions = [
        n for n in table._fs.listdir(table._log_path)
        if n.startswith("v") and n.endswith(".json")
    ]
    if len(versions) > keep_target:
        out.append(
            _finding(
                "expire_snapshots",
                "advise",
                len(versions),
                f"{len(versions)} manifest versions retained (target "
                f"{keep_target}) — each pins its data files against vacuum",
            )
        )

    # --- vacuum: unreferenced data files on disk ---
    referenced: set[str] = set()
    for name in versions:
        s = table.snapshot(int(name[1:9]))
        referenced.update(f["path"] for f in s.files + s.delta_files)
    try:
        on_disk = table._fs.listdir(table._data_path)
    except FileNotFoundError:
        on_disk = []
    orphans = sum(
        1 for fn in on_disk if os.path.join(_DATA_DIR, fn) not in referenced
    )
    if orphans:
        out.append(
            _finding(
                "vacuum",
                "advise",
                orphans,
                f"{orphans} data files on disk referenced by no retained "
                "snapshot — vacuum() removes them after the in-flight TTL",
            )
        )

    # --- info: stats columns / tags ---
    if not snap.stats_cols and (snap.files or snap.delta_files):
        out.append(
            _finding(
                "set_stats_cols",
                "info",
                0,
                "no column stats recorded — scan_where cannot file-prune "
                "beyond the bucket key; set_stats_cols() enables it at the "
                "next rewrite",
            )
        )
    refs = table.list_refs()
    if refs:
        pinned = sorted({int(r["version"]) for r in refs.values()})
        out.append(
            _finding(
                "tags",
                "info",
                len(refs),
                f"{len(refs)} named refs pin versions {pinned} against "
                "expire_snapshots",
            )
        )
    return sorted(out, key=lambda f: (f["action"], f["detail"]))


# executable order: compact folds MOR deltas (so the expire that follows
# can drop the pre-compaction snapshots), migrate rewrites stale-spec
# files, expire releases old manifests' pins, vacuum sweeps what those
# pins were holding. Info-severity findings (set_stats_cols needs a
# human column choice; tags are a statement of fact) are never applied.
_APPLY_ORDER = ("compact", "migrate_bucket_spec", "expire_snapshots", "vacuum")


def apply_maintenance(
    table: LakeTable,
    findings: list[dict] | None = None,
    keep_target: int = 32,
    vacuum_ttl_s: float = 3600.0,
) -> list[dict]:
    """Execute the advise-severity findings in dependency order; returns
    ``{action, result}`` rows for what actually ran. Safe by
    construction: each action is the same crash-safe public API an
    operator would call by hand (``compact`` / ``migrate_bucket_spec`` /
    ``expire_snapshots(keep_target)`` / ``vacuum(ttl)``), tags keep
    their pins (``expire_snapshots`` refuses to drop tagged versions),
    and ``vacuum`` honors the in-flight TTL — pass a smaller
    ``vacuum_ttl_s`` only when no writer can be live. Re-run
    ``maintenance_report`` afterwards to see what cleared."""
    if findings is None:
        findings = maintenance_report(table, keep_target=keep_target)
    due = {f["action"] for f in findings if f["severity"] == "advise"}
    ran: list[dict] = []
    for action in _APPLY_ORDER:
        if action not in due:
            continue
        if action == "compact":
            v = table.compact()
            ran.append({"action": action,
                        "result": f"v{v}" if v else "no deltas"})
        elif action == "migrate_bucket_spec":
            v = table.migrate_bucket_spec()
            ran.append({"action": action,
                        "result": f"v{v}" if v else "nothing stale"})
        elif action == "expire_snapshots":
            gone = table.expire_snapshots(keep_last=keep_target)
            ran.append({"action": action, "result": f"expired {len(gone)}"})
        elif action == "vacuum":
            r = table.vacuum(orphan_ttl_s=vacuum_ttl_s)
            ran.append({"action": action,
                        "result": f"swept {len(r['removed_files'])} files"})
    return ran
