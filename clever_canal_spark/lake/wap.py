"""Write-audit-publish (WAP) branches for :class:`~.table.LakeTable`.

The Iceberg WAP pattern (stage a commit under ``wap.id``, audit it, then
``cherrypick`` it onto main) re-expressed on the snapshot-log lake:

- :func:`fork_branch` — shallow-clone main into ``{table}/_branches/{name}``
  (zero data copied; the branch's first snapshot references main's files by
  absolute path). The branch is a full LakeTable: run the real ingest
  against it (``apply_epoch`` / ``merge(mode='mor')``), scan it, validate it.
- *audit* — any read on the branch table. Nothing special: the branch IS
  the staging area, queryable with every table surface.
- :func:`publish_branch` — fold the branch's additively-introduced file
  entries (appends + MOR deltas) into ONE child snapshot on main.
  **Metadata-only and crash-atomic**: the branch lives inside the main
  table dir, so main references the published files in place
  (``_branches/{name}/data/...``) — no data moves, and the publish either
  commits its single snapshot or changes nothing. After publish the branch
  log is removed ("sealed"); the data dir stays until main's compaction
  rewrites those rows and :meth:`~.table.LakeTable.vacuum` sweeps it.
- :func:`drop_branch` — discard an unpublished branch wholesale.

Publishable branches are ADDITIVE: MOR merges (``compact_every=0``) and
appends. A branch that compacted, COW-merged, changed schema, or truncated
cannot be re-parented file-by-file — publish raises :class:`PublishConflict`
(the same restriction Iceberg's cherrypick has: only appends and dynamic
overwrites re-apply). Exactly-once carries through: the fork copies main's
committed-epoch registry (so replaying an already-on-main epoch against the
branch no-ops) and publish merges the branch's new epoch entries back, so
a post-publish replay of the branch's epochs against main no-ops too.

Reference semantics: Canal stages a batch, lets the consumer inspect it,
then acks or rolls back (CanalServerWithEmbedded.java:253-398 get/ack/
rollback); WAP is that contract at lake-commit granularity — audit is the
inspection, publish the ack, drop_branch the rollback.
"""

from __future__ import annotations

import json
import os
import time

from .table import _BRANCH_DIR, _LOG_DIR, LakeTable

_META = "branch.json"


class PublishConflict(RuntimeError):
    """The branch cannot be folded onto main as-is (main advanced under
    ``require_fast_forward``, non-additive branch history, schema/truncate
    divergence, or an epoch landed on both sides)."""


def _branch_path(main: LakeTable, name: str) -> str:
    LakeTable._check_ref_name(name)
    return os.path.join(main.path, _BRANCH_DIR, name)


def _pin_tag(name: str) -> str:
    return f"wap-{name}"


def fork_branch(main: LakeTable, name: str) -> LakeTable:
    """Create branch ``name`` at main's current version and return it as a
    LakeTable. Zero-copy (see :meth:`~.table.LakeTable.clone_to`).

    The fork version is pinned with an internal ``wap-{name}`` tag: the
    branch references main's data files by absolute path, and without the
    pin a main-side ``expire_snapshots`` + ``compact`` + ``vacuum`` cycle
    could delete files only the branch still reads. The pin keeps the
    forked snapshot retained (its files stay in vacuum's referenced set)
    and is released by :func:`publish_branch` / :func:`drop_branch`."""
    bpath = _branch_path(main, name)
    parent = main.current_version()
    main.create_tag(_pin_tag(name), parent)
    try:
        bt = main.clone_to(bpath, fs=main._fs)
    except BaseException:
        main.drop_tag(_pin_tag(name))
        raise
    bt._fs.write_text_exclusive(
        os.path.join(bt._log_path, _META),
        json.dumps({
            "name": name, "main_path": main.path, "parent_version": parent,
            "created_at_ms": int(time.time() * 1000),
        }),
    )
    return bt


def branch_table(main: LakeTable, name: str) -> LakeTable:
    """Open an existing (unsealed) branch as a LakeTable."""
    bpath = _branch_path(main, name)
    bt = LakeTable(main.spark, bpath, fs=main._fs)
    if not bt.exists():
        raise ValueError(f"branch {name!r} does not exist (or was published)")
    return bt


def list_branches(main: LakeTable) -> dict[str, dict]:
    """Active branches → their fork metadata. Sealed (published) branch
    dirs awaiting vacuum are excluded."""
    root = os.path.join(main.path, _BRANCH_DIR)
    out: dict[str, dict] = {}
    if not main._fs.isdir(root):
        return out
    for name in main._fs.listdir(root):
        meta = os.path.join(root, name, _LOG_DIR, _META)
        if main._fs.exists(meta):
            out[name] = json.loads(main._fs.read_text(meta))
    return out


def _drop_pin(main: LakeTable, name: str) -> None:
    try:
        main.drop_tag(_pin_tag(name))
    except ValueError:
        pass  # pin already released (or pre-pin branch) — fine


def drop_branch(main: LakeTable, name: str) -> None:
    """Discard an UNPUBLISHED branch (the WAP rollback). A sealed branch's
    leftover data dir belongs to main — vacuum retires it, not this."""
    bpath = _branch_path(main, name)
    if not main._fs.isdir(os.path.join(bpath, _LOG_DIR)):
        raise ValueError(f"branch {name!r} is not an active branch")
    main._fs.rmtree(bpath)
    _drop_pin(main, name)


def _entry_paths(entries: list[dict]) -> set[str]:
    return {f["path"] for f in entries}


def publish_branch(
    main: LakeTable,
    name: str,
    *,
    require_fast_forward: bool = True,
    seal: bool = True,
) -> int:
    """Fold branch ``name``'s additive history into one snapshot on main;
    return the new main version.

    ``require_fast_forward=True`` (default) demands main hasn't advanced
    since the fork — the published state is then EXACTLY the audited branch
    state. With ``False``, the branch's introduced files re-parent onto
    current main (valid because entries are additive and LWW reconciles by
    ``__lsn`` at read time — same guarantee that makes multi-shard
    out-of-order delivery converge), refused only if the two histories
    applied the same epoch or diverged on schema/truncate.

    ``seal=True`` removes the branch log after the commit (the branch name
    is finished; its data dir is swept by vacuum once compaction ages it
    out). Crash-safety: the only mutation of main is the single snapshot
    commit; a crash before it leaves the branch intact and main untouched,
    after it the seal/cleanup is retryable garbage collection.
    """
    bt = branch_table(main, name)
    meta = json.loads(main._fs.read_text(os.path.join(bt._log_path, _META)))
    parent_v = int(meta["parent_version"])
    base = bt.snapshot(1)
    tip = bt.snapshot()

    # -- additivity / divergence checks on the branch ----------------------
    if tip.schema_version != base.schema_version or tip.schemas != base.schemas:
        raise PublishConflict(
            f"branch {name!r} changed schema; publish supports data-only "
            "branches — apply DDL to main and re-fork"
        )
    if tip.truncate_lsn != base.truncate_lsn:
        raise PublishConflict(f"branch {name!r} truncated; not publishable")
    if tip.n_buckets != base.n_buckets:
        raise PublishConflict(
            f"branch {name!r} rebucketed; publish supports data-only "
            "branches — rebucket main and re-fork"
        )
    if tip.epoch_watermark != base.epoch_watermark:
        raise PublishConflict(
            f"branch {name!r} pruned its epoch registry; not reconcilable"
        )
    base_files, base_deltas = _entry_paths(base.files), _entry_paths(base.delta_files)
    if not (base_files <= _entry_paths(tip.files)
            and base_deltas <= _entry_paths(tip.delta_files)):
        raise PublishConflict(
            f"branch {name!r} rewrote shared files (COW merge or compaction "
            "ran on the branch); only additive branches publish — merge with "
            "mode='mor', compact_every=0 on branches"
        )

    def _rebase(entries: list[dict], base_paths: set[str]) -> list[dict]:
        out = []
        for f in entries:
            if f["path"] in base_paths:
                continue
            # introduced on the branch → branch-relative; main references it
            # in place under _branches/{name}/
            p = f["path"]
            out.append({**f, "path": p if p.startswith("/")
                        else os.path.join(_BRANCH_DIR, name, p)})
        return out

    new_files = _rebase(tip.files, base_files)
    new_deltas = _rebase(tip.delta_files, base_deltas)
    new_epochs = {
        k: v for k, v in tip.committed_epochs.items()
        if k not in base.committed_epochs
    }

    cur = main.snapshot()
    if require_fast_forward and cur.version != parent_v:
        raise PublishConflict(
            f"main advanced v{parent_v}→v{cur.version} since the fork; "
            "re-fork and re-apply, or publish with "
            "require_fast_forward=False to re-parent additively"
        )
    if not require_fast_forward:
        if cur.schema_version != base.schema_version or cur.schemas != base.schemas:
            raise PublishConflict("main changed schema since the fork")
        if cur.truncate_lsn != base.truncate_lsn:
            raise PublishConflict("main truncated since the fork")
        if cur.n_buckets != base.n_buckets:
            # branch entries were written under the fork-time spec and
            # carry no `nb` stamp — re-parenting them under main's new
            # spec would mislabel their buckets
            raise PublishConflict("main rebucketed since the fork; re-fork")
        dup = [k for k in new_epochs if LakeTable._committed_in(cur, k)]
        if dup:
            raise PublishConflict(
                f"epochs {sorted(dup)} were applied on BOTH main and branch "
                f"{name!r} during divergence; state is ambiguous — drop the "
                "branch and replay against main"
            )

    if not (new_files or new_deltas or new_epochs):
        version = cur.version  # nothing to publish
    else:
        child = main._child(
            cur,
            files=cur.files + new_files,
            delta_files=cur.delta_files + new_deltas,
            committed_epochs={**cur.committed_epochs, **new_epochs},
            operation=f"publish:{name}@v{tip.version}:parent={parent_v}",
        )
        main._write_snapshot(child)  # CommitConflict → nothing changed; retry
        version = child.version
    if seal:
        main._fs.rmtree(bt._log_path)
        _drop_pin(main, name)
    return version
