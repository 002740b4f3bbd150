"""Multi-subscriber cursor store over a LakeTable changelog.

The reference serves N independent clients per destination, each with its
own durable cursor and an in-memory list of delivered-but-unacked batches
(MemoryMetaManager.java:19-318 — subscribe / getCursor / updateCursor /
addBatch / removeBatch / clearAllBatches; ClientIdentity.java keys the
client). The server loop (CanalServerWithEmbedded.java:253-398
getWithoutAck / ack / rollback) delivers the next event slice, tolerates
duplicate ack/rollback, and on rollback redelivers everything unacked.

This is the Spark analog with the lake table as the event store: a
*batch* is a ``scan_changes`` version slice ``(from_version, to_version]``
— the LWW winners (incl. delete markers) committed by those snapshots —
so delivery is deterministic and replay-identical by construction (the
changelog is a pure function of the snapshot chain). Durable state is the
acked cursor ONLY, exactly like the reference's memory meta + zk cursor
split: unacked batches live in this object, and a crashed consumer that
reopens redelivers them from the cursor (the reference's
rollback-on-reconnect). Cursor writes ride the table's MetadataFS commit
primitive (exclusive create), so the store works unchanged on LocalFS /
MemFS / ArrowFS.

Scale notes: a cursor is one tiny JSON per ack with O(1) retained files
(older generations pruned best-effort after each ack); ``get_without_ack``
reads only the files *introduced* in the slice (file-diff, no table scan,
see ``LakeTable.scan_changes``); nothing here holds rows on the driver.
Consumers that fall below the snapshot-retention window get the
``SnapshotExpired`` rebuild contract from ``scan_changes`` itself.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .table import LakeTable

_CONSUMERS_DIR = "_consumers"


def _cursor_name(version: int) -> str:
    return f"cursor-{version:012d}.json"


def _parse_cursor(name: str) -> int | None:
    if name.startswith("cursor-") and name.endswith(".json"):
        try:
            return int(name[len("cursor-"):-len(".json")])
        except ValueError:
            return None
    return None


@dataclass
class Batch:
    """One delivered-but-possibly-unacked changelog slice.

    ``batch_id`` is the slice's ``to_version`` — unique, totally ordered,
    and exactly the value the cursor advances to on ack (the reference's
    batchId → PositionRange.ack mapping, MemoryMetaManager.java:118-141).
    """

    batch_id: int
    from_version: int
    to_version: int
    df: DataFrame
    truncates: list[dict] = field(default_factory=list)


class Consumer:
    """One named subscriber tailing a LakeTable's changelog.

    >>> c = Consumer(table, "billing")          # subscribe (idempotent)
    >>> b = c.get_without_ack(max_versions=10)  # None when caught up
    >>> ...  # apply b.df downstream, honor b.truncates
    >>> c.ack(b.batch_id)                       # durable cursor advance

    Independent consumers use distinct ``client_id`` values and never see
    each other's cursors; ``Consumer.list_all(table)`` is the
    listAllSubscribeInfo analog.
    """

    def __init__(self, table: LakeTable, client_id: str, start_after: int | None = None):
        # '' would resolve the cursor dir to the _consumers root itself:
        # every ''-client shares one cursor, list_all can't see it, and
        # unsubscribe() would rmtree EVERY consumer's durable cursor
        if not client_id or "/" in client_id or client_id.startswith("."):
            raise ValueError(f"client_id must be a plain name, got {client_id!r}")
        self.table = table
        self.client_id = client_id
        self._dir = os.path.join(table.path, _CONSUMERS_DIR, client_id)
        fs = table._fs
        fs.makedirs(self._dir)
        if self._durable_cursor() is None:
            # first subscribe seeds the durable cursor (exclusive create —
            # a racing subscriber with the same id loses and reads ours).
            # Default = current head: a new consumer sees future changes
            # only, like a fresh canal client; pass start_after=0 to
            # replay the whole retained changelog.
            seed = table.current_version() if start_after is None else int(start_after)
            self._write_cursor(seed)
        # delivered-but-unacked slices, oldest first (in-memory ONLY, like
        # MemoryMetaManager's batches map — lost on crash, redelivered)
        self._pending: list[Batch] = []

    # -- durable cursor ------------------------------------------------------

    def _durable_cursor(self) -> int | None:
        try:
            names = self.table._fs.listdir(self._dir)
        except FileNotFoundError:
            return None
        versions = [v for n in names if (v := _parse_cursor(n)) is not None]
        return max(versions, default=None)

    def _write_cursor(self, version: int) -> None:
        path = os.path.join(self._dir, _cursor_name(version))
        payload = json.dumps(
            {"client_id": self.client_id, "acked_version": version}
        )
        try:
            self.table._fs.write_text_exclusive(path, payload)
        except FileExistsError:
            pass  # duplicate ack replay — same version, same content
        # prune older generations, best-effort (never load-bearing)
        try:
            for n in self.table._fs.listdir(self._dir):
                v = _parse_cursor(n)
                if v is not None and v < version:
                    self.table._fs.remove(os.path.join(self._dir, n))
        except OSError:
            pass

    def cursor(self) -> int:
        """Last ACKED lake version (durable; survives crash/reopen)."""
        v = self._durable_cursor()
        if v is None:
            raise RuntimeError(f"consumer {self.client_id!r} is not subscribed")
        return v

    # -- delivery ------------------------------------------------------------

    def get_without_ack(self, max_versions: int | None = None) -> Batch | None:
        """Deliver the next changelog slice without advancing the cursor
        (CanalServerWithEmbedded.getWithoutAck). Returns None when caught
        up. Repeated calls deliver SUCCESSIVE slices — several batches may
        be in flight before the first ack, exactly the reference's
        pipelined get/ack protocol. ``max_versions`` bounds the slice by
        snapshot count (the batchSize admission analog)."""
        from_v = self._pending[-1].to_version if self._pending else self.cursor()
        head = self.table.current_version()
        to_v = head if max_versions is None else min(head, from_v + int(max_versions))
        if to_v <= from_v:
            return None
        batch = Batch(
            batch_id=to_v,
            from_version=from_v,
            to_version=to_v,
            df=self.table.scan_changes(from_v, to_v),
            truncates=self.table.truncates_between(from_v, to_v),
        )
        self._pending.append(batch)
        return batch

    def get(self, max_versions: int | None = None) -> Batch | None:
        """get_without_ack + immediate ack (the reference's auto-ack
        ``get``, CanalServerWithEmbedded.java:217-251)."""
        batch = self.get_without_ack(max_versions)
        if batch is not None:
            self.ack(batch.batch_id)
        return batch

    def ack(self, batch_id: int) -> None:
        """Durably advance the cursor to ``batch_id``'s slice end. Acking
        a batch implicitly acks every OLDER pending batch (cursor is a
        high-water mark); a duplicate ack is a no-op (the reference logs
        and ignores replayed ack/rollback)."""
        if batch_id <= self.cursor():
            return  # duplicate / already covered
        if not any(b.batch_id == batch_id for b in self._pending):
            raise KeyError(
                f"ack error: batch {batch_id} was never delivered to "
                f"{self.client_id!r} (pending: {[b.batch_id for b in self._pending]})"
            )
        self._write_cursor(batch_id)
        self._pending = [b for b in self._pending if b.batch_id > batch_id]

    def rollback(self, batch_id: int | None = None) -> None:
        """Discard ALL unacked batches; the next get redelivers from the
        durable cursor (the reference clears every in-flight batch on
        rollback, with or without a batchId —
        CanalServerWithEmbedded.java:357-398). An unknown ``batch_id`` at
        or below the cursor is a tolerated duplicate; above it, an error."""
        if batch_id is not None and not any(
            b.batch_id == batch_id for b in self._pending
        ):
            if batch_id > self.cursor():
                raise KeyError(
                    f"rollback error: batch {batch_id} is not in flight for "
                    f"{self.client_id!r}"
                )
            return  # duplicate rollback of an already-acked batch
        self._pending = []

    def unsubscribe(self) -> None:
        """Drop the durable cursor (MemoryMetaManager.unsubscribe)."""
        self._pending = []
        self.table._fs.rmtree(self._dir)

    # -- registry ------------------------------------------------------------

    @staticmethod
    def list_all(table: LakeTable) -> dict[str, int]:
        """All subscribed client_ids with their acked cursors
        (listAllSubscribeInfo analog)."""
        root = os.path.join(table.path, _CONSUMERS_DIR)
        try:
            clients = table._fs.listdir(root)
        except FileNotFoundError:
            return {}
        out: dict[str, int] = {}
        for c in sorted(clients):
            cdir = os.path.join(root, c)
            if not table._fs.isdir(cdir):
                continue
            versions = [
                v
                for n in table._fs.listdir(cdir)
                if (v := _parse_cursor(n)) is not None
            ]
            if versions:
                out[c] = max(versions)
        return out
