"""Running/standby leader lease — Canal-HA rebuilt on the lake's
filesystem contract.

Reference anchor: a Canal deployment runs one ACTIVE instance per
destination with warm standbys arbitrated through a ZooKeeper ephemeral
node (`ClientRunningMonitor.java` / `ServerRunningMonitor` — the
`running` znode holds the active node's identity; watchers race to
re-create it when it vanishes, with a takeover delay against flapping).
This module is that protocol on a shared POSIX directory instead of a
ZK session: a JSON lease file with a TTL heartbeat and a GENERATION
number for fencing.

Protocol (lease file + lockfile, two atomic primitives):

- **Mutate = lockfile mutex.** Any state change first creates
  ``lease.lock`` with ``O_EXCL`` — exactly one process wins; losers
  back off. The winner rewrites the lease via atomic ``os.replace``
  (the lease path NEVER disappears — that invariant is what makes the
  first-acquire ``O_EXCL`` create race-free) and removes the lock. A
  mutator crash strands the lock; once its mtime is older than ``ttl``
  it is debris — removed, and the ``O_EXCL`` re-create picks one new
  mutex holder.
- **Acquire**: create-exclusive when the lease never existed; else
  take the mutex and take over iff the stamp is older than ``ttl`` —
  bumping ``generation``.
- **Renew** (the heartbeat): grab the mutex, verify the lease still
  names THIS owner and generation, refresh the stamp. A standby that
  took over in between bumped the generation, so the old leader's renew
  returns False — its cue to stop work immediately.
- **Fencing**: ``generation`` is the fencing token. Work guarded only
  by wall-clock TTL is never safe against a paused-and-resumed leader;
  here it does not need to be — every write the follower performs is an
  idempotent epoch in the lake's registry, so a zombie's duplicate
  apply NO-OPS. The lease exists to prevent duplicate *work* and to
  give deployments the one-active-instance semantics Canal's HA
  provides, not to carry correctness (the registry does that) —
  matching the reference, where a zombie's writes are fenced by the
  store cursor, not the znode.

Same filesystem requirement as the lake log (POSIX rename/O_EXCL
atomicity; object-store deployments arbitrate through their catalog's
conditional writes instead — see scripts/run_pipeline.py).
``clock`` is injectable for deterministic takeover tests.
"""

from __future__ import annotations

import json
import os
import threading
import time


class LeadershipLost(RuntimeError):
    """Raised inside a streaming micro-batch when the lease's generation
    moved — the fenced ex-leader must stop its query immediately."""


class LeaderLease:
    """TTL'd leader lease in ``path`` (a file; its parent must exist).

    Usage::

        lease = LeaderLease(dir + "/_running.json", owner="node-a")
        if lease.try_acquire():
            while work_remains():
                if not lease.renew():
                    break        # a standby took over — stop NOW
                do_one_epoch()
            lease.release()
    """

    def __init__(self, path: str, owner: str, ttl_s: float = 30.0, clock=time.time):
        self.path = path
        self.owner = owner
        self.ttl_s = float(ttl_s)
        self._clock = clock
        self._generation: int | None = None  # held generation; None = not leader
        self._lock = path + ".lock"

    # -- primitives ------------------------------------------------------

    def _write_lease(self, doc: dict) -> None:
        tmp = self.path + f".tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, self.path)

    def _take_mutex(self) -> bool:
        """One O_EXCL lockfile attempt; on failure, clear a stale
        (crashed-mutator) lock older than the TTL and retry once."""
        for attempt in (0, 1):
            try:
                fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return True
            except FileExistsError:
                if attempt:
                    return False
                try:
                    age = self._clock() - os.path.getmtime(self._lock)
                except FileNotFoundError:
                    continue  # just released — retry the create
                if age <= self.ttl_s:
                    return False  # live mutator (holds it microseconds)
                try:  # stale debris: racing removers tolerate the miss
                    os.remove(self._lock)
                except FileNotFoundError:
                    pass
        return False

    def _drop_mutex(self) -> None:
        try:
            os.remove(self._lock)
        except FileNotFoundError:
            pass

    def _create_exclusive(self, doc: dict) -> bool:
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            json.dump(doc, fh)
        return True

    # -- protocol --------------------------------------------------------

    def read(self) -> dict | None:
        """Current holder info (possibly stale by one mutation), or None
        when no lease exists. Zero side effects."""
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _expired(self, doc: dict) -> bool:
        return (self._clock() - float(doc["stamp"])) > self.ttl_s

    def try_acquire(self) -> bool:
        """Become leader: create the lease, or take over an expired one
        (generation bump). False = a live leader holds it (stand by).
        Already-leader calls renew instead."""
        if self._generation is not None:
            return self.renew()
        doc = {"owner": self.owner, "generation": 1, "stamp": self._clock()}
        # race-free because the lease path NEVER disappears once created
        # (mutations are atomic os.replace under the lockfile): O_EXCL
        # here succeeds only for the very first lease ever
        if self._create_exclusive(doc):
            self._generation = 1
            return True
        if not self._take_mutex():
            return False
        try:
            cur = self.read()
            if cur is None:
                # release() removed it while we took the mutex: re-create
                if self._create_exclusive(doc):
                    self._generation = 1
                    return True
                return False
            if cur["owner"] == self.owner or self._expired(cur):
                new = {
                    "owner": self.owner,
                    "generation": int(cur["generation"]) + 1,
                    "stamp": self._clock(),
                }
                self._write_lease(new)
                self._generation = new["generation"]
                return True
            return False
        finally:
            self._drop_mutex()

    def renew(self) -> bool:
        """Refresh the heartbeat. False = leadership lost (another
        generation exists, or the lease vanished) — stop work."""
        if self._generation is None:
            return False
        if not self._take_mutex():
            # mutex contention is microseconds; a busy beat keeps
            # leadership and retries next heartbeat rather than abdicate
            return True
        try:
            cur = self.read()
            if (
                cur is None
                or cur["owner"] != self.owner
                or int(cur["generation"]) != self._generation
            ):
                self._generation = None
                return False
            cur["stamp"] = self._clock()
            self._write_lease(cur)
            return True
        finally:
            self._drop_mutex()

    def release(self) -> None:
        """Voluntary hand-off: delete the lease so standbys race
        immediately (the reference's releaseRunning). No-op if not
        leader or already superseded."""
        if self._generation is None:
            return
        if not self._take_mutex():
            self._generation = None
            return
        try:
            cur = self.read()
            if (
                cur is not None
                and cur["owner"] == self.owner
                and int(cur["generation"]) == self._generation
            ):
                os.remove(self.path)
        finally:
            self._drop_mutex()
            self._generation = None

    @property
    def is_leader(self) -> bool:
        """Local belief only — stale until the next renew()."""
        return self._generation is not None


def run_with_lease(follower, lease: LeaderLease, rounds: int = 1) -> list:
    """Drive ``follower.run_available()`` for ``rounds`` passes, but only
    while holding ``lease`` — the active/standby loop. Returns the
    concatenated apply results; empty when standing by. Each pass
    re-verifies leadership FIRST (renew), so a superseded leader applies
    nothing further; the epoch registry makes even the pathological
    zombie-overlap case a no-op."""
    out: list = []
    for _ in range(rounds):
        if not (lease.try_acquire() if not lease.is_leader else lease.renew()):
            continue
        out.extend(follower.run_available())
    return out
