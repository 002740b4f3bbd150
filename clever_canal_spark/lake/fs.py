"""Metadata-filesystem seam for the lake (VERDICT r2 Missing #3).

The lake's correctness hinges on ONE primitive: an atomic
create-if-absent of the next snapshot file (optimistic concurrency —
two racing writers, one winner). Everything else the metadata/manifest
layer needs is plain list/read/move/delete. This module isolates those
operations behind :class:`MetadataFS` so the log can live on something
other than a POSIX directory:

- :class:`LocalFS` (default): ``os``-based; exclusive commit via
  write-tmp + ``os.link`` (EEXIST = lost race) — byte-for-byte the
  behavior the lake always had.
- :class:`ArrowFS`: wraps a ``pyarrow.fs.FileSystem`` (S3/GCS/HDFS —
  the public Arrow filesystem API). Object stores need a CONDITIONAL
  PUT for the exclusive commit (S3 ``If-None-Match: *``); pyarrow's
  generic ``open_output_stream`` cannot express it, so ArrowFS ships a
  check-then-write that is NOT atomic under concurrent writers and
  refuses multi-writer use unless the caller passes
  ``single_writer=True`` (one follower per table — the common CDC
  deployment) or subclasses ``write_text_exclusive`` with the store's
  conditional-put. The seam is the point: Iceberg solves the same
  problem with a catalog swap (documented 1:1 in lake/table.py).
- :class:`MemFS`: dict-backed, truly atomic under a lock — proves in
  tests that the lake's metadata layer runs against a non-POSIX store.

The DATA plane (executor-side parquet read/write) does not go through
this seam: Spark's own Hadoop filesystem layer handles it via the table
path's scheme, exactly as it would for Iceberg.
"""

from __future__ import annotations

import io
import os
import shutil
import threading
import time
import uuid


class MetadataFS:
    """Operations the lake's metadata/manifest layer needs. Paths are
    plain strings in the table's own path space."""

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Names (not paths) in ``path``; FileNotFoundError if absent."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_exclusive(self, path: str, text: str) -> None:
        """ATOMIC create-if-absent; FileExistsError if ``path`` exists.
        This is the commit primitive — see the module docstring."""
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def open_binary(self, path: str):
        """Readable, seekable file-like (parquet footer reads)."""
        raise NotImplementedError

    def move(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError


class LocalFS(MetadataFS):
    """POSIX implementation — the lake's historical behavior."""

    def makedirs(self, path):
        os.makedirs(path, exist_ok=True)

    def listdir(self, path):
        return os.listdir(path)

    def read_text(self, path):
        with open(path) as fh:
            return fh.read()

    def write_text_exclusive(self, path, text):
        # write-tmp + hard-link: the link fails with EEXIST if another
        # writer won the race; the payload is never visible half-written
        tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def write_bytes(self, path, data):
        with open(path, "wb") as fh:
            fh.write(data)

    def open_binary(self, path):
        return open(path, "rb")

    def move(self, src, dst):
        os.rename(src, dst)

    def remove(self, path):
        os.unlink(path)

    def rmtree(self, path):
        shutil.rmtree(path, ignore_errors=True)

    def exists(self, path):
        return os.path.exists(path)

    def isdir(self, path):
        return os.path.isdir(path)

    def mtime(self, path):
        return os.path.getmtime(path)


class ArrowFS(MetadataFS):
    """``pyarrow.fs.FileSystem``-backed store (S3/GCS/HDFS seam).

    ``write_text_exclusive`` is check-then-write — NOT atomic under
    concurrent writers (see module docstring); pass ``single_writer=True``
    to accept that, or subclass with the store's conditional-put."""

    def __init__(self, fs, single_writer: bool = False):
        self._fs = fs
        self._single_writer = single_writer

    def makedirs(self, path):
        self._fs.create_dir(path, recursive=True)

    def listdir(self, path):
        from pyarrow.fs import FileSelector, FileType

        info = self._fs.get_file_info(path)
        if info.type == FileType.NotFound:
            raise FileNotFoundError(path)
        sel = FileSelector(path, recursive=False)
        return [os.path.basename(i.path) for i in self._fs.get_file_info(sel)]

    def read_text(self, path):
        with self._fs.open_input_file(path) as fh:
            return fh.read().decode("utf-8")

    def write_text_exclusive(self, path, text):
        if not self._single_writer:
            raise NotImplementedError(
                "ArrowFS commit is check-then-write; object-store multi-writer "
                "safety needs the store's conditional PUT (S3 If-None-Match) — "
                "subclass write_text_exclusive, or pass single_writer=True"
            )
        from pyarrow.fs import FileType

        if self._fs.get_file_info(path).type != FileType.NotFound:
            raise FileExistsError(path)
        with self._fs.open_output_stream(path) as fh:
            fh.write(text.encode("utf-8"))

    def write_bytes(self, path, data):
        with self._fs.open_output_stream(path) as fh:
            fh.write(data)

    def open_binary(self, path):
        return self._fs.open_input_file(path)

    def move(self, src, dst):
        self._fs.move(src, dst)

    def remove(self, path):
        self._fs.delete_file(path)

    def rmtree(self, path):
        from pyarrow.fs import FileType

        if self._fs.get_file_info(path).type != FileType.NotFound:
            self._fs.delete_dir(path)

    def exists(self, path):
        from pyarrow.fs import FileType

        return self._fs.get_file_info(path).type != FileType.NotFound

    def isdir(self, path):
        from pyarrow.fs import FileType

        return self._fs.get_file_info(path).type == FileType.Directory

    def mtime(self, path):
        mt = self._fs.get_file_info(path).mtime
        return mt.timestamp() if mt is not None else time.time()


class MemFS(MetadataFS):
    """In-memory store with a truly atomic exclusive create — the
    non-POSIX existence proof used by tests. Not for data files (Spark
    executors can't see it); metadata-layer operations only."""

    def __init__(self):
        self._files: dict[str, bytes] = {}
        self._dirs: set[str] = set()
        self._mtimes: dict[str, float] = {}
        self._lock = threading.Lock()

    def _norm(self, p):
        return os.path.normpath(p)

    def makedirs(self, path):
        with self._lock:
            p = self._norm(path)
            while p and p != os.path.sep:
                self._dirs.add(p)
                p = os.path.dirname(p)

    def listdir(self, path):
        with self._lock:
            p = self._norm(path)
            if p not in self._dirs:
                raise FileNotFoundError(path)
            out = set()
            for f in list(self._files) + list(self._dirs):
                if os.path.dirname(f) == p:
                    out.add(os.path.basename(f))
            return sorted(out)

    def read_text(self, path):
        return self._read(path).decode("utf-8")

    def _read(self, path):
        with self._lock:
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            return self._files[p]

    def write_text_exclusive(self, path, text):
        with self._lock:
            p = self._norm(path)
            if p in self._files:
                raise FileExistsError(path)
            self._files[p] = text.encode("utf-8")
            self._mtimes[p] = time.time()

    def write_bytes(self, path, data):
        with self._lock:
            p = self._norm(path)
            self._files[p] = bytes(data)
            self._mtimes[p] = time.time()

    def open_binary(self, path):
        return io.BytesIO(self._read(path))

    def move(self, src, dst):
        with self._lock:
            s, d = self._norm(src), self._norm(dst)
            if s not in self._files:
                raise FileNotFoundError(src)
            self._files[d] = self._files.pop(s)
            self._mtimes[d] = self._mtimes.pop(s, time.time())

    def remove(self, path):
        with self._lock:
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            del self._files[p]
            self._mtimes.pop(p, None)

    def rmtree(self, path):
        with self._lock:
            p = self._norm(path)
            for f in [f for f in self._files if f == p or f.startswith(p + os.path.sep)]:
                del self._files[f]
                self._mtimes.pop(f, None)
            self._dirs = {d for d in self._dirs
                          if not (d == p or d.startswith(p + os.path.sep))}

    def exists(self, path):
        with self._lock:
            p = self._norm(path)
            return p in self._files or p in self._dirs

    def isdir(self, path):
        with self._lock:
            return self._norm(path) in self._dirs

    def mtime(self, path):
        with self._lock:
            return self._mtimes.get(self._norm(path), 0.0)
