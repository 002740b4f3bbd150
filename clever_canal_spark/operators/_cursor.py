"""Shared lake-cursor sidecar for changelog-tailing indexes: one JSON
file per index directory recording the last consumed lake version.
Write is atomic (tmp + rename); a missing file reads as version 0 —
the bootstrap state. Used by dedup_index, ann_index-style consumers,
and text_index so the crash-recovery protocol cannot drift between
index families."""

from __future__ import annotations

import json
import os

_CURSOR = "lake_cursor.json"


def read_lake_cursor(path: str) -> int:
    try:
        with open(os.path.join(path, _CURSOR)) as fh:
            return int(json.load(fh)["version"])
    except FileNotFoundError:
        return 0


def write_lake_cursor(path: str, version: int) -> None:
    tmp = os.path.join(path, f".{_CURSOR}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, os.path.join(path, _CURSOR))
