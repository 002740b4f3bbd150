"""Fold per-query results from sweep_oracles.py log files into
SWEEP_SF1.json — used to incrementally upgrade the 12 NOT_RUN_TIME
entries from the first sf1 session as the round-5 resumption sweeps
finish them (OK with rows, or a recorded ORACLE_* failure class).

Usage: python scripts/merge_sweep_results.py LOG [LOG ...]

Log lines parsed (sweep_oracles.py output):
    name: rows 5/5 schema=True hash=True -> OK
    name: ERROR OutOfMemoryException: ...
Later logs win over earlier ones; an OK never downgrades to an error
(two sweeps may race the same query — e.g. the 24GB-capped run OOMs
where the 70GB run passes).
"""
from __future__ import annotations

import json
import re
import sys

OK_PAT = re.compile(r"^(\w+): rows (\d+)/(\d+) schema=(\w+) hash=(\w+) -> (\w+)")
ERR_PAT = re.compile(r"^(\w+): ERROR (\w+): (.*)")


def classify_error(exc: str, detail: str) -> str:
    if "OutOfMemory" in exc:
        return "ORACLE_OOM"
    if "No space left" in detail or "IO Error" in detail:
        return "ORACLE_SPILL_DISK_FULL"
    return "ERROR"


def main() -> None:
    with open("SWEEP_SF1.json") as f:
        doc = json.load(f)
    qs = doc["queries"]
    for path in sys.argv[1:]:
        with open(path, errors="replace") as f:
            for raw in f:
                line = raw.split("\r")[-1].strip()
                m = OK_PAT.match(line)
                if m:
                    name, srows, orows, schema, hsh, status = m.groups()
                    qs[name] = (
                        {"rows": int(srows), "status": "OK"}
                        if status == "OK"
                        else {"rows": f"{srows}/{orows}", "status": "MISMATCH",
                              "detail": f"schema={schema} hash={hsh}"}
                    )
                    continue
                m = ERR_PAT.match(line)
                if m:
                    name, exc, detail = m.groups()
                    if qs.get(name, {}).get("status") == "OK":
                        continue
                    qs[name] = {
                        "status": classify_error(exc, detail),
                        "detail": f"{exc}: {detail[:160]}",
                    }
    doc["n_ok"] = sum(1 for v in qs.values() if v.get("status") == "OK")
    doc["n_not_ok"] = sum(1 for v in qs.values() if v.get("status") != "OK")
    doc["n_total"] = len(qs)
    with open("SWEEP_SF1.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged: {doc['n_ok']} OK / {doc['n_not_ok']} not-OK "
          f"of {doc['n_total']}")


if __name__ == "__main__":
    main()
