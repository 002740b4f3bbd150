"""Driver-style correctness sweep: run every entry query AND its DuckDB
oracle at SF_DIR (default sf0.01), compare rows + schema + value hash the
way the round driver does (columns sorted by name, rows sorted, values
stringified). Usage:

    PYTHONPATH=. python scripts/sweep_oracles.py [query ...]

With no args, sweeps ALL queries (oracle-less ones get a rows-only run).
Exit code 1 if anything mismatches.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(v):
    # float canonicalization mirrors the driver's tolerant stringify
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _hash(rows, cols):
    m = hashlib.md5()
    for row in sorted(tuple(_canon(row[c]) for c in cols) for row in rows):
        m.update(repr(row).encode())
    return m.hexdigest()


def main():
    from clever_canal_spark.entry_queries import ORACLES, QUERIES
    from clever_canal_spark.session import build_session

    # CCS_SWEEP_CPUS widens the session for big-SF resumption sweeps;
    # CCS_SWEEP_MAX_PART_BYTES splits small-but-expensive scans (the sf1
    # embeddings table is ~2 row-groups, so the trained-quantizer family's
    # assignment stages otherwise run 2-wide regardless of cores).
    cpus = int(os.environ.get("CCS_SWEEP_CPUS", "8"))
    extra = {}
    if os.environ.get("CCS_SWEEP_MAX_PART_BYTES"):
        extra["spark.sql.files.maxPartitionBytes"] = os.environ["CCS_SWEEP_MAX_PART_BYTES"]
        extra["spark.sql.files.openCostInBytes"] = "65536"
    spark = build_session(app_name="sweep", master=f"local[{cpus}]",
                          shuffle_partitions=cpus, extra_conf=extra)
    con = duckdb.connect()
    # big-SF sweeps: bound the oracle engine's memory so a quadratic
    # oracle (e.g. the recursive-closure clustering CTEs on a corpus
    # whose near-dup graph is one giant component) fails FAST as a
    # recorded per-query error instead of consuming the whole box for
    # half an hour first (observed: 100 GiB pinned at sf1). DUCKDB_MEM
    # sets the limit (e.g. '24GB'); unset keeps DuckDB's default.
    if os.environ.get("DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    # DUCKDB_TMP points the oracle's spill at a filesystem with room
    # (default .tmp under cwd filled / during the sf1 sweep's
    # SPILL_DISK_FULL failure); lets out-of-core grouping finish instead
    # of dying mid-spill when the quadratic oracles are retried with a
    # big memory budget.
    if os.environ.get("DUCKDB_TMP"):
        os.makedirs(os.environ["DUCKDB_TMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TMP']}'")
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sys.argv[1:] or sorted(QUERIES)
    n_bad = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
            if name not in ORACLES:
                print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
                continue
            ores = con.execute(ORACLES[name]).fetch_arrow_table().to_pylist()
            ocols = sorted(ores[0].keys()) if ores else scols
            ok_rows = len(srows) == len(ores)
            ok_schema = scols == ocols
            ok_hash = ok_rows and ok_schema and _hash(srows, scols) == _hash(ores, ocols)
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
            if status != "OK":
                n_bad += 1
            print(f"{name}: rows {len(srows)}/{len(ores)} schema={ok_schema} "
                  f"hash={ok_hash} -> {status}")
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            n_bad += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"swept {len(names)} queries, {n_bad} bad")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
