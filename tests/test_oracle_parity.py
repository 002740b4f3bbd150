"""Spark-vs-DuckDB oracle parity for every registered driver query —
mirrors the driver's CORRECTNESS gate (row-count + columns + values,
order-insensitive) at sf0.001 for speed (driver runs sf0.01)."""

import math

import duckdb
import pytest

from clever_canal_spark.entry_queries import ORACLES, QUERIES
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(SF_DIR)
    res = con.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
    assert ns == nd, f"{name}: value mismatch, first diffs: {mismatches}"


def test_all_queries_have_entries():
    # every query callable runs and yields a stable schema even without oracle
    assert set(ORACLES) <= set(QUERIES)
