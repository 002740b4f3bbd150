"""Diff the two hash-failing queries row-by-row: Spark vs DuckDB at sf0.01."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from clever_canal_spark.entry_queries import ORACLES, QUERIES
from clever_canal_spark.session import build_session

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    spark = build_session(app_name="diag", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in sys.argv[1:] or ["cdc_epoch_metrics", "doc_source_stats"]:
        print(f"===== {name} =====")
        sdf = QUERIES[name](spark, SF).toPandas()
        odf = con.execute(ORACLES[name]).fetchdf()
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        keycol = sdf.columns[0] if "epoch_id" not in sdf.columns else "epoch_id"
        if "source" in sdf.columns:
            keycol = "source"
        s = sdf.sort_values(keycol).reset_index(drop=True)
        o = odf.sort_values(keycol).reset_index(drop=True)
        print("spark dtypes:", dict(s.dtypes.astype(str)))
        print("oracle dtypes:", dict(o.dtypes.astype(str)))
        import pandas as pd
        m = s.merge(o, on=keycol, suffixes=("_s", "_o"))
        bad = []
        for c in s.columns:
            if c == keycol:
                continue
            diff = m[m[f"{c}_s"].astype("int64") != m[f"{c}_o"].astype("int64")]
            if len(diff):
                bad.append(c)
                print(f"--- column {c}: {len(diff)} mismatched groups")
                print(diff[[keycol, f"{c}_s", f"{c}_o"]].head(10).to_string())
        if not bad:
            print("NO DIFFS — hash mismatch must be dtype/ordering artifact")
    spark.stop()


if __name__ == "__main__":
    main()
