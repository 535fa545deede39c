"""Ad-hoc driver-simulation parity check for a named subset of queries.

Usage: python scripts_parity_check.py q166_locf_forward_fill [...]
Set PARITY_SF to override the sf dir (default /root/testdata/sf0.01).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = os.environ.get("PARITY_SF", "/root/testdata/sf0.01")
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    path = f"{SF}/{t}.parquet"
    if os.path.isdir(path):
        # Spark-written tables are directories of part files
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

names = sys.argv[1:]
fails = 0
for name in names:
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name not in os_:
            print(f"{name}: rows-only, {len(sdf)} rows")
            continue
        odf = con.execute(os_[name]).df()
        cols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
            fails += 1
            continue
        s = sdf.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
        o = odf.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
        ok = len(sdf) == len(odf) and s.equals(o)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(sdf)} vs {len(odf)} rows)")
        if not ok:
            fails += 1
            if len(sdf) == len(odf):
                diff = (s != o).any(axis=0)
                bad = [c for c in cols if diff[c]]
                print("  bad cols:", bad)
                for c in bad[:2]:
                    m = (s[c] != o[c])
                    print("  spark:", s.loc[m, c].head(3).tolist(),
                          " oracle:", o.loc[m, c].head(3).tolist())
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
        fails += 1
sys.exit(1 if fails else 0)
