"""Driver-simulation parity for a NAMED SUBSET of registry queries.

Same conditions and verdict shape as scripts_full_parity.py (vanilla
SparkSession, cold import, DuckDB views at $PARITY_SF), but runs only
the queries named on the command line — the fast iteration loop while
adding new operators. Prints one verdict line per query and exits
non-zero on any mismatch.

Usage: python scripts_parity_subset.py q416_reused_exchange [more...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: python scripts_parity_subset.py <query-name> [...]")
        sys.exit(2)
    sf = os.environ.get("PARITY_SF", "/root/testdata/sf0.01")
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    n_bad = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            n_bad += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only ({len(sdf)} rows) "
                      f"[{time.time() - t0:.1f}s]")
                continue
            odf = con.execute(oracles[name]).df()
            cols, ocols = sorted(sdf.columns), sorted(odf.columns)
            if cols != ocols:
                print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
                n_bad += 1
                continue
            s = (sdf.reindex(cols, axis=1).astype(str)
                 .sort_values(cols).reset_index(drop=True))
            o = (odf.reindex(cols, axis=1).astype(str)
                 .sort_values(cols).reset_index(drop=True))
            if len(s) != len(o):
                print(f"{name}: ROW COUNT spark={len(s)} oracle={len(o)}")
                n_bad += 1
            elif not s.equals(o):
                diff = (s != o).any(axis=1)
                print(f"{name}: VALUE MISMATCH on {int(diff.sum())}/{len(s)} rows")
                print("  spark:", s[diff].head(3).to_dict("records"))
                print("  oracle:", o[diff].head(3).to_dict("records"))
                n_bad += 1
            else:
                print(f"{name}: OK ({len(s)} rows) [{time.time() - t0:.1f}s]")
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
            n_bad += 1
    spark.stop()
    sys.exit(1 if n_bad else 0)


main()
