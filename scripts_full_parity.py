"""Full-registry driver-simulation parity run → committed evidence.

Runs EVERY registered query under driver conditions (vanilla
SparkSession, cold import of __spark_entry__, DuckDB oracle views at
$PARITY_SF, default /root/testdata/sf0.01) and writes
LOCAL_PARITY_r{N}.json — one row per query with the same
rows/schema/hash verdict shape the driver records, so parity evidence
for the whole surface ships with the code even though the driver's
per-round CORRECTNESS sample holds ~50 (ADVICE r6).

Usage: python scripts_full_parity.py <round-number>
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf = os.environ.get("PARITY_SF", "/root/testdata/sf0.01")
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    out: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = fn(spark, sf).toPandas()
            rec["spark_rows"] = len(sdf)
            if name not in oracles:
                rec["rows_only"] = True
            else:
                odf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                cols, ocols = sorted(sdf.columns), sorted(odf.columns)
                rec["schema_match"] = cols == ocols
                if cols == ocols:
                    s = (sdf.reindex(cols, axis=1).astype(str)
                         .sort_values(cols).reset_index(drop=True))
                    o = (odf.reindex(cols, axis=1).astype(str)
                         .sort_values(cols).reset_index(drop=True))
                    rec["rows_match"] = len(sdf) == len(odf)
                    rec["hash_match"] = bool(rec["rows_match"] and s.equals(o))
                else:
                    rec["rows_match"] = rec["hash_match"] = False
            rec["err"] = None
        except Exception as ex:  # noqa: BLE001 — evidence must not abort
            rec["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"
            rec["hash_match"] = False
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        ok = rec.get("hash_match", rec.get("rows_only", False))
        print(f"{name}: {'OK' if ok else 'FAIL'} ({rec['sec']}s)", flush=True)

    n_ok = sum(1 for r in out.values()
               if r.get("hash_match") or r.get("rows_only"))
    summary = {
        "sf_dir": sf,
        "n_queries": len(out),
        "n_green": n_ok,
        "total_sec": round(time.time() - t_all, 1),
        "results": out,
    }
    path = f"/root/repo/LOCAL_PARITY_r{rnd:02d}.json"
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {path}: {n_ok}/{len(out)} green", flush=True)


if __name__ == "__main__":
    main()
