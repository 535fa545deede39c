#!/usr/bin/env python
"""Capture .explain("formatted") for a list of registered queries into
an output directory (one file per query). Usage:

    python scripts/capture_plans.py OUTDIR SUFFIX q311_winnowing_fingerprints ...

Writes OUTDIR/<query>_<SUFFIX>.txt. Streaming queries that materialize
their result locally will show a LocalTableScan root; their structural
evidence lives in the micro-batch sink code, so for those this captures
what the driver sees plus (where the function exposes one) the batch
oracle-side relation.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("captured", name, flush=True)


if __name__ == "__main__":
    main()
