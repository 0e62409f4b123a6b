"""Split a query's wall time into DAG build / planning / execution.

Usage: python tools/plan_vs_exec.py --names a,b,c [--sf-dir DIR]

For each query: build = fn(spark, sf_dir) wall time (includes any eager
work the fn does: localCheckpoint, stage builds, internal collects);
plan = explainString(formatted) on a fresh DF (Catalyst analysis +
optimization + physical planning); exec = .collect() on that same DF
(reuses the cached QueryExecution, so this is execution only).
Each query is warmed once at sf0.001 first, mirroring bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from datafusion_functions_extra_spark import suite
    from datafusion_functions_extra_spark.sources import get_spark

    spark = get_spark("plan-vs-exec")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in args.names.split(","):
        fn = suite.QUERIES[name]
        try:
            fn(spark, args.warm_dir).collect()
        except Exception:
            pass
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        t1 = time.time()
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t2 = time.time()
        df.collect()
        t3 = time.time()
        print(
            f"{name:42s} {t1-t0:7.2f} {t2-t1:7.2f} {t3-t2:7.2f} {t3-t0:7.2f}"
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
