"""Dump .explain("formatted") for named suite queries to plans/<dir>/.

Usage: python tools/dump_plans.py --names a,b,c --suffix before [--sf-dir DIR]
                                  [--out-dir plans/r10]

Writes plans/<out-dir>/<name>_<suffix>.txt for each query.  The plan is
captured at the bench scale factor (default sf0.1) so Exchange counts /
join strategies match what the bench actually executes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r10")
    args = ap.parse_args()

    from datafusion_functions_extra_spark import suite
    from datafusion_functions_extra_spark.sources import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names.split(","):
        fn = suite.QUERIES[name]
        df = fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
