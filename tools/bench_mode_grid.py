"""Mirror of the reference's criterion mode micro-bench.

The reference benches its mode accumulators over a fixed grid —
sizes {100_000, 1_000_000} x null fractions {0.0, 0.3, 0.7} x value
types {Int32 primitive, Utf8 bytes} (`/root/reference/benches/mode.rs:56-86`,
data from arrow's `bench_util::create_primitive_array` /
`create_string_array`: uniform-random values, so near-max group-count
cardinality — the accumulator's worst case).

This repo has no accumulator to bench — Spark's hash aggregate replaces
it — so the mirrored measurement is the thing a Spark user actually
pays: wall-clock of the two-stage mode plan (`operators/mode.py`:
value-count aggregate -> deterministic argmax) over the same grid.
Values are uniform-random via seeded `F.rand` (int32 drawn over the
full positive range; utf8 as the 16-hex-char md5 prefix of the draw),
generated JVM-side so data generation stays out of the timed region as
much as possible; each cell reports the median of 3 timed runs after
1 warm-up.

Usage: python tools/bench_mode_grid.py  (prints a markdown table +
one JSON line; paste the table into BASELINE.md).
"""

from __future__ import annotations

import json
import statistics
import time

from pyspark.sql import functions as F


def _cell_df(spark, n: int, null_frac: float, kind: str):
    base = spark.range(n)
    v = (F.rand(42) * (2**31 - 1)).cast("int")
    if kind == "utf8":
        v = F.substring(F.md5(v.cast("string")), 1, 16)
    col = F.when(F.rand(7) >= null_frac, v).alias("v") if null_frac else v.alias("v")
    return base.select(col)


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from datafusion_functions_extra_spark.operators.mode import mode_agg
    from datafusion_functions_extra_spark.sources import get_spark

    spark = get_spark("bench-mode-grid", cpus=8)
    results = {}
    for kind in ("int32", "utf8"):
        for n in (100_000, 1_000_000):
            for null_frac in (0.0, 0.3, 0.7):
                df = _cell_df(spark, n, null_frac, kind).persist()
                df.count()  # materialize the input outside the timed region
                times = []
                for i in range(4):
                    t0 = time.time()
                    mode_agg(df, None, "v").collect()
                    dt = time.time() - t0
                    if i:  # drop the warm-up
                        times.append(dt)
                df.unpersist()
                key = f"{kind}_{n}_{int(null_frac * 100)}pct_null"
                results[key] = round(statistics.median(times), 4)
    spark.stop()

    print("| type | elements | nulls | median sec (3 runs) |")
    print("|---|---|---|---|")
    for kind in ("int32", "utf8"):
        for n in (100_000, 1_000_000):
            for null_frac in (0.0, 0.3, 0.7):
                key = f"{kind}_{n}_{int(null_frac * 100)}pct_null"
                print(
                    f"| {kind} | {n:,} | {int(null_frac * 100)}% "
                    f"| {results[key]} |"
                )
    print(json.dumps({"metric": "mode_grid_median_sec", "cells": results}))


if __name__ == "__main__":
    main()
