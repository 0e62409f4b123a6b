"""Round-9 advisory fixes pinned as tests:

- ``events_ar2_forecast`` tail lookup on a series with a GAP just before
  its last day (the r8 advisor finding: a post-join filter on the
  c_prev side inner-ized the left join, so a type with no events on day
  dmax-1 was dropped entirely, while the DuckDB oracle's
  ``LEFT JOIN ... ON d = dmax - 1`` kept it with c_prev = 0).  The fix
  moves the day predicate into the join condition; this test builds an
  events fixture with exactly such a tail gap and asserts the Spark and
  DuckDB results agree row-for-row, with the gapped type present and
  c_prev = 0.
- ``quality_platt_scaling`` log-loss probability clamp: the clamped
  sigmoid never reaches 0/1, so an all-positive score bin cannot turn
  ``0 * log(0)`` into a silently-dropped NaN (Spark) vs a hard ln(0)
  failure (DuckDB).  Pinned as a direct expression-level check of the
  clamp bounds used on both sides.
"""

from __future__ import annotations

import datetime as dt

import duckdb

from datafusion_functions_extra_spark import suite


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ar2_forecast_keeps_type_with_tail_gap(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def day(d):
        return base + dt.timedelta(days=d)

    rows = []
    # type "gap": active days 0..4, NOTHING on day 5, last day 6
    # -> c_prev (day dmax-1 = 5) must be 0 and the row must survive.
    counts = {0: 3, 1: 1, 2: 4, 3: 2, 4: 5, 6: 2}
    for d, c in counts.items():
        for i in range(c):
            rows.append((day(d) + dt.timedelta(minutes=i), "gap"))
    # type "dense": consecutive days 0..6 (control — both engines always
    # kept it; pins that the join-condition rewrite did not disturb it).
    for d, c in {0: 2, 1: 3, 2: 1, 3: 4, 4: 2, 5: 3, 6: 1}.items():
        for i in range(c):
            rows.append((day(d) + dt.timedelta(minutes=i), "dense"))
    sf_dir = _write_events(tmp_path, rows)

    spark_pd = (
        suite.QUERIES["events_ar2_forecast"](spark, sf_dir)
        .toPandas()
        .sort_values("event_type", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    duck_pd = (
        con.execute(suite.ORACLES["events_ar2_forecast"])
        .df()
        .sort_values("event_type", ignore_index=True)
    )
    con.close()

    assert list(spark_pd["event_type"]) == ["dense", "gap"]
    assert list(duck_pd["event_type"]) == ["dense", "gap"]
    gap_row = spark_pd[spark_pd["event_type"] == "gap"].iloc[0]
    assert int(gap_row["c_prev"]) == 0
    assert int(gap_row["c_last"]) == 2
    for col in spark_pd.columns:
        for a, b in zip(spark_pd[col].tolist(), duck_pd[col].tolist()):
            if isinstance(a, float):
                assert abs(a - b) < 1e-12, (col, a, b)
            else:
                assert a == b, (col, a, b)


def test_platt_logloss_clamp_bounds():
    src = suite.ORACLES["quality_platt_scaling"]
    # The oracle's log-loss subquery must clamp p identically to the
    # Spark side's F.least(F.greatest(p, 1e-12), 1 - 1e-12).
    assert "least(greatest(1.0 / (1.0 + exp(-(f3.a * h.s + f3.b)))" in src
    assert "1e-12" in src
