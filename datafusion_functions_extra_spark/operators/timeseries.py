"""Hypertable-style time-series operators: bucketed downsampling with
gap-filling and linear interpolation.

The reference engine has no time-series surface; this is part of the
training-pipeline/analytics extension layer (SURVEY.md §2.2).  Semantics
follow the classic hypertable ``time_bucket_gapfill`` + ``interpolate``
pair: downsample to fixed buckets, materialize the missing buckets of each
series, and fill their values by linear interpolation between the nearest
observed neighbors (forward/backward fill at the edges).

Scale shape: one hash aggregate on (key, bucket) — cardinality = series x
buckets, tiny relative to the input — then everything downstream (bounds,
grid explode, fill windows) runs on the *downsampled* table.  The only
sort is one window sort per series over bucket counts, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import r6n, r6n_sql


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Downsample ``value_col`` into ``unit`` buckets per ``key_col`` series,
    then emit a dense bucket grid with missing buckets linearly
    interpolated.

    Returns (key, bucket_us, n_events, value_filled, is_gap):

    * ``n_events`` — rows observed in the bucket (0 for gap buckets);
    * ``value_filled`` — sum(value) for observed buckets; for gaps, the
      linear interpolation between the nearest observed buckets, or the
      nearest single neighbor at the series edges;
    * ``is_gap`` — 1 where the bucket had no rows.

    Plan: groupBy (key, bucket) -> per-key min/max -> sequence+explode the
    grid -> left join observed buckets -> two frame-windows over ONE sort
    per series (Spark evaluates same-partitioning/ordering windows in a
    single sort pass).  No cross join, no driver-side iteration.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    hourly = df.groupBy(key_col, bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("v"),
    )
    grid = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval 1 {unit}"))
            ).alias("bucket"),
        )
    )
    dense = grid.join(hourly, [key_col, "bucket"], "left")

    order = Window.partitionBy(key_col).orderBy("bucket")
    w_prev = order.rowsBetween(Window.unboundedPreceding, 0)
    w_next = order.rowsBetween(0, Window.unboundedFollowing)
    x = F.unix_micros(F.col("bucket"))
    obs_x = F.when(F.col("v").isNotNull(), x)
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    next_v = F.first("v", ignorenulls=True).over(w_next)
    prev_x = F.last(obs_x, ignorenulls=True).over(w_prev)
    next_x = F.first(obs_x, ignorenulls=True).over(w_next)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * ((x - prev_x) / (next_x - prev_x)),
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return dense.select(
        key_col,
        x.alias("bucket_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        # interpolation = 2-dp sums scaled by bucket-offset fractions
        # (1/64-style), which can extend to 7-digit half boundaries ->
        # boundary-nudged rounding on both engines
        r6n(interp).alias("value_filled"),
        F.when(F.col("n_events").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def gap_fill_interpolate_oracle_sql(
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB formulation: generate_series grid + IGNORE NULLS fill windows,
    mirroring :func:`gap_fill_interpolate` term for term (same expression
    shapes so doubles agree to well under the 6-dp rounding)."""
    _interp_case = (
        "CASE WHEN v IS NOT NULL THEN v "
        "WHEN prev_v IS NOT NULL AND next_v IS NOT NULL "
        "THEN prev_v + (next_v - prev_v) * ((x - prev_x) / (next_x - prev_x)) "
        "ELSE coalesce(prev_v, next_v) END"
    )
    return f"""
WITH hourly AS (
  SELECT {key_col} AS k, date_trunc('hour', CAST({ts_col} AS TIMESTAMP)) AS bucket,
         count(*) AS n_events, sum({value_col}) AS v
  FROM {table} GROUP BY 1, 2
),
bounds AS (SELECT k, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
),
dense AS (
  SELECT g.k, g.bucket, h.n_events, h.v
  FROM grid g LEFT JOIN hourly h ON g.k = h.k AND g.bucket = h.bucket
),
filled AS (
  SELECT k, bucket, n_events, v, epoch_us(bucket) AS x,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    last_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_x,
    first_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_x
  FROM dense
)
SELECT k AS {key_col}, x AS bucket_us,
       coalesce(n_events, 0) AS n_events,
       {r6n_sql(_interp_case)} AS value_filled,
       CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS is_gap
FROM filled
"""


def ewma_bounded(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    n: int = 10,
    alpha: float = 0.2,
) -> DataFrame:
    """Bounded-window exponentially weighted moving average per key:
    over the last ``n`` rows, ``ewma = Σ β^k·x_{t-k} / Σ β^k`` with
    ``β = 1 - alpha`` and k the offset from the current row — the
    smoothing/alerting signal that weights recent events harder than a
    plain moving mean.

    A full-history EWMA is a linear recurrence Spark windows can't
    express without numerically explosive prefix products; the bounded
    form is exact, one shuffle + one sort like any frame window, and the
    truncation error of the dropped tail is β^n (≈0.107 at the
    defaults) of the weight mass.

    Determinism: the frame list is reversed so index = offset, then
    folded sequentially — the same left-to-right order DuckDB's
    list_sum uses — and the num/den ratio rounds through ``r6n``
    (pow() ulp differences sit ~1e-16, far under the 1e-9 nudge).
    """
    beta = 1.0 - alpha
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(-(n - 1), 0)
    )
    vals = F.reverse(F.collect_list(F.col(value_col).cast("double")).over(w))

    def fold(v):
        acc0 = F.struct(
            F.lit(0.0).alias("num"), F.lit(0.0).alias("den"), F.lit(1.0).alias("wgt")
        )
        return F.aggregate(
            v,
            acc0,
            lambda a, x: F.struct(
                (a.num + x * a.wgt).alias("num"),
                (a.den + a.wgt).alias("den"),
                (a.wgt * F.lit(beta)).alias("wgt"),
            ),
            lambda a: a.num / a.den,
        )

    return df.select(
        F.col(order_tiebreak),
        F.col(key_col),
        r6n(fold(vals)).alias("ewma"),
    )


def ewma_bounded_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    n: int = 10,
    alpha: float = 0.2,
) -> str:
    """DuckDB mirror: same reversed frame list, same sequential fold
    realized as an indexed transform + list_sum (left-to-right, matching
    Spark's F.aggregate order)."""
    beta = 1.0 - alpha
    num = (
        f"list_sum(list_transform(generate_series(1, len(l)), "
        f"i -> l[i] * pow({beta}, i - 1)))"
    )
    den = (
        f"list_sum(list_transform(generate_series(1, len(l)), "
        f"i -> pow({beta}, i - 1)))"
    )
    return f"""
WITH fr AS (
  SELECT {order_tiebreak}, {key_col},
         list_reverse(list({value_col}) OVER (
           PARTITION BY {key_col}
           ORDER BY CAST({ts_col} AS TIMESTAMP), {order_tiebreak}
           ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)) AS l
  FROM {table}
)
SELECT {order_tiebreak}, {key_col}, {r6n_sql(f'{num} / {den}')} AS ewma
FROM fr
"""


def kaplan_meier(
    lab: DataFrame,
    dur_col: str = "dur",
    cens_col: str = "cens",
) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) from one row
    per subject: ``dur_col`` = observed duration (integer), ``cens_col``
    = 1 if right-censored at that duration, 0 if the event occurred.

    Returns (duration_days, n_death, n_censored, at_risk, survival)
    where survival = prod_{t' <= t} (1 - d/n), realized as exp of a
    running sum of logs so the product becomes a parallelizable monoid.
    The d = n absorbing state (survival exactly 0 from then on) is
    carried by a second running flag — both engines pin the undefined
    ln(0) term to 0 and zero the curve via the flag, so the SQL mirror
    in ``suite.users_survival_curve`` hash-matches.

    Scale shape: subjects reduce to a (duration -> deaths, censored)
    histogram; at-risk counts and the log-survival accumulation are
    two-phase :func:`..functions.distribution.global_cumsum` passes over
    that bounded relation — never a single-partition window.
    """
    from ..functions.distribution import global_cumsum
    from ..functions.rounding import r6n

    h = lab.groupBy(F.col(dur_col).alias("dur")).agg(
        F.sum(F.lit(1) - F.col(cens_col)).cast("long").alias("n_death"),
        F.sum(cens_col).cast("long").alias("n_cens"),
    )
    tot = lab.agg(F.count(F.lit(1)).alias("total"))
    cum = (
        global_cumsum(
            h.withColumn("dc", F.col("n_death") + F.col("n_cens")),
            "dur", "dc", "cum_dc",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("at_risk", F.col("total") - (F.col("cum_dc") - F.col("dc")))
        .withColumn(
            "lnt",
            F.when(
                (F.col("n_death") == 0) | (F.col("n_death") == F.col("at_risk")),
                F.lit(0.0),
            ).otherwise(
                F.log(
                    F.lit(1.0)
                    - F.col("n_death").cast("double") / F.col("at_risk")
                )
            ),
        )
        .withColumn("zf", (F.col("n_death") == F.col("at_risk")).cast("int"))
    )
    s = global_cumsum(
        global_cumsum(cum, "dur", "lnt", "cum_ln"), "dur", "zf", "cum_zf"
    )
    return s.select(
        F.col("dur").alias("duration_days"),
        "n_death",
        F.col("n_cens").alias("n_censored"),
        F.col("at_risk").cast("long").alias("at_risk"),
        r6n(
            F.when(F.col("cum_zf") > 0, F.lit(0.0)).otherwise(
                F.exp(F.col("cum_ln"))
            )
        ).alias("survival"),
    )
