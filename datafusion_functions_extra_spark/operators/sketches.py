"""Count-min sketch as a relational, mergeable aggregate.

A count-min sketch (Cormode & Muthukrishnan 2005, public) summarizes a
frequency distribution in ``depth x width`` counters: each item
increments one counter per row (column chosen by that row's hash), and a
point estimate is the MIN over the rows — always >= the true count, with
overestimate bounded by collisions.

Relational formulation (the same design as ``operators/bloom.py``'s
(bucket, word) bloom filter): the sketch IS a DataFrame of
``(r, c, cnt)`` rows — built with one explode + one groupBy, merged
across corpora by unioning and re-summing (the monoid streaming needs),
broadcast for probing (``depth * width`` rows, ~KBs).  Nothing is
driver-side; the hash math is the multiply-mod family over the md5-based
``hash60`` (``similarity.py``), so a DuckDB oracle can reproduce every
counter bit-exactly — estimates and all — which is how this sketch stays
inside the driver's hash gate while HLL/GK (engine-internal state) run
as rows-only checks.

At 100 TB: the token stream is exploded ``depth`` times, but the shuffle
carries only ``(r, c)`` integer keys with map-side combine, and the
result is O(depth*width) regardless of input size.  This is the
heavy-hitter / frequency-tracking primitive for corpus monitoring where
an exact per-token groupBy is unwanted state.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import MERSENNE_P, _hash60_sql, hash60

CMS_DEPTH = 4
CMS_WIDTH = 256

_rng = random.Random(11)
#: per-row multiply-add constants; a*h < 2^31 * 2^31 fits int64 on both
#: engines (the reason hash values are folded into the Mersenne field
#: before permuting)
CMS_PERMS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P))
    for _ in range(CMS_DEPTH)
)


def _cms_col(h: Column, row: int) -> Column:
    a, b = CMS_PERMS[row]
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P) % F.lit(CMS_WIDTH)


def _cms_col_sql(h: str, row: int) -> str:
    a, b = CMS_PERMS[row]
    return f"(({a} * {h} + {b}) % {MERSENNE_P} % {CMS_WIDTH})"


def cms_build(items: DataFrame, item_col: str) -> DataFrame:
    """(r, c, cnt) sketch relation over the item stream (one row per item
    occurrence in ``items``)."""
    h = (hash60(F.col(item_col)) % F.lit(MERSENNE_P)).alias("h")
    hashed = items.select(h)
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cms_col(F.col("h"), r).alias("c"))
            for r in range(CMS_DEPTH)
        ]
    )
    return (
        hashed.select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str) -> DataFrame:
    """(item, est_n) point estimates for every row of ``probes``: min over
    the sketch's depth rows at the item's (r, c) coordinates.  The sketch
    is broadcast — probing never shuffles the probe side."""
    h = (hash60(F.col(item_col)) % F.lit(MERSENNE_P)).alias("h")
    coords = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cms_col(F.col("h"), r).alias("c"))
            for r in range(CMS_DEPTH)
        ]
    )
    probe_rc = probes.select(F.col(item_col), h).select(
        item_col, F.explode(coords).alias("rc")
    ).select(item_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        probe_rc.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )


def cms_join_size_estimate(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """One row ``(est_pairs)``: the count-min estimate of equi-join
    cardinality ``sum_k fA(k) * fB(k)`` — min over the depth rows of the
    per-row counter inner product (Cormode & Muthukrishnan's inner-product
    query).  Always >= the true join size; equality when a row is
    collision-free.

    This is the join-planning/observability primitive: two O(depth*width)
    relations answer "how big would this join be" without touching the
    join inputs again.  Sketch-sketch join is tiny; a missing (r, c)
    match contributes zero, and rows with no matches at all are restored
    via the depth spine so the min is over all depth rows.
    """
    a = sketch_a.select("r", "c", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("r", "c", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("p"))
    )
    spine = (
        sketch_a.sparkSession.range(CMS_DEPTH)
        .select(F.col("id").cast("int").alias("r"))
    )
    return (
        spine.join(per_row, "r", "left")
        .select(F.coalesce("p", F.lit(0)).alias("p"))
        .agg(F.min("p").alias("est_pairs"))
    )


def cms_cte_sql(prefix: str = "") -> str:
    """DuckDB CTE fragment ``{prefix}sketch(r, c, cnt)`` given a relation
    ``{prefix}items(item)`` already defined; splice after that CTE.  A
    non-empty prefix lets one query build several sketches (e.g. the
    join-size estimator's two sides)."""
    p = prefix
    unions = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_col_sql('h', r)} AS c FROM {p}hashed"
        for r in range(CMS_DEPTH)
    )
    return f"""
{p}hashed AS (SELECT {_hash60_sql('item')} % {MERSENNE_P} AS h FROM {p}items),
{p}rc AS ({unions}),
{p}sketch AS (SELECT r, c, count(*) AS cnt FROM {p}rc GROUP BY r, c)
"""


# ---------------------------------------------------------------------------
# HyperLogLog as a relational, mergeable, oracle-exact sketch
# ---------------------------------------------------------------------------

#: HLL parameters (Flajolet et al. 2007, public): 2^8 = 256 registers,
#: standard error 1.04/sqrt(256) ~= 6.5%
HLL_P = 8
HLL_M = 1 << HLL_P
#: rank window: the 60-bit hash minus the 8 bucket bits
HLL_RANK_BITS = 52
#: bias-correction constant for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_rho(w: Column) -> Column:
    """Position of the highest set bit from the top of the 52-bit window
    + 1 (the HLL rank; ``w == 0`` -> 53).  A chain of 52 integer
    comparisons rather than ``floor(log2(w))``: near 2^k - 1 the float
    log can land on either side of the integer under different libm
    implementations, and this sketch's whole point is bit-exact
    cross-engine registers."""
    out = F.lit(HLL_RANK_BITS + 1)
    for k in range(1, HLL_RANK_BITS + 1):
        # w >= 2^(k-1)  =>  bit_length >= k  =>  rho = 52 - k + 1
        out = F.when(
            w >= F.lit(1 << (k - 1)), F.lit(HLL_RANK_BITS - k + 1)
        ).otherwise(out)
    return out


def _hll_rho_sql(w: str) -> str:
    whens = " ".join(
        f"WHEN {w} >= {1 << (k - 1)} THEN {HLL_RANK_BITS - k + 1}"
        for k in range(HLL_RANK_BITS, 0, -1)
    )
    return f"(CASE {whens} ELSE {HLL_RANK_BITS + 1} END)"


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., bucket, r) — the HLL register relation: bucket = low 8
    hash bits, r = max rank of the remaining 52 bits (``shiftright``,
    never float division — the hash exceeds 2^53 and a double round-trip
    would corrupt low bits).  This IS the sketch: <= 256 rows per group
    regardless of input size, merged across corpora/streams by
    union + re-max (the monoid), and bit-exactly reproducible in any
    engine with md5 — unlike ``approx_count_distinct``'s
    engine-internal state, which is why that suite entry is rows-only
    while this one hash-matches."""
    from ..functions.text import bind_once

    h = hash60(F.col(value_col).cast("string"))
    # bind the md5 hash once: the 52-comparison rank chain references it
    # 52 times and would otherwise inline the md5 into every branch
    keyed = df.select(
        *[F.col(g) for g in group_cols],
        bind_once(
            h,
            lambda hb: F.struct(
                (hb % F.lit(HLL_M)).alias("bucket"),
                _hll_rho(F.shiftright(hb, HLL_P)).alias("rho"),
            ),
        ).alias("s"),
    ).select(*group_cols, "s.bucket", "s.rho")
    return keyed.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_est, n_zero_buckets) from a register relation.

    The harmonic sum runs in scaled-integer space —
    ``S * 2^53 = sum(2^(53 - r)) + zeros * 2^53`` fits int64 and makes
    the sum order-independent, so the only float ops are one exact
    power-of-two division, the final multiply, and ``ln`` on the
    small-range-correction branch (boundary-nudged like every other
    cross-engine ratio)."""
    from ..functions.rounding import r6n

    scale = HLL_RANK_BITS + 1  # 53
    per_group = registers.groupBy(*group_cols).agg(
        # F.shiftleft requires a literal bit count; the SQL form accepts a
        # column expression for the per-register exponent
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {scale} - r)")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    s = (
        F.col("s_present") + zeros * F.lit(1 << scale).cast("long")
    ).cast("double") / F.lit(float(1 << scale))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    corrected = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        r6n(corrected).alias("hll_est"),
        zeros.cast("int").alias("n_zero_buckets"),
    )


def hll_cte_sql(table: str, value_col: str, group_col: str) -> str:
    """DuckDB mirror: identical bucket/rank math (integer comparison
    chain over ``h >> 8``), identical scaled-integer harmonic sum,
    identical correction branch; ends in
    ``hll(g, hll_est, n_zero_buckets)``."""
    from ..functions.rounding import r6n_sql

    h = _hash60_sql(f"{value_col}::VARCHAR")
    scale = HLL_RANK_BITS + 1
    est = (
        f"CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0 "
        f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros::DOUBLE) "
        f"ELSE raw END"
    )
    return f"""
hx0 AS (SELECT {group_col} AS g, {h} AS h FROM {table}),
hx AS (SELECT g, h % {HLL_M} AS bucket,
              {_hll_rho_sql(f'(h >> {HLL_P})')} AS rho
       FROM hx0),
regs AS (SELECT g, bucket, max(rho) AS r FROM hx GROUP BY 1, 2),
pg AS (
  SELECT g,
         sum((1::BIGINT << ({scale} - r)))::BIGINT AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY 1
),
pg2 AS (
  SELECT g,
         {HLL_ALPHA * HLL_M * HLL_M!r} /
           ((s_present + ({HLL_M} - n_present) * (1::BIGINT << {scale}))::DOUBLE
            / {float(1 << scale)!r}) AS raw,
         ({HLL_M} - n_present)::BIGINT AS zeros
  FROM pg
),
hll AS (
  SELECT g, {r6n_sql(est)} AS hll_est, zeros::INT AS n_zero_buckets
  FROM pg2
)
"""


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------

#: KMV parameters: k minimum 60-bit hashes per group
KMV_K = 64
#: 2^60 as a double — the hash-space size the k-th minimum is scaled by
KMV_SPACE = float(1 << 60)

#: shared estimate finisher over (nb = #sketch rows, hk = k-th minimum
#: hash) — exact-count fallback below k, else the classic (k-1)/F(h_k)
#: estimator (Bar-Yossef et al. 2002 / Beyer et al. 2007)
KMV_EST = (
    f"(CASE WHEN nb < {KMV_K} THEN nb * 1.0"
    f" ELSE {KMV_K - 1}.0 * {KMV_SPACE!r} / hk END)"
)


def kmv_sketch(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, h) — the KMV sketch relation: the ``KMV_K`` smallest
    distinct 60-bit content hashes of ``value_col`` per group.

    The sketch IS a relation (like the CMS/HLL siblings above), so
    "merge" is literally ``unionAll`` + re-applying this bottom-k —
    bottom-k of a union of bottom-ks equals bottom-k of the union, an
    EXACT identity (not an approximation), which
    ``suite.events_kmv_distinct`` certifies inside the hash-compared
    output.  Scale shape: one distinct reduction on (group, hash) then
    a PARTITIONED row_number (one partition per group, each at most
    |hash domain| rows before the limit, k after)."""
    h = (
        df.select(
            F.col(group_col).alias("g"),
            hash60(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .select("g", "h")
    )


def kmv_rebottom(sketches: DataFrame) -> DataFrame:
    """Merge a union of sketch relations back to one sketch per group:
    distinct hashes, then bottom-k again (the exact merge identity)."""
    w = Window.partitionBy("g").orderBy("h")
    return (
        sketches.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .select("g", "h")
    )


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """(g, nb, hk, kmv_est) from a sketch relation — ``KMV_EST`` is the
    shared finisher text so both engines run identical double ops."""
    agg = sketch.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.max("h").cast("double").alias("hk"),
    )
    return agg.withColumn("kmv_est", F.expr(KMV_EST))


def kmv_cte_sql(table: str, value_col: str, group_col: str, prefix: str = "") -> str:
    """DuckDB mirror ending in ``{prefix}est(g, nb, hk, kmv_est)``."""
    h = _hash60_sql(f"{value_col}::VARCHAR")
    return f"""{prefix}h AS (
  SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table}
),
{prefix}bk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM {prefix}h
  ) WHERE rn <= {KMV_K}
),
{prefix}est AS (
  SELECT g, count(*)::BIGINT AS nb, max(h)::DOUBLE AS hk,
         {KMV_EST} AS kmv_est
  FROM {prefix}bk GROUP BY g
)"""
