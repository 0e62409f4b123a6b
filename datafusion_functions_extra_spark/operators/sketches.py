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

from pyspark.sql import Column, DataFrame
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
