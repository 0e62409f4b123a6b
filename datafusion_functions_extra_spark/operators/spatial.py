"""Spatial operators: grid-bucketed radius joins, geohash cells, and
nearest-neighbor-within-radius — the bucket-then-verify paradigm (the
same shape as the MinHash band join) applied to 2-D point data.

The reference engine has no spatial surface; this family covers the
geo-skew / geo-dedup legs of a training-data pipeline (e.g. dropping
near-identical crawl records from the same geo bucket, or rolling up
user activity to map cells).  All arithmetic is integer micro-degrees,
so every distance, cell id and geohash label is bit-exact across
engines — no trigonometry in the join path (a haversine verify at real
scale is a final per-candidate refinement; the bucketing is identical).

Scale notes (100 TB):

* candidate generation explodes ONE side into its 3x3 neighbor cells (a
  literal 9-element array, a projection — never a join against an
  offsets relation), then hash-joins on the other side's HOME cell.
  With cell width >= radius, every true pair is found exactly once (the
  (dx, dy) witness is unique), so no post-join dedup shuffle.
* per-cell density bounds the join fan-out; a skewed mega-cell is the
  geo analog of an LSH hub bucket and is screened the same way (cell
  histogram = `geo_cell_counts`, degree cap upstream if needed).
* the exact verify (squared micro-degree distance <= R^2) runs on
  candidates only, all in 64-bit integers (max |delta| ~ 4e6 -> d2
  ~ 3.2e13, far inside long range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import hash60

#: synthetic mini-world half-extent in micro-degrees (lat/lon in
#: [-20e6, +20e6]) — dense enough that radius joins at test SF produce
#: meaningful pair counts; the operators themselves are range-agnostic.
WORLD_HALF = 20_000_000


def geo_points(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic (lat, lon) in integer micro-degrees per
    distinct id — the md5-derived projection the suite uses wherever the
    testdata lacks a native column (same device as the self-encoded PNG
    fixtures).  Reproducible in any engine with md5 + hex parse."""
    half = F.lit(WORLD_HALF)
    span = F.lit(2 * WORLD_HALF + 1)
    pid = F.col("pid").cast("string")
    return (
        df.select(F.col(id_col).alias("pid"))
        .distinct()
        .select(
            "pid",
            (hash60(F.concat(F.lit("glat:"), pid)) % span - half).alias("lat"),
            (hash60(F.concat(F.lit("glon:"), pid)) % span - half).alias("lon"),
        )
    )


#: the standard geohash base32 alphabet (no a/i/l/o)
_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash4(lat: Column, lon: Column) -> tuple[Column, Column]:
    """(20-bit Morton key, 4-char geohash label) for integer micro-degree
    coordinates.  Quantization is the exact-integer form of geohash's
    successive halving: b = min(1023, (x + half_range) * 1024 div
    full_range); interleaving puts longitude on the odd (higher) bit of
    each pair, so the key's MSB is lon bit 9 — the geohash convention —
    and the label is the key read 5 bits at a time through the base32
    alphabet.  Pure bit arithmetic, bit-exact cross-engine."""
    # floor(x/y) on doubles is exact here: the numerator is < 2^53 and a
    # non-integer quotient sits >= 1/360e6 away from the nearest integer,
    # ~7 orders of magnitude beyond the double rounding error at this
    # magnitude — so the floor can never cross a boundary.
    latb = F.least(
        F.lit(1023),
        F.floor(((lat + F.lit(90_000_000)) * 1024) / F.lit(180_000_000)),
    ).cast("long")
    lonb = F.least(
        F.lit(1023),
        F.floor(((lon + F.lit(180_000_000)) * 1024) / F.lit(360_000_000)),
    ).cast("long")
    key = F.lit(0).cast("long")
    for i in range(10):
        key = (
            key
            + F.shiftleft(F.shiftrightunsigned(lonb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(latb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    label = F.concat(
        *[
            F.substring(
                F.lit(_GH32),
                (
                    F.shiftrightunsigned(key, shift).bitwiseAND(F.lit(31)) + 1
                ).cast("int"),
                1,
            )
            for shift in (15, 10, 5, 0)
        ]
    )
    return key, label


def geohash4_sql(lat: str, lon: str) -> tuple[str, str]:
    """DuckDB oracle text for :func:`geohash4` — same quantization, same
    interleave, same alphabet indexing."""
    latb = f"least(1023, (({lat} + 90000000) * 1024) // 180000000)"
    lonb = f"least(1023, (({lon} + 180000000) * 1024) // 360000000)"
    terms = []
    for i in range(10):
        terms.append(f"((({lonb} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({latb} >> {i}) & 1) << {2 * i})")
    key = "(" + " + ".join(terms) + ")"
    label = " || ".join(
        f"substr('{_GH32}', CAST((({key} >> {s}) & 31) + 1 AS INTEGER), 1)"
        for s in (15, 10, 5, 0)
    )
    return key, "(" + label + ")"


def _with_cells(points: DataFrame, cell: int) -> DataFrame:
    """Home cell coordinates (non-negative, exact integer div)."""
    return points.select(
        "pid",
        "lat",
        "lon",
        F.expr(f"(lat + {WORLD_HALF}) div {cell}").alias("cy"),
        F.expr(f"(lon + {WORLD_HALF}) div {cell}").alias("cx"),
    )


def radius_candidates(points: DataFrame, radius: int, cell: int | None = None) -> DataFrame:
    """Grid-bucketed candidate pairs within `radius` micro-degrees:
    left side exploded into its 3x3 neighborhood (literal array — a
    projection, not a join), equi-joined on the right side's home cell,
    exact integer d2 attached.  cell defaults to radius (the minimal
    width for 3x3 sufficiency).  Caller filters d2 <= radius^2 and
    chooses the pair orientation."""
    cell = cell or radius
    pts = _with_cells(points, cell)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("pid").alias("pa"),
        F.col("lat").alias("lata"),
        F.col("lon").alias("lona"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "pa",
        "lata",
        "lona",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("pid").alias("pb"),
        F.col("lat").alias("latb"),
        F.col("lon").alias("lonb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("lata") - F.col("latb")) * (F.col("lata") - F.col("latb")) + (
        F.col("lona") - F.col("lonb")
    ) * (F.col("lona") - F.col("lonb"))
    return left.join(right, ["jx", "jy"]).select(
        "pa", "pb", d2.alias("d2")
    )


def radius_pairs(points: DataFrame, radius: int) -> DataFrame:
    """Unordered point pairs within `radius`: candidates with pa < pb and
    the exact integer verify.  Each true pair appears exactly once (its
    (dx, dy) cell witness is unique), so there is no distinct()."""
    return (
        radius_candidates(points, radius)
        .where((F.col("pa") < F.col("pb")) & (F.col("d2") <= radius * radius))
        .select("pa", "pb", "d2")
    )


def nn_within_radius(points: DataFrame, radius: int) -> DataFrame:
    """Per-point nearest OTHER point within `radius` — the bounded-radius
    exact NN join (the scalable form: unbounded NN requires expanding
    ring searches; a pipeline always has a 'too far to matter' cutoff).
    Ties broken by neighbor id via the reference min_by composite."""
    from ..functions.aggregates import min_by

    cand = radius_candidates(points, radius).where(
        (F.col("pa") != F.col("pb")) & (F.col("d2") <= radius * radius)
    )
    best = F.struct(F.col("d2"), F.col("pb"))
    return cand.groupBy("pa").agg(
        min_by(F.col("pb"), best).alias("nn"),
        min_by(F.col("d2"), best).alias("nn_d2"),
        F.count(F.lit(1)).alias("n_in_radius"),
    )
