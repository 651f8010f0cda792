"""Geospatial operators as native integer expressions.

Coordinates are integer MICRODEGREES (1e-6 deg) throughout — floats
never enter the hot path, so every predicate stays inside whole-stage
codegen AND is bit-reproducible across engines/partition layouts (the
repo's hash-exactness convention). The metric is planar equirectangular
on (lat, lon) microdegrees; real-geo users would scale dlon by
cos(lat) — documented out of scope, the distributed shapes are
identical.

Three building blocks:

- ``grid_cell`` / ``neighbor_cells`` — fixed-width grid blocking for
  radius-bounded nearest-neighbor joins. With cell size C equal to the
  search radius R, any point within Euclidean distance R of a probe
  lies in the probe's 3x3 cell neighborhood (|dx|<=R<=C, |dy|<=C), so
  the blocked equi-join is LOSSLESS vs the O(n^2) all-pairs join — the
  same guarantee family as dedup.py's banded MinHash. At 100 TB this
  is the shape: cells shuffle, points never cross-join.
- ``geohash_sql`` — standard 5-character geohash via the closed form:
  the k leading geohash bits of a dimension equal the top-k bits of
  the scaled integer ``floor((v - lo) * 2^k / span)``, so the usual
  25-step bisection collapses to two integer multiply-divides and a
  13+12 bit interleave (pure ``>> << & |``, identical text in Spark
  SQL and DuckDB).
- ``point_in_polygon_sql`` — even-odd ray casting with the float
  division eliminated by cross-multiplication: for edge (x1,y1)-(x2,y2)
  with dy = y2-y1 > 0, ``px < x1 + (x2-x1)(py-y1)/dy`` is exactly
  ``(px-x1)*dy - (x2-x1)*(py-y1) < 0`` (comparator flips for dy < 0).
  The polygon is unrolled at codegen time; products stay < 2^62 for
  microdegree inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Full geodetic ranges in microdegrees (geohash is defined on these,
# regardless of where the data actually lives).
LAT_LO, LAT_SPAN = -90_000_000, 180_000_000
LON_LO, LON_SPAN = -180_000_000, 360_000_000


def grid_cell(lat_u: Column, lon_u: Column, cell_u: int) -> tuple[Column, Column]:
    """Grid cell of a point, from non-negative shifted microdegrees so
    integer division is an unambiguous floor in every engine."""
    return (
        F.floor((lat_u - F.lit(LAT_LO)) / F.lit(cell_u)).cast("long"),
        F.floor((lon_u - F.lit(LON_LO)) / F.lit(cell_u)).cast("long"),
    )


def explode_neighbor_cells(df: DataFrame, cell_lat: str, cell_lon: str) -> DataFrame:
    """Explode each row to its 9 neighboring cells (the build side of a
    radius-bounded NN join). 9x the build rows, never 9x the big probe
    side — put the SMALLER relation through this."""
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    return (
        df.withColumn("__dlat", F.explode(offsets))
        .withColumn("__dlon", F.explode(offsets))
        .withColumn(cell_lat, F.col(cell_lat) + F.col("__dlat"))
        .withColumn(cell_lon, F.col(cell_lon) + F.col("__dlon"))
        .drop("__dlat", "__dlon")
    )


def geohash_sql(lat_col: str, lon_col: str, intdiv: str) -> str:
    """SQL expression for the 5-char geohash of microdegree columns.

    ``intdiv`` is the engine's integer-division operator ('div' for
    Spark SQL, '//' for DuckDB); everything else is identical text, so
    Spark and the oracle evaluate the same formula.
    """
    g = f"((({lon_col}) - ({LON_LO})) * 8192 {intdiv} {LON_SPAN})"  # 13 bits
    a = f"((({lat_col}) - ({LAT_LO})) * 4096 {intdiv} {LAT_SPAN})"  # 12 bits
    # Interleave, lon first at the MSB: lon bit i -> code bit 2i,
    # lat bit j -> code bit 2j+1 (code is 25 bits, MSB = lon bit 12).
    terms = [f"((({g} >> {i}) & 1) << {2 * i})" for i in range(13)]
    terms += [f"((({a} >> {j}) & 1) << {2 * j + 1})" for j in range(12)]
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{GEOHASH32}', CAST((({code} >> {20 - 5 * k}) & 31) AS INT) + 1, 1)"
        for k in range(5)
    ]
    return "(" + " || ".join(chars) + ")"


def point_in_polygon_sql(
    px_col: str, py_col: str, polygon: list[tuple[int, int]]
) -> str:
    """SQL boolean: even-odd ray cast of (px, py) against a fixed
    integer polygon, unrolled edge-by-edge with no division. Identical
    text is valid in Spark SQL and DuckDB."""
    edges = []
    n = len(polygon)
    for k in range(n):
        x1, y1 = polygon[k]
        x2, y2 = polygon[(k + 1) % n]
        dy = y2 - y1
        if dy == 0:
            continue  # horizontal edges never cross the +x ray test
        cmp = "<" if dy > 0 else ">"
        edges.append(
            f"(CASE WHEN (({y1} > {py_col}) != ({y2} > {py_col})) AND "
            f"((({px_col}) - ({x1})) * ({dy}) - "
            f"({x2 - x1}) * (({py_col}) - ({y1}))) {cmp} 0 "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(edges) + ") % 2 = 1)"
