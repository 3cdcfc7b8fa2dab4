"""Grid-binned spatial nearest-neighbor join.

Vanilla Spark has no spatial index; the standard scale pattern
(Sedona/GeoSpark's core idea, Zhang et al.) is GRID BINNING: hash
both point sets to integer cells of side G, replicate each probe
point into its 3x3 cell neighborhood, equi-join on the cell, and
resolve the nearest candidate per probe. With radius R <= G the
neighborhood provably contains every point within R (a point farther
than one cell away is farther than G), so the result is EXACT — no
candidate outside the 9 cells can win. Both shuffles are keyed
(cell, then probe id); per-cell fan-out is bounded by point density,
the same skew profile as any keyed join (salt a pathological mega-
cell if one appears).

Geometry is deliberately planar (degrees treated as a flat plane,
squared Euclidean distance, NO sqrt and NO trig): haversine would
drag libm sin/cos into every comparison for zero additional test
power, and comparing SQUARED distances avoids the sqrt entirely.
Coordinates are synthesized from key congruences scaled by /100 —
exact-int-over-100 doubles both engines rebuild identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: cell side and search radius in degrees; R <= G is the exactness
#: precondition of the 3x3 neighborhood (see module docstring).
GRID_DEG = 1.0
RADIUS2 = 1.0  # R^2 with R = 1.0 = G


def _synth_points(df: DataFrame, key: str) -> DataFrame:
    """Deterministic planar coordinates from a bigint key:
    lat in [-85, 85), lon in [-180, 180), both on a 0.01-degree
    lattice (exact int / 100)."""
    lat = ((F.col(key) * 37) % 17000).cast("double") / 100.0 - 85.0
    lon = ((F.col(key) * 73) % 36000).cast("double") / 100.0 - 180.0
    return df.select(F.col(key), lat.alias("lat"), lon.alias("lon"))


def grid_nearest_join(
    probes: DataFrame, points: DataFrame, probe_key: str, point_key: str
) -> DataFrame:
    """For each probe, the nearest point within RADIUS2 (squared
    planar distance), ties broken by point key; probes with no point
    in range keep NULLs (left-outer)."""
    cell = lambda c: F.floor(c / F.lit(GRID_DEG)).cast("long")  # noqa: E731
    pts = points.select(
        F.col(point_key),
        F.col("lat").alias("p_lat"),
        F.col("lon").alias("p_lon"),
        cell(F.col("lat")).alias("cx"),
        cell(F.col("lon")).alias("cy"),
    )
    offsets = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    ).alias("o")
    probed = probes.select(
        F.col(probe_key), "lat", "lon",
        cell(F.col("lat")).alias("bx"),
        cell(F.col("lon")).alias("by"),
        offsets,
    ).select(
        probe_key, "lat", "lon",
        (F.col("bx") + F.col("o.dx")).alias("cx"),
        (F.col("by") + F.col("o.dy")).alias("cy"),
    )
    cand = probed.join(pts, ["cx", "cy"])
    dlat = F.col("lat") - F.col("p_lat")
    dlon = F.col("lon") - F.col("p_lon")
    d2 = dlat * dlat + dlon * dlon
    in_range = cand.withColumn("d2", d2).filter(F.col("d2") <= F.lit(RADIUS2))
    w = Window.partitionBy(probe_key).orderBy(
        F.col("d2").asc(), F.col(point_key).asc()
    )
    best = (
        in_range.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(probe_key, point_key, "d2")
    )
    return probes.select(probe_key, "lat", "lon").join(
        best, probe_key, "left"
    )


def spatial_nearest_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: nearest supplier depot within 1 degree of each
    customer location (both synthesized on the 0.01-degree lattice).
    Exactness of the grid pruning is pytest-pinned against a
    brute-force cross join at sf0.001."""
    cust = _synth_points(
        load_table(spark, sf_dir, "customer"), "c_custkey"
    )
    supp = _synth_points(
        load_table(spark, sf_dir, "supplier"), "s_suppkey"
    )
    out = grid_nearest_join(cust, supp, "c_custkey", "s_suppkey")
    return out.select(
        "c_custkey",
        stable_round(F.col("lat"), 2).alias("lat"),
        stable_round(F.col("lon"), 2).alias("lon"),
        "s_suppkey",
        stable_round(F.col("d2"), 9).alias("dist2"),
    )


SPATIAL_ORACLE = """
WITH cust AS (
    SELECT c_custkey,
           CAST((c_custkey * 37) % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
           CAST((c_custkey * 73) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
    FROM customer
),
supp AS (
    SELECT s_suppkey,
           CAST((s_suppkey * 37) % 17000 AS DOUBLE) / 100.0 - 85.0 AS p_lat,
           CAST((s_suppkey * 73) % 36000 AS DOUBLE) / 100.0 - 180.0 AS p_lon
    FROM supplier
),
cand AS (
    SELECT c.c_custkey, c.lat, c.lon, s.s_suppkey,
           (c.lat - s.p_lat) * (c.lat - s.p_lat)
             + (c.lon - s.p_lon) * (c.lon - s.p_lon) AS d2
    FROM cust c JOIN supp s
      ON abs(floor(c.lat / 1.0) - floor(s.p_lat / 1.0)) <= 1
     AND abs(floor(c.lon / 1.0) - floor(s.p_lon / 1.0)) <= 1
    WHERE (c.lat - s.p_lat) * (c.lat - s.p_lat)
            + (c.lon - s.p_lon) * (c.lon - s.p_lon) <= 1.0
),
best AS (
    SELECT c_custkey, s_suppkey, d2,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY d2 ASC, s_suppkey ASC) AS rn
    FROM cand
)
SELECT c.c_custkey,
       floor(c.lat * 100.0 + 0.5) / 100.0 AS lat,
       floor(c.lon * 100.0 + 0.5) / 100.0 AS lon,
       b.s_suppkey,
       floor(b.d2 * 1000000000.0 + 0.5) / 1000000000.0 AS dist2
FROM cust c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (c_custkey)
"""


def _register() -> None:
    registry.register(
        "spatial_nearest_grid", spatial_nearest_grid, SPATIAL_ORACLE
    )
