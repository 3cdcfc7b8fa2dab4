"""Grid-binned nearest join: exactness vs brute force, boundary and
tie semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.spatial import (
    RADIUS2,
    _synth_points,
    grid_nearest_join,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_grid_equals_brute_force(spark, sf_dir):
    cust = _synth_points(load_table(spark, sf_dir, "customer"), "c_custkey")
    supp = _synth_points(load_table(spark, sf_dir, "supplier"), "s_suppkey")
    got = {
        r["c_custkey"]: (r["s_suppkey"], r["d2"])
        for r in grid_nearest_join(
            cust, supp, "c_custkey", "s_suppkey"
        ).collect()
    }
    # brute force: full cross join, same tie rule
    c = cust.select("c_custkey", "lat", "lon")
    s = supp.select(
        "s_suppkey", F.col("lat").alias("pl"), F.col("lon").alias("pn")
    )
    d2 = (F.col("lat") - F.col("pl")) * (F.col("lat") - F.col("pl")) + (
        F.col("lon") - F.col("pn")
    ) * (F.col("lon") - F.col("pn"))
    bf = (
        c.crossJoin(s)
        .withColumn("d2", d2)
        .filter(F.col("d2") <= RADIUS2)
        .groupBy("c_custkey")
        .agg(
            F.min(F.struct("d2", "s_suppkey")).alias("m"),
        )
        .select("c_custkey", F.col("m.s_suppkey").alias("sk"), F.col("m.d2"))
    )
    want = {r["c_custkey"]: (r["sk"], r["d2"]) for r in bf.collect()}
    for k, v in got.items():
        if v[0] is None:
            assert k not in want, k
        else:
            assert want[k] == v, (k, v, want.get(k))
    assert set(want) == {k for k, v in got.items() if v[0] is not None}


def test_grid_boundary_and_ties(spark):
    # probe at origin; points at d2 exactly RADIUS2 (included), just
    # outside (excluded), and two equidistant points (lower key wins)
    probes = spark.createDataFrame([(1, 0.0, 0.0)], "pk long, lat double, lon double")
    pts = spark.createDataFrame(
        [
            (10, 1.0, 0.0),    # d2 = 1.0 == RADIUS2 -> eligible
            (11, 0.0, -1.0),   # d2 = 1.0, tie with 10 -> 10 wins (key)
            (12, 1.0, 0.01),   # d2 just over 1.0 -> excluded
        ],
        "sk long, lat double, lon double",
    )
    out = grid_nearest_join(probes, pts, "pk", "sk").collect()
    assert len(out) == 1
    assert out[0]["sk"] == 10
    assert out[0]["d2"] == 1.0


def test_grid_no_candidate_is_null(spark):
    probes = spark.createDataFrame([(1, 0.0, 0.0)], "pk long, lat double, lon double")
    pts = spark.createDataFrame(
        [(10, 50.0, 50.0)], "sk long, lat double, lon double"
    )
    out = grid_nearest_join(probes, pts, "pk", "sk").collect()
    assert out[0]["sk"] is None and out[0]["d2"] is None


def test_point_in_polygon_python_replay(spark, sf_dir):
    """Independent pure-Python PNPOLY replay over the same lattice
    points, plus a hand-built certainty check on the concave
    pentagon (a point in its notch must be OUTSIDE)."""
    from bigdata_pipelines_aws_glue_spark.operators.spatial import (
        _POLYGONS,
        spatial_point_in_polygon,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    def pnpoly(verts, py, px):
        inside = False
        n = len(verts)
        for i in range(n):
            y1, x1 = verts[i]
            y2, x2 = verts[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < x1 + (py - y1) * (x2 - x1) / (
                y2 - y1
            ):
                inside = not inside
        return inside

    keys = [
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    ]
    expect = {pid: 0 for pid in _POLYGONS}
    for k in keys:
        lat = ((k * 37) % 17000) / 100.0 - 85.0
        lon = ((k * 73) % 36000) / 100.0 - 180.0
        for pid, verts in _POLYGONS.items():
            if pnpoly(verts, lat, lon):
                expect[pid] += 1

    got = {
        r["polygon_id"]: r["n_inside"]
        for r in spatial_point_in_polygon(spark, sf_dir).collect()
    }
    assert got == {p: n for p, n in expect.items() if n > 0}

    # concavity sanity: the pentagon's notch point is outside, its
    # lobe points are inside
    pent = _POLYGONS[3]
    assert not pnpoly(pent, -40.0, -120.0)  # inside the notch
    assert pnpoly(pent, -60.0, -150.0)  # left lobe
    assert pnpoly(pent, -60.0, -90.0)  # right lobe
