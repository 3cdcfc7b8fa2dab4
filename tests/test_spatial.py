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
