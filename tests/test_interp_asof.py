"""Cogrouped linear-interpolation as-of: point hits, midpoints, empty
curve groups (left-outer NULL), and edge clamping."""

from __future__ import annotations

import datetime as dt

from bigdata_pipelines_aws_glue_spark.operators.joins import interpolated_asof

SCHEMA = "id long, k string, rate_interp double"


def _run(spark, left_rows, curve_rows):
    left = spark.createDataFrame(left_rows, "id long, k string, ts timestamp")
    curve = spark.createDataFrame(curve_rows, "k string, pt timestamp, v double")
    out = interpolated_asof(
        left,
        curve,
        on="k",
        left_time="ts",
        curve_time="pt",
        curve_val="v",
        out_schema=SCHEMA,
        out_cols=["id", "k"],
    )
    return {r["id"]: r["rate_interp"] for r in out.collect()}


def test_interp_points_and_midpoint(spark):
    t = dt.datetime
    curve = [
        ("a", t(2020, 1, 1), 1.0),
        ("a", t(2020, 1, 11), 2.0),
    ]
    left = [
        (1, "a", t(2020, 1, 1)),   # exact first point -> 1.0
        (2, "a", t(2020, 1, 6)),   # halfway (5/10)    -> 1.5
        (3, "a", t(2020, 1, 11)),  # exact last point  -> 2.0 (clamp)
        (4, "a", t(2020, 1, 3)),   # 2/10              -> 1.2
    ]
    got = _run(spark, left, curve)
    assert got[1] == 1.0
    assert got[2] == 1.5
    assert got[3] == 2.0
    assert abs(got[4] - 1.2) < 1e-12


def test_interp_empty_curve_group_is_null(spark):
    t = dt.datetime
    curve = [("a", t(2020, 1, 1), 1.0), ("a", t(2020, 1, 2), 3.0)]
    left = [(1, "a", t(2020, 1, 1)), (2, "zzz", t(2020, 1, 1))]
    got = _run(spark, left, curve)
    assert got[1] == 1.0
    assert got[2] is None  # no curve for key 'zzz' -> cogroup left-outer


def test_interp_clamps_outside_curve(spark):
    t = dt.datetime
    curve = [("a", t(2020, 1, 10), 5.0), ("a", t(2020, 1, 20), 7.0)]
    left = [
        (1, "a", t(2020, 1, 1)),   # before first point -> clamp 5.0
        (2, "a", t(2020, 1, 25)),  # after last point   -> clamp 7.0
    ]
    got = _run(spark, left, curve)
    assert got[1] == 5.0
    assert got[2] == 7.0
