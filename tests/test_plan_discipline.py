"""Physical-plan discipline (SURVEY.md §4): filters and projections
must reach the parquet scan, and approximate aggregates must track
their exact counterparts. These are the properties that decide whether
a plan survives a 100× scale-up, asserted mechanically."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_shipdate") >= "1995-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    plan = _formatted_plan(q)
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0], (
        "ship-date predicate did not reach the scan:\n" + plan
    )


def test_column_pruning_narrows_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    plan = _formatted_plan(q)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the two referenced columns may be read — a scan that reads
    # all 11 columns for a 2-column aggregate is wrong at any scale
    assert "l_returnflag" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact, approx = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.01, (approx, exact)
