"""Subquery-shape tests: physical plans use semi/anti joins and
broadcast scalar aggregates, and Catalyst decorrelates the SQL-frontend
correlated query (no per-row subplan at execution time)."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.subqueries import (
    q4_late_shipment_priority,
    q15_top_supplier,
    q22_idle_customers,
    sql_correlated_delta,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_semi_join(spark, sf_dir):
    plan = _physical_plan(q4_late_shipment_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    df = q22_idle_customers(spark, sf_dir)
    plan = _physical_plan(df)
    assert "LeftAnti" in plan
    # the scalar-average subquery must be a broadcast, not a re-scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    rows = df.collect()
    assert len(rows) > 0 and all(r["numcust"] > 0 for r in rows)


def test_correlated_sql_decorrelates(spark, sf_dir):
    df = sql_correlated_delta(spark, sf_dir)
    plan = _physical_plan(df)
    # Catalyst rewrites the correlated scalar subquery into an
    # aggregate + equi-join; a surviving per-row subplan would show up
    # as ScalarSubquery in the executed plan.
    assert "ScalarSubquery" not in plan
    assert plan.count("Scan parquet") == 2  # orders + the aggregated twin


def test_q15_ties_all_returned(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # every returned supplier sits at the max
