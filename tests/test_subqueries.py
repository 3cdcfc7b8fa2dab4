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


def test_q13_includes_zero_order_customers(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.tpch_extra import (
        q13_customer_distribution,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    rows = {r["c_count"]: r["custdist"] for r in
            q13_customer_distribution(spark, sf_dir).collect()}
    n_cust = load_table(spark, sf_dir, "customer").count()
    # the distribution must account for EVERY customer (zero-order
    # customers included — the point of the outer join)
    assert sum(rows.values()) == n_cust


def test_q21_exactly_one_late_supplier(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.operators.tpch_extra import (
        q21_waiting_suppliers,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    df = q21_waiting_suppliers(spark, sf_dir)
    rows = df.collect()
    assert all(r["numwait"] >= 1 for r in rows)
    # cross-check one supplier's count against a direct recomputation
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    flagged = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
         ).alias("late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nl"),
    )
    expected = (
        flagged.filter(F.col("late"))
        .join(per_order.filter((F.col("ns") > 1) & (F.col("nl") == 1)),
              "l_orderkey", "left_semi")
        .count()
    )
    assert sum(r["numwait"] for r in rows) == expected
