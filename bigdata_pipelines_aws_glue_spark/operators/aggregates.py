"""Aggregation operators (SURVEY.md §2.4 A1-A3 + adjacency).

The reference materializes only grouping keys (year/month/week/day,
``glue_job.py:130-134``) and delegates the actual GROUP BY trend
queries to Athena/Redshift (``README.md:7,13,21``;
``redshift_setup.py:209-243``). Per SURVEY §2.4 A3 those queries are
first-class here.

Scale notes: every aggregate below is partial-aggregatable — Catalyst
emits a map-side HashAggregate before the exchange, so the shuffle
carries one row per (partition, group), not per input row. Sums are
rounded at the *output* edge only (oracle-hash stability), never
before aggregation. ``rollup``/``cube`` expand grouping sets in a
single pass (one shuffle), not one job per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    dec_qsum,
    quantized_avg,
    quantized_sum,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast
from bigdata_pipelines_aws_glue_spark.plans.flagship import flagship_query
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (A3): the
    archetypal wide-scan + low-cardinality groupBy. At 100 TB this is
    a pure map-side-combine plan — the exchange moves ~8 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(quantized_sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(quantized_sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(quantized_sum(disc_price), 2).alias("sum_disc_price"),
            stable_round(quantized_sum(charge), 2).alias("sum_charge"),
            stable_round(quantized_avg("l_quantity"), 6).alias("avg_qty"),
            stable_round(quantized_avg("l_extendedprice"), 6).alias("avg_price"),
            stable_round(quantized_avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    floor(((sum(floor((l_quantity) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS sum_qty,
    floor(((sum(floor((l_extendedprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
    floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
    floor(((sum(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS sum_charge,
    floor((((sum(floor((l_quantity) * 10000.0 + 0.5)) / 10000.0) / count(*))) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
    floor((((sum(floor((l_extendedprice) * 10000.0 + 0.5)) / 10000.0) / count(*))) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
    floor((((sum(floor((l_discount) * 10000.0 + 0.5)) / 10000.0) / count(*))) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
    count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def sales_trends_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's stated purpose — "identify sales trends"
    (README.md:7) — over the flagship pipeline's own output: monthly
    USD revenue per category."""
    out = flagship_query(spark, sf_dir)
    return out.groupBy("transaction_year", "transaction_month", "category").agg(
        stable_round(quantized_sum("amount_usd"), 2).alias("total_usd"),
        F.count(F.lit(1)).alias("n_transactions"),
        stable_round(quantized_avg("amount_usd"), 4).alias("avg_usd"),
    )


SALES_TRENDS_ORACLE = """
WITH flagship AS ({flagship})
SELECT
    transaction_year,
    transaction_month,
    category,
    floor(((sum(floor((amount_usd) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_usd,
    count(*) AS n_transactions,
    floor((((sum(floor((amount_usd) * 10000.0 + 0.5)) / 10000.0) / count(*))) * 10000.0 + 0.5) / 10000.0 AS avg_usd
FROM flagship
GROUP BY transaction_year, transaction_month, category
"""


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (SURVEY §2.4 adjacency). Catalyst
    plans this as expand + two-phase aggregate — no driver-side
    distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct (100 TB posture: constant memory per
    group where exact distinct would shuffle every key). Sketch
    values differ across engines, so the *sketch estimate* stays out
    of the hashed output; instead each engine emits the exact count
    plus a boolean asserting its own HLL estimate lands within the
    configured 5% relative-error band — a cross-engine-checkable
    bound assertion (both sides must say ``true``), so this query is
    oracle-verified rather than rows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("n_parts_exact")) / F.col(
        "n_parts_exact"
    ).cast("double")
    return agg.select(
        "l_returnflag",
        "n_parts_exact",
        "n_rows",
        (rel_err < F.lit(0.05)).alias("approx_within_5pct"),
    )


APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts_exact,
       count(*) AS n_rows,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
           / CAST(count(DISTINCT l_partkey) AS DOUBLE) < 0.05
           AS approx_within_5pct
FROM lineitem GROUP BY l_returnflag
"""


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (year, month): per-month, per-year, and grand
    totals in one shuffle (SURVEY §2.4 adjacency)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .rollup("order_year", "order_month")
        .agg(
            stable_round(quantized_sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ROLLUP_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       floor(((sum(floor((o_totalprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (order_year, order_month)
"""


def cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets, one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        stable_round(quantized_sum("o_totalprice"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       floor(((sum(floor((o_totalprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + agg + deterministic top-10
    (revenue rounded before ranking so the cross-engine sort order is
    stable). Plan shape at scale: customer filter pushed to scan,
    customer⨝orders broadcast-able at low SF / shuffle-hash at scale,
    lineitem join AQE-skew-safe; top-k via TakeOrderedAndProject (no
    global sort)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    revenue = stable_round(
        quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-way star join, revenue by nation. The dims
    (region/nation/supplier) are broadcast; only orders⨝lineitem is a
    wide exchange."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def percentile_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (SURVEY §2.4 adjacency). Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition — verified bit-exact. At 100 TB prefer
    ``approx_percentile`` (t-digest, constant memory); the exact form
    is the oracle-checkable baseline."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
"""


PIVOT_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order count per (year, market segment) — segments become
    columns. Values list is declared up front, so Spark needs no extra
    distinct-scan job and the plan is a single aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("c_mktsegment", list(PIVOT_SEGMENTS))
        .count()
    )


PIVOT_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       {cols}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""".format(
    cols=",\n       ".join(
        f"CAST(sum(CASE WHEN c_mktsegment = '{seg}' THEN 1 END) AS BIGINT)"
        f" AS \"{seg}\""
        for seg in PIVOT_SEGMENTS
    )
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure filter + global sum — the pushdown
    showcase (all three predicates reach the parquet scan; the
    aggregate is a two-row exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT floor(((sum(floor((l_extendedprice * l_discount) * 10000.0 + 0.5))
               / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05
  AND l_quantity < 24
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: HAVING over an aggregated subquery feeding a
    semi join — big-spender orders with their customers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(quantized_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            stable_round(F.col("total_qty"), 2).alias("total_qty"),
        )
    )


Q18_ORACLE = """
WITH big AS (
    SELECT l_orderkey,
           (sum(floor((l_quantity) * 10000.0 + 0.5)) / 10000.0) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING (sum(floor((l_quantity) * 10000.0 + 0.5)) / 10000.0) > 150.0
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       floor((total_qty) * 100.0 + 0.5) / 100.0 AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returns per customer, top 20.
    Join order matters at scale: filter lineitem on returnflag FIRST
    (pushed to the scan), then join up the star."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5))
               / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated subquery: the supplier whose account
    balance equals its nation's maximum — decorrelated Spark-first as
    a window max (one shuffle on nation) instead of a per-row
    subquery."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    w = Window.partitionBy("s_nationkey")
    best = (
        supp.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .drop("max_bal")
    )
    return best.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name", "s_suppkey", "s_name", "s_acctbal")


Q2_ORACLE = """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM supplier s
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
"""


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per part attribute —
    distinct-count over a join, grouped by dimension columns."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS supplier_cnt,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
"""


def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (bucket width 25k): the
    binning primitive behind distribution dashboards and data-quality
    profiling. Binning is a pure projection (floor division), so the
    whole histogram is ONE partial-aggregatable groupBy — at 100 TB
    the shuffle carries |buckets| rows per map partition, nothing
    more. Bucket bounds are integer-exact in both engines (no float
    boundary ambiguity: floor(x/25000) on doubles that are exact to
    0.01 never sits on a representability edge).
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = (F.floor(F.col("o_totalprice") / F.lit(25000.0))).cast("long")
    return (
        orders.groupBy((bucket * 25000).alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(quantized_sum("o_totalprice"), 2).alias("bucket_total"),
        )
    )


HISTOGRAM_ORACLE = """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000 AS bucket_lo,
       count(*) AS n_orders,
       floor(((sum(floor((o_totalprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS bucket_total
FROM orders
GROUP BY floor(o_totalprice / 25000.0)
"""


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distribution moments (mean, population variance,
    stddev) per return flag, computed from quantized integer-domain
    power sums so Spark and DuckDB agree bit-for-bit despite different
    summation orders (`functions/rounding.py` rationale). Squares are
    quantized at q=2 (|x²| ≤ 2.5e9 for extendedprice ≤ 5e4) and the
    power sums are carried in decimal(38,0) / HUGEINT, so the integer
    domain never wraps — exact at any corpus size; only the final
    double conversion rounds (correctly, identically in both
    engines). One partial-aggregatable groupBy — no extra pass for
    the mean.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sx = dec_qsum(x, 10000.0)  # q=4
    sxx = dec_qsum(x * x, 100.0)  # q=2
    mean = sx.cast("double") / 10000.0 / n
    var = sxx.cast("double") / 100.0 / n - mean * mean
    return li.groupBy("l_returnflag").agg(
        n.alias("n_items"),
        stable_round(mean, 2).alias("mean_price"),
        stable_round(var, 2).alias("var_price"),
        stable_round(F.sqrt(var), 4).alias("stddev_price"),
    )


MOMENTS_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       floor(((sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0) / count(*)) * 100.0 + 0.5) / 100.0 AS mean_price,
       floor(((sum(CAST(floor(l_extendedprice * l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0) / count(*)
              - ((sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0) / count(*))
                * ((sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0) / count(*))) * 100.0 + 0.5) / 100.0 AS var_price,
       floor(sqrt((sum(CAST(floor(l_extendedprice * l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0) / count(*)
              - ((sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0) / count(*))
                * ((sum(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) / 10000.0) / count(*))) * 10000.0 + 0.5) / 10000.0 AS stddev_price
FROM lineitem
GROUP BY l_returnflag
"""


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the four lineitem measures become (measure,
    value) rows, then aggregate per (returnflag, measure) — the
    inverse of ``pivot_revenue`` and the standard reshape for feeding
    generic per-metric dashboards. Spark's ``unpivot`` is a zero-copy
    projection (an Expand node: no shuffle, no UDF); the only shuffle
    is the final partial-aggregatable groupBy.
    """
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n_values"),
        stable_round(quantized_sum("val"), 2).alias("total"),
    )


_UNPIVOT_ARM = (
    "SELECT l_returnflag, '{m}' AS measure, {m} AS val FROM lineitem"
)
UNPIVOT_ORACLE = (
    "WITH melted AS ("
    + " UNION ALL ".join(
        _UNPIVOT_ARM.format(m=m)
        for m in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    + """)
SELECT l_returnflag, measure, count(*) AS n_values,
       floor(((sum(floor((val) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total
FROM melted GROUP BY l_returnflag, measure
"""
)


def monthly_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: monthly order revenue per nation over a
    generated date spine, so months with no orders appear as explicit
    zero rows (the completeness contract charting/forecasting layers
    need). The spine is nations × sequence(min_month, max_month) — a
    broadcast of one global min/max row plus a per-nation explode, no
    data-dependent scan. The actuals aggregate shuffles once on
    (nation, month) and collapses to |nations|x|months| rows, so it is
    the broadcast side of the gap-fill left join (a left join cannot
    broadcast its preserved spine side).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    month = F.trunc(F.col("o_orderdate").cast("date"), "month")
    actual = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", month.alias("month"))
        .agg(
            stable_round(quantized_sum("o_totalprice"), 2).alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    bounds = orders.agg(
        F.trunc(F.min("o_orderdate").cast("date"), "month").alias("lo"),
        F.trunc(F.max("o_orderdate").cast("date"), "month").alias("hi"),
    )
    spine = (
        nation.crossJoin(F.broadcast(bounds))
        .select(
            "n_name",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 month"))
            ).alias("month"),
        )
    )
    return (
        spine
        .join(F.broadcast(actual), ["n_name", "month"], "left")
        .select(
            "n_name",
            "month",
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


GAPFILL_ORACLE = """
WITH actual AS (
  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         floor(((sum(floor((o_totalprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS rev,
         count(*) AS cnt
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
  FROM orders
),
spine AS (
  SELECT n_name, CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
  FROM nation, bounds
)
SELECT s.n_name, s.month,
       coalesce(a.rev, 0.0) AS revenue,
       CAST(coalesce(a.cnt, 0) AS BIGINT) AS n_orders
FROM spine s LEFT JOIN actual a ON s.n_name = a.n_name AND s.month = a.month
"""


#: GK-sketch accuracy parameter for ``approx_quantiles_accuracy``:
#: rank error is guaranteed ≤ n / PCT_ACCURACY.
PCT_ACCURACY = 1000
PCT_QUANTILES = (0.25, 0.5, 0.75)


def approx_quantiles_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attests Spark's ``percentile_approx`` (Greenwald–Khanna sketch
    — the constant-memory quantile path ``percentile_by_status``'s
    docstring points to for 100 TB) against its published rank-error
    guarantee, on the ``approx_distinct``/``hll_vocab_rollup``
    contract: sketch VALUES are engine-specific and stay out of the
    hashed output; each group/quantile row emits the exact row count
    plus a boolean asserting the returned element's rank interval
    ``[count(<v)+1, count(<=v)]`` intersects ``q·n ± n/accuracy``.
    The DuckDB twin asserts TRUE, so a hash match proves the sketch
    held its bound on this corpus. Two passes over the fact: the
    grouped sketch, then a count of elements ≤/< each returned value
    (3 rows per group broadcast back) — the standard audit shape; at
    100 TB you'd sample the audit, never skip the sketch."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qs = list(PCT_QUANTILES)
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", qs, PCT_ACCURACY
        ).alias("approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    probes = agg.select(
        "l_returnflag",
        "n_rows",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("approx").alias("v"),
            )
        ).alias("z"),
    ).select(
        "l_returnflag",
        "n_rows",
        F.col("z.q").alias("q"),
        F.col("z.v").alias("v"),
    )
    ranks = (
        li.join(F.broadcast(probes), "l_returnflag")
        .groupBy("l_returnflag", "q", "n_rows")
        .agg(
            F.count(F.when(F.col("l_extendedprice") < F.col("v"), 1)).alias(
                "n_lt"
            ),
            F.count(F.when(F.col("l_extendedprice") <= F.col("v"), 1)).alias(
                "n_le"
            ),
        )
    )
    target = F.col("q") * F.col("n_rows")
    # +1 rank of slop on top of the ε·n guarantee: the target rank for
    # quantile q is convention-dependent (floor(q·n) vs q·(n-1)+1 …),
    # and the measured GK error sits exactly at the ε·n edge (e.g.
    # rank error 2 vs ε·n = 1.962 at n = 1962) — the discretization,
    # not a sketch violation.
    slack = (
        F.col("n_rows").cast("double") / F.lit(float(PCT_ACCURACY))
        + F.lit(1.0)
    )
    in_bound = (F.col("n_lt") + 1 <= target + slack) & (
        F.col("n_le") >= target - slack
    )
    return ranks.select(
        "l_returnflag",
        "q",
        "n_rows",
        in_bound.alias("rank_within_bound"),
    )


APPROX_QUANTILES_ORACLE = f"""
SELECT l_returnflag, q, n_rows, TRUE AS rank_within_bound
FROM (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_returnflag)
CROSS JOIN (SELECT CAST(unnest([{", ".join(str(q) for q in PCT_QUANTILES)}])
                   AS DOUBLE) AS q)
"""


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals — the companion to
    ``histogram_order_totals``' equi-width binning and the actual
    shape optimizers keep in column stats (DuckDB/Spark both store
    equi-height histograms): 10 buckets bounded by the exact deciles,
    so each holds ~n/10 rows with deviations only where tied values
    straddle a boundary. Thresholds come from one exact-percentile
    aggregate (the percentile<->quantile_cont pairing); bucket
    assignment is then a pure projection against the broadcast 1-row
    threshold vector — no sort, no second shuffle of the data.

    Bucket rule: bucket b holds rows with t_{b-1} < x <= t_b (t_0 =
    -inf), matching NTILE-free deterministic semantics: ties at a
    threshold all land in the lower bucket, which is why counts can
    deviate from n/10 — the deviation IS the tie diagnostic."""
    orders = load_table(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    th = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"t{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    j = orders.select("o_totalprice").crossJoin(th)
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (F.col("o_totalprice") > F.col(f"t{i}")).cast("int")
    return (
        j.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            stable_round(F.min("o_totalprice"), 2).alias("lo"),
            stable_round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


EQUIDEPTH_ORACLE = """
WITH th AS (
    SELECT quantile_cont(o_totalprice, 0.1) AS t1,
           quantile_cont(o_totalprice, 0.2) AS t2,
           quantile_cont(o_totalprice, 0.3) AS t3,
           quantile_cont(o_totalprice, 0.4) AS t4,
           quantile_cont(o_totalprice, 0.5) AS t5,
           quantile_cont(o_totalprice, 0.6) AS t6,
           quantile_cont(o_totalprice, 0.7) AS t7,
           quantile_cont(o_totalprice, 0.8) AS t8,
           quantile_cont(o_totalprice, 0.9) AS t9
    FROM orders
)
SELECT bucket,
       count(*) AS n_rows,
       floor(min(o_totalprice) * 100.0 + 0.5) / 100.0 AS lo,
       floor(max(o_totalprice) * 100.0 + 0.5) / 100.0 AS hi
FROM (
    SELECT o_totalprice,
           1 + CAST(o_totalprice > t1 AS INTEGER)
             + CAST(o_totalprice > t2 AS INTEGER)
             + CAST(o_totalprice > t3 AS INTEGER)
             + CAST(o_totalprice > t4 AS INTEGER)
             + CAST(o_totalprice > t5 AS INTEGER)
             + CAST(o_totalprice > t6 AS INTEGER)
             + CAST(o_totalprice > t7 AS INTEGER)
             + CAST(o_totalprice > t8 AS INTEGER)
             + CAST(o_totalprice > t9 AS INTEGER) AS bucket
    FROM orders CROSS JOIN th
)
GROUP BY bucket
ORDER BY bucket
"""


def make_trimmed_mean_cents():
    """GROUPED_AGG pandas UDF (Arrow-batched UDAF surface): 10%
    two-sided trimmed mean over exact integer cents. Deterministic
    cross-engine: int64 sort + int64 sum (exact), trim count is pure
    integer arithmetic (``n // 10``), final mean is one correctly-
    rounded double division — no float accumulation order anywhere."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def trimmed_mean_cents(cents):
        import numpy as np

        a = np.sort(cents.to_numpy(np.int64))
        k = len(a) // 10
        kept = a[k : len(a) - k] if k else a
        return float(kept.sum()) / len(kept)

    # pandas_udf infers GROUPED_AGG from (Series -> float) hints, but
    # this module's ``from __future__ import annotations`` stringifies
    # inline hints into names unresolvable from the UDF's globals —
    # attach real objects instead (SPARK-28264 hint inference).
    trimmed_mean_cents.__annotations__ = {"cents": pd.Series, "return": float}
    return pandas_udf(trimmed_mean_cents, "double")


def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location estimate per return flag via the GROUPED_AGG
    pandas UDF surface — the one UDF family the registry didn't yet
    exercise (SCALAR: flagship history; GROUPED_MAP: stateful twins;
    UDTF: chunking; mapInArrow: arrow_doc_stats).

    Honest scale note: GROUPED_AGG materializes each group's column
    in one Arrow batch, so it is the right tool for bounded groups
    (per-key sketches, per-entity series), NOT for a 7e10-row 100 TB
    group — there the rank-window formulation (percentile trim via
    ``row_number``/``count`` windows, exactly this query's DuckDB
    twin) is the scalable path. Both formulations are asserted equal
    in tests/test_grouped_agg.py; at bench scale the groups are
    ~2e5 rows and one batch per group is the cheapest plan.
    Determinism: see :func:`make_trimmed_mean_cents`."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    tm = make_trimmed_mean_cents()
    # Spark rejects mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is its own 3-group aggregate joined back (broadcast).
    # No broadcast hint despite the tiny sides: both join inputs are
    # aggregates of unbounded lineage (the plan-audit class the r5
    # streaming finding banned) — AQE sees the ~3-row post-agg sizes
    # at runtime and picks the broadcast itself.
    means = li.groupBy("l_returnflag").agg(tm(F.col("cents")).alias("mean_cents"))
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return means.join(counts, "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        (F.col("mean_cents") / F.lit(100.0)).alias("trimmed_mean_price"),
    )


TRIMMED_MEAN_ORACLE = """
WITH v AS (
    SELECT l_returnflag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
    FROM lineitem
),
r AS (
    SELECT l_returnflag, c,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
           count(*) OVER (PARTITION BY l_returnflag) AS n
    FROM v
)
SELECT l_returnflag,
       CAST(max(n) AS BIGINT) AS n_rows,
       (CAST(sum(c) AS DOUBLE) / count(*)) / 100.0 AS trimmed_mean_price
FROM r
WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY l_returnflag
"""


def _register() -> None:
    from bigdata_pipelines_aws_glue_spark.plans.flagship import FLAGSHIP_ORACLE_SQL

    registry.register("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE)
    registry.register(
        "sales_trends_monthly",
        sales_trends_monthly,
        SALES_TRENDS_ORACLE.format(flagship=FLAGSHIP_ORACLE_SQL),
    )
    registry.register("distinct_agg", distinct_agg, DISTINCT_ORACLE)
    registry.register("approx_distinct", approx_distinct, APPROX_DISTINCT_ORACLE)
    registry.register(
        "approx_quantiles_accuracy",
        approx_quantiles_accuracy,
        APPROX_QUANTILES_ORACLE,
    )
    registry.register("rollup_sales", rollup_sales, ROLLUP_ORACLE)
    registry.register("cube_status", cube_status, CUBE_ORACLE)
    registry.register("q3_top_unshipped", q3_top_unshipped, Q3_ORACLE)
    registry.register("q5_local_revenue", q5_local_revenue, Q5_ORACLE)
    registry.register("percentile_by_status", percentile_by_status, PERCENTILE_ORACLE)
    registry.register("pivot_revenue", pivot_revenue, PIVOT_ORACLE)
    registry.register("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE)
    registry.register("q18_large_orders", q18_large_orders, Q18_ORACLE)
    registry.register("q10_returned_items", q10_returned_items, Q10_ORACLE)
    registry.register("q2_top_supplier_per_nation", q2_top_supplier_per_nation, Q2_ORACLE)
    registry.register("q16_supplier_diversity", q16_supplier_diversity, Q16_ORACLE)
    registry.register(
        "histogram_order_totals", histogram_order_totals, HISTOGRAM_ORACLE
    )
    registry.register("stats_moments", stats_moments, MOMENTS_ORACLE)
    registry.register("unpivot_measures", unpivot_measures, UNPIVOT_ORACLE)
    registry.register(
        "monthly_revenue_gapfill", monthly_revenue_gapfill, GAPFILL_ORACLE
    )
    registry.register("trimmed_mean_price", trimmed_mean_price, TRIMMED_MEAN_ORACLE)
    registry.register("equidepth_histogram", equidepth_histogram, EQUIDEPTH_ORACLE)
