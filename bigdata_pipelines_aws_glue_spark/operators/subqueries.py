"""Subquery / decorrelation query shapes (SURVEY.md §2.3-§2.4 adjacency).

The reference delegates all analytical SQL to Athena/Redshift
(``README.md:13,21``; ``redshift_setup.py:209-243``); these are the
classic warehouse shapes a user of that stack runs — EXISTS / NOT
EXISTS, correlated scalar subqueries, argmax-over-aggregate — each
re-expressed Spark-first. The DataFrame forms are hand-decorrelated
(semi/anti joins, broadcast scalar aggregates) so the physical plan is
explicit; ``sql_correlated_delta`` instead routes a *correlated* query
string through ``spark.sql`` to exercise Catalyst's own decorrelation.

Scale posture: every scalar subquery becomes a 1-row broadcast (never a
per-row re-scan); EXISTS/NOT EXISTS become semi/anti hash joins that
shuffle only the keys; per-group thresholds (Q17) are a partial-agg +
broadcast join, not a correlated re-aggregation per probe row.

Cross-engine determinism: averages/thresholds that feed comparisons
are computed with the quantized integer-domain formula from
``functions/rounding.py`` on BOTH sides, so boundary rows cannot flip
between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    quantized_avg,
    quantized_sum,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
from bigdata_pipelines_aws_glue_spark.sql import register_corpus_views


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: count orders per priority that have at
    least one lineitem shipped >60 days after the order date. The
    EXISTS collapses to a left-semi join (probe side never duplicated,
    shuffle carries keys + join columns only). Corpus has no
    l_commitdate/l_receiptdate, so lateness is shipdate vs orderdate.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o.o_orderkey
      AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average positive balance
    and no RECENT orders (none since 2000), per market segment. Scalar
    subquery -> 1-row broadcast cross join; NOT EXISTS -> left-anti
    join whose build side is pre-filtered on the date predicate (the
    filter pushes to the orders scan, shrinking the anti-join input).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(quantized_avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_round(quantized_sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust,
       floor(((sum(floor((c_acctbal) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT (sum(floor((c_acctbal) * 10000.0 + 0.5)) / 10000.0) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated threshold: revenue from lineitems of
    Brand#1 parts whose quantity is below half that part's average
    quantity. Decorrelated: per-part avg is ONE partial-aggregatable
    groupBy over lineitem, joined back (broadcast at this SF; at
    100 TB both sides hash-partition on partkey — no per-row
    re-aggregation, which is what a naive correlated plan would do).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * quantized_avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(maybe_broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part.withColumnRenamed("l_partkey", "ap_partkey"),
              F.col("p_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            stable_round(quantized_sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_ORACLE = """
SELECT floor(((sum(floor((l_extendedprice) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_items
FROM lineitem l
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.5 * ((sum(floor((l2.l_quantity) * 10000.0 + 0.5)) / 10000.0) / count(*))
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped conditional aggregation: share of revenue from
    PROMO parts per ship-month of 1997. One scan, two conditional
    sums — no self-join. The part join broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            stable_round(
                F.lit(100.0) * quantized_sum(promo) / quantized_sum(disc), 4
            ).alias("promo_pct"),
            stable_round(quantized_sum(disc), 2).alias("total_revenue"),
        )
    )


Q14_ORACLE = """
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
       floor((100.0 * (sum(floor((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 10000.0 + 0.5)) / 10000.0)
              / (sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 10000.0 + 0.5) / 10000.0 AS promo_pct,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY month(l_shipdate)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate: OR of brand/size/qty
    conjunctions. Catalyst extracts the common join key so this stays
    ONE broadcast join with the residual OR as a post-join filter, and
    pushes the size/brand disjunction down to the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 30))
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity") >= 10)
    )
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_ORACLE = """
SELECT floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped argmax-over-aggregate: supplier(s) with maximum
    revenue in 1997H1. The revenue view aggregates once; the max is a
    1-row broadcast (not a window over a single partition, which would
    serialize all suppliers through one task)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_ORACLE = """
WITH rev AS (
    SELECT l_suppkey,
           floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped nation-pair trade flow: revenue between two
    nations (either direction) per ship-year. Two aliases of the
    broadcast nation dim; the only wide exchange is orders⨝lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            stable_round(
                quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit per supplier-nation per
    year. No partsupp table in the corpus, so cost is proxied as
    10% of retail price x quantity. p_name LIKE filter prunes parts
    before the broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.lit(0.1) * F.col("p_retailprice")
    ) * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(stable_round(quantized_sum(amount), 2).alias("sum_profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       floor(((sum(floor((l_extendedprice * (1 - l_discount) - (0.1 * p_retailprice) * l_quantity) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# The same quantized-avg formula on both sides, so the correlated
# threshold is bit-identical across engines. Literals use exponent
# form (1e4, not 10000.0): Spark parses decimal-point literals as
# DECIMAL (breaking double parity with DuckDB), exponent form as
# DOUBLE in both engines.
_CORRELATED_DELTA_SQL = """
SELECT o_orderkey, o_custkey,
       floor((o_totalprice
              - (SELECT (sum(floor(o2.o_totalprice * 1e4 + 0.5e0)) / 1e4) / count(*)
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey)) * 1e2 + 0.5e0) / 1e2
           AS delta_from_avg
FROM orders o
"""


def sql_correlated_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery routed through the Spark SQL
    frontend: each order's price delta vs its customer's average.
    Catalyst decorrelates this into one aggregate + an equi-join —
    verify with .explain(): no per-row subplan survives."""
    register_corpus_views(spark, sf_dir)
    return spark.sql(_CORRELATED_DELTA_SQL)


def _register() -> None:
    registry.register(
        "q4_late_shipment_priority", q4_late_shipment_priority, Q4_ORACLE
    )
    registry.register("q22_idle_customers", q22_idle_customers, Q22_ORACLE)
    registry.register(
        "q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE
    )
    registry.register("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE)
    registry.register(
        "q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_ORACLE
    )
    registry.register("q15_top_supplier", q15_top_supplier, Q15_ORACLE)
    registry.register("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE)
    registry.register("q9_product_profit", q9_product_profit, Q9_ORACLE)
    registry.register(
        "sql_correlated_delta", sql_correlated_delta, _CORRELATED_DELTA_SQL
    )
