"""Remaining classic warehouse query shapes (TPC-H Q8/Q11/Q12/Q13/Q20/Q21
analogues, adapted to the corpus star schema).

The reference delegates analytical SQL to Athena/Redshift
(``README.md:13,21``; ``redshift_setup.py:209-243``); together with
``subqueries.py`` / ``aggregates.py`` this completes the canonical
decision-support shapes a user of that stack runs. The corpus schema
is a reduced TPC-H (no partsupp, no l_commitdate/l_receiptdate/
l_shipmode — see TESTDATA.md), so each query keeps the *operator
pattern* of its TPC-H namesake with predicates re-based on existing
columns; the docstrings note each substitution.

Scale posture (100 TB):
- Q8: the two fact-side joins (orders, supplier) hash-partition on
  their keys; every dimension (customer→nation→region chain collapsed
  pre-join, part, supplier-nation) broadcasts. One shuffle per fact
  join + one for the final year groupBy — no cartesian anywhere.
- Q11: single partial-aggregatable groupBy over lineitem; the global
  total is a 1-row broadcast, never a per-group re-scan.
- Q12: large-large join lineitem⋈orders on orderkey; the year filter
  pushes to the lineitem scan before the shuffle.
- Q13: orders pre-aggregated to (custkey, count) BEFORE the outer
  join, so the join carries one row per customer instead of one per
  order — at 100 TB this cuts the shuffled bytes by the order fanout.
- Q20: the selective part filter broadcasts into the lineitem scan;
  per-(supp,part) partial agg before any wide join.
- Q21: the correlated EXISTS/NOT-EXISTS pair is decorrelated into ONE
  per-order aggregate (distinct suppliers, distinct late suppliers,
  late-line count) — a single shuffle on orderkey replaces two
  correlated self-joins of lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    quantized_sum,
    sql_quantized_sum,
    sql_round,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_1's share of PROMO-part
    revenue sold to ASIA customers, per order year. Substitutions:
    p_type='PROMO' for the original part-type predicate; supplier
    nation from s_nationkey (no partsupp).

    The customer→nation→region chain is collapsed to an ASIA-customer
    key set and broadcast; part and supplier-nation broadcast too, so
    only lineitem⋈orders shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    asia_cust = (
        cust.join(
            nation, cust.c_nationkey == nation.n_nationkey
        )
        .join(region.filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = supp.join(
        nation, supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0))
    return (
        li.join(maybe_broadcast(part.filter(F.col("p_type") == "PROMO")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            stable_round(
                quantized_sum(target) / quantized_sum(rev), 4
            ).alias("mkt_share"),
            stable_round(quantized_sum(rev), 2).alias("total_revenue"),
        )
    )


_Q8_TARGET = sql_quantized_sum(
    "CASE WHEN sn.n_name = 'NATION_1' THEN " + _REV + " ELSE 0.0 END"
)
_Q8_SHARE = sql_round(_Q8_TARGET + " / " + sql_quantized_sum(_REV), 4)

Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {_Q8_SHARE} AS mkt_share,
       {sql_round(sql_quantized_sum(_REV), 2)} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY year(o_orderdate)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose revenue exceeds a fixed fraction
    of GLOBAL revenue (substitutes lineitem revenue for the original
    partsupp stock value). HAVING-against-global-scalar pattern: the
    global total is the same partial agg re-aggregated to one row and
    broadcast — the per-part groupBy is computed once, reused for both
    sides via a cached logical subtree (Catalyst reuses the exchange).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        quantized_sum(rev).alias("part_value")
    )
    total = per_part.agg(
        F.sum("part_value").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.0005) * F.col("total_value"))
        .select(
            "l_partkey",
            stable_round(F.col("part_value"), 2).alias("part_value"),
        )
    )


Q11_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey, {sql_quantized_sum(_REV)} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, {sql_round("part_value", 2)} AS part_value
FROM per_part
WHERE part_value > 0.0005 * (SELECT sum(part_value) FROM per_part)
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped two-channel conditional count: per line status
    (substituting for l_shipmode, which the corpus lacks), how many
    1997-shipped lines belong to critical- vs normal-priority orders.
    The shipdate filter pushes to the parquet scan before the
    orderkey shuffle; counts are exact integers (no float risk).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of customers by order count,
    INCLUDING zero-order customers (the left-outer-join-then-count
    pattern). Orders are pre-aggregated to (custkey, count) before the
    outer join — the join then carries one row per customer, not one
    per order (at 100 TB this is the difference between shuffling the
    orders fact and shuffling a key-count sketch of it). The '5-LOW'
    exclusion mirrors Q13's NOT LIKE predicate living in the JOIN
    condition, not the WHERE (which would drop zero-order customers).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested-IN chain: suppliers who shipped more
    than 50 units of any 's'-prefixed part during 1997 (substitutes
    shipped quantity for partsupp availability). The part filter is a
    broadcast semi-join into lineitem; quantities partial-aggregate on
    (suppkey, partkey) before the distinct-supplier projection; the
    final supplier join broadcasts the surviving key set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qualifying = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(maybe_broadcast(part.filter(F.col("p_name").startswith("s"))),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(quantized_sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(maybe_broadcast(qualifying),
                  F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


Q20_ORACLE = f"""
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 's%')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {sql_quantized_sum("l_quantity")} > 50.0
)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: for multi-supplier orders where EXACTLY ONE
    supplier shipped late (>60 days after order date — substituting
    for the receipt-vs-commit lateness the corpus lacks), count that
    supplier's late lines. The EXISTS (another supplier in the order)
    / NOT EXISTS (another LATE supplier) pair is decorrelated into a
    single per-order aggregate: distinct suppliers, distinct late
    suppliers, the late supplier's key, and its late-line count — one
    orderkey shuffle instead of two correlated lineitem self-joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    flagged = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", late.alias("is_late"))
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.count(F.when(F.col("is_late"), 1)).alias("late_lines"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("late_lines").alias("numwait"))
        .join(maybe_broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )


Q21_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


def _register() -> None:
    registry.register("q8_market_share", q8_market_share, Q8_ORACLE)
    registry.register("q11_important_parts", q11_important_parts, Q11_ORACLE)
    registry.register("q12_priority_shipping", q12_priority_shipping, Q12_ORACLE)
    registry.register(
        "q13_customer_distribution", q13_customer_distribution, Q13_ORACLE
    )
    registry.register("q20_bulk_suppliers", q20_bulk_suppliers, Q20_ORACLE)
    registry.register("q21_waiting_suppliers", q21_waiting_suppliers, Q21_ORACLE)
