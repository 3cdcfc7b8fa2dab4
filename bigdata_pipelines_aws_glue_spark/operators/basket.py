"""Market-basket co-occurrence: frequent item pairs + lift.

The Apriori front line (Agrawal & Srikant 1994), Spark-first: which
part pairs ship together in the same order more often than chance?

1. **Distinct baskets.** ``(orderkey, partkey)`` distinct — one keyed
   dedup; repeat lineitems of the same part don't inflate support.
2. **Support-prune items first** (the Apriori monotonicity step): a
   pair can only be frequent if both items are, so items below
   ``MIN_ITEM_SUPPORT`` orders drop before any pair is formed. At
   100 TB this is the difference between a bounded pair space and a
   vocab² blow-up.
3. **Pair generation is a self-equi-join on the basket key** with
   ``p1 < p2`` — co-partitioned on orderkey, output bounded by
   Σ basket_size² (TPC-H baskets are ≤7 lineitems, so linear in the
   fact table).
4. **Score.** Pair support count plus **lift** =
   P(both)/(P(a)·P(b)) — the association-rule strength, computed
   from exact integer counts with one double division at the end.
   Top-``TOPK`` by (support desc, p1, p2) via TakeOrderedAndProject.

Exact integers until the final lift division; the DuckDB twin
hash-checks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

MIN_ITEM_SUPPORT = 5
TOPK = 20


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    item_sup = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("sup")
    )
    frequent = item_sup.filter(F.col("sup") >= MIN_ITEM_SUPPORT)
    fb = baskets.join(frequent, "l_partkey").select(
        "l_orderkey", "l_partkey", "sup"
    )
    a = fb.select(
        "l_orderkey",
        F.col("l_partkey").alias("p1"),
        F.col("sup").alias("sup1"),
    )
    b = fb.select(
        "l_orderkey",
        F.col("l_partkey").alias("p2"),
        F.col("sup").alias("sup2"),
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(
            F.count(F.lit(1)).alias("n_orders_both"),
            F.max("sup1").alias("sup1"),
            F.max("sup2").alias("sup2"),
        )
    )
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    lift = (
        F.col("n_orders_both").cast("double")
        * F.col("n_orders").cast("double")
        / (F.col("sup1").cast("double") * F.col("sup2").cast("double"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_orders_both",
            stable_round(lift, 6).alias("lift"),
        )
        .orderBy(F.col("n_orders_both").desc(), "p1", "p2")
        .limit(TOPK)
    )


MARKET_BASKET_ORACLE = f"""WITH baskets AS MATERIALIZED (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_sup AS MATERIALIZED (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS sup
    FROM baskets GROUP BY l_partkey
    HAVING count(*) >= {MIN_ITEM_SUPPORT}
),
fb AS MATERIALIZED (
    SELECT b.l_orderkey, b.l_partkey, s.sup
    FROM baskets b JOIN item_sup s USING (l_partkey)
),
no AS MATERIALIZED (
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM baskets
),
pairs AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           CAST(count(*) AS BIGINT) AS n_orders_both,
           max(a.sup) AS sup1, max(b.sup) AS sup2
    FROM fb a JOIN fb b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT p1, p2, n_orders_both,
       floor(CAST(n_orders_both AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(sup1 AS DOUBLE) * CAST(sup2 AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS lift
FROM pairs CROSS JOIN no
ORDER BY n_orders_both DESC, p1, p2
LIMIT {TOPK}
"""


def _register() -> None:
    registry.register(
        "market_basket_pairs", market_basket_pairs, MARKET_BASKET_ORACLE
    )
