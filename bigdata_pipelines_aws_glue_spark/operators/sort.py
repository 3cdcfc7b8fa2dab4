"""Sort / limit / top-k operators (SURVEY.md §2.6 O1-O3).

The reference's only sort is ``orderBy(rate_date.desc()).first()``
(``glue_job.py:60``) — a top-1. Distributed form: ``orderBy + limit``
compiles to ``TakeOrderedAndProject`` — each partition keeps its local
top-k and only k rows per partition reach the driver; no global sort,
no full shuffle. That is the 100 TB-safe shape of top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Generic distributed top-k (O1+O2)."""
    return df.orderBy(*order_cols).limit(k)


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by total price, deterministic tiebreak on key."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def global_sorted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ORDER BY (range-partitioned sort at scale) with a bounded
    fetch — the reference's ``show(5)`` pattern (O3) as a query."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(5)
    )


SAMPLE_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5
"""


def _register() -> None:
    registry.register("topk_orders", topk_orders, TOPK_ORACLE)
    registry.register("global_sorted_sample", global_sorted_sample, SAMPLE_ORACLE)
