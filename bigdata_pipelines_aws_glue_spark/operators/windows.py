"""Window-function operators (SURVEY.md §2.5).

The reference's only windowed semantics is the implicit
top-1-per-currency of the rate lookup (``glue_job.py:60``), which
``plans.flagship`` re-expresses as ``max_by``. Here is the general
window surface: ranking, running aggregates, lead/lag — all ordered by
deterministic keys so the DuckDB oracle sorts identically.

Scale note: a window over ``partitionBy(k)`` shuffles once on ``k``
and sorts within partitions. Skewed partition keys are the hazard;
for running totals over huge single-key partitions, prefer bounded
frames or pre-aggregated cumulative tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer by order value."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend in order-date order (frame: unbounded
    preceding → current row; deterministic via orderkey tiebreak)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        stable_round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       floor((sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0
       AS running_spend
FROM orders
"""


def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since a customer's previous order (lag) and value delta to
    the next order (lead)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    next_price = F.lead("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date")).alias(
            "days_since_prev"
        ),
        stable_round(next_price - F.col("o_totalprice"), 2).alias("next_price_delta"),
    )


LEAD_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
       floor((lead(o_totalprice) OVER w - o_totalprice) * 100.0 + 0.5) / 100.0 AS next_price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def _register() -> None:
    registry.register("window_rank_orders", window_rank_orders, RANK_ORACLE)
    registry.register("window_running_total", window_running_total, RUNNING_ORACLE)
    registry.register("window_lead_lag", window_lead_lag, LEAD_LAG_ORACLE)
