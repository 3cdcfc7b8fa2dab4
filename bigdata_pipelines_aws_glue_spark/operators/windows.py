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


def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window surface: ntile / percent_rank / cume_dist /
    first_value / last_value with an explicit full-partition frame
    (last_value under the default frame is the CURRENT row — the
    classic trap; both engines agree once the frame is explicit)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        stable_round(F.percent_rank().over(w), 8).alias("pct_rank"),
        stable_round(F.cume_dist().over(w), 8).alias("cum_dist"),
        F.first_value(F.col("o_orderkey")).over(wf).alias("cheapest_key"),
        F.last_value(F.col("o_orderkey")).over(wf).alias("priciest_key"),
    )


DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       floor((percent_rank() OVER w) * 100000000.0 + 0.5) / 100000000.0 AS pct_rank,
       floor((cume_dist() OVER w) * 100000000.0 + 0.5) / 100000000.0 AS cum_dist,
       first_value(o_orderkey) OVER wf AS cheapest_key,
       last_value(o_orderkey) OVER wf AS priciest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def scd2_rate_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension construction from a change log:
    each rate version gets [valid_from, valid_to) via lead() over its
    key, open-ended (NULL) for the current version. One shuffle on the
    dimension key; at scale this is how a rates/price dimension history
    is (re)built from CDC events."""
    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        synth_currency_rates,
    )

    rates = synth_currency_rates(spark, sf_dir)
    w = Window.partitionBy("currency").orderBy("rate_date")
    return rates.select(
        "currency",
        "rate_to_usd",
        F.col("rate_date").alias("valid_from"),
        F.lead("rate_date").over(w).alias("valid_to"),
        F.lead("rate_date").over(w).isNull().alias("is_current"),
    )


SCD2_ORACLE = """
WITH currencies(slot, currency) AS (
    VALUES (0,'USD'),(1,'EUR'),(2,'GBP'),(3,'JPY'),(4,'INR')
),
rates AS (
    SELECT c.currency AS currency,
           0.5::DOUBLE + (n_nationkey % 10) * 0.1::DOUBLE AS rate_to_usd,
           TIMESTAMP '2025-01-01' + n_nationkey * INTERVAL 1 DAY AS rate_date
    FROM nation
    JOIN currencies c ON c.slot = n_nationkey % 5
    WHERE n_nationkey < 20 AND n_nationkey % 5 < 4
)
SELECT currency, rate_to_usd,
       rate_date AS valid_from,
       lead(rate_date) OVER w AS valid_to,
       lead(rate_date) OVER w IS NULL AS is_current
FROM rates
WINDOW w AS (PARTITION BY currency ORDER BY rate_date)
"""


def inventory_balance_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running stock balance per part with a FLOOR AT ZERO — the
    classic "you can't ship what you don't have" fold whose recurrence
    ``b_t = max(0, b_{t-1} + x_t)`` looks like it needs per-row
    iteration (a stateful kernel), but reflects into two plain
    windows via the identity

        b_t = cum_t - min(0, min_{s<=t} cum_s)

    (the running minimum absorbs every would-be-negative excursion).
    Staying in JVM window exec instead of a Python fold is the whole
    point: one keyed shuffle on l_partkey, whole-stage codegen, exact
    integer arithmetic end to end. Flows: +quantity on normal lines,
    -quantity on returns (l_returnflag = 'R'), ordered by (shipdate,
    orderkey, linenumber, suppkey) within part — the corpus's one
    fully-duplicated lineitem makes any tiebreak-ambiguous pair
    identical, so the emitted multiset is order-stable anyway."""
    li = load_table(spark, sf_dir, "lineitem")
    flow = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity")
    ).otherwise(F.col("l_quantity")).cast("long")
    base = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        flow.alias("flow"),
    )
    order = [
        F.col("l_shipdate").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_suppkey").asc(),
    ]
    w = (
        Window.partitionBy("l_partkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("flow").over(w)
    stepped = base.withColumn("cum", cum).withColumn(
        "low", F.min(F.least(F.col("cum"), F.lit(0))).over(w)
    )
    out = stepped.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "flow",
        (F.col("cum") - F.col("low")).alias("balance"),
    )
    # per-part summary keeps the output compact while still hashing
    # every balance through the min/max/final aggregates
    return (
        out.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.sum("flow").cast("long").alias("net_flow"),
            F.max("balance").cast("long").alias("peak_balance"),
            F.sum(
                (F.col("balance") == 0).cast("long")
            ).alias("n_stockouts"),
        )
        .orderBy("l_partkey")
    )


INVENTORY_ORACLE = """
WITH base AS (
    SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey, l_shipdate,
           CAST(CASE WHEN l_returnflag = 'R' THEN -l_quantity
                     ELSE l_quantity END AS BIGINT) AS flow
    FROM lineitem
),
cums AS (
    SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey, l_shipdate, flow,
           sum(flow) OVER w AS cum
    FROM base
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stepped AS (
    SELECT l_partkey, flow, cum,
           min(least(cum, 0)) OVER w AS low
    FROM cums
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l_partkey,
       count(*) AS n_moves,
       CAST(sum(flow) AS BIGINT) AS net_flow,
       CAST(max(cum - low) AS BIGINT) AS peak_balance,
       CAST(sum(CASE WHEN cum - low = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stockouts
FROM stepped
GROUP BY l_partkey
ORDER BY l_partkey
"""


def _register() -> None:
    registry.register("window_rank_orders", window_rank_orders, RANK_ORACLE)
    registry.register(
        "inventory_balance_resets", inventory_balance_resets, INVENTORY_ORACLE
    )
    registry.register(
        "window_distribution_ranks", window_distribution_ranks, DISTRIBUTION_ORACLE
    )
    registry.register("scd2_rate_history", scd2_rate_history, SCD2_ORACLE)
    registry.register("window_running_total", window_running_total, RUNNING_ORACLE)
    registry.register("window_lead_lag", window_lead_lag, LEAD_LAG_ORACLE)
