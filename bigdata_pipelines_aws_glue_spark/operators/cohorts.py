"""Customer-lifecycle analytics: cohort retention and RFM segments.

The two classic lifecycle views every analytics engine ships and the
registry did not yet cover as a class:

- :func:`cohort_retention` — the acquisition-cohort retention
  triangle (cohort month x months-since-acquisition), the standard
  lifecycle health report.
- :func:`rfm_segments` — Recency/Frequency/Monetary quintile
  segmentation (Hughes 1994), the standard customer-value grid.

Both reduce the corpus to CUSTOMER-cardinality in one shuffle and do
all remaining work on calendar- or literal-bounded tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    sql_round,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort retention triangle: for every cohort month
    (month of a customer's FIRST order) and months-since-acquisition
    offset, the count and share of the cohort active in that month.

    Distribution shape: one shuffle keyed on custkey produces the
    cohort assignment; the distinct (custkey, activity month) set
    reuses the same key, so the cohort join co-partitions; the final
    aggregate lands on the (cohort, offset) grid — CALENDAR²-bounded
    (~84 x 84 rows at ANY corpus size), with cohort sizes a
    broadcast vocab-sized join. Month offsets are exact integer
    arithmetic on month-truncated dates (no float months_between
    fractions)."""
    orders = load_table(spark, sf_dir, "orders")
    acts = orders.select(
        "o_custkey", F.trunc(F.to_date("o_orderdate"), "month").alias("m")
    ).distinct()
    cohort = acts.groupBy("o_custkey").agg(F.min("m").alias("c0"))
    sizes = cohort.groupBy("c0").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    joined = acts.join(cohort, "o_custkey").select(
        "c0",
        (
            (F.year("m") - F.year("c0")) * 12
            + (F.month("m") - F.month("c0"))
        ).cast("int").alias("months_since"),
    )
    tri = joined.groupBy("c0", "months_since").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    return (
        tri.join(F.broadcast(sizes), "c0")
        .select(
            F.date_format("c0", "yyyy-MM").alias("cohort_month"),
            "months_since",
            "n_active",
            "cohort_size",
            stable_round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


COHORT_ORACLE = f"""
WITH acts AS (
    SELECT DISTINCT o_custkey,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS m
    FROM orders
),
cohort AS (SELECT o_custkey, min(m) AS c0 FROM acts GROUP BY 1),
sizes AS (
    SELECT c0, CAST(count(*) AS BIGINT) AS cohort_size
    FROM cohort GROUP BY 1
),
tri AS (
    SELECT c.c0,
           CAST((year(a.m) - year(c.c0)) * 12
                + (month(a.m) - month(c.c0)) AS INTEGER) AS months_since,
           CAST(count(*) AS BIGINT) AS n_active
    FROM acts a JOIN cohort c USING (o_custkey)
    GROUP BY 1, 2
)
SELECT strftime(t.c0, '%Y-%m') AS cohort_month,
       t.months_since, t.n_active, s.cohort_size,
       {sql_round(
           'CAST(t.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)', 6)}
           AS retention_rate
FROM tri t JOIN sizes s USING (c0)
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation (Hughes, "Strategic Database
    Marketing", 1994): per customer, Recency (days since last order,
    relative to the corpus horizon), Frequency (order count) and
    Monetary (exact lifetime cents); each scored 1-5 by its exact
    quintile thresholds; output is the segment grid with counts and
    average lifetime value.

    Distribution shape: ONE shuffle keyed on custkey reduces the
    corpus to customer cardinality; the quintile thresholds are one
    exact-percentile aggregate over that table (the
    ``equidepth_histogram`` percentile<->quantile_cont pairing);
    scoring is a pure projection against the broadcast 1-row
    threshold vector (no NTILE — which would be a SinglePartition
    window) and the output grid is LITERAL-bounded (<= 125 rows).
    Ties at a threshold land in the lower score in both engines
    (strict > comparisons on exact integers/identical doubles).
    Recency scores are REVERSED (recent = 5), the standard RFM
    orientation."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(cents).alias("monetary"),
    )
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("mx"))
    cust = per_cust.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("mx"), F.col("last_d")).cast("long").alias("rec"),
        "freq",
        "monetary",
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    th = cust.agg(
        *[
            F.expr(f"percentile({m}, {q})").alias(f"{m}_t{i}")
            for m in ("rec", "freq", "monetary")
            for i, q in enumerate(qs, start=1)
        ]
    )

    def score(metric: str) -> F.Column:
        s = F.lit(1)
        for i in range(1, 5):
            s = s + (F.col(metric) > F.col(f"{metric}_t{i}")).cast("int")
        return s

    scored = cust.crossJoin(F.broadcast(th)).select(
        (F.lit(6) - score("rec")).alias("r_score"),  # recent = high
        score("freq").alias("f_score"),
        score("monetary").alias("m_score"),
        "monetary",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        stable_round(
            F.sum(F.col("monetary").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100,
            4,
        ).alias("avg_lifetime_dollars"),
    )


def _rfm_oracle() -> str:
    qs = [0.2, 0.4, 0.6, 0.8]
    th_sql = ",\n           ".join(
        f"quantile_cont({m}, {q}) AS {m}_t{i}"
        for m in ("rec", "freq", "monetary")
        for i, q in enumerate(qs, start=1)
    )

    def score(metric: str) -> str:
        terms = " + ".join(
            f"CASE WHEN {metric} > {metric}_t{i} THEN 1 ELSE 0 END"
            for i in range(1, 5)
        )
        return f"(1 + {terms})"

    return f"""
WITH per_cust AS (
    SELECT o_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_d,
           CAST(count(*) AS BIGINT) AS freq,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary
    FROM orders GROUP BY 1
),
horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
cust AS (
    SELECT CAST(date_diff('day', last_d, mx) AS BIGINT) AS rec,
           freq, CAST(monetary AS BIGINT) AS monetary
    FROM per_cust CROSS JOIN horizon
),
th AS (
    SELECT {th_sql}
    FROM cust
),
scored AS (
    SELECT (6 - {score('rec')}) AS r_score,
           {score('freq')} AS f_score,
           {score('monetary')} AS m_score,
           monetary
    FROM cust CROSS JOIN th
)
SELECT CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       {sql_round(
           'CAST(sum(CAST(monetary AS HUGEINT)) AS DOUBLE)'
           ' / CAST(count(*) AS DOUBLE) / 100', 4)}
           AS avg_lifetime_dollars
FROM scored
GROUP BY 1, 2, 3
"""


def _register() -> None:
    registry.register("cohort_retention", cohort_retention, COHORT_ORACLE)
    registry.register("rfm_segments", rfm_segments, _rfm_oracle())
