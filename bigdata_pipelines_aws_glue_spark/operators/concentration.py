"""Concentration / inequality analytics: Gini and ABC (Pareto).

The revenue-concentration views every commercial analytics stack
ships — "how unequal is customer value" (Gini over the Lorenz curve)
and "which 20% of parts carry 80% of revenue" (ABC classification).
Both need a GLOBAL VALUE-ORDERED CUMULATIVE, which is exactly the
thing a naive implementation does with a SinglePartition sort; here
both reuse the repo's two-level blocked prefix-sum pattern
(`stattests._blocked_cums` lineage) with the sums carried in
decimal(38,0), because revenue-weighted cumulatives pass int64 at
the 100 TB part/customer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    sql_round,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: coarse block width over the cents value domain (same level as
#: stattests._KS_BLOCK): block count is VALUE-DOMAIN bounded.
_BLOCK = 100_000


def _dec(c):
    return c.cast("decimal(38,0)")


def _blocked_cums_dec(pc: DataFrame, cols: list[str]) -> DataFrame:
    """Decimal-carried variant of ``stattests._blocked_cums``:
    INCLUSIVE running sums of decimal columns over ``v`` ascending —
    block offsets from a broadcast inequality join on the bounded
    block spine, then a window PARTITIONED BY block. Needed where the
    cumulated quantity is revenue-weighted (passes int64 at scale),
    not a row count."""
    pc = pc.withColumn(
        "blk", F.floor(F.col("v") / F.lit(_BLOCK)).cast("long")
    )
    bt = pc.groupBy("blk").agg(
        *[F.sum(c).alias(f"b_{c}") for c in cols]
    )
    ba, bb = bt.alias("ba"), F.broadcast(bt.alias("bb"))
    off = ba.join(bb, F.col("bb.blk") < F.col("ba.blk"), "left").groupBy(
        "ba.blk"
    ).agg(
        *[
            F.coalesce(F.sum(f"bb.b_{c}"), F.lit(0))
            .cast("decimal(38,0)")
            .alias(f"off_{c}")
            for c in cols
        ]
    )
    wb = Window.partitionBy("blk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return pc.join(off, "blk").select(
        "v",
        *[F.col(c) for c in cols],
        *[
            (F.col(f"off_{c}") + F.sum(c).over(wb))
            .cast("decimal(38,0)")
            .alias(f"cum_{c}")
            for c in cols
        ],
    )


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue — the standard
    inequality measure over the Lorenz curve, with the midpoint tie
    convention: G = (2·Σᵢ i·x₍ᵢ₎)/(n·Σx) − (n+1)/n, where the
    rank-weighted sum over a tie block of c equal values x after
    cum_before smaller ones contributes x·c·(2·cum_before + c + 1)/2
    — so 2·Σ i·x₍ᵢ₎ is an EXACT integer.

    Distribution: one custkey shuffle to lifetime cents, one shuffle
    onto the distinct-value spine (value-domain bounded), the blocked
    decimal prefix sum for cum_before, and a 1-row reduce. The
    rank-weighted products reach ~n²·x ≈ 1e33 at the 100 TB customer
    count — decimal(38,0)/HUGEINT, never long."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("x")
    )
    pc = per_cust.groupBy(F.col("x").alias("v")).agg(
        _dec(F.count(F.lit(1))).alias("c")
    )
    cum = _blocked_cums_dec(pc, ["c"])
    cb = F.col("cum_c") - F.col("c")
    two_r = F.sum(
        _dec(F.col("v")) * F.col("c") * (F.lit(2) * cb + F.col("c") + F.lit(1))
    )
    stats = cum.agg(
        two_r.alias("two_r"),
        F.sum(_dec(F.col("v")) * F.col("c")).alias("sx"),
        F.sum("c").alias("n"),
    )
    nd = F.col("n").cast("double")
    g = F.col("two_r").cast("double") / (
        nd * F.col("sx").cast("double")
    ) - (nd + F.lit(1.0)) / nd
    return stats.select(
        F.col("n").cast("long").alias("n_customers"),
        stable_round(F.col("sx").cast("double") / 100, 2).alias(
            "total_dollars"
        ),
        stable_round(g, 9).alias("gini"),
    )


GINI_ORACLE = f"""
WITH per_cust AS (
    SELECT o_custkey,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS x
    FROM orders GROUP BY 1
),
pc AS (
    SELECT CAST(x AS BIGINT) AS v, CAST(count(*) AS HUGEINT) AS c
    FROM per_cust GROUP BY 1
),
cum AS (
    SELECT v, c,
           sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
    FROM pc
),
stats AS (
    SELECT sum(CAST(v AS HUGEINT) * c * (2 * (cum_c - c) + c + 1)) AS two_r,
           sum(CAST(v AS HUGEINT) * c) AS sx,
           sum(c) AS n
    FROM cum
)
SELECT CAST(n AS BIGINT) AS n_customers,
       {sql_round('CAST(sx AS DOUBLE) / 100', 2)} AS total_dollars,
       {sql_round(
           'CAST(two_r AS DOUBLE)'
           ' / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))'
           ' - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)', 9)} AS gini
FROM stats
"""

#: ABC thresholds on the EXCLUSIVE higher-revenue cumulative share.
_ABC_A = 0.80
_ABC_B = 0.95


def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by discounted revenue:
    class A = parts whose exclusive higher-revenue cumulative share
    is < 80%, B < 95%, C the tail — the standard inventory-priority
    split ("which 20% of parts carry 80% of revenue").

    Sort-free: a part's exclusive-descending cumulative is
    ``total − inclusive-ascending cumulative at its value``, and the
    ascending cumulative is the blocked decimal prefix sum over the
    distinct revenue-cents spine — revenue-weighted, so the sums are
    decimal(38,0)/HUGEINT (total revenue ~2e19 cents at 100 TB, past
    int64). Tie blocks share one class (deterministic both engines).
    Output is the 3-row class summary."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev).alias("x")
    )
    pc = per_part.groupBy(F.col("x").alias("v")).agg(
        _dec(F.count(F.lit(1))).alias("c"),
        F.sum(_dec(F.col("x"))).alias("w"),
    )
    cum = _blocked_cums_dec(pc, ["c", "w"])
    tot = F.broadcast(
        pc.agg(
            F.sum("w").alias("tw"),
            F.sum("c").alias("tc"),
        )
    )
    share_excl = (
        (F.col("tw") - F.col("cum_w")).cast("double")
        / F.col("tw").cast("double")
    )
    classed = cum.crossJoin(tot).select(
        F.when(share_excl < _ABC_A, F.lit("A"))
        .when(share_excl < _ABC_B, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        F.col("c"),
        F.col("w"),
        F.col("tw"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.sum("c").cast("long").alias("n_parts"),
            stable_round(
                F.sum("w").cast("double") / 100, 2
            ).alias("revenue_dollars"),
            stable_round(
                F.sum("w").cast("double") / F.max("tw").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


ABC_ORACLE = f"""
WITH per_part AS (
    SELECT l_partkey,
           sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
               AS BIGINT)) AS x
    FROM lineitem GROUP BY 1
),
pc AS (
    SELECT CAST(x AS BIGINT) AS v,
           CAST(count(*) AS HUGEINT) AS c,
           sum(CAST(x AS HUGEINT)) AS w
    FROM per_part GROUP BY 1
),
cum AS (
    SELECT v, c, w,
           sum(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
    FROM pc
),
tot AS (SELECT sum(w) AS tw FROM pc),
classed AS (
    SELECT CASE
             WHEN CAST(tw - cum_w AS DOUBLE) / CAST(tw AS DOUBLE)
                  < {_ABC_A} THEN 'A'
             WHEN CAST(tw - cum_w AS DOUBLE) / CAST(tw AS DOUBLE)
                  < {_ABC_B} THEN 'B'
             ELSE 'C'
           END AS abc_class,
           c, w, tw
    FROM cum CROSS JOIN tot
)
SELECT abc_class,
       CAST(sum(c) AS BIGINT) AS n_parts,
       {sql_round('CAST(sum(w) AS DOUBLE) / 100', 2)} AS revenue_dollars,
       {sql_round(
           'CAST(sum(w) AS DOUBLE) / CAST(max(tw) AS DOUBLE)', 6)}
           AS revenue_share
FROM classed
GROUP BY 1
"""


#: Syntetos-Boylan demand-pattern cutoffs (Syntetos & Boylan 2005;
#: Boylan et al. 2008): ADI 1.32 inter-demand-interval cutoff,
#: cv^2 0.49 size-variability cutoff — the four-quadrant
#: smooth / erratic / intermittent / lumpy classification that
#: decides which forecaster (SES vs Croston-family) a part gets.
_SB_ADI = 1.32
_SB_CV2 = 0.49
#: weekly demand buckets anchored at the TPC-H epoch — pure integer
#: day arithmetic so both engines bucket identically with no
#: week-of-year/timezone surface.
_WEEK_EPOCH = "1992-01-01"


def demand_pattern_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part demand-pattern classification on the Syntetos-Boylan
    (ADI, cv^2) plane — ``abc_classification_parts``'s forecasting
    partner (ABC says how much a part matters; this says WHICH
    forecaster its demand admits, the router in front of
    ``croston_demand_forecast``). Per part over weekly shipped
    quantities: ADI = mean inter-demand interval
    ``(last_week − first_week) / (n_demand_weeks − 1)``, cv^2 =
    variance/mean^2 of the NONZERO weekly sizes (the S-B
    definition), quadrant = smooth (ADI<1.32, cv^2<0.49) / erratic
    (ADI<1.32) / intermittent (cv^2<0.49) / lumpy; a part with a
    single demand week gets class ``single`` with NULL ADI (no
    interval exists — identical on both engines).

    The attested surface is the per-part CONTINUOUS values (rounded
    to 6 decimals), not just the labels: at this fixture's part
    grain every multi-week part has ADI >= 1.32 (TPC-H part demand
    is intermittent by construction), so only the intermittent and
    lumpy quadrants are populated — pytest pins that both bite at
    the test SF AND that smooth/erratic are empty exactly because
    measured ADI stays above the cutoff (the branch logic itself is
    replayed on synthetic dense series).

    Numerics: weeks and quantities are exact integers; ADI and cv^2
    are single double expressions over integer sums (engine-exact);
    the quadrant compare uses the same doubles both sides. Scale
    shape: two keyed aggregations, zero joins, dense-grid-free."""
    li = load_table(spark, sf_dir, "lineitem")
    week = F.expr(
        f"datediff(l_shipdate, date'{_WEEK_EPOCH}') DIV 7"
    ).cast("long")
    q = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    pw = li.groupBy(
        F.col("l_partkey"), week.alias("wk")
    ).agg(F.sum(q).alias("wq"))
    return demand_pattern_from_weekly(pw)


def demand_pattern_from_weekly(pw: DataFrame) -> DataFrame:
    """The classification kernel over an arbitrary
    (l_partkey, wk, wq) nonzero-weekly-demand frame — factored (the
    ``capped_waterfill`` discipline) so pytest can drive the smooth/
    erratic/single branches with synthetic dense series the corpus
    fixture never produces."""
    st = pw.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("wq").cast("long").alias("s"),
        F.sum(F.col("wq") * F.col("wq")).cast("long").alias("s2"),
        F.max("wk").alias("mx"),
        F.min("wk").alias("mn"),
    )
    adi = F.when(
        F.col("n_weeks") > 1,
        (F.col("mx") - F.col("mn")).cast("double")
        / (F.col("n_weeks") - 1).cast("double"),
    )
    mean = F.col("s").cast("double") / F.col("n_weeks").cast("double")
    cv2 = (
        F.greatest(
            F.col("s2").cast("double") / F.col("n_weeks").cast("double")
            - mean * mean,
            F.lit(0.0),
        )
        / (mean * mean)
    )
    pattern = (
        F.when(F.col("n_weeks") == 1, F.lit("single"))
        .when((adi < _SB_ADI) & (cv2 < _SB_CV2), F.lit("smooth"))
        .when(adi < _SB_ADI, F.lit("erratic"))
        .when(cv2 < _SB_CV2, F.lit("intermittent"))
        .otherwise(F.lit("lumpy"))
    )
    return st.select(
        "l_partkey",
        F.col("n_weeks").alias("n_demand_weeks"),
        F.col("s").alias("total_qty"),
        stable_round(adi, 6).alias("adi"),
        stable_round(cv2, 6).alias("cv2_sizes"),
        pattern.alias("pattern"),
    )


_SB_ADI_SQL = (
    "CASE WHEN n_weeks > 1 THEN CAST(mx - mn AS DOUBLE)"
    " / CAST(n_weeks - 1 AS DOUBLE) END"
)
_SB_MEAN_SQL = "(CAST(s AS DOUBLE) / CAST(n_weeks AS DOUBLE))"
_SB_CV2_SQL = (
    f"(greatest(CAST(s2 AS DOUBLE) / CAST(n_weeks AS DOUBLE)"
    f" - {_SB_MEAN_SQL} * {_SB_MEAN_SQL}, 0.0)"
    f" / ({_SB_MEAN_SQL} * {_SB_MEAN_SQL}))"
)

DEMAND_PATTERN_ORACLE = f"""
WITH pw AS MATERIALIZED (
    SELECT l_partkey,
           date_diff('day', TIMESTAMP '{_WEEK_EPOCH}', l_shipdate) // 7
               AS wk,
           sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS wq
    FROM lineitem GROUP BY 1, 2
),
st AS MATERIALIZED (
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_weeks,
           CAST(sum(wq) AS BIGINT) AS s,
           CAST(sum(wq * wq) AS BIGINT) AS s2,
           max(wk) AS mx, min(wk) AS mn
    FROM pw GROUP BY 1
)
SELECT l_partkey,
       n_weeks AS n_demand_weeks,
       s AS total_qty,
       {sql_round(_SB_ADI_SQL, 6)} AS adi,
       {sql_round(_SB_CV2_SQL, 6)} AS cv2_sizes,
       CASE WHEN n_weeks = 1 THEN 'single'
            WHEN {_SB_ADI_SQL} < {_SB_ADI}
                 AND {_SB_CV2_SQL} < {_SB_CV2} THEN 'smooth'
            WHEN {_SB_ADI_SQL} < {_SB_ADI} THEN 'erratic'
            WHEN {_SB_CV2_SQL} < {_SB_CV2} THEN 'intermittent'
            ELSE 'lumpy'
       END AS pattern
FROM st
"""


def _register() -> None:
    registry.register(
        "gini_customer_revenue", gini_customer_revenue, GINI_ORACLE
    )
    registry.register(
        "demand_pattern_parts", demand_pattern_parts, DEMAND_PATTERN_ORACLE
    )
    registry.register(
        "abc_classification_parts", abc_classification_parts, ABC_ORACLE
    )
