"""Statistical modeling and hypothesis-test operators.

Three operators the reference's analysts would reach for right after
the descriptive suite (`stats_moments`, `correlation_matrix`,
`sales_trend_slope`) and that none of the existing registry rows
cover as a class:

- :func:`ols_revenue_model` — MULTI-feature linear regression by
  closed-form normal equations (the single-feature OLS in
  `sales_trend_slope` can't express "control for a second
  variable"); one scan, all cross-product sums overflow-carried.
- :func:`kaplan_meier_repeat` — right-censored survival analysis
  (Kaplan & Meier 1958) of customer repeat purchase: the one
  estimator class for "time-to-event with incomplete follow-up",
  which no amount of plain aggregation reproduces.
- :func:`ks_test_price` — exact two-sample Kolmogorov-Smirnov
  distance between order-value distributions, computed entirely in
  integer arithmetic via a DISTRIBUTED prefix sum (coarse-block
  offsets + within-block window) — no single-partition global sort.

Scale posture is in each docstring; all float emissions go through
the repo's stable rounding, every count/cross-product sum that can
pass int64 at 100 TB is carried decimal(38,0)/HUGEINT.
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


def _dec(c):
    return c.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# OLS multi-feature regression (normal equations, closed form)
# ---------------------------------------------------------------------------


def ols_revenue_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS with intercept: discounted revenue (exact
    cents) regressed on quantity and discount-cents, solved in
    closed form from the 3x3 normal equations (Cramer's rule).

    Distribution shape: ONE scan of lineitem with a map-side partial
    aggregate producing the nine sufficient statistics (n, Sx1, Sx2,
    Sx1x1, Sx1x2, Sx2x2, Sy, Sx1y, Sx2y); the solve is scalar math
    on a single row. No shuffle beyond the 1-row aggregate — the
    same plan at sf0.001 and at 100 TB.

    Numerics: y = floor(extendedprice*(1-discount)*100 + 0.5) exact
    cents; every sufficient statistic is summed in decimal(38,0)
    (HUGEINT on the oracle side) — Sy² terms reach ~6e25 at the
    100 TB row count, far past int64. The sums convert to double
    once (correctly rounded identically by both engines, the
    `quantized_sum` precedent) and the Cramer determinants are
    written in one fixed operation order on BOTH sides, so the
    emitted coefficients are bit-stable cross-engine before the
    final quantization."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    base = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x1"))).alias("s1"),
        F.sum(_dec(F.col("x2"))).alias("s2"),
        F.sum(_dec(F.col("x1")) * F.col("x1")).alias("s11"),
        F.sum(_dec(F.col("x1")) * F.col("x2")).alias("s12"),
        F.sum(_dec(F.col("x2")) * F.col("x2")).alias("s22"),
        F.sum(_dec(F.col("y"))).alias("sy"),
        F.sum(_dec(F.col("x1")) * F.col("y")).alias("s1y"),
        F.sum(_dec(F.col("x2")) * F.col("y")).alias("s2y"),
        F.sum(_dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    d = {
        k: F.col(k).cast("double")
        for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")
    }
    # det([[a,b,c],[d,e,f],[g,h,i]]) expanded along the first row, in
    # this exact order on both engines.
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    det0 = (
        d["sy"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        + d["s2"] * (d["s1y"] * d["s12"] - d["s11"] * d["s2y"])
    )
    det1 = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
    )
    det2 = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
        + d["sy"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = d["syy"] - b0 * d["sy"] - b1 * d["s1y"] - b2 * d["s2y"]
    sst = d["syy"] - d["sy"] * d["sy"] / d["n"]
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        stable_round(b0, 4).alias("beta0_cents"),
        stable_round(b1, 6).alias("beta1_per_qty"),
        stable_round(b2, 6).alias("beta2_per_disc_cent"),
        stable_round(F.lit(1.0) - sse / sst, 9).alias("r2"),
    )


_OLS_D = {
    k: f"CAST({k} AS DOUBLE)"
    for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")
}
_OLS_DET = (
    "({n} * ({s11} * {s22} - {s12} * {s12}) "
    "- {s1} * ({s1} * {s22} - {s12} * {s2}) "
    "+ {s2} * ({s1} * {s12} - {s11} * {s2}))".format(**_OLS_D)
)
_OLS_DET0 = (
    "({sy} * ({s11} * {s22} - {s12} * {s12}) "
    "- {s1} * ({s1y} * {s22} - {s12} * {s2y}) "
    "+ {s2} * ({s1y} * {s12} - {s11} * {s2y}))".format(**_OLS_D)
)
_OLS_DET1 = (
    "({n} * ({s1y} * {s22} - {s12} * {s2y}) "
    "- {sy} * ({s1} * {s22} - {s12} * {s2}) "
    "+ {s2} * ({s1} * {s2y} - {s1y} * {s2}))".format(**_OLS_D)
)
_OLS_DET2 = (
    "({n} * ({s11} * {s2y} - {s1y} * {s12}) "
    "- {s1} * ({s1} * {s2y} - {s1y} * {s2}) "
    "+ {sy} * ({s1} * {s12} - {s11} * {s2}))".format(**_OLS_D)
)

OLS_ORACLE = f"""
WITH base AS (
    SELECT CAST(l_quantity AS BIGINT) AS x1,
           CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
           CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                AS BIGINT) AS y
    FROM lineitem
),
agg AS (
    SELECT count(*) AS n,
           sum(CAST(x1 AS HUGEINT)) AS s1,
           sum(CAST(x2 AS HUGEINT)) AS s2,
           sum(CAST(x1 AS HUGEINT) * x1) AS s11,
           sum(CAST(x1 AS HUGEINT) * x2) AS s12,
           sum(CAST(x2 AS HUGEINT) * x2) AS s22,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x1 AS HUGEINT) * y) AS s1y,
           sum(CAST(x2 AS HUGEINT) * y) AS s2y,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM base
)
SELECT CAST(n AS BIGINT) AS n_rows,
       {sql_round(f'{_OLS_DET0} / {_OLS_DET}', 4)} AS beta0_cents,
       {sql_round(f'{_OLS_DET1} / {_OLS_DET}', 6)} AS beta1_per_qty,
       {sql_round(f'{_OLS_DET2} / {_OLS_DET}', 6)} AS beta2_per_disc_cent,
       {sql_round(
           '1.0 - ({syy} - ({d0} / {det}) * {sy} - ({d1} / {det}) * {s1y}'
           ' - ({d2} / {det}) * {s2y})'
           ' / ({syy} - {sy} * {sy} / {n})'.format(
               det=_OLS_DET, d0=_OLS_DET0, d1=_OLS_DET1, d2=_OLS_DET2,
               **_OLS_D),
           9,
       )} AS r2
FROM agg
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier right-censored survival (customer repeat purchase)
# ---------------------------------------------------------------------------


def kaplan_meier_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of "time to SECOND order" per customer,
    right-censored at the corpus horizon (Kaplan & Meier, JASA 1958).

    Subject = each customer with >=1 order. Event time t = days from
    the first order to the second (window `row_number` over
    (custkey; orderdate, orderkey) — fully distributed). Customers
    with a single order are CENSORED at `max(o_orderdate) -
    first_order` — the incomplete-follow-up case the estimator
    exists for (a plain average of observed gaps would be biased
    low: the long-gap customers are exactly the ones still open).

    Scale: the per-customer reduction is one shuffle on custkey; the
    life table then lives on the DISTINCT event-time spine, bounded
    by the calendar span (~2 500 rows at ANY corpus size, the
    `theil_sen_trend` bounded class). n-at-risk and the cumulative
    log-survival both come from one inequality self-join on that
    bounded spine (whitelisted BroadcastNestedLoopJoin, never
    row-volume-bounded).

    Numerics: survival S(t) = prod_{u<=t}(1 - d_u/n_u) is computed
    as exp of the SUM of per-factor logs, each log quantized to
    1e-9 BEFORE summing (exact integer sum; the BM25/zipf libm
    discipline), so the product's value hash is stable cross-engine;
    `log_survival_q9` carries the exact quantized sum. If some event
    time exhausts the risk set (d_u = n_u), survival is exactly 0
    from there on and the log is NULL."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("mx"))
    subj = per_cust.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
        )
        .otherwise(F.datediff(F.col("mx"), F.col("d1")))
        .cast("long")
        .alias("t"),
        F.col("d2").isNotNull().cast("int").alias("event"),
    )
    spine = subj.groupBy("t").agg(
        F.sum("event").cast("long").alias("d_t"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("c_t"),
    )
    a, b = spine.alias("a"), F.broadcast(spine.alias("b"))
    # n at risk just before t = all subjects with observed time >= t.
    # The spine is calendar-bounded (~2 500 rows at ANY corpus size),
    # so broadcasting it is the permanent plan, not a size accident.
    risk = a.join(b, F.col("b.t") >= F.col("a.t")).groupBy("a.t").agg(
        F.sum(F.col("b.d_t") + F.col("b.c_t")).cast("long").alias("n_risk")
    )
    ev = spine.filter(F.col("d_t") > 0).join(risk, "t")
    factor = ev.select(
        "t",
        "d_t",
        "c_t",
        "n_risk",
        F.when(F.col("d_t") < F.col("n_risk"),
               F.floor(
                   F.log(
                       F.lit(1.0)
                       - F.col("d_t").cast("double")
                       / F.col("n_risk").cast("double")
                   )
                   * 1e9
                   + F.lit(0.5)
               ).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("lq"),
    )
    fa, fb = factor.alias("fa"), F.broadcast(factor.alias("fb"))
    cum = fa.join(fb, F.col("fb.t") <= F.col("fa.t")).groupBy(
        "fa.t", "fa.d_t", "fa.c_t", "fa.n_risk"
    ).agg(
        F.sum("fb.lq").alias("lsum"),
        F.max((F.col("fb.lq").isNull()).cast("int")).alias("zeroed"),
    )
    return cum.select(
        F.col("t"),
        F.col("n_risk"),
        F.col("d_t").alias("n_events"),
        F.col("c_t").alias("n_censored_at_t"),
        F.when(F.col("zeroed") == 1, F.lit(0.0))
        .otherwise(
            stable_round(F.exp(F.col("lsum").cast("double") / 1e9), 6)
        )
        .alias("survival"),
        F.when(F.col("zeroed") == 1, F.lit(None).cast("double"))
        .otherwise(F.col("lsum").cast("double") / 1e9)
        .alias("log_survival_q9"),
    )


KM_ORACLE = f"""
WITH ranked AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
),
per_cust AS (
    SELECT o_custkey,
           min(CASE WHEN rn = 1 THEN d END) AS d1,
           min(CASE WHEN rn = 2 THEN d END) AS d2
    FROM ranked WHERE rn <= 2 GROUP BY 1
),
horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
subj AS (
    SELECT CASE WHEN d2 IS NOT NULL
                THEN date_diff('day', d1, d2)
                ELSE date_diff('day', d1, mx) END AS t,
           CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
    FROM per_cust CROSS JOIN horizon
),
spine AS (
    SELECT t, CAST(sum(event) AS BIGINT) AS d_t,
           CAST(sum(1 - event) AS BIGINT) AS c_t
    FROM subj GROUP BY 1
),
risk AS (
    SELECT a.t, CAST(sum(b.d_t + b.c_t) AS BIGINT) AS n_risk
    FROM spine a JOIN spine b ON b.t >= a.t GROUP BY 1
),
factor AS (
    SELECT s.t, s.d_t, s.c_t, r.n_risk,
           CASE WHEN s.d_t < r.n_risk THEN
             CAST(floor(ln(1.0 - CAST(s.d_t AS DOUBLE)
                                 / CAST(r.n_risk AS DOUBLE)) * 1e9 + 0.5)
                  AS BIGINT)
           END AS lq
    FROM spine s JOIN risk r USING (t)
    WHERE s.d_t > 0
),
cum AS (
    SELECT fa.t, fa.d_t, fa.c_t, fa.n_risk,
           sum(fb.lq) AS lsum,
           max(CASE WHEN fb.lq IS NULL THEN 1 ELSE 0 END) AS zeroed
    FROM factor fa JOIN factor fb ON fb.t <= fa.t
    GROUP BY 1, 2, 3, 4
)
SELECT t, n_risk, d_t AS n_events, c_t AS n_censored_at_t,
       CASE WHEN zeroed = 1 THEN 0.0
            ELSE {sql_round('exp(CAST(lsum AS DOUBLE) / 1e9)', 6)}
       END AS survival,
       CASE WHEN zeroed = 1 THEN NULL
            ELSE CAST(lsum AS DOUBLE) / 1e9 END AS log_survival_q9
FROM cum
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (exact, integer arithmetic)
# ---------------------------------------------------------------------------

#: $1000 blocks over the order-value domain: the coarse level of the
#: distributed prefix sum. Block count is bounded by the PRICE DOMAIN
#: (~600 blocks for TPC-H-shaped totals), not by row volume.
_KS_BLOCK = 100_000


def _blocked_cums(pc: DataFrame, count_cols: list[str]) -> DataFrame:
    """INCLUSIVE running sums of ``count_cols`` over ``v`` ascending,
    as a distributed two-level prefix sum: coarse $1000-block offsets
    from an inequality self-join on the bounded block spine
    (explicitly broadcast — ~600 rows at any scale), then a window
    PARTITIONED BY block. No SinglePartition sort anywhere; the same
    plan at sf0.001 and at 100 TB."""
    pc = pc.withColumn(
        "blk", F.floor(F.col("v") / F.lit(_KS_BLOCK)).cast("long")
    )
    bt = pc.groupBy("blk").agg(
        *[F.sum(c).alias(f"b_{c}") for c in count_cols]
    )
    ba, bb = bt.alias("ba"), F.broadcast(bt.alias("bb"))
    off = ba.join(bb, F.col("bb.blk") < F.col("ba.blk"), "left").groupBy(
        "ba.blk"
    ).agg(
        *[
            F.coalesce(F.sum(f"bb.b_{c}"), F.lit(0))
            .cast("long")
            .alias(f"off_{c}")
            for c in count_cols
        ]
    )
    wb = Window.partitionBy("blk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return pc.join(off, "blk").select(
        "v",
        *[F.col(c) for c in count_cols],
        *[
            (F.col(f"off_{c}") + F.sum(c).over(wb))
            .cast("long")
            .alias(f"cum_{c}")
            for c in count_cols
        ],
    )

#: c(alpha=0.05) for the two-sample KS rejection threshold
#: c * sqrt((n1+n2)/(n1*n2)) — standard asymptotic constant
#: (Smirnov 1948): sqrt(-ln(alpha/2)/2) ~= 1.3581.
_KS_C05 = 1.3581015157406195


def ks_test_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the
    order-value (exact cents) distributions of '1-URGENT' and
    '5-LOW' orders, with the alpha=0.05 asymptotic decision.

    The KS statistic needs both empirical CDFs at every pooled
    observation — a global cumulative. The naive form is a window
    over a SinglePartition sort (serializes the corpus through one
    task); this operator computes the SAME cumulative as a
    DISTRIBUTED two-level prefix sum instead:

    1. per-cents counts (one shuffle on the value — the domain is
       integer cents, so the spine is VALUE-DOMAIN bounded: ~6e7
       distinct cents max regardless of row count),
    2. coarse $1000-block subtotals (~600 rows at any scale) with
       exclusive block offsets from an inequality self-join on the
       bounded block spine (whitelisted BNLJ),
    3. within-block running sums via a window PARTITIONED BY block —
       every partition bounded by the block width, fully parallel.

    cum_g(v) = block_offset_g + within_block_cum_g. The distance is
    then computed EXACTLY: |F1 - F2| maximized as the integer
    |cum1*n2 - cum2*n1| carried in decimal(38,0)/HUGEINT (the
    cross-products pass int64 at ~sf300), divided by n1*n2 once at
    the end — zero float accumulation anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    g1, g2 = "1-URGENT", "5-LOW"
    both = orders.filter(F.col("o_orderpriority").isin(g1, g2)).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        (F.col("o_orderpriority") == g1).cast("long").alias("is1"),
    )
    pc = both.groupBy("v").agg(
        F.sum("is1").alias("c1"),
        F.sum(F.lit(1) - F.col("is1")).alias("c2"),
    )
    cum = _blocked_cums(pc, ["c1", "c2"]).select(
        "v",
        F.col("cum_c1").alias("cum1"),
        F.col("cum_c2").alias("cum2"),
    )
    totals = both.agg(
        F.sum("is1").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("is1")).cast("long").alias("n2"),
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "n1",
        "n2",
        F.abs(
            _dec(F.col("cum1")) * F.col("n2")
            - _dec(F.col("cum2")) * F.col("n1")
        ).alias("num"),
    )
    top = diff.groupBy("n1", "n2").agg(F.max("num").alias("num_max"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    d_stat = F.col("num_max").cast("double") / (n1d * n2d)
    crit = F.lit(_KS_C05) * F.sqrt((n1d + n2d) / (n1d * n2d))
    return top.select(
        "n1",
        "n2",
        stable_round(d_stat, 9).alias("d_stat"),
        stable_round(crit, 9).alias("crit_05"),
        (stable_round(d_stat, 9) > stable_round(crit, 9)).alias("reject_05"),
    )


KS_ORACLE = f"""
WITH both_g AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is1
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
pc AS (
    SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
           CAST(sum(1 - is1) AS BIGINT) AS c2,
           CAST(floor(v / {_KS_BLOCK}.0) AS BIGINT) AS blk
    FROM both_g GROUP BY 1
),
bt AS (SELECT blk, sum(c1) AS b1, sum(c2) AS b2 FROM pc GROUP BY 1),
off AS (
    SELECT ba.blk,
           CAST(coalesce(sum(bb.b1), 0) AS BIGINT) AS off1,
           CAST(coalesce(sum(bb.b2), 0) AS BIGINT) AS off2
    FROM bt ba LEFT JOIN bt bb ON bb.blk < ba.blk GROUP BY 1
),
cum AS (
    SELECT pc.v,
           off.off1 + sum(pc.c1) OVER (PARTITION BY pc.blk ORDER BY pc.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
           off.off2 + sum(pc.c2) OVER (PARTITION BY pc.blk ORDER BY pc.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
    FROM pc JOIN off USING (blk)
),
totals AS (
    SELECT CAST(sum(is1) AS BIGINT) AS n1,
           CAST(sum(1 - is1) AS BIGINT) AS n2
    FROM both_g
),
top AS (
    SELECT n1, n2,
           max(abs(CAST(cum1 AS HUGEINT) * n2
                   - CAST(cum2 AS HUGEINT) * n1)) AS num_max
    FROM cum CROSS JOIN totals GROUP BY 1, 2
)
SELECT n1, n2,
       {sql_round(
           'CAST(num_max AS DOUBLE)'
           ' / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))', 9)} AS d_stat,
       {sql_round(
           f'{_KS_C05} * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))'
           ' / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))', 9)} AS crit_05,
       {sql_round(
           'CAST(num_max AS DOUBLE)'
           ' / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))', 9)}
         > {sql_round(
           f'{_KS_C05} * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))'
           ' / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))', 9)} AS reject_05
FROM top
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-based two-sample, tie-corrected, exact ranks)
# ---------------------------------------------------------------------------

#: two-sided z critical at alpha=0.05.
_Z_975 = 1.959963984540054


def mann_whitney_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U (Wilcoxon rank-sum) between the
    same two order-value samples as :func:`ks_test_price` — the
    nonparametric location test that complements KS's shape test.

    Ranks over the pooled sample are EXACT and fully distributed: the
    average rank of the tied group at value v is
    ``cum_before(v) + (t_v + 1)/2`` where ``cum_before`` comes from
    the same two-level blocked prefix sum (:func:`_blocked_cums`) —
    value-domain-bounded, no global sort. Everything is carried as
    2x-scaled INTEGERS so tied average ranks (.5) stay exact:
    ``2*R1 = sum_v c1_v * (2*cum_before_v + t_v + 1)`` in
    decimal(38,0)/HUGEINT (rank sums reach ~n² ≈ 1e22 at 100 TB).
    The normal approximation uses the standard tie-corrected variance
    ``Var = n1*n2/12 * ((n+1) - sum(t³-t)/(n(n-1)))`` (Lehmann,
    Nonparametrics 1975), with the tie cubes summed exactly in
    decimal before ONE conversion to double."""
    orders = load_table(spark, sf_dir, "orders")
    g1, g2 = "1-URGENT", "5-LOW"
    both = orders.filter(F.col("o_orderpriority").isin(g1, g2)).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        (F.col("o_orderpriority") == g1).cast("long").alias("is1"),
    )
    pc = both.groupBy("v").agg(
        F.sum("is1").alias("c1"),
        F.sum(F.lit(1) - F.col("is1")).alias("c2"),
    )
    cum = _blocked_cums(pc, ["c1", "c2"])
    t_v = F.col("c1") + F.col("c2")
    before = F.col("cum_c1") + F.col("cum_c2") - t_v
    stats = cum.agg(
        F.sum(
            _dec(F.col("c1")) * (F.lit(2) * before + t_v + F.lit(1))
        ).alias("two_r1"),
        F.sum(_dec(t_v) * t_v * t_v - _dec(t_v)).alias("tie_cubes"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    # 2*U1 = 2*R1 - n1*(n1+1); exact integers until the one cast.
    two_u1 = F.col("two_r1") - _dec(F.col("n1")) * (F.col("n1") + F.lit(1))
    u1 = two_u1.cast("double") / F.lit(2.0)
    mu = n1d * n2d / F.lit(2.0)
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * ((nd + F.lit(1.0)) - F.col("tie_cubes").cast("double") / (nd * (nd - F.lit(1.0))))
    )
    z = (u1 - mu) / F.sqrt(var)
    return stats.select(
        "n1",
        "n2",
        u1.alias("u1"),
        stable_round(z, 9).alias("z_stat"),
        (F.abs(stable_round(z, 9)) > F.lit(_Z_975)).alias("reject_05"),
    )


MW_ORACLE = f"""
WITH both_g AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is1
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
pc AS (
    SELECT v, CAST(sum(is1) AS BIGINT) AS c1,
           CAST(sum(1 - is1) AS BIGINT) AS c2
    FROM both_g GROUP BY 1
),
cum AS (
    SELECT v, c1, c2,
           sum(c1) OVER (ORDER BY v) AS cum_c1,
           sum(c2) OVER (ORDER BY v) AS cum_c2
    FROM pc
),
stats AS (
    SELECT sum(CAST(c1 AS HUGEINT)
               * (2 * (cum_c1 + cum_c2 - c1 - c2) + c1 + c2 + 1)) AS two_r1,
           sum(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2)
               - CAST(c1 + c2 AS HUGEINT)) AS tie_cubes,
           CAST(sum(c1) AS BIGINT) AS n1,
           CAST(sum(c2) AS BIGINT) AS n2
    FROM cum
)
SELECT n1, n2,
       CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
       {sql_round(
           '(CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0'
           ' - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)'
           ' / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0'
           ' * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)'
           ' - CAST(tie_cubes AS DOUBLE)'
           ' / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))'
           ' * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))', 9)}
           AS z_stat,
       abs({sql_round(
           '(CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0'
           ' - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)'
           ' / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0'
           ' * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)'
           ' - CAST(tie_cubes AS DOUBLE)'
           ' / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))'
           ' * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))))', 9)})
           > {_Z_975} AS reject_05
FROM stats
"""


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test
# ---------------------------------------------------------------------------


def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t (unequal variances) on the same pair of
    order-value samples, with the Welch-Satterthwaite degrees of
    freedom — the parametric companion to the KS (shape) and
    Mann-Whitney (rank) tests.

    One scan, one 1-row aggregate: per-group n, sum(cents) and
    sum(cents²) carried in decimal(38,0)/HUGEINT (the squared-cents
    sum passes int64 near sf3), then means/variances/t/df computed in
    one pinned double operation order on both engines. Sample
    variance uses the numerically-exact integer identity
    ``(n*Σx² - (Σx)²) / (n*(n-1))`` — the subtraction happens in
    EXACT decimal, so no catastrophic cancellation ever occurs."""
    orders = load_table(spark, sf_dir, "orders")
    g1, g2 = "1-URGENT", "5-LOW"
    both = orders.filter(F.col("o_orderpriority").isin(g1, g2)).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        (F.col("o_orderpriority") == g1).cast("long").alias("is1"),
    )
    agg = both.agg(
        F.sum("is1").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("is1")).cast("long").alias("n2"),
        F.sum(F.when(F.col("is1") == 1, _dec(F.col("v")))).alias("s1"),
        F.sum(F.when(F.col("is1") == 0, _dec(F.col("v")))).alias("s2"),
        F.sum(
            F.when(F.col("is1") == 1, _dec(F.col("v")) * F.col("v"))
        ).alias("q1"),
        F.sum(
            F.when(F.col("is1") == 0, _dec(F.col("v")) * F.col("v"))
        ).alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n1d, n2d = n1.cast("double"), n2.cast("double")
    mean1 = F.col("s1").cast("double") / n1d
    mean2 = F.col("s2").cast("double") / n2d
    # exact-decimal numerators, ONE cast to double each
    var1 = (_dec(n1) * F.col("q1") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (n1d * (n1d - F.lit(1.0)))
    var2 = (_dec(n2) * F.col("q2") - F.col("s2") * F.col("s2")).cast(
        "double"
    ) / (n2d * (n2d - F.lit(1.0)))
    se1, se2 = var1 / n1d, var2 / n2d
    t = (mean1 - mean2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1d - F.lit(1.0)) + se2 * se2 / (n2d - F.lit(1.0))
    )
    return agg.select(
        "n1",
        "n2",
        stable_round(mean1 / 100, 4).alias("mean1_dollars"),
        stable_round(mean2 / 100, 4).alias("mean2_dollars"),
        stable_round(t, 9).alias("t_stat"),
        stable_round(df, 4).alias("df_welch"),
        (F.abs(stable_round(t, 9)) > F.lit(_Z_975)).alias(
            "reject_05_asymptotic"
        ),
    )


def _welch_oracle() -> str:
    n1d, n2d = "CAST(n1 AS DOUBLE)", "CAST(n2 AS DOUBLE)"
    mean1 = f"(CAST(s1 AS DOUBLE) / {n1d})"
    mean2 = f"(CAST(s2 AS DOUBLE) / {n2d})"
    var1 = (
        f"(CAST(CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS DOUBLE)"
        f" / ({n1d} * ({n1d} - 1.0)))"
    )
    var2 = (
        f"(CAST(CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS DOUBLE)"
        f" / ({n2d} * ({n2d} - 1.0)))"
    )
    se1 = f"({var1} / {n1d})"
    se2 = f"({var2} / {n2d})"
    t = f"(({mean1} - {mean2}) / sqrt({se1} + {se2}))"
    df = (
        f"(({se1} + {se2}) * ({se1} + {se2})"
        f" / ({se1} * {se1} / ({n1d} - 1.0)"
        f" + {se2} * {se2} / ({n2d} - 1.0)))"
    )
    return f"""
WITH both_g AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is1
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
agg AS (
    SELECT CAST(sum(is1) AS BIGINT) AS n1,
           CAST(sum(1 - is1) AS BIGINT) AS n2,
           sum(CASE WHEN is1 = 1 THEN CAST(v AS HUGEINT) END) AS s1,
           sum(CASE WHEN is1 = 0 THEN CAST(v AS HUGEINT) END) AS s2,
           sum(CASE WHEN is1 = 1 THEN CAST(v AS HUGEINT) * v END) AS q1,
           sum(CASE WHEN is1 = 0 THEN CAST(v AS HUGEINT) * v END) AS q2
    FROM both_g
)
SELECT n1, n2,
       {sql_round(f"{mean1} / 100", 4)} AS mean1_dollars,
       {sql_round(f"{mean2} / 100", 4)} AS mean2_dollars,
       {sql_round(t, 9)} AS t_stat,
       {sql_round(df, 4)} AS df_welch,
       abs({sql_round(t, 9)}) > {_Z_975} AS reject_05_asymptotic
FROM agg
"""


# ---------------------------------------------------------------------------
# Chi-square independence (lang x source contingency) + Cramér's V
# ---------------------------------------------------------------------------


def chi2_independence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between document
    ``lang`` and ``source``, with Cramér's V effect size.

    The contingency table is VOCAB-bounded (|langs| x |sources| ~ 100
    cells at any corpus size) — one shuffle to count cells, then
    bounded-table arithmetic. Expected counts E = row_tot*col_tot/N
    are exact integer ratios; each cell's (O-E)²/E term is computed
    in doubles with a pinned order and quantized to 1e-9 BEFORE the
    exact integer sum (the KM/BM25 libm discipline), so the statistic
    hashes identically cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rowt = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("rt"))
    colt = cells.groupBy("source").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    # NULL cells (unobserved pairs) still contribute E to the
    # statistic: their term is (0-E)²/E = E, so build the full grid.
    grid = rowt.crossJoin(F.broadcast(colt)).crossJoin(F.broadcast(tot))
    full = grid.join(cells, ["lang", "source"], "left").select(
        "lang",
        "source",
        F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        "rt",
        "ct",
        "n",
    )
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    od = F.col("o").cast("double")
    # decimal, not long: a cell's (O-E)²/E is bounded by N (~1e12 at
    # 100 TB), so the 1e9-scaled integer passes int64.
    term_q = F.floor(
        (od - e) * (od - e) / e * 1e9 + F.lit(0.5)
    ).cast("decimal(38,0)")
    stats = full.groupBy("n").agg(
        F.sum(term_q).alias("chi2_q"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    chi2 = F.col("chi2_q").cast("double") / 1e9
    dof = (F.col("n_langs") - 1) * (F.col("n_sources") - 1)
    kmin = F.least(F.col("n_langs") - 1, F.col("n_sources") - 1)
    v = F.sqrt(chi2 / (F.col("n").cast("double") * kmin.cast("double")))
    return stats.select(
        F.col("n").alias("n_docs"),
        "n_langs",
        "n_sources",
        dof.cast("long").alias("dof"),
        stable_round(chi2, 6).alias("chi2"),
        stable_round(v, 9).alias("cramers_v"),
    )


CHI2_ORACLE = f"""
WITH cells AS (
    SELECT lang, source, CAST(count(*) AS BIGINT) AS o
    FROM documents GROUP BY 1, 2
),
rowt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
colt AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
full_grid AS (
    SELECT r.lang, c.source, coalesce(cl.o, 0) AS o, r.rt, c.ct, t.n
    FROM rowt r CROSS JOIN colt c CROSS JOIN tot t
    LEFT JOIN cells cl ON cl.lang = r.lang AND cl.source = c.source
),
stats AS (
    SELECT n,
           sum(CAST(floor(
               (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * 1e9 + 0.5) AS HUGEINT)) AS chi2_q,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM full_grid GROUP BY 1
)
SELECT n AS n_docs, n_langs, n_sources,
       CAST((n_langs - 1) * (n_sources - 1) AS BIGINT) AS dof,
       {sql_round('CAST(chi2_q AS DOUBLE) / 1e9', 6)} AS chi2,
       {sql_round(
           'sqrt(CAST(chi2_q AS DOUBLE) / 1e9 / (CAST(n AS DOUBLE)'
           ' * CAST(least(n_langs - 1, n_sources - 1) AS DOUBLE)))', 9)}
           AS cramers_v
FROM stats
"""




# ---------------------------------------------------------------------------
# Split-conformal prediction intervals (distribution-free coverage)
# ---------------------------------------------------------------------------

#: split thresholds on the md5-permutation domain: 60% train /
#: 20% calibration / 20% test.
_CONF_MOD = 1_000_000_007
_CONF_TRAIN_HI = int(0.6 * _CONF_MOD)
_CONF_CAL_HI = int(0.8 * _CONF_MOD)
_CONF_SEED = 11
_CONF_ALPHA = 0.05


def conformal_interval_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for the two-feature OLS
    revenue model (Vovk et al., "Algorithmic Learning in a Random
    World" 2005; Lei et al., JASA 2018): fit on a 60% hash-split,
    take the ceil((n_cal+1)(1-alpha))-th smallest absolute residual
    on a disjoint 20% calibration split as the interval half-width q,
    and report the empirical coverage of ``yhat ± q`` on the held-out
    20% test split. The conformal guarantee — coverage >= 1 - alpha
    REGARDLESS of the model being right — is distribution-free, which
    is why this is the standard uncertainty wrapper in modern ML
    pipelines.

    Everything is one fixed split of one lineitem scan (md5-hash
    split, the repo's train/val/test convention):

    - the OLS fit reuses the decimal(38,0) sufficient-statistic
      aggregate restricted to the train split (same pinned Cramer
      order as :func:`ols_revenue_model`);
    - the calibration quantile is an EXACT ORDER STATISTIC computed
      with NO global sort: residuals quantize to integer cents
      (identical doubles -> identical ints cross-engine), per-value
      counts shuffle once, and the rank scan reuses the
      :func:`_blocked_cums` two-level prefix sum — the KS/MW pattern;
    - coverage on test is a plain conditional aggregate against the
      broadcast 1-row (betas, q) tuple.
    """
    li = load_table(spark, sf_dir, "lineitem")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("|"),
                    F.col("l_linenumber").cast("string"),
                    F.lit(f":{_CONF_SEED}"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long") % F.lit(_CONF_MOD)
    y = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    base = li.select(
        x1.alias("x1"),
        x2.alias("x2"),
        y.alias("y"),
        F.when(u < _CONF_TRAIN_HI, F.lit("train"))
        .when(u < _CONF_CAL_HI, F.lit("cal"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    tr = base.filter(F.col("split") == "train")
    fit = tr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x1"))).alias("s1"),
        F.sum(_dec(F.col("x2"))).alias("s2"),
        F.sum(_dec(F.col("x1")) * F.col("x1")).alias("s11"),
        F.sum(_dec(F.col("x1")) * F.col("x2")).alias("s12"),
        F.sum(_dec(F.col("x2")) * F.col("x2")).alias("s22"),
        F.sum(_dec(F.col("y"))).alias("sy"),
        F.sum(_dec(F.col("x1")) * F.col("y")).alias("s1y"),
        F.sum(_dec(F.col("x2")) * F.col("y")).alias("s2y"),
        F.sum(_dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    d = {
        k: F.col(k).cast("double")
        for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")
    }
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    det0 = (
        d["sy"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["s1"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        + d["s2"] * (d["s1y"] * d["s12"] - d["s11"] * d["s2y"])
    )
    det1 = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["s1"] * d["s22"] - d["s12"] * d["s2"])
        + d["s2"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
    )
    det2 = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["s1"] * (d["s1"] * d["s2y"] - d["s1y"] * d["s2"])
        + d["sy"] * (d["s1"] * d["s12"] - d["s11"] * d["s2"])
    )
    betas = F.broadcast(
        fit.select(
            (det0 / det).alias("b0"),
            (det1 / det).alias("b1"),
            (det2 / det).alias("b2"),
            F.col("n").cast("long").alias("n_train"),
        )
    )
    scored = base.filter(F.col("split") != "train").crossJoin(betas).select(
        "split",
        "n_train",
        F.abs(
            F.floor(
                F.col("y").cast("double")
                - (
                    F.col("b0")
                    + F.col("b1") * F.col("x1").cast("double")
                    + F.col("b2") * F.col("x2").cast("double")
                )
                + F.lit(0.5)
            ).cast("long")
        ).alias("s"),
    )
    cal = scored.filter(F.col("split") == "cal")
    n_cal = cal.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    counts = cal.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = _blocked_cums(counts, ["c"]).select("v", "cum_c")
    # k = ceil((n_cal + 1) * (1 - alpha)); q = min{v : cum(v) >= k}
    k = F.ceil(
        (F.col("n_cal") + F.lit(1)) * F.lit(1.0 - _CONF_ALPHA)
    ).cast("long")
    q_row = F.broadcast(
        cum.crossJoin(F.broadcast(n_cal))
        .filter(F.col("cum_c") >= k)
        .agg(F.min("v").alias("q_cents"))
    )
    test = scored.filter(F.col("split") == "test")
    out = test.crossJoin(q_row).agg(
        F.max("n_train").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("q_cents").alias("q_cents"),
        F.sum(
            (F.col("s") <= F.col("q_cents")).cast("long")
        ).alias("n_covered"),
    )
    return out.crossJoin(F.broadcast(n_cal)).select(
        "n_train",
        "n_cal",
        "n_test",
        stable_round(F.col("q_cents").cast("double") / 100, 2).alias(
            "q_dollars"
        ),
        stable_round(
            F.col("n_covered").cast("double")
            / F.col("n_test").cast("double"),
            6,
        ).alias("coverage"),
        F.lit(1.0 - _CONF_ALPHA).alias("target_coverage"),
    )


def _conformal_oracle() -> str:
    hash_u = (
        "(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '|'"
        " || CAST(l_linenumber AS VARCHAR) || ':"
        f"{_CONF_SEED}'), 1, 15))::BIGINT % {_CONF_MOD})"
    )
    d = {
        k: f"CAST({k} AS DOUBLE)"
        for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")
    }
    det = (
        "({n} * ({s11} * {s22} - {s12} * {s12}) "
        "- {s1} * ({s1} * {s22} - {s12} * {s2}) "
        "+ {s2} * ({s1} * {s12} - {s11} * {s2}))".format(**d)
    )
    det0 = (
        "({sy} * ({s11} * {s22} - {s12} * {s12}) "
        "- {s1} * ({s1y} * {s22} - {s12} * {s2y}) "
        "+ {s2} * ({s1y} * {s12} - {s11} * {s2y}))".format(**d)
    )
    det1 = (
        "({n} * ({s1y} * {s22} - {s12} * {s2y}) "
        "- {sy} * ({s1} * {s22} - {s12} * {s2}) "
        "+ {s2} * ({s1} * {s2y} - {s1y} * {s2}))".format(**d)
    )
    det2 = (
        "({n} * ({s11} * {s2y} - {s1y} * {s12}) "
        "- {s1} * ({s1} * {s2y} - {s1y} * {s2}) "
        "+ {sy} * ({s1} * {s12} - {s11} * {s2}))".format(**d)
    )
    return f"""
WITH base AS (
    SELECT CAST(l_quantity AS BIGINT) AS x1,
           CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
           CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                AS BIGINT) AS y,
           CASE WHEN {hash_u} < {_CONF_TRAIN_HI} THEN 'train'
                WHEN {hash_u} < {_CONF_CAL_HI} THEN 'cal'
                ELSE 'test' END AS split
    FROM lineitem
),
fit AS (
    SELECT count(*) AS n,
           sum(CAST(x1 AS HUGEINT)) AS s1,
           sum(CAST(x2 AS HUGEINT)) AS s2,
           sum(CAST(x1 AS HUGEINT) * x1) AS s11,
           sum(CAST(x1 AS HUGEINT) * x2) AS s12,
           sum(CAST(x2 AS HUGEINT) * x2) AS s22,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x1 AS HUGEINT) * y) AS s1y,
           sum(CAST(x2 AS HUGEINT) * y) AS s2y
    FROM base WHERE split = 'train'
),
betas AS (
    SELECT {det0} / {det} AS b0,
           {det1} / {det} AS b1,
           {det2} / {det} AS b2,
           CAST(n AS BIGINT) AS n_train
    FROM fit
),
scored AS (
    SELECT b.split, bb.n_train,
           abs(CAST(floor(CAST(b.y AS DOUBLE)
               - (bb.b0 + bb.b1 * CAST(b.x1 AS DOUBLE)
                  + bb.b2 * CAST(b.x2 AS DOUBLE)) + 0.5) AS BIGINT)) AS s
    FROM base b CROSS JOIN betas bb
    WHERE b.split <> 'train'
),
n_cal AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cal FROM scored
    WHERE split = 'cal'
),
cum AS (
    SELECT s AS v,
           sum(count(*)) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
    FROM scored WHERE split = 'cal' GROUP BY s
),
q AS (
    SELECT min(v) AS q_cents
    FROM cum CROSS JOIN n_cal
    WHERE cum_c >= CAST(ceil((n_cal + 1) * {1.0 - _CONF_ALPHA}) AS BIGINT)
)
SELECT bb.n_train,
       nc.n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       {sql_round('CAST(q.q_cents AS DOUBLE) / 100', 2)} AS q_dollars,
       {sql_round(
           'CAST(sum(CASE WHEN t.s <= q.q_cents THEN 1 ELSE 0 END)'
           ' AS DOUBLE) / CAST(count(*) AS DOUBLE)', 6)} AS coverage,
       CAST({1.0 - _CONF_ALPHA} AS DOUBLE) AS target_coverage
FROM scored t
CROSS JOIN q CROSS JOIN n_cal nc CROSS JOIN (SELECT n_train FROM betas) bb
WHERE t.split = 'test'
GROUP BY bb.n_train, nc.n_cal, q.q_cents
"""




# ---------------------------------------------------------------------------
# Log-rank test (two-group survival comparison)
# ---------------------------------------------------------------------------

_LOGRANK_G1 = "AUTOMOBILE"
_LOGRANK_G2 = "BUILDING"


def logrank_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox 1966) test comparing the
    time-to-second-order survival curves of two customer market
    segments — the standard two-group companion to
    :func:`kaplan_meier_repeat` (a t-test on observed gaps would be
    biased by censoring; the log-rank compares the full curves).

    Same subject construction as the KM operator, restricted to two
    ``c_mktsegment`` groups (one custkey-keyed join to customer —
    the only volume-scaling join). The hypergeometric O-E and
    variance terms live on the pooled distinct-event-time spine
    (calendar-bounded, inequality self-join explicitly broadcast);
    per-time expected counts and variances are doubles in one pinned
    operation order, quantized to 1e-9 integers BEFORE the exact
    sums (the KM/BM25 libm discipline). Statistic:
    z = (O1 - E1)/sqrt(V), chi2 = z² (1 dof)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("seg")
    ).filter(F.col("c_mktsegment").isin(_LOGRANK_G1, _LOGRANK_G2))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("mx"))
    subj = per_cust.crossJoin(F.broadcast(horizon)).select(
        (F.col("seg") == _LOGRANK_G1).cast("int").alias("g1"),
        F.when(
            F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
        )
        .otherwise(F.datediff(F.col("mx"), F.col("d1")))
        .cast("long")
        .alias("t"),
        F.col("d2").isNotNull().cast("int").alias("event"),
    )
    spine = subj.groupBy("t").agg(
        F.sum(F.col("event") * F.col("g1")).cast("long").alias("d1t"),
        F.sum(F.col("event") * (1 - F.col("g1"))).cast("long").alias("d2t"),
        F.sum(F.col("g1")).cast("long").alias("a1t"),
        F.sum(F.lit(1) - F.col("g1")).cast("long").alias("a2t"),
    )
    a, b = spine.alias("a"), F.broadcast(spine.alias("b"))
    risk = a.join(b, F.col("b.t") >= F.col("a.t")).groupBy(
        "a.t", "a.d1t", "a.d2t"
    ).agg(
        F.sum("b.a1t").cast("long").alias("n1t"),
        F.sum("b.a2t").cast("long").alias("n2t"),
    ).filter(F.col("d1t") + F.col("d2t") > 0)
    dt = (F.col("d1t") + F.col("d2t")).cast("double")
    nt = (F.col("n1t") + F.col("n2t")).cast("double")
    n1d = F.col("n1t").cast("double")
    e1 = dt * n1d / nt
    v = F.when(
        nt > 1.0,
        dt
        * (n1d / nt)
        * (F.lit(1.0) - n1d / nt)
        * (nt - dt)
        / (nt - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    # quantized terms are decimal(38,0), NOT long: dt*n1/nt reaches
    # ~1e12 at the 100 TB customer count, so the 1e9-scaled integer
    # is ~1e21 — past int64 (the r5/r6 CMS-bound lesson, caught in
    # this round's self-review before it could bite).
    q9 = lambda c: F.floor(c * 1e9 + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    stats = risk.agg(
        F.sum("d1t").cast("long").alias("o1"),
        F.sum(q9(e1)).alias("e1_q"),
        F.sum(q9(v)).alias("v_q"),
        F.max("n1t").alias("n1"),
        F.max("n2t").alias("n2"),
    )
    # n at the earliest event time is the full group size only if the
    # minimum observed time is an event time; emit the risk-set maxima
    # as the group-size proxy both engines share.
    z = (
        F.col("o1").cast("double") - F.col("e1_q").cast("double") / 1e9
    ) / F.sqrt(F.col("v_q").cast("double") / 1e9)
    return stats.select(
        F.col("n1").alias("max_risk_g1"),
        F.col("n2").alias("max_risk_g2"),
        "o1",
        stable_round(F.col("e1_q").cast("double") / 1e9, 6).alias("e1"),
        stable_round(z, 9).alias("z_stat"),
        stable_round(z * z, 6).alias("chi2_1dof"),
        (F.abs(stable_round(z, 9)) > F.lit(_Z_975)).alias("reject_05"),
    )


LOGRANK_ORACLE = f"""
WITH cust AS (
    SELECT c_custkey, c_mktsegment AS seg FROM customer
    WHERE c_mktsegment IN ('{_LOGRANK_G1}', '{_LOGRANK_G2}')
),
ranked AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
),
per_cust AS (
    SELECT r.o_custkey,
           min(CASE WHEN rn = 1 THEN d END) AS d1,
           min(CASE WHEN rn = 2 THEN d END) AS d2,
           any_value(c.seg) AS seg
    FROM ranked r JOIN cust c ON r.o_custkey = c.c_custkey
    WHERE rn <= 2 GROUP BY 1
),
horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
subj AS (
    SELECT CASE WHEN seg = '{_LOGRANK_G1}' THEN 1 ELSE 0 END AS g1,
           CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                ELSE date_diff('day', d1, mx) END AS t,
           CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
    FROM per_cust CROSS JOIN horizon
),
spine AS (
    SELECT t,
           CAST(sum(event * g1) AS BIGINT) AS d1t,
           CAST(sum(event * (1 - g1)) AS BIGINT) AS d2t,
           CAST(sum(g1) AS BIGINT) AS a1t,
           CAST(sum(1 - g1) AS BIGINT) AS a2t
    FROM subj GROUP BY 1
),
risk AS (
    SELECT a.t, a.d1t, a.d2t,
           CAST(sum(b.a1t) AS BIGINT) AS n1t,
           CAST(sum(b.a2t) AS BIGINT) AS n2t
    FROM spine a JOIN spine b ON b.t >= a.t
    GROUP BY 1, 2, 3
    HAVING a.d1t + a.d2t > 0
),
terms AS (
    SELECT d1t,
           CAST(floor(CAST(d1t + d2t AS DOUBLE) * CAST(n1t AS DOUBLE)
               / CAST(n1t + n2t AS DOUBLE) * 1e9 + 0.5) AS HUGEINT) AS e1_q,
           CASE WHEN n1t + n2t > 1 THEN
               CAST(floor(CAST(d1t + d2t AS DOUBLE)
                   * (CAST(n1t AS DOUBLE) / CAST(n1t + n2t AS DOUBLE))
                   * (1.0 - CAST(n1t AS DOUBLE) / CAST(n1t + n2t AS DOUBLE))
                   * (CAST(n1t + n2t AS DOUBLE) - CAST(d1t + d2t AS DOUBLE))
                   / (CAST(n1t + n2t AS DOUBLE) - 1.0) * 1e9 + 0.5)
                   AS HUGEINT)
           ELSE 0 END AS v_q,
           n1t, n2t
    FROM risk
),
stats AS (
    SELECT CAST(sum(d1t) AS BIGINT) AS o1,
           sum(e1_q) AS e1_q,
           sum(v_q) AS v_q,
           CAST(max(n1t) AS BIGINT) AS n1,
           CAST(max(n2t) AS BIGINT) AS n2
    FROM terms
)
SELECT n1 AS max_risk_g1, n2 AS max_risk_g2, o1,
       {sql_round('CAST(e1_q AS DOUBLE) / 1e9', 6)} AS e1,
       {sql_round(
           '(CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9)'
           ' / sqrt(CAST(v_q AS DOUBLE) / 1e9)', 9)} AS z_stat,
       {sql_round(
           '((CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9)'
           ' / sqrt(CAST(v_q AS DOUBLE) / 1e9))'
           ' * ((CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9)'
           ' / sqrt(CAST(v_q AS DOUBLE) / 1e9))', 6)} AS chi2_1dof,
       abs({sql_round(
           '(CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9)'
           ' / sqrt(CAST(v_q AS DOUBLE) / 1e9)', 9)}) > {_Z_975}
           AS reject_05
FROM stats
"""


def _register() -> None:
    registry.register("ols_revenue_model", ols_revenue_model, OLS_ORACLE)
    registry.register("kaplan_meier_repeat", kaplan_meier_repeat, KM_ORACLE)
    registry.register("ks_test_price", ks_test_price, KS_ORACLE)
    registry.register(
        "mann_whitney_orders", mann_whitney_orders, MW_ORACLE
    )
    registry.register("welch_t_test", welch_t_test, _welch_oracle())
    registry.register(
        "chi2_independence_docs", chi2_independence_docs, CHI2_ORACLE
    )
    registry.register(
        "conformal_interval_orders",
        conformal_interval_orders,
        _conformal_oracle(),
    )
    registry.register(
        "logrank_segments", logrank_segments, LOGRANK_ORACLE
    )
