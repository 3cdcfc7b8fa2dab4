"""Time-series operators over the ``events`` stream (batch form).

Extends the §2.5 window surface with the two shapes the reference's
"time-based" intent (``glue_job.py:129-134`` calendar columns;
README.md:7 "identify sales trends") implies but never reaches:
value-range window frames (a true trailing time window, not a row
count) and robust per-group outlier detection (median / MAD), the
standard data-quality screen before a metric feeds a trend dashboard.

Scale posture:

- The rolling average is ONE shuffle (hash by ``user_id``) + an
  in-partition sort; the range frame is evaluated streamingly by
  Spark's window exec with a sliding buffer bounded by the frame
  width, not the partition size.
- The MAD pass is two keyed aggregations and two BROADCAST joins
  (per-type medians are tiny); events never shuffle twice. Exact
  ``percentile`` holds per-group values in memory — at 100 TB swap
  in ``approx_percentile`` (same plan shape, sketch-based); the exact
  form is kept here because the oracle gate demands bit-parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: seconds since the ntz epoch, timezone-independent (events.ts is
#: TIMESTAMP_NTZ after the nanos repair in ``load_table``); DuckDB
#: twin is date_diff('second', TIMESTAMP '1970-01-01', ts) — both
#: truncate sub-second parts toward zero for post-epoch values.
_EPOCH_SECONDS = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def events_rolling_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-minute average event value per user — a RANGE frame
    over event-time seconds, so the window is defined by time distance,
    not row count (rows with equal timestamps are peers in both
    engines, making the result deterministic under ties)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.expr(_EPOCH_SECONDS)
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-600, 0)
    # quantized windowed sum: identical addends in both engines, so the
    # running sum is order-independent (see functions/rounding.py)
    qsum = F.sum(F.floor(F.col("value") * 10000.0 + F.lit(0.5))).over(w) / F.lit(
        10000.0
    )
    cnt = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        cnt.alias("n_in_window"),
        stable_round(qsum / cnt, 6).alias("rolling_avg_10m"),
    )


ROLLING_ORACLE = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_in_window,
       floor(((sum(floor(value * 10000.0 + 0.5)) OVER w) / 10000.0
              / (count(*) OVER w)) * 1000000.0 + 0.5) / 1000000.0
           AS rolling_avg_10m
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
"""

#: 3 * 1.4826 (the normal-consistency constant): the classic
#: "3 sigma" cut expressed in MAD units.
_MAD_CUT = 4.4478


def events_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: median / MAD (median absolute
    deviation), flagging events beyond 3 normalized MADs. Unlike
    mean/stddev, the cut itself is not dragged by the outliers it is
    trying to find."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("adev") > F.lit(_MAD_CUT) * F.col("mad")).cast("int")
            ).alias("n_outliers"),
            F.min("med").alias("_med"),
            F.min("mad").alias("_mad"),
        )
        .select(
            "event_type",
            "n_events",
            F.col("n_outliers").cast("long").alias("n_outliers"),
            stable_round(F.col("_med"), 6).alias("median_value"),
            stable_round(F.col("_mad"), 6).alias("mad_value"),
        )
    )


MAD_ORACLE = f"""
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
    FROM events e JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN d.adev > {_MAD_CUT} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       floor(min(d.med) * 1000000.0 + 0.5) / 1000000.0 AS median_value,
       floor(min(m.mad) * 1000000.0 + 0.5) / 1000000.0 AS mad_value
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic additive seasonal decomposition of daily order revenue
    (the moving-average method of STL's ancestor, Macaulay 1931):
    trend = centered 7-day moving average over a gap-free calendar
    spine, seasonal index = mean detrended value per day-of-week.

    Exactness discipline: revenue is summed in integer CENTS
    (``floor(price*100+0.5)`` per order — aggregation-order
    independent), the detrended series is kept as the EXACT integer
    ``7*rev - window_sum`` (no division until the end), and each
    day-of-week index is one double division of two exact integers.

    Scale posture: the only single-partition step — the 7-row
    centered window — runs over the DAILY ROLLUP, whose size is
    bounded by the calendar (~2.4k rows for the 6.5-year span)
    regardless of corpus size; the fact table itself contributes one
    keyed aggregation. ``dow_id`` anchors at the 1970-01-01 epoch
    (0 = Thursday), not locale week rules, for cross-engine parity.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("rev_c", F.lit(0)).alias("rev_c")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    t = (
        filled.select(
            "d",
            "rev_c",
            F.sum("rev_c").over(w).alias("wsum"),
            F.count(F.lit(1)).over(w).alias("wcnt"),
        )
        .filter(F.col("wcnt") == 7)
        .withColumn(
            "dow_id",
            F.pmod(
                F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")),
                F.lit(7),
            ).cast("long"),
        )
    )
    return (
        t.groupBy("dow_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("rev_c").alias("_rev"),
            F.sum(F.lit(7) * F.col("rev_c") - F.col("wsum")).alias("_det"),
        )
        .select(
            "dow_id",
            "n_days",
            stable_round(
                F.col("_rev").cast("double")
                / (F.lit(100.0) * F.col("n_days").cast("double")),
                4,
            ).alias("avg_revenue"),
            stable_round(
                F.col("_det").cast("double")
                / (F.lit(700.0) * F.col("n_days").cast("double")),
                4,
            ).alias("seasonal_index"),
        )
        .orderBy("dow_id")
    )


SEASONAL_ORACLE = """WITH daily AS MATERIALIZED (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
    FROM orders GROUP BY 1
),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
spine AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS d
    FROM bounds
),
filled AS MATERIALIZED (
    SELECT s.d, coalesce(y.rev_c, 0) AS rev_c
    FROM spine s LEFT JOIN daily y USING (d)
),
t AS MATERIALIZED (
    SELECT d, rev_c,
           sum(rev_c) OVER win AS wsum,
           count(*) OVER win AS wcnt
    FROM filled
    WINDOW win AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT date_diff('day', DATE '1970-01-01', d) % 7 AS dow_id,
       CAST(count(*) AS BIGINT) AS n_days,
       floor(CAST(sum(rev_c) AS DOUBLE) / (100.0 * count(*))
             * 10000.0 + 0.5) / 10000.0 AS avg_revenue,
       floor(CAST(sum(7 * rev_c - wsum) AS DOUBLE) / (700.0 * count(*))
             * 10000.0 + 0.5) / 10000.0 AS seasonal_index
FROM t
WHERE wcnt = 7
GROUP BY 1
ORDER BY dow_id
"""


def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the zero-filled daily revenue
    series at lags 1..14 — the standard seasonality screen that
    complements ``seasonal_decompose_daily`` (which ASSUMES the weekly
    period; the ACF is how you detect it).

    Series definition: exact-cents revenue per calendar day over the
    FULL [min(o_orderdate), max(o_orderdate)] spine, missing days = 0
    (sparse-at-small-SF days would otherwise change the series shape
    per SF). Lag pairs come from a keyed self-join on
    ``date_add(d, lag)`` — an equi-join shuffle on the date, NOT a
    global-ordered window (which would be a SinglePartition plan);
    the spine is calendar-bounded so every stage is metadata-sized
    next to the orders scan.

    Numerics: Pearson correlation per lag over pairwise-complete
    observations, every power sum carried in decimal(38,0)/HUGEINT
    (cents-squared daily terms reach ~8e17 at sf1 and ~8e23 at the
    100 TB scale — past int64); numerator/denominator convert to
    double once, then one sqrt + one division in fixed order."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("c")
    )
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("d")
    )
    rev = spine.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0).cast("long")).alias("x")
    )
    lags = F.explode(F.array(*[F.lit(i) for i in range(1, 15)])).alias("lag")
    a = rev.select("d", "x", lags)
    b = rev.select(F.col("d").alias("bd"), F.col("x").alias("y"))
    pairs = a.join(b, F.col("bd") == F.date_add(F.col("d"), F.col("lag")))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return agg.select(
        "lag",
        F.col("n").alias("n_pairs"),
        stable_round(num / den, 9).alias("acf"),
    )


ACF_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
    FROM orders GROUP BY 1
),
b AS (SELECT min(d) AS mn, max(d) AS mx FROM daily),
spine AS (
    SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
    FROM b
),
rev AS (
    SELECT s.d, coalesce(dl.c, 0) AS x
    FROM spine s LEFT JOIN daily dl USING (d)
),
lags AS (SELECT CAST(unnest(range(1, 15)) AS INTEGER) AS lag),
pairs AS (
    SELECT l.lag, a.x AS x, bb.x AS y
    FROM rev a CROSS JOIN lags l
    JOIN rev bb ON bb.d = a.d + l.lag
),
agg AS (
    SELECT lag, count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy,
           sum(CAST(x AS HUGEINT) * y) AS sxy
    FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       floor((CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)))
             * 1000000000.0 + 0.5) / 1000000000.0 AS acf
FROM agg
"""


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the slope estimate is
    the MEDIAN of all pairwise slopes (Theil 1950 / Sen 1968 —
    breakdown point 29%, vs 0% for `sales_trend_slope`'s OLS, which
    one fat-finger day can drag arbitrarily). Intercept = median of
    the per-day residuals ``y - m*x`` at the chosen slope.

    Honest O(days²): the pair set is quadratic BY DEFINITION of the
    estimator, but in the number of CALENDAR DAYS, not rows — a 100 TB
    corpus still spans ~2 500 days -> ~3.1M pairs after the daily
    rollup, metadata-sized next to the scan (same bounded-quadratic
    class as the whitelisted promo-window join). Determinism: slopes
    are one division of exact ints; the median is Spark ``percentile``
    = DuckDB ``quantile_cont`` (shared (n-1)*q linear interpolation,
    the `percentile_by_status` pairing); residuals are fixed-order
    double arithmetic on (exact cents, the shared median double)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("y")
    )
    dd = daily.select(
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )
    a, b = dd.alias("a"), dd.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("m_slope"),
    )
    resid = dd.crossJoin(m).select(
        "n_pairs",
        "m_slope",
        (
            F.col("y").cast("double")
            - F.col("m_slope") * F.col("x").cast("double")
        ).alias("r"),
    )
    return resid.groupBy("n_pairs", "m_slope").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("percentile(r, 0.5)").alias("m_intercept"),
    ).select(
        "n_days",
        "n_pairs",
        stable_round(F.col("m_slope"), 6).alias("slope_cents_per_day"),
        stable_round(F.col("m_intercept"), 2).alias("intercept_cents"),
    )


THEIL_SEN_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
    FROM orders GROUP BY 1
),
dd AS (
    SELECT date_diff('day', DATE '1970-01-01', d) AS x, y FROM daily
),
pairs AS (
    SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
    FROM dd a JOIN dd b ON a.x < b.x
),
m AS (
    SELECT count(*) AS n_pairs, quantile_cont(slope, 0.5) AS m_slope
    FROM pairs
),
resid AS (
    SELECT m.n_pairs, m.m_slope,
           CAST(y AS DOUBLE) - m.m_slope * CAST(x AS DOUBLE) AS r
    FROM dd CROSS JOIN m
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       floor(m_slope * 1000000.0 + 0.5) / 1000000.0 AS slope_cents_per_day,
       floor(quantile_cont(r, 0.5) * 100.0 + 0.5) / 100.0 AS intercept_cents
FROM resid
GROUP BY n_pairs, m_slope
"""


def isotonic_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) L2 regression of the
    zero-filled daily revenue series — the constrained-regression
    class behind probability calibration (the standard post-hoc
    calibrator for scores like ``quality_classifier_score``) and
    monotone trend extraction, which no amount of ordinary
    aggregation or OLS expresses.

    Computed by the CLOSED-FORM max-min characterization of the PAV
    solution (Robertson, Wright & Dykstra, "Order Restricted
    Statistical Inference", 1988):

        fit[i] = max_{j<=i} min_{k>=i} mean(y[j..k])

    evaluated distributed: interval means A(j,k) come from prefix
    sums (one inequality self-join on the CALENDAR-BOUNDED day spine,
    explicitly broadcast); ``min_{k>=i}`` is a reverse running min
    per j (window PARTITIONED BY j — ~|days| bounded partitions,
    fully parallel, never SinglePartition); ``max_{j<=i}`` is a plain
    groupBy max. The pair table is O(|days|²) ≈ 3M rows at ANY
    corpus size — the `theil_sen_trend` calendar-bounded class; the
    only volume-scaling stage is the initial per-day revenue groupBy.

    Numerics: prefix sums carried in decimal(38,0)/HUGEINT (a 100 TB
    corpus's cumulative cents pass int64 around year two); every
    interval mean is ONE exact-decimal subtraction cast to double and
    divided by an integer length — bit-identical cross-engine, so the
    min/max lattice selects identical values in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("c")
    )
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("d"))
    rev = spine.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0).cast("long")).alias("x")
    )
    a, b = rev.alias("a"), F.broadcast(rev.alias("b"))
    s = a.join(b, F.col("b.d") <= F.col("a.d")).groupBy("a.d", "a.x").agg(
        F.sum(F.col("b.x").cast("decimal(38,0)")).alias("s_incl")
    ).select(
        F.col("d"),
        F.col("x"),
        F.col("s_incl"),
        (F.col("s_incl") - F.col("x")).alias("s_excl"),
    )
    sj, sk = s.alias("sj"), F.broadcast(s.alias("sk"))
    pairs = sj.join(sk, F.col("sj.d") <= F.col("sk.d")).select(
        F.col("sj.d").alias("jd"),
        F.col("sk.d").alias("kd"),
        (
            (F.col("sk.s_incl") - F.col("sj.s_excl")).cast("double")
            / (F.datediff(F.col("sk.d"), F.col("sj.d")) + F.lit(1)).cast(
                "double"
            )
        ).alias("m"),
    )
    w = Window.partitionBy("jd").orderBy(F.col("kd").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rm = pairs.select("jd", "kd", F.min("m").over(w).alias("rm"))
    fit = rm.groupBy("kd").agg(F.max("rm").alias("f"))
    return (
        rev.join(fit, rev["d"] == fit["kd"])
        .select(
            "d",
            F.col("x").alias("revenue_cents"),
            stable_round(F.col("f") / 100.0, 6).alias("iso_fit_dollars"),
        )
    )


ISOTONIC_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
    FROM orders GROUP BY 1
),
b AS (SELECT min(d) AS mn, max(d) AS mx FROM daily),
spine AS (
    SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
    FROM b
),
rev AS (
    SELECT s.d, CAST(coalesce(dl.c, 0) AS BIGINT) AS x
    FROM spine s LEFT JOIN daily dl USING (d)
),
s AS (
    SELECT d, x,
           sum(CAST(x AS HUGEINT)) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_incl
    FROM rev
),
pairs AS (
    SELECT sj.d AS jd, sk.d AS kd,
           CAST(sk.s_incl - (sj.s_incl - sj.x) AS DOUBLE)
           / CAST(date_diff('day', sj.d, sk.d) + 1 AS DOUBLE) AS m
    FROM s sj JOIN s sk ON sj.d <= sk.d
),
rm AS (
    SELECT jd, kd,
           min(m) OVER (PARTITION BY jd ORDER BY kd DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
    FROM pairs
),
fit AS (SELECT kd, max(rm) AS f FROM rm GROUP BY 1)
SELECT r.d, r.x AS revenue_cents,
       floor(f.f / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS iso_fit_dollars
FROM rev r JOIN fit f ON r.d = f.kd
"""




def max_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency of order ACTIVITY SPANS — the classic
    sweep-line ("maximum interval overlap") analytic: each order is
    open from least(orderdate, first shipdate) to
    greatest(orderdate, last shipdate) (this synthetic corpus ships
    some lines before the order date, so the span takes min/max of
    both); the answer is the running sum of +1/-1 boundary events.

    Scale shape: the per-order interval reduction is one keyed
    shuffle; boundary deltas then aggregate onto the CALENDAR-BOUNDED
    day spine, and the running sum is an inequality self-join on
    that broadcast spine (the kaplan_meier class) — never a
    SinglePartition window over row-volume data. Everything is exact
    integers; the single output row carries the peak, the EARLIEST
    peak day (deterministic argmax), and the span-weighted mean
    concurrency."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        li.groupBy("l_orderkey")
        .agg(
            F.min(F.to_date("l_shipdate")).alias("smin"),
            F.max(F.to_date("l_shipdate")).alias("smax"),
        )
        .join(
            orders.select(
                "o_orderkey", F.to_date("o_orderdate").alias("od")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.least("od", "smin").alias("s"),
            F.greatest("od", "smax").alias("e"),
        )
    )
    deltas = (
        spans.select(F.col("s").alias("d"), F.lit(1).alias("x"))
        .unionAll(
            spans.select(
                F.date_add(F.col("e"), 1).alias("d"), F.lit(-1).alias("x")
            )
        )
        .groupBy("d")
        .agg(F.sum("x").cast("long").alias("dx"))
    )
    a, b = deltas.alias("a"), F.broadcast(deltas.alias("b"))
    conc = a.join(b, F.col("b.d") <= F.col("a.d")).groupBy("a.d").agg(
        F.sum("b.dx").cast("long").alias("c")
    )
    n_tot = spans.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    peak = conc.agg(F.max("c").alias("peak"))
    peak_day = (
        conc.crossJoin(F.broadcast(peak))
        .filter(F.col("c") == F.col("peak"))
        .agg(F.min("d").alias("peak_date"), F.max("peak").alias("pk"))
    )
    # span-weighted mean concurrency: sum over boundary-days of
    # c * days-until-next-boundary, / total covered days. Next
    # boundary via the same broadcast spine (min d' > d).
    nxt = a.join(b, F.col("b.d") > F.col("a.d"), "left").groupBy(
        "a.d"
    ).agg(F.min("b.d").alias("dn"))
    seg = conc.join(nxt, "d").filter(F.col("dn").isNotNull()).select(
        (F.col("c").cast("decimal(38,0)")
         * F.datediff("dn", "d")).alias("cd"),
        F.datediff("dn", "d").cast("long").alias("len"),
    )
    mean_c = seg.agg(
        (
            F.sum("cd").cast("double")
            / F.sum("len").cast("double")
        ).alias("m")
    )
    return (
        n_tot.crossJoin(F.broadcast(peak_day))
        .crossJoin(F.broadcast(mean_c))
        .select(
            "n_intervals",
            F.col("pk").alias("peak_concurrency"),
            "peak_date",
            stable_round(F.col("m"), 6).alias("mean_concurrency"),
        )
    )


CONCURRENCY_ORACLE = """
WITH spans AS (
    SELECT least(CAST(o.o_orderdate AS DATE), g.smin) AS s,
           greatest(CAST(o.o_orderdate AS DATE), g.smax) AS e
    FROM (
        SELECT l_orderkey,
               min(CAST(l_shipdate AS DATE)) AS smin,
               max(CAST(l_shipdate AS DATE)) AS smax
        FROM lineitem GROUP BY 1
    ) g JOIN orders o ON g.l_orderkey = o.o_orderkey
),
deltas AS (
    SELECT d, CAST(sum(x) AS BIGINT) AS dx FROM (
        SELECT s AS d, 1 AS x FROM spans
        UNION ALL
        SELECT e + INTERVAL 1 DAY, -1 FROM spans
    ) GROUP BY 1
),
conc AS (
    SELECT a.d, CAST(sum(b.dx) AS BIGINT) AS c
    FROM deltas a JOIN deltas b ON b.d <= a.d GROUP BY 1
),
peak AS (SELECT max(c) AS pk FROM conc),
peak_day AS (
    SELECT min(d) AS peak_date, max(pk) AS pk
    FROM conc CROSS JOIN peak WHERE c = pk
),
nxt AS (
    SELECT a.d, min(b.d) AS dn
    FROM deltas a LEFT JOIN deltas b ON b.d > a.d GROUP BY 1
),
seg AS (
    SELECT CAST(c AS HUGEINT) * date_diff('day', conc.d, nxt.dn) AS cd,
           CAST(date_diff('day', conc.d, nxt.dn) AS BIGINT) AS len
    FROM conc JOIN nxt ON conc.d = nxt.d
    WHERE nxt.dn IS NOT NULL
),
mean_c AS (
    SELECT CAST(sum(cd) AS DOUBLE) / CAST(sum(len) AS DOUBLE) AS m FROM seg
),
n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n_intervals FROM spans)
SELECT n_tot.n_intervals,
       peak_day.pk AS peak_concurrency,
       CAST(peak_day.peak_date AS DATE) AS peak_date,
       floor(mean_c.m * 1000000.0 + 0.5) / 1000000.0 AS mean_concurrency
FROM n_tot CROSS JOIN peak_day CROSS JOIN mean_c
"""


def changepoint_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection in the zero-filled daily revenue
    series by BINARY SEGMENTATION (Scott & Knott 1974; the first
    split of the standard recursive scheme): the boundary k that
    minimizes SSE(left) + SSE(right), where each segment's SSE uses
    the exact identity SSE = Q − S²/len over prefix sums S (Σy) and
    Q (Σy²) — the retrospective companion to the online CUSUM drift
    detector (`events_cusum_drift`).

    Scale shape: the daily reduction is the only volume stage;
    prefix sums come from one broadcast inequality self-join on the
    calendar-bounded spine; every candidate boundary is one row of
    that spine (~2 500 candidates at ANY corpus size). Numerics: S
    and Q in decimal(38,0)/HUGEINT (Q passes int64 near sf30); each
    candidate's SSE is computed in doubles in ONE pinned order, so
    the argmin picks identical values cross-engine (ties broken by
    earliest date)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("c")
    )
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("d"))
    rev = spine.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0).cast("long")).alias("x")
    )
    a, b = rev.alias("a"), F.broadcast(rev.alias("b"))
    pre = a.join(b, F.col("b.d") <= F.col("a.d")).groupBy(
        "a.d"
    ).agg(
        F.sum(F.col("b.x").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("b.x").cast("decimal(38,0)") * F.col("b.x")
        ).alias("q"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    tot = F.broadcast(
        rev.agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("st"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("x")
            ).alias("qt"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cand = pre.crossJoin(tot).filter(F.col("k") < F.col("n"))
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    std = F.col("st").cast("double")
    qtd = F.col("qt").cast("double")
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    sse_l = qd - sd * sd / kd
    # k < n is already filtered, but ANSI mode evaluates the
    # projection eagerly per row — guard the (n - k) divisions so the
    # boundary row can never raise DIVIDE_BY_ZERO.
    guard = F.col("k") < F.col("n")
    sse_r = F.when(
        guard,
        (qtd - qd) - (std - sd) * (std - sd) / (nd - kd),
    )
    scored = cand.select(
        "d",
        "k",
        "n",
        (sse_l + sse_r).alias("sse_split"),
        (qtd - std * std / nd).alias("sse_total"),
        (sd / kd).alias("ml"),
        F.when(guard, (std - sd) / (nd - kd)).alias("mr"),
    )
    best_val = scored.agg(F.min("sse_split").alias("best"))
    best = (
        scored.crossJoin(F.broadcast(best_val))
        .filter(F.col("sse_split") == F.col("best"))
        .agg(
            F.min("d").alias("split_date"),
            F.min("k").alias("n_left"),
            F.max("n").alias("n_days"),
            F.min("ml").alias("ml"),
            F.min("mr").alias("mr"),
            F.min("sse_split").alias("sse_split"),
            F.min("sse_total").alias("sse_total"),
        )
    )
    return best.select(
        "split_date",
        "n_left",
        (F.col("n_days") - F.col("n_left")).alias("n_right"),
        stable_round(F.col("ml") / 100, 2).alias("mean_left_dollars"),
        stable_round(F.col("mr") / 100, 2).alias("mean_right_dollars"),
        stable_round(
            F.lit(1.0) - F.col("sse_split") / F.col("sse_total"), 9
        ).alias("sse_reduction"),
    )


CHANGEPOINT_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
    FROM orders GROUP BY 1
),
b AS (SELECT min(d) AS mn, max(d) AS mx FROM daily),
spine AS (
    SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
    FROM b
),
rev AS (
    SELECT s.d, CAST(coalesce(dl.c, 0) AS BIGINT) AS x
    FROM spine s LEFT JOIN daily dl USING (d)
),
pre AS (
    SELECT a.d,
           sum(CAST(b.x AS HUGEINT)) AS s,
           sum(CAST(b.x AS HUGEINT) * b.x) AS q,
           CAST(count(*) AS BIGINT) AS k
    FROM rev a JOIN rev b ON b.d <= a.d GROUP BY 1
),
tot AS (
    SELECT sum(CAST(x AS HUGEINT)) AS st,
           sum(CAST(x AS HUGEINT) * x) AS qt,
           CAST(count(*) AS BIGINT) AS n
    FROM rev
),
scored AS (
    SELECT d, k, n,
           (CAST(q AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
           + ((CAST(qt AS DOUBLE) - CAST(q AS DOUBLE))
              - (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))
                * (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS sse_split,
           CAST(qt AS DOUBLE)
             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
               / CAST(n AS DOUBLE) AS sse_total,
           CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS ml,
           (CAST(st AS DOUBLE) - CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS mr
    FROM pre CROSS JOIN tot
    WHERE k < n
),
best_val AS (SELECT min(sse_split) AS best FROM scored)
SELECT min(d) AS split_date,
       min(k) AS n_left,
       max(n) - min(k) AS n_right,
       floor(min(ml) / 100 * 100.0 + 0.5) / 100.0 AS mean_left_dollars,
       floor(min(mr) / 100 * 100.0 + 0.5) / 100.0 AS mean_right_dollars,
       floor((1.0 - min(sse_split) / min(sse_total)) * 1000000000.0 + 0.5)
         / 1000000000.0 AS sse_reduction
FROM scored CROSS JOIN best_val
WHERE sse_split = best
"""


def _register() -> None:
    registry.register(
        "events_rolling_avg_time", events_rolling_avg_time, ROLLING_ORACLE
    )
    registry.register(
        "isotonic_daily_revenue", isotonic_daily_revenue, ISOTONIC_ORACLE
    )
    registry.register("acf_daily_revenue", acf_daily_revenue, ACF_ORACLE)
    registry.register("theil_sen_trend", theil_sen_trend, THEIL_SEN_ORACLE)
    registry.register("events_outlier_mad", events_outlier_mad, MAD_ORACLE)
    registry.register(
        "seasonal_decompose_daily", seasonal_decompose_daily, SEASONAL_ORACLE
    )
    registry.register(
        "max_concurrent_orders", max_concurrent_orders, CONCURRENCY_ORACLE
    )
    registry.register(
        "changepoint_daily_revenue",
        changepoint_daily_revenue,
        CHANGEPOINT_ORACLE,
    )
