"""Join operators (SURVEY.md §2.3 J1-J4 + semi/anti).

J1 (enrichment left join) and J2/J3 (broadcast rate lookup) live in
``plans.flagship``. Here: semi/anti joins (needed for S10 merge and
dedup) and the as-of join the reference *intended* but never built —
"In a real scenario, you'd join based on date" (``glue_job.py:59``;
``rate_date: timestamp`` exists to support it, ``glue_job.py:47``).

As-of join, Spark-first: equi-join on the key with the range predicate
(`rate_date <= ts`) attached, then keep the latest match per left row
via ``row_number``. With a small rates side this is a broadcast join —
no shuffle of the fact table at all. If the rates side is itself huge,
bucket both sides by currency and let sort-merge handle it; semantics
are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.operators.skew import spread
from bigdata_pipelines_aws_glue_spark.plans.flagship import synth_transactions
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    broadcast_right: bool = True,
    left_id_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join (J4): for each left row, attach the right
    row with the greatest ``right_time <= left_time`` (backward) /
    smallest ``right_time >= left_time`` (forward) within the same
    ``on`` key. Unmatched left rows survive with NULLs (left-outer).

    Dedup of multiple range matches uses a window keyed by the left
    row identity: pass ``left_id_cols`` naming a unique key (cheap
    shuffle — only those columns partition the window); default is all
    left columns, which requires distinct left rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    rt = F.col(right_time)
    cond = (left[on] == right[on]) & (
        (rt <= left[left_time]) if direction == "backward" else (rt >= left[left_time])
    )
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, cond, "left").drop(right[on])
    order = rt.desc_nulls_last() if direction == "backward" else rt.asc_nulls_last()
    id_cols = left_id_cols if left_id_cols is not None else left.columns
    w = Window.partitionBy(*[left[c] for c in id_cols]).orderBy(order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


def asof_join_broadcast_array(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join, small-right fast path: pack each key's right rows
    into a date-sorted array, broadcast-join on the key, and pick the
    last element with ``right_time <= left_time`` (backward) / first
    with ``right_time >= left_time`` (forward) via array expressions.
    ZERO exchanges on the left side (the generic :func:`asof_join`
    needs a window shuffle to dedup range matches — measured 2.8s ->
    this path avoids it entirely), and no per-left-row dedup at all,
    so duplicated left rows keep their multiplicity (the round-6
    oracle-bug class). Correct whenever the per-key right side fits
    an array (rates: a handful of rows); for huge right sides use
    :func:`asof_join` / the union-sortmerge forms."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    packed = right.groupBy(on).agg(
        F.sort_array(
            F.collect_list(F.struct(right_time, *right_cols))
        ).alias("__rl")
    )
    joined = left.join(F.broadcast(packed), on=on, how="left")
    if direction == "backward":
        eligible = F.filter(
            F.col("__rl"), lambda r: r[right_time] <= F.col(left_time)
        )
        pick = -1
    else:
        eligible = F.filter(
            F.col("__rl"), lambda r: r[right_time] >= F.col(left_time)
        )
        pick = 1
    # guard: ANSI mode raises on element_at over an empty array
    match = F.when(F.size(eligible) > 0, F.element_at(eligible, pick))
    # r15: materialize the picked struct ONCE and extract fields from
    # it — the previous per-column ``match[c]`` re-ran the whole
    # array-filter pick per emitted column (CollapseProject keeps the
    # non-cheap alias as its own projection, so this is one HOF eval
    # per row; measured 1.44 s -> 1.25 s on asof_join_rates at sf0.1,
    # rows identical).
    out = joined.withColumn("__m", match)
    for c in [right_time, *right_cols]:
        out = out.withColumn(c, F.col("__m")[c])
    return out.drop("__rl", "__m")


def asof_join_union_sortmerge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join, huge-right-side form (the bucketed sort-merge the
    module docstring promises): tag and UNION both sides, hash-
    partition on the key, sort within key by (time, side), and fill
    each left row with the most recent right payload via
    ``last(ignorenulls)`` over a running window. Exactly ONE shuffle
    of each side (on the key), no broadcast, no row multiplication —
    the right side may be arbitrarily large. Right rows sort before
    left rows at equal timestamps, so the match is backward-inclusive
    (``right_time <= left_time``), matching :func:`asof_join`.

    Partition parallelism is per key: use this when the key is
    high-cardinality (instruments, users, devices). For a handful of
    keys with a small right side, :func:`asof_join_broadcast_array`
    is the better plan (zero exchanges).
    """
    payload = F.struct(
        F.col(right_time), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
        *[F.lit(None).alias(c) for c in left.columns if c != on],
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c != on],
    )
    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy(on)
        # __r in the ordering makes ties among same-timestamp right
        # rows deterministic (struct comparison is lexicographic)
        .orderBy("__t", "__side", F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    out = filled
    for c in [right_time, *right_cols]:
        out = out.withColumn(c, F.col("__match")[c])
    return out.drop("__t", "__side", "__r", "__match")


def asof_join_bucketed_sortmerge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    bucket_days: int = 180,
) -> DataFrame:
    """As-of join, skew-proof huge-right form: like
    :func:`asof_join_union_sortmerge` but sub-partitioned on
    ``(key, time-bucket)`` so ONE hot key (a dominant instrument,
    currency, user) does not serialize through a single task — its
    rows split across ``time_range / bucket_days`` parallel windows.

    Cross-bucket correctness comes from SEED rows: for every (key,
    bucket) the left side occupies, the latest right payload from any
    STRICTLY EARLIER bucket is injected at the bucket's sort front.
    Seeds are computed from per-(key, bucket) aggregates — a per-key
    window over at most #buckets rows, never over the raw corpus — so
    the skew-prone per-key work is O(buckets), and everything else
    shuffles on the composite (key, bucket) key. Bucket assignment
    floors the DATE of the timestamp, so any row in an earlier bucket
    is strictly older than every row in a later one (the seed sorts
    first naturally under the same (t, side, payload) ordering).

    Semantics are identical to :func:`asof_join` /
    :func:`asof_join_union_sortmerge` (backward-inclusive, left-outer;
    ties among equal right timestamps resolve to the greatest payload)
    — property-tested equal on a hot-key corpus in
    tests/test_operators.py."""
    epoch = F.lit("1970-01-01").cast("date")

    def _bucket(c: Column) -> Column:
        return F.floor(F.datediff(c.cast("date"), epoch) / F.lit(bucket_days))

    payload_t = F.struct(
        F.col(right_time).alias("__t"),
        F.struct(
            F.col(right_time), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    # last right payload per (key, bucket): max of (t, payload) matches
    # the (t, __r)-ascending "last" of the union-sortmerge ordering.
    r_last = (
        right.withColumn("__b", _bucket(F.col(right_time)))
        .groupBy(on, "__b")
        .agg(F.max(payload_t).alias("__m"))
    )
    l_buckets = left.select(
        F.col(on), _bucket(F.col(left_time)).alias("__b")
    ).distinct()
    # Running max of right payloads over STRICTLY earlier buckets:
    # left markers (side 0) sort before the same bucket's right
    # aggregate (side 1), so rowsBetween(..., -1) sees only __b' < __b.
    marks = l_buckets.select(
        F.col(on), "__b", F.lit(0).alias("__mside"),
        F.lit(None).cast(r_last.schema["__m"].dataType).alias("__m"),
    ).unionByName(
        r_last.select(F.col(on), "__b", F.lit(1).alias("__mside"), "__m")
    )
    w_seed = (
        Window.partitionBy(on)
        .orderBy("__b", "__mside")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        marks.withColumn("__seed", F.max("__m").over(w_seed))
        .filter((F.col("__mside") == 0) & F.col("__seed").isNotNull())
        .select(
            F.col(on),
            "__b",
            F.col("__seed.__t").alias("__t"),
            F.lit(0).alias("__side"),
            F.col("__seed.__r").alias("__r"),
        )
    )
    r_struct = F.struct(F.col(right_time), *[F.col(c) for c in right_cols])
    r_tagged = right.select(
        F.col(on),
        _bucket(F.col(right_time)).alias("__b"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    extra = [c for c in left.columns if c != on]
    rows_r = r_tagged.unionByName(seeds).select(
        F.col(on), "__b", "__t", "__side", "__r",
        *[F.lit(None).alias(c) for c in extra],
    )
    l_tagged = left.select(
        F.col(on),
        _bucket(F.col(left_time)).alias("__b"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in extra],
    )
    unioned = rows_r.unionByName(l_tagged)
    w = (
        Window.partitionBy(on, "__b")
        .orderBy("__t", "__side", F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    out = filled
    for c in [right_time, *right_cols]:
        out = out.withColumn(c, F.col("__match")[c])
    return out.drop("__b", "__t", "__side", "__r", "__match")


def asof_join_skewproof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 via the (key, time-bucket) sub-partitioned sort-merge —
    same semantics and oracle as :func:`asof_join_rates`. The corpus'
    currency key IS skewed (5 currencies over the whole fact table),
    which is exactly the regime this form exists for."""
    tx = synth_transactions(spark, sf_dir).select(
        "transaction_id", "currency", "amount", "timestamp"
    )
    rates = _asof_rates(spark, sf_dir)
    out = asof_join_bucketed_sortmerge(
        tx, rates, "currency", "timestamp", "rate_date", ["rate_to_usd"]
    )
    return out.select(
        "transaction_id",
        "currency",
        "amount",
        F.col("rate_date").alias("asof_rate_date"),
        F.coalesce("rate_to_usd", F.lit(1.0)).alias("asof_rate"),
        F.when(F.col("currency") == "USD", F.col("amount"))
        .otherwise(F.col("amount") * F.coalesce("rate_to_usd", F.lit(1.0)))
        .alias("amount_usd"),
    )


def asof_join_sortmerge_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 via the non-broadcast sort-merge path — same semantics and
    oracle as :func:`asof_join_rates` (property-tested equal to the
    broadcast paths in tests/test_operators.py)."""
    tx = synth_transactions(spark, sf_dir).select(
        "transaction_id", "currency", "amount", "timestamp"
    )
    rates = _asof_rates(spark, sf_dir)
    out = asof_join_union_sortmerge(
        tx, rates, "currency", "timestamp", "rate_date", ["rate_to_usd"]
    )
    return out.select(
        "transaction_id",
        "currency",
        "amount",
        F.col("rate_date").alias("asof_rate_date"),
        F.coalesce("rate_to_usd", F.lit(1.0)).alias("asof_rate"),
        F.when(F.col("currency") == "USD", F.col("amount"))
        .otherwise(F.col("amount") * F.coalesce("rate_to_usd", F.lit(1.0)))
        .alias("amount_usd"),
    )


def _asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rates dim dated *inside* the transaction time range (1995-2001)
    so the as-of semantics are actually exercised: 4 dated rates per
    currency, 90-day spacing."""
    nation = load_table(spark, sf_dir, "nation")
    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        RATED_CURRENCY_SLOTS,
        _currency_expr,
    )

    return (
        nation.filter(
            (F.col("n_nationkey") < 20)
            & (F.col("n_nationkey") % 5 < RATED_CURRENCY_SLOTS)
        )
        .select(
            _currency_expr(F.col("n_nationkey")).alias("currency"),
            (F.lit(0.5) + (F.col("n_nationkey") % 10) * F.lit(0.1)).alias(
                "rate_to_usd"
            ),
            F.expr(
                "timestamp'1995-06-01 00:00:00'"
                " + make_interval(0,0,0,n_nationkey * 90)"
            ).alias("rate_date"),
        )
    )


def asof_join_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 realized: each transaction gets the rate effective at its
    timestamp (latest rate_date <= ts per currency), missing -> 1.0."""
    # r16 (guide §2.5): the broadcast as-of pick (per-row array-filter
    # HOF) runs in the tx scan stage, which inherits lineitem's single
    # local split through the broadcast join — spread parallelizes it
    # (probe 1.50-1.92 -> 1.48-1.61 s, rows identical; no-op at scale).
    tx = spread(
        synth_transactions(spark, sf_dir).select(
            "transaction_id", "currency", "amount", "timestamp"
        )
    )
    rates = _asof_rates(spark, sf_dir)
    out = asof_join_broadcast_array(
        tx, rates, "currency", "timestamp", "rate_date", ["rate_to_usd"]
    )
    return out.select(
        "transaction_id",
        "currency",
        "amount",
        F.col("rate_date").alias("asof_rate_date"),
        F.coalesce("rate_to_usd", F.lit(1.0)).alias("asof_rate"),
        F.when(F.col("currency") == "USD", F.col("amount"))
        .otherwise(F.col("amount") * F.coalesce("rate_to_usd", F.lit(1.0)))
        .alias("amount_usd"),
    )


#: The twin dedups RANGE MATCHES per left row, never left rows
#: themselves: tx rows group on their full content with a
#: multiplicity count, the as-of pick runs once per distinct row, and
#: the result re-expands by the count. The earlier per-transaction_id
#: row_number form silently COLLAPSED genuinely duplicated input rows
#: — caught by the round-6 sf0.001 sweep, where the corpus contains
#: one fully-duplicated lineitem and Spark (correctly) emits both
#: copies. m = 1 everywhere at sf0.01/sf0.1, so attested values are
#: unchanged there.
ASOF_ORACLE = """
WITH currencies(slot, currency) AS (
    VALUES (0,'USD'),(1,'EUR'),(2,'GBP'),(3,'JPY'),(4,'INR')
),
tx AS (
    SELECT ((l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) * 1000
             + l_suppkey AS transaction_id,
           c.currency AS currency,
           l_extendedprice AS amount,
           l_shipdate AS ts
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN currencies c ON c.slot = l_orderkey % 5
),
txg AS (
    SELECT transaction_id, currency, amount, ts, count(*) AS m
    FROM tx GROUP BY 1, 2, 3, 4
),
rates AS (
    SELECT c.currency AS currency,
           0.5::DOUBLE + (n_nationkey % 10) * 0.1::DOUBLE AS rate_to_usd,
           TIMESTAMP '1995-06-01' + (n_nationkey * 90) * INTERVAL 1 DAY AS rate_date
    FROM nation JOIN currencies c ON c.slot = n_nationkey % 5
    WHERE n_nationkey < 20 AND n_nationkey % 5 < 4
),
matched AS (
    SELECT t.transaction_id, t.currency, t.amount, t.ts, t.m,
           r.rate_to_usd, r.rate_date,
           row_number() OVER (PARTITION BY t.transaction_id, t.currency,
                                           t.amount, t.ts
                              ORDER BY r.rate_date DESC NULLS LAST) AS rn
    FROM txg t
    LEFT JOIN rates r ON t.currency = r.currency AND r.rate_date <= t.ts
)
SELECT transaction_id, currency, amount,
       rate_date AS asof_rate_date,
       coalesce(rate_to_usd, 1.0::DOUBLE) AS asof_rate,
       CASE WHEN currency = 'USD' THEN amount
            ELSE amount * coalesce(rate_to_usd, 1.0::DOUBLE) END AS amount_usd
FROM (SELECT *, unnest(generate_series(1, m)) FROM matched WHERE rn = 1)
"""


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: customers having at least one order — existence
    check without row multiplication (shuffle carries only keys)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers with no URGENT order (every customer has
    *some* order in the corpus, so the unfiltered variant is empty —
    S10's delete-matching step uses the same operator)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# Range join: 90-day promo windows starting every 45 days. Window p
# covers [start0 + 45p days, start0 + 45p + 90 days) — overlapping, so
# each lineitem matches up to 2 windows (a genuine interval join, not
# a partition lookup).
RANGE_BIN_DAYS = 45
RANGE_SPAN_DAYS = 90
RANGE_N_PERIODS = 56  # covers 1995-01-01 .. ~2001-12
RANGE_EPOCH = "1995-01-01 00:00:00"


def binned_range_join(
    events: DataFrame,
    periods: DataFrame,
    ts_col: str,
    start_col: str = "p_start",
    end_col: str = "p_end",
    bin_days: int = RANGE_BIN_DAYS,
) -> DataFrame:
    """Distributed range join via binning: intervals explode into the
    fixed-width bins they overlap; each event maps to exactly one bin;
    an EQUI-join on bin + residual BETWEEN filter replaces the
    nested-loop range join. At 100 TB the shuffle is hash-partitioned
    on bin — no broadcast requirement, no cross product; bin width
    should be chosen ~interval span so each interval lands in
    span/bin_width + 1 bins."""
    # Day-granularity bins (timestamp_ntz has no numeric cast; every
    # interval boundary here is a whole day, so datediff is exact).
    epoch = F.lit(RANGE_EPOCH[:10]).cast("date")

    def _bin_of(c: F.Column) -> F.Column:
        return F.floor(F.datediff(c.cast("date"), epoch) / F.lit(bin_days))

    # Last covered bin belongs to end-exclusive timestamp end-1day only
    # when the interval ends on a bin boundary; sequence() is inclusive.
    last_bin = F.floor(
        (F.datediff(F.col(end_col).cast("date"), epoch) - F.lit(1))
        / F.lit(bin_days)
    )
    exploded = periods.withColumn(
        "bin", F.explode(F.sequence(_bin_of(F.col(start_col)), last_bin))
    )
    binned_events = events.withColumn("bin", _bin_of(F.col(ts_col)))
    return binned_events.join(exploded, "bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )


def synth_periods(spark: SparkSession) -> DataFrame:
    """Deterministic overlapping promo windows (mirrored by the oracle
    via ``range()``)."""
    return spark.range(RANGE_N_PERIODS).select(
        F.col("id").alias("period_id"),
        F.expr(
            f"timestamp'{RANGE_EPOCH}'"
            f" + make_dt_interval(cast(id * {RANGE_BIN_DAYS} as int), 0, 0, 0)"
        ).alias("p_start"),
        F.expr(
            f"timestamp'{RANGE_EPOCH}'"
            f" + make_dt_interval(cast(id * {RANGE_BIN_DAYS} + {RANGE_SPAN_DAYS}"
            f" as int), 0, 0, 0)"
        ).alias("p_end"),
    )


def range_join_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4-adjacent interval join: revenue per overlapping 90-day promo
    window, executed as the binned equi-join (shuffle keyed on bin)."""
    from bigdata_pipelines_aws_glue_spark.functions.rounding import (
        quantized_sum,
        stable_round,
    )

    li = load_table(spark, sf_dir, "lineitem")
    joined = binned_range_join(li, synth_periods(spark), "l_shipdate")
    return joined.groupBy("period_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        stable_round(
            quantized_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


RANGE_JOIN_ORACLE = f"""
WITH periods AS (
    SELECT CAST(p AS BIGINT) AS period_id,
           TIMESTAMP '{RANGE_EPOCH}' + (p * {RANGE_BIN_DAYS}) * INTERVAL 1 DAY AS p_start,
           TIMESTAMP '{RANGE_EPOCH}' + (p * {RANGE_BIN_DAYS} + {RANGE_SPAN_DAYS}) * INTERVAL 1 DAY AS p_end
    FROM range({RANGE_N_PERIODS}) t(p)
)
SELECT period_id, count(*) AS n_items,
       floor(((sum(floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5) / 100.0 AS revenue
FROM periods JOIN lineitem
  ON l_shipdate >= p_start AND l_shipdate < p_end
GROUP BY period_id
"""


def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join completing the join-type matrix (left/semi/anti/
    as-of/range elsewhere): reconcile daily order counts against daily
    lineitem-receipt counts, keeping days present on either side only —
    the two-source audit query behind pipeline-drift alarms.

    Both inputs are pre-aggregated to one row per day BEFORE the join,
    so the full-outer is tiny-⋈-tiny (|days| rows) regardless of corpus
    size — the scalable shape for reconciliation at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    daily_orders = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    daily_shipments = lineitem.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_shipments"))
    j = daily_orders.join(daily_shipments, "day", "full")
    return j.select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
        F.when(F.col("n_orders").isNull(), F.lit("shipments_only"))
        .when(F.col("n_shipments").isNull(), F.lit("orders_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    )


FULL_OUTER_ORACLE = """
WITH daily_orders AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY day
),
daily_shipments AS (
    SELECT CAST(l_shipdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_shipments
    FROM lineitem GROUP BY day
)
SELECT COALESCE(o.day, r.day) AS day,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(r.n_shipments, 0) AS n_shipments,
       CASE WHEN o.day IS NULL THEN 'shipments_only'
            WHEN r.day IS NULL THEN 'orders_only'
            ELSE 'both' END AS presence
FROM daily_orders o FULL OUTER JOIN daily_shipments r ON o.day = r.day
"""


def _monthly_rate_points(spark: SparkSession) -> DataFrame:
    """Dense rate curve for the interpolation as-of: one point per
    month 1995-01 .. 2001-12 (84 points) per rated currency, so every
    transaction shipdate (1995-01-02 .. 2001-11-04 — MEASURED on the
    corpus; this synthetic calendar is not TPC-H's 1992-1998) sits
    strictly inside the curve.
    rate(slot, m) = 0.5 + slot*0.1 + ((m*7) % 13) * 0.01 — integer
    congruence arithmetic scaled by exact-literal multipliers, so both
    engines rebuild bit-identical doubles from closed form."""
    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        RATED_CURRENCY_SLOTS,
        _currency_expr,
    )

    months = spark.range(84).select(F.col("id").alias("m"))
    slots = spark.range(RATED_CURRENCY_SLOTS).select(F.col("id").alias("slot"))
    return months.crossJoin(slots).select(
        _currency_expr(F.col("slot")).alias("currency"),
        F.expr("add_months(timestamp'1995-01-01 00:00:00', m)").alias(
            "rate_date"
        ),
        (
            F.lit(0.5)
            + F.col("slot") * F.lit(0.1)
            + ((F.col("m") * 7) % 13) * F.lit(0.01)
        ).alias("rate"),
    )


def interpolated_asof(
    left: DataFrame,
    curve: DataFrame,
    on: str,
    left_time: str,
    curve_time: str,
    curve_val: str,
    out_schema: str,
    out_cols: list[str],
) -> DataFrame:
    """LINEARLY-INTERPOLATED as-of join via cogrouped
    ``applyInPandas`` — the cogroup surface's canonical use: each task
    receives one key's left rows AND that key's full rate curve
    together, with no join row explosion and no prev+next double
    window. A plain backward as-of (J4) steps; this blends between
    the surrounding curve points:

        r(t) = r0 + (r1 - r0) * ((t - t0) / (t1 - t0))

    evaluated in exactly that operation order (each numpy binary op
    is one correctly-rounded IEEE op, matching the scalar SQL parse
    tree of the oracle's closed form). Keys with an EMPTY curve group
    (unrated currencies) emit NULL — the cogroup equivalent of
    left-outer.

    Scale: one hash shuffle of each side on the key; per-task memory
    is one key's rows + its curve (curves are calendar-bounded).
    Skewed keys inherit the same mitigation as any keyed cogroup
    (salt the LEFT and replicate the curve per salt)."""

    def interp(l_pdf, r_pdf):
        import numpy as np

        out = l_pdf[out_cols].copy()
        t = l_pdf[left_time].to_numpy().astype("datetime64[D]").astype(np.int64)
        if len(r_pdf) == 0:
            out["rate_interp"] = np.full(len(l_pdf), np.nan)
            return out
        r_pdf = r_pdf.sort_values(curve_time)
        pd_days = (
            r_pdf[curve_time].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        rates = r_pdf[curve_val].to_numpy(np.float64)
        idx = np.searchsorted(pd_days, t, side="right") - 1
        # shipdates are strictly inside the curve; clamp defensively
        # at the edges (emits the boundary rate, never extrapolates)
        idx = np.clip(idx, 0, len(pd_days) - 1)
        nxt = np.minimum(idx + 1, len(pd_days) - 1)
        d0 = pd_days[idx]
        d1 = pd_days[nxt]
        r0 = rates[idx]
        r1 = rates[nxt]
        den = (d1 - d0).astype(np.float64)
        num = (t - d0).astype(np.float64)
        frac = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        # t before the first point: idx clipped to 0 leaves num < 0 —
        # clamp to the boundary rate instead of extrapolating backward
        # (interior rows have 0 <= frac < 1, so this is an identity
        # for them; the oracle covers interior rows only)
        frac = np.clip(frac, 0.0, 1.0)
        out["rate_interp"] = r0 + (r1 - r0) * frac
        return out

    return (
        left.groupBy(on)
        .cogroup(curve.groupBy(on))
        .applyInPandas(interp, schema=out_schema)
    )


def interp_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: every transaction priced at the rate linearly
    interpolated between the surrounding monthly curve points of its
    currency (INR has no curve -> NULL rate, NULL converted amount).
    The DuckDB twin never materializes the curve: because the points
    sit at month starts with a closed-form rate, the oracle recomputes
    r0/r1 from date_trunc arithmetic — so a hash match proves the
    whole cogroup/searchsorted/interpolation pipeline equals the
    analytic ground truth."""
    tx = synth_transactions(spark, sf_dir).select(
        "transaction_id", "currency", "amount", "timestamp"
    )
    curve = _monthly_rate_points(spark)
    out = interpolated_asof(
        tx,
        curve,
        on="currency",
        left_time="timestamp",
        curve_time="rate_date",
        curve_val="rate",
        out_schema=(
            "transaction_id long, currency string, amount double,"
            " rate_interp double"
        ),
        out_cols=["transaction_id", "currency", "amount"],
    )
    return out.select(
        "transaction_id",
        "currency",
        stable_round(F.col("rate_interp"), 9).alias("rate_interp"),
        stable_round(F.col("amount") * F.col("rate_interp"), 4).alias(
            "amount_usd"
        ),
    )


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4, FORWARD direction: each transaction gets the NEXT scheduled
    rate change at-or-after its timestamp (the "what rate will apply"
    planning query — the mirror of the backward 'what rate applied').
    Transactions after the last scheduled change (and INR, which has
    no curve) surface NULLs — both left-outer edges are live in this
    corpus. Same zero-left-exchange broadcast-array plan as the
    backward query; duplicated left rows keep their multiplicity."""
    tx = synth_transactions(spark, sf_dir).select(
        "transaction_id", "currency", "amount", "timestamp"
    )
    rates = _asof_rates(spark, sf_dir)
    out = asof_join_broadcast_array(
        tx,
        rates,
        "currency",
        "timestamp",
        "rate_date",
        ["rate_to_usd"],
        direction="forward",
    )
    return out.select(
        "transaction_id",
        "currency",
        "amount",
        F.col("rate_date").alias("next_rate_date"),
        F.col("rate_to_usd").alias("next_rate"),
    )


ASOF_FORWARD_ORACLE = """
WITH currencies(slot, currency) AS (
    VALUES (0,'USD'),(1,'EUR'),(2,'GBP'),(3,'JPY'),(4,'INR')
),
tx AS (
    SELECT ((l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) * 1000
             + l_suppkey AS transaction_id,
           c.currency AS currency,
           l_extendedprice AS amount,
           l_shipdate AS ts
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN currencies c ON c.slot = l_orderkey % 5
),
txg AS (
    SELECT transaction_id, currency, amount, ts, count(*) AS m
    FROM tx GROUP BY 1, 2, 3, 4
),
rates AS (
    SELECT c.currency AS currency,
           0.5::DOUBLE + (n_nationkey % 10) * 0.1::DOUBLE AS rate_to_usd,
           TIMESTAMP '1995-06-01' + (n_nationkey * 90) * INTERVAL 1 DAY AS rate_date
    FROM nation JOIN currencies c ON c.slot = n_nationkey % 5
    WHERE n_nationkey < 20 AND n_nationkey % 5 < 4
),
matched AS (
    SELECT t.transaction_id, t.currency, t.amount, t.m,
           r.rate_to_usd, r.rate_date,
           row_number() OVER (PARTITION BY t.transaction_id, t.currency,
                                           t.amount, t.ts
                              ORDER BY r.rate_date ASC NULLS LAST) AS rn
    FROM txg t
    LEFT JOIN rates r ON t.currency = r.currency AND r.rate_date >= t.ts
)
SELECT transaction_id, currency, amount,
       rate_date AS next_rate_date,
       rate_to_usd AS next_rate
FROM (SELECT *, unnest(generate_series(1, m)) FROM matched WHERE rn = 1)
"""


INTERP_ASOF_ORACLE = """
WITH tx AS (
    SELECT ((l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) * 1000
               + l_suppkey AS transaction_id,
           l_orderkey % 5 AS slot,
           l_extendedprice AS amount,
           l_shipdate AS ts
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
calc AS (
    SELECT transaction_id,
           (['USD','EUR','GBP','JPY','INR'])[slot + 1] AS currency,
           amount,
           CASE WHEN slot <= 3 THEN
               (0.5::DOUBLE + slot * 0.1::DOUBLE
                    + (((year(ts) - 1995) * 12 + month(ts) - 1) * 7 % 13) * 0.01::DOUBLE)
               + ((0.5::DOUBLE + slot * 0.1::DOUBLE
                    + ((((year(ts) - 1995) * 12 + month(ts) - 1) + 1) * 7 % 13) * 0.01::DOUBLE)
                  - (0.5::DOUBLE + slot * 0.1::DOUBLE
                    + (((year(ts) - 1995) * 12 + month(ts) - 1) * 7 % 13) * 0.01::DOUBLE))
                 * (CAST(date_diff('day', date_trunc('month', ts), ts) AS DOUBLE)
                    / CAST(date_diff('day', date_trunc('month', ts),
                           date_trunc('month', ts) + INTERVAL 1 MONTH) AS DOUBLE))
           ELSE NULL END AS rate_interp
    FROM tx
)
SELECT transaction_id, currency,
       floor(rate_interp * 1000000000.0 + 0.5) / 1000000000.0 AS rate_interp,
       floor((amount * rate_interp) * 10000.0 + 0.5) / 10000.0 AS amount_usd
FROM calc
"""


def _register() -> None:
    registry.register(
        "full_outer_reconciliation", full_outer_reconciliation, FULL_OUTER_ORACLE
    )
    registry.register("interp_asof_rates", interp_asof_rates, INTERP_ASOF_ORACLE)
    registry.register("asof_join_forward", asof_join_forward, ASOF_FORWARD_ORACLE)
    registry.register("asof_join_rates", asof_join_rates, ASOF_ORACLE)
    registry.register(
        "asof_join_sortmerge", asof_join_sortmerge_rates, ASOF_ORACLE
    )
    registry.register(
        "asof_join_skewproof", asof_join_skewproof_rates, ASOF_ORACLE
    )
    registry.register("semi_join_customers", semi_join_customers, SEMI_ORACLE)
    registry.register("anti_join_customers", anti_join_customers, ANTI_ORACLE)
    registry.register(
        "range_join_promo_windows", range_join_promo_windows, RANGE_JOIN_ORACLE
    )
