"""Join-size estimation from column statistics — the optimizer's view.

Before picking a join strategy, a cost-based optimizer must predict
the join's output cardinality from per-column statistics. This
operator runs that prediction for the self-equi-join size
Σ_k d(k)² — the quantity that explodes under skew — three ways and
scores each against ground truth:

- ``exact``         Σ d(k)² from the full degree table (the answer).
- ``uniform_ndv``   the System-R textbook formula N²/NDV (Selinger
                    1979): exact N and NDV, uniformity assumed.
- ``endbiased_h{H}`` an end-biased histogram (Ioannidis/Christodoulakis
                    lineage): the ``H`` heaviest keys kept exactly,
                    the tail assumed uniform over the remaining NDV.

Two key profiles make the statistics trade-off measurable, because
this corpus's natural keys are near-uniform (max/min degree < 2):

- ``natural``  ``l_partkey`` as-is — uniform-friendly; all three
               methods agree within a few percent.
- ``hotkey``   every 10th partkey collapsed into one hot key (the
               'hot product' pattern; the standard way benchmark
               suites inject skew into uniform TPC-H keys). The
               uniform estimate collapses (~19x under) while the
               histogram's exact heavy keys recover it to ~1% — the
               reason every serious engine (and AQE's runtime
               re-planning) keys on heavy hitters.

Shape at 100 TB: the degree table is one keyed count (vocab-sized);
Σ d² sums as DECIMAL(38,0)/HUGEINT (d² overflows doubles' exactness
and — at extreme skew — longs); the histogram head is a bounded
TakeOrderedAndProject of ``H`` rows broadcast back against the 1-row
tail totals; estimates use double division identically in both
engines. The DuckDB twin hash-checks bit-for-bit.

Output representation: ``est_pairs`` is emitted as DOUBLE (the
decimal(38,0)/HUGEINT carry stays internal, where the overflow
safety matters) because Spark and DuckDB render decimals
non-canonically and the registry forbids raw-DECIMAL output columns.
The conversion is exact below 2**53; ``est_pairs_exact`` attests
per-row whether that bound holds, so a 100 TB run where an estimate
leaves the exact-double range announces itself instead of silently
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

H_HEAVY = 50
#: hot-key collapse modulus for the skewed profile
HOT_MOD = 10


def _floor_to_dec(q: Column) -> Column:
    """``floor(DOUBLE)`` landed in decimal(38,0) without Spark's
    long-returning FLOOR anywhere past its range: below 2**53 the
    long floor is exact and in-range; at/above 2**53 every double is
    already integral, so the direct decimal cast IS the floor. This
    matches DuckDB's ``CAST(floor(DOUBLE) AS HUGEINT)`` at any
    magnitude, where a bare ``F.floor`` would wrap at Long.MaxValue
    once N²/NDV leaves the long range (the very skew regime this
    module exists to quantify)."""
    return F.when(
        q < F.lit(float(2**53)), F.floor(q).cast("decimal(38,0)")
    ).otherwise(q.cast("decimal(38,0)"))


def _estimate_rows(cnt: DataFrame, profile: str) -> DataFrame:
    """Three (method, est_pairs, rel_err) rows from a degree table."""
    d_dec = F.col("d").cast("decimal(38,0)")
    totals = cnt.agg(
        F.sum(d_dec * d_dec).alias("exact_pairs"),
        F.sum(d_dec).alias("n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ndv"),
    )
    heavy = cnt.orderBy(F.col("d").desc(), F.col("k")).limit(H_HEAVY)
    heavy_tot = heavy.agg(
        F.coalesce(F.sum(d_dec * d_dec), F.lit(0).cast("decimal(38,0)"))
        .alias("head_pairs"),
        F.coalesce(F.sum(d_dec), F.lit(0).cast("decimal(38,0)"))
        .alias("head_n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("head_k"),
    )
    j = totals.crossJoin(F.broadcast(heavy_tot))
    tail_n = (F.col("n") - F.col("head_n")).cast("double")
    tail_ndv = (F.col("ndv") - F.col("head_k")).cast("double")
    eb = F.col("head_pairs") + F.when(
        tail_ndv > 0,
        _floor_to_dec((tail_n * tail_n) / tail_ndv),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    ests = j.select(
        F.col("exact_pairs"),
        F.col("exact_pairs").alias("e_exact"),
        _floor_to_dec(
            (F.col("n").cast("double") * F.col("n").cast("double"))
            / F.col("ndv").cast("double")
        ).alias("e_uniform"),
        eb.alias("e_endbiased"),
    )
    rows = None
    for method, col in (
        ("exact", "e_exact"),
        ("uniform_ndv", "e_uniform"),
        (f"endbiased_h{H_HEAVY}", "e_endbiased"),
    ):
        dec = F.col(col).cast("decimal(38,0)")
        r = ests.select(
            F.lit(profile).alias("key_profile"),
            F.lit(method).alias("method"),
            # Emit as DOUBLE: the registry bans raw-DECIMAL output
            # columns (engines render/hash decimals non-canonically).
            # Exact below 2**53; est_pairs_exact attests it.
            dec.cast("double").alias("est_pairs"),
            (dec < F.lit(2**53).cast("decimal(38,0)")).alias(
                "est_pairs_exact"
            ),
            stable_round(
                F.abs(
                    F.col(col).cast("double")
                    - F.col("exact_pairs").cast("double")
                )
                / F.col("exact_pairs").cast("double"),
                6,
            ).alias("rel_err"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def _profile_key(profile: str) -> Column:
    if profile == "natural":
        return F.col("l_partkey")
    return F.when(
        F.col("l_partkey") % HOT_MOD == 0, F.lit(-1)
    ).otherwise(F.col("l_partkey"))


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for profile in ("natural", "hotkey"):
        cnt = (
            li.select(_profile_key(profile).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        rows = _estimate_rows(cnt, profile)
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("key_profile", "method")


def _profile_sql(profile: str) -> str:
    key = (
        "l_partkey"
        if profile == "natural"
        else f"CASE WHEN l_partkey % {HOT_MOD} = 0 THEN -1"
        " ELSE l_partkey END"
    )
    return f"""
cnt_{profile} AS MATERIALIZED (
    SELECT {key} AS k, CAST(count(*) AS BIGINT) AS d
    FROM lineitem GROUP BY 1
),
tot_{profile} AS MATERIALIZED (
    SELECT sum(CAST(d AS HUGEINT) * d) AS exact_pairs,
           sum(CAST(d AS HUGEINT)) AS n,
           CAST(count(*) AS HUGEINT) AS ndv
    FROM cnt_{profile}
),
heavy_{profile} AS MATERIALIZED (
    SELECT d FROM cnt_{profile} ORDER BY d DESC, k LIMIT {H_HEAVY}
),
ht_{profile} AS MATERIALIZED (
    SELECT coalesce(sum(CAST(d AS HUGEINT) * d), 0) AS head_pairs,
           coalesce(sum(CAST(d AS HUGEINT)), 0) AS head_n,
           CAST(count(*) AS HUGEINT) AS head_k
    FROM heavy_{profile}
),
ests_{profile} AS (
    SELECT exact_pairs,
           exact_pairs AS e_exact,
           CAST(floor(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(ndv AS DOUBLE)) AS HUGEINT) AS e_uniform,
           head_pairs + CASE WHEN ndv - head_k > 0
               THEN CAST(floor(CAST(n - head_n AS DOUBLE)
                               * CAST(n - head_n AS DOUBLE)
                         / CAST(ndv - head_k AS DOUBLE)) AS HUGEINT)
               ELSE 0 END AS e_endbiased
    FROM tot_{profile} CROSS JOIN ht_{profile}
),
rows_{profile} AS (
    SELECT '{profile}' AS key_profile, method,
           CAST(est_pairs AS DOUBLE) AS est_pairs,
           est_pairs < CAST(9007199254740992 AS HUGEINT)
             AS est_pairs_exact,
           floor(abs(CAST(est_pairs AS DOUBLE)
                     - CAST(exact_pairs AS DOUBLE))
                 / CAST(exact_pairs AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS rel_err
    FROM (
        SELECT 'exact' AS method, e_exact AS est_pairs, exact_pairs
        FROM ests_{profile}
        UNION ALL
        SELECT 'uniform_ndv', e_uniform, exact_pairs FROM ests_{profile}
        UNION ALL
        SELECT 'endbiased_h{H_HEAVY}', e_endbiased, exact_pairs
        FROM ests_{profile}
    )
)"""


JOIN_SIZE_ORACLE = f"""WITH {_profile_sql('natural')},
{_profile_sql('hotkey')}
SELECT * FROM rows_natural
UNION ALL
SELECT * FROM rows_hotkey
ORDER BY key_profile, method
"""


def _register() -> None:
    registry.register(
        "join_size_estimate", join_size_estimate, JOIN_SIZE_ORACLE
    )
