"""Staged merge / upsert (SURVEY.md §2.1 S10).

The reference ships the design as a comment (``redshift_setup.py:
190-194``): staging table → COPY → DELETE matching keys from target →
INSERT from staging. Plain-Spark equivalent (no Delta/Iceberg
dependency): ``target ANTI-JOIN staging ∪ staging`` — staging rows win
on key collision, unmatched target rows survive.

Scale: the anti-join shuffles on the merge key (or broadcasts a small
staging side); combined with dynamic partition overwrite this gives
idempotent incremental loads — the Spark-native replacement for both
the Redshift staging dance and Glue job bookmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def staged_merge(
    target: DataFrame, staging: DataFrame, keys: list[str]
) -> DataFrame:
    """Upsert ``staging`` into ``target`` on ``keys`` (S10,
    redshift_setup.py:190-194)."""
    surviving = target.join(staging, on=keys, how="left_anti")
    return surviving.unionByName(staging)


def staged_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 demo: re-price every 10th order (+10%) and merge back."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    staging = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", stable_round(F.col("o_totalprice") * 1.1, 2)
    )
    merged = staged_merge(orders, staging, ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", stable_round("o_totalprice", 2).alias("o_totalprice")
    )


MERGE_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
staging AS (
    SELECT o_orderkey, o_orderstatus, floor((o_totalprice * 1.1) * 100.0 + 0.5) / 100.0 AS o_totalprice
    FROM target WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_orderstatus, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS o_totalprice FROM (
    SELECT t.* FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT * FROM staging
)
"""


def merge_aggregate_delta(
    base_agg: DataFrame, delta_agg: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental view maintenance for a SUM/COUNT aggregate: merge a
    delta batch's partial aggregate into the maintained aggregate by
    full-outer join on the group keys and null-safe addition of every
    measure column. Cost is O(|delta| + |affected groups|) — the base
    FACT table is never rescanned, which is the whole point at 100 TB
    (a late-arriving batch costs minutes, not a full-corpus pass).
    SUM/COUNT are self-maintainable measures; MIN/MAX/DISTINCT need
    auxiliary state and are out of scope here."""
    measures = [c for c in base_agg.columns if c not in keys]
    joined = base_agg.alias("b").join(delta_agg.alias("d"), keys, "full_outer")
    return joined.select(
        *[F.col(k) for k in keys],
        *[
            (
                F.coalesce(F.col(f"b.{m}"), F.lit(0))
                + F.coalesce(F.col(f"d.{m}"), F.lit(0))
            ).alias(m)
            for m in measures
        ],
    )


def incremental_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance demo on the hard signal: the monthly
    revenue aggregate is first built WITHOUT the late batch (every
    order with ``o_orderkey % 10 == 7`` held back), then the late
    batch's partial aggregate is merged in via
    :func:`merge_aggregate_delta`. The DuckDB twin computes the same
    aggregate over ALL orders in one pass, so a hash match proves the
    incremental path is exactly equivalent to the full recompute —
    the invariant an incremental pipeline must hold. Money sums as
    exact cents (LONG both engines)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    month = F.trunc(F.col("o_orderdate"), "month").alias("month")
    cents = F.sum(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    ).cast("long")
    is_late = F.col("o_orderkey") % 10 == 7

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            cents.alias("revenue_cents"),
        )

    base = agg(orders.filter(~is_late))
    delta = agg(orders.filter(is_late))
    return merge_aggregate_delta(base, delta, ["month"])


INCREMENTAL_AGG_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
"""


def cdc_apply(
    changelog: DataFrame, key: str, seq: str, op: str = "op"
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete rows with a
    monotone per-key sequence number) to produce the current table
    state: latest-sequence-wins per key, then drop keys whose latest
    op is a delete.

    The changelog arrives in ARBITRARY order (late/out-of-order
    deliveries are the norm for log-based CDC), so correctness cannot
    depend on ingest order — only on ``seq``. One hash shuffle on the
    key; the ``row_number`` window never materializes more than one
    key's ops per task, so the pattern holds for a 100 TB changelog
    as long as per-key op counts are bounded (they are: CDC compaction
    upstream caps them). ``max_by``-style argmax would also work but
    a window keeps every column of the winning op without a struct
    repack."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col(op) != F.lit("D")).drop(op, seq)


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC end-to-end on the hard signal: a deterministic changelog is
    synthesized from ``orders`` — every key gets an INSERT (seq 1),
    every 3rd key an UPDATE (+500 cents, seq 3), every 7th key a
    DELETE (seq 2). The DELETE deliberately carries a LOWER sequence
    than the UPDATE, so keys divisible by 21 exercise the
    out-of-order resurrection case: the seq-3 update supersedes the
    seq-2 delete and the row SURVIVES. Output: per-status live-row
    count, survivors-that-were-updated count, and exact-cents revenue
    (decimal(38,0)-carried sum, double-exact below 2^53).

    The reference's merge design (redshift_setup.py:190-194) only
    upserts; log-based CDC adds deletes and out-of-order sequencing,
    which this operator pins cross-engine."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    inserts = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "cents",
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("cents") + F.lit(500)).alias("cents"),
        F.lit("U").alias("op"),
        F.lit(3).alias("seq"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(None).cast("long").alias("cents"),
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    log = inserts.unionByName(updates).unionByName(deletes)
    live = cdc_apply(log, key="o_orderkey", seq="seq").withColumn(
        "was_updated", (F.col("o_orderkey") % 3 == 0).cast("int")
    )
    return live.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("was_updated").cast("long").alias("n_updated"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("double")
        .alias("revenue_cents"),
    )


CDC_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
),
log AS (
    SELECT o_orderkey, o_orderstatus, cents, 'I' AS op, 1 AS seq FROM base
    UNION ALL
    SELECT o_orderkey, o_orderstatus, cents + 500, 'U', 3 FROM base
    WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, NULL, 'D', 2 FROM base
    WHERE o_orderkey % 7 = 0
),
latest AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
    FROM log
)
SELECT o_orderstatus,
       count(*) AS n_live,
       CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_updated,
       CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS revenue_cents
FROM latest
WHERE rn = 1 AND op <> 'D'
GROUP BY o_orderstatus
"""


def snapshot_diff(
    base: DataFrame, current: DataFrame, key: str, compare: list[str]
) -> DataFrame:
    """Table-version diff (the lakehouse snapshot-compare primitive —
    what Delta/Iceberg surface as CDF, reduced to plain Spark): full
    outer join on the key, classify every key as added / removed /
    changed / unchanged by comparing the ``compare`` columns
    null-safely. One keyed shuffle of each side; the output is
    row-per-key, so callers aggregate it into audit counts."""
    # presence flags come from sentinel columns, not payload nulls —
    # a NULL payload value must not read as "row absent"
    b = base.select(
        key,
        F.lit(1).alias("__in_b"),
        *[F.col(x).alias(f"__b_{x}") for x in compare],
    )
    c = current.select(
        key,
        F.lit(1).alias("__in_c"),
        *[F.col(x).alias(f"__c_{x}") for x in compare],
    )
    j = b.join(c, key, "full_outer")
    same = F.lit(True)
    for x in compare:
        same = same & F.col(f"__b_{x}").eqNullSafe(F.col(f"__c_{x}"))
    status = (
        F.when(F.col("__in_b").isNull(), F.lit("added"))
        .when(F.col("__in_c").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.withColumn("diff_status", status)


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: diff the orders snapshot against a
    deterministically-edited v2 (every 97th key removed, every 13th
    surviving key re-priced +100 cents, every 89th key mirrored to a
    disjoint id range as an insert), then roll the row-level diff
    into the audit summary: counts per status + the exact total
    absolute repricing delta (cents, LONG — bounded by 100 *
    n_changed)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    surviving = orders.filter(F.col("o_orderkey") % 97 != 0)
    repriced = surviving.withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("cents") + 100
        ).otherwise(F.col("cents")),
    )
    inserts = orders.filter(F.col("o_orderkey") % 89 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000_000)).alias("o_orderkey"),
        "o_orderstatus",
        "cents",
    )
    v2 = repriced.unionByName(inserts)
    d = snapshot_diff(
        orders, v2, "o_orderkey", ["o_orderstatus", "cents"]
    )
    return (
        d.groupBy("diff_status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(
                F.when(
                    F.col("diff_status") == "changed",
                    F.abs(F.col("__c_cents") - F.col("__b_cents")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("abs_cents_delta"),
        )
        .orderBy("diff_status")
    )


SNAPSHOT_DIFF_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
),
v2 AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 13 = 0 THEN cents + 100 ELSE cents END
               AS cents
    FROM base WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000000, o_orderstatus, cents
    FROM base WHERE o_orderkey % 89 = 0
),
d AS (
    SELECT CASE
             WHEN b.o_orderkey IS NULL THEN 'added'
             WHEN c.o_orderkey IS NULL THEN 'removed'
             WHEN b.o_orderstatus IS NOT DISTINCT FROM c.o_orderstatus
              AND b.cents IS NOT DISTINCT FROM c.cents THEN 'unchanged'
             ELSE 'changed'
           END AS diff_status,
           CASE WHEN b.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL
                THEN abs(c.cents - b.cents) ELSE 0 END AS delta
    FROM base b FULL OUTER JOIN v2 c ON b.o_orderkey = c.o_orderkey
)
SELECT diff_status,
       count(*) AS n_keys,
       CAST(sum(CASE WHEN diff_status = 'changed' THEN delta ELSE 0 END)
            AS BIGINT) AS abs_cents_delta
FROM d
GROUP BY diff_status
ORDER BY diff_status
"""


def _register() -> None:
    registry.register("staged_merge_orders", staged_merge_orders, MERGE_ORACLE)
    registry.register(
        "snapshot_diff_orders", snapshot_diff_orders, SNAPSHOT_DIFF_ORACLE
    )
    registry.register(
        "incremental_monthly_revenue",
        incremental_monthly_revenue,
        INCREMENTAL_AGG_ORACLE,
    )
    registry.register("cdc_apply_changes", cdc_apply_changes, CDC_ORACLE)
