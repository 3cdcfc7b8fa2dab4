"""Data-quality profiling and storage-layout operators.

The reference pipeline trusts its inputs blindly (no validation
anywhere in ``glue_job.py``; the catalog DDL at
``redshift_setup.py:209-243`` just declares types) — any production
deployment of it needs exactly these checks in front of the
transform. Both operators are single-pass, partial-aggregatable
DataFrame plans.

Scale posture:
- ``dq_profile``: the per-column null/distinct profile is ONE
  groupBy-free aggregate (map-side combine all the way); the
  orphan-FK check is a broadcast anti-join against the distinct key
  set of the dimension (at 100 TB the dimension key set is still the
  small side; if it weren't, AQE falls back to a shuffled hash join).
- ``zorder_layout_key``: interleaving bits of two low-cardinality
  bucket ids is a pure projection. Writing a table sorted by the
  z-value co-locates rows that are close in BOTH dimensions into the
  same parquet row groups, so min/max row-group stats prune 2-D range
  predicates — the standard lakehouse layout trick for scan-bound
  workloads. The sort itself is the usual global range-partition
  sort; no extra shuffle beyond what any re-layout write pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality report for the orders fact: row count,
    per-column null counts, primary-key duplication, and referential
    orphans against the customer dimension."""
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    orphans = (
        orders.join(
            F.broadcast(cust_keys),
            orders.o_custkey == cust_keys.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphan_custkey"))
    )
    nulls = lambda c: F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")  # noqa: E731
    profile = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct_orderkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_dup_orderkey"),
        nulls("o_custkey"),
        nulls("o_orderdate"),
        nulls("o_totalprice"),
    )
    return profile.crossJoin(F.broadcast(orphans))


DQ_PROFILE_ORACLE = """
SELECT (SELECT count(*) FROM orders) AS n_rows,
       (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct_orderkey,
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_dup_orderkey,
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_o_custkey,
       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS null_o_orderdate,
       (SELECT count(*) FROM orders WHERE o_totalprice IS NULL) AS null_o_totalprice,
       (SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_orphan_custkey
"""

_ZBITS = 10


def _interleave_bits(a: Column, b: Column, bits: int = _ZBITS) -> Column:
    """z = interleave(a, b): bit i of ``a`` lands at 2i+1, bit i of
    ``b`` at 2i. Pure integer expression — codegen-eligible, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            .bitwiseOR(F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i + 1))
            .bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i))
        )
    return z


def _sql_interleave(a: str, b: str, bits: int = _ZBITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) << {i + 1})")
        terms.append(f"(({b} & {1 << i}) << {i})")
    return " | ".join(terms)


def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (customer bucket, price
    bucket): the 2-D clustering key used to sort a table before a
    partitioned write so parquet row-group min/max stats prune range
    predicates on EITHER dimension. Emits per-z-prefix row counts —
    the file-size planning view a layout compactor consumes.
    """
    orders = load_table(spark, sf_dir, "orders")
    ckey = (F.col("o_custkey") % 1024).cast("long")
    pkey = F.floor(F.col("o_totalprice") / F.lit(500.0)).cast("long")
    z = _interleave_bits(ckey, pkey)
    return (
        orders.select(z.alias("zval"))
        .groupBy(F.shiftright(F.col("zval"), 12).alias("z_prefix"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


ZORDER_ORACLE = f"""
WITH z AS (
  SELECT ({_sql_interleave("(o_custkey % 1024)",
                           "CAST(floor(o_totalprice / 500.0) AS BIGINT)")}) AS zval
  FROM orders
)
SELECT zval >> 12 AS z_prefix, count(*) AS n_rows
FROM z GROUP BY 1
"""


def _register() -> None:
    registry.register("dq_profile", dq_profile, DQ_PROFILE_ORACLE)
    registry.register("zorder_layout_key", zorder_layout_key, ZORDER_ORACLE)
