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

from pyspark.sql import DataFrame, SparkSession
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


def _register() -> None:
    registry.register("staged_merge_orders", staged_merge_orders, MERGE_ORACLE)
