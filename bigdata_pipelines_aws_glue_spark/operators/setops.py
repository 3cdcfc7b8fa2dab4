"""Set operations (SURVEY.md §2.7).

Not present in the reference; required by the engine surface (and the
S10 staged merge uses anti-join + union). ANSI semantics: UNION /
INTERSECT / EXCEPT deduplicate; *_ALL variants keep multiplicity.
All compile to hash-based distinct/joins — shuffle on the full row,
so project to the minimal column set first (done below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def _branches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_nationkey"
    )
    b = cust.filter(F.col("c_acctbal") > 5000.0).select("c_custkey", "c_nationkey")
    return a, b


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _branches(spark, sf_dir)
    return a.union(b).distinct()


UNION_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _branches(spark, sf_dir)
    return a.intersect(b)


INTERSECT_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _branches(spark, sf_dir)
    return a.exceptAll(b).distinct()


EXCEPT_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def union_all_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with by-name column resolution (`unionByName`) — the
    schema-safe concatenation used by S10 and multi-source ingestion."""
    a, b = _branches(spark, sf_dir)
    return a.unionByName(b.select("c_nationkey", "c_custkey"))


UNION_ALL_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _branches(spark, sf_dir)
    return a.intersectAll(b)


INTERSECT_ALL_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT ALL
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _branches(spark, sf_dir)
    return a.exceptAll(b)


EXCEPT_ALL_ORACLE = """
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0
"""


def _register() -> None:
    registry.register("set_union", set_union, UNION_ORACLE)
    registry.register("set_intersect", set_intersect, INTERSECT_ORACLE)
    registry.register("set_except", set_except, EXCEPT_ORACLE)
    registry.register("union_all_by_name", union_all_by_name, UNION_ALL_ORACLE)
    registry.register("set_intersect_all", set_intersect_all, INTERSECT_ALL_ORACLE)
    registry.register("set_except_all", set_except_all, EXCEPT_ALL_ORACLE)
