"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's whole
pipeline, SURVEY.md §3.2) at sf0.001. ``queries()`` registers one
callable per implemented operator from SURVEY.md §2; ``oracle_sql()``
provides the DuckDB twin for each SQL-expressible one.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from bigdata_pipelines_aws_glue_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdata_pipelines_aws_glue_spark.plans.flagship import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return registry.oracle_sql()
