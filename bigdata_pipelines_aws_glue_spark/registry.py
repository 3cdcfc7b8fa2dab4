"""Central query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible,
the equivalent DuckDB SQL. Column names/aliases must match exactly
between the two (driver hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        FLAGSHIP_ORACLE_SQL,
        flagship_query,
    )

    register("flagship_pipeline", flagship_query, FLAGSHIP_ORACLE_SQL)

    operator_modules = [
        "aggregates",
        "sort",
        "windows",
        "joins",
        "setops",
        "merge",
        "events_time",
        "dedup",
        "clustering",
        "curation",
        "text",
        "similarity",
        "multimodal",
        "sampling",
        "scalars",
        "subqueries",
        "tpch_extra",
        "quality",
        "timeseries",
        "corpus_stats",
        "trends",
    ]
    for mod_name in operator_modules:
        mod = importlib.import_module(
            f"bigdata_pipelines_aws_glue_spark.operators.{mod_name}"
        )
        mod._register()

    # custom stateful operator (batch twin; the streaming form is
    # exercised in tests/test_stateful.py)
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import ewma_batch

    register(
        "ewma_anomaly_per_user",
        lambda spark, sf_dir: ewma_batch(load_table(spark, sf_dir, "events")),
        None,
    )
    _LOADED = True
