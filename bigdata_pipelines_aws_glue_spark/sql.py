"""Raw-SQL entrypoint: register the corpus as temp views and let users
run Spark SQL directly — the engine's equivalent of the reference's
Athena/Redshift query surface (``README.md:13,21``), minus the
control-plane round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_pipelines_aws_glue_spark.sources.readers import TABLES, load_table


def register_corpus_views(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per corpus table (same names the DuckDB oracle
    uses) — after this, any oracle SQL in this repo is *also* runnable
    through ``spark.sql`` modulo engine dialect."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL query; optionally (re)register corpus views first."""
    if sf_dir is not None:
        register_corpus_views(spark, sf_dir)
    return spark.sql(query)
