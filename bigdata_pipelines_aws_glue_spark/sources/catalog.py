"""Catalog / DDL layer (SURVEY.md §2.1 S5-S10).

The reference drives the AWS Glue Data Catalog + Athena over HTTPS
with client-side polling: idempotent database creation
(``redshift_setup.py:31-46``), external Parquet table create/update
(``redshift_setup.py:48-93``), ``MSCK REPAIR TABLE`` via Athena
(``redshift_setup.py:95-121``), and a commented Redshift DDL/COPY
path (``redshift_setup.py:125-196``). All of it collapses into
synchronous ``spark.sql`` DDL against the session catalog — same
semantics, no control-plane round-trips, no poll loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_DATABASE = "ecommerce_db"


def create_database(spark: SparkSession, name: str = DEFAULT_DATABASE) -> None:
    """S6: idempotent database creation (redshift_setup.py:31-46 —
    the get/except/create dance becomes IF NOT EXISTS)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def register_external_table(
    spark: SparkSession,
    table: str,
    location: str,
    database: str = DEFAULT_DATABASE,
    partition_cols: tuple[str, ...] = ("load_date",),
) -> None:
    """S5: external Parquet table over an existing directory
    (redshift_setup.py:48-93: SerDe/input-output formats/classification
    are all implied by USING PARQUET). Schema is inferred from the
    files; partition columns are discovered from the Hive layout."""
    create_database(spark, database)
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
    spark.sql(
        f"CREATE TABLE {database}.{table} USING PARQUET LOCATION '{location}'"
    )
    # partitions of an existing Hive layout are not visible until
    # discovered (the reference's Athena MSCK step, S7)
    repair_partitions(spark, table, database)


def repair_partitions(
    spark: SparkSession, table: str, database: str = DEFAULT_DATABASE
) -> None:
    """S7: partition discovery. The reference submits MSCK to Athena
    and polls every 5s (redshift_setup.py:109-117); Spark's is
    synchronous."""
    spark.sql(f"MSCK REPAIR TABLE {database}.{table}")


def save_as_managed_table(
    df: DataFrame,
    table: str,
    database: str = DEFAULT_DATABASE,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """S9 equivalent: warehouse table via ``saveAsTable`` (the
    commented Redshift CREATE TABLE + COPY, redshift_setup.py:152-196,
    as one idempotent write)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    create_database(spark, database)
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
    # a crashed/previous session can leave the managed location behind
    # with no table over it; Spark then refuses to create (42710)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    leftover = f"{warehouse}/{database}.db/{table}"
    shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode(mode).format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(f"{database}.{table}")
