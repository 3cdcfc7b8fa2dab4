"""Warehouse JDBC bulk load / parallel read (SURVEY.md §2.1 S8).

The reference stages parquet to object storage and issues a bulk COPY
into the warehouse over a JDBC connection (redshift_setup.py:175-196:
``COPY {table} FROM '{s3_path}' ... FORMAT AS PARQUET``), with table
DDL managed separately (redshift_setup.py:31-121). Spark-native
equivalent: ``df.write.jdbc`` — each partition opens one connection and
streams batched INSERTs, so the "bulk" parallelism is the DataFrame's
partitioning rather than a warehouse-side COPY fan-in; reads
partition on a numeric/date column so each executor pulls a slice.

No warehouse endpoint exists in this container, so tests exercise the
full path against Derby, the embedded JDBC engine Spark itself ships
(derby-*.jar is on every executor classpath already — zero install).
Swapping the URL/driver retargets any JDBC warehouse; sizing guidance
for a real one at scale:

- write: ``coalesce`` to O(100) partitions first (one connection
  each), ``batchsize`` >= 10k; never 10k connections from 10k tasks.
- read: always pass ``partition_column`` + bounds; an unpartitioned
  read is a single-connection, single-task scan — the JDBC version of
  the single-partition sort this repo's plan audit bans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Derby's embedded driver — in-JVM database, no network (test target)
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def bulk_load_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    batch_size: int = 10_000,
    write_partitions: int | None = None,
) -> None:
    """S8: bulk-load a DataFrame into a warehouse table over JDBC.

    ``write_partitions`` bounds the connection count (each output
    partition holds one connection for its duration); ``batch_size``
    rows are sent per executeBatch round-trip.
    """
    if write_partitions is not None:
        df = df.coalesce(write_partitions)
    w = (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .option("isolationLevel", "READ_COMMITTED")
    )
    if driver:
        w = w.option("driver", driver)
    w.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Parallel JDBC scan: with ``partition_column`` + bounds, Spark
    issues ``num_partitions`` range-predicated queries concurrently
    (the JDBC analogue of partition pruning); without, a single
    connection streams the whole table — acceptable only for dims."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetch_size)
    )
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return r.load()
