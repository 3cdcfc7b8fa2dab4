"""Sink operators (SURVEY.md §2.1 S4, §2.11 C3).

The reference writes the final table as Parquet under a
``load_date=<run date>`` Hive partition (``glue_job.py:159-172``) and
relies on Glue job bookmarks for re-run safety (``glue_job.py:181``).
Spark-native equivalent: ``partitionBy("load_date")`` +
``partitionOverwriteMode=dynamic`` so re-running a day is idempotent
(overwrites exactly that partition) — bookmark-equivalence without any
external state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_col: str = "load_date",
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Partitioned columnar sink (S4, ``glue_job.py:159-172``).

    Adds ``load_date = current_date()`` if absent (ingestion-time
    partitioning, ``glue_job.py:159``). ``maxRecordsPerFile`` bounds
    file sizes at scale so a hot partition doesn't produce one giant
    file; with dynamic partition overwrite, re-runs replace only the
    partitions present in ``df``.
    """
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.current_date())
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Format-agnostic sink over Spark's built-in file sources
    (parquet / orc / json / csv). Parquet and ORC are both columnar
    with min/max row-group statistics, so either serves the S4/S5
    contract; JSON/CSV are interchange edges, not analytic storage."""
    df.write.mode(mode).format(format).options(**options).save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted EXTERNAL table (the co-located-join layout):
    rows hash into ``n_buckets`` files per write task on
    ``bucket_col`` and each bucket file is sorted on it, so a join
    between two tables bucketed the SAME way on their join keys needs
    NO Exchange — the shuffle was paid once at write time, which is
    the right trade at 100 TB for any fact table joined repeatedly on
    the same key. The explicit ``path`` keeps the table external
    (metastore entry only — no warehouse-dir write, same constraint
    catalog_rt documents for read-only driver cwds)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(name)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction for a parquet directory (the long-running
    ingestion problem: many tiny files -> NameNode/scan overhead).
    Rewrites to ceil(bytes/target) files; returns the file count.
    At scale, run per partition directory, not on the whole table."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
