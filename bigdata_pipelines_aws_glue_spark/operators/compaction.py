"""Small-file compaction planning — the OPTIMIZE of a lakehouse table.

Streaming ingestion writes a file per (partition, micro-batch); at
100 TB the resulting millions of kilobyte-files destroy scan
performance (a task per file, a footer fetch per task). Every
lakehouse engine therefore ships a compaction command (Delta/Iceberg
``OPTIMIZE`` / ``rewrite_data_files``); its core is a deterministic
PLAN: group each partition's small files, in order, into target-size
output files.

``compaction_plan`` derives the ingest manifest from the events
table itself — one file per (day, hour) micro-batch, sized at
``ROW_BYTES`` per row (the container has no real multi-file ingest
layout; the planning arithmetic is the operator) — and assigns
output files by the standard next-fit rule: within a partition
(day), files ordered by hour, ``out_file = floor(preceding_bytes /
TARGET_BYTES)``. One window cumsum per partition — no global sort,
no driver loop; the plan's row count is manifest-sized, not
row-sized. The output is the work order a rewrite job executes with
one partitioned read per group.

Everything is exact integer arithmetic; the DuckDB twin hash-checks
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

ROW_BYTES = 64
TARGET_BYTES = 8192


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    manifest = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg((F.count(F.lit(1)) * F.lit(ROW_BYTES)).alias("bytes"))
    w = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = manifest.withColumn(
        "out_file",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0))
            / F.lit(TARGET_BYTES)
        ),
    )
    return (
        assigned.groupBy("day", "out_file")
        .agg(
            F.count(F.lit(1)).alias("n_input_files"),
            F.sum("bytes").alias("out_bytes"),
            F.min("hr").alias("hr_lo"),
            F.max("hr").alias("hr_hi"),
        )
        .orderBy("day", "out_file")
    )


COMPACTION_ORACLE = f"""WITH manifest AS MATERIALIZED (
    SELECT CAST(ts AS DATE) AS day,
           CAST(extract(hour FROM ts) AS BIGINT) AS hr,
           CAST(count(*) * {ROW_BYTES} AS BIGINT) AS bytes
    FROM events GROUP BY 1, 2
),
assigned AS (
    SELECT day, hr, bytes,
           CAST(floor(
               coalesce(sum(bytes) OVER (PARTITION BY day ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {TARGET_BYTES}.0) AS BIGINT) AS out_file
    FROM manifest
)
SELECT day, out_file,
       CAST(count(*) AS BIGINT) AS n_input_files,
       CAST(sum(bytes) AS BIGINT) AS out_bytes,
       min(hr) AS hr_lo, max(hr) AS hr_hi
FROM assigned
GROUP BY 1, 2
ORDER BY day, out_file
"""


def _register() -> None:
    registry.register("compaction_plan", compaction_plan, COMPACTION_ORACLE)
