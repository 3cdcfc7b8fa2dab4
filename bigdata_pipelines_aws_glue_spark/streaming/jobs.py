"""Streaming jobs over the events schema (SURVEY.md §2.9).

Design rule: zero duplicated aggregation logic. The window/session
expression builders live in ``operators.events_time`` and are applied
verbatim to a streaming DataFrame — only the read edge (``readStream``
+ watermark) and write edge (``writeStream``) differ. At scale this is
the standard lambda-free architecture: one code path, replayable over
history (batch) or live (stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bigdata_pipelines_aws_glue_spark.operators.events_time import (
    tumbling_window_agg,
)

#: Events schema for the streaming reader (streams cannot infer).
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "30 minutes",
    fmt: str = "parquet",
) -> DataFrame:
    """readStream over a file source with a watermark for late data.
    File sources give exactly-once replay; at scale swap ``fmt`` for
    kafka — everything downstream is unchanged."""
    stream = (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(input_dir)
    )
    return stream.withWatermark("ts", watermark)


def windowed_counts_stream(
    events: DataFrame, window_duration: str = "10 minutes"
) -> DataFrame:
    """The SAME tumbling-window aggregation as the batch operator
    (oracle-checked there); under a stream it runs incrementally with
    watermark-based state eviction."""
    return tumbling_window_agg(events, window_duration)


def deduped_stream(events: DataFrame) -> DataFrame:
    """Exactly-once event feed: drop duplicate event_ids arriving
    within the watermark — the streaming form of N1 exact dedup."""
    return events.dropDuplicatesWithinWatermark(["event_id"])


def sessionized_stream(
    events: DataFrame, gap: str = "4 hours"
) -> DataFrame:
    """Streaming session windows (same gap semantics as the batch
    ``events_sessionize`` operator)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Test/debug sink: process all available input once (availableNow)
    into an in-memory table named ``query_name``."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def run_foreach_batch_upsert(
    df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    keys: list[str],
) -> StreamingQuery:
    """CDC-style sink: merge each micro-batch into a parquet target
    with ``staged_merge`` (keyed upsert), the ``foreachBatch`` pattern
    for sinks without native MERGE. Exactly-once under replay: the
    checkpoint records committed batch ids, and a re-delivered batch
    re-merges the same keys — a keyed upsert is idempotent, so the
    rewrite converges to the same table either way.

    The merge materializes into a staging directory and atomically
    renames over the target (write-then-swap) — the parquet-only
    analogue of a transactional MERGE; readers never observe a
    half-written table. At 100 TB the swap unit would be a partition
    directory, not the whole table, with the same mechanics.
    """
    import os
    import shutil

    from bigdata_pipelines_aws_glue_spark.operators.merge import staged_merge

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(keys)
        has_target = os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        )
        merged = (
            staged_merge(spark.read.parquet(target_dir), batch_df, keys)
            if has_target
            else batch_df
        )
        staging = target_dir.rstrip("/") + f"._staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(target_dir):
            shutil.rmtree(target_dir)
        os.rename(staging, target_dir)

    return (
        df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_parquet(
    df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Production sink: parquet + checkpoint (exactly-once file sink).
    With ``append`` mode, windows emit once their watermark passes."""
    return (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
