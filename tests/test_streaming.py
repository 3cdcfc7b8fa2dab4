"""Structured Streaming tests (SURVEY.md §7 M4): the streaming
operators must agree with their oracle-checked batch twins on the same
input (availableNow trigger = bounded replay)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.events_time import (
    tumbling_window_agg,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
    deduped_stream,
    read_event_stream,
    run_to_memory,
    windowed_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a clean parquet dir (micros
    timestamps) for the streaming file source."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d, ignore_errors=True)
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch_windows(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_to_memory(windowed_counts_stream(stream), "win_stream")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_stream").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_window_agg(batch).collect()
    }
    assert got == want


def test_stream_dedup_within_watermark(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = run_to_memory(deduped_stream(stream), "dedup_stream", "append")
    q.awaitTermination(120)
    out = spark.table("dedup_stream")
    total = out.count()
    distinct_ids = out.select("event_id").distinct().count()
    assert total == distinct_ids > 0


def test_foreach_batch_upsert_converges(spark, sf_dir, tmp_path):
    """The foreachBatch upsert sink must (a) land every key exactly
    once regardless of micro-batch boundaries, and (b) be a no-op when
    the same checkpoint re-processes (exactly-once replay)."""
    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        read_event_stream,
        run_foreach_batch_upsert,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.lit(None).cast("string").alias("props"),
    )
    src = str(tmp_path / "src")
    # two file chunks -> at least two micro-batches under maxFilesPerTrigger
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, src).drop("props").withColumn(
        "props", F.lit(None).cast("string")
    )
    q = run_foreach_batch_upsert(stream, target, ckpt, keys=["event_id"])
    q.awaitTermination(120)

    got = spark.read.parquet(target)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()

    # replay from the same checkpoint: no new batches, table unchanged
    import os

    mtime = max(os.path.getmtime(os.path.join(target, f))
                for f in os.listdir(target))
    stream2 = read_event_stream(spark, src).drop("props").withColumn(
        "props", F.lit(None).cast("string")
    )
    q2 = run_foreach_batch_upsert(stream2, target, ckpt, keys=["event_id"])
    q2.awaitTermination(120)
    mtime2 = max(os.path.getmtime(os.path.join(target, f))
                 for f in os.listdir(target))
    assert spark.read.parquet(target).count() == events.count()
    assert mtime2 == mtime  # nothing rewritten

    # late corrections arrive: same keys, new values -> the MERGE path
    # (target exists) must update in place, not append
    corrections = events.filter(F.col("event_id") < 100).withColumn(
        "value", F.col("value") + 1000.0
    )
    corrections.coalesce(1).write.mode("append").parquet(src)
    stream3 = read_event_stream(spark, src).drop("props").withColumn(
        "props", F.lit(None).cast("string")
    )
    q3 = run_foreach_batch_upsert(stream3, target, ckpt, keys=["event_id"])
    q3.awaitTermination(120)
    got3 = spark.read.parquet(target)
    assert got3.count() == events.count()  # upsert, not append
    assert got3.filter(
        (F.col("event_id") < 100) & (F.col("value") < 1000.0)
    ).count() == 0  # every corrected key carries the new value
