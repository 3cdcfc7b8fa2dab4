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
