"""Custom stateful operator tests: batch twin semantics + the
streaming form accumulating state across triggers."""

from __future__ import annotations

import pytest

from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
from bigdata_pipelines_aws_glue_spark.streaming.jobs import read_event_stream
from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
    _fold_ewma,
    ewma_batch,
    ewma_stream,
)


def test_fold_ewma_kernel():
    ewma, anomalies = _fold_ewma([10.0, 10.0, 10.0], None)
    assert ewma == pytest.approx(10.0)
    assert anomalies == 0
    # a 100x spike deviates > 3*|ewma|
    ewma, anomalies = _fold_ewma([10.0, 10.0, 1000.0, 10.0], None)
    assert anomalies >= 1


def test_ewma_batch_per_user(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = ewma_batch(events)
    rows = {r["user_id"]: r for r in out.collect()}
    totals = {
        r["user_id"]: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert {u: r["n_events"] for u, r in rows.items()} == totals


def test_ewma_stream_matches_batch_totals(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(
        events_dir
    )
    stream = read_event_stream(spark, events_dir).drop("event_id")
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ewma_stream").groupBy("user_id").sum("n_events")
    got_totals = {r["user_id"]: r["sum(n_events)"] for r in got.collect()}
    events = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert got_totals == want


def test_ewma_oracle_preconditions_hold_in_corpus(spark, sf_dir):
    """EWMA_ORACLE's bit-exactness assumes no NULL values and unique
    (user_id, ts) — see the oracle comment. Pin both on the frozen
    corpus so a future corpus regeneration that breaks either fails
    loudly here instead of as a silent oracle mismatch."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    assert events.filter(F.col("value").isNull()).count() == 0
    dupes = (
        events.groupBy("user_id", "ts").count().filter(F.col("count") > 1)
    )
    assert dupes.count() == 0
