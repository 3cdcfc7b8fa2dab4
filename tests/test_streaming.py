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


def test_flagship_stream_crash_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Verdict r1 #8: the reference pipeline as a file-source stream
    must survive a mid-stream crash with exactly-once output. The
    crash is injected AFTER batch 1's files are written but BEFORE its
    checkpoint commit — the worst-case window — so the restart
    re-delivers batch 1 and the idempotent batch_id=N overwrite must
    converge, not duplicate. Final output is compared row-for-row
    against the oracle-checked batch flagship on the same input."""
    from pyspark.sql.streaming import StreamingQueryException

    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        flagship_query,
        synth_currency_rates,
        synth_product_categories,
        synth_transactions,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        flagship_stream,
        read_transaction_stream,
        run_batch_id_sink,
    )

    src = str(tmp_path / "tx_src")
    synth_transactions(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    rates = synth_currency_rates(spark, sf_dir)
    categories = synth_product_categories(spark, sf_dir)
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: crashes mid-stream (>=4 files x maxFilesPerTrigger=1 ->
    # batch 1 exists), after write, before commit
    out = flagship_stream(
        read_transaction_stream(spark, src, schema), rates, categories
    )
    q = run_batch_id_sink(out, target, ckpt, fail_at_batch=1)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)

    # run 2: clean restart from the same checkpoint
    out2 = flagship_stream(
        read_transaction_stream(spark, src, schema), rates, categories
    )
    q2 = run_batch_id_sink(out2, target, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(target).drop("batch_id")
    want = flagship_query(spark, sf_dir)
    assert got.count() == want.count()
    # no replay duplicates: same id multiset as batch (corpus itself
    # holds one genuinely duplicated lineitem row, so compare distinct
    # to distinct, and multiset equality below catches the rest)
    assert (
        got.select("transaction_id").distinct().count()
        == want.select("transaction_id").distinct().count()
    )
    # full value equality (both directions of EXCEPT are empty)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


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


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    """The watermarked stream-stream interval join must emit exactly
    the batch interval-join pairs on a bounded replay (inner join +
    availableNow: every pair's click and purchase both arrive, so no
    watermark-dropped rows on this corpus)."""
    from bigdata_pipelines_aws_glue_spark.operators.events_time import (
        events_click_to_purchase,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        click_purchase_join_stream,
    )

    joined = click_purchase_join_stream(spark, events_dir)
    q = run_to_memory(joined, "cp_stream", "append")
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table("cp_stream").collect()
    }
    want = {
        (r["click_id"], r["purchase_id"])
        for r in events_click_to_purchase(spark, sf_dir).collect()
    }
    assert want, "corpus should produce click->purchase pairs"
    assert got == want


def test_watermark_drops_late_event(spark, tmp_path):
    """Append-mode semantics under late data: once the watermark has
    passed a window's end (and a subsequent batch has run — Spark
    applies the late filter from the NEXT batch after the advance), a
    straggler row for that window must be dropped, and the emitted
    aggregate must count only the on-time rows. Three single-file
    micro-batches: 1) on-time rows + a 12:00 row that advances the
    watermark to 11:30, 2) an unrelated current row, 3) the too-late
    10:02 straggler."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        read_event_stream,
        windowed_counts_stream,
    )

    events_dir = tmp_path / "late_events"
    events_dir.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(events_dir / name))

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file("a", [
        (1, t(10, 1), 1, "click", 1.0, "{}"),
        (2, t(10, 4), 1, "click", 1.0, "{}"),
        (3, t(12, 0), 1, "click", 1.0, "{}"),
    ])
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    write_file("b", [(5, t(12, 1), 1, "view", 1.0, "{}")])
    time.sleep(1.1)
    write_file("c", [(4, t(10, 2), 1, "click", 1.0, "{}")])

    stream = read_event_stream(
        spark, str(events_dir) + "/*", max_files_per_trigger=1
    )
    q = (
        windowed_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        (p["stateOperators"][0]["numRowsDroppedByWatermark"]
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the straggler was refused by the watermark
    out = {
        r.window_start: r.n_events
        for r in spark.table("late_drop")
        .filter(F.col("event_type") == "click")
        .collect()
    }
    # the finalized 10:00 window counts ONLY the two on-time rows
    assert out.get(t(10, 0)) == 2
    # the 12:00 window never fired (watermark never passed its end)
    assert t(12, 0) not in out


def test_streaming_observed_metrics_report_scan_totals(
    spark, sf_dir, events_dir
):
    """observe() on a STREAMING source: per-batch observed metrics
    arrive through StreamingQueryProgress (the listener-bus channel a
    monitoring stack consumes) and their totals must equal the real
    input — the streaming twin of observed_metrics_q6's batch path."""
    stream = read_event_stream(spark, events_dir).drop("event_id")
    observed = stream.observe(
        "scan_metrics", F.count(F.lit(1)).alias("n_rows")
    )
    q = (
        observed.groupBy("user_id")
        .count()
        .writeStream.format("memory")
        .queryName("obs_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = sum(
        p["observedMetrics"]["scan_metrics"]["n_rows"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("scan_metrics")
    )
    want = load_table(spark, sf_dir, "events").count()
    assert seen == want
    got = spark.table("obs_stream").agg(F.sum("count")).collect()[0][0]
    assert got == want


@pytest.fixture(scope="module")
def docs_dir(spark, sf_dir, tmp_path_factory):
    """Documents re-materialized as a multi-file parquet dir so the
    crawl stream sees several micro-batches."""
    d = str(tmp_path_factory.mktemp("docs_stream"))
    shutil.rmtree(d, ignore_errors=True)
    load_table(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_url_dedup_matches_batch(spark, sf_dir, docs_dir):
    """The streaming URL dedup agrees with the oracle-checked batch
    operator on the kept canonical-URL SET (the kept doc per URL is
    arrival-order-dependent in the stream, min-doc_id in the batch —
    the set is the contract both share)."""
    from bigdata_pipelines_aws_glue_spark.operators.urls import (
        canonical_url,
        synth_crawl_url,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        read_document_stream,
        url_deduped_stream,
    )

    stream = read_document_stream(spark, docs_dir)
    q = run_to_memory(
        url_deduped_stream(stream), "url_dedup_stream", "append"
    )
    q.awaitTermination(120)
    out = spark.table("url_dedup_stream")
    total = out.count()
    got_urls = {
        r["canonical_url"]
        for r in out.select("canonical_url").distinct().collect()
    }
    # exactly one row per canonical URL
    assert total == len(got_urls) > 0
    batch = load_table(spark, sf_dir, "documents").select(
        canonical_url(synth_crawl_url(F.col("doc_id"))).alias("u")
    )
    want_urls = {r["u"] for r in batch.distinct().collect()}
    assert got_urls == want_urls


def test_stream_frontier_refs_matches_batch(spark, sf_dir, docs_dir):
    """The streaming link-demand aggregation agrees EXACTLY with the
    batch equivalent: same (window, host, url, n_refs) multiset —
    windowed counts are arrival-order independent, so unlike the
    dedup stream the full rows match, not just a key set."""
    from bigdata_pipelines_aws_glue_spark.operators.links import (
        _HOST_RE,
        _http_links,
        synth_linked_html,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.jobs import (
        CRAWL_EPOCH,
        frontier_refs_stream,
        read_document_stream,
    )

    # complete mode: append emission waits for the watermark to pass
    # each window's end, and availableNow leaves the trailing windows
    # (everything inside the 4h horizon) in state — complete exposes
    # the full aggregate state, which is the parity contract here;
    # production uses append and emits each window once it closes
    stream = read_document_stream(spark, docs_dir)
    q = run_to_memory(
        frontier_refs_stream(stream), "frontier_refs_stream", "complete"
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["host"], r["url"], r["n_refs"])
        for r in spark.table("frontier_refs_stream").collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    html = synth_linked_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    batch = (
        docs.select(
            F.timestamp_seconds(
                F.lit(CRAWL_EPOCH) + F.col("doc_id")
            ).alias("fetch_ts"),
            F.explode(_http_links(html)).alias("url"),
        )
        .select(
            F.window("fetch_ts", "10 minutes").alias("w"),
            F.regexp_extract(F.col("url"), _HOST_RE, 1).alias("host"),
            "url",
        )
        .groupBy("w", "host", "url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
        .select(F.col("w.start").alias("ws"), "host", "url", "n_refs")
    )
    want = {
        (r["ws"], r["host"], r["url"], r["n_refs"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
    # the hash-oracled registry twin agrees too, modulo the epoch
    # conversion (window_epoch = epoch second of window.start)
    import calendar

    from bigdata_pipelines_aws_glue_spark.operators.crawlloop import (
        frontier_refs_windowed,
    )

    twin = {
        (r["window_epoch"], r["host"], r["url"], r["n_refs"])
        for r in frontier_refs_windowed(spark, sf_dir).collect()
    }
    got_epochs = {
        (calendar.timegm(ws.utctimetuple()), h, u, n)
        for ws, h, u, n in got
    }
    assert twin == got_epochs
