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


def test_fold_cusum_kernel():
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        CUSUM_H,
        CUSUM_MU,
        _fold_cusum,
    )

    # at-target stream never alarms and both sides stay at 0
    s_pos, s_neg, alarms = _fold_cusum([CUSUM_MU] * 50)
    assert (s_pos, s_neg, alarms) == (0.0, 0.0, 0)
    # sustained upward drift crosses h, alarms once, and resets
    s_pos, s_neg, alarms = _fold_cusum([CUSUM_MU + 100.0] * 7)
    assert alarms >= 1
    assert s_pos <= CUSUM_H
    # sustained downward drift fires the negative side (values may go
    # below zero in the kernel even though corpus values don't)
    _, _, alarms_dn = _fold_cusum([CUSUM_MU - 100.0] * 7)
    assert alarms_dn >= 1


def test_cusum_state_carries_across_trigger_splits():
    """Splitting one stream across two folds with carried state must
    equal one fold over the concatenation — the property that makes
    the streaming form (state across micro-batches) correct."""
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import _fold_cusum

    vals = [120.0, 140.0, 30.0, 160.0, 10.0, 150.0, 90.0, 200.0]
    whole = _fold_cusum(vals)
    s_pos, s_neg, a1 = _fold_cusum(vals[:3])
    s_pos, s_neg, a2 = _fold_cusum(vals[3:], s_pos, s_neg)
    assert (s_pos, s_neg, a1 + a2) == whole


def test_cusum_batch_alarms_on_corpus(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import cusum_batch

    events = load_table(spark, sf_dir, "events")
    rows = cusum_batch(events).collect()
    totals = {
        r["user_id"]: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert {r["user_id"]: r["n_events"] for r in rows} == totals
    # the corpus value tail genuinely drifts past h somewhere
    assert sum(r["n_alarms"] for r in rows) > 0
    assert all(r["s_pos"] >= 0.0 and r["s_neg"] >= 0.0 for r in rows)


def test_cusum_stream_matches_batch(spark, sf_dir, tmp_path):
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        cusum_batch,
        cusum_stream,
    )

    events_dir = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(
        events_dir
    )
    stream = read_event_stream(spark, events_dir).drop("event_id")
    q = (
        cusum_stream(stream)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("cusum_stream").groupBy("user_id").sum(
        "n_events", "n_alarms"
    )
    got_rows = {
        r["user_id"]: (r["sum(n_events)"], r["sum(n_alarms)"])
        for r in got.collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["n_alarms"])
        for r in cusum_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert got_rows == want


def test_session_batch_equals_builtin_session_window(spark, sf_dir):
    """The custom stateful fold must agree EXACTLY with Spark's
    built-in session_window (same gap) — row-for-row, including the
    quantized sums."""
    from bigdata_pipelines_aws_glue_spark.operators.events_time import (
        events_sessionize,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        session_batch,
    )

    events = load_table(spark, sf_dir, "events")
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in session_batch(events).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in events_sessionize(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_session_stream_timeout_closes_sessions(spark, sf_dir, tmp_path):
    """The EventTimeTimeout path, driven by a REAL stream: closed
    sessions (in-batch gap or watermark timeout) must each appear
    exactly once and match the batch fold; sessions still open at
    stream end (watermark never passed last+gap) are the only ones
    missing."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        SESSION_GAP_S,
        session_batch,
        session_stream,
    )

    events_dir = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(
        events_dir
    )
    stream = read_event_stream(spark, events_dir, watermark="30 minutes")
    q = (
        session_stream(stream)
        .writeStream.format("memory")
        .queryName("session_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in spark.table("session_stream").collect()
    }
    assert len(got) == len(spark.table("session_stream").collect())  # unique

    events = load_table(spark, sf_dir, "events")
    batch = session_batch(events).collect()
    all_sessions = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in batch
    }
    # every emitted session is a true session
    assert got <= all_sessions
    # the only missing ones are open tails: sessions whose end is
    # within gap+watermark of the stream's max event time
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon_s = SESSION_GAP_S + 30 * 60
    missing = all_sessions - got
    # independent session-end reconstruction: any session whose END is
    # older than max_ts - (gap + watermark) had its timeout fire and
    # MUST have been emitted — only open tails may be missing
    ends = {}
    per_user: dict = {}
    for r in events.select("user_id", "ts").collect():
        per_user.setdefault(r.user_id, []).append(r.ts)
    for user_id, tss in per_user.items():
        tss.sort()
        start = last = tss[0]
        for ts in tss[1:]:
            if (ts - last).total_seconds() > SESSION_GAP_S:
                ends[(user_id, start)] = last
                start = ts
            last = ts
        ends[(user_id, start)] = last
    for user_id, start, _n, _s in missing:
        end = ends[(user_id, start)]
        assert (max_ts - end).total_seconds() <= horizon_s, (
            f"closed session not emitted: user {user_id} start {start}"
        )
    # and the vast majority of sessions must have closed + emitted
    assert len(got) > 0.5 * len(all_sessions), (
        f"only {len(got)}/{len(all_sessions)} sessions emitted"
    )


def test_session_stream_out_of_order_across_batches(spark, tmp_path):
    """Pin the EventTimeTimeout semantics at the edges with a
    hand-built 3-batch fixture (maxFilesPerTrigger=1, strictly
    increasing mtimes => one file per micro-batch, watermark advances
    between batches):

    - batch 2 delivers LATE-BUT-WITHIN-WATERMARK events: one BEFORE
      u1's open-session start (must lower session_start via the
      min-merge) and one before u2's last event (must NOT regress
      last_us -- the old regression would make u2's later in-gap
      event look > gap away and wrongly split the session);
    - batch 3 delivers a late event PAST the watermark (must be
      dropped: u1's session times out with n=3, not 4).

    Gap = 4 h, watermark = 30 min."""
    import os

    import pandas as pd
    from pyspark.sql import Row

    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        SESSION_GAP_S,
        session_stream,
    )

    T = pd.Timestamp
    gap_s = SESSION_GAP_S
    assert gap_s == 4 * 3600  # fixture timestamps assume the 4 h gap
    batches = [
        # batch 1: open sessions for u1 [10:00:00..10:00:10] and u2
        # [10:00:10]; watermark after = 09:30:10
        [
            (1, T("2024-01-01 10:00:00"), 1.0),
            (1, T("2024-01-01 10:00:10"), 2.0),
            (2, T("2024-01-01 10:00:10"), 1.0),
        ],
        # batch 2: late-but-within-watermark merges + a far event that
        # advances the watermark to 18:01:00
        [
            (1, T("2024-01-01 09:55:00"), 4.0),  # before u1 start
            (2, T("2024-01-01 10:00:05"), 2.0),  # before u2 last
            # gap-2s after u2's TRUE last (10:00:10); with a regressed
            # last_us (10:00:05) this would be gap+3s away and split
            (2, T("2024-01-01 10:00:10") + pd.Timedelta(seconds=gap_s - 2), 8.0),
            (4, T("2024-01-01 18:31:00"), 1.0),
        ],
        # batch 3: u1's 10:30:00 is PAST the 18:01:00 watermark ->
        # dropped; u1/u2 timeouts fire (14:00:10 and 18:00:08 < 18:01)
        [
            (1, T("2024-01-01 10:30:00"), 100.0),
            (5, T("2024-01-01 19:00:00"), 1.0),
        ],
    ]
    events_dir = tmp_path / "ooo_events"
    events_dir.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [
                Row(
                    event_id=j,
                    ts=ts.to_pydatetime(),
                    user_id=u,
                    event_type="x",
                    value=v,
                    props="{}",
                )
                for j, (u, ts, v) in enumerate(rows)
            ],
            schema=(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
        )
        path = str(events_dir / f"{i:03d}.parquet")
        # coerce to microsecond timestamps: Spark's vectorized parquet
        # reader cannot convert pandas' default TIMESTAMP(NANOS)
        df.toPandas().to_parquet(
            path, index=False, coerce_timestamps="us"
        )
        # FileStreamSource picks oldest-mtime first: force the order
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = read_event_stream(
        spark, str(events_dir), watermark="30 minutes",
        max_files_per_trigger=1,
    )
    q = (
        session_stream(stream)
        .writeStream.format("memory")
        .queryName("session_stream_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in spark.table("session_stream_ooo").collect()
    )
    assert got == [
        # u1: start lowered to the late 09:55:00 event, n=3 (the
        # past-watermark 10:30:00 event did NOT join), sum 1+2+4
        (1, "2024-01-01 09:55:00", 3, 7.0),
        # u2: ONE session of 3 (no false split from last_us
        # regression), start lowered to 10:00:05, sum 1+2+8
        (2, "2024-01-01 10:00:05", 3, 11.0),
    ]


def test_session_stream_pre_gap_late_event_opens_separate_session(
    spark, tmp_path
):
    """r9 seam fix: a late-but-within-watermark event more than one
    gap OLDER than the open session's start must form its own earlier
    session (the built-in session_window grouping), not min-merge into
    the open one. Cross-batch, this is only reachable when the
    watermark DELAY exceeds the gap (otherwise the watermark — global
    max event time minus delay — has already passed start-gap by the
    time the open session exists), so the fixture uses a 6 h delay
    against the 4 h gap: batch 3 delivers u1's 05:00 event against the
    open 10:00 session while the watermark is 04:00."""
    import os

    import pandas as pd
    from pyspark.sql import Row

    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        SESSION_GAP_S,
        session_stream,
    )

    T = pd.Timestamp
    assert SESSION_GAP_S == 4 * 3600  # fixture timestamps assume 4 h gap
    batches = [
        # batch 1: u9 seeds the stream (wm after: 05:20 - 6 h < 0)
        [(9, T("2024-01-01 05:20:00"), 0.5)],
        # batch 2: u1 opens its session at 10:00 (wm after: 04:00)
        [(1, T("2024-01-01 10:00:00"), 2.0)],
        # batch 3: u1's 05:00 event is within-watermark (>= 04:00) but
        # 5 h before the open session start — more than one gap older.
        # It must become a separate session [05:00] emitted on the
        # in-batch gap and must NOT lower the open session's start.
        # u9's 19:00 advances the watermark to 13:00.
        [(1, T("2024-01-01 05:00:00"), 1.0), (9, T("2024-01-01 19:00:00"), 0.5)],
        # batches 4-5: u9 keeps ticking so the watermark (21:00-6h =
        # 15:00) passes u1's 14:00 timeout and the callback fires in a
        # later batch.
        [(9, T("2024-01-01 21:00:00"), 0.5)],
        [(9, T("2024-01-01 22:00:00"), 0.5)],
    ]
    events_dir = tmp_path / "pregap_events"
    events_dir.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [
                Row(
                    event_id=j,
                    ts=ts.to_pydatetime(),
                    user_id=u,
                    event_type="x",
                    value=v,
                    props="{}",
                )
                for j, (u, ts, v) in enumerate(rows)
            ],
            schema=(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
        )
        path = str(events_dir / f"{i:03d}.parquet")
        df.toPandas().to_parquet(path, index=False, coerce_timestamps="us")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = read_event_stream(
        spark, str(events_dir), watermark="6 hours",
        max_files_per_trigger=1,
    )
    q = (
        session_stream(stream)
        .writeStream.format("memory")
        .queryName("session_stream_pregap")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in spark.table("session_stream_pregap").collect()
        if r["user_id"] == 1
    )
    # Two distinct u1 sessions — the old kernel emitted ONE merged
    # session (05:00, n=2, 3.0).
    assert got == [
        (1, "2024-01-01 05:00:00", 1, 1.0),
        (1, "2024-01-01 10:00:00", 1, 2.0),
    ]


def test_session_stream_strict_exact_parity_under_late_merge(
    spark, tmp_path
):
    """The strict kernel holds sessions until the watermark closes
    them, so a late-but-within-watermark event can still merge into a
    session the EAGER kernel would already have emitted on the
    in-batch gap. Fixture (gap 4 h, watermark delay 6 h > gap):
    batch 2 gives u1 10:00 and 18:30 (one gap apart in-batch); batch 3
    delivers 13:00 — in-watermark (wm 12:30) and within gap of the
    10:00 session. Ground truth (session_batch on the full history):
    [10:00..13:00 n=2] and [18:30 n=1]. The strict stream must emit
    exactly that; the eager kernel's documented boundary would have
    split off [10:00 n=1] already."""
    import os

    import pandas as pd
    from pyspark.sql import Row

    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        SESSION_GAP_S,
        session_batch,
        session_stream_strict,
    )

    T = pd.Timestamp
    assert SESSION_GAP_S == 4 * 3600
    batches = [
        [(9, T("2024-01-01 05:00:00"), 0.5)],
        [(1, T("2024-01-01 10:00:00"), 2.0),
         (1, T("2024-01-01 18:30:00"), 8.0)],
        # wm now 12:30; 13:00 merges into the still-open 10:00 session
        [(1, T("2024-01-01 13:00:00"), 4.0)],
        # advance the watermark past 22:30 so everything closes
        [(9, T("2024-01-02 06:00:00"), 0.5)],
        [(9, T("2024-01-02 07:00:00"), 0.5)],
    ]
    events_dir = tmp_path / "strict_events"
    events_dir.mkdir()
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        df = spark.createDataFrame(
            [
                Row(event_id=j, ts=ts.to_pydatetime(), user_id=u,
                    event_type="x", value=v, props="{}")
                for j, (u, ts, v) in enumerate(rows)
            ],
            schema=(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
        )
        path = str(events_dir / f"{i:03d}.parquet")
        df.toPandas().to_parquet(path, index=False, coerce_timestamps="us")
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = read_event_stream(
        spark, str(events_dir), watermark="6 hours",
        max_files_per_trigger=1,
    )
    q = (
        session_stream_strict(stream)
        .writeStream.format("memory")
        .queryName("session_stream_strict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"],
         r["sum_value"])
        for r in spark.table("session_stream_strict").collect()
    )
    # ground truth: batch sessionization of the full history, minus
    # open tails (sessions whose end + gap the final watermark never
    # passed). Session end = start of the NEXT member gap-run; derive
    # it per session from the raw rows.
    hist = spark.createDataFrame(
        [
            Row(user_id=u, ts=ts.to_pydatetime(), value=v)
            for (u, ts, v) in all_rows
        ],
        schema="user_id long, ts timestamp, value double",
    )
    final_wm = max(ts for _, ts, _ in all_rows) - pd.Timedelta(hours=6)
    closed_want = []
    for r in session_batch(hist).collect():
        u, start, n = r["user_id"], r["session_start"], r["n_events"]
        member_ts = sorted(
            ts for (uu, ts, _) in all_rows
            if uu == u and ts >= pd.Timestamp(start)
        )[:n]
        if member_ts[-1] + pd.Timedelta(seconds=SESSION_GAP_S) <= final_wm:
            closed_want.append((u, str(start), n, r["sum_value"]))
    assert got == sorted(closed_want)
    # and the u1 sessions specifically are the merged pair
    u1 = [g for g in got if g[0] == 1]
    assert u1 == [
        (1, "2024-01-01 10:00:00", 2, 6.0),
        (1, "2024-01-01 18:30:00", 1, 8.0),
    ]


def test_fold_holt_kernel_and_state_chaining():
    """Kernel pins: constant series is a fixed point (level == the
    constant, trend == 0 exactly — exact binary constants); and the
    cross-trigger state algebra is exact — folding any prefix, then
    folding the suffix over the carried (level, trend), equals one
    full-history fold bit-for-bit. That identity is what makes the
    stream's per-trigger state accumulation equal the batch twin."""
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        _fold_holt,
    )

    level, trend = _fold_holt([7.25] * 40, None, 0.0)
    assert (level, trend) == (7.25, 0.0)

    import random

    rng = random.Random(5)
    values = [rng.uniform(-100, 100) for _ in range(60)]
    want = _fold_holt(values, None, 0.0)
    for k in (1, 7, 30, 59):
        l1, b1 = _fold_holt(values[:k], None, 0.0)
        assert _fold_holt(values[k:], l1, b1) == want, k


def test_holt_stream_single_batch_equals_batch_twin(
    spark, sf_dir, tmp_path
):
    """With the whole history in ONE trigger (single parquet file,
    availableNow) the stream's output rows equal the batch twin
    EXACTLY — level, trend, and forecast bit-for-bit (the in-batch
    ts sort makes the fold order identical)."""
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        holt_batch,
        holt_stream,
    )

    events_dir = str(tmp_path / "events1")
    load_table(spark, sf_dir, "events").coalesce(1).write.mode(
        "overwrite"
    ).parquet(events_dir)
    stream = read_event_stream(spark, events_dir).drop("event_id")
    q = (
        holt_stream(stream)
        .writeStream.format("memory")
        .queryName("holt_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (
            r["n_events"],
            r["level"],
            r["trend"],
            r["forecast_1"],
        )
        for r in spark.table("holt_stream_t").collect()
    }
    want = {
        r["user_id"]: (
            r["n_events"],
            r["level"],
            r["trend"],
            r["forecast_1"],
        )
        for r in holt_batch(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got == want


def test_holt_stream_accumulates_state_across_triggers(
    spark, sf_dir, tmp_path
):
    """Multi-trigger form (maxFilesPerTrigger=1 over a ts-split
    corpus): state survives across triggers — per-user n_events
    SUM over the per-trigger rows equals the corpus count (the
    EWMA-stream precedent; exact value parity is the single-batch
    test above, since the file source does not guarantee the
    split order)."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        holt_stream,
    )

    events = load_table(spark, sf_dir, "events")
    cut = events.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0]["m"]
    events_dir = str(tmp_path / "events2")
    events.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(events_dir + "/p=1")
    events.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(events_dir + "/p=2")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir + "/p=*")
        .drop("event_id")
    )
    q = (
        holt_stream(stream)
        .writeStream.format("memory")
        .queryName("holt_stream_m")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("holt_stream_m").collect()
    totals: dict[int, int] = {}
    for r in rows:
        totals[r["user_id"]] = totals.get(r["user_id"], 0) + r["n_events"]
    want_totals = {
        r["user_id"]: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert totals == want_totals
