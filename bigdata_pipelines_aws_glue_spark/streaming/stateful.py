"""Custom stateful streaming operator (SURVEY.md §2.9 —
``applyInPandasWithState`` slice of the [north-star] mandate).

Operator: per-user running EWMA + anomaly flagging over the event
stream. State = (ewma, n_seen) per user_id; each micro-batch updates
the state from its Arrow batches and emits one row per (user, batch)
with the current estimate and how many events deviated > k·|ewma|.

This is the shape Spark cannot express with built-in aggregates
(recursive state across triggers); the same kernel also runs in batch
via ``applyInPandas`` (no state handle) so the logic is testable
without a stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALPHA = 0.2
DEVIATION_FACTOR = 3.0

OUTPUT_SCHEMA = (
    "user_id long, n_events int, ewma double, n_anomalies int"
)
STATE_SCHEMA = "ewma double, n_seen long"


def _fold_ewma(
    values: list[float], ewma: float | None
) -> tuple[float, int]:
    """Sequential EWMA fold (ts-ordered input) + anomaly count."""
    anomalies = 0
    for v in values:
        if ewma is None:
            ewma = v
            continue
        if abs(v - ewma) > DEVIATION_FACTOR * max(abs(ewma), 1e-9):
            anomalies += 1
        ewma = ALPHA * v + (1 - ALPHA) * ewma
    return float(ewma if ewma is not None else 0.0), anomalies


def ewma_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function."""
    (user_id,) = key
    if state.exists:
        ewma, n_seen = state.get
    else:
        ewma, n_seen = None, 0
    values: list[tuple] = []
    for pdf in pdfs:
        values.extend(zip(pdf["ts"], pdf["value"]))
    values.sort(key=lambda tv: tv[0])
    ordered = [v for _, v in values]
    new_ewma, anomalies = _fold_ewma(ordered, ewma)
    state.update((new_ewma, n_seen + len(ordered)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [len(ordered)],
            "ewma": [new_ewma],
            "n_anomalies": [anomalies],
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming form: one output row per (user, trigger)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            ewma_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_batch(events: DataFrame) -> DataFrame:
    """Batch twin over the same kernel (applyInPandas, stateless call
    per user over full history) — used by tests to pin semantics."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ewma, anomalies = _fold_ewma(list(pdf["value"]), None)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [ewma],
                "n_anomalies": [anomalies],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema=OUTPUT_SCHEMA)
    )


#: CUSUM (Page's cumulative-sum drift detector) constants. Target
#: mean matches the corpus value distribution (mean ~50); slack k
#: half that, alarm threshold h chosen so the heavy right tail of
#: ``value`` (max ~330) actually fires on real data. All exact
#: binary doubles, so the recursive-CTE twin is bit-identical.
CUSUM_MU = 50.0
CUSUM_K = 25.0
CUSUM_H = 150.0

CUSUM_OUTPUT_SCHEMA = (
    "user_id long, n_events int, s_pos double, s_neg double, n_alarms int"
)
CUSUM_STATE_SCHEMA = "s_pos double, s_neg double, n_seen long, n_alarms long"

_MU_PLUS_K = CUSUM_MU + CUSUM_K
_MU_MINUS_K = CUSUM_MU - CUSUM_K


def _fold_cusum(
    values: list[float],
    s_pos: float = 0.0,
    s_neg: float = 0.0,
) -> tuple[float, float, int]:
    """Sequential two-sided CUSUM fold with reset-on-alarm:
    ``S+ = max(0, S+ + (x - mu - k))``, ``S- = max(0, S- + (mu - k -
    x))``; each threshold crossing counts one alarm and resets that
    side — the standard drift detector for data-quality monitoring
    of a feed."""
    alarms = 0
    for v in values:
        s_pos = max(0.0, s_pos + (v - _MU_PLUS_K))
        s_neg = max(0.0, s_neg + (_MU_MINUS_K - v))
        if s_pos > CUSUM_H:
            alarms += 1
            s_pos = 0.0
        if s_neg > CUSUM_H:
            alarms += 1
            s_neg = 0.0
    return s_pos, s_neg, alarms


def cusum_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function (state carries the
    running S+/S- across triggers, so a drift split over many
    micro-batches still alarms)."""
    (user_id,) = key
    if state.exists:
        s_pos, s_neg, n_seen, n_alarms = state.get
    else:
        s_pos, s_neg, n_seen, n_alarms = 0.0, 0.0, 0, 0
    values: list[tuple] = []
    for pdf in pdfs:
        values.extend(zip(pdf["ts"], pdf["value"]))
    values.sort(key=lambda tv: tv[0])
    ordered = [v for _, v in values]
    s_pos, s_neg, alarms = _fold_cusum(ordered, s_pos, s_neg)
    state.update((s_pos, s_neg, n_seen + len(ordered), n_alarms + alarms))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [len(ordered)],
            "s_pos": [s_pos],
            "s_neg": [s_neg],
            "n_alarms": [alarms],
        }
    )


def cusum_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming form: one output row per (user, trigger)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            cusum_update,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_batch(events: DataFrame) -> DataFrame:
    """Batch twin over the same kernel."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        s_pos, s_neg, alarms = _fold_cusum(list(pdf["value"]))
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "s_pos": [s_pos],
                "s_neg": [s_neg],
                "n_alarms": [alarms],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema=CUSUM_OUTPUT_SCHEMA)
    )


#: DuckDB twin of ``cusum_batch`` — the same recursive-CTE recipe as
#: ``EWMA_ORACLE`` (and the same preconditions: no NULL values,
#: unique (user_id, ts); asserted in tests/test_stateful.py). Every
#: step is max/add/compare on exact doubles in identical order, so
#: the match is bit-exact. The raw S+/S- before reset are repeated
#: expressions because a recursive SELECT cannot reference its own
#: aliases.
CUSUM_ORACLE = f"""
WITH RECURSIVE ev AS (
    SELECT user_id, CAST(value AS DOUBLE) AS value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
           count(*)     OVER (PARTITION BY user_id) AS n
    FROM events
), walk AS (
    SELECT user_id, rn, n,
           CASE WHEN greatest(0.0, value - {_MU_PLUS_K}) > {CUSUM_H}
                THEN 0.0 ELSE greatest(0.0, value - {_MU_PLUS_K}) END AS s_pos,
           CASE WHEN greatest(0.0, {_MU_MINUS_K} - value) > {CUSUM_H}
                THEN 0.0 ELSE greatest(0.0, {_MU_MINUS_K} - value) END AS s_neg,
           (CASE WHEN greatest(0.0, value - {_MU_PLUS_K}) > {CUSUM_H}
                 THEN 1 ELSE 0 END
            + CASE WHEN greatest(0.0, {_MU_MINUS_K} - value) > {CUSUM_H}
                   THEN 1 ELSE 0 END) AS alarms
    FROM ev WHERE rn = 1
    UNION ALL
    SELECT e.user_id, e.rn, e.n,
           CASE WHEN greatest(0.0, w.s_pos + (e.value - {_MU_PLUS_K}))
                     > {CUSUM_H}
                THEN 0.0
                ELSE greatest(0.0, w.s_pos + (e.value - {_MU_PLUS_K})) END,
           CASE WHEN greatest(0.0, w.s_neg + ({_MU_MINUS_K} - e.value))
                     > {CUSUM_H}
                THEN 0.0
                ELSE greatest(0.0, w.s_neg + ({_MU_MINUS_K} - e.value)) END,
           w.alarms
           + CASE WHEN greatest(0.0, w.s_pos + (e.value - {_MU_PLUS_K}))
                       > {CUSUM_H}
                  THEN 1 ELSE 0 END
           + CASE WHEN greatest(0.0, w.s_neg + ({_MU_MINUS_K} - e.value))
                       > {CUSUM_H}
                  THEN 1 ELSE 0 END
    FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id,
       CAST(n AS INT)      AS n_events,
       s_pos,
       s_neg,
       CAST(alarms AS INT) AS n_alarms
FROM walk WHERE rn = n
"""


#: DuckDB twin of ``ewma_batch``: the same sequential fold as a
#: recursive CTE. Cross-engine BIT-EXACT, not approximately equal —
#: both engines run the identical IEEE-754 double operations in the
#: identical order (`a*v + (1-a)*e`, two rounded multiplies then one
#: rounded add per step), so the checker's 17-significant-digit float
#: normalization matches without any tolerance. This upgrades the one
#: "genuinely non-SQL-expressible" stateful operator to a full oracle
#: row: recursion over triggers is outside Spark's built-in aggregate
#: model (hence applyInPandasWithState) but is plain SQL-1999
#: recursion to the oracle.
#:
#: Preconditions for bit-exactness (round-2 ADVICE; both hold in the
#: frozen corpus at every sf and are asserted in
#: tests/test_stateful.py): (1) ``events.value`` has no NULLs — a NULL
#: would propagate as NaN through the pandas fold but short-circuit
#: the SQL CASE (anomaly not counted, ewma becomes NULL); (2)
#: ``(user_id, ts)`` is unique — a tie would make the fold order
#: nondeterministic on both sides.
EWMA_ORACLE = f"""
WITH RECURSIVE ev AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
           count(*)     OVER (PARTITION BY user_id) AS n
    FROM events
), walk AS (
    SELECT user_id, rn, n, CAST(value AS DOUBLE) AS ewma, 0 AS anom
    FROM ev WHERE rn = 1
    UNION ALL
    SELECT e.user_id, e.rn, e.n,
           {ALPHA} * e.value + (1.0 - {ALPHA}) * w.ewma,
           w.anom + CASE
               WHEN abs(e.value - w.ewma)
                    > {DEVIATION_FACTOR} * greatest(abs(w.ewma), 1e-9)
               THEN 1 ELSE 0 END
    FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id,
       CAST(n AS INT)    AS n_events,
       ewma,
       CAST(anom AS INT) AS n_anomalies
FROM walk WHERE rn = n
"""


# ------------------------------------------- sessions (with timeout)

#: gap matches the batch `events_sessionize` operator so the stateful
#: form can share its oracle.
SESSION_GAP_S = 4 * 3600

SESSION_OUT_SCHEMA = (
    "session_start timestamp_ntz, user_id long, n_events long,"
    " sum_value double"
)
#: epoch-micros longs + a 1e-6-quantized value sum — integer state, so
#: resuming from any checkpoint is bit-exact.
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, sum_q long"


def _emit_session(user_id, start_us, n, sum_q):
    """One closed-session row, matching `events_sessionize`'s emitted
    arithmetic exactly: sum_value = stable_round(quantized_sum(q=6), 4)."""
    import math

    sum_value = math.floor((sum_q / 1e6) * 1e4 + 0.5) / 1e4
    return {
        "session_start": [pd.Timestamp(start_us, unit="us")],
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [sum_value],
    }


def session_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update with EVENT-TIME TIMEOUT (the
    GroupStateTimeout surface the EWMA/CUSUM operators don't use).

    Each batch SESSIONIZES THE UNION of the open state session and the
    batch's in-watermark events with one gap sweep (the same grouping
    ``session_batch`` applies to full history), then emits every
    non-final session immediately — a gap inside the batch closes a
    session, and a late-but-within-watermark event more than one gap
    OLDER than the open session now forms its own earlier session and
    emits, exactly as the built-in ``session_window`` would group it
    (r7 seam, closed in r9: the old kernel min-merged such an event
    into the open session, fabricating a span ``session_window`` never
    produces). Only the final (newest) session can still be extended
    by future in-watermark events, so state stays FOUR integers per
    user and checkpoints remain bit-exact; it emits when the WATERMARK
    passes last_event + gap — the timeout callback arrives with no
    data and ``state.hasTimedOut`` set. Eviction is watermark-driven,
    so state size is bounded by users active inside the lateness
    horizon, not by stream length.

    Residual approximation (inherent to append-mode early emission,
    shared with the old kernel): a non-final session emitted on an
    in-batch gap cannot merge with a still-later event that arrives
    before the watermark passes; the built-in ``session_window`` holds
    every session until the watermark instead. tests/test_stateful.py
    pins both the fixed seam and this boundary."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, sum_q = state.get
        state.remove()
        yield pd.DataFrame(_emit_session(user_id, start_us, n, sum_q))
        return
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts"], pdf["value"]))
    import math

    rows.sort(key=lambda tv: tv[0])
    # Spark does NOT pre-filter late rows for arbitrary stateful ops
    # (unlike windowed aggregations, late filtering is the kernel's
    # contract here): drop past-watermark events ourselves, or a
    # too-late merge regresses the session and setTimeoutTimestamp
    # throws INVALID_TIMEOUT_TIMESTAMP (< watermark).
    wm_us = state.getCurrentWatermarkMs() * 1_000
    gap_us = SESSION_GAP_S * 1_000_000
    items: list[list[int]] = []  # [start_us, last_us, n, sum_q]
    if state.exists:
        items.append(list(state.get))
    for ts, v in rows:
        t_us = int(pd.Timestamp(ts).value // 1_000)
        if t_us < wm_us:
            continue
        items.append([t_us, t_us, 1, int(math.floor(v * 1e6 + 0.5))])
    # gap sweep over start-sorted items; envelope max() because the
    # state session can span later than a late event's singleton
    items.sort(key=lambda it: (it[0], it[1]))
    merged: list[list[int]] = []
    for it in items:
        if merged and it[0] - merged[-1][1] <= gap_us:
            cur = merged[-1]
            cur[1] = max(cur[1], it[1])
            cur[2] += it[2]
            cur[3] += it[3]
        else:
            merged.append(it)
    out: list[dict] = []
    for s in merged[:-1]:
        out.append(_emit_session(user_id, s[0], s[2], s[3]))
    if merged:
        cur = merged[-1]
        timeout_ms = cur[1] // 1_000 + SESSION_GAP_S * 1_000
        if timeout_ms <= wm_us // 1_000:
            # The watermark already passed the final session's
            # end+gap (every row late-dropped, or state alone): the
            # timeout callback can't fire for a key that received
            # data — emit it now.
            out.append(_emit_session(user_id, cur[0], cur[2], cur[3]))
            state.remove()
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(timeout_ms)
    for o in out:
        yield pd.DataFrame(o)


#: strict-mode state: EVERY open session per key (parallel arrays),
#: not just the newest — integer state, checkpoint-bit-exact.
SESSION_STRICT_STATE_SCHEMA = (
    "starts array<long>, lasts array<long>, ns array<long>,"
    " sums array<long>"
)


def session_update_strict(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Watermark-driven sessionization with MULTI-SESSION state: the
    exact streaming twin of the built-in ``session_window`` (and of
    ``session_batch`` over any in-watermark arrival order).

    ``session_update`` (the eager kernel) emits non-final sessions on
    an in-batch gap — cheap state (4 ints), but an emitted session can
    no longer merge with a yet-later in-watermark event (documented
    boundary). This kernel instead HOLDS every open session until the
    watermark passes its end + gap, the same closure rule
    ``session_window`` applies: a session emits iff no admissible
    future event (t >= watermark) could extend or bridge it, because
    extending needs t <= last + gap < watermark. State is all open
    sessions inside the lateness horizon — bounded by gap/watermark
    geometry, not stream length: every open session has
    last in (wm - gap, wm + delay] and consecutive open sessions'
    lasts are > gap apart, so at most floor((delay + gap)/gap) + 1
    per key coexist (3 for the 4 h gap / 6 h delay fixture)."""
    (user_id,) = key
    gap_us = SESSION_GAP_S * 1_000_000
    wm_us = state.getCurrentWatermarkMs() * 1_000
    sessions: list[list[int]] = []
    if state.exists:
        starts, lasts, ns, sums = state.get
        sessions = [list(t) for t in zip(starts, lasts, ns, sums)]
    if not state.hasTimedOut:
        import math

        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["ts"], pdf["value"]))
        for ts, v in rows:
            t_us = int(pd.Timestamp(ts).value // 1_000)
            if t_us < wm_us:
                continue
            sessions.append(
                [t_us, t_us, 1, int(math.floor(v * 1e6 + 0.5))]
            )
        sessions.sort(key=lambda it: (it[0], it[1]))
        merged: list[list[int]] = []
        for it in sessions:
            if merged and it[0] - merged[-1][1] <= gap_us:
                cur = merged[-1]
                cur[1] = max(cur[1], it[1])
                cur[2] += it[2]
                cur[3] += it[3]
            else:
                merged.append(it)
        sessions = merged
    out: list[dict] = []
    keep: list[list[int]] = []
    for s in sessions:
        if s[1] // 1_000 + SESSION_GAP_S * 1_000 <= wm_us // 1_000:
            out.append(_emit_session(user_id, s[0], s[2], s[3]))
        else:
            keep.append(s)
    if keep:
        state.update(tuple(list(col) for col in zip(*keep)))
        state.setTimeoutTimestamp(
            min(s[1] for s in keep) // 1_000 + SESSION_GAP_S * 1_000
        )
    elif state.exists:
        state.remove()
    for o in out:
        yield pd.DataFrame(o)


def session_stream_strict(events: DataFrame) -> DataFrame:
    """Exact-parity streaming sessionization: emits each session once,
    only when the watermark closes it (built-in session_window
    semantics under any in-watermark arrival order)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            session_update_strict,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STRICT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming sessionization — closed sessions only, each
    emitted exactly once (in-batch gap or watermark timeout). For
    exact session_window parity under late merges, use
    ``session_stream_strict``.

    DEFAULT-CHOICE RATIONALE (decided r10, VERDICT_r9 item 6): the
    EAGER kernel stays the default. Its state is a fixed 4-int tuple
    per user — at 100 TB (hundreds of millions of keys) that bound is
    what keeps the state store flat — and it emits a session as soon
    as an in-batch gap proves it closed, which is the latency profile
    monitoring consumers want. The cost is a documented divergence:
    an event that is still inside the watermark but arrives in a
    LATER micro-batch cannot merge into a session the eager kernel
    already emitted (it opens a new one), so counts can split where
    ``session_window`` would merge. Opt into ``session_stream_strict``
    when exact session_window parity under cross-batch late merges is
    required (billing/attribution): it holds every open session in
    parallel-array state until the watermark passes end+gap — state
    grows with the number of concurrently-open sessions per user
    (bounded by gap/watermark geometry, not fixed) and emission waits
    for the watermark. Both kernels share the batch twin's oracle;
    the late-merge fixture in tests/test_stateful.py pins the exact
    divergence case."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            session_update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same per-user session semantics over full
    history, emitting EVERY session (batch has no open tail). Shares
    the established `events_sessionize` oracle — the custom stateful
    operator and the built-in ``session_window`` must agree exactly.

    VECTORIZED (round-6 scaling fix: the first per-row-loop +
    per-session-concat version ran alpha=0.84, 19 s at sf0.1; this
    numpy boundary-diff + groupby form is the Arrow-kernel shape the
    repo's other pandas kernels use): boundaries are one diff>gap
    compare, sessions one cumsum, aggregates one groupby — identical
    arithmetic (same 1e-6 quantization, same float64 ops in the same
    order), verified by the unchanged hash oracle."""
    import numpy as np

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ts_us = (
            pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        vq = np.floor(pdf["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        new = np.empty(len(ts_us), dtype=bool)
        new[0] = True
        new[1:] = (ts_us[1:] - ts_us[:-1]) > SESSION_GAP_S * 1_000_000
        sid = np.cumsum(new) - 1
        g = pd.DataFrame({"sid": sid, "t": ts_us, "vq": vq}).groupby(
            "sid", sort=True
        )
        starts = g["t"].first().to_numpy()
        ns = g.size().to_numpy().astype(np.int64)
        sums = g["vq"].sum().to_numpy()
        sum_value = np.floor((sums / 1e6) * 1e4 + 0.5) / 1e4
        return pd.DataFrame(
            {
                "session_start": pd.to_datetime(starts, unit="us"),
                "user_id": int(pdf["user_id"].iloc[0]),
                "n_events": ns,
                "sum_value": sum_value,
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema=SESSION_OUT_SCHEMA)
    )


# ------------------------- Holt level+trend stateful stream (r15)

#: smoothing constants imported from the batch forecast operator so
#: the stream, the batch twin, and the monthly-revenue form cannot
#: silently diverge (the frontier_refs shared-constants discipline);
#: both are EXACT binary fractions — see ``trends.HOLT_ALPHA``.
from bigdata_pipelines_aws_glue_spark.operators.trends import (  # noqa: E402
    HOLT_ALPHA,
    HOLT_BETA,
    fold_holt,
)

HOLT_OUT_SCHEMA = (
    "user_id long, n_events int, level double, trend double, "
    "forecast_1 double"
)
HOLT_STATE_SCHEMA = "level double, trend double, n_seen long"


#: the ONE shared recurrence (defined next to the constants in
#: trends.py) under the module-local name the update functions and
#: tests use — stream, batch twin and monthly form share one body.
_fold_holt = fold_holt


def holt_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: state carries
    (level, trend, n_seen) across triggers."""
    (user_id,) = key
    if state.exists:
        level, trend, n_seen = state.get
    else:
        level, trend, n_seen = None, 0.0, 0
    values: list[tuple] = []
    for pdf in pdfs:
        values.extend(zip(pdf["ts"], pdf["value"]))
    values.sort(key=lambda tv: tv[0])
    ordered = [v for _, v in values]
    level, trend = _fold_holt(ordered, level, trend)
    state.update((level, trend, n_seen + len(ordered)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [len(ordered)],
            "level": [level],
            "trend": [trend],
            "forecast_1": [level + trend],
        }
    )


def holt_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming Holt: one row per (user, trigger) with the
    running level/trend estimate and the one-step forecast — the
    online form of ``trends.holt_forecast_revenue``'s kernel
    (anomaly detection against a drifting-trend baseline, where the
    EWMA stream's level-only state lags every ramp)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            holt_update,
            outputStructType=HOLT_OUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def holt_batch(events: DataFrame) -> DataFrame:
    """Batch twin over the same kernel (full history per user) —
    registered as ``holt_level_trend_per_user`` with a
    WITH RECURSIVE oracle (the EWMA/CUSUM shape and preconditions:
    no NULL values, unique (user_id, ts) — both asserted in
    tests/test_stateful.py)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        level, trend = _fold_holt(list(pdf["value"]), None, 0.0)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "level": [level],
                "trend": [trend],
                "forecast_1": [level + trend],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fold, schema=HOLT_OUT_SCHEMA)
    )


HOLT_PER_USER_ORACLE = f"""
WITH RECURSIVE ev AS (
    SELECT user_id, CAST(value AS DOUBLE) AS v,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
           count(*)     OVER (PARTITION BY user_id) AS n
    FROM events
), walk AS (
    SELECT user_id, rn, n, v AS l, CAST(0.0 AS DOUBLE) AS b
    FROM ev WHERE rn = 1
    UNION ALL
    SELECT e.user_id, e.rn, e.n,
           {HOLT_ALPHA} * e.v + {1.0 - HOLT_ALPHA} * (w.l + w.b),
           {HOLT_BETA} * (({HOLT_ALPHA} * e.v
                           + {1.0 - HOLT_ALPHA} * (w.l + w.b)) - w.l)
               + {1.0 - HOLT_BETA} * w.b
    FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id,
       CAST(n AS INT) AS n_events,
       l AS level,
       b AS trend,
       l + b AS forecast_1
FROM walk WHERE rn = n
"""
