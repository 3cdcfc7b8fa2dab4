"""Property tests for the time-series and corpus-statistics operators
(oracle parity is checked separately by tools/check_oracle.py; these
pin the semantics on tiny literal inputs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.corpus_stats import (
    corpus_mix_weights,
    corpus_token_entropy,
)
from bigdata_pipelines_aws_glue_spark.operators.timeseries import (
    events_outlier_mad,
    events_rolling_avg_time,
)


def test_rolling_window_always_contains_current_row(spark, sf_dir):
    out = events_rolling_avg_time(spark, sf_dir)
    assert out.filter(F.col("n_in_window") < 1).count() == 0
    # a window of one row averages to that row's quantized value
    assert out.count() > 0


def test_mad_outliers_bounded_and_mad_nonnegative(spark, sf_dir):
    rows = events_outlier_mad(spark, sf_dir).collect()
    assert rows, "expected one row per event_type"
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_events"]
        assert r["mad_value"] >= 0.0


def test_mix_weights_sum_to_one_and_flatten_shares(spark, sf_dir):
    rows = corpus_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens: the largest share loses mass, the
    # smallest gains (oversample_factor straddles 1.0)
    hi = max(rows, key=lambda r: r["share"])
    lo = min(rows, key=lambda r: r["share"])
    if hi["share"] > lo["share"]:
        assert hi["oversample_factor"] <= 1.0 <= lo["oversample_factor"]


def test_token_entropy_bounded_by_log_vocab(spark, sf_dir):
    for r in corpus_token_entropy(spark, sf_dir).collect():
        assert 0.0 <= r["token_entropy_nats"] <= math.log(r["vocab_size"]) + 1e-9
        assert r["vocab_size"] <= r["n_tokens"]


def test_crossdoc_shingles_detect_injected_duplicate(spark):
    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words " * 3)],
        "doc_id long, text string",
    )
    # the operator signature is (spark, sf_dir); drive the same plan
    # shape on the literal frame
    from bigdata_pipelines_aws_glue_spark.operators.corpus_stats import SHINGLE_N
    from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens

    toks = _tokens(F.col("text"))
    shingles = F.when(
        F.size(toks) >= SHINGLE_N,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE_N),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(SHINGLE_N))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = docs.select("doc_id", F.explode(shingles).alias("shingle")).distinct()
    per_sh = pairs.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    fracs = {
        r["doc_id"]: r["frac"]
        for r in pairs.join(per_sh, "shingle")
        .groupBy("doc_id")
        .agg(
            (
                F.sum((F.col("nd") > 1).cast("int"))
                / F.count(F.lit(1))
            ).alias("frac")
        )
        .collect()
    }
    # identical docs share every shingle; the distinct doc shares none
    assert fracs[1] == 1.0 and fracs[2] == 1.0
    assert fracs[3] == 0.0


def test_token_budget_allocation_sums_exactly(spark, sf_dir):
    """Largest-remainder quotas must sum EXACTLY to the budget, stay
    within 1 of the unrounded share, and favor low-resource languages
    (temperature < 1)."""
    from bigdata_pipelines_aws_glue_spark.operators.corpus_stats import (
        TOKEN_BUDGET,
        token_budget_allocation,
    )

    rows = token_budget_allocation(spark, sf_dir).collect()
    assert sum(r["token_quota"] for r in rows) == TOKEN_BUDGET
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        share = r["n_tokens"] / total
        quota_share = r["token_quota"] / TOKEN_BUDGET
        # alpha=0.7 compresses: small langs get >= proportional share,
        # large langs <= (with slack for the integer rounding)
        if share < 1 / len(rows):
            assert quota_share >= share - 1e-6
        elif share > 1 / len(rows):
            assert quota_share <= share + 1e-6


def test_isotonic_matches_pav_replay(spark, sf_dir):
    """Independent algorithm: sequential pool-adjacent-violators vs
    the distributed max-min characterization."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.timeseries import (
        isotonic_daily_revenue,
    )

    got = sorted(
        isotonic_daily_revenue(spark, sf_dir).collect(), key=lambda r: r["d"]
    )
    y = np.array([r["revenue_cents"] for r in got], dtype=np.float64)

    # classic PAV: merge adjacent blocks while means decrease
    blocks = [[v, 1] for v in y]  # [sum, count]
    merged = []
    for b in blocks:
        merged.append(b)
        while (
            len(merged) > 1
            and merged[-2][0] / merged[-2][1] >= merged[-1][0] / merged[-1][1]
        ):
            s, c = merged.pop()
            merged[-1][0] += s
            merged[-1][1] += c
    fit = np.concatenate(
        [np.full(c, s / c) for s, c in merged]
    )

    got_fit = np.array([r["iso_fit_dollars"] for r in got]) * 100.0
    assert np.allclose(got_fit, fit, atol=1e-3)
    # monotone nondecreasing
    assert np.all(np.diff(got_fit) >= -1e-9)
    # an L2 projection preserves the mean
    assert abs(got_fit.mean() - y.mean()) < 1e-3


def test_max_concurrent_python_replay(spark, sf_dir):
    """Sequential sweep-line replay over collected spans."""
    from collections import defaultdict

    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.timeseries import (
        max_concurrent_orders,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    got = max_concurrent_orders(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    li["l_shipdate"] = pd.to_datetime(li["l_shipdate"]).dt.date
    od["o_orderdate"] = pd.to_datetime(od["o_orderdate"]).dt.date
    g = li.groupby("l_orderkey")["l_shipdate"].agg(["min", "max"])
    j = od.join(g, on="o_orderkey", how="inner")
    deltas = defaultdict(int)
    import datetime as dt

    n = 0
    for r in j.itertuples():
        s = min(r.o_orderdate, r.min)
        e = max(r.o_orderdate, r.max)
        deltas[s] += 1
        deltas[e + dt.timedelta(days=1)] -= 1
        n += 1
    days = sorted(deltas)
    c = 0
    peak, peak_day = -1, None
    weighted = tot_len = 0
    for i, d in enumerate(days):
        c += deltas[d]
        if c > peak:
            peak, peak_day = c, d
        if i + 1 < len(days):
            span = (days[i + 1] - d).days
            weighted += c * span
            tot_len += span
    assert got["n_intervals"] == n
    assert got["peak_concurrency"] == peak
    assert got["peak_date"] == peak_day
    assert abs(got["mean_concurrency"] - weighted / tot_len) < 2e-6
    assert 0 < got["peak_concurrency"] <= n


def test_changepoint_python_replay(spark, sf_dir):
    """Exhaustive numpy scan over every candidate boundary."""
    import numpy as np
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.timeseries import (
        changepoint_daily_revenue,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    got = changepoint_daily_revenue(spark, sf_dir).collect()[0]
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    od["d"] = pd.to_datetime(od["o_orderdate"]).dt.date
    od["c"] = np.floor(
        od["o_totalprice"].to_numpy(float) * 100 + 0.5
    ).astype(np.int64)
    daily = od.groupby("d")["c"].sum()
    full = pd.date_range(min(daily.index), max(daily.index), freq="D").date
    y = np.array([daily.get(d, 0) for d in full], dtype=np.float64)
    n = len(y)
    S = np.cumsum(y)
    Q = np.cumsum(y * y)
    k = np.arange(1, n)  # boundary after k days
    sse_l = Q[:-1] - S[:-1] ** 2 / k
    sse_r = (Q[-1] - Q[:-1]) - (S[-1] - S[:-1]) ** 2 / (n - k)
    tot = sse_l + sse_r
    i = int(np.argmin(tot))  # numpy takes FIRST minimum = earliest date
    sse_total = Q[-1] - S[-1] ** 2 / n
    assert got["split_date"] == full[i]
    assert got["n_left"] == i + 1
    assert got["n_right"] == n - i - 1
    assert abs(
        got["sse_reduction"] - (1.0 - tot[i] / sse_total)
    ) < 1e-9
    ml = S[i] / (i + 1) / 100
    mr = (S[-1] - S[i]) / (n - i - 1) / 100
    assert abs(got["mean_left_dollars"] - ml) < 0.01
    assert abs(got["mean_right_dollars"] - mr) < 0.01
    assert 0.0 <= got["sse_reduction"] < 1.0
