"""Semantic checks for ``operators/compaction.py`` and the seasonal
decomposition in ``operators/timeseries.py``."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.compaction import (
    ROW_BYTES,
    TARGET_BYTES,
    compaction_plan,
)
from bigdata_pipelines_aws_glue_spark.operators.timeseries import (
    seasonal_decompose_daily,
)


def test_compaction_plan_conserves_and_bounds(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    manifest = (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"),
            F.hour("ts").alias("hr"),
        )
        .agg((F.count(F.lit(1)) * ROW_BYTES).alias("bytes"))
        .collect()
    )
    plan = compaction_plan(spark, sf_dir).collect()
    assert sum(r.n_input_files for r in plan) == len(manifest)
    assert sum(r.out_bytes for r in plan) == sum(r.bytes for r in manifest)
    max_file = max(r.bytes for r in manifest)
    by_day = defaultdict(list)
    for r in plan:
        # next-fit bound: a group overruns the target by at most one
        # input file
        assert r.out_bytes < TARGET_BYTES + max_file
        by_day[r.day].append(r)
    for day, groups in by_day.items():
        groups.sort(key=lambda r: r.out_file)
        # contiguous, non-overlapping hour ranges in file order
        for a, b in zip(groups, groups[1:]):
            assert a.hr_hi < b.hr_lo
        # all but the last group must have reached the target (no
        # premature splits)
        for g in groups[:-1]:
            assert g.out_bytes + max_file >= TARGET_BYTES


def test_seasonal_decomposition_matches_driver_recompute(spark, sf_dir):
    daily = defaultdict(int)
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        d = r.o_orderdate.date()
        daily[d] += int(r.o_totalprice * 100 + 0.5)
    import datetime

    lo, hi = min(daily), max(daily)
    days = [
        lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1)
    ]
    rev = [daily.get(d, 0) for d in days]
    agg = defaultdict(lambda: [0, 0, 0])  # dow -> [n, rev, det7]
    for i in range(3, len(days) - 3):
        wsum = sum(rev[i - 3 : i + 4])
        dow = (days[i] - datetime.date(1970, 1, 1)).days % 7
        a = agg[dow]
        a[0] += 1
        a[1] += rev[i]
        a[2] += 7 * rev[i] - wsum
    got = {r.dow_id: r for r in seasonal_decompose_daily(spark, sf_dir).collect()}
    assert set(got) == set(range(7))
    for dow, (n, r_sum, det) in agg.items():
        g = got[dow]
        assert g.n_days == n
        assert abs(g.avg_revenue - r_sum / (100.0 * n)) < 1e-3
        assert abs(g.seasonal_index - det / (700.0 * n)) < 1e-3
    # weekly seasonal effects must roughly cancel (property of
    # centered-MA detrending) — within 1% of mean daily revenue
    total_idx = sum(a[2] / 700.0 for a in agg.values())
    mean_rev = sum(a[1] for a in agg.values()) / 100.0
    assert abs(total_idx) < 0.01 * mean_rev / 7
