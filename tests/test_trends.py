"""Trend operators: property tests (oracle parity via check_oracle)."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.trends import (
    rolling_7d_active_users,
    sales_trend_slope,
)


def test_trend_slope_one_row_per_nation(spark, sf_dir):
    rows = sales_trend_slope(spark, sf_dir).collect()
    assert len(rows) == len({r["nation"] for r in rows})
    for r in rows:
        assert r["n_months"] >= 1
        assert r["avg_monthly_revenue"] > 0


def test_rolling_active_users_window_dominates_daily(spark, sf_dir):
    """The trailing-7d distinct count for day d is >= the count of any
    single contributing day, and bounded by total users."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total_users = ev.select("user_id").distinct().count()
    for r in rolling_7d_active_users(spark, sf_dir).collect():
        assert r["active_users_7d"] <= total_users
        if r["day"] in daily:
            assert r["active_users_7d"] >= daily[r["day"]]


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """A-ES weighted draw: sampled docs should be heavier on average
    than the corpus (weight = n_chars); deterministic, so exact."""
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        WEIGHTED_K,
        weighted_sample_topk,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    samp = weighted_sample_topk(spark, sf_dir)
    assert samp.count() == WEIGHTED_K
    avg_sample = samp.agg(F.avg("weight")).collect()[0][0]
    avg_corpus = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert avg_sample > avg_corpus
