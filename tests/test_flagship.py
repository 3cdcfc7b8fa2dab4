"""Flagship pipeline tests (SURVEY.md §3.2, §5.2) — reference edge-case
semantics on tiny literal frames + end-to-end on the sf0.001 corpus."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.plans.flagship import (
    OUTPUT_CONTRACT,
    convert_currency,
    derive_time_columns,
    flagship_query,
    latest_rate_per_currency,
)


def _rates(spark):
    return spark.createDataFrame(
        [
            ("EUR", 1.1, datetime.datetime(2025, 1, 1)),
            ("EUR", 1.2, datetime.datetime(2025, 2, 1)),  # latest wins
            ("GBP", 0.0, datetime.datetime(2025, 1, 1)),  # falsy rate
        ],
        "currency string, rate_to_usd double, rate_date timestamp",
    )


def _tx(spark):
    # Mirrors the reference 2-row smoke fixture (s3_setup.py:103-105),
    # extended to cover every conversion branch.
    return spark.createDataFrame(
        [
            (1, 101, 500, 50.0, "USD", datetime.datetime(2025, 4, 12, 10)),
            (2, 102, 501, 75.5, "EUR", datetime.datetime(2025, 4, 12, 11, 30)),
            (3, 103, 502, 10.0, "GBP", datetime.datetime(2025, 4, 12, 12)),
            (4, 104, 503, 20.0, "JPY", datetime.datetime(2025, 4, 12, 13)),
        ],
        "transaction_id long, user_id long, product_id long, amount double,"
        " currency string, timestamp timestamp",
    )


def test_latest_rate_per_currency(spark):
    out = {
        r["currency"]: r["rate_to_usd"]
        for r in latest_rate_per_currency(_rates(spark)).collect()
    }
    assert out == {"EUR": 1.2, "GBP": 0.0}


def test_convert_currency_branches(spark):
    out = {
        r["transaction_id"]: r["amount_usd"]
        for r in convert_currency(_tx(spark), _rates(spark)).collect()
    }
    assert out[1] == 50.0  # USD passthrough (glue_job.py:65-66)
    assert abs(out[2] - 75.5 * 1.2) < 1e-9  # latest rate (glue_job.py:60)
    assert out[3] == 10.0  # falsy rate -> passthrough (glue_job.py:68)
    assert out[4] == 20.0  # missing rate -> 1.0 (glue_job.py:61)


def test_duplicate_dimension_keys_multiply_rows(spark):
    # J1 semantics: no dedup guard on the dimension (glue_job.py:121-125).
    tx = _tx(spark)
    cats = spark.createDataFrame(
        [(500, "a"), (500, "b")], "product_id long, category string"
    )
    joined = tx.join(F.broadcast(cats), on="product_id", how="left")
    assert joined.count() == 5  # row 1 duplicated, others NULL category
    assert joined.filter(F.col("category").isNull()).count() == 3


def test_time_columns(spark):
    row = derive_time_columns(_tx(spark)).filter("transaction_id = 2").first()
    assert row["transaction_date"] == datetime.date(2025, 4, 12)
    assert row["transaction_year"] == 2025
    assert row["transaction_month"] == 4
    assert row["transaction_week"] == 15  # ISO week
    assert row["transaction_day"] == 12


def test_flagship_end_to_end(spark, sf_dir):
    df = flagship_query(spark, sf_dir)
    assert df.columns == list(OUTPUT_CONTRACT)
    n = df.count()
    assert n == 6000  # one row per lineitem (orders join is total)
    # USD rows: amount_usd == amount exactly
    bad = df.filter(
        (F.col("currency") == "USD") & (F.col("amount_usd") != F.col("amount"))
    ).count()
    assert bad == 0
    # INR has no rate -> 1.0 default
    bad = df.filter(
        (F.col("currency") == "INR") & (F.col("amount_usd") != F.col("amount"))
    ).count()
    assert bad == 0
