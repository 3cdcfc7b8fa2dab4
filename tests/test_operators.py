"""Unit tests for M1 relational operators on tiny literal frames plus
corpus-level sanity (SURVEY.md §5.2)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.joins import asof_join
from bigdata_pipelines_aws_glue_spark.operators.merge import staged_merge


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            (1, "EUR", datetime.datetime(2025, 3, 1)),
            (2, "EUR", datetime.datetime(2025, 1, 15)),
            (3, "EUR", datetime.datetime(2024, 12, 1)),  # before all rates
            (4, "GBP", datetime.datetime(2025, 3, 1)),  # no rates at all
        ],
        "id long, currency string, ts timestamp",
    )
    rates = spark.createDataFrame(
        [
            ("EUR", 1.0, datetime.datetime(2025, 1, 1)),
            ("EUR", 2.0, datetime.datetime(2025, 2, 1)),
        ],
        "currency string, rate double, rate_date timestamp",
    )
    out = {
        r["id"]: r["rate"]
        for r in asof_join(
            left, rates, "currency", "ts", "rate_date", left_id_cols=["id"]
        ).collect()
    }
    assert out == {1: 2.0, 2: 1.0, 3: None, 4: None}


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, "EUR", datetime.datetime(2025, 1, 15))],
        "id long, currency string, ts timestamp",
    )
    rates = spark.createDataFrame(
        [
            ("EUR", 1.0, datetime.datetime(2025, 1, 1)),
            ("EUR", 2.0, datetime.datetime(2025, 2, 1)),
        ],
        "currency string, rate double, rate_date timestamp",
    )
    row = asof_join(
        left, rates, "currency", "ts", "rate_date",
        direction="forward", left_id_cols=["id"],
    ).first()
    assert row["rate"] == 2.0


def test_asof_sortmerge_matches_broadcast_paths(spark, sf_dir):
    """The union+last(ignorenulls) sort-merge as-of join must agree
    row-for-row with the broadcast-array fast path on the registered
    rates workload (including unmatched -> NULL rows)."""
    from bigdata_pipelines_aws_glue_spark.operators.joins import (
        asof_join_rates,
        asof_join_sortmerge_rates,
    )

    a = {
        r["transaction_id"]: (r["asof_rate_date"], r["asof_rate"], r["amount_usd"])
        for r in asof_join_rates(spark, sf_dir).collect()
    }
    b = {
        r["transaction_id"]: (r["asof_rate_date"], r["asof_rate"], r["amount_usd"])
        for r in asof_join_sortmerge_rates(spark, sf_dir).collect()
    }
    assert a == b


def test_asof_skewproof_matches_broadcast_paths(spark, sf_dir):
    """The (key, time-bucket) sub-partitioned sort-merge must agree
    row-for-row with the broadcast-array fast path on the registered
    rates workload — whose currency key is genuinely skewed (5 keys
    over the whole fact table)."""
    from bigdata_pipelines_aws_glue_spark.operators.joins import (
        asof_join_rates,
        asof_join_skewproof_rates,
    )

    a = {
        r["transaction_id"]: (r["asof_rate_date"], r["asof_rate"], r["amount_usd"])
        for r in asof_join_rates(spark, sf_dir).collect()
    }
    b = {
        r["transaction_id"]: (r["asof_rate_date"], r["asof_rate"], r["amount_usd"])
        for r in asof_join_skewproof_rates(spark, sf_dir).collect()
    }
    assert a == b


def test_asof_skewproof_seed_carry_hot_key(spark):
    """Property equality vs the generic window as-of on a ONE-hot-key
    corpus with tiny buckets (7 days), so most left buckets contain no
    right row at all and depend entirely on cross-bucket seed carry;
    also covers multi-bucket gaps, pre-first-rate NULLs, and a
    same-day rate+tx tie (backward-inclusive)."""
    import datetime

    from bigdata_pipelines_aws_glue_spark.operators.joins import (
        asof_join,
        asof_join_bucketed_sortmerge,
    )

    base = datetime.datetime(2025, 1, 1)
    # 200 left rows on the hot key, one every 2 days; 3 rates spaced
    # 60 days; a cold key with one pre-rate row.
    left_rows = [
        (i, "HOT", base + datetime.timedelta(days=2 * i, hours=i % 5))
        for i in range(200)
    ] + [(999, "COLD", base + datetime.timedelta(days=30))]
    rates_rows = [
        ("HOT", 1.0, base + datetime.timedelta(days=10)),
        ("HOT", 2.0, base + datetime.timedelta(days=70)),
        ("HOT", 3.0, base + datetime.timedelta(days=130)),
        ("COLD", 9.0, base + datetime.timedelta(days=300)),
    ]
    left = spark.createDataFrame(
        left_rows, "id long, k string, ts timestamp"
    )
    rates = spark.createDataFrame(
        rates_rows, "k string, rate double, rate_date timestamp"
    )
    expect = {
        r["id"]: (r["rate"], r["rate_date"])
        for r in asof_join(
            left, rates, "k", "ts", "rate_date", left_id_cols=["id"]
        ).collect()
    }
    got = {
        r["id"]: (r["rate"], r["rate_date"])
        for r in asof_join_bucketed_sortmerge(
            left, rates, "k", "ts", "rate_date", ["rate"], bucket_days=7
        ).collect()
    }
    assert got == expect
    assert got[0] == (None, None)  # pre-first-rate
    assert got[999] == (None, None)  # cold key, rate after its ts
    assert got[199][0] == 3.0  # latest rate via seed carry


def test_asof_sortmerge_tiny_edge_cases(spark):
    """Same edge matrix as test_asof_join_backward: pre-first-rate and
    rateless keys yield NULLs; equal timestamps match inclusively."""
    import datetime

    from bigdata_pipelines_aws_glue_spark.operators.joins import (
        asof_join_union_sortmerge,
    )

    left = spark.createDataFrame(
        [
            (1, "EUR", datetime.datetime(2025, 3, 1)),
            (2, "EUR", datetime.datetime(2025, 1, 15)),
            (3, "EUR", datetime.datetime(2024, 12, 1)),
            (4, "GBP", datetime.datetime(2025, 3, 1)),
            (5, "EUR", datetime.datetime(2025, 2, 1)),  # ts == rate_date
        ],
        "id long, currency string, ts timestamp",
    )
    rates = spark.createDataFrame(
        [
            ("EUR", 1.0, datetime.datetime(2025, 1, 1)),
            ("EUR", 2.0, datetime.datetime(2025, 2, 1)),
        ],
        "currency string, rate double, rate_date timestamp",
    )
    out = {
        r["id"]: r["rate"]
        for r in asof_join_union_sortmerge(
            left, rates, "currency", "ts", "rate_date", ["rate"]
        ).collect()
    }
    assert out == {1: 2.0, 2: 1.0, 3: None, 4: None, 5: 2.0}


def test_staged_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    staging = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string"
    )
    out = {r["k"]: r["v"] for r in staged_merge(target, staging, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    staging = spark.createDataFrame([(2, "B")], "k long, v string")
    once = staged_merge(target, staging, ["k"])
    twice = staged_merge(once, staging, ["k"])
    assert sorted((r["k"], r["v"]) for r in twice.collect()) == [(1, "a"), (2, "B")]


def test_registry_complete(spark):
    """Every query is callable and every oracle key exists in queries."""
    from bigdata_pipelines_aws_glue_spark import registry

    q = registry.queries()
    o = registry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 26


def test_session_window_matches_gap_semantics(spark):
    from bigdata_pipelines_aws_glue_spark.operators.events_time import (
        SESSION_GAP_SECONDS,
    )

    base = datetime.datetime(2025, 1, 1)
    gap = datetime.timedelta(seconds=SESSION_GAP_SECONDS)
    one_us = datetime.timedelta(microseconds=1)
    events = spark.createDataFrame(
        [
            (1, base, 1.0),
            (1, base + gap, 1.0),              # exactly gap later -> MERGES
            (1, base + gap + gap + one_us, 1.0),  # gap exceeded -> new session
            (2, base, 1.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = (
        events.groupBy(F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
                       "user_id")
        .count()
        .collect()
    )
    per_user = sorted((r["user_id"], r["count"]) for r in out)
    assert per_user == [(1, 1), (1, 2), (2, 1)]


def test_asof_bucketed_randomized_equivalence(spark):
    """Randomized (seeded) corpora: the bucketed sort-merge as-of must
    equal the generic window as-of on arbitrary key/time layouts —
    duplicate timestamps, keys missing on either side, rates clustered
    inside one bucket or strewn across many, and bucket widths from 1
    to 90 days."""
    import datetime
    import random

    from bigdata_pipelines_aws_glue_spark.operators.joins import (
        asof_join,
        asof_join_bucketed_sortmerge,
    )

    base = datetime.datetime(2024, 1, 1)
    for seed, bucket_days in [(1, 1), (2, 7), (3, 30), (4, 90), (5, 13)]:
        rng = random.Random(seed)
        keys = ["k%d" % i for i in range(rng.randint(1, 5))]
        left_rows = [
            (
                i,
                rng.choice(keys + ["left_only"]),
                base + datetime.timedelta(hours=rng.randint(0, 24 * 400)),
            )
            for i in range(120)
        ]
        # minute=j makes every rate timestamp unique: the GENERIC
        # as-of breaks rate_date ties arbitrarily, so tied inputs
        # would compare two differently-arbitrary answers
        rate_rows = [
            (
                rng.choice(keys + ["right_only"]),
                float(rng.randint(1, 9)),
                base
                + datetime.timedelta(
                    hours=rng.randint(0, 24 * 400), minutes=j
                ),
            )
            for j in range(rng.randint(1, 25))
        ]
        left = spark.createDataFrame(
            left_rows, "id long, k string, ts timestamp"
        )
        rates = spark.createDataFrame(
            rate_rows, "k string, rate double, rate_date timestamp"
        )
        want = {
            r["id"]: (r["rate"], r["rate_date"])
            for r in asof_join(
                left, rates, "k", "ts", "rate_date", left_id_cols=["id"]
            ).collect()
        }
        got = {
            r["id"]: (r["rate"], r["rate_date"])
            for r in asof_join_bucketed_sortmerge(
                left, rates, "k", "ts", "rate_date", ["rate"],
                bucket_days=bucket_days,
            ).collect()
        }
        assert got == want, f"seed={seed} bucket_days={bucket_days}"
