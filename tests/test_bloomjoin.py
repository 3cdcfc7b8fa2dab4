"""Bloom-filter semi-join prefilter: the no-false-negative guarantee,
the metadata-sized build invariant, and numpy replay of the
double-hash arithmetic (the portability property every oracle match
rests on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.bloomjoin import (
    _A1,
    _A2,
    _B1,
    _B2,
    _P,
    K_HASH,
    K_SMALL,
    M_BITS,
    M_SMALL,
    bloom_contains,
    bloom_filter_stats,
    bloom_semijoin_revenue,
    build_bloom_words,
)


def _py_positions(key: int, m: int, k: int) -> list[int]:
    h = key % _P
    h1 = (_A1 * h + _B1) % _P
    h2 = ((_A2 * h + _B2) % (_P - 1)) + 1
    return [(h1 + i * h2) % m for i in range(k)]


def test_spark_positions_match_python_replay(spark):
    keys = [0, 1, 63, 64, 97, 2**31, 2**40 + 123, 999999937]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    words = build_bloom_words(df, "key", M_SMALL, K_SMALL)
    # every bit the python replay sets must be set, and none else
    expect = set()
    for key in keys:
        expect.update(_py_positions(key, M_SMALL, K_SMALL))
    got = {
        w * 63 + b
        for w, word in enumerate(words)
        for b in range(63)
        if word >> b & 1
    }
    assert got == expect
    assert all(w >= 0 for w in words)  # 63-bit words never go negative
    assert len(words) == (M_SMALL + 62) // 63


def test_no_false_negatives_and_metadata_sized(spark):
    build = spark.range(0, 500, 7).select(F.col("id").alias("bk"))
    words = build_bloom_words(build, "bk", M_BITS, K_HASH)
    assert len(words) == (M_BITS + 62) // 63  # 2081 longs ~ 16 KiB
    probe = spark.range(0, 500).select(
        F.col("id"),
        bloom_contains(F.col("id"), words, M_BITS, K_HASH).alias("hit"),
    )
    rows = {r["id"]: r["hit"] for r in probe.collect()}
    for k in range(0, 500, 7):
        assert rows[k], f"false negative at {k}"
    # production geometry on 72 keys: FPs should be (near) zero
    fps = [k for k, hit in rows.items() if hit and k % 7 != 0]
    assert len(fps) <= 2


def test_semijoin_matches_plain_semijoin(spark, sf_dir):
    got = bloom_semijoin_revenue(spark, sf_dir)
    from bigdata_pipelines_aws_glue_spark.operators.bloomjoin import (
        _BUILD_FILTER,
        _build_keys,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    build = _build_keys(spark, sf_dir)
    plain = (
        li.join(build, li["l_orderkey"] == build["bk"], "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * F.lit(100)
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("revenue_cents"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stats_counters_are_consistent(spark, sf_dir):
    row = bloom_filter_stats(spark, sf_dir).collect()[0]
    assert row["n_candidates"] >= row["n_true"]  # no false negatives
    assert (
        row["n_false_pos"] == row["n_candidates"] - row["n_true"]
    )
    assert row["n_candidates"] <= row["n_fact_keys"]
    assert 0 < row["bits_set"] <= M_SMALL
