"""GROUPED_AGG pandas UDF surface (trimmed mean) and the CDC apply
operator: determinism, edge cases, and the scalable-twin equivalence
the trimmed_mean_price docstring claims."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.aggregates import (
    trimmed_mean_price,
)
from bigdata_pipelines_aws_glue_spark.operators.merge import cdc_apply


def test_grouped_agg_matches_window_formulation(spark, sf_dir):
    got = {
        r["l_returnflag"]: (r["n_rows"], r["trimmed_mean_price"])
        for r in trimmed_mean_price(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("cents")
    wn = Window.partitionBy("l_returnflag")
    r = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    kept = r.filter(
        (F.col("rn") > F.floor(F.col("n") / 10))
        & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10))
    )
    want = {
        row["l_returnflag"]: (
            row["n"],
            float(row["s"]) / row["k"] / 100.0,
        )
        for row in kept.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("k"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for flag, (n, m) in want.items():
        gn, gm = got[flag]
        assert gn == n
        assert abs(gm - m) < 1e-9, (flag, gm, m)


def test_trimmed_mean_kernel_edges(spark):
    import numpy as np
    import pandas as pd

    # reuse the kernel logic standalone: below 10 rows nothing trims
    tm_logic = lambda vals: (  # noqa: E731 - mirror of the UDF body
        (lambda a, k: float((a[k : len(a) - k] if k else a).sum())
         / len(a[k : len(a) - k] if k else a))(
            np.sort(np.asarray(vals, np.int64)), len(vals) // 10
        )
    )
    assert tm_logic([100]) == 100.0
    assert tm_logic(list(range(9))) == 4.0  # no trim below n=10
    # n=10: trims exactly one from each end
    assert tm_logic([0, 1, 2, 3, 4, 5, 6, 7, 8, 1000]) == sum(range(1, 9)) / 8
    # order-independence: shuffled input, same answer
    assert tm_logic([1000, 8, 0, 7, 1, 6, 2, 5, 3, 4]) == sum(range(1, 9)) / 8


def test_cdc_apply_semantics(spark):
    # key 1: plain insert; key 3: insert+update; key 7: insert+delete;
    # key 21: insert, delete(seq2), update(seq3) -> resurrected
    rows = [
        (1, "I", 1, 10),
        (3, "I", 1, 30),
        (3, "U", 3, 35),
        (7, "I", 1, 70),
        (7, "D", 2, None),
        (21, "I", 1, 210),
        (21, "D", 2, None),
        (21, "U", 3, 215),
    ]
    log = spark.createDataFrame(
        rows, "k long, op string, seq int, v long"
    )
    got = {r["k"]: r["v"] for r in cdc_apply(log, key="k", seq="seq").collect()}
    assert got == {1: 10, 3: 35, 21: 215}


def test_cdc_apply_order_independence(spark):
    rows = [
        (21, "U", 3, 215),
        (21, "I", 1, 210),
        (21, "D", 2, None),
    ]
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        log = spark.createDataFrame(perm, "k long, op string, seq int, v long")
        got = cdc_apply(log, key="k", seq="seq").collect()
        assert [(r["k"], r["v"]) for r in got] == [(21, 215)]
