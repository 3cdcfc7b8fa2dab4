"""Hot-key realism (VERDICT r1 item 9): prove the skew machinery
actually beats the naive plan on a genuinely skewed corpus, not just
that it returns the right rows.

Corpus: one currency carries 50% of a multi-million-row fact table
(the reference's rate-enrichment join shape, `glue_job.py:46-75`,
taken to the hot-key extreme); the rest spreads over 20k keys.

Two proofs:
- AQE skew-join SPLITS the hot partition (deterministic plan marker
  ``AQEShuffleRead skewed``) and is measurably faster wall-clock than
  the same join with splitting disabled (observed ~3x on local[32];
  asserted at a loose 0.9 to survive CI noise).
- ``two_phase_agg`` (salted partial agg) on the hot corpus matches the
  naive groupBy exactly — algebraic-decomposition correctness under
  real skew, where every row of the hot key hits one reducer in the
  naive plan.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.skew import two_phase_agg

#: wall-clock assertions are environment-dependent (pass on an idle
#: local[32]; can flake on loaded/low-core CI) — set SKIP_PERF_ASSERT=1
#: to keep the unconditional plan-marker + answer-equality checks but
#: skip the timing comparison (round-2 ADVICE item).
SKIP_PERF_ASSERT = os.environ.get("SKIP_PERF_ASSERT", "") == "1"

N_FACT = 3_000_000
N_DIM = 20_000
HOT_KEY = 0  # 50% of fact rows


@pytest.fixture(scope="module")
def hot_corpus(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("skew")
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.hash("id"), F.lit(N_DIM)))
        .cast("long")
        .alias("currency_id"),
        (F.col("id") * 3 % 997).cast("double").alias("amount"),
        # wide payload so the hot shuffle partition is MBs, not KBs —
        # small partitions would never trip the skew threshold
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("currency_id"),
        F.sha2(F.col("id").cast("string"), 224).alias("rate_blob"),
    )
    fact.write.mode("overwrite").parquet(str(base / "fact"))
    dim.write.mode("overwrite").parquet(str(base / "dim"))
    return str(base / "fact"), str(base / "dim")


def _timed_join(spark, fact_path, dim_path):
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    j = fact.join(dim, "currency_id").agg(
        F.sum(F.length("payload") + F.length("rate_blob")).alias("s")
    )
    t0 = time.time()
    rows = j.collect()
    dt = time.time() - t0
    plan = j._jdf.queryExecution().executedPlan().toString()
    return dt, rows[0]["s"], plan


def test_aqe_skew_join_splits_and_wins(spark, hot_corpus):
    fact_path, dim_path = hot_corpus
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # force the shuffle join (dim would broadcast otherwise — which
        # is itself the first-line skew defense; here we test the case
        # where the build side is too big to broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        def run(skew_on: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            return _timed_join(spark, fact_path, dim_path)

        run(True)  # warm: scan caches, codegen
        best = {}
        answer = set()
        for on in (False, True, False, True):
            dt, s, plan = run(on)
            best[on] = min(best.get(on, float("inf")), dt)
            answer.add(s)
            if on:
                assert "AQEShuffleRead skewed" in plan, (
                    "skew split did not trigger — hot partition below "
                    "threshold or AQE disabled"
                )
        assert len(answer) == 1, f"skew split changed the answer: {answer}"
        if not SKIP_PERF_ASSERT:
            assert best[True] < best[False] * 0.9, (
                f"skew-join split not faster: {best[True]:.2f}s vs "
                f"naive {best[False]:.2f}s"
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_two_phase_agg_exact_on_hot_corpus(spark, hot_corpus):
    fact_path, _ = hot_corpus
    fact = spark.read.parquet(fact_path)
    salted = two_phase_agg(
        fact, ["currency_id"], {"amount": "sum"}, buckets=32
    )
    naive = fact.groupBy("currency_id").agg(F.sum("amount").alias("amount"))
    got = {r["currency_id"]: r["amount"] for r in salted.collect()}
    want = {r["currency_id"]: r["amount"] for r in naive.collect()}
    assert set(got) == set(want)
    # integer-valued doubles (amount = id*3 % 997): sums are exact in
    # ieee754 far below 2^53, so salting must not change a single bit
    assert got == want
    hot_total = want[HOT_KEY]
    assert hot_total > 0 and len(want) == N_DIM


def test_salted_skew_join_row_identical_on_hot_key(spark):
    """salted_skew_join must be ROW-identical to the plain join —
    multiplicity included — on a constructed 90%-hot key, and with
    DUPLICATE small-side keys (each big row matches every matching
    small row exactly once, in exactly one salt bucket)."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import (
        salted_skew_join,
    )

    rows = [(7, i) for i in range(900)] + [
        (k, i) for i, k in enumerate(range(100, 200))
    ]
    big = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(7, "hot"), (7, "hot2"), (150, "cold"), (999, "nomatch")],
        "k long, label string",
    )
    got = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_skew_join(big, small, ["k"], buckets=8).collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["label"])
        for r in big.join(small, ["k"]).collect()
    )
    assert got == want
    # hot key matched twice per big row (duplicate small keys)
    assert sum(1 for k, _, _ in got if k == 7) == 1800


def test_salted_skew_join_rejects_outer_how(spark):
    """how=right/full must raise (ADVICE r11): an unmatched small-side
    row would surface once per salt replica, breaking row-identity."""
    import pytest

    from bigdata_pipelines_aws_glue_spark.operators.skew import (
        salted_skew_join,
    )

    big = spark.createDataFrame([(1, 1)], "k long, payload long")
    small = spark.createDataFrame([(2, "x")], "k long, label string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="row-identity"):
            salted_skew_join(big, small, ["k"], buckets=4, how=how)
    # the safe set still works
    assert salted_skew_join(big, small, ["k"], how="left").count() == 1


def test_spread_parallelizes_single_split_scan(spark, sf_dir):
    """r16 optimization pin (guide §2.5): the local parquet fixtures
    arrive as ONE scan partition (single row group), so heavy map
    chains serialized until ``spread``. Pins that (a) spread raises
    the partition count of a single-split scan to defaultParallelism,
    (b) it preserves the row multiset exactly, and (c) it is a no-op
    when the input already has enough partitions."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        out = spread(docs)
        assert out.rdd.getNumPartitions() == target
        a = sorted(map(tuple, docs.collect()))
        b = sorted(map(tuple, out.collect()))
        assert a == b
    wide = docs.repartition(target)
    assert spread(wide) is wide  # no-op branch returns the input
