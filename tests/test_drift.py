"""Semantic checks for ``operators/drift.py``."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.drift import (
    split_token_drift,
)


def test_drift_contract(spark, sf_dir):
    rows = {r.split: r for r in split_token_drift(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    # train vs itself is exactly zero by construction
    assert rows["train"].kl_from_train == 0.0
    assert rows["train"].tv_from_train == 0.0
    # the real divergences are positive but small: same generator
    # produced every split, so anything >= 0.5 TV would mean the
    # split hash is biased
    for s in ("val", "test"):
        assert 0 < rows[s].kl_from_train < 0.5
        assert 0 < rows[s].tv_from_train < 0.5
        assert rows[s].n_tokens > 0
        assert 0 < rows[s].vocab_seen
    # token conservation: split totals must add to the corpus total
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
    ).first()[0]
    assert sum(r.n_tokens for r in rows.values()) == total


def test_tv_matches_direct_computation(spark, sf_dir):
    """Recompute TV(train, val) driver-side from raw token counts —
    the exact-rational Spark path must agree to output rounding."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        _SHUFFLE_MOD,
        _SPLIT_SEED,
        _TRAIN_HI,
        _VAL_HI,
    )
    import hashlib
    from collections import Counter

    counts = {"train": Counter(), "val": Counter(), "test": Counter()}
    for d in docs:
        h = hashlib.md5(f"{d.doc_id}:{_SPLIT_SEED}".encode()).hexdigest()
        u = int(h[:15], 16) % _SHUFFLE_MOD
        s = "train" if u < _TRAIN_HI else ("val" if u < _VAL_HI else "test")
        # strip(' ') mirrors F.trim exactly (spaces only, not \t/\n)
        counts[s].update(d.text.strip(" ").split(" "))
    vocab = set().union(*counts.values())
    v = len(vocab)
    n_tr = sum(counts["train"].values())
    n_val = sum(counts["val"].values())
    tv = sum(
        abs(
            (counts["val"][t] + 1) * (n_tr + v)
            - (counts["train"][t] + 1) * (n_val + v)
        )
        for t in vocab
    ) / (2.0 * (n_tr + v) * (n_val + v))
    got = {
        r.split: r.tv_from_train
        for r in split_token_drift(spark, sf_dir).collect()
    }
    assert math.isclose(got["val"], tv, abs_tol=1e-8)


def test_psi_python_replay(spark, sf_dir):
    """numpy replay: same pooled-decile bins, Laplace smoothing, and
    quantized terms."""
    import math

    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.drift import (
        _PSI_BINS,
        _PSI_SPLIT_DATE,
        psi_order_value_drift,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    got = sorted(
        psi_order_value_drift(spark, sf_dir).collect(), key=lambda r: r["bin"]
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    v = od["o_totalprice"].to_numpy(float)
    is_base = (
        od["o_orderdate"].astype("datetime64[ns]")
        < np.datetime64(_PSI_SPLIT_DATE)
    ).to_numpy()
    ths = [
        np.percentile(v, 100 * i / _PSI_BINS, method="linear")
        for i in range(1, _PSI_BINS)
    ]
    bins = 1 + sum((v > t).astype(int) for t in ths)
    psi = 0
    for r in got:
        m = bins == r["bin"]
        nb, nc = int((m & is_base).sum()), int((m & ~is_base).sum())
        assert (r["n_baseline"], r["n_current"]) == (nb, nc)
        p = (nb + 1) / (is_base.sum() + _PSI_BINS)
        q = (nc + 1) / ((~is_base).sum() + _PSI_BINS)
        tq = math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
        assert abs(r["psi_term"] - tq / 1e9) < 2e-9
        psi += tq
    for r in got:
        assert abs(r["psi_total"] - psi / 1e9) < 2e-9
    # drift direction sanity: both populations non-trivial
    assert sum(r["n_baseline"] for r in got) > 0
    assert sum(r["n_current"] for r in got) > 0
    assert got[0]["psi_total"] >= 0.0  # PSI is nonnegative


def test_markov_python_replay(spark, sf_dir):
    """Transition counts from a pandas groupby replay; stationary
    vector sums to ~1 and is a fixed point of the quantized update."""
    import math

    from bigdata_pipelines_aws_glue_spark.operators.events_time import (
        markov_event_transitions,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    got = markov_event_transitions(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas().sort_values(["user_id", "ts", "event_id"])
    from collections import defaultdict

    counts = defaultdict(int)
    for _, grp in ev.groupby("user_id"):
        ts = grp["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            counts[(a, b)] += 1
    assert {(r["from_type"], r["to_type"]): r["n_transitions"]
            for r in got} == dict(counts)
    # row-stochastic: per from_type the p's sum to ~1
    from_p = defaultdict(float)
    for r in got:
        from_p[r["from_type"]] += r["p_transition"]
    for s in from_p.values():
        assert abs(s - 1.0) < 1e-6
    # stationary distribution sums to ~1 (one value per from_type)
    stat = {r["from_type"]: r["stationary_from"] for r in got}
    assert abs(sum(stat.values()) - 1.0) < 1e-3
