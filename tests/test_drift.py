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
