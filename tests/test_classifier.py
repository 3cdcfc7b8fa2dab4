"""Semantic checks for ``operators/classifier.py`` (the hash oracle
covers cross-engine value equality; these pin the learning contract:
the student must actually absorb the Gopher teacher)."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.classifier import (
    FEATURES,
    GD_ROUNDS,
    quality_classifier_train,
    quality_classifier_weights,
)
from bigdata_pipelines_aws_glue_spark.operators.text import gopher_flags


def test_gd_loss_monotone_and_accuracy_improves(spark, sf_dir):
    hist = {
        r.round: r
        for r in quality_classifier_train(spark, sf_dir).collect()
    }
    assert set(hist) == set(range(1, GD_ROUNDS + 1))
    nlls = [hist[i].mean_nll for i in range(1, GD_ROUNDS + 1)]
    # Full-batch GD at this LR on a linearly-benign problem: strictly
    # decreasing NLL round over round.
    assert all(a > b for a, b in zip(nlls, nlls[1:])), nlls
    # Round 1 scores the zero-weight model: p == 0.5 for every doc, so
    # nll == ln 2 exactly and n_correct == #(y == 1) (0.5 >= 0.5 tie).
    assert abs(hist[1].mean_nll - 0.693147) < 1e-6
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_keep = gopher_flags(docs).filter("keep").count()
    assert hist[1].n_correct == n_keep
    # The trained model must beat the zero model on its training set.
    assert hist[GD_ROUNDS].n_correct > hist[1].n_correct


def test_weights_shape_and_signal(spark, sf_dir):
    rows = quality_classifier_weights(spark, sf_dir).collect()
    assert [r.feature for r in rows] == [name for name, _ in FEATURES]
    w = {r.feature: r.weight for r in rows}
    assert all(abs(v) > 0 for v in w.values())
    # Stopword density is the one feature that separates keeps from
    # drops without acting as a proxy bias (alpha ratio is ~1.0 for
    # nearly every doc, so with a minority keep class it — like the
    # bias — learns negative). It must carry the largest positive
    # weight.
    assert w["stop_hits_over_5"] > 0
    assert w["stop_hits_over_5"] == max(w.values())
    assert w["bias"] < 0  # keeps are the minority class


def test_training_cached_per_session(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators import classifier

    quality_classifier_weights(spark, sf_dir).collect()
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in classifier._TRAIN_CACHE
    before = classifier._TRAIN_CACHE[key]
    quality_classifier_train(spark, sf_dir).collect()
    assert classifier._TRAIN_CACHE[key] is before
