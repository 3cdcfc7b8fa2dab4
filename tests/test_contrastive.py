"""Contrastive mining invariants: label constraints, the near-dup
ceiling, rank contiguity, and pairs/triplets consistency."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.contrastive import (
    DUP_THRESHOLD,
    N_NEGATIVES,
    contrastive_triplets,
    hard_negative_pairs,
)


def test_hard_negatives_respect_constraints(spark, sf_dir):
    rows = hard_negative_pairs(spark, sf_dir).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r["score"] < DUP_THRESHOLD
        assert 1 <= r["rank"] <= N_NEGATIVES
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rs in by_anchor.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [x["score"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_triplets_consistent_with_pairs(spark, sf_dir):
    trip = {r["anchor_id"]: r for r in contrastive_triplets(spark, sf_dir).collect()}
    pairs = hard_negative_pairs(spark, sf_dir).collect()
    rank1 = {r["anchor_id"]: r for r in pairs if r["rank"] == 1}
    for anchor, t in trip.items():
        assert t["margin"] is not None
        # margin is the rounded difference of the unrounded scores:
        # within a half-ulp of the rounded-score difference
        assert abs(t["margin"] - (t["pos_score"] - t["neg_score"])) < 2e-8
        if anchor in rank1:
            assert t["negative_id"] == rank1[anchor]["negative_id"]
            assert t["neg_score"] == rank1[anchor]["score"]


def test_triplet_labels(spark, sf_dir):
    import pyspark.sql.functions as F

    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    emb = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for t in contrastive_triplets(spark, sf_dir).collect():
        assert emb[t["positive_id"]] == t["anchor_label"]
        assert emb[t["negative_id"]] != t["anchor_label"]
        assert t["positive_id"] != t["anchor_id"]
