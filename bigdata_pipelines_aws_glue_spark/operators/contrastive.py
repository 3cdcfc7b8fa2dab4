"""Contrastive-training pair mining over embeddings ([north-star]
N3/LLM-pipeline adjacency; no reference citation — the reference has
no embeddings). The curation step between ANN search and a
contrastive fine-tune: for every anchor, mine *hard negatives*
(highest-cosine vectors with a DIFFERENT label that are not
near-duplicates) and build (anchor, positive, negative) triplets with
their margins — the data a triplet/InfoNCE loss consumes.

Semantics:

- **hard negative** = different ``label``, cosine < ``DUP_THRESHOLD``
  (a diff-label vector at >= 0.95 cosine is treated as a labeling
  near-dup/noise pair, not a training signal — mining it as a
  negative would push apart near-identical points), ranked by cosine
  DESC: the closest non-duplicate impostors.
- **positive** = same ``label``, highest cosine (the nearest
  same-class view); anchors with no same-label partner drop out of
  the triplet set (inner join semantics, mirrored by the oracle).

Scale posture: identical to ``cosine_topk``
(``operators/similarity.py:59``) — the anchor set is broadcast, the
corpus never shuffles, scoring is ``zip_with``/``aggregate`` JVM
fold math, and the per-anchor ranking is a bounded window (local
top-k heaps). The label inequality rides the broadcast join
condition, so candidate generation stays a map over the corpus. At
100 TB the anchor set is the bounded side by construction (you mine
hard negatives for a training batch, not for the whole corpus); for
corpus x corpus mining the LSH/MIH bucketed families are the
candidate generators and this operator re-scores their candidate
lists unchanged.

All math casts float -> double first so DuckDB's double
``list_dot_product`` matches bit-for-bit; emitted scores go through
``stable_round`` (8 digits) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.operators.similarity import (
    N_QUERIES,
    _as_double,
    dot,
    norm,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: diff-label pairs at or above this cosine are near-dup/label-noise
#: suspects, excluded from the negative pool.
DUP_THRESHOLD = 0.95
N_NEGATIVES = 5


def _anchor_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            _as_double(F.col("embedding")).alias("av"),
        )
        .withColumn("an", norm(F.col("av")))
    )
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        _as_double(F.col("embedding")).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    return anchors, corpus


def hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``N_NEGATIVES`` hardest negatives per anchor: different
    label, below the near-dup ceiling, highest cosine. Broadcast
    anchors x corpus map, bounded window top-k."""
    anchors, corpus = _anchor_corpus(spark, sf_dir)
    scored = corpus.join(
        F.broadcast(anchors),
        (F.col("anchor_id") != F.col("cand_id"))
        & (F.col("anchor_label") != F.col("cand_label")),
    ).select(
        "anchor_id",
        "cand_id",
        "cand_label",
        (dot(F.col("av"), F.col("cv")) / (F.col("an") * F.col("cn"))).alias(
            "score"
        ),
    ).filter(F.col("score") < F.lit(DUP_THRESHOLD))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= N_NEGATIVES)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("cand_label").alias("negative_label"),
            "rank",
            stable_round(F.col("score"), 8).alias("score"),
        )
    )


HARD_NEGATIVE_ORACLE = f"""
WITH a AS (
    SELECT vec_id AS anchor_id, label AS anchor_label,
           embedding::DOUBLE[] AS av
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS cand_id, label AS cand_label,
           embedding::DOUBLE[] AS cv
    FROM embeddings
),
scored AS (
    SELECT anchor_id, cand_id, cand_label,
           list_dot_product(av, cv)
             / (sqrt(list_dot_product(av, av))
                * sqrt(list_dot_product(cv, cv))) AS score
    FROM a JOIN c
      ON anchor_id <> cand_id AND anchor_label <> cand_label
),
ranked AS (
    SELECT anchor_id, cand_id, cand_label, score,
           row_number() OVER (PARTITION BY anchor_id
                              ORDER BY score DESC, cand_id) AS rank
    FROM scored WHERE score < {DUP_THRESHOLD}
)
SELECT anchor_id, cand_id AS negative_id,
       cand_label AS negative_label, CAST(rank AS INT) AS rank,
       floor(score * 100000000.0 + 0.5) / 100000000.0 AS score
FROM ranked WHERE rank <= {N_NEGATIVES}
"""


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, hardest positive, hardest negative) with the cosine
    margin the triplet loss would see. Positive = nearest same-label
    vector; negative = nearest different-label vector below the
    near-dup ceiling. Two bounded window picks over one broadcast
    scoring pass (the corpus is scored once, not once per role)."""
    anchors, corpus = _anchor_corpus(spark, sf_dir)
    scored = corpus.join(
        F.broadcast(anchors), F.col("anchor_id") != F.col("cand_id")
    ).select(
        "anchor_id",
        "anchor_label",
        "cand_id",
        "cand_label",
        (dot(F.col("av"), F.col("cv")) / (F.col("an") * F.col("cn"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("cand_id")
    )
    pos = (
        scored.filter(F.col("anchor_label") == F.col("cand_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("cand_id").alias("positive_id"),
            F.col("score").alias("pos_raw"),
        )
    )
    neg = (
        scored.filter(
            (F.col("anchor_label") != F.col("cand_label"))
            & (F.col("score") < F.lit(DUP_THRESHOLD))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("score").alias("neg_raw"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "anchor_label",
        "positive_id",
        stable_round(F.col("pos_raw"), 8).alias("pos_score"),
        "negative_id",
        stable_round(F.col("neg_raw"), 8).alias("neg_score"),
        stable_round(F.col("pos_raw") - F.col("neg_raw"), 8).alias(
            "margin"
        ),
    )


TRIPLET_ORACLE = f"""
WITH a AS (
    SELECT vec_id AS anchor_id, label AS anchor_label,
           embedding::DOUBLE[] AS av
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS cand_id, label AS cand_label,
           embedding::DOUBLE[] AS cv
    FROM embeddings
),
scored AS (
    SELECT anchor_id, anchor_label, cand_id, cand_label,
           list_dot_product(av, cv)
             / (sqrt(list_dot_product(av, av))
                * sqrt(list_dot_product(cv, cv))) AS score
    FROM a JOIN c ON anchor_id <> cand_id
),
pos AS (
    SELECT anchor_id, anchor_label, cand_id AS positive_id,
           score AS pos_raw,
           row_number() OVER (PARTITION BY anchor_id
                              ORDER BY score DESC, cand_id) AS rn
    FROM scored WHERE anchor_label = cand_label
),
neg AS (
    SELECT anchor_id, cand_id AS negative_id, score AS neg_raw,
           row_number() OVER (PARTITION BY anchor_id
                              ORDER BY score DESC, cand_id) AS rn
    FROM scored
    WHERE anchor_label <> cand_label AND score < {DUP_THRESHOLD}
)
SELECT p.anchor_id, p.anchor_label, p.positive_id,
       floor(p.pos_raw * 100000000.0 + 0.5) / 100000000.0 AS pos_score,
       n.negative_id,
       floor(n.neg_raw * 100000000.0 + 0.5) / 100000000.0 AS neg_score,
       floor((p.pos_raw - n.neg_raw) * 100000000.0 + 0.5) / 100000000.0
           AS margin
FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
WHERE p.rn = 1 AND n.rn = 1
"""


def _register() -> None:
    registry.register(
        "hard_negative_pairs", hard_negative_pairs, HARD_NEGATIVE_ORACLE
    )
    registry.register(
        "contrastive_triplets", contrastive_triplets, TRIPLET_ORACLE
    )
