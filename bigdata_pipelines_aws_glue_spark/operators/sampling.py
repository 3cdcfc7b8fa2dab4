"""Sampling & shuffling operators (training-data pipeline staples,
[north-star]-adjacent: corpus subsetting and example-order
randomization at 100 TB).

- ``stratified_sample``: per-stratum Bernoulli sampling via a
  deterministic hash-uniform — executor-local, no shuffle at all, and
  reproducible across engines (oracle-checked).
- ``deterministic_shuffle``: a *reproducible* global permutation via a
  modular-multiplication hash of the key — unlike ``orderBy(rand())``
  this is stable across runs/cluster layouts AND mirrorable in the
  DuckDB oracle. At scale the sort is a range exchange; for
  shard-local shuffling use ``repartition(k, key)`` + per-partition
  sort on the same hash (no global exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: odd multiplier for the permutation hash (fits in signed 64-bit
#: arithmetic for doc_id < ~9e9 without ANSI overflow)
_SHUFFLE_PRIME = 999_999_937
_SHUFFLE_MOD = 1_000_000_007


def shuffle_key(key, seed: int = 42):
    """(key * P + seed) % M — a fixed pseudo-random permutation."""
    return (key * F.lit(_SHUFFLE_PRIME) + F.lit(seed)) % F.lit(_SHUFFLE_MOD)


def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle: shuffle_rank is a permutation of
    1..N, identical on every run and engine."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(shuffle_key(F.col("doc_id")), F.col("doc_id"))
    return docs.select(
        "doc_id",
        shuffle_key(F.col("doc_id")).alias("shuffle_hash"),
        F.row_number().over(w).alias("shuffle_rank"),
    )


SHUFFLE_ORACLE = f"""
SELECT doc_id,
       (doc_id * {_SHUFFLE_PRIME} + 42) % {_SHUFFLE_MOD} AS shuffle_hash,
       CAST(row_number() OVER (
           ORDER BY (doc_id * {_SHUFFLE_PRIME} + 42) % {_SHUFFLE_MOD}, doc_id
       ) AS INT) AS shuffle_rank
FROM documents
"""


#: per-language keep fractions (downsample dominant strata)
STRATA_FRACTIONS = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.25}

#: seed decorrelating the Bernoulli uniforms from the shuffle permutation
_STRATA_SEED = 7


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sample (the language-balancing step of
    corpus curation): keep a row iff its hash-uniform < the stratum's
    keep fraction. Deterministic hash-Bernoulli instead of RNG-stream
    ``sampleBy``: the draw is identical across runs, cluster layouts
    AND engines (oracle-checked), and re-sampling a grown corpus keeps
    previously-kept rows stable — the idempotence that matters when
    the 100 TB corpus is re-curated incrementally. Executor-local
    filter, no shuffle; the predicate is a plain expression, so it
    survives column pruning and whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    u = shuffle_key(F.col("doc_id"), seed=_STRATA_SEED).cast(
        "double"
    ) / F.lit(float(_SHUFFLE_MOD))
    frac = F.lit(0.0)
    for lang, keep in STRATA_FRACTIONS.items():
        frac = F.when(F.col("lang") == lang, F.lit(keep)).otherwise(frac)
    return docs.filter(u < frac).select("doc_id", "lang", "source")


_STRATA_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {keep}" for lang, keep in STRATA_FRACTIONS.items()
) + " ELSE 0.0 END"

STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE CAST((doc_id * {_SHUFFLE_PRIME} + {_STRATA_SEED}) % {_SHUFFLE_MOD}
           AS DOUBLE) / {float(_SHUFFLE_MOD)} < {_STRATA_CASE}
"""


#: sample size for the weighted draw
WEIGHTED_K = 100


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): draw ``WEIGHTED_K`` documents with inclusion probability
    proportional to a quality weight (here ``n_chars``), as one
    distributed top-k — no sequential reservoir, no driver state.

    Per row: u = hash-uniform in (0,1], key = ln(u)/w; the k largest
    keys are exactly a weight-proportional draw (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir").
    Using the deterministic ``shuffle_key`` hash for u makes the draw
    reproducible across runs AND engines (so it is oracle-checked,
    unlike RNG-stream sampling). Physical plan: TakeOrderedAndProject
    — per-partition heaps of size k, then a k-sized merge on the
    driver; no global sort, no shuffle of the full table at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (shuffle_key(F.col("doc_id")) + F.lit(1)).cast("double")
        / F.lit(float(_SHUFFLE_MOD + 1))
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
        .select("doc_id", "lang", "weight")
    )


WEIGHTED_ORACLE = f"""
SELECT doc_id, lang, n_chars AS weight
FROM documents
ORDER BY ln(CAST((doc_id * {_SHUFFLE_PRIME} + 42) % {_SHUFFLE_MOD} + 1 AS DOUBLE)
            / {float(_SHUFFLE_MOD + 1)}) / CAST(n_chars AS DOUBLE) DESC,
         doc_id ASC
LIMIT {WEIGHTED_K}
"""


def _register() -> None:
    registry.register(
        "deterministic_shuffle", deterministic_shuffle, SHUFFLE_ORACLE
    )
    registry.register(
        "stratified_sample", stratified_sample, STRATIFIED_ORACLE
    )
    registry.register("weighted_sample_topk", weighted_sample_topk, WEIGHTED_ORACLE)
