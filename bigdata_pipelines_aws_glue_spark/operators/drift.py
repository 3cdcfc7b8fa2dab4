"""Split-distribution drift: does val/test look like train?

A held-out split that drifts from the training distribution silently
invalidates eval numbers, so a curation pipeline audits its own
split: compare each split's unigram token distribution against
train's with two divergences —

- **KL(train ‖ s)** over the add-one-smoothed corpus vocabulary,
  per-token terms 1e-12-quantized to longs before summing (the
  aggregation-order-independent float discipline; ``ln`` parity
  between Java and DuckDB is already attested by the BM25 /
  LM-perplexity oracles at 1e-9 per term).
- **Total variation** computed EXACTLY: with add-one smoothing both
  probabilities are rationals over fixed denominators, so
  ``|p−q|`` per token is an integer numerator over
  ``(N_tr+V)(N_s+V)`` — summed as ``DECIMAL(38,0)``/HUGEINT with a
  single final division. No float in the loop at all.

The split assignment is the attested append-stable md5 hash from
``sampling.train_val_test_split``; the token convention is the
corpus-wide ``split(trim(text), ' ')`` form shared by the text
suite. Shape at 100 TB: one explode + one (term)-keyed aggregation
pivoting the three splits into count columns (vocab-sized result),
a 1-row totals broadcast, then a vocab scan — no joins between
fact-sized tables, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.sampling import (
    _SPLIT_SEED,
    _TRAIN_HI,
    _VAL_HI,
    shuffle_key,
    shuffle_key_sql,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

_Q12 = 1_000_000_000_000.0
_SPLITS = ("train", "val", "test")


def split_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = shuffle_key(F.col("doc_id"), seed=_SPLIT_SEED)
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    toks = docs.select(
        split.alias("split"),
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    )
    tc = toks.groupBy("term").agg(
        *[
            F.sum((F.col("split") == s).cast("long")).alias(f"c_{s}")
            for s in _SPLITS
        ]
    )
    totals = tc.agg(
        *[F.sum(f"c_{s}").alias(f"n_{s}") for s in _SPLITS],
        F.count(F.lit(1)).alias("vocab"),
    )
    j = tc.crossJoin(F.broadcast(totals))

    def p(s: str):
        return (F.col(f"c_{s}") + F.lit(1)).cast("double") / (
            F.col(f"n_{s}") + F.col("vocab")
        ).cast("double")

    rows = []
    for s in _SPLITS:
        if s == "train":
            kl = F.lit(0.0)
            tv = F.lit(0.0)
        else:
            term_kl = p("train") * (F.log(p("train")) - F.log(p(s)))
            kl = F.sum(
                F.floor(term_kl * F.lit(_Q12) + F.lit(0.5))
            ) / F.lit(_Q12)
            # exact rational TV: integer numerators over the fixed
            # denominator product, HUGEINT-summed
            num = F.abs(
                (F.col(f"c_{s}") + F.lit(1)).cast("decimal(38,0)")
                * (F.col("n_train") + F.col("vocab")).cast("decimal(38,0)")
                - (F.col("c_train") + F.lit(1)).cast("decimal(38,0)")
                * (F.col(f"n_{s}") + F.col("vocab")).cast("decimal(38,0)")
            )
            tv = F.sum(num).cast("double") / (
                F.lit(2.0)
                * F.max(
                    (F.col("n_train") + F.col("vocab")).cast("double")
                )
                * F.max(
                    (F.col(f"n_{s}") + F.col("vocab")).cast("double")
                )
            )
        rows.append(
            j.agg(
                F.max(f"n_{s}").alias("n_tokens"),
                F.sum((F.col(f"c_{s}") > 0).cast("long")).alias(
                    "vocab_seen"
                ),
                F.floor(
                    (kl if s != "train" else F.max(kl))
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("double").alias("_klq"),
                F.floor(
                    (tv if s != "train" else F.max(tv))
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("double").alias("_tvq"),
            )
            .select(
                F.lit(s).alias("split"),
                "n_tokens",
                "vocab_seen",
                (F.col("_klq") / F.lit(1e9)).alias("kl_from_train"),
                (F.col("_tvq") / F.lit(1e9)).alias("tv_from_train"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("split")


def _p_sql(s: str) -> str:
    return (
        f"(CAST(c_{s} + 1 AS DOUBLE) / CAST(n_{s} + vocab AS DOUBLE))"
    )


def _split_row_sql(s: str) -> str:
    if s == "train":
        kl = "0.0"
        tv = "0.0"
    else:
        term_kl = (
            f"{_p_sql('train')} * (ln({_p_sql('train')}) - ln({_p_sql(s)}))"
        )
        kl = (
            f"(sum(floor(({term_kl}) * 1000000000000.0 + 0.5))"
            f" / 1000000000000.0)"
        )
        num = (
            f"abs(CAST((c_{s} + 1) AS HUGEINT) * (n_train + vocab)"
            f" - CAST((c_train + 1) AS HUGEINT) * (n_{s} + vocab))"
        )
        tv = (
            f"(CAST(sum({num}) AS DOUBLE)"
            f" / (2.0 * max(CAST(n_train + vocab AS DOUBLE))"
            f" * max(CAST(n_{s} + vocab AS DOUBLE))))"
        )
    return f"""SELECT '{s}' AS split,
       CAST(max(n_{s}) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c_{s} > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_seen,
       floor(({kl}) * 1000000000.0 + 0.5) / 1000000000.0
         AS kl_from_train,
       floor(({tv}) * 1000000000.0 + 0.5) / 1000000000.0
         AS tv_from_train
FROM j"""


SPLIT_DRIFT_ORACLE = f"""WITH
tok AS MATERIALIZED (
    SELECT CASE
             WHEN {shuffle_key_sql('doc_id', _SPLIT_SEED)} < {_TRAIN_HI}
             THEN 'train'
             WHEN {shuffle_key_sql('doc_id', _SPLIT_SEED)} < {_VAL_HI}
             THEN 'val' ELSE 'test' END AS split,
           unnest(string_split(trim(text), ' ')) AS term
    FROM documents
),
tc AS MATERIALIZED (
    SELECT term,
           {', '.join(f"sum(CASE WHEN split = '{s}' THEN 1 ELSE 0 END) AS c_{s}" for s in _SPLITS)}
    FROM tok GROUP BY term
),
tot AS MATERIALIZED (
    SELECT {', '.join(f"CAST(sum(c_{s}) AS BIGINT) AS n_{s}" for s in _SPLITS)},
           CAST(count(*) AS BIGINT) AS vocab
    FROM tc
),
j AS MATERIALIZED (SELECT * FROM tc CROSS JOIN tot)
{chr(10).join(f"{_split_row_sql(s)}{chr(10)}UNION ALL" for s in _SPLITS[:-1])}
{_split_row_sql(_SPLITS[-1])}
ORDER BY split
"""


def _register() -> None:
    registry.register("split_token_drift", split_token_drift, SPLIT_DRIFT_ORACLE)
