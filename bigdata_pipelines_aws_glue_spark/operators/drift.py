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
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    stable_round,
)
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




# ---------------------------------------------------------------------------
# Population Stability Index (distribution drift across time periods)
# ---------------------------------------------------------------------------

#: period boundary: orders before this date are the baseline
#: population, the rest the current one.
_PSI_SPLIT_DATE = "1998-01-01"

#: decile bins of the POOLED distribution (the standard PSI binning).
_PSI_BINS = 10


def psi_order_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    baseline (orders before {split}) vs current — THE standard model-
    monitoring drift metric (credit-scoring practice; PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 action):

        PSI = sum_bins (p_i - q_i) * ln(p_i / q_i)

    over decile bins of the POOLED distribution (one exact-percentile
    1-row aggregate, the ``equidepth_histogram`` pairing), with +1
    Laplace smoothing on the bin counts so an empty bin cannot produce
    ln(0) (documented deviation shared by both engines). Each term is
    computed in one pinned double order and 1e-9-quantized before the
    exact sum; the output carries the per-bin decomposition AND the
    total on every row (bin-bounded output)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_totalprice").alias("v"),
        (F.to_date("o_orderdate") < F.lit(_PSI_SPLIT_DATE).cast("date"))
        .cast("int")
        .alias("is_base"),
    )
    qs = [i / _PSI_BINS for i in range(1, _PSI_BINS)]
    th = base.agg(
        *[
            F.expr(f"percentile(v, {q})").alias(f"t{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    j = base.crossJoin(F.broadcast(th))
    bucket = F.lit(1)
    for i in range(1, _PSI_BINS):
        bucket = bucket + (F.col("v") > F.col(f"t{i}")).cast("int")
    binned = j.select(bucket.alias("bin"), "is_base").groupBy("bin").agg(
        F.sum("is_base").cast("long").alias("nb"),
        F.sum(F.lit(1) - F.col("is_base")).cast("long").alias("nc"),
    )
    tot = F.broadcast(
        binned.agg(
            F.sum("nb").cast("long").alias("tb"),
            F.sum("nc").cast("long").alias("tc"),
        )
    )
    g = binned.crossJoin(tot)
    p = (F.col("nb").cast("double") + F.lit(1.0)) / (
        F.col("tb").cast("double") + F.lit(float(_PSI_BINS))
    )
    q = (F.col("nc").cast("double") + F.lit(1.0)) / (
        F.col("tc").cast("double") + F.lit(float(_PSI_BINS))
    )
    term_q = F.floor((p - q) * F.log(p / q) * 1e9 + F.lit(0.5)).cast("long")
    per_bin = g.select(
        "bin",
        "nb",
        "nc",
        stable_round(p, 9).alias("p_base"),
        stable_round(q, 9).alias("q_current"),
        (term_q.cast("double") / 1e9).alias("psi_term"),
        term_q.alias("_tq"),
    )
    total = F.broadcast(
        per_bin.agg((F.sum("_tq").cast("double") / 1e9).alias("psi_total"))
    )
    return per_bin.crossJoin(total).select(
        "bin",
        F.col("nb").alias("n_baseline"),
        F.col("nc").alias("n_current"),
        "p_base",
        "q_current",
        "psi_term",
        stable_round(F.col("psi_total"), 9).alias("psi_total"),
    )


def _psi_oracle() -> str:
    qs = [i / _PSI_BINS for i in range(1, _PSI_BINS)]
    th_sql = ",\n           ".join(
        f"quantile_cont(v, {q}) AS t{i}" for i, q in enumerate(qs, start=1)
    )
    bucket = "1 + " + " + ".join(
        f"CASE WHEN v > t{i} THEN 1 ELSE 0 END" for i in range(1, _PSI_BINS)
    )
    p = (
        f"((CAST(nb AS DOUBLE) + 1.0)"
        f" / (CAST(tb AS DOUBLE) + {float(_PSI_BINS)}))"
    )
    q = (
        f"((CAST(nc AS DOUBLE) + 1.0)"
        f" / (CAST(tc AS DOUBLE) + {float(_PSI_BINS)}))"
    )
    term_q = (
        f"CAST(floor(({p} - {q}) * ln({p} / {q}) * 1e9 + 0.5) AS BIGINT)"
    )
    return f"""
WITH base AS (
    SELECT o_totalprice AS v,
           CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_PSI_SPLIT_DATE}'
                THEN 1 ELSE 0 END AS is_base
    FROM orders
),
th AS (
    SELECT {th_sql}
    FROM base
),
binned AS (
    SELECT ({bucket}) AS bin,
           CAST(sum(is_base) AS BIGINT) AS nb,
           CAST(sum(1 - is_base) AS BIGINT) AS nc
    FROM base CROSS JOIN th
    GROUP BY 1
),
tot AS (
    SELECT CAST(sum(nb) AS BIGINT) AS tb, CAST(sum(nc) AS BIGINT) AS tc
    FROM binned
),
per_bin AS (
    SELECT bin, nb, nc,
           floor({p} * 1e9 + 0.5) / 1e9 AS p_base,
           floor({q} * 1e9 + 0.5) / 1e9 AS q_current,
           {term_q} AS tq
    FROM binned CROSS JOIN tot
),
total AS (SELECT CAST(sum(tq) AS BIGINT) AS psi_q FROM per_bin)
SELECT CAST(bin AS INTEGER) AS bin,
       nb AS n_baseline, nc AS n_current,
       p_base, q_current,
       CAST(tq AS DOUBLE) / 1e9 AS psi_term,
       floor(CAST(psi_q AS DOUBLE) / 1e9 * 1e9 + 0.5) / 1e9 AS psi_total
FROM per_bin CROSS JOIN total
"""


def _register() -> None:
    registry.register("split_token_drift", split_token_drift, SPLIT_DRIFT_ORACLE)
    registry.register(
        "psi_order_value_drift", psi_order_value_drift, _psi_oracle()
    )
