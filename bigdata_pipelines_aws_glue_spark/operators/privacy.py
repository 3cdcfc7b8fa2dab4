"""K-anonymity audit over the generalization ladder.

Training corpora carry quasi-identifiers (language, source, length —
metadata that can single out a document or its author even with
direct identifiers scrubbed; Sweeney 2002's k-anonymity is the
standard release criterion). ``k_anonymity_audit`` measures, for
each level of the QI generalization ladder, how many rows would sit
in equivalence classes smaller than ``K_ANON`` if the corpus were
released at that granularity:

  L0  (lang, source, n_chars/64)   — finest, most useful, least safe
  L1  (lang, source, n_chars/256)
  L2  (lang, source)
  L3  (lang)
  L4  ()                           — one class, always k-anonymous

The output is the privacy/utility trade-off curve a release decision
reads directly: pick the finest level whose ``rows_below_k`` is
acceptable (or suppress exactly that residue).

Shape at 100 TB: each level is one keyed count over the corpus —
class cardinality is bounded by the QI domain (langs x sources x
buckets), so the per-level rollup is vocab-sized and the five levels
are computed from ONE shared (full-QI class -> count) aggregate,
i.e. a single corpus scan feeds the whole ladder. Everything is
exact integer arithmetic; the DuckDB twin hash-checks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

K_ANON = 5
#: level -> grouping columns over the L0 class table (n64 = n_chars/64
#: bucket; n256 is derivable from n64 because 256 is a multiple of 64).
_LEVELS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("L0_lang_source_len64", ("lang", "source", "n64")),
    ("L1_lang_source_len256", ("lang", "source", "n256")),
    ("L2_lang_source", ("lang", "source")),
    ("L3_lang", ("lang",)),
    ("L4_all", ()),
)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one corpus scan: the finest-level class table feeds every level
    base = (
        docs.select(
            "lang",
            "source",
            F.floor(F.col("n_chars") / F.lit(64)).alias("n64"),
        )
        .groupBy("lang", "source", "n64")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n256", F.floor(F.col("n64") / F.lit(4)))
    )
    out = None
    for name, keys in _LEVELS:
        classes = (
            base.groupBy(*keys).agg(F.sum("n").alias("cls"))
            if keys
            else base.agg(F.sum("n").alias("cls"))
        )
        row = classes.agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("cls").alias("min_class"),
            F.sum(
                F.when(F.col("cls") < K_ANON, F.col("cls")).otherwise(
                    F.lit(0)
                )
            ).alias("rows_below_k"),
            F.sum(
                (F.col("cls") < K_ANON).cast("long")
            ).alias("classes_below_k"),
        ).select(
            F.lit(name).alias("level"),
            "n_classes",
            "min_class",
            "rows_below_k",
            "classes_below_k",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("level")


def _level_sql(name: str, keys: tuple[str, ...]) -> str:
    grp = f"GROUP BY {', '.join(keys)}" if keys else ""
    return f"""SELECT '{name}' AS level,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(cls) AS BIGINT) AS min_class,
       CAST(sum(CASE WHEN cls < {K_ANON} THEN cls ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CAST(sum(CASE WHEN cls < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k
FROM (SELECT sum(n) AS cls FROM base {grp})"""


K_ANONYMITY_ORACLE = f"""WITH base AS MATERIALIZED (
    SELECT lang, source,
           CAST(floor(CAST(n_chars AS DOUBLE) / 64.0) AS BIGINT) AS n64,
           CAST(floor(CAST(n_chars AS DOUBLE) / 64.0 / 4.0) AS BIGINT)
             AS n256,
           CAST(count(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2, 3, 4
)
{f"{chr(10)}UNION ALL{chr(10)}".join(_level_sql(n, k) for n, k in _LEVELS)}
ORDER BY level
"""


L_DIV = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the screen
    k-anonymity misses: a class can hold k rows yet leak the sensitive
    attribute if they all SHARE it. QI = (source, n_chars/256 bucket),
    sensitive = ``lang``. Per QI class: distinct-l (count of distinct
    sensitive values) and entropy-l (exp of the Shannon entropy of the
    sensitive distribution — the stricter criterion); the summary
    counts classes/rows failing distinct-l >= 3 and reports the
    corpus-wide minima a release decision reads.

    One corpus scan feeds a (QI, lang)-keyed count whose cardinality
    is bounded by |sources| x |length buckets| x |langs| — everything
    after the first aggregate is vocab-sized. Entropy's n*ln(n)
    addends are 1e-9-quantized to ints per CELL before summing
    (order-independent; libm-safety precedent), all else exact
    integers."""
    docs = load_table(spark, sf_dir, "documents")
    cell = (
        docs.select(
            "source",
            F.floor(F.col("n_chars") / F.lit(256)).alias("nb"),
            "lang",
        )
        .groupBy("source", "nb", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cls = cell.groupBy("source", "nb").agg(
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("distinct_l"),
        # entropy = ln(rows) - (1/rows) * sum(n * ln(n)). The n*ln(n)
        # addends are 1e-9-quantized to ints BEFORE the sum (double
        # addition is order-dependent across engines — the
        # quantized_sum discipline), so the sum is exact.
        F.sum(
            F.floor(
                F.col("n").cast("double")
                * F.log(F.col("n").cast("double"))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            ).cast("long")
        ).alias("sum_nlnn_q"),
    )
    entropy = F.log(F.col("rows").cast("double")) - (
        F.col("sum_nlnn_q").cast("double") / F.lit(1000000000.0)
    ) / F.col("rows").cast("double")
    per_class = cls.select(
        "source",
        "nb",
        "rows",
        "distinct_l",
        (F.floor(entropy * F.lit(1000000000.0) + F.lit(0.5))
         / F.lit(1000000000.0)).alias("entropy_q"),
    )
    return per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("rows").cast("long").alias("n_rows"),
        F.min("distinct_l").cast("long").alias("min_distinct_l"),
        F.sum((F.col("distinct_l") < L_DIV).cast("long")).alias(
            "classes_below_l"
        ),
        F.sum(
            F.when(F.col("distinct_l") < L_DIV, F.col("rows")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("rows_below_l"),
        F.min("entropy_q").alias("min_entropy_q"),
    )


L_DIVERSITY_ORACLE = f"""
WITH cell AS (
    SELECT source,
           CAST(floor(CAST(n_chars AS DOUBLE) / 256.0) AS BIGINT) AS nb,
           lang, count(*) AS n
    FROM documents GROUP BY 1, 2, 3
),
cls AS (
    SELECT source, nb, sum(n) AS rows, count(*) AS distinct_l,
           sum(CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                          * 1000000000.0 + 0.5) AS BIGINT)) AS sum_nlnn_q
    FROM cell GROUP BY source, nb
),
per_class AS (
    SELECT rows, distinct_l,
           floor((ln(CAST(rows AS DOUBLE))
                  - (CAST(sum_nlnn_q AS DOUBLE) / 1000000000.0)
                    / CAST(rows AS DOUBLE))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS entropy_q
    FROM cls
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(rows) AS BIGINT) AS n_rows,
       CAST(min(distinct_l) AS BIGINT) AS min_distinct_l,
       CAST(sum(CASE WHEN distinct_l < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
           AS classes_below_l,
       CAST(sum(CASE WHEN distinct_l < {L_DIV} THEN rows ELSE 0 END) AS BIGINT)
           AS rows_below_l,
       min(entropy_q) AS min_entropy_q
FROM per_class
"""


def _register() -> None:
    registry.register("k_anonymity_audit", k_anonymity_audit, K_ANONYMITY_ORACLE)
    registry.register("l_diversity_audit", l_diversity_audit, L_DIVERSITY_ORACLE)
