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


def _register() -> None:
    registry.register("k_anonymity_audit", k_anonymity_audit, K_ANONYMITY_ORACLE)
