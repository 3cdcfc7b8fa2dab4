"""Training-batch curation operators ([north-star], BASELINE.json:6):
sequence packing and embedding quantization — the steps between a
deduplicated corpus and an actual training shard.

- Sequence packing: the standard concat-then-chunk layout — documents
  are laid end-to-end in a deterministic order and sliced into
  fixed-length token windows. Spark-first: a running-sum window
  PARTITIONED BY SHARD (lang here), so no global single-partition
  sort exists anywhere; each shard packs independently, exactly how a
  1000-executor job would write 1000 shard files.
- int8 quantization: per-vector absmax scaling (the layout ANN indexes
  and feature stores actually persist — 4x smaller, exact dequant
  scale kept alongside). Pure array expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

SEQ_LEN = 512


def pack_sequences(
    docs: DataFrame,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = SEQ_LEN,
) -> DataFrame:
    """Assign every document a (shard, chunk) slot in the packed token
    stream: token offsets via a per-shard running sum, chunk id =
    start_offset div seq_len. Documents may straddle a chunk boundary
    (standard pretraining packing semantics — the chunker splits them
    at materialization time); the assignment records where each doc's
    tokens begin.

    Scale: ROWS UNBOUNDED PRECEDING running sum within a shard is a
    single sort per shard partition — shards are the parallelism unit,
    mirroring per-output-file packing on a real cluster."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(shard_col).alias("shard"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("end_offset", F.sum("n_tokens").over(w))
        .withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
        .withColumn(
            "chunk_id",
            F.floor(F.col("start_offset") / F.lit(float(seq_len))),
        )
        .select(
            id_col, "shard", "n_tokens", "start_offset", "chunk_id"
        )
    )


def sequence_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs)


SEQUENCE_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang AS shard,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens
    FROM documents
),
offs AS (
    SELECT doc_id, shard, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) - n_tokens AS start_offset
    FROM t
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(floor(start_offset / {float(SEQ_LEN)}) AS BIGINT) AS chunk_id
FROM offs
"""


def chunk_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency per shard: how many chunks the shard needs
    and the fill ratio of the token stream against chunk capacity —
    the number a batch-shape owner actually monitors."""
    packed = sequence_pack_chunks(spark, sf_dir)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max("chunk_id") + 1).alias("n_chunks"),
        F.floor(
            F.sum("n_tokens").cast("double")
            / ((F.max("chunk_id") + 1) * SEQ_LEN).cast("double")
            * F.lit(1e4)
        ).alias("fill_bp"),
    )


CHUNK_FILL_ORACLE = f"""
WITH packed AS ({SEQUENCE_PACK_ORACLE})
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(chunk_id) + 1 AS BIGINT) AS n_chunks,
       CAST(floor(CAST(sum(n_tokens) AS DOUBLE)
             / CAST((max(chunk_id) + 1) * {SEQ_LEN} AS DOUBLE) * 1e4)
            AS BIGINT) AS fill_bp
FROM packed
GROUP BY shard
"""


def quantize_embeddings_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector absmax int8 quantization, pure array expressions:
    qvec[i] = floor(v[i] / scale * 127 + 0.5), scale = max |v[i]|.
    Zero vectors quantize to zeros with scale 0. Arithmetic is double
    end-to-end (float inputs upcast once), so the DuckDB twin is
    bit-identical."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / scale * F.lit(127.0) + F.lit(0.5)).cast(
                "tinyint"
            ),
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
        F.size(vec_col).alias("n_dims"),
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (driver-attestable) form of
    :func:`quantize_embeddings_int8`: ``qvec`` is serialized to a
    comma-joined string because the driver's pandas canonicalizer
    sorts/factorizes cells and cannot hash Python lists
    (CORRECTNESS_r02: ``TypeError: unhashable type: 'list'``). The
    array-typed ``array<tinyint>`` form remains the library function;
    the serialization is lossless (int8 values round-trip through
    decimal text exactly), so this string form attests every bit of
    the quantization."""
    q = quantize_embeddings_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
        "n_dims",
    )


EMBEDDING_QUANTIZE_ORACLE = """
WITH s AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
    FROM embeddings
),
q AS (
    SELECT vec_id, scale,
           CASE WHEN scale = 0
                THEN list_transform(embedding, x -> CAST(0 AS TINYINT))
                ELSE list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127e0 + 0.5e0) AS TINYINT))
           END AS qvec,
           CAST(len(embedding) AS INT) AS n_dims
    FROM s
)
SELECT vec_id, scale,
       array_to_string(list_transform(qvec, x -> CAST(x AS VARCHAR)), ',') AS qvec_csv,
       n_dims
FROM q
"""


def _funnel_stages(spark: SparkSession, sf_dir: str):
    """Shared funnel core: (docs, gopher-kept, exact-deduped,
    near-deduped, split expression). ``curation_funnel_report`` turns
    these into the attested per-stage counts; ``run_curation``
    materializes the survivors as a training corpus — same plans, so
    the report is exactly the manifest of what gets written."""
    from bigdata_pipelines_aws_glue_spark.operators.dedup import (
        neardup_verified_pairs,
    )
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        _SPLIT_SEED,
        _TRAIN_HI,
        _VAL_HI,
        shuffle_key,
    )
    from bigdata_pipelines_aws_glue_spark.operators.text import gopher_flags

    docs = load_table(spark, sf_dir, "documents")
    s1 = (
        gopher_flags(docs)
        .filter(F.col("keep"))
        .select("doc_id")
        .join(docs, "doc_id")
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    s2 = (
        s1.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    pairs = neardup_verified_pairs(docs, threshold=0.8)
    drop_b = (
        pairs.join(
            s2.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
        )
        .join(s2.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(drop_b, "doc_id", "left_anti")
    u = shuffle_key(F.col("doc_id"), seed=_SPLIT_SEED)
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs, s1, s2, s3, split


def run_curation(
    spark: SparkSession, sf_dir: str, output_path: str
) -> DataFrame:
    """Materialize the curated pretraining corpus: funnel survivors
    (full document rows + their split) written as parquet partitioned
    by split — the operational form of ``curation_funnel_report``
    (same stage plans, so that report is this output's manifest).
    Overwrite mode keeps re-runs idempotent (C3). The write happens
    HERE (eagerly, inside this function); the returned DataFrame is
    the curated plan, for callers that want to inspect or re-derive
    it — re-evaluating it recomputes the funnel, so manifests should
    be read back from ``output_path`` instead."""
    docs, _, _, s3, split = _funnel_stages(spark, sf_dir)
    curated = s3.join(docs, "doc_id").withColumn("split", split)
    curated.write.mode("overwrite").partitionBy("split").parquet(output_path)
    return curated


def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation funnel — the composed pipeline an LLM
    pretraining corpus actually runs, as ONE hash-checked query:

      total -> Gopher quality gate -> exact dedup (min-id keeper per
      sha256) -> near-dup drop (MinHash-LSH candidates + exact
      Jaccard >= 0.8 verify; the greater id of each surviving pair
      drops) -> train/val/test assignment.

    Emits one row per funnel stage plus one per final split, so the
    whole pipeline's selectivity is a single attested artifact. Every
    stage reuses an already-oracled operator (gopher_flags,
    sha256-window dedup, neardup_verified_pairs, the md5-hash split),
    which is exactly what makes the composed DuckDB replay possible.
    Scale shape: each stage is the same plan as its standalone query;
    the funnel adds only semi/anti joins on doc_id."""
    docs, s1, s2, s3, split = _funnel_stages(spark, sf_dir)
    one = lambda name, df: df.agg(  # noqa: E731
        F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_docs")
    ).select("stage", "n_docs")
    report = (
        one("total", docs)
        .unionByName(one("gopher_keep", s1))
        .unionByName(one("exact_dedup", s2))
        .unionByName(one("near_dedup", s3))
        .unionByName(
            s3.select(split.alias("stage"))
            .groupBy("stage")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
    )
    return report


def _curation_funnel_oracle() -> str:
    from bigdata_pipelines_aws_glue_spark.operators.dedup import _minhash_ctes
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        _SPLIT_SEED,
        _TRAIN_HI,
        _VAL_HI,
        shuffle_key_sql,
    )
    from bigdata_pipelines_aws_glue_spark.operators.text import (
        GOPHER_FILTER_ORACLE,
    )

    u = shuffle_key_sql("doc_id", _SPLIT_SEED)
    return f"""
WITH gf AS ({GOPHER_FILTER_ORACLE}),
{_minhash_ctes()},
s1 AS (SELECT doc_id FROM gf WHERE keep),
s2 AS (
    SELECT doc_id FROM (
        SELECT d0.doc_id,
               row_number() OVER (PARTITION BY sha256(d0.text)
                                  ORDER BY d0.doc_id) AS rn
        FROM documents d0 JOIN s1 USING (doc_id))
    WHERE rn = 1
),
verified AS (
    SELECT doc_a, doc_b
    FROM cand
    JOIN d da ON da.doc_id = doc_a
    JOIN d db ON db.doc_id = doc_b
    WHERE len(list_intersect(da.sh, db.sh))::DOUBLE
            / (len(da.sh) + len(db.sh)
               - len(list_intersect(da.sh, db.sh)))::DOUBLE >= 0.8
),
dropn AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM verified
    JOIN s2 a ON verified.doc_a = a.doc_id
    JOIN s2 b ON verified.doc_b = b.doc_id
),
s3 AS (
    SELECT doc_id FROM s2
    WHERE doc_id NOT IN (SELECT doc_id FROM dropn)
)
SELECT 'total' AS stage, count(*) AS n_docs FROM documents
UNION ALL SELECT 'gopher_keep', count(*) FROM s1
UNION ALL SELECT 'exact_dedup', count(*) FROM s2
UNION ALL SELECT 'near_dedup', count(*) FROM s3
UNION ALL
SELECT stage, count(*) FROM (
    SELECT CASE WHEN {u} < {_TRAIN_HI} THEN 'train'
                WHEN {u} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS stage
    FROM s3)
GROUP BY stage
"""


def _register() -> None:
    registry.register(
        "sequence_pack_chunks", sequence_pack_chunks, SEQUENCE_PACK_ORACLE
    )
    registry.register(
        "curation_funnel_report",
        curation_funnel_report,
        _curation_funnel_oracle(),
    )
    registry.register("chunk_fill_report", chunk_fill_report, CHUNK_FILL_ORACLE)
    registry.register(
        "embedding_quantize_int8", embedding_quantize_int8, EMBEDDING_QUANTIZE_ORACLE
    )
