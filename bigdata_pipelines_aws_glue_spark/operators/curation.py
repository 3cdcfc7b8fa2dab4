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


def _register() -> None:
    registry.register(
        "sequence_pack_chunks", sequence_pack_chunks, SEQUENCE_PACK_ORACLE
    )
    registry.register("chunk_fill_report", chunk_fill_report, CHUNK_FILL_ORACLE)
    registry.register(
        "embedding_quantize_int8", embedding_quantize_int8, EMBEDDING_QUANTIZE_ORACLE
    )
