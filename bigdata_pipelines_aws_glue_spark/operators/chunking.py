"""Overlapping text chunking as a Python UDTF (Spark 4 ``@udtf``) —
the retrieval-pipeline operator (RAG indexing splits every document
into fixed-size windows with overlap so no boundary sentence is lost)
AND the remaining Python-extension surface beside scalar pandas UDFs,
``mapInPandas`` kernels, and ``applyInPandasWithState``: a
user-defined TABLE function consumed through SQL ``LATERAL``, fanning
each input row out to a variable number of output rows.

Scale shape: the UDTF is a pure per-row generator — embarrassingly
parallel map work, no state, no shuffle until the consumer aggregates;
Arrow-optimized execution is enabled at the session level
(``spark.sql.execution.pythonUDTF.arrow.enabled``) so batches cross
the Python boundary columnar, not row-by-row.

The chunk arithmetic is pure integer slicing, so the DuckDB twin
replays it with ``generate_series`` + ``substr`` — the UDTF's whole
fan-out is hash-checked, not just counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_pipelines_aws_glue_spark import registry

CHUNK_SIZE = 200
CHUNK_OVERLAP = 40
_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def _make_chunker():
    """Build the UDTF class lazily (decorator import kept out of
    module import so the registry stays importable without Spark)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, chunk_len int")
    class ChunkerUDTF:
        def eval(self, text: str):
            if text is None:
                return
            i, idx = 0, 0
            while i < len(text):
                piece = text[i : i + CHUNK_SIZE]
                yield idx, piece, len(piece)
                idx += 1
                i += _STEP

    return ChunkerUDTF


def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document fanned out to its overlapping chunks via the
    UDTF in a SQL LATERAL join; emits the chunk text itself plus
    per-chunk bookkeeping, so the oracle attests content, order, and
    fan-out count in one hash."""
    from bigdata_pipelines_aws_glue_spark.sql import register_corpus_views

    register_corpus_views(spark, sf_dir)
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("chunk_text", _make_chunker())
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk, c.chunk_len
        FROM documents, LATERAL chunk_text(text) c
        """
    )


CHUNK_UDTF_ORACLE = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS n FROM documents
),
g AS (
    SELECT d.doc_id, d.text,
           unnest(generate_series(
               0,
               CAST(ceil(CAST(n AS DOUBLE) / {_STEP}) AS BIGINT) - 1
           )) AS idx
    FROM d WHERE n > 0
)
SELECT doc_id,
       CAST(idx AS INT) AS chunk_idx,
       substr(text, CAST(idx * {_STEP} + 1 AS BIGINT), {CHUNK_SIZE})
         AS chunk,
       CAST(length(substr(text, CAST(idx * {_STEP} + 1 AS BIGINT),
                          {CHUNK_SIZE})) AS INT) AS chunk_len
FROM g
"""


def _register() -> None:
    registry.register(
        "chunk_documents_udtf", chunk_documents_udtf, CHUNK_UDTF_ORACLE
    )
