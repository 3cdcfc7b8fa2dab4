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


def _make_field_parser():
    """POLYMORPHIC UDTF — the ``analyze()`` half of the Spark 4 UDTF
    surface (``chunk_text`` above has a static schema): the output
    schema is computed AT PLAN TIME from the constant header
    argument, so ``parse_fields(line, 'k,status,cents')`` plans three
    string columns named k/status/cents. This is how a UDTF models
    schema-on-read parsers (CSV-ish lines, log formats) without a
    fixed contract."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ParseFieldsUDTF:
        @staticmethod
        def analyze(
            line: AnalyzeArgument, header: AnalyzeArgument
        ) -> AnalyzeResult:
            if not header.isConstantExpression or header.value is None:
                raise ValueError("header must be a constant string")
            names = str(header.value).split(",")
            return AnalyzeResult(
                schema=StructType(
                    [StructField(n, StringType()) for n in names]
                )
            )

        def eval(self, line: str, header: str):
            n = len(header.split(","))
            if line is None:
                return
            parts = line.split("|")
            # pad/truncate to the planned arity: schema is fixed at
            # plan time, malformed rows must not change it
            yield tuple((parts + [None] * n)[:n])

    return udtf(ParseFieldsUDTF)


def udtf_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for the polymorphic UDTF: serialize orders into
    '|'-delimited lines, parse them back through ``parse_fields``
    with a constant header (schema decided by ``analyze()``), and
    re-type the fields. The DuckDB twin recomputes the same rows
    directly from orders — a hash match proves the round-trip through
    the dynamic-schema parser is lossless.

    Cost honesty: a UDTF's ``eval`` runs once per ROW even under
    Arrow transport, so this scales linearly with a Python-call
    constant (measured alpha 0.76 — the registry's only near-linear
    curve, which is the UDTF surface's true price). For a fixed
    delimited layout the JVM path is ``from_csv`` — this query exists
    to attest the POLYMORPHIC surface, not to race it."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("parse_fields", _make_field_parser())
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"),
        ).alias("line")
    )
    lines.createOrReplaceTempView("order_lines")
    return spark.sql(
        """
        SELECT CAST(p.k AS BIGINT) AS o_orderkey,
               p.status AS o_orderstatus,
               CAST(p.cents AS BIGINT) AS cents
        FROM order_lines, LATERAL parse_fields(line, 'k,status,cents') p
        """
    )


PARSE_FIELDS_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
FROM orders
"""


def _register() -> None:
    registry.register(
        "chunk_documents_udtf", chunk_documents_udtf, CHUNK_UDTF_ORACLE
    )
    registry.register(
        "udtf_parse_fields", udtf_parse_fields, PARSE_FIELDS_ORACLE
    )
