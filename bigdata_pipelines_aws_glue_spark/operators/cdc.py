"""Content-defined chunking (CDC) dedup ([north-star] N1/N2 adjacency;
no reference citation — the reference is a currency ETL with no dedup).

The storage-system counterpart of the token-level span dedup in
``spandedup.py``: instead of token k-grams, documents are split at
CONTENT-DEFINED byte positions (the Rabin/gear-hash family — LBFS
(Muthitacharoen et al., SOSP'01) through FastCDC (Xia et al., USENIX
ATC'16)), so an insertion early in a document shifts chunk boundaries
only locally and identical trailing content still produces identical
chunks — the property fixed-size blocks lack. Shared chunks are then
found by one hash aggregation, exactly like exact dedup.

Boundary rule (cross-engine deterministic, no platform hash): byte
position ``i`` (1-based) ends a chunk iff the 8-char window starting
at ``i`` satisfies ``int(md5(window)[:8], 16) % DIVISOR == 0`` — md5
is bit-identical in Spark and DuckDB, and the first 8 hex chars fit a
signed 64-bit int, so the modulus never sees a negative. DIVISOR=64
targets ~64-byte expected chunks on this corpus (~300-char docs →
~4-5 chunks/doc). No min/max chunk clamps (FastCDC's normalization)
— documented simplification; the clamp only narrows the chunk-size
distribution and does not change the dedup semantics.

Two registry queries:

- ``cdc_chunk_dedup``: per-document chunk inventory — chunk count,
  byte totals, bytes in chunks whose content recurs in >= 2 distinct
  documents, and the duplicated fraction.
- ``cdc_store_savings``: the corpus-level storage answer — raw bytes
  vs the unique-chunk store a dedup filesystem would keep, and the
  savings ratio (one row).

Scale notes (100 TB): the window-hash scan is map-side per document
(documents are KB-sized, so the per-doc position transform is
bounded); chunk grouping is ONE hash shuffle on the chunk digest —
the same shape as exact dedup, with mergeable per-key state; the
per-doc lag() window for chunk extraction partitions by doc_id.
Nothing is quadratic: no pair join exists at all in this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: window width (bytes) hashed at each position.
W = 8
#: boundary divisor: P(boundary) = 1/DIVISOR per position.
DIVISOR = 64


def _window_hash(text, i):
    """int(md5(substr(text, i, W))[:8], 16) as a long — the gear hash
    both engines compute bit-identically."""
    return F.conv(
        F.substring(F.md5(F.substring(text, i, W)), 1, 8), 16, 10
    ).cast("long")


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, s, e, chunk): content-defined chunks per document.
    Cut offsets are window ends (i + W - 1) at boundary positions,
    plus the document end; consecutive cuts delimit chunks. Documents
    shorter than W yield one whole-text chunk."""
    t = docs.select("doc_id", "text", F.length("text").alias("n")).filter(
        F.col("n") > 0
    )
    cuts_arr = F.array_union(
        F.when(
            F.col("n") >= W,
            F.transform(
                F.filter(
                    F.sequence(F.lit(1), F.col("n") - (W - 1)),
                    lambda i: _window_hash(F.col("text"), i) % DIVISOR == 0,
                ),
                lambda i: (i + (W - 1)).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>")),
        F.array(F.col("n").cast("long")),
    )
    cut = t.select(
        "doc_id", "text", F.explode(cuts_arr).alias("cut")
    )
    w_prev = Window.partitionBy("doc_id").orderBy("cut")
    return (
        cut.withColumn(
            "prev", F.coalesce(F.lag("cut").over(w_prev), F.lit(0))
        )
        .filter(F.col("cut") > F.col("prev"))
        .select(
            "doc_id",
            (F.col("prev") + 1).alias("s"),
            F.col("cut").alias("e"),
            F.expr("substring(text, prev + 1, cut - prev)").alias("chunk"),
        )
    )


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-doc CDC chunk inventory with cross-document
    duplicated-byte budget."""
    chunks = cdc_chunks(load_table(spark, sf_dir, "documents"))
    occ = chunks.select(
        "doc_id",
        F.md5("chunk").alias("ch"),
        (F.col("e") - F.col("s") + 1).alias("len"),
    )
    freq = occ.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("doc_n")
    )
    return (
        occ.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("len").alias("n_bytes"),
            F.sum(
                F.when(F.col("doc_n") >= 2, F.col("len")).otherwise(F.lit(0))
            ).alias("dup_bytes"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_bytes",
            "dup_bytes",
            stable_round(F.col("dup_bytes") / F.col("n_bytes"), 6).alias(
                "dup_frac"
            ),
        )
    )


def cdc_store_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: corpus raw bytes vs the unique-chunk store
    (each distinct chunk content kept once), one row."""
    chunks = cdc_chunks(load_table(spark, sf_dir, "documents"))
    occ = chunks.select(
        F.md5("chunk").alias("ch"),
        (F.col("e") - F.col("s") + 1).alias("len"),
    )
    per_chunk = occ.groupBy("ch").agg(
        F.count(F.lit(1)).alias("occ_n"), F.max("len").alias("len")
    )
    return per_chunk.agg(
        F.sum(F.col("len") * F.col("occ_n")).alias("raw_bytes"),
        F.sum("len").alias("store_bytes"),
        F.count(F.lit(1)).alias("n_unique_chunks"),
        stable_round(
            F.lit(1.0)
            - F.sum("len") / F.sum(F.col("len") * F.col("occ_n")),
            6,
        ).alias("savings_ratio"),
    )


#: Shared oracle prelude: cut offsets per doc. DuckDB range(a, b) is
#: end-exclusive (range(1, n - 6) = 1..n-7 matches Spark's inclusive
#: sequence(1, n - 7)); ('0x' || hex)::BIGINT parses the 32-bit
#: window digest (route via BIGINT — HUGEINT can't parse hex).
_CUTS_CTE = """
t AS (SELECT doc_id, text, length(text) AS n FROM documents
      WHERE length(text) > 0),
cuts AS (
    SELECT doc_id, CAST(i + 7 AS BIGINT) AS cut
    FROM t, unnest(range(1, n - 6)) u(i)
    WHERE n >= 8
      AND ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::BIGINT % 64 = 0
    UNION
    SELECT doc_id, CAST(n AS BIGINT) AS cut FROM t
),
seg AS (
    SELECT doc_id, cut,
           coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut),
                    0) AS prev
    FROM cuts
),
chunks AS (
    SELECT s.doc_id, s.prev + 1 AS st, s.cut AS en,
           substr(t.text, CAST(s.prev + 1 AS INTEGER),
                  CAST(s.cut - s.prev AS INTEGER)) AS chunk
    FROM seg s JOIN t USING (doc_id)
    WHERE s.cut > s.prev
),
occ AS (
    SELECT doc_id, md5(chunk) AS ch,
           CAST(en - st + 1 AS BIGINT) AS len
    FROM chunks
)"""

CDC_DEDUP_ORACLE = f"""
WITH {_CUTS_CTE},
freq AS (SELECT ch, count(DISTINCT doc_id) AS doc_n FROM occ GROUP BY ch)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(o.len) AS BIGINT) AS n_bytes,
       CAST(sum(CASE WHEN f.doc_n >= 2 THEN o.len ELSE 0 END)
            AS BIGINT) AS dup_bytes,
       floor(sum(CASE WHEN f.doc_n >= 2 THEN o.len ELSE 0 END)::DOUBLE
             / sum(o.len) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
FROM occ o JOIN freq f USING (ch)
GROUP BY o.doc_id
"""

CDC_SAVINGS_ORACLE = f"""
WITH {_CUTS_CTE},
per_chunk AS (
    SELECT ch, count(*) AS occ_n, max(len) AS len FROM occ GROUP BY ch
)
SELECT CAST(sum(len * occ_n) AS BIGINT) AS raw_bytes,
       CAST(sum(len) AS BIGINT) AS store_bytes,
       CAST(count(*) AS BIGINT) AS n_unique_chunks,
       floor((1.0 - sum(len)::DOUBLE / sum(len * occ_n)::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS savings_ratio
FROM per_chunk
"""


def _register() -> None:
    registry.register("cdc_chunk_dedup", cdc_chunk_dedup, CDC_DEDUP_ORACLE)
    registry.register(
        "cdc_store_savings", cdc_store_savings, CDC_SAVINGS_ORACLE
    )
