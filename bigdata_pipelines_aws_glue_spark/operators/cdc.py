"""Content-defined chunking (CDC) dedup ([north-star] N1/N2 adjacency;
no reference citation — the reference is a currency ETL with no dedup).

The storage-system counterpart of the token-level span dedup in
``spandedup.py``: instead of token k-grams, documents are split at
CONTENT-DEFINED positions (the Rabin/gear-hash family — LBFS
(Muthitacharoen et al., SOSP'01) through FastCDC (Xia et al., USENIX
ATC'16)), so an insertion early in a document shifts chunk boundaries
only locally and identical trailing content still produces identical
chunks — the property fixed-size blocks lack. Shared chunks are then
found by one hash aggregation, exactly like exact dedup.

Unit of position/length — CHARACTERS, not bytes: Spark's
``length``/``substring`` (UTF8String code points) and DuckDB's
``length``/``substr`` are both character-based, so the two engines
agree bit-for-bit on any UTF-8 text (pinned on non-ASCII input by
``tests/test_cdc.py``), and on the ASCII test corpus characters ==
bytes. The ``*_bytes`` column names keep the storage-dedup
convention; on non-ASCII corpora read them as character counts. A
byte-exact variant is NOT cross-engine oracle-able here: DuckDB
1.0.0 has no ``substr``/``md5`` over BLOB, so windowing
``encode(text, 'UTF-8')`` cannot be replayed by the oracle
(documented trade-off, advisor r9).

Boundary rule (cross-engine deterministic, no platform hash):
character position ``i`` (1-based) ends a chunk iff the 8-char window
starting at ``i`` satisfies ``int(md5(window)[:8], 16) % DIVISOR ==
0`` — md5 is bit-identical in Spark and DuckDB, and the first 8 hex
chars fit a signed 64-bit int, so the modulus never sees a negative.
DIVISOR=64 targets ~64-char expected chunks on this corpus
(~300-char docs → ~4-5 chunks/doc). No min/max chunk clamps
(FastCDC's normalization)
— the base pair of queries stays unclamped; ``cdc_clamped_chunks``
(r9, same round) adds exactly that normalization as a sequential
per-doc fold — pure JVM ``F.aggregate``, recursive-CTE DuckDB twin.

Three registry queries:

- ``cdc_chunk_dedup``: per-document chunk inventory — chunk count,
  length totals, length in chunks whose content recurs in >= 2
  distinct documents, and the duplicated fraction.
- ``cdc_store_savings``: the corpus-level storage answer — raw size
  vs the unique-chunk store a dedup filesystem would keep, and the
  savings ratio (one row).
- ``cdc_clamped_chunks``: per-doc chunk-size profile under the
  FastCDC min/max clamps (skip region + forced cuts).

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
from bigdata_pipelines_aws_glue_spark.operators.skew import spread
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: window width (bytes) hashed at each position.
W = 8
#: boundary divisor: P(boundary) = 1/DIVISOR per position.
DIVISOR = 64
# _window_hash parses only the last 2 hex digits of the 8-char md5
# prefix; that is congruent mod DIVISOR iff DIVISOR divides 16^2.
assert 256 % DIVISOR == 0, "DIVISOR must divide 256 (2-hex-digit parse)"
#: FastCDC-style chunk-size clamps for the clamped variant: no cut
#: closer than CDC_MIN to the previous cut (skip region), a forced
#: cut at CDC_MAX when no content boundary arrives in time. Only the
#: final tail chunk may be shorter than CDC_MIN.
CDC_MIN, CDC_MAX = 32, 192


def _window_hash(text, i):
    """int(md5(substr(text, i, W))[:8], 16) as a long — the gear hash
    both engines compute bit-identically.

    r15: the boundary rule only consumes this value MOD ``DIVISOR``
    (64), and 16^2 = 256 ≡ 0 (mod 64), so hex digits above the last
    two of the 8-char prefix contribute nothing — parsing just chars
    7-8 is provably congruent mod 64 (the oracle keeps the 8-char
    parse; the hash match attests the cuts agree). Small win (~6% at
    sf0.1) — the md5 per window position IS the defined computation
    and dominates; see OPTIMIZATION_r15.md for why cdc is otherwise
    left at its map-side shape."""
    return F.conv(
        F.substring(F.md5(F.substring(text, i, W)), 7, 2), 16, 10
    ).cast("long")


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, s, e, chunk): content-defined chunks per document.
    Cut offsets are window ends (i + W - 1) at boundary positions,
    plus the document end; consecutive cuts delimit chunks. Documents
    shorter than W yield one whole-text chunk."""
    # r16 (guide §2.5 input parallelism): the md5-per-window-position
    # gear hash is the heaviest per-row chain in the repo, and the
    # documents scan arrives in ONE partition locally (single parquet
    # row group) — the whole chain ran on one core. ``spread`` is a
    # no-op whenever the scan already has >= defaultParallelism
    # splits (any real corpus). Probe at sf0.1: 3.62 -> 1.12 s; at
    # 5x data: 19.06 -> 1.51 s; rows identical.
    t = spread(docs).select(
        "doc_id", "text", F.length("text").alias("n")
    ).filter(F.col("n") > 0)
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


def cdc_clamped_cuts(docs: DataFrame) -> DataFrame:
    """(doc_id, cut): FastCDC-normalized cut offsets — the min/max
    clamps the unclamped ``cdc_chunks`` documents as a simplification.
    Selection rule (identical in the DuckDB twin): from the previous
    cut, take the FIRST content boundary in [cut+MIN, cut+MAX]; if
    none, force a cut at cut+MAX; the document end always cuts (the
    tail may be shorter than MIN).

    The per-document scan is SEQUENTIAL (each cut depends on the
    previous one), but documents are independent, so it runs as one
    pure-JVM ``F.aggregate`` fold over the candidate array per row —
    no Python worker, no window, map-side only; the twin replays the
    same rule as a recursive CTE. This is the repo's pattern for
    per-row sequential state without a UDF (`windows.py` reflection
    fold precedent)."""
    # r16: same input-parallelism fix as cdc_chunks (guide §2.5).
    t = spread(docs).select(
        "doc_id", "text", F.length("text").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    cand = F.when(
        F.col("n") >= W,
        F.transform(
            F.filter(
                F.sequence(F.lit(1), F.col("n") - (W - 1)),
                lambda i: _window_hash(F.col("text"), i) % DIVISOR == 0,
            ),
            lambda i: (i + (W - 1)).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    zero = F.lit(0).cast("long")
    empty = F.array().cast("array<long>")

    def forced_cuts(last, upto):
        """Cuts at last+MAX, last+2*MAX, ... while upto - last' > MAX."""
        nf = F.floor((upto - last - 1) / F.lit(CDC_MAX)).cast("long")
        return F.when(
            nf > 0,
            F.transform(
                F.sequence(F.lit(1).cast("long"), nf),
                lambda j: last + j * CDC_MAX,
            ),
        ).otherwise(empty)

    def step(acc, c):
        forced = forced_cuts(acc["last"], c)
        last2 = acc["last"] + F.size(forced).cast("long") * CDC_MAX
        accept = (c - last2) >= CDC_MIN
        return F.struct(
            F.concat(
                acc["cuts"],
                forced,
                F.when(accept, F.array(c)).otherwise(empty),
            ).alias("cuts"),
            F.when(accept, c).otherwise(last2).alias("last"),
        )

    def finish(acc):
        forced = forced_cuts(acc["last"], F.col("n"))
        last2 = acc["last"] + F.size(forced).cast("long") * CDC_MAX
        return F.concat(
            acc["cuts"],
            forced,
            F.when(F.col("n") > last2, F.array(F.col("n"))).otherwise(
                empty
            ),
        )

    cuts = F.aggregate(
        cand,
        F.struct(empty.alias("cuts"), zero.alias("last")),
        step,
        finish,
    )
    return t.select("doc_id", "n", F.explode(cuts).alias("cut"))


def cdc_clamped_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-doc chunk-size profile under the FastCDC
    clamps — chunk count, bytes, and the min/max chunk lengths (max
    is always <= CDC_MAX; min can undershoot CDC_MIN only via the
    tail chunk)."""
    cuts = cdc_clamped_cuts(load_table(spark, sf_dir, "documents"))
    w_prev = Window.partitionBy("doc_id").orderBy("cut")
    lens = cuts.withColumn(
        "prev", F.coalesce(F.lag("cut").over(w_prev), F.lit(0))
    ).select("doc_id", "n", (F.col("cut") - F.col("prev")).alias("clen"))
    return lens.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("clen").alias("n_bytes"),
        F.min("clen").alias("min_chunk"),
        F.max("clen").alias("max_chunk"),
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


#: Recursive-CTE replay of the clamped selection rule: each step's
#: next cut is the first candidate in [cut+MIN, cut+MAX], else the
#: forced cut+MAX, capped at the document end.
CDC_CLAMPED_ORACLE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) > 0),
cand AS (
    SELECT doc_id, CAST(i + 7 AS BIGINT) AS c
    FROM t, unnest(range(1, n - 6)) u(i)
    WHERE n >= 8
      AND ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::BIGINT % 64 = 0
),
walk AS (
    SELECT doc_id, CAST(0 AS BIGINT) AS cut, n FROM t
    UNION ALL
    SELECT w.doc_id,
           least(coalesce(
               (SELECT min(c) FROM cand
                WHERE cand.doc_id = w.doc_id
                  AND c >= w.cut + {CDC_MIN} AND c <= w.cut + {CDC_MAX}),
               w.cut + {CDC_MAX}), w.n) AS cut,
           w.n
    FROM walk w WHERE w.cut < w.n
),
lens AS (
    SELECT doc_id,
           cut - lag(cut) OVER (PARTITION BY doc_id ORDER BY cut) AS clen
    FROM walk
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(clen) AS BIGINT) AS n_bytes,
       CAST(min(clen) AS BIGINT) AS min_chunk,
       CAST(max(clen) AS BIGINT) AS max_chunk
FROM lens WHERE clen IS NOT NULL
GROUP BY doc_id
"""


def _register() -> None:
    registry.register("cdc_chunk_dedup", cdc_chunk_dedup, CDC_DEDUP_ORACLE)
    registry.register(
        "cdc_store_savings", cdc_store_savings, CDC_SAVINGS_ORACLE
    )
    registry.register(
        "cdc_clamped_chunks", cdc_clamped_chunks, CDC_CLAMPED_ORACLE
    )
