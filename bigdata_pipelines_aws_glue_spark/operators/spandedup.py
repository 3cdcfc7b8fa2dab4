"""Cross-document substring/span-level dedup ([north-star] N2
adjacency; no reference citation — the reference is a 184-line
currency ETL with no dedup at all).

Doc-granularity dedup (``dedup.py``, ``semdedup.py``) drops whole
near-duplicate documents; the Lee et al. 2022 class ("Deduplicating
Training Data Makes Language Models Better", ACL) additionally removes
duplicated *substrings* — boilerplate headers, license blocks, quoted
passages — that recur across otherwise-distinct documents. Their
single-node tool builds a corpus-wide suffix array; that structure is
a global sort over every suffix and does not distribute. The
Spark-native equivalent implemented here keeps the same detection
semantics for spans of >= k tokens:

  a token span is DUPLICATED iff every length-k window inside it
  occurs in at least ``min_df`` distinct documents,

and finds maximal such spans with three bounded passes:

1. positional k-gram postings: one row per (doc, start position)
   with the contiguous k-token window at that position — NOT the
   distinct shingle sets the Jaccard operators use; positions matter
   here. Map-side only, output is O(total tokens).
2. corpus doc-frequency per gram (one hash aggregation on the gram),
   keeping grams seen in >= min_df distinct docs. The duplicated
   positions come back from an equi-join of postings with that
   filtered gram list — per-position constant fan-out, never a pair
   product.
3. gaps-and-islands interval merge per document: each surviving
   position covers tokens [pos, pos+k-1]; overlapping-or-adjacent
   intervals merge into maximal duplicated spans with one
   doc-partitioned window (documents are KB-sized, so the per-doc
   window is trivially bounded at 100 TB corpus scale).

Equivalence to the suffix-array method: a substring of length L >= k
repeats across documents iff all of its L-k+1 length-k windows repeat
(each window is itself a repeated substring; conversely windows can
be chained), so the merged island set equals the union of repeated
substrings of length >= k — the same spans Lee et al.'s
ExactSubstr marks, quantized to token (not byte) granularity.

Char-offset provenance (r10, ``dedup_span_char_offsets``): the same
maximal spans carry their 1-based char interval in the trimmed text
plus the extracted substring — the offsets a Lee et al. pipeline cuts
at. Token→char mapping is an O(tokens) ``F.aggregate`` prefix-sum
fold in the posting build (no new shuffle); the char bounds ride the
island merge as min/max aggregates.

The pair-level form (``dedup_substring_pairs``) reports merged shared
spans per document pair for provenance-style "who copied whom"
queries. Pair generation joins postings on the gram and is the one
stage with quadratic potential on hot grams, so it is bounded exactly
like ``dedup.ngram_jaccard_pairs``: only grams with doc-frequency in
[min_df, df_cap] propose pairs — boilerplate grams that appear in
hundreds of documents identify *corpus-level* duplication (query 1
still counts them) but are uninformative for pairwise provenance and
would dominate the join; the cap keeps per-gram fan-out <=
df_cap*(df_cap-1)/2. Cross-engine determinism: everything is integer
arithmetic on token positions — no float thresholds anywhere.

Scale notes (100 TB): stage 1 is map-side; stage 2 shuffles once on
the gram (vocab-sized aggregate, AQE-coalesced) and once on doc_id for
the island window; nothing materializes an all-pairs product; the
only windows are per-doc / per-pair, both bounded by document length.
At sf0.1: 235k postings -> 21.5k duplicated positions -> 477 docs
with spans, 256 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: k-token window width: spans shorter than k tokens are never
#: reported (Lee et al. use 50 BPE tokens on web corpora; the
#: synthetic corpus here has ~50-token docs, so k=8 keeps the
#: operator observable while preserving the exact same plan shape).
K = 8

#: Pair-generation doc-frequency cap (see module docstring).
DF_CAP = 64


def positional_grams(docs: DataFrame, k: int = K) -> DataFrame:
    """(doc_id, pos, gram): the contiguous k-token window starting at
    1-based token position ``pos``. Positions are NOT deduplicated —
    span merging needs every occurrence."""
    win = F.transform(
        F.sequence(F.lit(1), F.size("tk") - (k - 1)),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(F.slice(F.col("tk"), i, k), " ").alias("gram"),
        ),
    )
    return (
        docs.select("doc_id", _tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= k)
        .select("doc_id", F.explode(win).alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )


def _merge_islands(
    iv: DataFrame,
    part_cols: list[str],
    extra_aggs: tuple = (),
    extra_cols: tuple = (),
) -> DataFrame:
    """Gaps-and-islands: merge overlapping-or-adjacent [s, e] token
    intervals within each ``part_cols`` group. Adjacency (prev_end ==
    next_start - 1) merges too: the tokens are contiguous duplicated
    text even when contributed by different grams. Returns one row per
    maximal span with span_start/span_end/span_len/n_grams (plus any
    ``extra_aggs`` aliased into ``extra_cols`` — the char-offset
    variant rides along here without a second island pass)."""
    w_prev = (
        Window.partitionBy(*part_cols)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*part_cols)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flag = F.when(
        F.max("e").over(w_prev) >= F.col("s") - 1, F.lit(0)
    ).otherwise(F.lit(1))
    return (
        iv.withColumn("flag", flag)
        .withColumn("island", F.sum("flag").over(w_run))
        .groupBy(*part_cols, "island")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
            *extra_aggs,
        )
        .select(
            *part_cols,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + F.lit(1)).alias(
                "span_len"
            ),
            "n_grams",
            *extra_cols,
        )
    )


def _char_offsets(tk) -> "F.Column":
    """1-based char START offset of every token inside the TRIMMED
    text: one O(tokens) fold (start_i = chars consumed so far + 1;
    consume len(tok) + 1 per token for the following space). Single-
    space split/join is lossless, so the offsets are exact even when
    repeated spaces produce empty tokens (an empty token consumes 0
    chars + its delimiter). Pure-JVM ``F.aggregate`` — no UDF."""
    return F.aggregate(
        tk,
        F.struct(
            F.array().cast("array<long>").alias("offs"),
            F.lit(0).cast("long").alias("cum"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["offs"], F.array(acc["cum"] + 1)).alias("offs"),
            (acc["cum"] + F.length(x) + 1).alias("cum"),
        ),
        lambda acc: acc["offs"],
    )


def positional_grams_chars(docs: DataFrame, k: int = K) -> DataFrame:
    """(doc_id, pos, gram, cs, ce): ``positional_grams`` plus the
    char span [cs, ce] the k-token window occupies in the trimmed
    text — the byte/char-offset provenance a Lee et al. pipeline cuts
    at (VERDICT_r9 item 3). One more column in the posting build, no
    new shuffle; the fold is per-doc map-side."""
    win = F.transform(
        F.sequence(F.lit(1), F.size("tk") - (k - 1)),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(F.slice(F.col("tk"), i, k), " ").alias("gram"),
            F.element_at(F.col("offs"), i).alias("cs"),
            (
                F.element_at(F.col("offs"), i + (k - 1))
                + F.length(F.element_at(F.col("tk"), i + (k - 1)))
                - 1
            ).alias("ce"),
        ),
    )
    return (
        docs.select("doc_id", _tokens(F.col("text")).alias("tk"))
        .withColumn("offs", _char_offsets(F.col("tk")))
        .filter(F.size("tk") >= k)
        .select("doc_id", F.explode(win).alias("g"))
        .select(
            "doc_id",
            F.col("g.pos").alias("pos"),
            F.col("g.gram").alias("gram"),
            F.col("g.cs").alias("cs"),
            F.col("g.ce").alias("ce"),
        )
    )


def duplicated_spans_chars(
    docs: DataFrame, k: int = K, min_df: int = 2
) -> DataFrame:
    """``duplicated_spans`` with char-offset provenance: each maximal
    duplicated span also carries its 1-based [span_char_start,
    span_char_end] in the trimmed text plus the extracted
    ``span_text`` itself (the substring cut proves the offsets point
    at the real duplicated characters — hash-checked against the
    twin's independent substr). The char bounds merge through the
    SAME island pass as the token bounds (min start / max end of the
    contributing windows), so the plan shape is identical to the base
    query plus one doc_id-keyed join back to the text."""
    grams = positional_grams_chars(docs, k)
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("dc"))
        .filter(F.col("dc") >= min_df)
        .select("gram")
    )
    iv = grams.join(dup_grams, "gram").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + (k - 1)).alias("e"),
        "cs",
        "ce",
    )
    spans = _merge_islands(
        iv,
        ["doc_id"],
        extra_aggs=(
            F.min("cs").alias("span_char_start"),
            F.max("ce").alias("span_char_end"),
        ),
        extra_cols=("span_char_start", "span_char_end"),
    )
    return spans.join(
        docs.select("doc_id", F.trim(F.col("text")).alias("txt")), "doc_id"
    ).select(
        "doc_id",
        "span_start",
        "span_end",
        "span_len",
        "span_char_start",
        "span_char_end",
        F.expr(
            "substring(txt, CAST(span_char_start AS INT),"
            " CAST(span_char_end - span_char_start + 1 AS INT))"
        ).alias("span_text"),
    )


def duplicated_spans(
    docs: DataFrame, k: int = K, min_df: int = 2
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document:
    every token position covered by a k-gram occurring in >= min_df
    distinct documents, merged into maximal intervals."""
    grams = positional_grams(docs, k)
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("dc"))
        .filter(F.col("dc") >= min_df)
        .select("gram")
    )
    iv = grams.join(dup_grams, "gram").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + (k - 1)).alias("e"),
    )
    return _merge_islands(iv, ["doc_id"])


def shared_span_pairs(
    docs: DataFrame, k: int = K, df_cap: int = DF_CAP
) -> DataFrame:
    """Merged shared spans per document pair (coordinates of the
    lower-id document): for each unordered pair sharing at least one
    k-gram, the maximal merged intervals of doc_a positions whose
    gram also occurs in doc_b, aggregated to
    (n_spans, dup_tokens, longest_span)."""
    grams = positional_grams(docs, k)
    pair_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("dc"))
        .filter((F.col("dc") >= 2) & (F.col("dc") <= df_cap))
        .select("gram")
    )
    posted = grams.join(pair_grams, "gram")
    a, b = posted.alias("a"), posted.alias("b")
    iv = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pos"),
        )
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.col("pos").alias("s"),
            (F.col("pos") + (k - 1)).alias("e"),
        )
    )
    spans = _merge_islands(iv, ["doc_a", "doc_b"])
    return spans.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
        F.max("span_len").alias("longest_span"),
    )


def span_dropstats(docs: DataFrame, k: int = K) -> DataFrame:
    """Per-document duplicated-token budget: every doc with its token
    count, the union size of its duplicated spans, and the fraction —
    the curation signal ("how much of this document is boilerplate
    shared with the rest of the corpus") that decides whether a doc is
    cleaned or dropped wholesale. Docs with no duplicated span (or
    shorter than k tokens) report 0."""
    spans = duplicated_spans(docs, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("dup_tokens")
    )
    return (
        docs.select(
            "doc_id",
            F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0).cast("long")).alias(
                "dup_tokens"
            ),
            stable_round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )


def span_removal_stats(docs: DataFrame, k: int = K) -> DataFrame:
    """Keep-first removal budget (the actual Lee et al. OUTPUT shape:
    all-but-one occurrence of each duplicated substring is cut).
    Token-level rule, deterministic across engines: token t of doc d
    is removed iff it is covered by a k-gram occurring in >= 2 docs
    AND d is not that gram's canonical owner (min doc_id containing
    it). The canonical copy survives in full; every other doc loses
    the merged union of its non-owned duplicated positions. Returns
    every doc with (n_tokens, removed_tokens, kept_tokens)."""
    grams = positional_grams(docs, k)
    owners = grams.groupBy("gram").agg(
        F.min("doc_id").alias("own_id"),
        F.countDistinct("doc_id").alias("dc"),
    )
    rem = (
        grams.join(owners, "gram")
        .filter((F.col("dc") >= 2) & (F.col("doc_id") != F.col("own_id")))
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + (k - 1)).alias("e"),
        )
    )
    removed = (
        _merge_islands(rem, ["doc_id"])
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("removed_tokens"))
    )
    return (
        docs.select(
            "doc_id",
            F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("removed_tokens"), F.lit(0).cast("long")).alias(
                "removed_tokens"
            ),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("removed_tokens"), F.lit(0))
            ).alias("kept_tokens"),
        )
    )


def span_clean_text(docs: DataFrame, k: int = K) -> DataFrame:
    """Materialize the deduplicated corpus: each document's text with
    its keep-first-removed tokens (see ``span_removal_stats``) cut
    out, remaining tokens re-joined with single spaces in original
    order. This is the actual corpus a Lee et al.-style pipeline
    writes back out; the stats queries are its bookkeeping. A document
    whose every token is removed (a verbatim non-canonical copy) is
    DROPPED from the output, not emitted empty — the cleaned corpus at
    sf0.01 is 486 of 500 docs.

    Removed positions are enumerated by exploding each removal
    interval (bounded by the doc's duplicated-token budget), so the
    kept-token filter is a plain (doc_id, pos) anti-join — no range
    join. Re-assembly sorts each doc's kept (pos, token) pairs inside
    one array expression; the per-doc array is document-length
    bounded."""
    grams = positional_grams(docs, k)
    owners = grams.groupBy("gram").agg(
        F.min("doc_id").alias("own_id"),
        F.countDistinct("doc_id").alias("dc"),
    )
    removed_pos = (
        grams.join(owners, "gram")
        .filter((F.col("dc") >= 2) & (F.col("doc_id") != F.col("own_id")))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(_tokens(F.col("text"))).alias("i", "tok"),
    ).select("doc_id", (F.col("i") + 1).cast("long").alias("pos"), "tok")
    kept = toks.join(removed_pos, ["doc_id", "pos"], "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("kept_tokens"),
        )
    )


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-document maximal duplicated spans over the
    documents table (k=8 token windows, min_df=2)."""
    return duplicated_spans(load_table(spark, sf_dir, "documents"))


def dedup_span_char_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: maximal duplicated spans with char-offset
    provenance and the extracted span text (k=8, min_df=2)."""
    return duplicated_spans_chars(load_table(spark, sf_dir, "documents"))


def dedup_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-pair merged shared spans (k=8, df_cap=64)."""
    return shared_span_pairs(load_table(spark, sf_dir, "documents"))


def dedup_span_dropstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-doc duplicated-token budget (k=8)."""
    return span_dropstats(load_table(spark, sf_dir, "documents"))


def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: keep-first removal budget (k=8)."""
    return span_removal_stats(load_table(spark, sf_dir, "documents"))


def dedup_span_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the materialized deduplicated corpus (k=8)."""
    return span_clean_text(load_table(spark, sf_dir, "documents"))


#: Shared oracle prelude: positional 8-gram postings. DuckDB's
#: range(a, b) is end-EXCLUSIVE, so range(1, len-6) yields start
#: positions 1..len-7, matching Spark's sequence(1, size-7)
#: (end-INCLUSIVE); tk[i:i+7] is an inclusive 1-based slice of 8
#: elements, matching F.slice(tk, i, 8).
_GRAMS_CTE = """
t AS (SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
g AS MATERIALIZED (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           array_to_string(tk[i:i+7], ' ') AS gram
    FROM t, unnest(range(1, len(tk) - 6)) AS u(i)
    WHERE len(tk) >= 8
)"""

SPANS_ORACLE = f"""
WITH {_GRAMS_CTE},
d AS (SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2),
iv AS (SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e
       FROM g JOIN d USING (gram)),
fl AS (
    SELECT doc_id, s, e,
           CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= s - 1
                THEN 0 ELSE 1 END AS flag
    FROM iv
),
isl AS (
    SELECT doc_id, s, e,
           sum(flag) OVER (PARTITION BY doc_id ORDER BY s
                ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
)
SELECT doc_id,
       min(s) AS span_start,
       max(e) AS span_end,
       max(e) - min(s) + 1 AS span_len,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl
GROUP BY doc_id, island
"""

#: Char-offset twin. The oracle derives offsets via prefix-join
#: lengths — cs(i) = len(join(tk[1:i])) - len(tk[i]) + 1 and
#: ce(j) = len(join(tk[1:j])) — an O(doc²)-char formula that is fine
#: for an oracle but deliberately NOT the Spark path (the engine uses
#: the O(tokens) fold in ``_char_offsets``); single-space split/join
#: losslessness makes the two exactly equal. ``span_text`` is cut
#: independently by each engine, so a hash match proves the offsets
#: address the same characters.
CHAR_SPANS_ORACLE = """
WITH
t AS (SELECT doc_id, trim(text) AS txt,
             string_split(trim(text), ' ') AS tk FROM documents),
g AS MATERIALIZED (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           array_to_string(tk[i:i+7], ' ') AS gram,
           CAST(length(array_to_string(tk[1:i], ' '))
                - length(tk[i]) + 1 AS BIGINT) AS cs,
           CAST(length(array_to_string(tk[1:i+7], ' ')) AS BIGINT) AS ce
    FROM t, unnest(range(1, len(tk) - 6)) AS u(i)
    WHERE len(tk) >= 8
),
d AS (SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2),
iv AS (SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e, g.cs, g.ce
       FROM g JOIN d USING (gram)),
fl AS (
    SELECT doc_id, s, e, cs, ce,
           CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= s - 1
                THEN 0 ELSE 1 END AS flag
    FROM iv
),
isl AS (
    SELECT doc_id, s, e, cs, ce,
           sum(flag) OVER (PARTITION BY doc_id ORDER BY s
                ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
),
sp AS (
    SELECT doc_id,
           min(s) AS span_start,
           max(e) AS span_end,
           max(e) - min(s) + 1 AS span_len,
           min(cs) AS span_char_start,
           max(ce) AS span_char_end
    FROM isl
    GROUP BY doc_id, island
)
SELECT sp.doc_id, sp.span_start, sp.span_end, sp.span_len,
       sp.span_char_start, sp.span_char_end,
       substr(t.txt, CAST(sp.span_char_start AS INTEGER),
              CAST(sp.span_char_end - sp.span_char_start + 1
                   AS INTEGER)) AS span_text
FROM sp JOIN t USING (doc_id)
"""

PAIRS_ORACLE = f"""
WITH {_GRAMS_CTE},
d AS (SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND 64),
p AS MATERIALIZED (SELECT g.doc_id, g.pos, g.gram FROM g JOIN d USING (gram)),
iv AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos
    FROM p a JOIN p b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
fl AS (
    SELECT doc_a, doc_b, pos AS s, pos + 7 AS e,
           CASE WHEN max(pos + 7) OVER (PARTITION BY doc_a, doc_b
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= pos - 1
                THEN 0 ELSE 1 END AS flag
    FROM iv
),
isl AS (
    SELECT doc_a, doc_b, s, e,
           sum(flag) OVER (PARTITION BY doc_a, doc_b ORDER BY s
                ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
),
spans AS (
    SELECT doc_a, doc_b,
           max(e) - min(s) + 1 AS span_len
    FROM isl
    GROUP BY doc_a, doc_b, island
)
SELECT doc_a, doc_b,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_len) AS BIGINT) AS dup_tokens,
       CAST(max(span_len) AS BIGINT) AS longest_span
FROM spans
GROUP BY doc_a, doc_b
"""


DROPSTATS_ORACLE = f"""
WITH {_GRAMS_CTE},
d AS (SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2),
iv AS (SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e
       FROM g JOIN d USING (gram)),
fl AS (
    SELECT doc_id, s, e,
           CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= s - 1
                THEN 0 ELSE 1 END AS flag
    FROM iv
),
isl AS (
    SELECT doc_id, s, e,
           sum(flag) OVER (PARTITION BY doc_id ORDER BY s
                ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
),
per_doc AS (
    SELECT doc_id, CAST(sum(sl) AS BIGINT) AS dup_tokens
    FROM (SELECT doc_id, island, max(e) - min(s) + 1 AS sl
          FROM isl GROUP BY doc_id, island)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       floor(coalesce(p.dup_tokens, 0)::DOUBLE
             / len(string_split(trim(d.text), ' '))
             * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

REMOVAL_ORACLE = f"""
WITH {_GRAMS_CTE},
own AS (SELECT gram, min(doc_id) AS own_id,
               count(DISTINCT doc_id) AS dc
        FROM g GROUP BY gram),
rem AS (
    SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e
    FROM g JOIN own USING (gram)
    WHERE own.dc >= 2 AND g.doc_id != own.own_id
),
fl AS (
    SELECT doc_id, s, e,
           CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= s - 1
                THEN 0 ELSE 1 END AS flag
    FROM rem
),
isl AS (
    SELECT doc_id, s, e,
           sum(flag) OVER (PARTITION BY doc_id ORDER BY s
                ROWS UNBOUNDED PRECEDING) AS island
    FROM fl
),
per_doc AS (
    SELECT doc_id, CAST(sum(sl) AS BIGINT) AS removed_tokens
    FROM (SELECT doc_id, island, max(e) - min(s) + 1 AS sl
          FROM isl GROUP BY doc_id, island)
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS n_tokens,
       coalesce(p.removed_tokens, 0) AS removed_tokens,
       CAST(len(string_split(trim(d.text), ' ')) AS BIGINT)
           - coalesce(p.removed_tokens, 0) AS kept_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


CLEAN_TEXT_ORACLE = f"""
WITH {_GRAMS_CTE},
own AS (SELECT gram, min(doc_id) AS own_id,
               count(DISTINCT doc_id) AS dc
        FROM g GROUP BY gram),
rp AS (
    SELECT DISTINCT g.doc_id, CAST(p AS BIGINT) AS pos
    FROM g JOIN own USING (gram),
         unnest(range(g.pos, g.pos + 8)) u(p)
    WHERE own.dc >= 2 AND g.doc_id != own.own_id
),
toks AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
    FROM t, unnest(range(1, len(tk) + 1)) u(i)
),
kept AS (
    SELECT k.doc_id, k.pos, k.tok
    FROM toks k LEFT JOIN rp
      ON rp.doc_id = k.doc_id AND rp.pos = k.pos
    WHERE rp.doc_id IS NULL
)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY pos) AS clean_text,
       CAST(count(*) AS BIGINT) AS kept_tokens
FROM kept
GROUP BY doc_id
"""


def _register() -> None:
    registry.register(
        "dedup_substring_spans", dedup_substring_spans, SPANS_ORACLE
    )
    registry.register(
        "dedup_span_char_offsets", dedup_span_char_offsets, CHAR_SPANS_ORACLE
    )
    registry.register(
        "dedup_substring_pairs", dedup_substring_pairs, PAIRS_ORACLE
    )
    registry.register(
        "dedup_span_dropstats", dedup_span_dropstats, DROPSTATS_ORACLE
    )
    registry.register(
        "dedup_span_removal", dedup_span_removal, REMOVAL_ORACLE
    )
    registry.register(
        "dedup_span_clean_text", dedup_span_clean_text, CLEAN_TEXT_ORACLE
    )
