"""HTML/markup extraction edge cases (r12): nested tags, entity
decode order, empty documents, stray ``<`` inside a script body, and
the paragraph re-join invariant the round-trip query relies on."""

import pytest
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.markup import (
    html_escape,
    strip_markup,
    synth_html,
)


def _strip_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "x string")
    return df.select(strip_markup(F.col("x")).alias("y")).first()["y"]


def test_strip_nested_tags_and_entities(spark):
    got = _strip_one(
        spark,
        "<div><em>more <strong>details</strong></em> &amp; "
        "<span>a &lt;b&gt; &quot;c&quot;</span></div>",
    )
    assert got == 'more details & a <b> "c"'


def test_strip_removes_script_with_stray_lt(spark):
    # the '<' inside the script body must not desync the tag stripper
    got = _strip_one(
        spark,
        '<p>keep</p><script>if (1 < 2) { var x = "y"; }</script><p>also</p>',
    )
    assert got == "keep also"
    # multiline script body (dotall) and style
    got = _strip_one(
        spark,
        "<style>b {\n color: red;\n}</style>pre<script>\nvar a = 1;\n</script>post",
    )
    assert got == "pre post"


def test_entity_decode_order_amp_last(spark):
    # '&amp;lt;' must decode to the literal '&lt;', NOT to '<'
    assert _strip_one(spark, "x &amp;lt; y") == "x &lt; y"


def test_escape_then_strip_roundtrips(spark):
    raw = 'a & b < c > d "e"'
    df = spark.createDataFrame([(raw,)], "x string")
    esc = df.select(html_escape(F.col("x")).alias("y")).first()["y"]
    assert "<" not in esc and ">" not in esc.replace("&gt;", "")
    assert _strip_one(spark, f"<p>{esc}</p>") == raw


@pytest.mark.parametrize("text", ["", "one", "alpha beta gamma delta epsilon"])
def test_synth_strip_contains_original(spark, text):
    # empty / single-token / odd-count docs: synthesis never crashes
    # and the normalized original text always survives extraction
    df = spark.createDataFrame([(7, "en", text)], "doc_id long, lang string, text string")
    html = synth_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    row = df.select(
        html.alias("html"), strip_markup(html).alias("stripped")
    ).first()
    assert row["html"].count("\n") == 5  # exactly 6 blocks
    norm = " ".join(text.split())
    assert norm in row["stripped"]
    # paragraphs re-join across the block boundary with ONE space
    if len(text.split()) >= 2:
        assert norm in row["stripped"]


def test_block_boilerplate_classification(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.markup import (
        boilerplate_density,
        html_main_content,
    )

    bp = boilerplate_density(spark, sf_dir).limit(5).collect()
    for r in bp:
        assert r["n_blocks"] == 6
        assert r["boiler_blocks"] == 1  # the pure-link nav
        assert r["n_links"] == 5
        assert r["max_density_ppm"] > 500000
        assert r["content_chars"] > r["boiler_chars"]

    mc = html_main_content(spark, sf_dir).limit(5).collect()
    for r in mc:
        assert r["main_block_idx"] in (3, 4)  # one of the paragraphs
        assert r["main_score"] <= r["main_chars"]


def test_fused_strip_equals_ordered_passes(spark, sf_dir):
    """r16 optimization pin: the fused alternation strip
    (``_STRIP_FUSED_RE``) equals the original ordered three-pass
    pipeline on every string the engine strips — whole synthesized
    docs AND their newline blocks (the funnel's per-block unit)."""
    from bigdata_pipelines_aws_glue_spark.operators.markup import (
        _ENTITIES,
        _SCRIPT_RE,
        _STYLE_RE,
        _TAG_RE,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    def ordered_strip(c):
        out = F.regexp_replace(c, _SCRIPT_RE, " ")
        out = F.regexp_replace(out, _STYLE_RE, " ")
        out = F.regexp_replace(out, _TAG_RE, " ")
        for ent, ch in _ENTITIES:
            out = F.replace(out, F.lit(ent), F.lit(ch))
        return F.trim(F.regexp_replace(out, r"\s+", " "))

    docs = load_table(spark, sf_dir, "documents")
    html = synth_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    whole = docs.select(
        (strip_markup(html) == ordered_strip(html)).alias("eq")
    )
    assert whole.filter(~F.col("eq")).count() == 0
    blocks = docs.select(
        F.explode(F.split(html, "\n")).alias("b")
    ).select((strip_markup(F.col("b")) == ordered_strip(F.col("b"))).alias("eq"))
    assert blocks.filter(~F.col("eq")).count() == 0
