"""Substring/span-level dedup: hand-built fixtures pin the maximal-span
merge semantics (overlap merge, adjacency merge, k-1 boundary, pair
coordinates) that the DuckDB oracle then re-checks at corpus scale."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.spandedup import (
    duplicated_spans,
    shared_span_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_duplicate_block(spark):
    # Two docs share a 10-token block inside distinct surroundings.
    block = "the quick brown fox jumps over the lazy dog again"
    d1 = f"alpha beta {block} gamma delta epsilon zeta eta theta iota"
    d2 = f"one two three four {block} five six seven eight nine ten"
    docs = _docs(spark, [d1, d2])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in duplicated_spans(docs, k=8).collect()
    }
    # d1: block occupies tokens 3..12; d2: tokens 5..14. Every 8-gram
    # inside the block (3 of them) is shared; nothing else repeats.
    assert got == {(1, 3, 12, 10), (2, 5, 14, 10)}


def test_char_offsets_address_the_real_text(spark):
    """The char-offset variant's [span_char_start, span_char_end]
    must cut exactly the duplicated tokens out of the trimmed text —
    verified against Python slicing, independent of both engines.
    Doc 3 leads with spaces so the trim convention is exercised."""
    from bigdata_pipelines_aws_glue_spark.operators.spandedup import (
        duplicated_spans_chars,
    )

    block = "the quick brown fox jumps over the lazy dog again"
    d1 = f"alpha beta {block} gamma delta epsilon zeta eta theta iota"
    d2 = f"one two three four {block} five six seven eight nine ten"
    d3 = f"   {block} pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8"
    docs = _docs(spark, [d1, d2, d3])
    rows = duplicated_spans_chars(docs, k=8).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}
    texts = {1: d1, 2: d2, 3: d3}
    for r in rows:
        trimmed = texts[r.doc_id].strip()
        toks = trimmed.split(" ")
        # char slice == the span text == the token slice re-joined
        assert (
            trimmed[r.span_char_start - 1 : r.span_char_end]
            == r.span_text
            == " ".join(toks[r.span_start - 1 : r.span_end])
            == block
        )
        assert r.span_len == r.span_end - r.span_start + 1 == 10


def test_below_k_not_reported(spark):
    # A shared run of only k-1=7 tokens contains no shared 8-gram.
    shared7 = "a b c d e f g"
    d1 = f"{shared7} unique1 unique2 unique3 unique4 unique5"
    d2 = f"prefix1 prefix2 {shared7} tail1 tail2 tail3 tail4"
    docs = _docs(spark, [d1, d2])
    assert duplicated_spans(docs, k=8).count() == 0


def test_adjacent_islands_merge(spark):
    # Two shared 8-gram blocks, AB and CD, sit back-to-back in doc 1
    # (tokens 1..8 then 9..16) but come from two DIFFERENT partner
    # docs. The 8-grams bridging the boundary are unique to doc 1, yet
    # the two duplicated intervals are token-adjacent and must merge
    # into one maximal span 1..16.
    ab = "a1 a2 a3 a4 a5 a6 a7 a8"
    cd = "c1 c2 c3 c4 c5 c6 c7 c8"
    d1 = f"{ab} {cd}"
    d2 = f"{ab} x1 x2 x3 x4 x5 x6 x7 x8"
    d3 = f"y1 y2 y3 y4 y5 y6 y7 y8 {cd}"
    docs = _docs(spark, [d1, d2, d3])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=8).collect()
    }
    assert (1, 1, 16) in spans
    assert (1, 1, 8) not in spans and (1, 9, 16) not in spans
    assert (2, 1, 8) in spans and (3, 9, 16) in spans


def test_pair_report_coordinates(spark):
    block = "the quick brown fox jumps over the lazy dog again"
    d1 = f"alpha beta {block} gamma delta epsilon zeta eta theta iota"
    d2 = f"one two three four {block} five six seven eight nine ten"
    docs = _docs(spark, [d1, d2])
    rows = shared_span_pairs(docs, k=8).collect()
    assert len(rows) == 1
    r = rows[0]
    # Coordinates are doc_a's (lower id): block = tokens 3..12 of d1.
    assert (r.doc_a, r.doc_b, r.n_spans, r.dup_tokens, r.longest_span) == (
        1,
        2,
        1,
        10,
        10,
    )


def test_pair_df_cap_drops_hot_gram(spark):
    # A gram shared by MORE than df_cap docs proposes no pairs; the
    # per-doc span report still counts it.
    block = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = _docs(spark, [f"{block} tail{i}a tail{i}b" for i in range(4)])
    assert shared_span_pairs(docs, k=8, df_cap=3).count() == 0
    assert shared_span_pairs(docs, k=8, df_cap=4).count() == 6
    assert duplicated_spans(docs, k=8).count() == 4


def test_dropstats_and_keep_first_removal(spark):
    block = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    d1 = f"alpha beta {block} gamma delta epsilon zeta eta theta iota"  # 19
    d2 = f"one two three four {block} five six seven eight nine ten"  # 20
    d3 = "totally unique words with no shared eight gram run here now"  # 11
    docs = _docs(spark, [d1, d2, d3])

    from bigdata_pipelines_aws_glue_spark.operators.spandedup import (
        span_dropstats,
        span_removal_stats,
    )

    drops = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_frac)
        for r in span_dropstats(docs, k=8).collect()
    }
    # BOTH sharers carry the dup span in dropstats; the unique doc is 0
    assert drops[1] == (19, 10, 0.526316)  # floor(10/19*1e6+0.5)/1e6
    assert drops[2] == (20, 10, 0.5)
    assert drops[3] == (11, 0, 0.0)

    rm = {
        r.doc_id: (r.n_tokens, r.removed_tokens, r.kept_tokens)
        for r in span_removal_stats(docs, k=8).collect()
    }
    # keep-first: doc 1 (min doc_id) is the canonical owner and loses
    # nothing; doc 2 loses exactly the 10-token block
    assert rm[1] == (19, 0, 19)
    assert rm[2] == (20, 10, 10)
    assert rm[3] == (11, 0, 11)


def test_clean_text_materialization(spark):
    block = "the quick brown fox jumps over the lazy dog again"
    d1 = f"alpha beta {block} gamma delta"
    d2 = f"one two {block} three four"
    d3 = block  # fully duplicated, non-owner -> dropped entirely
    docs = _docs(spark, [d1, d2, d3])

    from bigdata_pipelines_aws_glue_spark.operators.spandedup import (
        span_clean_text,
    )

    got = {r.doc_id: (r.clean_text, r.kept_tokens)
           for r in span_clean_text(docs, k=8).collect()}
    # owner (doc 1) keeps everything verbatim
    assert got[1] == (d1, 14)
    # doc 2 loses exactly the block, order and spacing preserved
    assert got[2] == ("one two three four", 4)
    # doc 3 is 100% duplicated and vanishes from the cleaned corpus
    assert 3 not in got
