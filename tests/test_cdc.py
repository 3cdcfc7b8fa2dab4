"""Content-defined chunking: shift-resistance (the property that
distinguishes CDC from fixed-size blocks), short-doc handling, and the
dedup/savings arithmetic on a hand corpus."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.cdc import cdc_chunks


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunks_cover_text_exactly(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, n))
        for n in (0, 1, 7, 8, 9, 300, 1000)
        if n > 0
    ]
    docs = _docs(spark, texts)
    rows = cdc_chunks(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(texts):
        segs = sorted(by_doc[i + 1], key=lambda r: r.s)
        # chunks tile [1, len] with no gap/overlap and concat to text
        assert segs[0].s == 1 and segs[-1].e == len(text)
        assert all(a.e + 1 == b.s for a, b in zip(segs, segs[1:]))
        assert "".join(r.chunk for r in segs) == text
    # docs shorter than the window are one whole-text chunk
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1


def test_boundary_shift_resistance(spark):
    """Prepending a prefix must leave the chunking of the unchanged
    tail identical from the first shared boundary on — fixed-size
    blocks would shift every block."""
    import numpy as np

    rng = np.random.default_rng(7)
    body = "".join(chr(97 + c) for c in rng.integers(0, 26, 2000))
    docs = _docs(spark, [body, "XYZPREFIX-" + body])
    rows = cdc_chunks(docs).collect()
    c1 = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.s)
    c2 = sorted((r for r in rows if r.doc_id == 2), key=lambda r: r.s)
    shared = {r.chunk for r in c1} & {r.chunk for r in c2}
    # everything after the first post-prefix boundary re-aligns: the
    # overwhelming majority of doc 1's chunks reappear verbatim
    assert len(shared) >= len(c1) - 2, (len(shared), len(c1))


def test_nonascii_chunks_are_character_based_and_cross_engine(spark):
    """Positions/lengths are CHARACTER counts (advisor r9): on
    non-ASCII text Spark and DuckDB still agree chunk-for-chunk
    (both engines' length/substr are code-point based), and the
    chunk spans count characters, not UTF-8 bytes."""
    import duckdb
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.cdc import _CUTS_CTE

    texts = [
        "héllo wörld — " * 40,          # 2-byte chars + em dash
        "naïve café 😀 résumé " * 30,   # astral emoji (4-byte)
        "日本語のテキストです。" * 25,   # 3-byte CJK
        "plain ascii text " * 40,
    ]
    docs = _docs(spark, texts)
    spark_rows = {
        (r.doc_id, r.s, r.e, r.chunk) for r in cdc_chunks(docs).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(texts) + 1), "text": texts}
        ),
    )
    oracle_rows = {
        tuple(t)
        for t in con.execute(
            f"WITH {_CUTS_CTE} SELECT doc_id, st, en, chunk FROM chunks"
        ).fetchall()
    }
    assert spark_rows == oracle_rows
    # spans are character counts: per doc they tile [1, len(text)]
    # (Python len() is code points, matching both engines), which a
    # byte-based rule would overshoot on these multi-byte texts
    for i, t in enumerate(texts):
        segs = sorted(
            (r for r in spark_rows if r[0] == i + 1), key=lambda r: r[1]
        )
        assert segs[-1][2] == len(t)
        if i < 3:  # the non-ASCII docs: char count < byte count
            assert len(t) < len(t.encode("utf-8"))
        assert "".join(r[3] for r in segs) == t


def test_dedup_and_savings_math(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.cdc import (
        cdc_chunk_dedup,
        cdc_store_savings,
    )

    per_doc = cdc_chunk_dedup(spark, sf_dir).collect()
    assert all(0 <= r.dup_bytes <= r.n_bytes for r in per_doc)
    assert all(r.n_chunks >= 1 for r in per_doc)
    s = cdc_store_savings(spark, sf_dir).collect()[0]
    assert s.store_bytes <= s.raw_bytes
    assert s.raw_bytes == sum(r.n_bytes for r in per_doc)
    assert 0.0 <= s.savings_ratio < 1.0


def test_clamped_cuts_invariants(spark):
    """FastCDC clamps: every chunk <= CDC_MAX; every non-final chunk
    >= CDC_MIN; chunks still tile the text; a doc with no content
    boundary degrades to fixed CDC_MAX blocks."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.cdc import (
        CDC_MAX,
        CDC_MIN,
        cdc_clamped_cuts,
    )

    rng = np.random.default_rng(77)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, n))
        for n in (1, 7, 31, 32, 33, 191, 192, 193, 600, 2000)
    ] + ["x" * 700]  # constant text: window hash never varies per doc
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = cdc_clamped_cuts(docs).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.cut)
    for i, t in enumerate(texts):
        cuts = sorted(by_doc[i + 1])
        assert cuts[-1] == len(t)
        lens = [b - a for a, b in zip([0] + cuts, cuts)]
        assert all(ln <= CDC_MAX for ln in lens)
        assert all(ln >= CDC_MIN for ln in lens[:-1]), (i, lens)
        assert sum(lens) == len(t)


def test_clamped_min_skips_close_boundary(spark):
    """A content boundary inside the skip region (< CDC_MIN from the
    previous cut) must NOT cut — compare against the unclamped cuts
    on the real corpus: every clamped cut is either an unclamped
    content boundary, a forced multiple-of-MAX offset from the
    previous cut, or the doc end."""
    from bigdata_pipelines_aws_glue_spark.operators.cdc import (
        CDC_MAX,
        cdc_chunks,
        cdc_clamped_cuts,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
        100
    )
    unclamped = {
        (r.doc_id, r.e) for r in cdc_chunks(docs).collect()
    }  # chunk ends = content boundaries + doc end
    clamped: dict[int, list[int]] = {}
    for r in cdc_clamped_cuts(docs).collect():
        clamped.setdefault(r.doc_id, []).append(r.cut)
    n_forced = n_content = 0
    for d, cuts in clamped.items():
        prev = 0
        for c in sorted(cuts):
            if (d, c) in unclamped:
                n_content += 1
            else:
                assert (c - prev) % CDC_MAX == 0 or c == max(cuts), (d, c)
                n_forced += 1
            prev = c
    assert n_content > 0  # the rule does use real content boundaries
