"""RFC 3986 §5 reference resolution: pinned §5.2.4 dot-segment
cases, the spec's §5.4 example set, a seeded random replay against
``urllib.parse.urljoin`` (the stdlib's RFC 3986 implementation), and
corpus-level taxonomy/frontier invariants."""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

import numpy as np
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.links import (
    resolve_links,
    synth_base_url,
)
from bigdata_pipelines_aws_glue_spark.operators.urls import (
    remove_dot_segments,
    resolve_ref,
)


def _rds_batch(spark, paths):
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    return [
        r["out"]
        for r in df.select(
            remove_dot_segments(F.col("p")).alias("out")
        ).collect()
    ]


def test_remove_dot_segments_pinned(spark):
    cases = [
        ("/a/b/c/./../../g", "/a/g"),  # RFC 5.2.4's worked example
        ("/", "/"),
        ("/.", "/"),
        ("/./", "/"),
        ("/a/..", "/"),
        ("/a/b/..", "/a/"),
        ("/../../a", "/a"),  # .. past root is ignored
        ("/a/./b/./c", "/a/b/c"),
        ("/a/b/../../../c", "/c"),
        ("/g..", "/g.."),  # dots inside a segment are literal
        ("/..g/x", "/..g/x"),
        ("/a/./././b", "/a/b"),
    ]
    got = _rds_batch(spark, [p for p, _ in cases])
    for (p, want), out in zip(cases, got):
        assert out == want, (p, out, want)


def _resolve_batch(spark, base_path, refs, host="a"):
    df = spark.createDataFrame([(r,) for r in refs], "ref string")
    out = df.select(
        resolve_ref(
            F.lit("http"), F.lit(host), F.lit(base_path), F.col("ref")
        ).alias("u")
    ).collect()
    return [r["u"] for r in out]


def test_resolve_rfc_5_4_examples(spark):
    """RFC 3986 §5.4 reference-resolution examples against the spec's
    base ``http://a/b/c/d;p`` (query-less — resolve_ref's documented
    base contract), fragments dropped from the targets."""
    base_path = "/b/c/d;p"
    cases = {
        "g": "http://a/b/c/g",
        "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/",
        "/g": "http://a/g",
        "//g": "http://g",
        "?y": "http://a/b/c/d;p?y",
        "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p",
        "g#s": "http://a/b/c/g",
        "g?y#s": "http://a/b/c/g?y",
        "": "http://a/b/c/d;p",
        ".": "http://a/b/c/",
        "./": "http://a/b/c/",
        "..": "http://a/b/",
        "../": "http://a/b/",
        "../g": "http://a/b/g",
        "../..": "http://a/",
        "../../": "http://a/",
        "../../g": "http://a/g",
        # abnormal examples (§5.4.2)
        "../../../g": "http://a/g",
        "../../../../g": "http://a/g",
        "/./g": "http://a/g",
        "/../g": "http://a/g",
        "g.": "http://a/b/c/g.",
        ".g": "http://a/b/c/.g",
        "g..": "http://a/b/c/g..",
        "..g": "http://a/b/c/..g",
        "./../g": "http://a/b/g",
        "./g/.": "http://a/b/c/g/",
        "g/./h": "http://a/b/c/g/h",
        "g/../h": "http://a/b/c/h",
        "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y",
        "http://x/y": "http://x/y",
        "mailto:ops@example.test": "mailto:ops@example.test",
    }
    refs = list(cases)
    got = _resolve_batch(spark, base_path, refs)
    for ref, out in zip(refs, got):
        assert out == cases[ref], (ref, out, cases[ref])
        # and the stdlib agrees on every one of them
        want = urldefrag(urljoin("http://a" + base_path, ref)).url
        assert out == want, (ref, out, want)


def test_resolve_matches_urljoin_random(spark):
    """Seeded random refs (segments drawn from real names and dot
    segments, bounded within the documented pass depth: <=3 "." /
    <=5 "..") replayed against urllib.parse.urljoin in one batch."""
    rng = np.random.RandomState(23)
    seg_pool = ["a", "bb", "c1", "d.e", "x-y", ".", ".."]
    refs = []
    for _ in range(300):
        n = rng.randint(0, 7)
        segs = [seg_pool[rng.randint(len(seg_pool))] for _ in range(n)]
        while segs.count(".") > 3 or segs.count("..") > 5:
            segs = segs[1:]
        path = "/".join(segs)
        style = rng.randint(0, 6)
        if style == 0:
            ref = "/" + path
        elif style == 1:
            ref = path
        elif style == 2:
            ref = path + "?k=" + str(rng.randint(10))
        elif style == 3:
            ref = path + "#frag"
        elif style == 4:
            ref = "//h" + str(rng.randint(5)) + ".test/" + path
        else:
            ref = "?only=" + str(rng.randint(10))
        refs.append(ref)
    base_path = "/b1/c2/d3/index.html"
    base = "http://a" + base_path
    got = _resolve_batch(spark, base_path, refs)
    for ref, out in zip(refs, got):
        want = urldefrag(urljoin(base, ref)).url
        assert out == want, (ref, out, want)


def test_corpus_kind_taxonomy(spark, sf_dir):
    """Every document contributes the same href mix: 17 refs in 8
    classes; every non-other_scheme resolution is absolute http(s)
    on a fixture host."""
    df = resolve_links(spark, sf_dir)
    n_docs = df.select("doc_id").distinct().count()
    kinds = {
        r["kind"]: r["n"]
        for r in df.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    assert kinds == {
        "root_relative": 5 * n_docs,
        "relative": 4 * n_docs,
        "absolute": 3 * n_docs,
        "empty": n_docs,
        "fragment_only": n_docs,
        "other_scheme": n_docs,
        "protocol_relative": n_docs,
        "query_only": n_docs,
    }
    bad = df.filter(
        (F.col("kind") != "other_scheme")
        & ~F.col("resolved_url").rlike(r"^https://")
    ).count()
    assert bad == 0
    # dotted refs resolved: no dot segments survive anywhere
    leftover = df.filter(
        F.col("resolved_url").rlike(r"/\.\.?(/|$)")
    ).count()
    assert leftover == 0


def test_corpus_resolution_matches_urljoin(spark, sf_dir):
    """First 40 documents: every Spark resolution equals the stdlib's
    (base rebuilt from the same fixture arithmetic)."""
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    bases = {
        r["doc_id"]: r["base"]
        for r in docs.select(
            "doc_id",
            synth_base_url(F.col("doc_id"), F.col("lang")).alias("base"),
        )
        .orderBy("doc_id")
        .limit(40)
        .collect()
    }
    rows = (
        resolve_links(spark, sf_dir)
        .filter(F.col("doc_id") < max(bases) + 1)
        .collect()
    )
    assert rows
    for r in rows:
        if r["doc_id"] not in bases:
            continue
        want = urldefrag(urljoin(bases[r["doc_id"]], r["href"])).url
        assert r["resolved_url"] == want, (r, want)


def test_frontier_resolved_invariants(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.links import (
        crawl_frontier_resolved,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    fr = crawl_frontier_resolved(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    visited = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("lang"),
            F.lit(".example.test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    # the anti join held: nothing visited is queued
    assert fr.join(visited, "url", "left_semi").count() == 0
    rows = fr.collect()
    assert rows
    by_host: dict[str, list] = {}
    for r in rows:
        assert r["n_refs"] >= 1
        by_host.setdefault(r["host"], []).append(r)
    for host, group in by_host.items():
        group.sort(key=lambda r: r["fetch_rank"])
        assert [r["fetch_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        # politeness order: most-referenced first, url tiebreak
        for a, b in zip(group, group[1:]):
            assert (-a["n_refs"], a["url"]) < (-b["n_refs"], b["url"])


def test_fixture_dot_depth_within_pass_bounds(spark, sf_dir):
    """ADVICE r14: ``remove_dot_segments`` is a bounded-pass rewrite
    (``_RDS_DOT_PASSES`` '.' passes / ``_RDS_POP_PASSES`` '..'
    passes) and never pops an ALL-DOT segment like '...'. Tie the
    fixture to those bounds: every href the corpus fixture actually
    emits must stay inside them, so a future fixture exceeding the
    bound fails HERE instead of silently resolving to non-RFC
    results."""
    import re

    from bigdata_pipelines_aws_glue_spark.operators.links import (
        _exploded_hrefs,
    )
    from bigdata_pipelines_aws_glue_spark.operators.urls import (
        _RDS_DOT_PASSES,
        _RDS_POP_PASSES,
    )

    hrefs = {
        r["href"] for r in _exploded_hrefs(spark, sf_dir).collect()
    }
    assert hrefs
    for href in hrefs:
        path = href.split("#", 1)[0].split("?", 1)[0]
        segs = path.split("/")
        # each global-replace pass removes at least one '.' / one
        # 'x/../' pair, so segment COUNTS bound the passes needed
        assert segs.count(".") <= _RDS_DOT_PASSES, href
        assert segs.count("..") <= _RDS_POP_PASSES, href
        # the pop pattern requires a non-dot char in the popped
        # segment: no fixture segment may be all-dots (depth >= 3)
        assert not any(re.fullmatch(r"\.{3,}", s) for s in segs), href
