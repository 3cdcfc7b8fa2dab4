"""Link extraction edge cases: scheme filtering, host/path parsing,
internal-vs-external split, and fixture composition."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.links import (
    _HOST_RE,
    _PATH_RE,
    _http_links,
    extract_links,
    link_host_degree,
)


def test_scheme_filtering(spark):
    html = (
        '<a href="https://a.test/x">1</a> <a href="#frag">2</a> '
        '<a href="mailto:x@y.test">3</a> <a href="/rel">4</a> '
        '<a href="http://b.test">5</a> <a href="ftp://c.test/f">6</a>'
    )
    df = spark.createDataFrame([(html,)], "html string").select(
        _http_links(F.col("html")).alias("links")
    )
    assert df.collect()[0]["links"] == [
        "https://a.test/x",
        "http://b.test",
    ]


def test_host_and_path_parsing(spark):
    df = spark.createDataFrame(
        [("https://h.test",), ("https://h.test/",), ("http://h.test/a/b?q=1",)],
        "url string",
    ).select(
        F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract("url", _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    rows = [tuple(r) for r in df.collect()]
    assert rows == [
        ("h.test", "/"),
        ("h.test", "/"),
        ("h.test", "/a/b?q=1"),
    ]


def test_fixture_counts(spark, sf_dir):
    rows = extract_links(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # base fixture: 5 relative anchors; link block: 3 http +
        # fragment + mailto -> 10 hrefs, 3 http
        assert r["n_hrefs"] == 10
        assert r["n_http"] == 3
        assert r["n_internal"] == 2
        assert r["n_external"] == 1
        assert r["n_hosts"] in (1, 2)  # t1 == t2 can't collapse hosts


def test_host_degree_consistency(spark, sf_dir):
    deg = link_host_degree(spark, sf_dir).collect()
    total_docs = extract_links(spark, sf_dir).count()
    # every doc emits exactly 3 http links
    assert sum(r["n_links"] for r in deg) == 3 * total_docs
    for r in deg:
        assert r["n_src_docs"] <= r["n_links"]
        assert r["n_paths"] <= r["n_links"]
        assert (
            r["host"].endswith(".example.test")
            or r["host"].endswith(".assets.test")
        )


def test_link_pagerank_invariants(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.links import (
        PR_TOPN,
        link_pagerank,
    )

    rows = link_pagerank(spark, sf_dir).collect()
    assert len(rows) == PR_TOPN
    assert [r["pos"] for r in rows] == list(range(1, PR_TOPN + 1))
    ranks = [r["pagerank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    # total mass over ALL nodes stays <= 1 (mass leaks at dangling
    # nodes, never appears from nowhere); top-20 certainly <= 1
    assert sum(ranks) <= 1.0 + 1e-9


def test_crawl_frontier_semantics(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.links import (
        crawl_frontier,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    doc_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    }
    rows = crawl_frontier(spark, sf_dir).collect()
    assert rows
    per_host = {}
    for r in rows:
        # nothing visited ever reaches the frontier
        m = re.search(r"/doc/(\d+)$", r["url"])
        if m and r["host"].endswith(".example.test"):
            assert int(m.group(1)) not in doc_ids, r["url"]
        assert r["n_refs"] >= 1
        per_host.setdefault(r["host"], []).append(r)
    for host, group in per_host.items():
        group.sort(key=lambda r: r["fetch_rank"])
        # dense politeness ranks, most-referenced first
        assert [r["fetch_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        refs = [r["n_refs"] for r in group]
        assert refs == sorted(refs, reverse=True)
    # the CDN asset hosts are always unvisited -> always present
    assert any(h.endswith(".assets.test") for h in per_host)
