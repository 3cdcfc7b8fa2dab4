"""URL canonicalization edge cases (case, default ports, param
order/stripping, fragments, trailing slashes) and the dedup +
host-cap keep-first conventions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.urls import (
    MAX_PER_HOST,
    canonical_host,
    canonical_url,
    url_canonicalize,
    url_dedup_hostcap,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        tuple(r)
        for r in df.select(
            canonical_url(F.col("url")).alias("c"),
            canonical_host(F.col("url")).alias("h"),
        ).collect()
    ]


def test_case_port_fragment_slash(spark):
    got = _canon(
        spark,
        [
            "HTTPS://Ex.COM:443/A/b/?b=2&a=1&utm_source=x#frag",
            "http://ex.com:80/",
            "http://ex.com:8080/x",  # non-default port KEPT
            "https://ex.com",  # empty path -> /
            "https://ex.com/deep/path///",
        ],
    )
    assert got == [
        # path case preserved; params sorted; utm/fragment dropped
        ("https://ex.com/A/b?a=1&b=2", "ex.com"),
        ("http://ex.com/", "ex.com"),
        ("http://ex.com:8080/x", "ex.com:8080"),
        ("https://ex.com/", "ex.com"),
        ("https://ex.com/deep/path", "ex.com"),
    ]


def test_param_order_insensitive(spark):
    a, b = _canon(
        spark,
        [
            "https://h.test/p?z=1&a=2&utm_campaign=c",
            "https://h.test/p?a=2&fbclid=xyz&z=1",
        ],
    )
    assert a == b == ("https://h.test/p?a=2&z=1", "h.test")


def test_tracking_only_query_drops_question_mark(spark):
    (got,) = _canon(spark, ["https://h.test/p?utm_source=x&gclid=1"])
    assert got == ("https://h.test/p", "h.test")


def test_corpus_dedup_and_hostcap(spark, sf_dir):
    canon = url_canonicalize(spark, sf_dir).collect()
    n_docs = len(canon)
    assert n_docs > 0
    by_url: dict[str, list[int]] = {}
    for r in canon:
        by_url.setdefault(r["canonical_url"], []).append(r["doc_id"])
    # the PAGE_MOD pigeonhole must produce real cross-doc collisions
    assert any(len(v) > 1 for v in by_url.values())

    kept = url_dedup_hostcap(spark, sf_dir).collect()
    kept_urls = {r["canonical_url"] for r in kept}
    assert len(kept_urls) == len(kept)  # one row per canonical URL
    per_host: dict[str, list] = {}
    for r in kept:
        # keep-first: the kept doc is the MIN doc_id of its URL group
        assert r["doc_id"] == min(by_url[r["canonical_url"]])
        assert r["n_dup_docs"] == len(by_url[r["canonical_url"]])
        per_host.setdefault(r["host"], []).append(r)
    for host, rows in per_host.items():
        assert len(rows) <= MAX_PER_HOST
        rows.sort(key=lambda r: r["host_rank"])
        assert [r["host_rank"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        # host-cap keep-first: ranks follow ascending doc_id
        doc_ids = [r["doc_id"] for r in rows]
        assert doc_ids == sorted(doc_ids)


def test_canonicalization_idempotent_hypothesis(spark):
    """canonical(canonical(u)) == canonical(u) over randomized messy
    URLs — the fixed-point property that makes canonical URLs safe
    as dedup keys (a second normalization pass can never split a
    group). One Spark job over the whole example batch."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text(alphabet="abcXYZ09", min_size=1, max_size=6)
    param = st.sampled_from(
        ["a=1", "z=9", "q=x", "utm_source=f", "fbclid=k", "gclid=g"]
    )
    urls = st.builds(
        lambda scheme, host, port, segs, params, frag: (
            scheme
            + "://"
            + host
            + port
            + ("/" + "/".join(segs) if segs else "")
            + ("?" + "&".join(params) if params else "")
            + frag
        ),
        st.sampled_from(["http", "https", "HTTP", "HTTPS", "Https"]),
        st.builds(lambda a, b: a + "." + b, label, label),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(label, max_size=3),
        st.lists(param, max_size=4),
        st.sampled_from(["", "#top", "#s1"]),
    )

    collected = []

    @settings(max_examples=150, deadline=None)
    @given(urls)
    def _collect(u):
        collected.append(u)

    _collect()
    df = spark.createDataFrame([(u,) for u in collected], "url string")
    rows = df.select(
        "url",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
        canonical_host(F.col("url")).alias("h1"),
        canonical_host(canonical_url(F.col("url"))).alias("h2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r["url"]
        assert r["h1"] == r["h2"], r["url"]
