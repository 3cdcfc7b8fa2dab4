"""Link/URL extraction over markup ([north-star] N5 adjacency,
extending ``operators/markup.py`` toward the full CommonCrawl
preprocessing shape; no reference citation — the reference has no
documents). After boilerplate stripping, the other thing a web-scale
corpus pipeline pulls out of HTML is the LINK GRAPH: outlink lists
per document and host-level degree aggregates (the inputs to
PageRank-style quality priors and domain-level source caps).

Fixture: ``synth_html``'s five static anchors (relative paths) plus a
deterministic ``<ul>`` of varied links per document — two internal
doc-to-doc links (targets ``doc_id*7 % 997`` and ``doc_id*13 % 997``
on the doc's own language host), one external CDN asset on a host
cycling over 5 shards, a fragment-only anchor and a ``mailto:``
(both of which extraction must KEEP in the raw href count but DROP
from the http link set). The DuckDB oracle rebuilds the identical
bytes, so the hash match proves extraction, host parsing, filtering,
and the degree aggregation are engine-exact.

Scale posture: extraction is per-row regex map work (zero shuffle);
``link_host_degree`` is one explode + one hash aggregation on host —
the same narrow-explode pattern as the markup block queries. No
Python workers anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.markup import (
    _HTML_CTE,
    synth_html,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

_HREF_RE = r'href="([^"]*)"'
_HTTP_RE = r"^https?://"
_HOST_RE = r"^https?://([^/]+)"
#: path = everything after the host (empty -> "/")
_PATH_RE = r"^https?://[^/]*(/.*)?$"


def synth_linked_html(
    doc_id: Column, lang: Column, text: Column
) -> Column:
    """The markup fixture plus the varied-link block (appended as one
    more newline-separated block, so the markup family's block
    queries are untouched)."""
    t1 = (doc_id * F.lit(7)) % F.lit(997)
    t2 = (doc_id * F.lit(13)) % F.lit(997)
    links = F.concat(
        F.lit('<ul class="links"><li><a href="https://'),
        lang,
        F.lit(".example.test/doc/"),
        t1.cast("string"),
        F.lit('">doc a</a></li><li><a href="https://'),
        lang,
        F.lit(".example.test/doc/"),
        t2.cast("string"),
        F.lit('">doc b</a></li><li><a href="https://cdn'),
        (doc_id % F.lit(5)).cast("string"),
        F.lit(".assets.test/img/"),
        (doc_id % F.lit(50)).cast("string"),
        F.lit('.png">img</a></li><li><a href="#top">top</a></li>'),
        F.lit('<li><a href="mailto:ops@example.test">contact</a>'),
        F.lit("</li></ul>"),
    )
    return F.concat_ws("\n", synth_html(doc_id, lang, text), links)


#: DuckDB twin of the appended link block.
_LINKS_SQL = """
    '<ul class="links"><li><a href="https://' || lang
    || '.example.test/doc/' || CAST((doc_id * 7) % 997 AS VARCHAR)
    || '">doc a</a></li><li><a href="https://' || lang
    || '.example.test/doc/' || CAST((doc_id * 13) % 997 AS VARCHAR)
    || '">doc b</a></li><li><a href="https://cdn'
    || CAST(doc_id % 5 AS VARCHAR) || '.assets.test/img/'
    || CAST(doc_id % 50 AS VARCHAR)
    || '.png">img</a></li><li><a href="#top">top</a></li>'
    || '<li><a href="mailto:ops@example.test">contact</a></li></ul>'
"""

#: CTE producing (doc_id, lang, lhtml) — markup's hx plus the links.
_LINKED_CTE = (
    _HTML_CTE
    + f""",
lh AS (
    SELECT doc_id, lang,
           html || chr(10) || {_LINKS_SQL} AS lhtml
    FROM hx
)
"""
)


def _http_links(html: Column) -> Column:
    """array<string> of absolute http(s) hrefs, document order."""
    return F.filter(
        F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1)),
        lambda x: x.rlike(_HTTP_RE),
    )


def extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document outlink report: raw href count, http(s) subset,
    internal/external split (internal = the doc's own language host),
    distinct-host count, and an md5 over the SORTED http link list
    (order-insensitive content attestation)."""
    docs = load_table(spark, sf_dir, "documents")
    html = synth_linked_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    hrefs = F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))
    http = _http_links(html)
    hosts = F.transform(
        http, lambda x: F.regexp_extract(x, _HOST_RE, 1)
    )
    own_host = F.concat(F.col("lang"), F.lit(".example.test"))
    n_internal = F.size(
        F.filter(hosts, lambda h: h == own_host)
    )
    return docs.select(
        "doc_id",
        F.size(hrefs).cast("int").alias("n_hrefs"),
        F.size(http).cast("int").alias("n_http"),
        n_internal.cast("int").alias("n_internal"),
        (F.size(http) - n_internal).cast("int").alias("n_external"),
        F.size(F.array_distinct(hosts)).cast("int").alias("n_hosts"),
        F.md5(F.array_join(F.array_sort(http), "|")).alias("links_md5"),
    )


EXTRACT_LINKS_ORACLE = (
    _LINKED_CTE
    + f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lhtml, '{_HREF_RE}', 1)) AS INT)
           AS n_hrefs,
       CAST(len(list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                x -> regexp_matches(x, '{_HTTP_RE}'))) AS INT) AS n_http,
       CAST(len(list_filter(
                list_transform(
                    list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                                x -> regexp_matches(x, '{_HTTP_RE}')),
                    x -> regexp_extract(x, '{_HOST_RE}', 1)),
                h -> h = lang || '.example.test')) AS INT) AS n_internal,
       CAST(len(list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                x -> regexp_matches(x, '{_HTTP_RE}')))
            - len(list_filter(
                list_transform(
                    list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                                x -> regexp_matches(x, '{_HTTP_RE}')),
                    x -> regexp_extract(x, '{_HOST_RE}', 1)),
                h -> h = lang || '.example.test')) AS INT) AS n_external,
       CAST(len(list_distinct(
                list_transform(
                    list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                                x -> regexp_matches(x, '{_HTTP_RE}')),
                    x -> regexp_extract(x, '{_HOST_RE}', 1)))) AS INT)
           AS n_hosts,
       md5(array_to_string(list_sort(
           list_filter(regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                       x -> regexp_matches(x, '{_HTTP_RE}'))), '|'))
           AS links_md5
FROM lh
"""
)


def link_host_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level degree aggregation over the corpus link graph: for
    each target host, total inlinks, distinct linking documents, and
    distinct target paths. One explode + one hash aggregation — the
    domain-cap/source-mix input shape."""
    docs = load_table(spark, sf_dir, "documents")
    html = synth_linked_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    edges = docs.select(
        "doc_id", F.explode(_http_links(html)).alias("url")
    ).select(
        "doc_id",
        F.regexp_extract(F.col("url"), _HOST_RE, 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col("url"), _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    return edges.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_src_docs"),
        F.countDistinct("path").cast("long").alias("n_paths"),
    )


HOST_DEGREE_ORACLE = (
    _LINKED_CTE
    + f""",
edges AS (
    SELECT doc_id,
           regexp_extract(u.url, '{_HOST_RE}', 1) AS host,
           coalesce(nullif(regexp_extract(u.url, '{_PATH_RE}', 1), ''),
                    '/') AS path
    FROM (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_extract_all(lhtml, '{_HREF_RE}', 1),
                   x -> regexp_matches(x, '{_HTTP_RE}'))) AS url
        FROM lh
    ) u
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src_docs,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths
FROM edges
GROUP BY host
"""
)


def _register() -> None:
    registry.register("extract_links", extract_links, EXTRACT_LINKS_ORACLE)
    registry.register(
        "link_host_degree", link_host_degree, HOST_DEGREE_ORACLE
    )
