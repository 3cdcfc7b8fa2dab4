"""Sitemap ingestion ([north-star] N5 adjacency; public spec
sitemaps.org XML protocol; no reference citation — the reference has
no crawler). The OTHER crawl-discovery channel: besides following
links (``links.crawl_frontier*``), real crawlers seed their queues
from each host's sitemap.xml — publisher-declared URLs with
``lastmod`` and ``priority`` hints. This module synthesizes one
sitemap per corpus host, PARSES the XML honestly (block extraction +
per-field regex — no fixture arithmetic on the consuming side), marks
which entries the corpus has already visited (URL-exact, the
``crawl_frontier_resolved`` convention), and ranks the unvisited
remainder by the publisher's hints.

Fixture: per language host, ``SITEMAP_ENTRIES`` ``<url>`` blocks.
Every 5th entry targets ``(h + i) % LOW_MOD`` — inside the corpus
doc_id range at EVERY test SF — and the rest stride
``(h * 37 + i * 17) % SITEMAP_MOD``, a span mostly outside it at
small SFs. The visited check is URL-EXACT (the
``crawl_frontier_resolved`` convention), so a low target only counts
as visited when doc ``t``'s OWN language host is this host (~1/5 of
low targets); both branches bite at every SF (6-44 visited rows of
200 across sf0.001-sf0.1). ``lastmod``/``priority`` derive
from the target id, so the rank order is content-driven, not
positional.

Scale posture: sitemap synthesis + XML parsing are per-host string
work over a BOUNDED host list (one ~4 KB document per host — exactly
the real object's size class); the explode yields hosts x entries
rows (metadata-width); the visited check is one anti/semi-join
against the corpus URL column; the seed rank is one window per host.
Nothing scales super-linearly with the corpus — only the visited
join's probe side grows, which is the join's BUILD side being the
bounded one at 100 TB (the sitemap side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

SITEMAP_ENTRIES = 40
#: wide-stride modulus: corpus doc_ids cover [0, 500) at sf0.01 and
#: [0, 5000) at sf0.1.
SITEMAP_MOD = 6000
#: every-5th-entry modulus — always inside the corpus range, so the
#: visited branch is exercised at every SF.
LOW_MOD = 300

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LOC_RE = r"<loc>([^<]*)</loc>"
_LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"
_PRIORITY_RE = r"<priority>([^<]*)</priority>"


def _entry_xml(host: Column, t: Column) -> Column:
    """One ``<url>`` block for target id ``t`` on ``host``."""
    return F.concat(
        F.lit("<url><loc>https://"),
        host,
        F.lit("/doc/"),
        t.cast("string"),
        F.lit("</loc><lastmod>2024-"),
        F.lpad(((t % 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((t % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0."),
        (t % 10).cast("string"),
        F.lit("</priority></url>"),
    )


def synth_sitemap(host: Column, h: Column) -> Column:
    """The host's sitemap.xml: header + ``SITEMAP_ENTRIES`` blocks in
    stride order. Every byte derives from (host, h) so DuckDB
    rebuilds it identically."""
    blocks = F.transform(
        F.sequence(F.lit(0), F.lit(SITEMAP_ENTRIES - 1)),
        lambda i: _entry_xml(
            host,
            F.when(i % F.lit(5) == 0, (h + i) % F.lit(LOW_MOD)).otherwise(
                (h * F.lit(37) + i * F.lit(17)) % F.lit(SITEMAP_MOD)
            ),
        ),
    )
    return F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        ),
        F.array_join(blocks, ""),
        F.lit("</urlset>"),
    )


def sitemap_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per sitemap entry: host, the parsed URL / lastmod / priority,
    whether the corpus already holds that exact URL, and — for the
    unvisited — the seed rank a crawler would fetch in (priority
    DESC, lastmod DESC, url ASC per host; NULL for visited)."""
    docs = load_table(spark, sf_dir, "documents")
    hosts = (
        docs.select(F.col("lang"))
        .distinct()
        .select(
            F.concat(F.col("lang"), F.lit(".example.test")).alias("host"),
            # portable deterministic host seed (DuckDB has no crc32):
            # weighted char codes of the language code
            (
                F.ascii(F.substring(F.col("lang"), 1, 1)) * F.lit(7)
                + F.ascii(F.substring(F.col("lang"), 2, 1)) * F.lit(13)
            )
            .cast("long")
            .alias("h"),
        )
    )
    xml = synth_sitemap(F.col("host"), F.col("h"))
    entries = hosts.select(
        "host",
        F.explode(
            F.regexp_extract_all(xml, F.lit(_URL_BLOCK_RE), F.lit(1))
        ).alias("block"),
    ).select(
        "host",
        F.regexp_extract(F.col("block"), _LOC_RE, 1).alias("url"),
        F.to_date(
            F.regexp_extract(F.col("block"), _LASTMOD_RE, 1)
        ).alias("lastmod"),
        F.regexp_extract(F.col("block"), _PRIORITY_RE, 1)
        .cast("double")
        .alias("priority"),
    )
    # a sitemap may list the same URL twice (stride collisions):
    # keep one row per (host, url) — max hints win, deterministic.
    entries = entries.groupBy("host", "url").agg(
        F.max("lastmod").alias("lastmod"),
        F.max("priority").alias("priority"),
    )
    visited = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("lang"),
            F.lit(".example.test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    ).distinct()
    marked = entries.join(
        visited.withColumn("visited", F.lit(True)), "url", "left"
    ).withColumn("visited", F.coalesce(F.col("visited"), F.lit(False)))
    w = Window.partitionBy("host", "visited").orderBy(
        F.col("priority").desc(),
        F.col("lastmod").desc(),
        F.col("url").asc(),
    )
    return marked.select(
        "host",
        "url",
        "lastmod",
        "priority",
        "visited",
        F.when(~F.col("visited"), F.row_number().over(w))
        .cast("int")
        .alias("seed_rank"),
    )


SITEMAP_SEEDS_ORACLE = f"""
WITH hosts AS (
    SELECT DISTINCT lang || '.example.test' AS host,
           CAST(ascii(substr(lang, 1, 1)) * 7
                + ascii(substr(lang, 2, 1)) * 13 AS BIGINT) AS h
    FROM documents
),
sm AS (
    SELECT host,
        '<?xml version="1.0" encoding="UTF-8"?>' || chr(10)
        || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        || array_to_string(list_transform(range(0, {SITEMAP_ENTRIES}),
            i -> '<url><loc>https://' || host || '/doc/'
                 || CAST(CASE WHEN i % 5 = 0 THEN (h + i) % {LOW_MOD}
                         ELSE (h * 37 + i * 17) % {SITEMAP_MOD} END
                         AS VARCHAR)
                 || '</loc><lastmod>2024-'
                 || lpad(CAST((CASE WHEN i % 5 = 0 THEN (h + i) % {LOW_MOD}
                               ELSE (h * 37 + i * 17) % {SITEMAP_MOD} END)
                              % 12 + 1 AS VARCHAR), 2, '0')
                 || '-'
                 || lpad(CAST((CASE WHEN i % 5 = 0 THEN (h + i) % {LOW_MOD}
                               ELSE (h * 37 + i * 17) % {SITEMAP_MOD} END)
                              % 28 + 1 AS VARCHAR), 2, '0')
                 || '</lastmod><priority>0.'
                 || CAST((CASE WHEN i % 5 = 0 THEN (h + i) % {LOW_MOD}
                          ELSE (h * 37 + i * 17) % {SITEMAP_MOD} END)
                         % 10 AS VARCHAR)
                 || '</priority></url>'), '')
        || '</urlset>' AS xml
    FROM hosts
),
blocks AS (
    SELECT host, unnest(regexp_extract_all(xml, '{_URL_BLOCK_RE}', 1))
               AS block
    FROM sm
),
entries0 AS (
    SELECT host,
           regexp_extract(block, '{_LOC_RE}', 1) AS url,
           CAST(regexp_extract(block, '{_LASTMOD_RE}', 1) AS DATE)
               AS lastmod,
           CAST(regexp_extract(block, '{_PRIORITY_RE}', 1) AS DOUBLE)
               AS priority
    FROM blocks
),
entries AS (
    SELECT host, url, max(lastmod) AS lastmod, max(priority) AS priority
    FROM entries0
    GROUP BY host, url
),
marked AS (
    SELECT e.host, e.url, e.lastmod, e.priority,
           e.url IN (
               SELECT 'https://' || lang || '.example.test/doc/'
                      || CAST(doc_id AS VARCHAR)
               FROM documents
           ) AS visited
    FROM entries e
)
SELECT host, url, lastmod, priority, visited,
       CASE WHEN NOT visited THEN CAST(row_number() OVER (
            PARTITION BY host, visited
            ORDER BY priority DESC, lastmod DESC, url ASC) AS INT)
       END AS seed_rank
FROM marked
"""


# ------------------------------------------ the combined fetch queue


def crawl_queue_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The queue a crawler's scheduler actually pops: BOTH discovery
    channels merged — unvisited sitemap seeds and robots-allowed
    frontier URLs — deduped on (host, url) with the channel recorded
    (``both`` when a URL is publisher-declared AND link-discovered —
    the strongest fetch signal, ranked first). Per-host order:
    channel strength (both > sitemap > frontier), then link demand
    (``n_refs`` DESC), then the publisher hint (``priority`` DESC),
    then url — deterministic and replayed identically by the oracle.

    Composition query (the ``corpus_funnel`` discipline applied to
    the discovery side): every input is an individually attested
    query — ``sitemap_seeds`` and ``frontier_robots_filter`` — so a
    schema drift in either channel fails this hash check immediately.
    The merge itself is one full-outer join on (host, url) between
    two bounded-per-host frames plus one politeness window.

    The lineage cut that keeps Catalyst from pushing the ``allowed``
    filter — and with it the whole robots match expression — below
    ``crawl_frontier_resolved``'s URL aggregation (the r15-build fix,
    measured 14 s -> 4.5 s at sf0.1) now lives INSIDE
    ``frontier_robots_filter`` itself (optimization r15: the frontier
    is checkpointed there and the robots parse is per-host +
    broadcast join), so this query no longer re-checkpoints it; the
    filter lands on the checkpointed, already-joined verdict
    column."""
    from bigdata_pipelines_aws_glue_spark.operators.robots import (
        frontier_robots_filter,
    )

    sm = (
        sitemap_seeds(spark, sf_dir)
        .filter(~F.col("visited"))
        .select("host", "url", F.col("priority").alias("sm_priority"))
    )
    fr = (
        frontier_robots_filter(spark, sf_dir)
        .filter(F.col("allowed"))
        .select("host", "url", "n_refs")
    )
    merged = sm.join(fr, ["host", "url"], "full_outer").select(
        "host",
        "url",
        F.when(
            F.col("sm_priority").isNotNull() & F.col("n_refs").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("sm_priority").isNotNull(), F.lit("sitemap"))
        .otherwise(F.lit("frontier"))
        .alias("channel"),
        "n_refs",
        "sm_priority",
    )
    strength = (
        F.when(F.col("channel") == "both", 0)
        .when(F.col("channel") == "sitemap", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("host").orderBy(
        strength.asc(),
        F.coalesce(F.col("n_refs"), F.lit(0)).desc(),
        F.coalesce(F.col("sm_priority"), F.lit(-1.0)).desc(),
        F.col("url").asc(),
    )
    return merged.select(
        "host",
        F.row_number().over(w).cast("int").alias("fetch_rank"),
        "url",
        "channel",
        "n_refs",
        "sm_priority",
    )


def _queue_oracle() -> str:
    from bigdata_pipelines_aws_glue_spark.operators.robots import (
        FRONTIER_ROBOTS_ORACLE,
    )

    return f"""
WITH smq AS MATERIALIZED (
    {SITEMAP_SEEDS_ORACLE}
),
frq AS MATERIALIZED (
    {FRONTIER_ROBOTS_ORACLE}
),
sm AS (
    SELECT host, url, priority AS sm_priority FROM smq WHERE NOT visited
),
fr AS (
    SELECT host, url, n_refs FROM frq WHERE allowed
),
merged AS (
    SELECT coalesce(sm.host, fr.host) AS host,
           coalesce(sm.url, fr.url) AS url,
           CASE WHEN sm.sm_priority IS NOT NULL AND fr.n_refs IS NOT NULL
                THEN 'both'
                WHEN sm.sm_priority IS NOT NULL THEN 'sitemap'
                ELSE 'frontier' END AS channel,
           fr.n_refs, sm.sm_priority
    FROM sm FULL OUTER JOIN fr
      ON sm.host = fr.host AND sm.url = fr.url
)
SELECT host,
       CAST(row_number() OVER (
            PARTITION BY host
            ORDER BY CASE channel WHEN 'both' THEN 0
                     WHEN 'sitemap' THEN 1 ELSE 2 END ASC,
                     coalesce(n_refs, 0) DESC,
                     coalesce(sm_priority, -1.0) DESC,
                     url ASC
       ) AS INT) AS fetch_rank,
       url, channel, n_refs, sm_priority
FROM merged
"""


def _register() -> None:
    registry.register("sitemap_seeds", sitemap_seeds, SITEMAP_SEEDS_ORACLE)
    registry.register(
        "crawl_queue_combined", crawl_queue_combined, _queue_oracle()
    )
