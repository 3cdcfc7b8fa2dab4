"""robots.txt exclusion over the crawl frontier ([north-star] N5
adjacency; public spec RFC 9309, Robots Exclusion Protocol; no
reference citation — the reference has no crawler). The last gate
before a frontier URL is actually fetched: parse the host's
robots.txt, find the LONGEST rule whose path-prefix matches the URL's
path (Allow wins length ties, RFC 9309 §2.2.2), default-allow when
nothing matches, and re-rank the surviving queue per host.

Fixture: every frontier host serves a deterministic robots.txt built
from one template parameterized by ``k = length(host) % 3`` — so
both engines rebuild it byte-identically from the host string alone,
no extra table. The template exercises every decision class the
spec's precedence rule has: a short Disallow (``/doc/1`` — prefix
semantics block /doc/1, /doc/12, /doc/199…), a LONGER Allow carve-out
(``/doc/1{k}`` — re-allows a subtree inside the block), a directory
Disallow that bites the CDN assets (``/img/``) with its own carve-out
(``/img/4``), a resolved-path Disallow (``/s{k}/``), and a
Crawl-delay field (parsed and emitted — the politeness knob real
crawlers read even though RFC 9309 leaves it out).

Emitted per frontier URL: the matched rule (``A:<path>`` /
``D:<path>`` / '' for default-allow) so the longest-match decision is
auditable row by row, the allow verdict, the host's crawl delay, and
``fetch_rank`` — the politeness rank among ALLOWED URLs only (NULL
for blocked rows): the queue a polite fetcher actually pops.

Scale posture: robots synthesis + parsing + matching are per-row JVM
expressions (split / filter / transform / array_max over the
bounded rule list — no explode, no shuffle beyond what the frontier
itself pays); the re-rank is one window over (host, allowed). At
100 TB the robots table is per-HOST (bounded, broadcastable) — here
it is derived per row, which is the same cost shape without the
join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.links import (
    CRAWL_FRONTIER_RESOLVED_ORACLE,
    crawl_frontier_resolved,
)

#: rule-line extraction (the group-2 capture is the path prefix; an
#: empty Disallow path means allow-all and is dropped by the matcher
#: because '' prefix-matches nothing under the non-empty guard).
#:
#: SCOPE (ADVICE r14): this matcher implements PLAIN PATH-PREFIX
#: matching only — the '*' and '$' special characters of RFC 9309
#: §2.2.3 are NOT supported, and a rule line must have exactly one
#: space after the 'Allow:'/'Disallow:' field name. That is exact for
#: every robots.txt this engine synthesizes (``synth_robots`` emits
#: neither wildcards nor loose whitespace — both engines parse the
#: SAME bytes, so the attested semantics are parity-by-construction),
#: but the helpers are NOT full RFC 9309 evaluators: a real-world
#: robots.txt using '*'/'$' or tab-separated fields would be
#: mis-evaluated. Extend ``_RULE_RE``/``_verdict`` (mirrored in the
#: oracle) before pointing a fixture at wildcard rules.
_RULE_RE = r"^(Allow|Disallow): (.*)$"
_PATH_RE = r"^https?://[^/]*(/.*)?$"


def synth_robots(host: Column) -> Column:
    """The host's deterministic robots.txt (module doc)."""
    k = (F.length(host) % F.lit(3)).cast("string")
    return F.concat(
        F.lit("User-agent: *\nDisallow: /doc/1\nAllow: /doc/1"),
        k,
        F.lit("\nDisallow: /img/\nAllow: /img/4\nDisallow: /s"),
        k,
        F.lit("/\nCrawl-delay: "),
        (F.length(host) % F.lit(5) + F.lit(1)).cast("string"),
        F.lit("\n"),
    )


#: DuckDB twin over a column named ``host``.
_ROBOTS_SQL = """
    'User-agent: *' || chr(10)
    || 'Disallow: /doc/1' || chr(10)
    || 'Allow: /doc/1' || CAST(length(host) % 3 AS VARCHAR) || chr(10)
    || 'Disallow: /img/' || chr(10)
    || 'Allow: /img/4' || chr(10)
    || 'Disallow: /s' || CAST(length(host) % 3 AS VARCHAR) || '/' || chr(10)
    || 'Crawl-delay: ' || CAST(length(host) % 5 + 1 AS VARCHAR) || chr(10)
"""


def _rules(robots: Column) -> Column:
    """array<struct<l:int,a:int,p:string>> of parsed rules — length
    first and allow-as-int second so a struct max IS the RFC 9309
    longest-match-Allow-wins precedence."""
    lines = F.split(robots, "\n")
    rule_lines = F.filter(lines, lambda l: l.rlike(_RULE_RE))
    return F.transform(
        rule_lines,
        lambda l: F.struct(
            F.length(F.regexp_extract(l, _RULE_RE, 2))
            .cast("int")
            .alias("l"),
            l.startswith("Allow:").cast("int").alias("a"),
            F.regexp_extract(l, _RULE_RE, 2).alias("p"),
        ),
    )


def _verdict(rules: Column, path: Column) -> Column:
    """struct(matched_rule, allowed): the max matching rule under
    (length, allow) ordering; no match -> default allow."""
    matched = F.filter(
        rules,
        lambda r: (r["p"] != F.lit("")) & path.startswith(r["p"]),
    )
    win = F.array_max(matched)
    return F.struct(
        F.when(win.isNull(), F.lit(""))
        .otherwise(
            F.concat(
                F.when(win["a"] == 1, F.lit("A:")).otherwise(F.lit("D:")),
                win["p"],
            )
        )
        .alias("matched_rule"),
        (win.isNull() | (win["a"] == 1)).alias("allowed"),
    )


def url_path(url: Column) -> Column:
    """The URL's path component for rule matching ('/' when absent)."""
    return F.coalesce(
        F.nullif(F.regexp_extract(url, _PATH_RE, 1), F.lit("")),
        F.lit("/"),
    )


def robots_allowed(host: Column, url: Column) -> Column:
    """Boolean: does ``host``'s synthesized robots.txt allow ``url``?
    The same parse+longest-match expression ``frontier_robots_filter``
    uses, packaged for reuse by the crawl-loop queries."""
    return _verdict(_rules(synth_robots(host)), url_path(url))["allowed"]


#: DuckDB twin of :func:`url_path` over a column named ``url``.
URL_PATH_SQL = (
    f"coalesce(nullif(regexp_extract(url, '{_PATH_RE}', 1), ''), '/')"
)


def robots_win_sql(path_sql: str) -> str:
    """DuckDB expression for the WINNING robots rule struct (or NULL
    for default-allow) over a relation exposing a ``host`` column —
    the (length, allow)-max matching rule, identical to the
    ``FRONTIER_ROBOTS_ORACLE`` machinery. Allowed iff
    ``win IS NULL OR struct_extract(win, 'a') = 1``."""
    return f"""(list_sort(list_filter(
        list_transform(
            list_filter(string_split({_ROBOTS_SQL}, chr(10)),
                l -> regexp_matches(l, '{_RULE_RE}')),
            l -> struct_pack(
                l := CAST(length(regexp_extract(l, '{_RULE_RE}', 2))
                          AS INT),
                a := CAST(CASE WHEN l LIKE 'Allow:%' THEN 1
                          ELSE 0 END AS INT),
                p := regexp_extract(l, '{_RULE_RE}', 2))),
        r -> struct_extract(r, 'p') <> ''
             AND starts_with({path_sql}, struct_extract(r, 'p'))),
        'DESC'))[1]"""


#: DuckDB expression for the per-host crawl delay (the
#: ``synth_robots`` Crawl-delay field, parsed — mirrors the Spark
#: side's regexp over the synthesized bytes).
CRAWL_DELAY_SQL = (
    f"CAST(regexp_extract({_ROBOTS_SQL}, 'Crawl-delay: ([0-9]+)', 1) "
    "AS INT)"
)


def crawl_delay(host: Column) -> Column:
    """The host's Crawl-delay, parsed from its synthesized robots.txt
    (same derivation as ``frontier_robots_filter``'s column)."""
    return (
        F.regexp_extract(
            synth_robots(host), r"Crawl-delay: ([0-9]+)", 1
        )
        .cast("int")
    )


def host_rules_frame(df: DataFrame) -> DataFrame:
    """(host, _robots_rules, _robots_delay): each distinct host's
    robots.txt synthesized and PARSED ONCE (optimization r15, guide
    §2.3/§3.1). The per-row form re-ran the parse expression tree
    (~8 rlike + ~11 regexp_extract over the synthesized text) on
    EVERY URL row; hosts are bounded, so parsing per host and
    broadcast-joining the rule arrays back is the shape the module
    doc always promised for 100 TB ("the robots table is per-HOST,
    bounded, broadcastable"). The caller must pass a frame whose
    lineage is cheap to traverse twice or checkpointed (the distinct
    + the join both consume it)."""
    return df.select("host").distinct().select(
        "host",
        _rules(synth_robots(F.col("host"))).alias("_robots_rules"),
        crawl_delay(F.col("host")).alias("_robots_delay"),
    )


def robots_gate(df: DataFrame, keep_delay: bool = False) -> DataFrame:
    """``df`` filtered to rows whose URL the host's robots.txt allows
    — the join form of ``robots_allowed`` for frames with MANY rows
    per host (optimization r15): the robots parse runs once per
    distinct host (``host_rules_frame``), the bounded rules table
    broadcasts back, and the per-row work shrinks to the prefix
    match. Identical verdicts to the per-row form (same expressions
    over the same synthesized bytes) FOR NON-NULL HOSTS — the inner
    equi-join drops NULL-host rows, whereas ``robots_allowed(NULL,
    url)`` default-allows (NULL rules -> NULL win -> allow). Every
    caller synthesizes hosts (never NULL), so the forms agree on all
    reachable inputs; a future caller with nullable hosts must
    pre-filter or use the per-row form (ADVICE r15).
    ``keep_delay=True`` retains the host's parsed Crawl-delay as
    ``_robots_delay``. The caller must pass a frame that is cheap to
    consume twice (checkpoint first — the distinct and the join both
    read it)."""
    hr = host_rules_frame(df)
    v = _verdict(F.col("_robots_rules"), url_path(F.col("url")))
    out = df.join(F.broadcast(hr), "host").filter(v["allowed"]).drop(
        "_robots_rules"
    )
    return out if keep_delay else out.drop("_robots_delay")


def frontier_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``crawl_frontier_resolved`` pushed through each host's robots
    gate: per URL the matched rule, the allow verdict, the host's
    crawl delay, and the politeness rank recomputed over ALLOWED URLs
    only (NULL for blocked).

    Optimization r15: the frontier is eagerly checkpointed (this also
    pins the r15-build pushdown fix HERE instead of at each caller:
    Catalyst can no longer push the verdict below the frontier's URL
    aggregation), and the robots parse runs once per HOST via
    ``host_rules_frame`` + broadcast join instead of once per URL row
    — measured 4.1 s -> ~2.6 s at sf0.1, rows identical (every fr
    host is in the rules frame by construction, so the inner join
    preserves the row multiset)."""
    fr = (
        crawl_frontier_resolved(spark, sf_dir)
        .drop("fetch_rank")
        .localCheckpoint(eager=True)
    )
    hr = host_rules_frame(fr)
    v = _verdict(F.col("_robots_rules"), url_path(F.col("url")))
    d = fr.join(F.broadcast(hr), "host").select(
        "host",
        "url",
        "n_refs",
        "first_ref_doc",
        v["matched_rule"].alias("matched_rule"),
        v["allowed"].alias("allowed"),
        F.col("_robots_delay").alias("crawl_delay"),
    )
    return d.withColumn(
        "fetch_rank",
        F.when(
            F.col("allowed"),
            F.row_number().over(
                Window.partitionBy("host", "allowed").orderBy(
                    F.col("n_refs").desc(), F.col("url").asc()
                )
            ),
        ).cast("int"),
    ).select(
        "host",
        "url",
        "n_refs",
        "first_ref_doc",
        "matched_rule",
        "allowed",
        "crawl_delay",
        "fetch_rank",
    )


#: the frontier oracle is reused as a CTE; rules are parsed and
#: matched with the same list operations, the winner picked by a
#: DESC struct sort (identical (l, a, p) ordering).
FRONTIER_ROBOTS_ORACLE = f"""
WITH frx AS MATERIALIZED (
    {CRAWL_FRONTIER_RESOLVED_ORACLE}
),
rb AS (
    SELECT host, url, n_refs, first_ref_doc,
           coalesce(nullif(regexp_extract(url, '{_PATH_RE}', 1), ''),
                    '/') AS path,
           list_filter(
               list_transform(
                   list_filter(string_split({_ROBOTS_SQL}, chr(10)),
                       l -> regexp_matches(l, '{_RULE_RE}')),
                   l -> struct_pack(
                       l := CAST(length(regexp_extract(l, '{_RULE_RE}', 2))
                                 AS INT),
                       a := CAST(CASE WHEN l LIKE 'Allow:%' THEN 1
                                 ELSE 0 END AS INT),
                       p := regexp_extract(l, '{_RULE_RE}', 2))),
               r -> struct_extract(r, 'p') <> ''
                    AND starts_with(
                        coalesce(nullif(regexp_extract(url,
                            '{_PATH_RE}', 1), ''), '/'),
                        struct_extract(r, 'p'))) AS matched,
           CAST(regexp_extract({_ROBOTS_SQL}, 'Crawl-delay: ([0-9]+)', 1)
                AS INT) AS crawl_delay
    FROM frx
),
rv AS (
    SELECT host, url, n_refs, first_ref_doc, crawl_delay,
           (list_sort(matched, 'DESC'))[1] AS win
    FROM rb
),
dec AS (
    SELECT host, url, n_refs, first_ref_doc,
           CASE WHEN win IS NULL THEN ''
                ELSE (CASE WHEN struct_extract(win, 'a') = 1
                      THEN 'A:' ELSE 'D:' END) || struct_extract(win, 'p')
           END AS matched_rule,
           (win IS NULL OR struct_extract(win, 'a') = 1) AS allowed,
           crawl_delay
    FROM rv
)
SELECT host, url, n_refs, first_ref_doc, matched_rule, allowed,
       crawl_delay,
       CASE WHEN allowed THEN CAST(row_number() OVER (
            PARTITION BY host, allowed
            ORDER BY n_refs DESC, url ASC) AS INT) END AS fetch_rank
FROM dec
"""


def _register() -> None:
    registry.register(
        "frontier_robots_filter",
        frontier_robots_filter,
        FRONTIER_ROBOTS_ORACLE,
    )
