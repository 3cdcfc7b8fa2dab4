"""URL canonicalization + URL-level document dedup ([north-star] N5
adjacency, completing the crawl-curation chain of ``links.py``; no
reference citation — the reference has no documents). Between the
link graph and corpus curation sits the URL layer: crawlers see the
same page under many spellings (case, default ports, fragments,
tracking params, trailing slashes), so corpus dedup starts by
normalizing every URL to one canonical form, then keeps ONE document
per canonical URL and caps how many documents any single host may
contribute (source diversity).

Fixture: every document gets a deterministic "crawl URL" — base
identity ``https://site{h}.example.test/page/{p}`` with
``p = doc_id % PAGE_MOD`` and ``h = p % N_HOSTS`` — spelled through
one of six messy variants cycled by ``doc_id % 6``: plain,
UPPERCASE scheme+host (path case must be preserved), explicit
``:443`` default port, tracking params mixed UNSORTED with real
params (``?z=1&utm_source=...&q={p}`` — the kept set must come back
sorted), a ``#fragment``, and a trailing slash. Variants 0/1/2/4/5
all canonicalize to the bare base identity; variant 3 KEEPS its
real params and canonicalizes to ``.../page/{p}?q={p}&z=1`` — a
second, distinct canonical identity per page (ADVICE r13: group
multiplicities are per (page, kept-params) pair, not per page).
The pigeonhole on ``PAGE_MOD`` still guarantees real
cross-document collisions that only appear AFTER canonicalization
— every doc sharing (p, variant-class) collides.

Canonicalization (RFC 3986 normalization + the tracking-param strip
every crawl pipeline layers on top): lowercase scheme and host, drop
the scheme's default port, empty path -> ``/`` and trailing slash
stripped otherwise (path CASE preserved), fragment dropped, query
params split, tracking params (``utm_*``, ``fbclid``, ``gclid``,
``msclkid``) removed, survivors SORTED and rejoined.

Scale posture: canonicalization is per-row regex/string map work
(zero shuffle, whole-stage codegen); dedup is one hash aggregation
on the canonical URL (the 32-byte-key discipline of
``dedup.exact_dedup`` — here the key is the canonical string
itself, bounded by URL length); the host cap is one window over
host — the same keep-first convention (lowest doc_id wins) as
``dedup_exact``/``dedup_content_hash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: canonical page identity modulus — the pigeonhole that makes
#: distinct documents collide on canonical URL.
PAGE_MOD = 250
N_HOSTS = 5
#: max documents any single host may contribute after URL dedup
#: (~67/host survive dedup at sf0.01, ~100/host at sf0.1 — the cap
#: bites at both scales).
MAX_PER_HOST = 60

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
#: tracking params stripped by canonicalization.
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="


def synth_crawl_url(doc_id: Column) -> Column:
    """The document's messy crawl URL (deterministic; DuckDB rebuilds
    it byte-identically)."""
    p = (doc_id % F.lit(PAGE_MOD)).cast("long")
    h = (p % F.lit(N_HOSTS)).cast("string")
    ps = p.cast("string")
    variant = (doc_id % F.lit(6)).cast("int")
    plain = F.concat(
        F.lit("https://site"), h, F.lit(".example.test/page/"), ps
    )
    return (
        F.when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://SITE"),
                h,
                F.lit(".EXAMPLE.TEST/page/"),
                ps,
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://site"),
                h,
                F.lit(".example.test:443/page/"),
                ps,
            ),
        )
        .when(
            variant == 3,
            F.concat(plain, F.lit("?z=1&utm_source=feed&q="), ps),
        )
        .when(variant == 4, F.concat(plain, F.lit("#sec"), ps))
        .when(variant == 5, F.concat(plain, F.lit("/")))
        .otherwise(plain)
    )


#: DuckDB twin of the crawl-URL fixture.
_CRAWL_URL_SQL = f"""
    CASE doc_id % 6
    WHEN 1 THEN 'HTTPS://SITE' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
                 AS VARCHAR)
                || '.EXAMPLE.TEST/page/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    WHEN 2 THEN 'https://site' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
                 AS VARCHAR)
                || '.example.test:443/page/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    WHEN 3 THEN 'https://site' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
                 AS VARCHAR)
                || '.example.test/page/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
                || '?z=1&utm_source=feed&q='
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    WHEN 4 THEN 'https://site' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
                 AS VARCHAR)
                || '.example.test/page/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
                || '#sec' || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    WHEN 5 THEN 'https://site' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
                 AS VARCHAR)
                || '.example.test/page/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR) || '/'
    ELSE 'https://site' || CAST((doc_id % {PAGE_MOD}) % {N_HOSTS}
          AS VARCHAR)
         || '.example.test/page/' || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    END
"""


def _kept_params(url: Column) -> Column:
    """array of non-tracking query params, SORTED (empty array when
    the URL has no query)."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    return F.when(
        q == F.lit(""), F.array().cast("array<string>")
    ).otherwise(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda x: ~x.rlike(_TRACKING_RE),
            )
        )
    )


def _all_params(url: Column) -> Column:
    q = F.regexp_extract(url, _QUERY_RE, 1)
    return F.when(
        q == F.lit(""), F.array().cast("array<string>")
    ).otherwise(F.split(q, "&"))


def canonical_host(url: Column) -> Column:
    """lowercased host with the scheme's default port stripped."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    default_port = F.when(scheme == "https", F.lit(":443")).otherwise(
        F.when(scheme == "http", F.lit(":80")).otherwise(F.lit(""))
    )
    strip = (default_port != F.lit("")) & hostport.endswith(default_port)
    return F.when(
        strip,
        F.substring(
            hostport, 1, F.length(hostport) - F.length(default_port)
        ),
    ).otherwise(hostport)


def canonical_url(url: Column) -> Column:
    """RFC 3986 normalization + tracking-param strip (module doc)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = canonical_host(url)
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(
        (path == F.lit("")) | (path == F.lit("/")), F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))
    kept = _kept_params(url)
    query = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document canonicalization report: the raw crawl URL, its
    canonical form, the canonical host, how many query params were
    kept vs stripped, and whether normalization changed anything —
    the full canonicalization surface in one hash-attested row."""
    docs = load_table(spark, sf_dir, "documents")
    raw = synth_crawl_url(F.col("doc_id"))
    d = docs.select("doc_id", raw.alias("raw_url"))
    kept = _kept_params(F.col("raw_url"))
    return d.select(
        "doc_id",
        "raw_url",
        canonical_url(F.col("raw_url")).alias("canonical_url"),
        canonical_host(F.col("raw_url")).alias("host"),
        F.size(kept).cast("int").alias("n_params_kept"),
        (F.size(_all_params(F.col("raw_url"))) - F.size(kept))
        .cast("int")
        .alias("n_params_stripped"),
        (canonical_url(F.col("raw_url")) != F.col("raw_url"))
        .cast("boolean")
        .alias("changed"),
    )


def url_dedup_hostcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept-document manifest after the two curation stages:
    (1) URL dedup — one doc per canonical URL, lowest doc_id wins
    (the ``dedup_exact`` keep-first convention); (2) host source cap
    — at most ``MAX_PER_HOST`` docs per canonical host, again lowest
    doc_ids first. Emits the per-host rank and the group multiplicity
    so the drop decisions are auditable row by row."""
    docs = load_table(spark, sf_dir, "documents")
    raw = synth_crawl_url(F.col("doc_id"))
    d = docs.select(
        "doc_id",
        canonical_url(raw).alias("canonical_url"),
        canonical_host(raw).alias("host"),
    )
    per_url = d.groupBy("canonical_url", "host").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_dup_docs"),
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        per_url.withColumn(
            "host_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("host_rank") <= MAX_PER_HOST)
        .select(
            "doc_id", "canonical_url", "host", "n_dup_docs", "host_rank"
        )
    )


# ------------------------------------------------ DuckDB twins

#: canonicalization pipeline over a column named ``raw_url``
#: (DuckDB's list/regex kit mirrors every Spark step 1:1).
_CANON_PARTS = f"""
parts AS (
    SELECT doc_id, raw_url,
        lower(regexp_extract(raw_url, '{_SCHEME_RE}', 1)) AS scheme,
        lower(regexp_extract(raw_url, '{_HOSTPORT_RE}', 1)) AS hostport,
        regexp_extract(raw_url, '{_PATH_RE}', 1) AS path0,
        regexp_extract(raw_url, '{_QUERY_RE}', 1) AS q
    FROM raw
),
canon AS (
    SELECT doc_id, raw_url,
        CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
             THEN substr(hostport, 1, length(hostport) - 4)
             WHEN scheme = 'http' AND hostport LIKE '%:80'
             THEN substr(hostport, 1, length(hostport) - 3)
             ELSE hostport END AS host,
        CASE WHEN path0 IN ('', '/') THEN '/'
             ELSE regexp_replace(path0, '/+$', '') END AS path,
        CASE WHEN q = '' THEN CAST([] AS VARCHAR[])
             ELSE string_split(q, '&') END AS allp,
        CASE WHEN q = '' THEN CAST([] AS VARCHAR[])
             ELSE list_sort(list_filter(string_split(q, '&'),
                  x -> NOT regexp_matches(x, '{_TRACKING_RE}')))
             END AS kept,
        scheme
    FROM parts
),
cu AS (
    SELECT doc_id, raw_url, host, allp, kept,
        scheme || '://' || host || path
        || CASE WHEN len(kept) > 0
                THEN '?' || array_to_string(kept, '&') ELSE '' END
            AS canonical_url
    FROM canon
)
"""

URL_CANONICALIZE_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, {_CRAWL_URL_SQL} AS raw_url FROM documents
),
{_CANON_PARTS}
SELECT doc_id, raw_url, canonical_url, host,
       CAST(len(kept) AS INT) AS n_params_kept,
       CAST(len(allp) - len(kept) AS INT) AS n_params_stripped,
       canonical_url <> raw_url AS changed
FROM cu
"""

URL_DEDUP_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, {_CRAWL_URL_SQL} AS raw_url FROM documents
),
{_CANON_PARTS},
per_url AS (
    SELECT canonical_url, host,
           min(doc_id) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_docs
    FROM cu
    GROUP BY canonical_url, host
),
ranked AS (
    SELECT doc_id, canonical_url, host, n_dup_docs,
           CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id)
                AS INT) AS host_rank
    FROM per_url
)
SELECT doc_id, canonical_url, host, n_dup_docs, host_rank
FROM ranked
WHERE host_rank <= {MAX_PER_HOST}
"""


# ------------------------------------------ RFC 3986 §5 resolution

#: a reference that starts with a scheme is already absolute.
_REF_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"

#: rewriting passes for ``remove_dot_segments`` (RFC 3986 §5.2.4),
#: run IDENTICALLY on both engines (Java regex and RE2 share these
#: patterns and the global-replace resume-after-replacement rule, so
#: every intermediate string is engine-identical). Phase order
#: matters for confluence: "." segments vanish FIRST, then "x/../"
#: pairs cancel — the cancel pattern requires the popped segment to
#: contain a non-dot char so it can never consume a ".." itself —
#: then leading "/../" runs clamp at the root. Pass counts bound the
#: dot-segment depth handled (3 "." / 6 ".." — far past the href
#: fixture); deeper inputs would be reduced identically-incompletely
#: on both engines, never divergently.
_RDS_DOT_PASSES = 3
_RDS_POP_PASSES = 6
_RDS_TRAIL_DOT = (r"/\.$", "/")
_RDS_DOT = (r"/\./", "/")
_RDS_TRAIL_POP = (r"/\.\.$", "/../")
_RDS_POP = (r"/([^/]*[^/.][^/]*)/\.\./", "/")
_RDS_CLAMP = (r"^(/\.\.)+/", "/")


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over a path that starts with ``/`` (all merge
    outputs do), as the iterated-rewrite above. Empty result -> /.

    Fast path (optimization r15, guide §1.2 per-task work): every
    rewrite pattern above contains the two-char sequence ``/.``
    (trailing-dot, ``/./``, trailing-``..``, the pop pair, the root
    clamp), so a path WITHOUT that substring is provably a fixed
    point of all 16 passes — the guard skips the whole regex chain
    for it (most merged hrefs: ``.../sub/pN.html``). Rows with any
    dot segment take the identical pass sequence as before, so the
    engine-parity argument (same passes, same order, same bounds) is
    unchanged on every row the passes actually rewrite."""
    dotless = ~path.contains("/.")
    out = F.regexp_replace(path, *_RDS_TRAIL_DOT)
    for _ in range(_RDS_DOT_PASSES):
        out = F.regexp_replace(out, *_RDS_DOT)
    out = F.regexp_replace(out, *_RDS_TRAIL_POP)
    for _ in range(_RDS_POP_PASSES):
        out = F.regexp_replace(out, *_RDS_POP)
        out = F.regexp_replace(out, *_RDS_CLAMP)
    out = F.when(dotless, path).otherwise(out)
    return F.when(out == F.lit(""), F.lit("/")).otherwise(out)


def _rds_sql(x: str) -> str:
    """DuckDB twin of :func:`remove_dot_segments` — the same passes
    in the same order."""
    out = f"regexp_replace({x}, '{_RDS_TRAIL_DOT[0]}', '/', 'g')"
    for _ in range(_RDS_DOT_PASSES):
        out = f"regexp_replace({out}, '{_RDS_DOT[0]}', '/', 'g')"
    out = f"regexp_replace({out}, '{_RDS_TRAIL_POP[0]}', '/../', 'g')"
    for _ in range(_RDS_POP_PASSES):
        out = f"regexp_replace({out}, '{_RDS_POP[0]}', '/', 'g')"
        out = f"regexp_replace({out}, '{_RDS_CLAMP[0]}', '/', 'g')"
    return f"CASE WHEN {out} = '' THEN '/' ELSE {out} END"


def resolve_ref(
    scheme: Column, host: Column, base_path: Column, ref: Column
) -> Column:
    """RFC 3986 §5.2 reference resolution against an http(s) base,
    emitting the target URL WITHOUT its fragment (the resolver feeds
    :func:`canonical_url`, which drops fragments regardless).

    Branches, in spec order: a ref with a scheme is already absolute
    (passed through minus fragment; the fixture's absolutes carry no
    dot segments, so §5.2.2's path cleanup is a no-op on them); a
    ``//host/...`` network-path ref inherits only the scheme; a
    ``/...`` ref inherits scheme+authority with its path dot-cleaned;
    an empty or fragment-only ref is the base itself (the base
    carries no query); a ``?q`` ref keeps the base path with the new
    query; anything else merges onto the base directory (base path up
    to its last ``/``) and dot-cleans. Pure string/regex column work
    — zero shuffle, whole-stage codegen."""
    nofrag = F.substring_index(ref, "#", 1)
    # r15: plain string ops instead of two regexp_extract per href —
    # equal on every newline-free ref (the fixture's invariant; the
    # old non-DOTALL `\?(.*)$` would stop at a line terminator where
    # substr-after-instr keeps the full suffix — ADVICE r15). The
    # DuckDB twin keeps its regex form; the hash check attests the
    # values agree on the real corpus, as before.
    rpath = F.substring_index(nofrag, "?", 1)
    qpos = F.instr(nofrag, "?")
    rq = F.when(qpos > 0, F.substr(nofrag, qpos + 1)).otherwise(F.lit(""))
    q = F.when(rq == F.lit(""), F.lit("")).otherwise(
        F.concat(F.lit("?"), rq)
    )
    base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
    origin = F.concat(scheme, F.lit("://"), host)
    return (
        F.when(nofrag.rlike(_REF_SCHEME_RE), nofrag)
        .when(nofrag.startswith("//"), F.concat(scheme, F.lit(":"), nofrag))
        .when(
            rpath.startswith("/"),
            F.concat(origin, remove_dot_segments(rpath), q),
        )
        .when(
            (rpath == F.lit("")) & (rq == F.lit("")),
            F.concat(origin, base_path),
        )
        .when(rpath == F.lit(""), F.concat(origin, base_path, q))
        .otherwise(
            F.concat(
                origin,
                remove_dot_segments(F.concat(base_dir, rpath)),
                q,
            )
        )
    )


def _resolve_sql(scheme: str, host: str, base_path: str, ref: str) -> str:
    """DuckDB twin of :func:`resolve_ref` — same branches, same
    helpers. Arguments are SQL expressions (columns or literals)."""
    nofrag = f"split_part({ref}, '#', 1)"
    rpath = f"regexp_extract({nofrag}, '^([^?]*)', 1)"
    rq = f"regexp_extract({nofrag}, '\\?(.*)$', 1)"
    q = f"CASE WHEN {rq} = '' THEN '' ELSE '?' || {rq} END"
    base_dir = f"regexp_replace({base_path}, '[^/]*$', '')"
    origin = f"({scheme} || '://' || {host})"
    return f"""CASE
        WHEN regexp_matches({nofrag}, '{_REF_SCHEME_RE}') THEN {nofrag}
        WHEN {nofrag} LIKE '//%' THEN {scheme} || ':' || {nofrag}
        WHEN {rpath} LIKE '/%'
            THEN {origin} || {_rds_sql(rpath)} || {q}
        WHEN {rpath} = '' AND {rq} = '' THEN {origin} || {base_path}
        WHEN {rpath} = '' THEN {origin} || {base_path} || {q}
        ELSE {origin} || {_rds_sql(f"({base_dir} || {rpath})")} || {q}
    END"""


def _register() -> None:
    registry.register(
        "url_canonicalize", url_canonicalize, URL_CANONICALIZE_ORACLE
    )
    registry.register(
        "url_dedup_hostcap", url_dedup_hostcap, URL_DEDUP_ORACLE
    )
