"""WARC record framing ([north-star] N4/N5 adjacency; public spec
ISO 28500 / WARC 1.0; no reference citation — the reference has no
web-archive inputs). Completes the CommonCrawl-shaped pipeline the
r12 families build: WARC (this module) -> HTML (``markup.py``) ->
links (``links.py``) -> link graph PageRank.

Fixture (the synthesized-container pattern of ``tiff.py``/
``adpcm.py``): each document's ``synth_linked_html`` payload is
wrapped in a WARC/1.0 response record (WARC-Type, WARC-Record-ID,
WARC-Target-URI, Content-Length headers, CRLF framing), and records
are concatenated in doc_id order into multi-record blobs of
``RECS_PER_BLOB`` — one blob per mod-bucket, the shape of a real
``.warc`` shard.

The attested part is the PARSE: records are recovered by honest
**Content-Length framing** — read the header block at the current
offset, extract Content-Length, jump exactly that many chars plus
the CRLF trailers, repeat. Nothing splits on payload content, so a
payload containing ``WARC/1.0`` would parse correctly (that is the
point of length-prefixed framing and the reason naive
split-on-marker is wrong).

Engine strategy: Spark evaluates the sequential scan as a SINGLE
``aggregate`` higher-order fold over ``sequence(1, MAX_RECS)`` with
a (offset, records) struct accumulator — a runtime loop inside one
JVM expression, no Python, no explode-and-rejoin. DuckDB has no
ordered fold over these string ops, so the oracle unrolls the same
step ``MAX_RECS`` times as chained CTEs (the BPE/ADPCM
unrolled-replay pattern). Char (not byte) lengths are used on BOTH
sides — identical framing arithmetic engine-to-engine, and
byte==char on this ASCII corpus (the ADPCM-documented precondition).

Scale posture: blobs parse independently (one task per WARC shard —
exactly how crawl readers shard at 100 TB); the within-blob scan is
inherently sequential, as in any WARC reader. Synthesis is one
groupBy(bucket) shuffle; parse + explode are map-only.
``MAX_RECS`` bounds the fold; the audit query counts blobs whose
final offset did not consume the whole blob, so an oversized blob
fails LOUDLY (n_truncated > 0) instead of silently dropping records.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.links import (
    _LINKS_SQL,
    synth_linked_html,
)
from bigdata_pipelines_aws_glue_spark.operators.markup import _HTML_CTE
from bigdata_pipelines_aws_glue_spark.operators.skew import spread
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

RECS_PER_BLOB = 8
#: fold steps; must be >= RECS_PER_BLOB or the audit trips loudly.
MAX_RECS = 8
#: header-block slice bound for the framing scan (optimization r15):
#: the fold inspects ``blob.substr(off, MAX_HDR)`` instead of the
#: whole remaining blob. The synthesized header block is ~140 chars
#: at any doc_id this corpus can hold (pytest pins it); a header
#: past the bound fails LOUDLY (unmatched Content-Length ->
#: ''::int ANSI cast error), never silently mis-frames.
MAX_HDR = 192

_CRLF = "\r\n"
_URI_RE = r"WARC-Target-URI: ([a-z0-9:/.-]+)"
_CLEN_RE = r"Content-Length: ([0-9]+)"
_DOC_RE = r"/doc/([0-9]+)$"

_REC_TYPE = "array<struct<idx:int,uri:string,clen:int,pay_md5:string>>"


def synth_warc_record(doc_id: Column, lang: Column, payload: Column) -> Column:
    """One WARC/1.0 response record; every byte derives from
    (doc_id, lang, payload) so DuckDB rebuilds it exactly."""
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: response" + _CRLF),
        F.lit("WARC-Record-ID: <urn:doc:"),
        doc_id.cast("string"),
        F.lit(">" + _CRLF + "WARC-Target-URI: https://"),
        lang,
        F.lit(".example.test/doc/"),
        doc_id.cast("string"),
        F.lit(_CRLF + "Content-Length: "),
        F.length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
        payload,
        F.lit(_CRLF + _CRLF),
    )


def warc_blobs(docs: DataFrame) -> DataFrame:
    """(bucket, blob): records concatenated in doc_id order,
    RECS_PER_BLOB per blob. One groupBy shuffle."""
    payload = synth_linked_html(F.col("doc_id"), F.col("lang"), F.col("text"))
    rec = synth_warc_record(F.col("doc_id"), F.col("lang"), payload)
    # r16 (guide §2.5): the record synthesis runs BEFORE the bucket
    # shuffle, on however many splits the scan produced — one,
    # locally (single parquet row group). spread() parallelizes the
    # map stage; no-op when the scan already has enough splits.
    return (
        spread(docs).select(
            F.floor(F.col("doc_id") / F.lit(RECS_PER_BLOB))
            .cast("long")
            .alias("bucket"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda s: s["rec"]
                ),
                "",
            ).alias("blob")
        )
    )


def _parse_fold(blob: Column) -> Column:
    """struct(off, recs): the Content-Length framing scan as one
    runtime ``aggregate`` fold. ``off`` is the 1-based char offset
    after the last consumed record (== length+1 iff fully parsed)."""

    def step(acc: Column, i: Column) -> Column:
        # Optimization r15 (guide §1.2 per-task work): the scan only
        # ever inspects the HEADER BLOCK at the current offset — the
        # previous ``blob.substr(off, length(blob))`` copied the whole
        # remaining blob per step (O(blob) per record, O(blob^2) per
        # shard; measured 3.84 s -> 1.63 s at sf0.1, rows identical).
        # ``MAX_HDR`` bounds the header slice the way a real WARC
        # reader's header buffer does. Loud on violation: a header
        # block longer than MAX_HDR leaves Content-Length unmatched,
        # and ''::int fails the task under ANSI mode rather than
        # mis-framing silently (pytest pins the fixture's max header
        # size against the bound).
        hdr = blob.substr(acc["off"], F.lit(MAX_HDR))
        at_record = (acc["off"] < F.length(blob)) & (
            blob.substr(acc["off"], F.lit(8)) == F.lit("WARC/1.0")
        )
        hdr_end = F.instr(hdr, _CRLF + _CRLF)  # 1-based, within hdr
        # r16 (ADVICE r15): gate the parse on the CRLFCRLF separator
        # being INSIDE the slice — without this, a >MAX_HDR header
        # whose Content-Length still matched in the window would
        # mis-frame silently (hdr_end=0). The otherwise('') keeps the
        # loud ''::int ANSI failure. Identical values whenever
        # hdr_end > 0, i.e. on every input the bound admits.
        clen = (
            F.when(hdr_end > 0, F.regexp_extract(hdr, _CLEN_RE, 1))
            .otherwise(F.lit(""))
            .cast("int")
        )
        payload = blob.substr(acc["off"] + hdr_end - 1 + F.lit(4), clen)
        consumed = hdr_end - 1 + F.lit(4) + clen + F.lit(4)
        return F.when(
            at_record,
            F.struct(
                (acc["off"] + consumed).cast("int").alias("off"),
                F.array_append(
                    acc["recs"],
                    F.struct(
                        i.cast("int").alias("idx"),
                        F.regexp_extract(hdr, _URI_RE, 1).alias("uri"),
                        clen.alias("clen"),
                        F.md5(payload).alias("pay_md5"),
                    ),
                ).alias("recs"),
            ),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(MAX_RECS)),
        F.struct(
            F.lit(1).cast("int").alias("off"),
            F.array().cast(_REC_TYPE).alias("recs"),
        ),
        step,
    )


def warc_parse_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per recovered record: blob bucket, record position, the
    doc_id parsed back out of the Target-URI, the framed length, and
    the payload md5 — the hash match proves synthesis AND the
    framing scan are engine-exact."""
    blobs = warc_blobs(load_table(spark, sf_dir, "documents"))
    parsed = blobs.select(
        "bucket", F.explode(_parse_fold(F.col("blob"))["recs"]).alias("r")
    )
    return parsed.select(
        "bucket",
        F.col("r.idx").alias("rec_idx"),
        F.regexp_extract(F.col("r.uri"), _DOC_RE, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("r.clen").alias("content_length"),
        F.col("r.pay_md5").alias("payload_md5"),
    )


def warc_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus audit: every document must come back from the
    blobs with a byte-identical payload (md5 vs the original
    synthesized HTML), and every blob must be consumed exactly
    (n_truncated > 0 = a blob held more records than the fold
    reads — the loud seam)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = warc_blobs(docs)
    folded = blobs.select(
        "bucket", _parse_fold(F.col("blob")).alias("f"), F.col("blob")
    )
    truncated = folded.select(
        "bucket",
        (F.col("f.off") != F.length(F.col("blob")) + 1).alias("trunc"),
        F.size(F.col("f.recs")).alias("n_recs"),
    )
    recs = folded.select(F.explode(F.col("f.recs")).alias("r")).select(
        F.regexp_extract(F.col("r.uri"), _DOC_RE, 1)
        .cast("long")
        .alias("doc_id"),
        F.col("r.pay_md5").alias("pay_md5"),
    )
    orig = docs.select(
        "doc_id",
        F.md5(
            synth_linked_html(F.col("doc_id"), F.col("lang"), F.col("text"))
        ).alias("orig_md5"),
    )
    joined = recs.join(orig, "doc_id")
    a = truncated.agg(
        F.count(F.lit(1)).cast("long").alias("n_blobs"),
        F.sum(F.col("trunc").cast("long")).alias("n_truncated"),
        F.sum("n_recs").cast("long").alias("n_records"),
    )
    b = joined.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum(
            (F.col("pay_md5") == F.col("orig_md5")).cast("long")
        ).alias("n_payload_match"),
    )
    return a.crossJoin(b)


# ------------------------------------------------ DuckDB twins

#: record synthesis (needs hx.html from markup's CTE + the link
#: block, i.e. the exact payload synth_linked_html produces).
_CRLF_SQL = "chr(13) || chr(10)"
_REC_SQL = f"""
    'WARC/1.0' || {_CRLF_SQL} || 'WARC-Type: response' || {_CRLF_SQL}
    || 'WARC-Record-ID: <urn:doc:' || CAST(doc_id AS VARCHAR) || '>'
    || {_CRLF_SQL}
    || 'WARC-Target-URI: https://' || lang || '.example.test/doc/'
    || CAST(doc_id AS VARCHAR) || {_CRLF_SQL}
    || 'Content-Length: ' || CAST(length(payload) AS VARCHAR)
    || {_CRLF_SQL} || {_CRLF_SQL} || payload
    || {_CRLF_SQL} || {_CRLF_SQL}
"""

_BLOB_CTE = (
    _HTML_CTE
    + f""",
pay AS (
    SELECT doc_id, lang, html || chr(10) || {_LINKS_SQL} AS payload
    FROM hx
),
blobs AS (
    SELECT CAST(doc_id // {RECS_PER_BLOB} AS BIGINT) AS bucket,
           string_agg({_REC_SQL}, '' ORDER BY doc_id) AS blob
    FROM pay
    GROUP BY 1
)
"""
)


def _warc_step(i: int) -> str:
    """One unrolled framing step: the DuckDB twin of the fold body."""
    crlf2 = f"{_CRLF_SQL} || {_CRLF_SQL}"
    rest = "substr(blob, off)"
    hdr_end = f"strpos({rest}, {crlf2})"
    clen = f"CAST(regexp_extract({rest}, '{_CLEN_RE}', 1) AS INT)"
    pay = f"substr(blob, off + {hdr_end} - 1 + 4, {clen})"
    at_rec = f"(off < length(blob) AND substr(blob, off, 8) = 'WARC/1.0')"
    return f"""s{i} AS (
    SELECT bucket, blob,
        CASE WHEN {at_rec}
             THEN CAST(off + {hdr_end} - 1 + 4 + {clen} + 4 AS INT)
             ELSE off END AS off,
        CASE WHEN {at_rec}
             THEN list_append(recs, struct_pack(
                 idx := {i},
                 uri := regexp_extract({rest}, '{_URI_RE}', 1),
                 clen := {clen},
                 pay_md5 := md5({pay})))
             ELSE recs END AS recs
    FROM s{i - 1}
)"""


_PARSE_CTES = (
    f"""s0 AS (
    SELECT bucket, blob, 1 AS off,
           CAST([] AS STRUCT(idx INT, uri VARCHAR, clen INT,
                             pay_md5 VARCHAR)[]) AS recs
    FROM blobs
),
"""
    + ",\n".join(_warc_step(i) for i in range(1, MAX_RECS + 1))
)


WARC_PARSE_ORACLE = (
    _BLOB_CTE
    + ",\n"
    + _PARSE_CTES
    + f""",
rec AS (SELECT bucket, unnest(recs) AS r FROM s{MAX_RECS})
SELECT bucket,
       CAST(r.idx AS INT) AS rec_idx,
       CAST(regexp_extract(r.uri, '{_DOC_RE}', 1) AS BIGINT) AS doc_id,
       CAST(r.clen AS INT) AS content_length,
       r.pay_md5 AS payload_md5
FROM rec
"""
)


WARC_AUDIT_ORACLE = (
    _BLOB_CTE
    + ",\n"
    + _PARSE_CTES
    + f""",
tr AS (
    SELECT CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(sum(CASE WHEN off <> length(blob) + 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
           CAST(sum(len(recs)) AS BIGINT) AS n_records
    FROM s{MAX_RECS}
),
rec AS (SELECT unnest(recs) AS r FROM s{MAX_RECS}),
jm AS (
    SELECT CAST(count(DISTINCT p.doc_id) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r.pay_md5 = md5(p.payload)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_payload_match
    FROM rec
    JOIN pay p
      ON CAST(regexp_extract(r.uri, '{_DOC_RE}', 1) AS BIGINT) = p.doc_id
)
SELECT tr.n_blobs, tr.n_truncated, tr.n_records,
       jm.n_docs, jm.n_payload_match
FROM tr, jm
"""
)


def _register() -> None:
    registry.register(
        "warc_parse_records", warc_parse_records, WARC_PARSE_ORACLE
    )
    registry.register(
        "warc_roundtrip_audit", warc_roundtrip_audit, WARC_AUDIT_ORACLE
    )
