"""WARC framing: the adversarial payload case (payload contains the
record marker — only honest Content-Length framing survives), the
truncation seam, and malformed-blob behavior."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.warc import (
    MAX_RECS,
    _parse_fold,
    warc_parse_records,
    warc_roundtrip_audit,
)


def _rec(doc_id: int, payload: str) -> str:
    return (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: https://en.example.test/doc/{doc_id}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n{payload}\r\n\r\n"
    )


def _parse(spark, blob: str):
    df = spark.createDataFrame([(blob,)], "blob string").select(
        _parse_fold(F.col("blob")).alias("f"), F.length("blob").alias("n")
    )
    row = df.collect()[0]
    return row["f"]["off"], row["f"]["recs"], row["n"]


def test_payload_containing_marker_parses_correctly(spark):
    # payload embeds a fake record head — split-on-marker would
    # shatter this; Content-Length framing must not.
    evil = "see WARC/1.0\r\nContent-Length: 999\r\n\r\n inside text"
    blob = _rec(7, evil) + _rec(8, "tail")
    off, recs, n = _parse(spark, blob)
    assert off == n + 1
    assert [r["clen"] for r in recs] == [len(evil), 4]
    assert recs[0]["pay_md5"] == hashlib.md5(evil.encode()).hexdigest()
    assert recs[1]["uri"].endswith("/doc/8")


def test_truncation_is_loud(spark):
    blob = "".join(_rec(i, f"payload {i}") for i in range(MAX_RECS + 2))
    off, recs, n = _parse(spark, blob)
    assert len(recs) == MAX_RECS
    assert off != n + 1  # leftover bytes -> the audit counts this blob


def test_garbage_blob_yields_no_records(spark):
    off, recs, _ = _parse(spark, "this is not a warc file at all")
    assert off == 1
    assert recs == []


def test_corpus_roundtrip(spark, sf_dir):
    audit = warc_roundtrip_audit(spark, sf_dir).collect()[0]
    assert audit["n_truncated"] == 0
    assert audit["n_records"] == audit["n_payload_match"]
    assert audit["n_docs"] == audit["n_records"]
    parsed = warc_parse_records(spark, sf_dir)
    assert parsed.count() == audit["n_records"]


def test_fixture_header_fits_max_hdr(spark, sf_dir):
    """Pins the MAX_HDR bound (optimization r15): the synthesized
    header block — everything before the CRLF CRLF payload separator,
    separator included — must fit the bounded slice the fold inspects
    for EVERY possible doc_id magnitude this fixture can reach, with
    headroom. A record whose header outgrows the bound fails the scan
    loudly (''::int under ANSI), so this test failing first is the
    designed order."""
    from bigdata_pipelines_aws_glue_spark.operators.warc import MAX_HDR

    # worst case: widest doc_id digits and longest lang; build one
    # directly rather than trusting the current corpus row widths.
    worst = _rec(10**12, "x" * 10**6)
    hdr_len = worst.index("\r\n\r\n") + 4
    assert hdr_len <= MAX_HDR - 32  # explicit headroom
    # and the live corpus parses fully (bounded scan == full scan).
    audit = warc_roundtrip_audit(spark, sf_dir).collect()[0]
    assert audit["n_truncated"] == 0
