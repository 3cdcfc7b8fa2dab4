"""PII detection/redaction ([north-star] N5-adjacent): the scrub pass
every training-data pipeline runs before text leaves curation.

Pure regexp column expressions — a map-only scan at any scale, no
shuffle, no Python. The corpus ships no PII, so the registered query
deterministically AUGMENTS each document with a synthetic contact
block derived from ``doc_id`` (same move the multimodal corpus uses
for payloads): detection and redaction then run genuinely, and the
DuckDB twin replays the augmentation + scrub so every count and every
redacted byte is hash-checked cross-engine.

Patterns are deliberately ASCII/RE2-safe so Java regex (Spark) and
RE2 (DuckDB) agree: character classes, bounded repetition, ``\\b``
word boundaries — no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails -> [EMAIL], then phones -> [PHONE], then IPv4
    -> [IP]. Email first: its local part may contain digit runs the
    narrower patterns would otherwise split."""
    clean = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    clean = F.regexp_replace(clean, PHONE_RE, "[PHONE]")
    return F.regexp_replace(clean, IP_RE, "[IP]")


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(text, F.lit(IP_RE)),
    }


def _augmented(docs: DataFrame) -> Column:
    """Deterministic synthetic contact block appended to each doc."""
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@corp.example.com or call 555-"),
        (d % 900 + 100).cast("string"),
        F.lit("-0199 at 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        (d % 100).cast("string"),
    )


def pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: augment, detect, redact; emit per-doc counts
    plus the fully redacted text (hash-checked byte-for-byte)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = _augmented(docs)
    counts = pii_counts(aug)
    return docs.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        scrub_pii(aug).alias("clean_text"),
    )


PII_SCRUB_ORACLE = f"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@corp.example.com or call 555-'
                || (doc_id % 900 + 100) || '-0199 at 10.0.'
                || (doc_id % 256) || '.' || (doc_id % 100) AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{IP_RE}')) AS INT) AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{PHONE_RE}', '[PHONE]', 'g'),
           '{IP_RE}', '[IP]', 'g') AS clean_text
FROM aug
"""


def _register() -> None:
    registry.register("pii_scrub_report", pii_scrub_report, PII_SCRUB_ORACLE)
