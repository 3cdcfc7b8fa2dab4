"""Semantic checks for ``operators/resolution.py``."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.resolution import (
    MAX_EDIT,
    er_golden_record,
    fuzzy_match_parts,
)


def test_blocking_is_lossless_here(spark, sf_dir):
    """Noun-blocking must not lose any pair the unblocked quadratic
    compare would find at MAX_EDIT (tiny vocab, so the exact audit is
    affordable in a test; at scale this is the recall study you run
    on a sample)."""
    names = [
        r.p_name
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name")
        .distinct()
        .collect()
    ]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    exact = {
        (a, b)
        for a in names
        for b in names
        if a < b and lev(a, b) <= MAX_EDIT
    }
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_match_parts(spark, sf_dir).collect()
    }
    assert got == exact
    assert got, "corpus should contain fuzzy pairs"


def test_golden_record_is_total_and_idempotent(spark, sf_dir):
    rows = er_golden_record(spark, sf_dir).collect()
    names = {r.p_name for r in rows}
    canon = {r.p_name: r.canonical for r in rows}
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name")
        .distinct()
        .count()
    )
    assert len(rows) == n_distinct
    # canonical is a member of the vocabulary, minimal in its cluster,
    # and a fixed point (canonical of a canonical is itself)
    for r in rows:
        assert r.canonical in names
        assert r.canonical <= r.p_name
        assert canon[r.canonical] == r.canonical
    # pairs imply shared canonical
    for p in fuzzy_match_parts(spark, sf_dir).collect():
        assert canon[p.name_a] == canon[p.name_b]


def test_row_weights_match_base_table(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    total = part.count()
    out = er_golden_record(spark, sf_dir)
    assert out.agg(F.sum("n_rows")).first()[0] == total
