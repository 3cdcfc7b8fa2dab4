"""Semantic assertions for doc_readability and the Misra–Gries
heavy-hitters sketch (the oracles prove cross-engine equality; these
prove the numbers mean what they claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.corpus_stats import (
    MG_K,
    _mg_partitions,
    heavy_hitters_mg,
)
from bigdata_pipelines_aws_glue_spark.operators.text import (
    doc_readability,
)


def test_readability_hand_computed(spark, tmp_path):
    # "hello world foo" -> syllable groups: he-llo(e,o)=2, world(o)=1,
    # foo(oo)=1 => 4 syllables, 3 words, 1 pseudo-sentence
    spark.createDataFrame(
        [(0, "hello world foo")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = doc_readability(spark, str(tmp_path)).collect()[0]
    assert (row.n_words, row.n_syllables, row.n_polysyllabic) == (3, 4, 0)
    assert row.n_sentences == 1
    wps, spw = 3.0, 4.0 / 3.0
    assert abs(row.flesch_ease - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-3
    assert abs(row.fk_grade - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-3


def test_readability_corpus_shape(spark, sf_dir):
    df = doc_readability(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.n_syllables >= r.n_words  # every corpus word has a vowel
        assert 1.0 <= r.avg_syllables < 4.0
        assert r.n_sentences >= 1


def test_mg_sketch_guarantee_on_adversarial_stream():
    # 60 distinct rare terms (> MG_K, forcing evictions) + one heavy
    # term carrying ~half the stream mass
    import pandas as pd

    rare = " ".join(f"r{i}" for i in range(60))
    stream = [f"hh {rare} hh"] * 20
    out = list(_mg_partitions(iter([pd.DataFrame({"text": stream})])))[0]
    est = dict(zip(out["term"], out["est"]))
    n = 20 * 62
    true_hh = 40
    assert true_hh * MG_K > n  # hh is strictly heavy
    assert "hh" in est
    assert est["hh"] <= true_hh
    assert (true_hh - est["hh"]) * (MG_K + 1) <= n
    assert len(est) <= MG_K


def test_heavy_hitters_query_guarantees(spark, sf_dir):
    rows = heavy_hitters_mg(spark, sf_dir).collect()
    assert len(rows) > 0
    n = rows[0].n_tokens
    for r in rows:
        assert r.true_count * MG_K > n  # exactly-heavy threshold
        assert r.in_sketch
        assert r.est_within_bound


def test_heavy_hitters_guarantee_survives_repartitioning(spark, sf_dir):
    # the booleans must hold under ANY partition layout (the driver's
    # session may split input differently): force a pathological one
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").repartition(17)
    sketch = docs.mapInPandas(_mg_partitions, "term string, est long")
    merged = dict(
        sketch.groupBy("term").agg(F.sum("est").alias("est")).collect()
    )
    toks = docs.select(
        F.explode(F.split(F.trim("text"), " ")).alias("t")
    ).filter(F.length("t") > 0)
    exact = dict(toks.groupBy("t").count().collect())
    n = sum(exact.values())
    for term, c in exact.items():
        if c * MG_K > n:
            assert term in merged
            assert merged[term] <= c
            assert (c - merged[term]) * MG_K <= n
