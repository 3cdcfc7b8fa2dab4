"""Sequence-packing and quantization unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.curation import (
    pack_sequences,
    quantize_embeddings_int8,
)


def test_pack_sequences_offsets_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"),       # 3 tokens -> [0, 3)
            (2, "d e", "en"),         # 2 tokens -> [3, 5)
            (3, "f", "en"),           # 1 token  -> [5, 6)
            (10, "x y z w", "fr"),    # fr shard restarts at 0
        ],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(docs, seq_len=4).collect()
    }
    assert (rows[1]["start_offset"], rows[1]["chunk_id"]) == (0, 0)
    assert (rows[2]["start_offset"], rows[2]["chunk_id"]) == (3, 0)
    # doc 3 starts at offset 5 -> second chunk of the en shard
    assert (rows[3]["start_offset"], rows[3]["chunk_id"]) == (5, 1)
    assert (rows[10]["start_offset"], rows[10]["chunk_id"]) == (0, 0)


def test_quantize_int8_roundtrip_error_bounded(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0, 0.0]),       # zero vector -> scale 0, zeros
            (3, [3.75, -3.75, 1.875]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings_int8(emb).collect()}
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0]
    for vid in (1, 3):
        scale, qvec = out[vid]["scale"], out[vid]["qvec"]
        orig = {1: [1.0, -2.0, 0.5], 3: [3.75, -3.75, 1.875]}[vid]
        assert max(abs(q) for q in qvec) == 127  # absmax element saturates
        for o, q in zip(orig, qvec):
            assert abs(q / 127.0 * scale - o) <= scale / 127.0 / 2 + 1e-9


def test_pack_window_is_per_shard_not_global(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "fr")],
        "doc_id long, text string, lang string",
    )
    plan = (
        pack_sequences(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partitioned window -> hashpartitioning exchange on shard, never a
    # single-partition global window
    assert "SinglePartition" not in plan


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Each funnel stage can only shrink the corpus, and the three
    split counts partition the near-dedup survivors exactly."""
    from bigdata_pipelines_aws_glue_spark.operators.curation import (
        curation_funnel_report,
    )

    r = {
        row["stage"]: row["n_docs"]
        for row in curation_funnel_report(spark, sf_dir).collect()
    }
    assert (
        r["total"] >= r["gopher_keep"] >= r["exact_dedup"] >= r["near_dedup"] > 0
    )
    assert r.get("train", 0) + r.get("val", 0) + r.get("test", 0) == r["near_dedup"]
    assert r.get("train", 0) > r.get("val", 0)


def test_run_curation_materializes_manifest_exactly(spark, sf_dir, tmp_path):
    """The written corpus must BE what the funnel report promises:
    per-split counts match the report rows, survivors carry full
    document rows, and re-running overwrites idempotently."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.operators.curation import (
        curation_funnel_report,
        run_curation,
    )

    out = str(tmp_path / "curated")
    run_curation(spark, sf_dir, out)
    back = spark.read.parquet(out)
    report = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel_report(spark, sf_dir).collect()
    }
    got = {
        r["split"]: r["count"]
        for r in back.groupBy("split").count().collect()
    }
    for split in ("train", "val", "test"):
        assert got.get(split, 0) == report.get(split, 0), split
    assert sum(got.values()) == report["near_dedup"]
    # full document rows survived the join
    assert {"doc_id", "text", "lang", "source", "n_chars", "split"} <= set(
        back.columns
    )
    # idempotent re-run (C3): same rows, no duplication
    run_curation(spark, sf_dir, out)
    assert spark.read.parquet(out).count() == report["near_dedup"]
    assert (
        spark.read.parquet(out)
        .groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )
