"""Training-batch curation operators ([north-star], BASELINE.json:6):
sequence packing and embedding quantization — the steps between a
deduplicated corpus and an actual training shard.

- Sequence packing: the standard concat-then-chunk layout — documents
  are laid end-to-end in a deterministic order and sliced into
  fixed-length token windows. Spark-first: a running-sum window
  PARTITIONED BY SHARD (lang here), so no global single-partition
  sort exists anywhere; each shard packs independently, exactly how a
  1000-executor job would write 1000 shard files.
- int8 quantization: per-vector absmax scaling (the layout ANN indexes
  and feature stores actually persist — 4x smaller, exact dequant
  scale kept alongside). Pure array expressions, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.operators.dedup import (
    _shingles,
    _tokens,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

SEQ_LEN = 512


def pack_sequences(
    docs: DataFrame,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = SEQ_LEN,
) -> DataFrame:
    """Assign every document a (shard, chunk) slot in the packed token
    stream: token offsets via a per-shard running sum, chunk id =
    start_offset div seq_len. Documents may straddle a chunk boundary
    (standard pretraining packing semantics — the chunker splits them
    at materialization time); the assignment records where each doc's
    tokens begin.

    Scale: ROWS UNBOUNDED PRECEDING running sum within a shard is a
    single sort per shard partition — shards are the parallelism unit,
    mirroring per-output-file packing on a real cluster.

    The boundary-RESPECTING counterpart (greedy next-fit/first-fit, docs never
    split, learned-BPE token counts, truncation conservation) is
    ``operators/packing.py:pack_training_sequences``."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(shard_col).alias("shard"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("end_offset", F.sum("n_tokens").over(w))
        .withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
        .withColumn(
            "chunk_id",
            F.floor(F.col("start_offset") / F.lit(float(seq_len))),
        )
        .select(
            id_col, "shard", "n_tokens", "start_offset", "chunk_id"
        )
    )


def sequence_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs)


SEQUENCE_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang AS shard,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens
    FROM documents
),
offs AS (
    SELECT doc_id, shard, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) - n_tokens AS start_offset
    FROM t
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(floor(start_offset / {float(SEQ_LEN)}) AS BIGINT) AS chunk_id
FROM offs
"""


def chunk_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency per shard: how many chunks the shard needs
    and the fill ratio of the token stream against chunk capacity —
    the number a batch-shape owner actually monitors."""
    packed = sequence_pack_chunks(spark, sf_dir)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max("chunk_id") + 1).alias("n_chunks"),
        F.floor(
            F.sum("n_tokens").cast("double")
            / ((F.max("chunk_id") + 1) * SEQ_LEN).cast("double")
            * F.lit(1e4)
        ).alias("fill_bp"),
    )


CHUNK_FILL_ORACLE = f"""
WITH packed AS ({SEQUENCE_PACK_ORACLE})
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(chunk_id) + 1 AS BIGINT) AS n_chunks,
       CAST(floor(CAST(sum(n_tokens) AS DOUBLE)
             / CAST((max(chunk_id) + 1) * {SEQ_LEN} AS DOUBLE) * 1e4)
            AS BIGINT) AS fill_bp
FROM packed
GROUP BY shard
"""


def quantize_embeddings_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector absmax int8 quantization, pure array expressions:
    qvec[i] = floor(v[i] / scale * 127 + 0.5), scale = max |v[i]|.
    Zero vectors quantize to zeros with scale 0. Arithmetic is double
    end-to-end (float inputs upcast once), so the DuckDB twin is
    bit-identical."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / scale * F.lit(127.0) + F.lit(0.5)).cast(
                "tinyint"
            ),
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
        F.size(vec_col).alias("n_dims"),
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (driver-attestable) form of
    :func:`quantize_embeddings_int8`: ``qvec`` is serialized to a
    comma-joined string because the driver's pandas canonicalizer
    sorts/factorizes cells and cannot hash Python lists
    (CORRECTNESS_r02: ``TypeError: unhashable type: 'list'``). The
    array-typed ``array<tinyint>`` form remains the library function;
    the serialization is lossless (int8 values round-trip through
    decimal text exactly), so this string form attests every bit of
    the quantization."""
    q = quantize_embeddings_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
        "n_dims",
    )


EMBEDDING_QUANTIZE_ORACLE = """
WITH s AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
    FROM embeddings
),
q AS (
    SELECT vec_id, scale,
           CASE WHEN scale = 0
                THEN list_transform(embedding, x -> CAST(0 AS TINYINT))
                ELSE list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127e0 + 0.5e0) AS TINYINT))
           END AS qvec,
           CAST(len(embedding) AS INT) AS n_dims
    FROM s
)
SELECT vec_id, scale,
       array_to_string(list_transform(qvec, x -> CAST(x AS VARCHAR)), ',') AS qvec_csv,
       n_dims
FROM q
"""


def _funnel_stages(spark: SparkSession, sf_dir: str):
    """Shared funnel core: (docs, gopher-kept, exact-deduped,
    near-deduped, split expression). ``curation_funnel_report`` turns
    these into the attested per-stage counts; ``run_curation``
    materializes the survivors as a training corpus — same plans, so
    the report is exactly the manifest of what gets written."""
    from bigdata_pipelines_aws_glue_spark.operators.dedup import (
        neardup_verified_pairs,
    )
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        _SPLIT_SEED,
        _TRAIN_HI,
        _VAL_HI,
        shuffle_key,
    )
    from bigdata_pipelines_aws_glue_spark.operators.text import gopher_flags

    docs = load_table(spark, sf_dir, "documents")
    s1 = (
        gopher_flags(docs)
        .filter(F.col("keep"))
        .select("doc_id")
        .join(docs, "doc_id")
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    s2 = (
        s1.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    pairs = neardup_verified_pairs(docs, threshold=0.8)
    drop_b = (
        pairs.join(
            s2.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
        )
        .join(s2.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(drop_b, "doc_id", "left_anti")
    u = shuffle_key(F.col("doc_id"), seed=_SPLIT_SEED)
    split = (
        F.when(u < _TRAIN_HI, F.lit("train"))
        .when(u < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs, s1, s2, s3, split


def run_curation(
    spark: SparkSession, sf_dir: str, output_path: str
) -> DataFrame:
    """Materialize the curated pretraining corpus: funnel survivors
    (full document rows + their split) written as parquet partitioned
    by split — the operational form of ``curation_funnel_report``
    (same stage plans, so that report is this output's manifest).
    Overwrite mode keeps re-runs idempotent (C3). The write happens
    HERE (eagerly, inside this function); the returned DataFrame is
    the curated plan, for callers that want to inspect or re-derive
    it — re-evaluating it recomputes the funnel, so manifests should
    be read back from ``output_path`` instead."""
    docs, _, _, s3, split = _funnel_stages(spark, sf_dir)
    curated = s3.join(docs, "doc_id").withColumn("split", split)
    curated.write.mode("overwrite").partitionBy("split").parquet(output_path)
    return curated


def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation funnel — the composed pipeline an LLM
    pretraining corpus actually runs, as ONE hash-checked query:

      total -> Gopher quality gate -> exact dedup (min-id keeper per
      sha256) -> near-dup drop (MinHash-LSH candidates + exact
      Jaccard >= 0.8 verify; the greater id of each surviving pair
      drops) -> train/val/test assignment.

    Emits one row per funnel stage plus one per final split, so the
    whole pipeline's selectivity is a single attested artifact. Every
    stage reuses an already-oracled operator (gopher_flags,
    sha256-window dedup, neardup_verified_pairs, the md5-hash split),
    which is exactly what makes the composed DuckDB replay possible.
    Scale shape: each stage is the same plan as its standalone query;
    the funnel adds only semi/anti joins on doc_id."""
    docs, s1, s2, s3, split = _funnel_stages(spark, sf_dir)
    one = lambda name, df: df.agg(  # noqa: E731
        F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_docs")
    ).select("stage", "n_docs")
    report = (
        one("total", docs)
        .unionByName(one("gopher_keep", s1))
        .unionByName(one("exact_dedup", s2))
        .unionByName(one("near_dedup", s3))
        .unionByName(
            s3.select(split.alias("stage"))
            .groupBy("stage")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
    )
    return report


def _curation_funnel_oracle() -> str:
    from bigdata_pipelines_aws_glue_spark.operators.dedup import _minhash_ctes
    from bigdata_pipelines_aws_glue_spark.operators.sampling import (
        _SPLIT_SEED,
        _TRAIN_HI,
        _VAL_HI,
        shuffle_key_sql,
    )
    from bigdata_pipelines_aws_glue_spark.operators.text import (
        GOPHER_FILTER_ORACLE,
    )

    u = shuffle_key_sql("doc_id", _SPLIT_SEED)
    return f"""
WITH gf AS ({GOPHER_FILTER_ORACLE}),
{_minhash_ctes()},
s1 AS (SELECT doc_id FROM gf WHERE keep),
s2 AS (
    SELECT doc_id FROM (
        SELECT d0.doc_id,
               row_number() OVER (PARTITION BY sha256(d0.text)
                                  ORDER BY d0.doc_id) AS rn
        FROM documents d0 JOIN s1 USING (doc_id))
    WHERE rn = 1
),
verified AS (
    SELECT doc_a, doc_b
    FROM cand
    JOIN d da ON da.doc_id = doc_a
    JOIN d db ON db.doc_id = doc_b
    WHERE len(list_intersect(da.sh, db.sh))::DOUBLE
            / (len(da.sh) + len(db.sh)
               - len(list_intersect(da.sh, db.sh)))::DOUBLE >= 0.8
),
dropn AS (
    SELECT DISTINCT doc_b AS doc_id
    FROM verified
    JOIN s2 a ON verified.doc_a = a.doc_id
    JOIN s2 b ON verified.doc_b = b.doc_id
),
s3 AS (
    SELECT doc_id FROM s2
    WHERE doc_id NOT IN (SELECT doc_id FROM dropn)
)
SELECT 'total' AS stage, count(*) AS n_docs FROM documents
UNION ALL SELECT 'gopher_keep', count(*) FROM s1
UNION ALL SELECT 'exact_dedup', count(*) FROM s2
UNION ALL SELECT 'near_dedup', count(*) FROM s3
UNION ALL
SELECT stage, count(*) FROM (
    SELECT CASE WHEN {u} < {_TRAIN_HI} THEN 'train'
                WHEN {u} < {_VAL_HI} THEN 'val'
                ELSE 'test' END AS stage
    FROM s3)
GROUP BY stage
"""




# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., NeurIPS 2023) — data selection
# via importance resampling over hashed n-gram features
# ---------------------------------------------------------------------------

#: hashed-feature bucket count. The log-ratio table is bounded by this
#: LITERAL at any corpus size — it is the hash modulus, not a data
#: cardinality.
_DSIR_B = 4096

#: target domain for the importance model: English documents (the
#: "high-quality target distribution" stand-in this corpus offers).
_DSIR_TARGET_LANG = "en"


def dsir_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: log p_target(x)/p_raw(x) under hashed
    unigram bag-of-words models (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023 — the
    public method; no proprietary system involved).

    Model: every token hashes into one of ``_DSIR_B`` buckets (the
    repo's md5-prefix mixing hash, bit-identical in both engines);
    p_target / p_raw are Laplace-smoothed bucket frequencies over the
    target slice (lang = 'en') and the whole corpus. A document's
    importance weight is the sum over its TOKEN INSTANCES of the
    per-bucket log ratio.

    Distribution shape: pass 1 explodes tokens and aggregates the
    (bucket -> target count, raw count) table — bounded by the LITERAL
    B = 4096 whatever the corpus size, so it broadcasts; pass 2 joins
    token instances to that broadcast table and sums per document; the
    top-20 is a TakeOrdered, never a global sort.

    Numerics: each bucket's log ratio is one ``ln`` of a
    pinned-operation-order double expression, quantized to 1e-9
    integer BEFORE the per-document sum (the BM25/zipf libm
    discipline) — so per-doc weights are exact integer sums of shared
    addends, bit-stable cross-engine. Per-doc sums stay in long: |lq|
    <= ~35e9 and token counts are document-bounded, far from 2^63."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(_tokens(F.col("text"))).alias("t"),
    ).withColumn(
        "b",
        F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
        % _DSIR_B,
    )
    buckets = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.sum(
            (F.col("lang") == _DSIR_TARGET_LANG).cast("long")
        ).alias("cnt_t"),
    )
    totals = buckets.agg(
        F.sum("cnt_r").cast("double").alias("tr"),
        F.sum("cnt_t").cast("double").alias("tt"),
    )
    bd = F.lit(float(_DSIR_B))
    ratio = (
        (F.col("cnt_t").cast("double") + F.lit(1.0))
        * (F.col("tr") + bd)
    ) / (
        (F.col("cnt_r").cast("double") + F.lit(1.0))
        * (F.col("tt") + bd)
    )
    lr = F.broadcast(
        buckets.crossJoin(F.broadcast(totals)).select(
            "b",
            F.floor(F.log(ratio) * 1e9 + F.lit(0.5))
            .cast("long")
            .alias("lq"),
        )
    )
    per_doc = (
        toks.join(lr, "b")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("lq").alias("wq"),
        )
    )
    return (
        per_doc.orderBy(F.col("wq").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_toks").cast("long").alias("n_toks"),
            (F.col("wq").cast("double") / 1e9).alias("log_weight_q9"),
        )
    )


DSIR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, source, unnest(string_split(trim(text), ' ')) AS t
    FROM documents
),
hashed AS (
    SELECT doc_id, lang, source,
           ('0x' || substring(md5(t), 1, 15))::BIGINT % {_DSIR_B} AS b
    FROM toks
),
buckets AS (
    SELECT b, count(*) AS cnt_r,
           sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
               AS cnt_t
    FROM hashed GROUP BY 1
),
totals AS (
    SELECT CAST(sum(cnt_r) AS DOUBLE) AS tr,
           CAST(sum(cnt_t) AS DOUBLE) AS tt
    FROM buckets
),
lr AS (
    SELECT b,
           CAST(floor(ln(
               ((CAST(cnt_t AS DOUBLE) + 1.0) * (tr + {float(_DSIR_B)}))
               / ((CAST(cnt_r AS DOUBLE) + 1.0) * (tt + {float(_DSIR_B)}))
           ) * 1e9 + 0.5) AS BIGINT) AS lq
    FROM buckets CROSS JOIN totals
),
per_doc AS (
    SELECT h.doc_id, h.lang, h.source,
           CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(lr.lq) AS BIGINT) AS wq
    FROM hashed h JOIN lr USING (b)
    GROUP BY 1, 2, 3
)
SELECT doc_id, lang, source, n_toks,
       CAST(wq AS DOUBLE) / 1e9 AS log_weight_q9
FROM per_doc
ORDER BY wq DESC, doc_id
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Greedy max-coverage selection (submodular corpus subset selection)
# ---------------------------------------------------------------------------

#: greedy rounds — the selection budget. The driver loop runs this
#: many metadata-sized (1-row) collects; everything volume-shaped
#: stays distributed.
_COVER_K = 8

#: Hard ceiling on greedy rounds. Wall-clock is LINEAR in k — each
#: round is one serialized driver job (anti-join + groupBy + 1-row
#: collect over the materialized postings), so k=500 means 500
#: back-to-back Spark jobs no matter how many executors exist. The
#: guard turns a misconfigured k into a loud error instead of an
#: hours-long serialized driver loop; callers needing k > 64 should
#: switch to ``greedy_coverage_batched`` (top-m picks per round,
#: weaker approximation bound) rather than raise the cap.
_COVER_K_MAX = 64


def greedy_coverage_select(
    spark: SparkSession, sf_dir: str, k: int = _COVER_K
) -> DataFrame:
    """Greedy maximum-coverage subset selection: pick ``_COVER_K``
    documents that together cover the most distinct word trigrams —
    the classic (1 - 1/e)-approximate greedy for submodular coverage
    (Nemhauser, Wolsey & Fisher 1978), the shape behind
    facility-location data-subset selection.

    Iterative-by-nature (each pick changes every remaining gain), so
    the round loop lives on the driver — k metadata-sized collects of
    ONE (doc_id, gain) row each; the per-round gain computation is a
    distributed anti-join + groupBy over the (doc, shingle) pair set,
    which is localCheckpoint-materialized ONCE and re-scanned per
    round (the `allpairs_prefix_join` postings precedent). The covered
    set is bounded by the union of <= k selected documents' shingles —
    k-bounded, never corpus-bounded.

    Rounds stop early when no remaining document covers anything new
    (gain >= 1 is required to emit); the DuckDB twin unrolls the same
    eight rounds as MATERIALIZED CTEs with the identical
    (gain DESC, doc_id) tie-break, so saturated rounds are empty in
    both engines.

    ``k`` is guarded by ``_COVER_K_MAX``: each round is a serialized
    driver job, so wall-clock grows linearly in k and no cluster size
    can parallelize it away (see the constant's note)."""
    if not 1 <= k <= _COVER_K_MAX:
        raise ValueError(
            f"greedy_coverage_select k={k} outside [1, {_COVER_K_MAX}]: "
            "each round is one serialized driver job (wall-clock is "
            "linear in k); use greedy_coverage_batched for larger budgets"
        )
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        F.explode(_shingles(_tokens(F.col("text")), 3)).alias("sh"),
    ).localCheckpoint()
    total = pairs.select("sh").distinct().count()
    selected: list[int] = []
    rows: list[tuple[int, int, int, int, float]] = []
    cum = 0
    for rnd in range(1, k + 1):
        if selected:
            covered = (
                pairs.filter(F.col("doc_id").isin(selected))
                .select("sh")
                .distinct()
            )
            rem = pairs.join(covered, "sh", "left_anti")
        else:
            rem = pairs
        best = (
            rem.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        cum += b["gain"]
        # IEEE double ops in one pinned order — matches the twin's
        # floor(x * 1e6 + 0.5) / 1e6 exactly.
        frac = math.floor(cum / total * 1e6 + 0.5) / 1e6
        rows.append((rnd, b["doc_id"], b["gain"], cum, frac))
        selected.append(b["doc_id"])
    return spark.createDataFrame(
        rows,
        "sel_round int, doc_id long, gain long, cum_covered long, "
        "coverage_frac double",
    )


#: batched greedy shape: rounds x picks-per-round. Total budget
#: K = _BATCH_R * _BATCH_M documents at _BATCH_R serialized driver
#: jobs — the escape hatch the k-guard on ``greedy_coverage_select``
#: points large budgets at.
_BATCH_R, _BATCH_M = 4, 4


def greedy_coverage_batched(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = _BATCH_R,
    m: int = _BATCH_M,
) -> DataFrame:
    """Batched-pick greedy max-coverage: each round selects the TOP-m
    documents by marginal gain against the coverage frozen at the
    round start (the distributed-greedy relaxation — Mirzasoleiman et
    al., "Distributed Submodular Maximization", NeurIPS'13 class).
    Wall-clock is linear in ``rounds``, NOT in the total budget
    rounds*m, because the serialized driver loop runs once per ROUND
    — this is how budgets past ``greedy_coverage_select``'s k-guard
    scale: grow m at fixed rounds and accept the weaker approximation
    (in-batch picks can overlap each other, so a round's coverage
    advance is <= the sum of its reported pre-round gains; the
    ``cum_covered`` column reports the ACTUAL covered count after
    each round, making the overlap loss measurable).

    Determinism: per-round pick set and order are (gain DESC, doc_id)
    — the DuckDB twin unrolls the same rounds with the same LIMIT m
    and tie-break."""
    if not 1 <= rounds <= _COVER_K_MAX:
        raise ValueError(
            f"greedy_coverage_batched rounds={rounds} outside "
            f"[1, {_COVER_K_MAX}]: each round is one serialized driver "
            "job; scale the budget via m, not rounds"
        )
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        F.explode(_shingles(_tokens(F.col("text")), 3)).alias("sh"),
    ).localCheckpoint()
    total = pairs.select("sh").distinct().count()
    selected: list[int] = []
    rows: list[tuple[int, int, int, int, int, float]] = []
    for rnd in range(1, rounds + 1):
        if selected:
            covered = (
                pairs.filter(F.col("doc_id").isin(selected))
                .select("sh")
                .distinct()
            )
            rem = pairs.join(covered, "sh", "left_anti")
        else:
            rem = pairs
        best = (
            rem.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(m)
            .collect()
        )
        if not best:
            break
        selected.extend(b["doc_id"] for b in best)
        cum = (
            pairs.filter(F.col("doc_id").isin(selected))
            .select("sh")
            .distinct()
            .count()
        )
        frac = math.floor(cum / total * 1e6 + 0.5) / 1e6
        for rank, b in enumerate(best, 1):
            rows.append((rnd, rank, b["doc_id"], b["gain"], cum, frac))
    return spark.createDataFrame(
        rows,
        "sel_round int, pick_rank int, doc_id long, gain long, "
        "cum_covered long, coverage_frac double",
    )


def _batched_oracle() -> str:
    nl = "\n"
    parts = []
    for r in range(1, _BATCH_R + 1):
        if r == 1:
            gain_src = (
                "SELECT doc_id, count(*) AS gain FROM pairs GROUP BY 1"
            )
        else:
            prev = " UNION ALL ".join(
                f"SELECT doc_id FROM b{i}" for i in range(1, r)
            )
            parts.append(
                f"bc{r} AS MATERIALIZED ({nl}"
                f"    SELECT DISTINCT sh FROM pairs{nl}"
                f"    WHERE doc_id IN ({prev}){nl})"
            )
            gain_src = (
                f"SELECT p.doc_id, count(*) AS gain{nl}"
                f"    FROM pairs p LEFT JOIN bc{r} ON p.sh = bc{r}.sh{nl}"
                f"    WHERE bc{r}.sh IS NULL GROUP BY 1"
            )
        parts.append(
            f"b{r} AS MATERIALIZED ({nl}"
            f"    SELECT doc_id, gain,{nl}"
            f"           row_number() OVER (ORDER BY gain DESC, doc_id){nl}"
            f"               AS pick_rank{nl}"
            f"    FROM ({gain_src}){nl}"
            f"    ORDER BY gain DESC, doc_id LIMIT {_BATCH_M}{nl})"
        )
        sofar = " UNION ALL ".join(
            f"SELECT doc_id FROM b{i}" for i in range(1, r + 1)
        )
        parts.append(
            f"cum{r} AS MATERIALIZED ({nl}"
            f"    SELECT count(DISTINCT sh) AS c FROM pairs{nl}"
            f"    WHERE doc_id IN ({sofar}){nl})"
        )
    sel = f"{nl}    UNION ALL ".join(
        f"SELECT {r} AS sel_round, pick_rank, doc_id, gain,"
        f" (SELECT c FROM cum{r}) AS cum FROM b{r}"
        for r in range(1, _BATCH_R + 1)
    )
    cte_block = ("," + nl).join(parts)
    return f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
pairs AS MATERIALIZED (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3
),
tot AS (SELECT count(DISTINCT sh) AS n FROM pairs),
{cte_block},
sel AS (
    {sel}
)
SELECT CAST(sel_round AS INTEGER) AS sel_round,
       CAST(pick_rank AS INTEGER) AS pick_rank,
       doc_id,
       CAST(gain AS BIGINT) AS gain,
       CAST(cum AS BIGINT) AS cum_covered,
       floor(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS coverage_frac
FROM sel CROSS JOIN tot
"""


def _cover_oracle() -> str:
    nl = "\n"
    rounds = []
    for r in range(1, _COVER_K + 1):
        if r == 1:
            gain_src = "SELECT doc_id, count(*) AS gain FROM pairs GROUP BY 1"
        else:
            prev = " UNION ALL ".join(
                f"SELECT doc_id FROM s{i}" for i in range(1, r)
            )
            rounds.append(
                f"c{r} AS MATERIALIZED ({nl}"
                f"    SELECT DISTINCT sh FROM pairs{nl}"
                f"    WHERE doc_id IN ({prev}){nl})"
            )
            gain_src = (
                f"SELECT p.doc_id, count(*) AS gain{nl}"
                f"    FROM pairs p LEFT JOIN c{r} ON p.sh = c{r}.sh{nl}"
                f"    WHERE c{r}.sh IS NULL GROUP BY 1"
            )
        rounds.append(
            f"s{r} AS MATERIALIZED ({nl}    {gain_src}{nl}"
            f"    ORDER BY gain DESC, doc_id LIMIT 1{nl})"
        )
    sel = f"{nl}    UNION ALL ".join(
        f"SELECT {r} AS sel_round, doc_id, gain FROM s{r}"
        for r in range(1, _COVER_K + 1)
    )
    cte_block = ("," + nl).join(rounds)
    return f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
pairs AS MATERIALIZED (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3
),
tot AS (SELECT count(DISTINCT sh) AS n FROM pairs),
{cte_block},
sel AS (
    {sel}
)
SELECT CAST(sel_round AS INTEGER) AS sel_round,
       doc_id,
       CAST(gain AS BIGINT) AS gain,
       CAST(sum(gain) OVER (ORDER BY sel_round) AS BIGINT) AS cum_covered,
       floor(CAST(sum(gain) OVER (ORDER BY sel_round) AS DOUBLE)
             / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS coverage_frac
FROM sel CROSS JOIN tot
"""


# ---------------------------------------------------------------- r12
#: global raw-score keep threshold and the normalized (per-source
#: percentile) keep threshold it is compared against.
QN_RAW_THRESHOLD = 0.5
QN_PCT_THRESHOLD = 0.5


def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration ([north-star] curation
    adjacency): a single global threshold on a raw quality score
    keeps very different fractions of each source (sources write
    differently — mean distinct-token ratio spans 0.45..0.56 on this
    corpus), silently skewing the training mix. The standard fix is
    QUANTILE NORMALIZATION: rank each doc within its source
    (percent_rank) and threshold the percentile instead, equalizing
    keep rates by construction.

    Emits the per-source audit: docs, raw-threshold keeps vs
    percentile-threshold keeps, and the raw-score spread. The score
    is the continuous distinct-token ratio (rounded to 1e-6 BEFORE
    ranking so both engines rank identical keys; ties then break on
    doc_id, making percent_rank deterministic). One narrow window
    per source + one hash aggregation — no corpus-wide sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    raw = stable_round(
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double"),
        6,
    )
    d = docs.select("doc_id", "source", raw.alias("raw"))
    w = Window.partitionBy("source").orderBy("raw", "doc_id")
    d = d.withColumn("pr", F.percent_rank().over(w))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("raw") >= F.lit(QN_RAW_THRESHOLD)).cast("long")).alias(
            "n_keep_raw"
        ),
        F.sum((F.col("pr") >= F.lit(QN_PCT_THRESHOLD)).cast("long")).alias(
            "n_keep_norm"
        ),
        stable_round(F.min("raw"), 6).alias("min_raw"),
        stable_round(F.max("raw"), 6).alias("max_raw"),
    )


QUANTILE_NORM_ORACLE = f"""
WITH s AS (
    SELECT doc_id, source,
           floor(len(list_distinct(string_split(trim(text), ' ')))::DOUBLE
                 / len(string_split(trim(text), ' ')) * 1000000.0 + 0.5)
             / 1000000.0 AS raw
    FROM documents
),
r AS (
    SELECT source, raw,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY raw, doc_id) AS pr
    FROM s
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN raw >= {QN_RAW_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep_raw,
       CAST(sum(CASE WHEN pr >= {QN_PCT_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep_norm,
       floor(min(raw) * 1000000.0 + 0.5) / 1000000.0 AS min_raw,
       floor(max(raw) * 1000000.0 + 0.5) / 1000000.0 AS max_raw
FROM r
GROUP BY source
"""


# --------------------------------- temperature-scaled domain mixing

#: documents to sample across domains (the mixture budget).
MIX_BUDGET = 100_000


def domain_mixture_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled domain sampling allocation — the standard
    multilingual-LLM mixing step (public method: temperature-based
    sampling over per-domain counts, e.g. mBERT/XLM-R exponentiated
    sampling, alpha = 0.5): per language domain, weight
    ``n_docs ** 0.5`` (= sqrt — IEEE-exactly-rounded on BOTH
    engines, unlike a general ``pow``), normalize, and allocate
    ``MIX_BUDGET`` document draws by LARGEST-REMAINDER (Hamilton)
    rounding so the allocations sum to the budget EXACTLY.

    Relationship to the r12 mixing pair (documented adjacency, not
    duplication): ``corpus_stats.corpus_mix_weights`` /
    ``token_budget_allocation`` attest the alpha=0.7 ``pow`` form
    with 9-decimal-quantized doubles over TOKEN quotas; this pair
    attests a float-free kernel — sqrt weights quantized to integer
    micro-units, every share/quota integer ``DIV``/``%`` — over DOC
    draws, and is the base the data-constrained CAPPED water-filling
    (:func:`domain_mixture_capped`, the genuinely new operation)
    iterates on. The
    temperature flattens the mixture: low-resource domains are
    oversampled relative to their raw share (``oversample_ppm`` >
    ``1e6`` exactly for the below-average domains), the knob a
    training-data pipeline turns to keep small languages represented.

    Numerics: weights quantize to integer micro-units
    (``floor(sqrt(n)*1e6 + 0.5)``) BEFORE any normalization, and
    every share/quota is integer ``DIV``/``%`` arithmetic from there
    — no cross-engine float drift is possible. Distribution shape:
    one hash aggregation over documents, then all arithmetic on the
    BOUNDED domain list (one row per language) — the two 1-row
    totals crossJoins and the largest-remainder rank window are
    metadata-sized by construction."""
    docs = load_table(spark, sf_dir, "documents")
    dom = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn(
            "wq",
            F.floor(
                F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    tot = dom.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("wq").alias("w_tot")
    )
    j = dom.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("(n_docs * 1000000) DIV tot_docs").alias("raw_share_ppm"),
        F.expr("(wq * 1000000) DIV w_tot").alias("temp_share_ppm"),
        F.expr(f"({MIX_BUDGET} * wq) DIV w_tot").alias("base"),
        F.expr(f"({MIX_BUDGET} * wq) % w_tot").alias("rem"),
    )
    t2 = j.agg(F.sum("base").alias("base_sum"))
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    )
    return (
        j.crossJoin(F.broadcast(t2))
        .withColumn("rk", rk)
        .select(
            "lang",
            "n_docs",
            "raw_share_ppm",
            "temp_share_ppm",
            F.expr(
                f"base + CASE WHEN rk <= {MIX_BUDGET} - base_sum"
                " THEN 1 ELSE 0 END"
            )
            .cast("long")
            .alias("alloc_docs"),
        )
        .withColumn(
            "oversample_ppm",
            F.expr("(alloc_docs * 1000000) DIV n_docs"),
        )
    )


MIXTURE_ORACLE = f"""
WITH dom AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
),
w AS (
    SELECT lang, n_docs,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT) AS wq
    FROM dom
),
tot AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
           CAST(sum(wq) AS BIGINT) AS w_tot
    FROM w
),
j AS (
    SELECT lang, n_docs,
           (n_docs * 1000000) // tot_docs AS raw_share_ppm,
           (wq * 1000000) // w_tot AS temp_share_ppm,
           ({MIX_BUDGET} * wq) // w_tot AS base,
           ({MIX_BUDGET} * wq) % w_tot AS rem
    FROM w, tot
),
t2 AS (SELECT CAST(sum(base) AS BIGINT) AS base_sum FROM j),
r AS (
    SELECT j.*, t2.base_sum,
           row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
    FROM j, t2
)
SELECT lang, n_docs,
       CAST(raw_share_ppm AS BIGINT) AS raw_share_ppm,
       CAST(temp_share_ppm AS BIGINT) AS temp_share_ppm,
       CAST(base + CASE WHEN rk <= {MIX_BUDGET} - base_sum
            THEN 1 ELSE 0 END AS BIGINT) AS alloc_docs,
       CAST(((base + CASE WHEN rk <= {MIX_BUDGET} - base_sum
              THEN 1 ELSE 0 END) * 1000000) // n_docs AS BIGINT)
           AS oversample_ppm
FROM r
"""


# --------------------------- data-constrained capped water-filling

#: repetition cap: at most 1.2 epochs of any domain may be drawn
#: (data-constrained training caps repeats; public basis: repeated
#: epochs beyond a few stop helping — Muennighoff et al.,
#: "Scaling Data-Constrained Language Models", NeurIPS 2023). The
#: 1.2 value is picked so BOTH branches bite at every test SF (the
#: sqrt-temperature epochs cluster at 1.13-1.29 for the non-en
#: domains and ~0.7 for en).
R_MAX_PPM = 1_200_000
#: unrolled redistribution rounds; with one dominant uncapped domain
#: the fixture converges in round 1 and round 2 verifies the no-op,
#: but a redistribution CAN tip a borderline domain over its cap, so
#: two clip+redistribute passes are genuinely exercised.
WF_ROUNDS = 2


def domain_mixture_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``domain_mixture_temperature`` under a repetition cap —
    water-filling: allocate a one-epoch budget (``sum(n_docs)``
    draws) by sqrt-temperature Hamilton rounding, CLIP each domain at
    ``cap = n_docs * R_MAX_PPM / 1e6`` draws, redistribute the
    clipped surplus across the still-uncapped domains by the same
    Hamilton rounding on their weights, and repeat ``WF_ROUNDS``
    times (a redistribution can push a borderline domain over ITS
    cap). Emits the final per-domain allocation, its epochs, the
    capped flag, and the globally-unallocated surplus (0 when the
    water-filling converged inside the round budget — pytest pins
    convergence and conservation). All arithmetic is integer DIV/%
    over quantized sqrt weights — engine-exact like the uncapped
    form; every frame is the bounded domain list."""
    docs = load_table(spark, sf_dir, "documents")
    dom = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return capped_waterfill(dom)


def capped_waterfill(dom: DataFrame) -> DataFrame:
    """The water-filling kernel over an arbitrary (lang, n_docs)
    domain frame — factored so pytest can replay it against a pure-
    Python reference on seeded random domain tables, not just the
    corpus fixture.

    Scale limit (latent, documented): ``b2 * wq`` must fit int64 —
    safe to ~1e10 total docs per mixing run (b2*wq ~ b2^1.5 * 1e6);
    beyond that Spark's non-ANSI mode would wrap where DuckDB
    errors, breaking the engine-exactness contract. Far above any
    attested SF; at 100 TB, mix per shard family or pre-scale
    counts before crossing that bound."""
    dom = dom.withColumn(
        "wq",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long"),
    ).withColumn("cap", F.expr(f"(n_docs * {R_MAX_PPM}) DIV 1000000"))
    tot = dom.agg(
        F.sum("n_docs").alias("b2"), F.sum("wq").alias("w_tot")
    )
    j = dom.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "wq",
        "cap",
        "b2",
        F.expr("(b2 * wq) DIV w_tot").alias("base"),
        F.expr("(b2 * wq) % w_tot").alias("rem"),
    )
    t0 = j.agg(F.sum("base").alias("bsum"))
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    )
    s = (
        j.crossJoin(F.broadcast(t0))
        .withColumn("rk", rk)
        .select(
            "lang",
            "n_docs",
            "wq",
            "cap",
            "b2",
            F.expr(
                "base + CASE WHEN rk <= b2 - bsum THEN 1 ELSE 0 END"
            )
            .cast("long")
            .alias("a"),
        )
    )
    # eager checkpoint per round: each round consumes `s` 3-4 times
    # (two scalar aggs + two crossJoins), so without the lineage cut
    # the whole upstream plan re-executes per consumer per round
    # (measured 31 s -> ~2 s Spark wall at sf0.001; the
    # crawl_rounds_audit discipline)
    s = s.localCheckpoint(eager=True)
    for _ in range(WF_ROUNDS):
        s = s.withColumn("over", F.col("a") - F.least("a", "cap"))
        s = s.withColumn("a", F.least("a", "cap"))
        t = s.agg(
            F.coalesce(F.sum("over"), F.lit(0)).alias("surp"),
            F.coalesce(
                F.sum(F.when(F.col("a") < F.col("cap"), F.col("wq"))),
                F.lit(0),
            ).alias("wu"),
        )
        s = s.crossJoin(F.broadcast(t)).select(
            "lang",
            "n_docs",
            "wq",
            "cap",
            "b2",
            "a",
            F.expr(
                "CASE WHEN a < cap AND wu > 0"
                " THEN (surp * wq) DIV wu ELSE 0 END"
            ).alias("base"),
            F.expr(
                "CASE WHEN a < cap AND wu > 0"
                " THEN (surp * wq) % wu ELSE -1 END"
            ).alias("rem"),
            "surp",
        )
        t2 = s.agg(F.sum("base").alias("bsum"))
        s = (
            s.crossJoin(F.broadcast(t2))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.orderBy(
                        F.col("rem").desc(), F.col("lang").asc()
                    )
                ),
            )
            .select(
                "lang",
                "n_docs",
                "wq",
                "cap",
                "b2",
                F.expr(
                    "a + base + CASE WHEN rem >= 0"
                    " AND rk <= surp - bsum THEN 1 ELSE 0 END"
                )
                .cast("long")
                .alias("a"),
            )
            .localCheckpoint(eager=True)
        )
    fin = s.withColumn("alloc_docs", F.least("a", "cap").cast("long"))
    g = fin.agg(
        (F.first("b2") - F.sum("alloc_docs"))
        .cast("long")
        .alias("surplus_unallocated")
    )
    return fin.crossJoin(F.broadcast(g)).select(
        "lang",
        "n_docs",
        F.col("cap").cast("long").alias("cap_docs"),
        "alloc_docs",
        F.expr("(alloc_docs * 1000000) DIV n_docs").alias("epochs_ppm"),
        (F.col("alloc_docs") >= F.col("cap")).alias("capped"),
        "surplus_unallocated",
    )


def _wf_round_sql(k: int) -> str:
    return f"""c{k} AS MATERIALIZED (
    SELECT lang, n_docs, wq, cap, b2,
           LEAST(a, cap) AS a, a - LEAST(a, cap) AS over
    FROM s{k - 1}
),
t{k} AS MATERIALIZED (
    SELECT CAST(coalesce(sum(over), 0) AS BIGINT) AS surp,
           CAST(coalesce(sum(CASE WHEN a < cap THEN wq END), 0)
                AS BIGINT) AS wu
    FROM c{k}
),
b{k} AS MATERIALIZED (
    SELECT c.lang, c.n_docs, c.wq, c.cap, c.b2, c.a, t.surp,
           CASE WHEN c.a < c.cap AND t.wu > 0
                THEN (t.surp * c.wq) // t.wu ELSE 0 END AS base,
           CASE WHEN c.a < c.cap AND t.wu > 0
                THEN (t.surp * c.wq) % t.wu ELSE -1 END AS rem
    FROM c{k} c, t{k} t
),
e{k} AS MATERIALIZED (SELECT CAST(sum(base) AS BIGINT) AS bsum
          FROM b{k}),
r{k} AS MATERIALIZED (
    SELECT b.*, e.bsum,
           row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
    FROM b{k} b, e{k} e
),
s{k} AS MATERIALIZED (
    SELECT lang, n_docs, wq, cap, b2,
           CAST(a + base + CASE WHEN rem >= 0 AND rk <= surp - bsum
                THEN 1 ELSE 0 END AS BIGINT) AS a
    FROM r{k}
)"""


def _capped_cte() -> str:
    """The water-filling oracle's WITH chain (through ``fin``/``g``)
    — factored so :func:`_interleave_oracle` can extend the SAME
    attested arithmetic instead of restating it."""
    rounds = ",\n".join(_wf_round_sql(k) for k in range(1, WF_ROUNDS + 1))
    return f"""WITH dom AS MATERIALIZED (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
),
w AS MATERIALIZED (
    SELECT lang, n_docs,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT) AS wq,
           (n_docs * {R_MAX_PPM}) // 1000000 AS cap
    FROM dom
),
tot AS MATERIALIZED (
    SELECT CAST(sum(n_docs) AS BIGINT) AS b2,
           CAST(sum(wq) AS BIGINT) AS w_tot
    FROM w
),
j AS MATERIALIZED (
    SELECT lang, n_docs, wq, cap, b2,
           (b2 * wq) // w_tot AS base,
           (b2 * wq) % w_tot AS rem
    FROM w, tot
),
t0 AS MATERIALIZED (SELECT CAST(sum(base) AS BIGINT) AS bsum FROM j),
s0 AS MATERIALIZED (
    SELECT lang, n_docs, wq, cap, b2,
           CAST(base + CASE WHEN row_number() OVER
                    (ORDER BY rem DESC, lang ASC) <= b2 - bsum
                THEN 1 ELSE 0 END AS BIGINT) AS a
    FROM j, t0
),
{rounds},
fin AS MATERIALIZED (
    SELECT lang, n_docs, cap, b2,
           LEAST(a, cap) AS alloc_docs
    FROM s{WF_ROUNDS}
),
g AS MATERIALIZED (
    SELECT CAST(any_value(b2) - sum(alloc_docs) AS BIGINT)
               AS surplus_unallocated
    FROM fin
)"""


def _capped_oracle() -> str:
    return f"""
{_capped_cte()}
SELECT lang, n_docs,
       CAST(cap AS BIGINT) AS cap_docs,
       CAST(alloc_docs AS BIGINT) AS alloc_docs,
       CAST((alloc_docs * 1000000) // n_docs AS BIGINT) AS epochs_ppm,
       alloc_docs >= cap AS capped,
       g.surplus_unallocated
FROM fin, g
"""


#: schedule-prefix length emitted by the interleave (the dataloader
#: pops slots in order; the prefix is what an operator inspects).
SCHED_SLOTS = 500


def mixture_interleave_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dataloader artifact for the mixing pair: the first
    ``SCHED_SLOTS`` draws of the deterministic domain interleave a
    sequential trainer consumes, scheduled from
    :func:`domain_mixture_capped`'s allocations by STRIDE SCHEDULING
    (public method: Waldspurger & Weihl 1995; equivalently WFQ
    virtual finish times, Demers et al. 1989): domain ``d`` with
    allocation ``a_d`` out of ``B = sum(a_d)`` total draws gets its
    ``i``-th draw at virtual finish time ``i * B / a_d`` — emitted
    in micro-units as EXACT integers — and the global order is
    (vft, lang, draw_idx). Proportional by construction: in any
    prefix of ``S`` slots a domain holds ``round(S * a_d / B) ± 1``
    draws (pytest pins the empirical bound and an exact pure-Python
    replay on seeded random allocations).

    This is to the mixing side what ``fetch_schedule`` is to the
    crawl side (VERDICT_r14 item 5's pattern): the attested
    allocation turned into the ORDER the executor actually follows.

    Numerics/scale: all integer ``DIV`` arithmetic (engine-exact);
    ``draw_idx * b_alloc * 1e6`` must fit int64 — safe to
    ``b_alloc`` ~ 1.8e13/SCHED_SLOTS ≈ 3.6e10 allocated docs per
    mixing run, the same latent bound class as
    :func:`capped_waterfill` (documented there). Distribution
    shape: candidates are ``min(a_d, SCHED_SLOTS)`` rows per domain
    — bounded by SCHED_SLOTS x |languages|, so the single global
    rank window is metadata-sized by construction (whitelisted like
    the mixture pair's domain windows)."""
    docs = load_table(spark, sf_dir, "documents")
    dom = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    alloc = capped_waterfill(dom).select("lang", "alloc_docs")
    return interleave_schedule(alloc)


def interleave_schedule(
    alloc: DataFrame, slots: int = SCHED_SLOTS
) -> DataFrame:
    """The stride-scheduling kernel over an arbitrary
    (lang, alloc_docs) frame — factored (the ``capped_waterfill``
    discipline) so pytest can replay it against a pure-Python WFQ
    reference on seeded random allocations. Zero-allocation domains
    are dropped (they hold no draws; ``generate_series(1, 0)`` and
    ``F.sequence(1, 0)`` would disagree about emptiness otherwise —
    Spark's sequence(1,0) yields a DESCENDING [1,0] range)."""
    a = alloc.filter(F.col("alloc_docs") > 0)
    tot = a.agg(F.sum("alloc_docs").cast("long").alias("b_alloc"))
    cand = (
        a.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "alloc_docs",
            "b_alloc",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(
                        F.col("alloc_docs"), F.lit(slots).cast("long")
                    ),
                )
            ).alias("draw_idx"),
        )
        .withColumn(
            "vft_micro",
            F.expr("(draw_idx * b_alloc * 1000000) DIV alloc_docs"),
        )
    )
    w = Window.orderBy(
        F.col("vft_micro").asc(),
        F.col("lang").asc(),
        F.col("draw_idx").asc(),
    )
    return (
        cand.withColumn("slot", F.row_number().over(w).cast("int"))
        .filter(F.col("slot") <= slots)
        .select("slot", "lang", "draw_idx", "vft_micro", "alloc_docs")
    )


def _sched_cte() -> str:
    """The schedule oracle's WITH chain extended through ``sched``
    (the interleave's final frame as a CTE) — shared by the
    interleave oracle and the sample manifest."""
    return f"""{_capped_cte()},
alloc AS MATERIALIZED (
    SELECT lang, CAST(alloc_docs AS BIGINT) AS alloc_docs
    FROM fin WHERE alloc_docs > 0
),
ba AS MATERIALIZED (
    SELECT CAST(sum(alloc_docs) AS BIGINT) AS b_alloc FROM alloc
),
cand AS MATERIALIZED (
    SELECT a.lang, a.alloc_docs, ba.b_alloc,
           CAST(g.i AS BIGINT) AS draw_idx,
           (CAST(g.i AS BIGINT) * ba.b_alloc * 1000000)
               // a.alloc_docs AS vft_micro
    FROM alloc a, ba,
         generate_series(1, {SCHED_SLOTS}) AS g(i)
    WHERE g.i <= a.alloc_docs
),
sched AS MATERIALIZED (
    SELECT * FROM (
        SELECT CAST(row_number() OVER (
                   ORDER BY vft_micro ASC, lang ASC, draw_idx ASC
               ) AS INT) AS slot,
               lang, draw_idx, vft_micro, alloc_docs
        FROM cand
    ) WHERE slot <= {SCHED_SLOTS}
)"""


def _interleave_oracle() -> str:
    return f"""
{_sched_cte()}
SELECT slot, lang, draw_idx, vft_micro, alloc_docs FROM sched
"""


def mixture_sample_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The last mixing-side layer: the schedule's slots resolved to
    CONCRETE documents — the manifest a dataloader actually reads.
    Domain ``d``'s ``i``-th draw takes the doc at per-domain
    shuffled rank ``((i-1) mod n_docs) + 1`` (wraparound = the
    repetition the cap allows; ``epoch = ((i-1) div n_docs) + 1``
    exposes it — both epoch values bite at sf0.001 and sf0.01,
    where the interleave's prefix oversamples the small domains past
    one full pass; at sf0.1 every domain is larger than its prefix
    share and the 500-slot manifest stays in epoch 1).
    The shuffle order is ``md5(doc_id)`` string order — a seeded
    deterministic permutation both engines produce byte-identically
    (the standard hash-shuffle every training pipeline uses so a
    manifest is reproducible from (corpus, seed) alone).

    Scale shape: the per-domain rank window carries an explicit
    ``doc_rank <= SCHED_SLOTS`` literal filter — only ranks the
    prefix can reference (``(i-1) mod n_docs + 1 <= min(n_docs,
    SCHED_SLOTS)``) — which Spark's WindowGroupLimit rewrites into
    a per-partition top-k instead of a full per-domain sort; the
    manifest itself is SCHED_SLOTS-bounded metadata joined against
    that top-k."""
    docs = load_table(spark, sf_dir, "documents")
    dom = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    alloc = capped_waterfill(dom).select("lang", "alloc_docs")
    sched = interleave_schedule(alloc)
    ranked = (
        docs.select(
            "lang",
            "doc_id",
            F.row_number()
            .over(
                Window.partitionBy("lang").orderBy(
                    F.md5(F.col("doc_id").cast("string").cast("binary")),
                    F.col("doc_id"),
                )
            )
            .alias("doc_rank"),
        )
        .filter(F.col("doc_rank") <= F.lit(SCHED_SLOTS))
    )
    j = sched.join(dom, "lang").select(
        "slot",
        "lang",
        "draw_idx",
        F.expr("((draw_idx - 1) % n_docs) + 1").alias("doc_rank"),
        F.expr("((draw_idx - 1) DIV n_docs) + 1")
        .cast("int")
        .alias("epoch"),
    )
    return j.join(ranked, ["lang", "doc_rank"]).select(
        "slot", "lang", "doc_id", "draw_idx", "doc_rank", "epoch"
    )


def _manifest_oracle() -> str:
    return f"""
{_sched_cte()},
rdocs AS MATERIALIZED (
    SELECT * FROM (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS doc_rank
        FROM documents
    ) WHERE doc_rank <= {SCHED_SLOTS}
)
SELECT s.slot, s.lang, r.doc_id, s.draw_idx,
       ((s.draw_idx - 1) % d.n_docs) + 1 AS doc_rank,
       CAST(((s.draw_idx - 1) // d.n_docs) + 1 AS INT) AS epoch
FROM sched s
JOIN dom d USING (lang)
JOIN rdocs r
  ON r.lang = s.lang
 AND r.doc_rank = ((s.draw_idx - 1) % d.n_docs) + 1
"""


def _register() -> None:
    registry.register(
        "quality_quantile_normalize",
        quality_quantile_normalize,
        QUANTILE_NORM_ORACLE,
    )
    registry.register(
        "domain_mixture_temperature",
        domain_mixture_temperature,
        MIXTURE_ORACLE,
    )
    registry.register(
        "domain_mixture_capped",
        domain_mixture_capped,
        _capped_oracle(),
    )
    registry.register(
        "mixture_interleave_schedule",
        mixture_interleave_schedule,
        _interleave_oracle(),
    )
    registry.register(
        "mixture_sample_manifest",
        mixture_sample_manifest,
        _manifest_oracle(),
    )
    registry.register(
        "sequence_pack_chunks", sequence_pack_chunks, SEQUENCE_PACK_ORACLE
    )
    registry.register(
        "curation_funnel_report",
        curation_funnel_report,
        _curation_funnel_oracle(),
    )
    registry.register("chunk_fill_report", chunk_fill_report, CHUNK_FILL_ORACLE)
    registry.register(
        "embedding_quantize_int8", embedding_quantize_int8, EMBEDDING_QUANTIZE_ORACLE
    )
    registry.register(
        "dsir_domain_weights", dsir_domain_weights, DSIR_ORACLE
    )
    registry.register(
        "greedy_coverage_select", greedy_coverage_select, _cover_oracle()
    )
    registry.register(
        "greedy_coverage_batched", greedy_coverage_batched, _batched_oracle()
    )
