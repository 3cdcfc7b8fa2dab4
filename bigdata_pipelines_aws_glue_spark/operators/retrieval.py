"""Lexical retrieval + statistical-LM quality scoring over the
``documents`` corpus ([north-star], BASELINE.json:6) — the two classic
text passes the suite still lacked next to the ANN/embedding stack:

- ``lm_perplexity_filter``: CCNet-style quality scoring. Train an
  interpolated bigram language model ON the corpus itself (bigram MLE
  backed off to an add-k unigram), score every document's
  per-token negative log-likelihood / perplexity, and flag the
  high-perplexity tail a curation pipeline would route to review.
- ``bm25_search``: Okapi BM25 top-k retrieval (Lucene idf variant),
  querying the corpus with its own first ``N_QUERIES`` documents —
  the doc-to-doc lexical twin of ``cosine_topk``.

Scale posture: everything is explode → keyed aggregation → equi-join.
The LM's model tables (bigram counts, context counts, unigram counts)
shuffle on their natural keys and join back to the exploded corpus on
those keys — no broadcast of anything corpus-sized; the only
broadcast scalars are (total_tokens, vocab_size) and the corpus mean
NLL (1 row each). BM25 broadcasts the QUERY side (``N_QUERIES``
term rows) against the posting lists, groups on (query, doc), and
ranks per-query with a window — the standard impact-join shape; the
corpus side never re-partitions beyond the term shuffle.

Cross-engine determinism: probabilities are ratios of exact integer
counts (bit-identical doubles in both engines); per-token ``ln p``
addends and per-pair BM25 contributions are quantized to 1e-9 before
summation (order-independent — see ``functions/rounding.py``); ranks
tie-break on ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    dec_qsum,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: interpolation weight on the bigram MLE (rest goes to the smoothed
#: unigram) — a fixed-weight Jelinek-Mercer mix.
LM_LAMBDA = 0.7
#: add-k mass for the unigram backoff (keeps unseen-in-context tokens
#: finite without a separate OOV estimate).
LM_ADD_K = 0.5
#: documents whose avg NLL exceeds corpus-mean × this factor land in
#: the review tail.
LM_TAIL_FACTOR = 1.05

_Q9 = 1e9


def _quantized_sum_expr(col, alias):
    """1e-9-quantized order-independent sum (decimal(38,0)-carried —
    long sums wrap past ~9e9 addends at this quantization)."""
    return (dec_qsum(col, _Q9).cast("double") / F.lit(_Q9)).alias(alias)


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) for every token position, with a ``<s>``
    start symbol so the first real token is conditioned too."""
    toks = _tokens(F.col("text"))
    with_start = F.concat(F.array(F.lit("<s>")), toks)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.struct(
            F.element_at(with_start, i).alias("w1"),
            F.element_at(with_start, i + 1).alias("w2"),
        ),
    )
    return docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM score: ``p(w2|w1) = λ·c12/c1 + (1-λ)·(c2+k)/(T+kV)``.

    Emits avg negative log-likelihood (nats), perplexity, and the
    ``is_tail`` review flag (NLL > corpus mean × 1.05). Train and
    score are the same corpus pass — the self-scoring degenerate of
    the usual train-on-clean / score-on-raw split, which is just a
    second ``load_table`` away.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = _doc_bigrams(docs)
    c12 = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = grams.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    tot = c2.agg(
        F.sum("c2").alias("t_tokens"), F.count(F.lit(1)).alias("v_size")
    ).withColumn("k", F.lit(1))

    p_bi = F.col("c12").cast("double") / F.col("c1").cast("double")
    p_uni = (F.col("c2").cast("double") + F.lit(LM_ADD_K)) / (
        F.col("t_tokens").cast("double") + F.lit(LM_ADD_K) * F.col("v_size")
    )
    lnp = F.log(F.lit(LM_LAMBDA) * p_bi + F.lit(1.0 - LM_LAMBDA) * p_uni)

    scored = (
        grams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(c2, "w2")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(tot), "k")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            _quantized_sum_expr(-lnp, "nll_sum"),
        )
        .withColumn("avg_nll", F.col("nll_sum") / F.col("n_tokens"))
    )
    mean = (
        scored.withColumn("k", F.lit(1))
        .groupBy("k")
        .agg(
            (
                dec_qsum(F.col("avg_nll"), _Q9).cast("double")
                / F.lit(_Q9)
                / F.count(F.lit(1))
            ).alias("mean_nll")
        )
    )
    return (
        scored.withColumn("k", F.lit(1))
        .join(F.broadcast(mean), "k")
        .select(
            "doc_id",
            "n_tokens",
            stable_round(F.col("avg_nll"), 6).alias("avg_nll"),
            stable_round(F.exp(F.col("avg_nll")), 4).alias("ppl"),
            (
                F.col("avg_nll") > F.col("mean_nll") * F.lit(LM_TAIL_FACTOR)
            ).alias("is_tail"),
        )
    )


LM_PPL_ORACLE = f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) + 1),
                  i -> CASE WHEN i = 1 THEN '<s>' ELSE toks[i - 1] END)) AS w1,
           unnest(list_transform(range(1, len(toks) + 1), i -> toks[i])) AS w2
    FROM t
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM grams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM grams GROUP BY w1),
c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM grams GROUP BY w2),
tot AS (
    SELECT CAST(sum(c2) AS BIGINT) AS t_tokens,
           CAST(count(*) AS BIGINT) AS v_size
    FROM c2
),
scored AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           sum(floor(-ln({LM_LAMBDA} * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                         + {1.0 - LM_LAMBDA} * ((CAST(c2 AS DOUBLE) + {LM_ADD_K})
                            / (CAST(t_tokens AS DOUBLE) + {LM_ADD_K} * v_size)))
                     * 1000000000.0 + 0.5)) / 1000000000.0 AS nll_sum
    FROM grams g
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    JOIN c2 USING (w2)
    CROSS JOIN tot
    GROUP BY g.doc_id
),
with_avg AS (
    SELECT doc_id, n_tokens, nll_sum / n_tokens AS avg_nll FROM scored
),
m AS (
    SELECT sum(floor(avg_nll * 1000000000.0 + 0.5)) / 1000000000.0 / count(*)
               AS mean_nll
    FROM with_avg
)
SELECT doc_id, n_tokens,
       floor(avg_nll * 1000000.0 + 0.5) / 1000000.0 AS avg_nll,
       floor(exp(avg_nll) * 10000.0 + 0.5) / 10000.0 AS ppl,
       avg_nll > mean_nll * {LM_TAIL_FACTOR} AS is_tail
FROM with_avg CROSS JOIN m
"""


#: BM25 shape parameters (the universal Okapi defaults).
BM25_K1 = 1.2
BM25_B = 0.75
#: first N documents double as the query set.
N_QUERIES = 5
#: results per query.
BM25_TOPK = 10


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 matches per query document (self excluded).

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's shifted
    variant — never negative), ``tf`` saturates through
    ``k1``/``b`` length normalization. Per-(query, doc) term
    contributions are 1e-9-quantized before the sum; ties rank by
    ``doc_id``.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_avg = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_len")
    ).withColumn("k", F.lit(1))

    qterms = (
        tf.filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("t_len").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("tf").cast("double")
    contrib = idf * (
        tf_d
        * F.lit(BM25_K1 + 1.0)
        / (
            tf_d
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl
            )
        )
    )

    # df over the FULL vocab grows with the corpus (Heaps' law) — too
    # big to force-broadcast at 100 TB. Restrict it to the query's own
    # terms first (bounded: N_QUERIES docs' vocabularies); df values
    # per term are unchanged, so scores are identical.
    df_q = df_.join(
        F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_q), "term")
        .join(dl, "doc_id")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(n_avg), "k")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            _quantized_sum_expr(contrib, "score_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "n_matched_terms",
            stable_round(F.col("score_q"), 6).alias("bm25_score"),
        )
    )


BM25_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tok2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM tok2 GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok2 GROUP BY doc_id),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n_avg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_len
    FROM dl
),
qterms AS (
    SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < {N_QUERIES}
),
scored AS (
    SELECT q.query_id, t.doc_id,
           CAST(count(*) AS BIGINT) AS n_matched_terms,
           sum(floor(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0}
                  / (CAST(t.tf AS DOUBLE)
                     + {BM25_K1} * ({1.0 - BM25_B}
                        + {BM25_B} * CAST(dl.dl AS DOUBLE)
                          / (CAST(t_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
               * 1000000000.0 + 0.5)) / 1000000000.0 AS score_q
    FROM qterms q
    JOIN tf t USING (term)
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = t.doc_id
    CROSS JOIN n_avg
    WHERE t.doc_id <> q.query_id
    GROUP BY q.query_id, t.doc_id
),
ranked AS (
    SELECT query_id, doc_id, n_matched_terms, score_q,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_matched_terms,
       floor(score_q * 1000000.0 + 0.5) / 1000000.0 AS bm25_score
FROM ranked WHERE rank <= {BM25_TOPK}
"""


#: RRF smoothing constant — the value from the original Cormack/
#: Clarke/Buettcher paper (TREC 2009), used unchanged by every
#: production hybrid-search implementation.
RRF_K = 60
RRF_TOPK = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the SPARSE (BM25
    over ``documents``) and DENSE (exact cosine over ``embeddings``;
    ``vec_id`` is the embedding of ``doc_id`` — same cardinality and
    id space in this corpus) top-10 lists for the same query
    documents. ``rrf = Σ_lists 1/(K + rank)`` with K=60; a doc absent
    from one list simply contributes nothing — the property that
    makes RRF score-scale-free and the default fusion in hybrid
    search engines.

    Everything downstream of the two retrievals is rank arithmetic
    on lists bounded by |queries|·k rows — the fusion itself costs
    nothing at any corpus scale; the retrievals carry the documented
    scale posture of ``bm25_search`` and ``cosine_topk``. 1/(K+r)
    and the two-term sum are exactly-specified IEEE ops, so the
    fused scores hash bit-for-bit cross-engine."""
    from bigdata_pipelines_aws_glue_spark.operators.similarity import cosine

    sparse = bm25_search(spark, sf_dir).select(
        "query_id",
        "doc_id",
        F.col("rank").alias("r_sparse"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    dense = (
        scored.withColumn("r_dense", F.row_number().over(wd))
        .filter(F.col("r_dense") <= RRF_TOPK)
        .select("query_id", "doc_id", "r_dense")
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full_outer")
    rrf = (
        F.when(
            F.col("r_sparse").isNotNull(),
            F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_sparse")),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("r_dense").isNotNull(),
            F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_dense")),
        ).otherwise(F.lit(0.0))
    )
    wf = Window.partitionBy("query_id").orderBy(
        rrf.desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= RRF_TOPK)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("r_sparse").cast("int").alias("r_sparse"),
            F.col("r_dense").cast("int").alias("r_dense"),
            stable_round(rrf, 8).alias("rrf_score"),
        )
    )


RRF_ORACLE = f"""
WITH sparse AS (
{BM25_ORACLE}
),
dense_scored AS (
    SELECT q.vec_id AS query_id, b.vec_id AS doc_id,
           list_dot_product(q.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]))) AS cos
    FROM embeddings q JOIN embeddings b ON q.vec_id <> b.vec_id
    WHERE q.vec_id < {N_QUERIES}
),
dense AS (
    SELECT query_id, doc_id, r_dense FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, doc_id) AS r_dense
        FROM dense_scored
    ) WHERE r_dense <= {RRF_TOPK}
),
fused AS (
    SELECT coalesce(s.query_id, d.query_id) AS query_id,
           coalesce(s.doc_id, d.doc_id) AS doc_id,
           s.rank AS r_sparse, d.r_dense,
           coalesce(1.0 / ({RRF_K} + s.rank), 0.0)
             + coalesce(1.0 / ({RRF_K} + d.r_dense), 0.0) AS rrf
    FROM (SELECT query_id, doc_id, rank FROM sparse) s
    FULL OUTER JOIN dense d
      ON s.query_id = d.query_id AND s.doc_id = d.doc_id
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
       CAST(r_sparse AS INT) AS r_sparse,
       CAST(r_dense AS INT) AS r_dense,
       floor(rrf * 100000000.0 + 0.5) / 100000000.0 AS rrf_score
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf DESC, doc_id) AS rank
    FROM fused
) WHERE rank <= {RRF_TOPK}
"""


def _register() -> None:
    registry.register("lm_perplexity_filter", lm_perplexity_filter, LM_PPL_ORACLE)
    registry.register("bm25_search", bm25_search, BM25_ORACLE)
    registry.register("hybrid_search_rrf", hybrid_search_rrf, RRF_ORACLE)
