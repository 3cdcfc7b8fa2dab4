"""Distributed BPE tokenizer training ([north-star], BASELINE.json:6)
— learn byte-pair-encoding merges FROM the corpus, the step upstream
of ``token_count_bpe`` (which applies a fixed tokenizer).

Algorithm (Sennrich et al. 2016, the map-reduce formulation): collapse
the corpus to its word VOCABULARY with frequencies (one corpus-sized
shuffle, done once); represent each word as a character sequence plus
a ``</w>`` terminal; then per merge round (a) count adjacent symbol
pairs weighted by word frequency — work proportional to the VOCAB, not
the corpus, (b) take the argmax pair (ties: count desc, pair asc),
(c) apply the merge greedily left-to-right to every vocab word.

Scale posture: after the initial word groupBy, every round touches
only the vocabulary table (~1e6-1e7 rows at web scale — thousands of
times smaller than the corpus). Pair counting shuffles (a, b, partial
sum) triples; the per-round driver round-trip fetches only the
AGGREGATED pair-count table (bounded by the distinct adjacent symbol
pairs — the classic in-memory state of every BPE trainer, ~alphabet²
at the start and shrinking), never corpus or vocab rows; the merge
application is map-only (a JVM-side ``F.aggregate`` fold — no Python
UDF). Vocab state stays a LAZY fold chain over the one eagerly
checkpointed base vocabulary (optimization r16, guide §2.4/§5): with
the base materialized, re-running k tiny array folds per round is
far cheaper than the k eager-checkpoint blocking jobs the r15 form
paid — per-round blocking jobs drop 3 -> 1 in the audit query and
2 -> 1 in the silent trainer.

Cross-engine determinism: all counts are exact integers; the DuckDB
oracle replays the merge rounds as unrolled CTEs, applying each merge
via greedy-position selection (match positions, split into runs of
consecutive indices — only possible when left==right — and keep the
1st, 3rd, ... of each run), which is equivalent to the left-to-right
fold. ``corpus_syms_after`` attests the merge APPLICATION, not just
the pair counting: both engines must shrink the corpus symbol count
identically every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: merge rounds to learn. Small because the synthetic corpus has a
#: ~31-word vocabulary; real runs set hundreds/thousands — the loop
#: cost is per-round vocab work + one 1-row collect.
NUM_MERGES = 8

#: end-of-word marker (standard BPE — lets merges learn suffixes
#: without crossing word boundaries).
EOW = "</w>"


def _char_syms(word):
    """Character list + terminal marker, via substring (identical in
    Spark and DuckDB; empty-separator split differs across engines)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(syms):
    """structs (a, b) for each adjacent position (size >= 2 always:
    one char + EOW)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b"),
        ),
    )


def _merge_fold_cols(syms, a, b):
    """Greedy left-to-right merge of adjacent (a, b) -> ab, as a
    JVM-side fold, with the pair as COLUMNS (r15: lets the training
    loop read the argmax from a broadcast 1-row frame instead of a
    driver collect). ``F.get`` (0-based) returns NULL out of bounds,
    so the empty-accumulator case falls through under ANSI mode."""
    merged = F.concat(a, b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_fold(syms, a: str, b: str):
    """:func:`_merge_fold_cols` with a literal pair (the audit
    query's driver-loop form)."""
    return _merge_fold_cols(syms, F.lit(a), F.lit(b))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Aggregated (a, b, cnt) adjacent-pair frequencies over the
    vocab — the bounded pair table both training loops fetch once
    per round (r16)."""
    return (
        vocab.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _argmax_pair(pair_rows):
    """Python-side replica of ``orderBy(cnt desc, a asc, b asc)
    .first()``: UTF-8 byte comparison == Spark's UTF8String binary
    string ordering, so the selected merge is identical."""
    return min(
        pair_rows,
        key=lambda r: (-r.cnt, r.a.encode("utf-8"), r.b.encode("utf-8")),
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn ``NUM_MERGES`` BPE merges from ``documents.text``.

    Returns one row per round: the merged pair, its (position-counted)
    frequency at selection time, and the corpus-wide symbol count
    after applying it — a strict audit trail of the training run.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", _char_syms(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    # Optimization r16 (guide §2.4): ONE blocking job per round
    # instead of three. Each round fetches the whole aggregated
    # pair-count table (bounded by distinct adjacent symbol pairs —
    # the in-memory state every BPE trainer keeps) and derives BOTH
    # the argmax merge and the PREVIOUS round's ``corpus_syms_after``
    # from it, via the exact integer identity
    #     sum(freq * size(syms)) = sum(freq * n_pairs) + sum(freq)
    # (size(syms) = n_pairs + 1 for every word). The merge folds
    # chain LAZILY over the checkpointed base vocab — re-running k
    # tiny array folds per round beats k eager-checkpoint jobs.
    # Per-invocation blocking jobs drop 25 -> 11; same-session probe
    # returned byte-identical rows for all three shapes tried.
    total_freq = int(vocab.agg(F.sum("freq")).first()[0])
    out_rows: list[list] = []
    for rank in range(1, NUM_MERGES + 1):
        pair_rows = _pair_counts(vocab).collect()
        if rank > 1:
            # pair totals over the (k-1)-times-merged vocab give the
            # previous round's post-merge corpus symbol count
            out_rows[-1][4] = sum(r.cnt for r in pair_rows) + total_freq
        best = _argmax_pair(pair_rows)
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), best.a, best.b)
        )
        out_rows.append([rank, best.a, best.b, int(best.cnt), 0])
    out_rows[-1][4] = int(
        vocab.agg(F.sum(F.col("freq") * F.size(F.col("syms")))).first()[0]
    )
    out_rows = [tuple(r) for r in out_rows]
    schema = T.StructType(
        [
            T.StructField("merge_rank", T.IntegerType()),
            T.StructField("left_sym", T.StringType()),
            T.StructField("right_sym", T.StringType()),
            T.StructField("pair_count", T.LongType()),
            T.StructField("corpus_syms_after", T.LongType()),
        ]
    )
    return spark.createDataFrame(out_rows, schema)


def _bpe_ctes() -> list[str]:
    """Unrolled DuckDB replay of the merge rounds (see module doc),
    as the shared CTE list behind BOTH oracles (training audit and
    corpus encode)."""
    ctes = [
        """v1 AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS freq,
           list_append(list_transform(range(1, length(word) + 1),
                       i -> substr(word, CAST(i AS INT), 1)), '</w>') AS syms
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY word
)"""
    ]
    for k in range(1, NUM_MERGES + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
    SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS a,
               unnest(list_transform(range(1, len(syms)), i -> syms[i + 1])) AS b
        FROM v{k}
    ) GROUP BY a, b
),
best{k} AS MATERIALIZED (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
pos{k} AS MATERIALIZED (
    SELECT word, freq, syms, len(syms) AS L,
           unnest(range(1, len(syms) + 1)) AS i
    FROM v{k}
),
mm{k} AS MATERIALIZED (
    SELECT p.word, p.freq, p.syms, p.i,
           CASE WHEN p.i < p.L AND p.syms[p.i] = bb.a
                     AND p.syms[p.i + 1] = bb.b THEN 1 ELSE 0 END AS is_match
    FROM pos{k} p CROSS JOIN best{k} bb
),
fl{k} AS MATERIALIZED (
    SELECT word, freq, syms, i, is_match,
           CASE WHEN is_match = 1 THEN
               i - row_number() OVER (PARTITION BY word, is_match ORDER BY i)
           END AS grp
    FROM mm{k}
),
se{k} AS MATERIALIZED (
    SELECT word, freq, syms, i, is_match,
           CASE WHEN is_match = 1 AND
                (row_number() OVER (PARTITION BY word, grp ORDER BY i)) % 2 = 1
           THEN 1 ELSE 0 END AS selected
    FROM fl{k}
),
fi{k} AS MATERIALIZED (
    SELECT word, freq, syms, i, selected,
           coalesce(lag(selected) OVER (PARTITION BY word ORDER BY i), 0)
               AS consumed
    FROM se{k}
),
v{k + 1} AS MATERIALIZED (
    SELECT word, min(freq) AS freq,
           list(CASE WHEN selected = 1 THEN syms[i] || syms[i + 1]
                     ELSE syms[i] END ORDER BY i) AS syms
    FROM fi{k} WHERE consumed = 0 GROUP BY word
),
o{k} AS MATERIALIZED (
    SELECT {k} AS merge_rank, bb.a AS left_sym, bb.b AS right_sym,
           bb.cnt AS pair_count,
           (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM v{k + 1})
               AS corpus_syms_after
    FROM best{k} bb
)"""
        )
    return ctes


_BPE_UNIONS = "\nUNION ALL\n".join(
    f"SELECT * FROM o{k}" for k in range(1, NUM_MERGES + 1)
)

BPE_ORACLE = "WITH " + ",\n".join(_bpe_ctes()) + "\n" + _BPE_UNIONS


def _train_final_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training loop of :func:`bpe_train_merges` without the
    per-round corpus-symbol audit collects — returns the FINAL
    (word, freq, syms) vocabulary after ``NUM_MERGES`` merges."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", _char_syms(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    # r15 measurement note: a broadcast-1-row-argmax variant (merge
    # pair as columns via crossJoin, one blocking job per round) was
    # tried and measured SLOWER (2.24 s vs 1.60 s at sf0.1) — the
    # per-round broadcast exchange costs more than the extra tiny
    # .first() job it saves. Kept the driver-collect form.
    # r16 (guide §2.4): the per-round eager vocab checkpoint is gone —
    # merge folds chain lazily over the checkpointed base, so each
    # round is ONE blocking job (the pair-table fetch + Python argmax,
    # replicating the orderBy tie-break byte-exactly) re-running at
    # most NUM_MERGES tiny array folds over the materialized vocab
    # rows. One final checkpoint keeps the multiply-scanned result
    # cheap for consumers. Per-invocation blocking jobs 17 -> 10;
    # warm-floor probe 1.57 -> 1.46-1.49 s at sf0.1 (the win is
    # mostly the removed per-round barrier, which matters more as
    # per-job overhead grows with cluster size).
    for _ in range(NUM_MERGES):
        best = _argmax_pair(_pair_counts(vocab).collect())
        vocab = vocab.withColumn(
            "syms", _merge_fold(F.col("syms"), best.a, best.b)
        )
    return vocab.localCheckpoint(eager=True)


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the train->apply loop: ENCODE every document with the
    merges just learned from this corpus (``token_count_bpe`` applies
    a FIXED tokenizer; this applies the trained one). Application is
    a broadcast join of the doc word stream against the final
    (word -> symbols) vocabulary — the 100 TB shape: the vocab is
    bounded (1e6-1e7 rows at web scale), the corpus never carries
    symbol arrays, and encoding adds zero extra shuffles beyond the
    word explode's per-doc re-aggregation.

    Emits per document: word count, the char-level symbol count the
    words started from (chars + one ``</w>`` terminal per word), the
    BPE token count after the learned merges, and the compression in
    exact integer ppm — all integers, hash-exact across engines."""
    from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast

    vocab = _train_final_vocab(spark, sf_dir).select(
        "word", F.size("syms").alias("n_syms"), F.length("word").alias("wlen")
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("word")
    ).filter(F.length("word") > 0)
    enc = words.join(maybe_broadcast(vocab), "word")
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.col("wlen") + F.lit(1)).cast("long").alias("n_char_syms"),
        F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        F.floor(
            F.sum("n_syms").cast("double")
            * F.lit(1000000.0)
            / F.sum(F.col("wlen") + F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("compression_ppm"),
    )


#: same unrolled CTE chain as BPE_ORACLE (the o{k} audit CTEs are
#: simply unused); the final vocab v{NUM_MERGES+1} is joined back to
#: the per-document word stream.
BPE_ENCODE_ORACLE = (
    "WITH "
    + ",\n".join(_bpe_ctes())
    + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(w.word) + 1) AS BIGINT) AS n_char_syms,
       CAST(sum(len(v.syms)) AS BIGINT) AS n_bpe_tokens,
       CAST(floor(sum(len(v.syms)) * 1000000.0
                  / sum(length(w.word) + 1) + 0.5) AS BIGINT)
           AS compression_ppm
FROM (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
    FROM documents
) w
JOIN v{NUM_MERGES + 1} v ON w.word = v.word
WHERE length(w.word) > 0
GROUP BY doc_id
"""
)


def _register() -> None:
    registry.register("bpe_train_merges", bpe_train_merges, BPE_ORACLE)
    registry.register(
        "bpe_encode_corpus", bpe_encode_corpus, BPE_ENCODE_ORACLE
    )
