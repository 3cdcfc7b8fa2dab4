"""Corpus-level statistics for LLM-data curation ([north-star],
BASELINE.json:6) — the passes that look ACROSS documents, where
``operators/text.py`` looks within one.

- ``corpus_mix_weights``: temperature-based language re-weighting
  (share^alpha renormalized, alpha=0.7) — the standard multilingual
  sampling scheme for balancing a training mix without discarding
  high-resource data.
- ``corpus_token_entropy``: per-language unigram entropy / perplexity
  — a corpus-health number (collapsed/templated corpora show low
  entropy for their vocabulary size).
- ``crossdoc_shingle_dup``: per-document fraction of 8-token shingles
  shared with ANY other document — the cross-document complement of
  the within-doc Gopher repetition rules, and the statistic behind
  "dedup repeated substrings" corpus cleaning.

Scale posture: every pass is explode → keyed aggregation → broadcast
join of a SMALL aggregate (per-language totals; the scalar mix
denominator) back onto grouped data; the only large-large shuffle is
the shingle self-count, which hash-partitions on the shingle string —
the same key distribution MinHash banding relies on. Per-language
totals are joined via an equi-join on a literal key (broadcast, 1
row), never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    dec_qsum,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: temperature exponent for the language mix (0.7 is the common
#: multilingual-sampling setting: flattens the distribution without
#: inverting it).
MIX_ALPHA = 0.7


def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling weights: ``w_l = share_l^alpha / Z``.

    ``oversample_factor`` (> 1 for low-resource languages) is the
    epoch multiplier a sampler would apply per language.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total")).withColumn("k", F.lit(1))
    c = (
        counts.withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .withColumn(
            "share", F.col("n_docs").cast("double") / F.col("total").cast("double")
        )
        .withColumn("pw", F.pow(F.col("share"), F.lit(MIX_ALPHA)))
    )
    z = c.groupBy("k").agg(F.sum("pw").alias("z"))
    return c.join(F.broadcast(z), "k").select(
        "lang",
        "n_docs",
        stable_round(F.col("share"), 6).alias("share"),
        stable_round(F.col("pw") / F.col("z"), 6).alias("mix_weight"),
        stable_round((F.col("pw") / F.col("z")) / F.col("share"), 4).alias(
            "oversample_factor"
        ),
    )


MIX_ORACLE = f"""
WITH counts AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM counts),
c AS (
    SELECT lang, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           pow(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), {MIX_ALPHA}) AS pw
    FROM counts, tot
),
z AS (SELECT sum(pw) AS z FROM c)
SELECT lang, n_docs,
       floor(share * 1000000.0 + 0.5) / 1000000.0 AS share,
       floor((pw / z) * 1000000.0 + 0.5) / 1000000.0 AS mix_weight,
       floor(((pw / z) / share) * 10000.0 + 0.5) / 10000.0 AS oversample_factor
FROM c, z
"""


def corpus_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy (nats) and perplexity per language.

    The per-term ``-p ln p`` addends are quantized to 1e-9 before the
    sum so the aggregation is order-independent cross-engine (see
    ``functions/rounding.py``); vocab sizes up to ~1e7 stay exact in
    the integer domain.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    per_term = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    totals = per_term.groupBy("lang").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab_size")
    )
    p = F.col("n").cast("double") / F.col("total").cast("double")
    term_e = -(p * F.log(p))
    agg = (
        per_term.join(F.broadcast(totals), "lang")
        .groupBy("lang")
        .agg(
            (dec_qsum(term_e, 1e9).cast("double") / F.lit(1e9)).alias(
                "ent_q"
            ),
            F.min("vocab_size").alias("vocab_size"),
            F.min("total").alias("n_tokens"),
        )
    )
    return agg.select(
        "lang",
        "n_tokens",
        "vocab_size",
        stable_round(F.col("ent_q"), 6).alias("token_entropy_nats"),
        stable_round(F.exp(F.col("ent_q")), 4).alias("unigram_ppl"),
    )


ENTROPY_ORACLE = """
WITH terms AS (
    SELECT lang, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
per_term AS (
    SELECT lang, term, CAST(count(*) AS BIGINT) AS n
    FROM terms WHERE length(term) > 0 GROUP BY lang, term
),
totals AS (
    SELECT lang, CAST(sum(n) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS vocab_size
    FROM per_term GROUP BY lang
),
agg AS (
    SELECT p.lang,
           sum(CAST(floor(-((CAST(p.n AS DOUBLE) / t.total)
                       * ln(CAST(p.n AS DOUBLE) / t.total)) * 1000000000.0
                       + 0.5) AS BIGINT))
               / 1000000000.0 AS ent_q,
           min(t.vocab_size) AS vocab_size,
           min(t.total) AS n_tokens
    FROM per_term p JOIN totals t USING (lang)
    GROUP BY p.lang
)
SELECT lang, n_tokens, vocab_size,
       floor(ent_q * 1000000.0 + 0.5) / 1000000.0 AS token_entropy_nats,
       floor(exp(ent_q) * 10000.0 + 0.5) / 10000.0 AS unigram_ppl
FROM agg
"""

#: shingle width for the cross-document pass (8 tokens ≈ the "50
#: character" substring-dedup granularity of web-corpus cleaning).
SHINGLE_N = 8


def crossdoc_shingle_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each document with ≥ 8 tokens: how many of its distinct
    8-token shingles occur in at least one OTHER location in the
    corpus, and the shared fraction. High fractions mark boilerplate /
    template documents that near-dedup should collapse."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    shingles = F.when(
        F.size(toks) >= SHINGLE_N,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE_N),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(SHINGLE_N))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = docs.select("doc_id", F.explode(shingles).alias("shingle")).distinct()
    per_sh = pairs.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    return (
        pairs.join(per_sh, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_shingles"),
            F.sum((F.col("nd") > 1).cast("int")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_distinct_shingles",
            F.col("n_shared").cast("long").alias("n_shared_shingles"),
            stable_round(
                F.col("n_shared").cast("double") / F.col("n_distinct_shingles"), 6
            ).alias("shared_shingle_frac"),
        )
    )


SHINGLE_ORACLE = """
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 6),
                      i -> array_to_string(list_slice(toks, i, i + 7), ' ')))
                   AS shingle
        FROM t WHERE len(toks) >= 8
    )
),
per_sh AS (
    SELECT shingle, count(*) AS nd FROM sh GROUP BY shingle
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_distinct_shingles,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_shingles,
       floor((CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS shared_shingle_frac
FROM sh JOIN per_sh USING (shingle)
GROUP BY doc_id
"""


TOKEN_BUDGET = 1_000_000


def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix PLANNING: turn temperature weights into integer per-language
    token quotas that sum EXACTLY to ``TOKEN_BUDGET`` via
    largest-remainder rounding — the allocation a sampler executes
    when building a fixed-size training mix. All comparisons run on
    9-decimal-rounded weights (same pow-precedent as
    ``corpus_mix_weights``), so floor/remainder arithmetic is
    identical cross-engine and the quota vector hash-checks.

    Everything after the one corpus scan operates on the #languages-row
    aggregate: the totals join and the remainder-rank self-join are
    bounded by language cardinality (a broadcast of a handful of
    rows), never by corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.sum(F.size(_tokens(F.col("text")))).alias("n_tokens")
    )
    total = counts.agg(F.sum("n_tokens").alias("total")).withColumn(
        "k", F.lit(1)
    )
    c = (
        counts.withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .withColumn(
            "pw",
            F.pow(
                F.col("n_tokens").cast("double") / F.col("total").cast("double"),
                F.lit(MIX_ALPHA),
            ),
        )
    )
    # quantize pw to 1e-9 longs BEFORE normalizing: the z sum is then
    # an exact integer in both engines (order-independent), so w — and
    # every floor/remainder comparison downstream — is bit-identical
    # cross-engine instead of riding on the 9th decimal of a float sum
    c = c.withColumn("pwq", F.floor(F.col("pw") * 1e9 + F.lit(0.5)))
    z = c.groupBy("k").agg(F.sum("pwq").alias("zq"))
    w = c.join(F.broadcast(z), "k").select(
        "k",
        "lang",
        "n_tokens",
        stable_round(
            F.col("pwq").cast("double") / F.col("zq").cast("double"), 9
        ).alias("w"),
    )
    alloc = w.select(
        "k",
        "lang",
        "n_tokens",
        "w",
        F.floor(F.col("w") * TOKEN_BUDGET).cast("long").alias("base"),
        (F.col("w") * TOKEN_BUDGET - F.floor(F.col("w") * TOKEN_BUDGET)).alias(
            "frac"
        ),
    )
    rem = alloc.groupBy("k").agg(
        (F.lit(TOKEN_BUDGET) - F.sum("base")).alias("rem")
    )
    # largest-remainder rank WITHOUT a single-partition window: count
    # strictly-greater (frac, lang) rows in the #langs-row aggregate
    other = alloc.select(
        F.col("k"), F.col("lang").alias("o_lang"), F.col("frac").alias("o_frac")
    )
    ranked = (
        alloc.join(F.broadcast(other), "k")
        .withColumn(
            "ahead",
            (
                (F.col("o_frac") > F.col("frac"))
                | ((F.col("o_frac") == F.col("frac")) & (F.col("o_lang") < F.col("lang")))
            ).cast("int"),
        )
        .groupBy("k", "lang", "n_tokens", "base", "frac")
        .agg((F.sum("ahead") + 1).alias("rank"))
    )
    return ranked.join(F.broadcast(rem), "k").select(
        "lang",
        "n_tokens",
        (
            F.col("base")
            + F.when(F.col("rank") <= F.col("rem"), F.lit(1)).otherwise(F.lit(0))
        ).alias("token_quota"),
    )


TOKEN_BUDGET_ORACLE = f"""
WITH counts AS (
    SELECT lang, sum(len(string_split(trim(text), ' '))) AS n_tokens
    FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_tokens) AS total FROM counts),
c AS (
    SELECT lang, n_tokens,
           CAST(floor(
               pow(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE),
                   {MIX_ALPHA}) * 1000000000.0 + 0.5) AS BIGINT) AS pwq
    FROM counts, tot
),
z AS (SELECT sum(pwq) AS zq FROM c),
w AS (
    SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           floor((CAST(pwq AS DOUBLE) / CAST(zq AS DOUBLE))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS w
    FROM c, z
),
alloc AS (
    SELECT lang, n_tokens, w,
           CAST(floor(w * {TOKEN_BUDGET}) AS BIGINT) AS base,
           w * {TOKEN_BUDGET} - floor(w * {TOKEN_BUDGET}) AS frac
    FROM w
),
rem AS (SELECT {TOKEN_BUDGET} - sum(base) AS rem FROM alloc),
ranked AS (
    SELECT lang, n_tokens, base,
           row_number() OVER (ORDER BY frac DESC, lang) AS rnk
    FROM alloc
)
SELECT lang, n_tokens,
       base + CASE WHEN rnk <= rem THEN 1 ELSE 0 END AS token_quota
FROM ranked, rem
"""


def hll_vocab_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup (Apache DataSketches HLL via
    ``hll_sketch_agg`` / ``hll_union_agg``): per-language vocabulary
    sketches UNION into a corpus-wide estimate without re-scanning the
    tokens — the 100 TB pattern where per-partition/per-day sketches
    persist beside the data and any rollup (day→month, lang→corpus)
    is a constant-size merge, which one-shot ``approx_count_distinct``
    cannot do. Sketch estimates differ across engines, so (same
    contract as ``approx_distinct``) each engine emits the EXACT
    cardinality plus a boolean asserting its own estimate lands within
    5% — both sides must say true. The Spark ALL row's estimate comes
    from the sketch union, so the merge path itself is what's
    attested.

    Tolerance bound: Spark's DataSketches HLL defaults to lgConfigK=12
    (RSE ~ 1.04/sqrt(4096) ~ 1.6%), and DuckDB's approx_count_distinct
    HLL is comparably sized, so 5% is a ~3-sigma bound for EACH
    engine's own estimator — each side asserts only its own sketch,
    never the other's, so the check does not require the two
    estimators to agree with each other. On a corpus where 3 sigma is
    still too tight, raise lgConfigK via
    ``F.hll_sketch_agg(col, lgConfigK)`` rather than widening the
    bound."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(_tokens(F.col("text"))).alias("tok"))
    per = toks.groupBy("lang").agg(
        F.hll_sketch_agg("tok").alias("sk"),
        F.countDistinct("tok").alias("n_vocab_exact"),
    )
    within = (
        F.abs(
            F.hll_sketch_estimate(F.col("sk")) - F.col("n_vocab_exact")
        )
        / F.col("n_vocab_exact").cast("double")
        < 0.05
    )
    lang_rows = per.select(
        "lang", "n_vocab_exact", within.alias("within_5pct")
    )
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    global_exact = toks.agg(
        F.countDistinct("tok").alias("n_vocab_exact")
    )
    all_row = global_exact.crossJoin(union_est).select(
        F.lit("ALL").alias("lang"),
        "n_vocab_exact",
        (
            F.abs(F.col("_est") - F.col("n_vocab_exact"))
            / F.col("n_vocab_exact").cast("double")
            < 0.05
        ).alias("within_5pct"),
    )
    return lang_rows.unionByName(all_row)


HLL_ROLLUP_ORACLE = """
WITH toks AS (
    SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
    FROM documents
),
per AS (
    SELECT lang,
           count(DISTINCT tok) AS n_vocab_exact,
           approx_count_distinct(tok) AS est
    FROM toks GROUP BY lang
),
allr AS (
    SELECT 'ALL' AS lang,
           count(DISTINCT tok) AS n_vocab_exact,
           approx_count_distinct(tok) AS est
    FROM toks
)
SELECT lang, n_vocab_exact,
       abs(est - n_vocab_exact) / n_vocab_exact::DOUBLE < 0.05 AS within_5pct
FROM per
UNION ALL
SELECT lang, n_vocab_exact,
       abs(est - n_vocab_exact) / n_vocab_exact::DOUBLE < 0.05 AS within_5pct
FROM allr
"""


#: Misra–Gries counter budget. Deliberately SMALLER than the corpus
#: vocabulary (~40 terms), so evictions genuinely occur and the
#: guarantee booleans attest real sketch behavior, not a trivially
#: exact dictionary.
MG_K = 32


def _mg_partitions(it):
    """Arrow-batched per-partition Misra–Gries summary over the
    ``text`` column: at most ``MG_K`` (term, est) counters per
    partition. est undercounts truth by at most n_p/(MG_K+1)."""
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in it:
        for text in pdf["text"]:
            # strip(' ') mirrors F.trim / DuckDB trim (spaces only);
            # bare strip() would also eat \t/\n and desync the sketch
            # from the exact audit side on edge whitespace.
            for w in text.strip(" ").split(" "):
                if not w:
                    continue
                if w in counters:
                    counters[w] += 1
                elif len(counters) < MG_K:
                    counters[w] = 1
                else:
                    # decrement-all step (the incoming item's count of
                    # 1 cancels too); drop zeroed counters
                    for t in list(counters):
                        if counters[t] == 1:
                            del counters[t]
                        else:
                            counters[t] -= 1
    # explicit dtype: an empty partition would otherwise emit a
    # float64 "est" column and fail the Arrow long conversion
    yield pd.DataFrame(
        {
            "term": pd.Series(list(counters.keys()), dtype="object"),
            "est": pd.Series(list(counters.values()), dtype="int64"),
        }
    )


def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters via mergeable Misra–Gries sketches —
    the bounded-memory way to find >1/``MG_K``-frequency terms at
    100 TB (exact per-term counts need a vocabulary-sized shuffle;
    the sketch needs MG_K counters per partition plus a ≤ MG_K·P-row
    merge). Per-partition sketches (Arrow ``mapInPandas``) merge by
    summing per-term estimates; merged error stays ≤ n/(MG_K+1)
    because per-partition decrements add.

    Attestation follows the ``hll_vocab_rollup`` contract: the output
    rows are the EXACTLY-heavy terms (true_count·K > n, integer
    compare — both engines compute them identically), and the sketch
    contributes two booleans that MG structurally guarantees under
    ANY partitioning: every strictly-heavy term survives the sketch
    (``in_sketch``), and its estimate lands in [true−n/K, true]
    (``est_within_bound``). The DuckDB twin asserts TRUE, so a hash
    match proves the sketch really held its guarantee on this corpus.
    Raw per-term estimates are deliberately NOT emitted — they depend
    on partition layout; the guarantee booleans do not. The exact
    side here is the audit pass (at 100 TB you would ship the sketch
    alone)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    sketch = docs.mapInPandas(_mg_partitions, "term string, est long")
    merged = sketch.groupBy("term").agg(F.sum("est").alias("est"))
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("term")).filter(
        F.length("term") > 0
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    total = (
        exact.agg(F.sum("true_count").alias("n_tokens"))
        .withColumn("k", F.lit(1))
    )
    heavy = (
        exact.withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .filter(F.col("true_count") * F.lit(MG_K) > F.col("n_tokens"))
    )
    und = F.col("true_count") - F.coalesce(F.col("est"), F.lit(0))
    return heavy.join(merged, "term", "left").select(
        "term",
        "true_count",
        "n_tokens",
        F.col("est").isNotNull().alias("in_sketch"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("true_count"))
            & (und * F.lit(MG_K) <= F.col("n_tokens"))
        ).alias("est_within_bound"),
    )


HEAVY_HITTERS_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tok2 AS (SELECT term FROM toks WHERE length(term) > 0),
exact AS (
    SELECT term, CAST(count(*) AS BIGINT) AS true_count
    FROM tok2 GROUP BY term
),
tot AS (SELECT CAST(sum(true_count) AS BIGINT) AS n_tokens FROM exact)
SELECT term, true_count, n_tokens,
       TRUE AS in_sketch,
       TRUE AS est_within_bound
FROM exact CROSS JOIN tot
WHERE true_count * {MG_K} > n_tokens
"""


CMS_D = 4  # hash rows
CMS_W = 512  # buckets per row
CMS_TOPN = 20  # point-query audit set
#: ceil(e * 1e9): integer-rational overestimate factor for the CMS
#: guarantee bound — excess <= e*N/W holds w.p. 1 - e^-d; kept as a
#: BIGINT ratio so both engines compute the identical cutoff.
_CMS_E_NUM = 2_718_281_829


def _cms_bucket(term: Column, r: Column) -> Column:
    """Row-``r`` bucket of ``term``: first 60 bits of
    ``md5(term ':cms:' r)`` mod W — the same cross-engine md5-prefix
    hash family as :mod:`sampling`'s shuffle_key."""
    s = F.concat(term, F.lit(":cms:"), r.cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(CMS_W)
    )


def count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream + point-query
    audit — completing the mergeable-sketch family (HLL cardinality,
    GK quantiles, Misra-Gries heavy hitters, CMS point frequency).

    Build: every token increments d=4 (row, bucket) cells; on Spark
    that is ONE keyed aggregation whose map-side partial aggregates
    ARE the per-partition sketches and whose reduce is the (+)-merge
    — 2048 cells total regardless of corpus size, the textbook
    100 TB shape (the exact term-frequency pass here is the audit
    side; at scale you ship the sketch alone).

    Audit: for the exact top-20 terms, est = min over rows of their
    cell counts. Unlike MG, CMS estimates are PARTITION-LAYOUT
    INVARIANT (a pure function of the multiset + hash), so the
    estimates themselves are emitted and hash-checked, plus the two
    structural guarantees: never-undercount (always true), and
    excess <= e*N/W (true w.p. 1-e^-4 per term; deterministic for a
    fixed corpus+hash, so the oracle replays the same booleans)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    rows = toks.select(
        "term", F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    )
    cms = (
        rows.select("r", _cms_bucket(F.col("term"), F.col("r")).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    top = tf.orderBy(F.col("true_cnt").desc(), F.col("term")).limit(CMS_TOPN)
    probes = top.select(
        "term",
        "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r"),
    ).withColumn("b", _cms_bucket(F.col("term"), F.col("r")))
    est = (
        probes.join(cms, ["r", "b"])
        .groupBy("term", "true_cnt")
        .agg(F.min("c").alias("est"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    # The e-numerator × N product overflows BIGINT past ~3.4e9 tokens
    # (trivially reached at 100 TB), so the multiply runs in
    # decimal(38,0) — same discipline as drift.py's exact TV
    # numerators — and only the floor-divided bound (<= N/188, always
    # long-ranged) comes back down to an integral value.
    bound = F.expr(
        f"CAST({_CMS_E_NUM} AS DECIMAL(19,0))"
        f" * CAST(n_tokens AS DECIMAL(19,0))"
        f" DIV CAST({10**9 * CMS_W} AS DECIMAL(19,0))"
    )
    return est.crossJoin(F.broadcast(total)).select(
        "term",
        "true_cnt",
        "est",
        "n_tokens",
        (F.col("est") >= F.col("true_cnt")).alias("never_under"),
        (F.col("est") <= F.col("true_cnt") + bound).alias("within_bound"),
    )


CMS_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tok2 AS (SELECT term FROM toks WHERE length(term) > 0),
rs AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r),
cms AS (
    SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT rs.r,
               (('0x' || substring(md5(term || ':cms:' ||
                                       CAST(rs.r AS VARCHAR)), 1, 15))::BIGINT
                % {CMS_W}) AS b
        FROM tok2 CROSS JOIN rs)
    GROUP BY r, b
),
tf AS (
    SELECT term, CAST(count(*) AS BIGINT) AS true_cnt
    FROM tok2 GROUP BY term
),
top AS (
    SELECT term, true_cnt FROM tf
    ORDER BY true_cnt DESC, term LIMIT {CMS_TOPN}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM tok2),
probes AS (
    SELECT t.term, t.true_cnt, rs.r,
           (('0x' || substring(md5(t.term || ':cms:' ||
                                   CAST(rs.r AS VARCHAR)), 1, 15))::BIGINT
            % {CMS_W}) AS b
    FROM top t CROSS JOIN rs
),
est AS (
    SELECT p.term, p.true_cnt, min(c.c) AS est
    FROM probes p JOIN cms c ON c.r = p.r AND c.b = p.b
    GROUP BY p.term, p.true_cnt
)
SELECT term, true_cnt, est, n_tokens,
       est >= true_cnt AS never_under,
       est <= true_cnt + (CAST({_CMS_E_NUM} AS HUGEINT) * n_tokens)
                           // {10**9 * CMS_W} AS within_bound
FROM est CROSS JOIN tot
"""


#: terms entering the log-log fit — bounded, and the head is where
#: Zipf's law actually holds (the tail bends; every published fit
#: truncates).
ZIPF_TOP_R = 200
#: 1e-9 quantization of ln values before the regression sums (the
#: BM25 precedent): libm ln is not IEEE-exactly specified, so the
#: raw doubles could differ in the last ulp across engines; the
#: quantized integers cannot.
_ZQ = 1_000_000_000.0


def zipf_fit_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency head: OLS of
    ln(freq) on ln(rank) for the top ``ZIPF_TOP_R`` terms. A healthy
    natural-language corpus fits slope ≈ −1 with r² near 1; template
    spam / synthetic boilerplate bends the curve — which makes the
    (slope, r²) pair a one-row corpus-health check alongside
    ``corpus_token_entropy``. (On this synthetic corpus the check
    fires as designed: the ~31-term template vocabulary is nearly
    frequency-flat — measured slope ≈ −0.16, r² ≈ 0.05 at sf0.1 —
    i.e. the corpus is detected as NON-Zipfian boilerplate.)

    Numeric discipline: each ln is quantized to 1e-9 (cross-engine
    libm safety, the BM25 precedent), and every regression sum —
    including the Σxq·yq products at ~5e19 — is carried in
    decimal(38,0)/HUGEINT per the repo-wide dec_qsum rule, so the
    sums are order-independent exact integers; the closed-form OLS
    then runs in doubles from identical inputs on both engines.

    Scale: term counting is the vocab-sized aggregate (Heaps-law
    sublinear); the top-R head arrives via TakeOrderedAndProject
    (map-side partial top-k, no global sort of the vocab); the
    regression itself sees R = 200 rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    head = tf.orderBy(
        F.col("freq").desc(), F.col("term").asc()
    ).limit(ZIPF_TOP_R)
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = head.withColumn("rank", F.row_number().over(w))
    xq = F.floor(
        F.log(F.col("rank").cast("double")) * F.lit(_ZQ) + F.lit(0.5)
    ).cast("decimal(38,0)")
    yq = F.floor(
        F.log(F.col("freq").cast("double")) * F.lit(_ZQ) + F.lit(0.5)
    ).cast("decimal(38,0)")
    sums = ranked.select(xq.alias("xq"), yq.alias("yq")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return sums.select(
        F.col("n").cast("long").alias("n_terms_fit"),
        stable_round(slope, 6).alias("zipf_slope"),
        stable_round(
            (sy - slope * sx) / (n * F.lit(_ZQ)), 6
        ).alias("intercept_ln"),
        stable_round(cov * cov / (varx * vary), 6).alias("r2"),
    )


ZIPF_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tf AS (
    SELECT term, CAST(count(*) AS BIGINT) AS freq
    FROM toks WHERE length(term) > 0 GROUP BY term
),
head AS (
    SELECT term, freq FROM tf
    ORDER BY freq DESC, term ASC LIMIT {ZIPF_TOP_R}
),
ranked AS (
    SELECT freq,
           row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
    FROM head
),
q AS (
    SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * {_ZQ} + 0.5)
                AS HUGEINT) AS xq,
           CAST(floor(ln(CAST(freq AS DOUBLE)) * {_ZQ} + 0.5)
                AS HUGEINT) AS yq
    FROM ranked
),
sums AS (
    SELECT count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
           sum(xq * yq) AS sxy, sum(xq * xq) AS sxx,
           sum(yq * yq) AS syy
    FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms_fit,
       floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
       floor((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * {_ZQ})
             * 1000000.0 + 0.5) / 1000000.0 AS intercept_ln,
       floor(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS r2
FROM sums
"""


def _register() -> None:
    registry.register("heavy_hitters_mg", heavy_hitters_mg, HEAVY_HITTERS_ORACLE)
    registry.register("count_min_sketch", count_min_sketch, CMS_ORACLE)
    registry.register("corpus_mix_weights", corpus_mix_weights, MIX_ORACLE)
    registry.register("hll_vocab_rollup", hll_vocab_rollup, HLL_ROLLUP_ORACLE)
    registry.register(
        "token_budget_allocation", token_budget_allocation, TOKEN_BUDGET_ORACLE
    )
    registry.register("corpus_token_entropy", corpus_token_entropy, ENTROPY_ORACLE)
    registry.register("crossdoc_shingle_dup", crossdoc_shingle_dup, SHINGLE_ORACLE)
    registry.register("zipf_fit_terms", zipf_fit_terms, ZIPF_ORACLE)
