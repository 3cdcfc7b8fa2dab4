"""DataSketches surface that landed in Spark 4.1: theta sketches
(distinct-count SET ALGEBRA — the capability HLL fundamentally lacks)
and KLL quantile sketches (mergeable rank estimation). Together with
the existing HLL / GK / Misra-Gries / Count-Min queries this
completes the mergeable-sketch family — the canonical 100 TB shape:
per-partition (here per-group) sketches combine associatively, so
the full corpus is never rescanned to answer a new rollup.

Attestation follows the HLL playbook: EXACT counts are hash-checked
against DuckDB, and the sketch estimates are asserted within
published error tolerances as booleans the oracle pins TRUE (sketch
binaries themselves are not cross-engine-replayable — DuckDB has no
DataSketches — which is exactly why the contract is
exact-plus-tolerance, not value equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: theta default lgK=12 ⇒ relative error ~1/sqrt(2^12) ≈ 1.6% per
#: sketch; set operations compound it, so the audit allows 5% (and
#: below ~4096 retained entries theta is in its exact regime anyway —
#: true at sf0.01, not at sf1+, which is what the tolerance is for).
THETA_TOL = 0.05
PRIO_A, PRIO_B = "1-URGENT", "5-LOW"


def theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-key set algebra between two order priorities:
    exact |A|, |B|, |A∪B|, |A∩B|, |A∖B| (hash-checked) plus theta
    union/intersection/difference estimates asserted within
    ``THETA_TOL``. The sketches build in ONE pass over the fact join
    (map-side partials), combine as scalars, and would merge
    identically from per-partition pieces at any scale — while the
    exact intersection needs a full distinct-key shuffle, which is
    the cost theta exists to avoid."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    keyed = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).filter(F.col("o_orderpriority").isin(PRIO_A, PRIO_B)).select(
        "o_orderpriority", "l_partkey"
    )
    flags = keyed.groupBy("l_partkey").agg(
        F.max((F.col("o_orderpriority") == PRIO_A).cast("int")).alias("a"),
        F.max((F.col("o_orderpriority") == PRIO_B).cast("int")).alias("b"),
    )
    exact = flags.agg(
        F.sum("a").cast("long").alias("exact_a"),
        F.sum("b").cast("long").alias("exact_b"),
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("exact_inter"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("exact_diff"),
    )
    sk = keyed.groupBy("o_orderpriority").agg(
        F.expr("theta_sketch_agg(l_partkey)").alias("sk")
    )
    two = (
        sk.groupBy()
        .pivot("o_orderpriority", [PRIO_A, PRIO_B])
        .agg(F.first("sk"))
        .withColumnRenamed(PRIO_A, "ska")
        .withColumnRenamed(PRIO_B, "skb")
    )
    ests = two.select(
        F.expr("theta_sketch_estimate(ska)").alias("est_a"),
        F.expr("theta_sketch_estimate(skb)").alias("est_b"),
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias(
            "est_union"
        ),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").alias(
            "est_inter"
        ),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").alias(
            "est_diff"
        ),
    )

    # Set-operation error scales with the SKETCH cardinalities (the
    # union), NOT the result: |A\B| can be tiny while each sketch
    # carries ~1.6% noise of ~|A| — so intersection/difference
    # booleans bound against the union size (the published analysis:
    # set-op error is a small multiple of single-sketch error
    # relative to the union), while per-set estimates bound against
    # their own exact counts.
    def ok(est, exact, scale):
        return (
            F.abs(F.col(est) - F.col(exact))
            <= F.lit(THETA_TOL)
            * F.greatest(F.col(scale), F.lit(1).cast("long"))
        ).alias(f"{est}_ok")

    return exact.crossJoin(F.broadcast(ests)).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        "exact_diff",
        ok("est_a", "exact_a", "exact_a"),
        ok("est_b", "exact_b", "exact_b"),
        ok("est_union", "exact_union", "exact_union"),
        ok("est_inter", "exact_inter", "exact_union"),
        ok("est_diff", "exact_diff", "exact_union"),
    )


THETA_ORACLE = f"""
WITH keyed AS (
    SELECT o_orderpriority, l_partkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority IN ('{PRIO_A}', '{PRIO_B}')
),
flags AS (
    SELECT l_partkey,
           max(CASE WHEN o_orderpriority = '{PRIO_A}' THEN 1 ELSE 0 END) AS a,
           max(CASE WHEN o_orderpriority = '{PRIO_B}' THEN 1 ELSE 0 END) AS b
    FROM keyed GROUP BY l_partkey
)
SELECT CAST(sum(a) AS BIGINT) AS exact_a,
       CAST(sum(b) AS BIGINT) AS exact_b,
       CAST(count(*) AS BIGINT) AS exact_union,
       CAST(sum(a * b) AS BIGINT) AS exact_inter,
       CAST(sum(a * (1 - b)) AS BIGINT) AS exact_diff,
       TRUE AS est_a_ok,
       TRUE AS est_b_ok,
       TRUE AS est_union_ok,
       TRUE AS est_inter_ok,
       TRUE AS est_diff_ok
FROM flags
"""


#: KLL default k=200 ⇒ single-sided normalized rank error ~1.65% at
#: 99% confidence; 3% keeps merge compounding inside the audit.
KLL_RANK_TOL = 0.03
KLL_QS = (0.25, 0.5, 0.75, 0.9)


def kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: one KLL sketch of ``o_totalprice`` PER
    ORDER-YEAR, then ``kll_sketch_merge`` folds the per-year sketches
    into a corpus sketch — the pre-aggregated-rollup shape (daily
    sketches answering any ad-hoc span without rescanning the fact).
    For each probe quantile the merged sketch's estimate is converted
    back to an EXACT rank (one count pass), and the audit asserts
    |rank − q| ≤ ``KLL_RANK_TOL`` — the estimate's accuracy is
    attested against ground truth, not against another sketch."""
    orders = load_table(spark, sf_dir, "orders")
    per_year = orders.groupBy(F.year("o_orderdate").alias("y")).agg(
        F.expr("kll_sketch_agg_double(o_totalprice)").alias("sk")
    )
    merged = per_year.agg(
        F.expr("kll_merge_agg_double(sk)").alias("msk"),
        F.count(F.lit(1)).alias("n_years"),
    )
    probes = merged.select(
        "n_years",
        *[
            F.expr(f"kll_sketch_get_quantile_double(msk, {q}d)").alias(
                f"est_{int(q * 100)}"
            )
            for q in KLL_QS
        ],
    )
    n = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    j = orders.crossJoin(F.broadcast(probes))
    ranks = j.agg(
        *[
            (
                F.sum(
                    (F.col("o_totalprice") <= F.col(f"est_{int(q * 100)}"))
                    .cast("long")
                )
                .cast("double")
                .alias(f"rank_{int(q * 100)}")
            )
            for q in KLL_QS
        ],
        F.first("n_years").alias("n_years"),
    )
    out = ranks.crossJoin(F.broadcast(n))
    cols = [F.col("n_orders"), F.col("n_years").cast("int").alias("n_years")]
    for q in KLL_QS:
        r = F.col(f"rank_{int(q * 100)}") / F.col("n_orders")
        cols.append(
            (F.abs(r - F.lit(q)) <= F.lit(KLL_RANK_TOL)).alias(
                f"q{int(q * 100)}_rank_ok"
            )
        )
    return out.select(*cols)


KLL_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT year(o_orderdate)) AS INT) AS n_years,
       {", ".join(f"TRUE AS q{int(q * 100)}_rank_ok" for q in KLL_QS)}
FROM orders
"""


def approx_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in frequent-items sketch (``approx_top_k``, Spark
    4.1) against ground truth, per language: every term whose exact
    count is STRICTLY above the 5th-highest count must appear in the
    estimated top-10 (strict-above threshold sidesteps tie
    nondeterminism — the same robustness trick as the MG guarantee
    booleans in ``heavy_hitters_mg``, which is the hand-built form of
    this operator). Exact counts hash-check; the containment boolean
    pins the sketch."""
    from bigdata_pipelines_aws_glue_spark.operators.dedup import _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    counts = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("term")
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    c5 = ranked.filter(F.col("rn") == 5).select(
        "lang", F.col("c").alias("c5")
    )
    strict = (
        counts.join(c5, "lang")
        .filter(F.col("c") > F.col("c5"))
        .select("lang", "term", "c5")
    )
    est = toks.groupBy("lang").agg(
        F.expr("approx_top_k(term, 10)").alias("topk")
    )
    est_items = est.select(
        "lang", F.transform("topk", lambda s: s["item"]).alias("items")
    )
    found = (
        strict.join(est_items, "lang")
        .select(
            "lang",
            "c5",
            F.array_contains(F.col("items"), F.col("term")).alias("hit"),
        )
        .groupBy("lang")
        .agg(
            F.first("c5").alias("count_5th"),
            F.count(F.lit(1)).alias("n_strict_top"),
            F.min("hit").alias("all_strict_top_found"),
        )
    )
    totals = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.max("c").alias("max_count"),
    )
    return totals.join(found, "lang", "left").select(
        "lang",
        "vocab_size",
        "max_count",
        F.coalesce("count_5th", F.lit(None)).alias("count_5th"),
        F.coalesce("n_strict_top", F.lit(0)).alias("n_strict_top"),
        F.coalesce("all_strict_top_found", F.lit(True)).alias(
            "all_strict_top_found"
        ),
    )


APPROX_TOP_ORACLE = """
WITH toks AS (
    SELECT lang, unnest(string_split(trim(text), ' ')) AS term
    FROM documents
),
counts AS (
    SELECT lang, term, CAST(count(*) AS BIGINT) AS c
    FROM toks WHERE length(term) > 0 GROUP BY lang, term
),
ranked AS (
    SELECT lang, c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY c DESC, term) AS rn
    FROM counts
),
c5 AS (SELECT lang, c AS c5 FROM ranked WHERE rn = 5),
strict AS (
    SELECT counts.lang, counts.c5n AS c5, term FROM (
        SELECT counts.*, c5.c5 AS c5n
        FROM counts JOIN c5 ON counts.lang = c5.lang) counts
    WHERE c > c5n
)
SELECT t.lang,
       CAST(t.vocab_size AS BIGINT) AS vocab_size,
       t.max_count,
       s.c5 AS count_5th,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_strict_top,
       TRUE AS all_strict_top_found
FROM (
    SELECT lang, count(*) AS vocab_size, max(c) AS max_count
    FROM counts GROUP BY lang) t
LEFT JOIN (
    SELECT lang, max(c5) AS c5, count(*) AS n FROM strict GROUP BY lang) s
  ON t.lang = s.lang
"""


def _register() -> None:
    registry.register("theta_set_algebra", theta_set_algebra, THETA_ORACLE)
    registry.register("kll_quantile_merge", kll_quantile_merge, KLL_ORACLE)
    registry.register("approx_top_terms", approx_top_terms, APPROX_TOP_ORACLE)
