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
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
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


#: Bloom filter geometry: m = 2^17 bits, k = 4 double-hashed probes.
#: At sf0.1 (~10k inserted keys) the load kn/m ≈ 0.3 ⇒ theoretical
#: FPR ≈ 0.5%; the bits table is bounded by m rows at ANY corpus
#: scale, which is the whole point of the structure.
BLOOM_M = 1 << 17
BLOOM_K = 4
#: shifts probe keys into a domain disjoint from any custkey, giving
#: guaranteed non-members to measure the false-positive rate on
_BLOOM_PROBE_OFFSET = 10_000_000


def _bloom_h(key, tag: str, mod: int):
    """60-bit md5-prefix hash mod ``mod`` — the repo's cross-engine
    mixing hash (same construction as sampling.shuffle_key)."""
    s = F.concat(key.cast("string"), F.lit(f":{tag}"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(mod)
    )


def _bloom_h_sql(key_expr: str, tag: str, mod: int) -> str:
    return (
        f"(('0x' || substring(md5(CAST({key_expr} AS VARCHAR) || "
        f"':{tag}'), 1, 15))::BIGINT % {mod})"
    )


def _bloom_positions(df: DataFrame, key: str) -> DataFrame:
    """(key, pos) pairs — the k Kirsch-Mitzenmacher double-hashed bit
    positions (h1 + i·h2) mod m, h2 forced odd so the probe walk hits
    distinct residues mod the power-of-two m."""
    h1 = _bloom_h(F.col(key), "bf1", BLOOM_M)
    h2 = _bloom_h(F.col(key), "bf2", BLOOM_M // 2) * 2 + 1
    return (
        df.select(F.col(key), h1.alias("h1"), h2.alias("h2"))
        .select(
            key,
            F.explode(
                F.sequence(F.lit(0), F.lit(BLOOM_K - 1))
            ).alias("i"),
            "h1",
            "h2",
        )
        .select(
            key,
            ((F.col("h1") + F.col("i") * F.col("h2")) % BLOOM_M).alias(
                "pos"
            ),
        )
        .distinct()
    )


def _bloom_pos_sql(src: str, key_expr: str, alias: str) -> str:
    h1 = _bloom_h_sql(key_expr, "bf1", BLOOM_M)
    h2 = f"({_bloom_h_sql(key_expr, 'bf2', BLOOM_M // 2)} * 2 + 1)"
    return f"""
{alias} AS (
    SELECT DISTINCT {key_expr} AS key,
           ({h1} + i * {h2}) % {BLOOM_M} AS pos
    FROM {src}, generate_series(0, {BLOOM_K - 1}) t(i)
)"""


def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter membership sketch — the one classical mergeable
    structure the HLL/GK/MG/CMS/theta/KLL family didn't yet cover.
    Builds a filter over the customers who have ordered (distinct
    o_custkey), probes every c_custkey PLUS the same keys shifted by
    a disjoint offset (this corpus leaves almost no customer
    order-less, so the shifted copies supply guaranteed non-members —
    the double-ingestion pattern dedup_exact uses), and emits the
    audit row: exact member / positive / false-positive counts,
    measured FPR, theoretical FPR (1−e^{-kn/m})^k, and the
    structural no-false-negatives guarantee.

    Everything is deterministic — the bit positions are md5-derived,
    so BOTH engines build the identical bitmap and every output
    (including n_false_positives) hash-checks exactly; no tolerance
    booleans needed, unlike the theta/KLL estimates.

    100 TB shape: building = one distinct over (pos) bounded by m
    rows regardless of corpus size (per-partition partial distinct
    does the heavy lifting map-side — Bloom bitmaps OR-merge, and a
    distinct-on-position set IS that OR); probing joins against the
    m-bounded bits table (size-gated broadcast). The driver never
    sees the bitmap."""
    from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = orders.select(
        F.col("o_custkey").cast("long").alias("key")
    ).distinct()
    bits = _bloom_positions(members, "key").select("pos").distinct()
    ckeys = cust.select(F.col("c_custkey").cast("long").alias("key"))
    probe_keys = ckeys.unionByName(
        ckeys.select((F.col("key") + _BLOOM_PROBE_OFFSET).alias("key"))
    )
    probe = _bloom_positions(probe_keys, "key")
    hits = (
        probe.join(
            maybe_broadcast(bits.withColumn("hit", F.lit(1))),
            "pos",
            "left",
        )
        .groupBy("key")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("all_hit"))
    )
    classified = hits.join(
        members.withColumn("is_member", F.lit(True)), "key", "left"
    ).select(
        "key",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
        (F.col("all_hit") == 1).alias("positive"),
    )
    agg = classified.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("n_members"),
        F.sum(F.col("positive").cast("long")).alias("n_positives"),
        F.sum(
            (F.col("positive") & ~F.col("is_member")).cast("long")
        ).alias("n_false_positives"),
        F.sum(
            (F.col("is_member") & ~F.col("positive")).cast("long")
        ).alias("n_false_negatives"),
    )
    return agg.select(
        F.lit(BLOOM_M).cast("long").alias("m_bits"),
        F.lit(BLOOM_K).cast("int").alias("k_hashes"),
        F.col("n_probes").cast("long"),
        F.col("n_members").cast("long").alias("n_inserted"),
        F.col("n_positives").cast("long"),
        F.col("n_false_positives").cast("long"),
        (F.col("n_false_negatives") == 0).alias("no_false_negatives"),
        stable_round(
            F.col("n_false_positives")
            / F.greatest(
                F.col("n_probes") - F.col("n_members"), F.lit(1)
            ),
            6,
        ).alias("fpr_measured"),
        stable_round(
            F.pow(
                F.lit(1.0)
                - F.exp(
                    -F.lit(float(BLOOM_K))
                    * F.col("n_members")
                    / F.lit(float(BLOOM_M))
                ),
                F.lit(float(BLOOM_K)),
            ),
            6,
        ).alias("fpr_theory"),
    )


BLOOM_ORACLE = f"""
WITH members AS (
    SELECT DISTINCT CAST(o_custkey AS BIGINT) AS key FROM orders
),
{_bloom_pos_sql('members', 'key', 'mpos').lstrip()},
bits AS (SELECT DISTINCT pos FROM mpos),
cust AS (
    SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
    UNION ALL
    SELECT CAST(c_custkey AS BIGINT) + 10_000_000 FROM customer
),
{_bloom_pos_sql('cust', 'key', 'ppos').lstrip()},
hits AS (
    SELECT p.key,
           min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_hit
    FROM ppos p LEFT JOIN bits b ON p.pos = b.pos
    GROUP BY p.key
),
classified AS (
    SELECT h.key,
           m.key IS NOT NULL AS is_member,
           h.all_hit = 1 AS positive
    FROM hits h LEFT JOIN members m ON h.key = m.key
),
agg AS (
    SELECT count(*) AS n_probes,
           sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS n_members,
           sum(CASE WHEN positive THEN 1 ELSE 0 END) AS n_positives,
           sum(CASE WHEN positive AND NOT is_member THEN 1 ELSE 0 END)
               AS n_false_positives,
           sum(CASE WHEN is_member AND NOT positive THEN 1 ELSE 0 END)
               AS n_false_negatives
    FROM classified
)
SELECT CAST({BLOOM_M} AS BIGINT) AS m_bits,
       CAST({BLOOM_K} AS INT) AS k_hashes,
       CAST(n_probes AS BIGINT) AS n_probes,
       CAST(n_members AS BIGINT) AS n_inserted,
       CAST(n_positives AS BIGINT) AS n_positives,
       CAST(n_false_positives AS BIGINT) AS n_false_positives,
       n_false_negatives = 0 AS no_false_negatives,
       floor((n_false_positives /
              greatest(n_probes - n_members, 1)) * 1000000.0 + 0.5)
         / 1000000.0 AS fpr_measured,
       floor(pow(1.0 - exp(-{BLOOM_K}.0 * n_members / {BLOOM_M}.0),
                 {BLOOM_K}.0) * 1000000.0 + 0.5)
         / 1000000.0 AS fpr_theory
FROM agg
"""


def _register() -> None:
    registry.register("theta_set_algebra", theta_set_algebra, THETA_ORACLE)
    registry.register("kll_quantile_merge", kll_quantile_merge, KLL_ORACLE)
    registry.register("approx_top_terms", approx_top_terms, APPROX_TOP_ORACLE)
    registry.register(
        "bloom_membership_audit", bloom_membership_audit, BLOOM_ORACLE
    )
