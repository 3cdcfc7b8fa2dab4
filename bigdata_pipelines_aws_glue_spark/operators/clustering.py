"""Duplicate-cluster assignment ([north-star] N2 completion,
BASELINE.json:6): near-dup candidate PAIRS are only half the job — a
real curation pipeline must group pairs into clusters and elect one
canonical document per cluster. This is connected components over the
similarity graph.

Spark-first design: iterative min-label propagation on DataFrames.
Each round is one self-contained stage pair (join labels to the
symmetric edge list, groupBy-min, least() merge); lineage is truncated
every round with ``localCheckpoint`` so the plan doesn't grow
unboundedly (the classic iterative-Spark failure mode). Rounds needed
= graph diameter; LSH/Jaccard duplicate graphs are near-cliques
(diameter 2-3 in practice), so this settles in a handful of shuffles.
For adversarially chainy graphs the O(log n)-round alternating
large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond") is the drop-in upgrade; the label
state here is already (node, component) so the swap is local.

The cluster assignment is oracle-checked end-to-end: DuckDB computes
the same components via a recursive transitive-closure CTE over the
identical Jaccard pair list.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.operators.dedup import (
    NGRAM_JACCARD_ORACLE,
    ngram_jaccard_pairs,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: checkpointed Jaccard pair sets keyed on (applicationId, sf_dir,
#: threshold) — ``dedup_clusters`` and ``dedup_clusters_star`` consume
#: the IDENTICAL pair list (that identity is the point of the
#: cross-algorithm attestation), so within one driver session the
#: expensive shingle self-join runs once, not once per CC algorithm
#: (VERDICT r11 #6). Keying on applicationId makes a stale entry from
#: a stopped session unreachable rather than wrongly reused.
_PAIR_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def jaccard_pairs_checkpointed(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> DataFrame:
    """The shared, lineage-truncated Jaccard>=threshold pair stage.
    ``localCheckpoint(eager=True)`` both caps the iterative-CC plan
    growth and materializes the pair blocks once for every consumer
    in the session."""
    key = (
        spark.sparkContext.applicationId,
        os.path.normpath(sf_dir),
        threshold,
    )
    df = _PAIR_CACHE.get(key)
    if df is None:
        docs = load_table(spark, sf_dir, "documents")
        df = ngram_jaccard_pairs(docs, threshold=threshold).localCheckpoint(
            eager=True
        )
        _PAIR_CACHE[key] = df
    return df


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation: every node converges to the smallest node
    id reachable from it. Returns (node, component).

    Each iteration shuffles (node, component) pairs only — never
    payload columns — so the per-round cost at 100 TB is bounded by
    |V| + |E| longs, not document bytes. Convergence is detected with
    a limit(1) existence probe (no full count over the label table).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("comp", F.col("u"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("comp")), "v"
            )
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("node"), F.col("comp").alias("component")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the O(log n)-
    round upgrade the min-label-propagation docstring above points
    at: label propagation needs DIAMETER rounds (a 512-node chain
    needs 511), star contraction collapses the same chain in ~log
    rounds. Each round is two groupBy-min passes over (node, nbr)
    pairs; per-round shuffle volume is |E| longs.

    large-star: every node connects its LARGER neighbors to the
    minimum of its closed neighborhood; small-star: every node (under
    larger->smaller edge orientation) connects its smaller-or-equal
    closed neighborhood to its minimum. Converged when the edge set
    is a star forest (large-star is then a no-op); labels read off
    the stars, with roots labeling themselves.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        directed = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = (
            directed.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        )
        j = directed.join(m, "u")
        relink = j.select(F.col("v").alias("u"), F.col("m").alias("v"))
        self_edge = m.select("u", F.col("m").alias("v"))
        return (
            relink.union(self_edge)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    base = e.distinct().localCheckpoint(eager=True)
    cur = base
    n_cur = cur.count()
    converged = n_cur == 0
    for _ in range(max_iter):
        if converged:
            break
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        # cheap count gate first (both sides are checkpointed and
        # distinct, so equal sets iff equal counts AND one-sided
        # containment) — the exceptAll co-group only runs on the
        # final converged round
        converged = n_nxt == n_cur and (
            nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur, n_cur = nxt, n_nxt
    if not converged:
        # loud failure (ADVICE r11): labels read off a non-star edge
        # set would be silently wrong components.
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"max_iter={max_iter} rounds ({n_cur} edges remaining); "
            f"raise max_iter — rounds needed are O(log n)"
        )
    # star forest: every edge is (node, root). Roots label themselves.
    # NB: nodes derive from the CHECKPOINTED edge set — deriving from
    # `e` would re-execute the (possibly expensive) upstream pair
    # lineage a second time (measured on dedup_clusters_star: the
    # Jaccard pair plan re-ran just to list vertices).
    nodes = (
        base.select("u")
        .union(base.select(F.col("v").alias("u")))
        .distinct()
    )
    labels = cur.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.join(labels, "u", "left")
        .select(
            F.col("u").alias("node"),
            F.least(
                F.coalesce("component", F.col("u")), F.col("u")
            ).alias("component"),
        )
    )


def assign_dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Every document gets a cluster id (= min doc_id of its component;
    singletons cluster with themselves) and a canonical flag. Keep rows
    where ``is_canonical`` to materialize the deduplicated corpus."""
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        docs.join(
            comp.select(F.col("node").alias(id_col), F.col("component")),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 end-to-end: Jaccard>=0.8 pairs -> connected components ->
    per-document cluster assignment + canonical election."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_checkpointed(spark, sf_dir, threshold=0.8)
    return assign_dedup_clusters(docs, pairs)


# DuckDB twin: recursive transitive closure over the SAME pair list
# (the UNION recursion is set-semantics, so it terminates), then
# component = min reachable id. Fine at oracle scale; the Spark side
# is the one that has to survive 100 TB.
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({NGRAM_JACCARD_ORACLE}),
sym AS MATERIALIZED (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
comp AS (
    SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` computed by the OTHER algorithm — star
    contraction instead of label propagation — and attested against
    the IDENTICAL recursive-closure oracle (cross-algorithm
    attestation, the allpairs-vs-inverted-index pattern): same pair
    list, same (doc_id, cluster_id, is_canonical) contract, so a hash
    match on both proves the two distributed CC algorithms agree with
    the sequential closure. At 100 TB this is the variant to run on
    graphs whose diameter is NOT clique-like (provenance chains,
    citation paths): rounds scale with log n, not diameter."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_checkpointed(spark, sf_dir, threshold=0.8)
    comp = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return docs.join(
        comp.select(F.col("node").alias("doc_id"), F.col("component")),
        "doc_id",
        "left",
    ).select(
        F.col("doc_id"),
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        (F.coalesce("component", F.col("doc_id")) == F.col("doc_id")).alias(
            "is_canonical"
        ),
    )


def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-family N2 completion (r11): the Hamming<=3 pair list
    from ``dedup_simhash_hamming`` grouped into connected components
    with canonical election — the integer-exact mirror of
    ``dedup_clusters`` (whose pairs carry a float Jaccard threshold).
    Same label-propagation core; the pair stage is the df-capped
    Manku block equi-join, so the whole path stays sub-quadratic."""
    from bigdata_pipelines_aws_glue_spark.operators.dedup import (
        dedup_simhash_hamming,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_simhash_hamming(spark, sf_dir).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    return assign_dedup_clusters(docs, pairs)


def _simhash_clusters_oracle() -> str:
    from bigdata_pipelines_aws_glue_spark.operators.dedup import (
        SIMHASH_HAMMING_ORACLE,
    )

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({SIMHASH_HAMMING_ORACLE}),
sym AS MATERIALIZED (
    SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
    UNION
    SELECT doc_id_b AS u, doc_id_a AS v FROM pairs
),
reach(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
comp AS (
    SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def corpus_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's acceptance report: per language, corpus
    size before dedup, after near-dup clustering, and the dedup rate.
    One pass over documents + the cluster assignment join."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    clusters = assign_dedup_clusters(docs, pairs)
    return (
        docs.join(clusters, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_canonical").cast("bigint")).alias("n_kept"),
            (
                F.count(F.lit(1)) - F.sum(F.col("is_canonical").cast("bigint"))
            ).alias("n_dropped"),
        )
    )


CURATION_SUMMARY_ORACLE = f"""
WITH clusters AS ({DEDUP_CLUSTERS_ORACLE})
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
GROUP BY d.lang
"""


def _register() -> None:
    registry.register("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE)
    registry.register(
        "dedup_simhash_clusters",
        dedup_simhash_clusters,
        _simhash_clusters_oracle(),
    )
    registry.register(
        "dedup_clusters_star", dedup_clusters_star, DEDUP_CLUSTERS_ORACLE
    )
    registry.register(
        "corpus_curation_summary",
        corpus_curation_summary,
        CURATION_SUMMARY_ORACLE,
    )
