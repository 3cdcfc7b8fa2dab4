"""Iterative graph analytics on DataFrames: weighted PageRank over
the customer–supplier trade graph (SURVEY.md §2 adjacency — the
iterative-algorithm family next to k-means/BPE; method is the public
Page et al. 1999 formulation).

Graph: an undirected bipartite graph built from the fact tables —
customer ``o_custkey`` is linked to supplier ``l_suppkey`` with
weight = number of lineitems traded between them (lineitem ⋈ orders,
grouped). Undirected means both directions are materialized as
directed edges, so every node has out-degree ≥ 1 — no dangling-mass
special case. Supplier node ids are offset by ``SUPPLIER_NODE_BASE``
to share one id space with customers.

Rank update (damping d, n nodes):
``r'(v) = (1-d)/n + d·Σ_{u→v} r(u)·w(u,v)/W(u)``
with the incoming sum 1e-9-quantized (long-summed — aggregation-order
independent, exact in both engines), which is what lets the DuckDB
twin replay all ``PR_ITERS`` rounds as unrolled CTEs and the result
hash-check despite being an iterative float algorithm.

Scale posture (100 TB): the edge list shuffles once on (cust, supp)
to aggregate weights; each iteration is an equi-join of edges against
the n-row rank table keyed by src plus a keyed aggregation on dst —
the standard Pregel-as-join shape. Rank state is checkpointed per
round to keep lineage flat (same discipline as ``kmeans_fit``). The
final top-N is TakeOrderedAndProject, never a global sort. The
single driver scalar (node count, for the teleport constant) is the
iterative-loop probe ``kmeans_fit``/``pq_train`` already model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import (
    dec_qsum,
    stable_round,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

PR_DAMP = 0.85
PR_ITERS = 5
PR_TOPN = 20
#: supplier node id = SUPPLIER_NODE_BASE + s_suppkey (customers keep
#: their key) — one integer id space, no string concat in the hot path.
SUPPLIER_NODE_BASE = 1_000_000

_Q9 = 1e9


def _trade_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(src, dst, w): both directions of the weighted bipartite graph."""
    pairs = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
    wts = pairs.groupBy("cust", "supp").agg(F.count(F.lit(1)).alias("w"))
    fwd = wts.select(
        F.col("cust").alias("src"),
        (F.col("supp") + F.lit(SUPPLIER_NODE_BASE)).alias("dst"),
        "w",
    )
    rev = wts.select(
        (F.col("supp") + F.lit(SUPPLIER_NODE_BASE)).alias("src"),
        F.col("cust").alias("dst"),
        "w",
    )
    return fwd.unionByName(rev)


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PR_TOPN`` nodes of the trade graph by weighted PageRank
    after ``PR_ITERS`` synchronous rounds. Emits the rank position,
    node type/id, and the (1e-9-deterministic) PageRank value."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = _trade_edges(lineitem, orders).localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    e = edges.join(outw, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("wout").cast("double")).alias("p"),
    )
    nodes = edges.select("src").distinct()
    n_nodes = nodes.count()
    rank = nodes.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("r")
    ).localCheckpoint(eager=True)
    teleport = (1.0 - PR_DAMP) / n_nodes
    for _ in range(PR_ITERS):
        contrib = e.join(rank, F.col("src") == F.col("node")).select(
            "dst", (F.col("r") * F.col("p")).alias("c")
        )
        rank = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(teleport)
                    + F.lit(PR_DAMP)
                    * (
                        dec_qsum(F.col("c"), _Q9).cast("double")
                        / F.lit(_Q9)
                    )
                ).alias("r")
            )
            .localCheckpoint(eager=True)
        )
    top = rank.orderBy(F.col("r").desc(), F.col("node")).limit(PR_TOPN)
    w_pos = Window.orderBy(F.col("r").desc(), F.col("node"))
    return top.withColumn("pos", F.row_number().over(w_pos)).select(
        "pos",
        F.when(F.col("node") >= SUPPLIER_NODE_BASE, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
        F.when(
            F.col("node") >= SUPPLIER_NODE_BASE,
            F.col("node") - SUPPLIER_NODE_BASE,
        )
        .otherwise(F.col("node"))
        .alias("node_id"),
        stable_round(F.col("r"), 9).alias("pagerank"),
    )


def _pr_round(i: int) -> str:
    """One unrolled PageRank round as a DuckDB CTE (replays the
    quantized-sum update bit-for-bit)."""
    return f"""r{i} AS (
    SELECT e.dst AS node,
           CAST({(1.0 - PR_DAMP)!r} AS DOUBLE) / (SELECT n FROM nn)
             + {PR_DAMP} * (sum(CAST(floor(r.r * e.p * 1000000000.0 + 0.5)
                                     AS BIGINT)) / 1000000000.0) AS r
    FROM e JOIN r{i - 1} r ON r.node = e.src
    GROUP BY e.dst
)"""


_PR_ROUNDS_SQL = ",\n".join(_pr_round(i) for i in range(1, PR_ITERS + 1))

PAGERANK_ORACLE = f"""
WITH pairs AS (
    SELECT o_custkey AS cust, l_suppkey AS supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
wts AS (
    SELECT cust, supp, CAST(count(*) AS BIGINT) AS w
    FROM pairs GROUP BY cust, supp
),
edges AS (
    SELECT cust AS src, supp + {SUPPLIER_NODE_BASE} AS dst, w FROM wts
    UNION ALL
    SELECT supp + {SUPPLIER_NODE_BASE} AS src, cust AS dst, w FROM wts
),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src),
e AS (
    SELECT src, dst, CAST(w AS DOUBLE) / CAST(wout AS DOUBLE) AS p
    FROM edges JOIN outw USING (src)
),
nn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM edges),
r0 AS (
    SELECT DISTINCT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM edges
),
{_PR_ROUNDS_SQL}
SELECT CAST(pos AS INT) AS pos,
       CASE WHEN node >= {SUPPLIER_NODE_BASE} THEN 'supplier'
            ELSE 'customer' END AS node_type,
       CASE WHEN node >= {SUPPLIER_NODE_BASE}
            THEN node - {SUPPLIER_NODE_BASE} ELSE node END AS node_id,
       floor(r * 1000000000.0 + 0.5) / 1000000000.0 AS pagerank
FROM (
    SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS pos
    FROM r{PR_ITERS}
)
WHERE pos <= {PR_TOPN}
"""


def _register() -> None:
    registry.register(
        "pagerank_trade_graph", pagerank_trade_graph, PAGERANK_ORACLE
    )
