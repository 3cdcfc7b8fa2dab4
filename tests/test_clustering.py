"""Connected-components / cluster-assignment unit tests on hand-built
graphs (chain forces multi-round propagation; singleton docs must
self-cluster)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.clustering import (
    assign_dedup_clusters,
    connected_components,
)


def test_cc_chain_triangle_and_isolated(spark):
    # chain 1-2-3-4-5 (diameter 4 -> several propagation rounds),
    # triangle 10-11-12, plus edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_assign_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in assign_dedup_clusters(docs, pairs).collect()
    }
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 9: (9, True),
    }
    kept = [d for d, (_, canon) in out.items() if canon]
    assert kept == sorted(kept)


def test_cc_label_columns_only_in_shuffle(spark):
    # the iteration state is (node, component) longs — assert the
    # output schema carries nothing else (scale guard: no payload
    # columns ride through the iterations)
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = connected_components(edges)
    assert out.columns == ["node", "component"]
    assert dict(out.dtypes) == {"node": "bigint", "component": "bigint"}
