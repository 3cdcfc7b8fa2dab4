"""k-means (Lloyd's on DataFrames) convergence + determinism tests."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.similarity import (
    kmeans_fit,
    kmeans_inertia,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_kmeans_inertia_monotone_nonincreasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    inertias = [
        kmeans_inertia(emb, kmeans_fit(emb, k=4, n_iter=i)) for i in (1, 2, 4)
    ]
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-6


def test_kmeans_deterministic_and_full_coverage(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a = kmeans_fit(emb, k=4, n_iter=3)
    b = kmeans_fit(emb, k=4, n_iter=3)
    ra = sorted(
        (r["cluster_id"], r["n_assigned"], tuple(r["centroid"]))
        for r in a.collect()
    )
    rb = sorted(
        (r["cluster_id"], r["n_assigned"], tuple(r["centroid"]))
        for r in b.collect()
    )
    assert ra == rb
    assert sum(n for _, n, _ in ra) == 200  # every vector assigned
