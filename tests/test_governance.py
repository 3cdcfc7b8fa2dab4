"""Semantic checks for ``operators/privacy.py`` (k-anonymity ladder)
and ``operators/optimizer_stats.py`` (join-size estimation)."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark.operators.optimizer_stats import (
    H_HEAVY,
    join_size_estimate,
)
from bigdata_pipelines_aws_glue_spark.operators.privacy import (
    K_ANON,
    k_anonymity_audit,
)


def test_ladder_is_monotone(spark, sf_dir):
    """Coarsening can only merge classes: walking up the ladder,
    class count falls, min class size rises, and the below-k residue
    shrinks — and the corpus row total is conserved at L4."""
    rows = {r.level: r for r in k_anonymity_audit(spark, sf_dir).collect()}
    order = [
        "L0_lang_source_len64",
        "L1_lang_source_len256",
        "L2_lang_source",
        "L3_lang",
        "L4_all",
    ]
    assert set(rows) == set(order)
    for fine, coarse in zip(order, order[1:]):
        assert rows[coarse].n_classes <= rows[fine].n_classes
        assert rows[coarse].min_class >= rows[fine].min_class
        assert rows[coarse].rows_below_k <= rows[fine].rows_below_k
    top = rows["L4_all"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert (top.n_classes, top.min_class) == (1, n_docs)
    assert top.rows_below_k == (n_docs if n_docs < K_ANON else 0)
    # the audit must be non-vacuous at the finest level on this corpus
    assert rows[order[0]].rows_below_k > 0


def test_join_estimates_bracket_ground_truth(spark, sf_dir):
    rows = {
        (r.key_profile, r.method): r
        for r in join_size_estimate(spark, sf_dir).collect()
    }
    for profile in ("natural", "hotkey"):
        exact = rows[(profile, "exact")]
        assert exact.rel_err == 0.0
        # exact must equal the true self-join count
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        from bigdata_pipelines_aws_glue_spark.operators.optimizer_stats import (
            _profile_key,
        )
        cnt = (
            li.select(_profile_key(profile).alias("k"))
            .groupBy("k")
            .count()
            .collect()
        )
        truth = sum(r["count"] ** 2 for r in cnt)
        assert int(exact.est_pairs) == truth
        eb = rows[(profile, f"endbiased_h{H_HEAVY}")]
        uni = rows[(profile, "uniform_ndv")]
        # the histogram may never be worse than the uniform assumption
        assert eb.rel_err <= uni.rel_err
    # the whole point: under skew the uniform estimate collapses and
    # the end-biased histogram recovers it
    assert rows[("hotkey", "uniform_ndv")].rel_err > 0.5
    assert rows[("hotkey", f"endbiased_h{H_HEAVY}")].rel_err < 0.05
