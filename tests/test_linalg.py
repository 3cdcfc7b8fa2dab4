"""Semantic checks for the linear-algebra operators against numpy
ground truth (the oracles prove cross-engine equality; these prove
the math is right)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from bigdata_pipelines_aws_glue_spark.operators.linalg import (
    correlation_matrix,
    pca_power_iteration,
)


def _np_data(sf_dir, table, cols):
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols)
    return {c: np.asarray(t[c]) for c in cols}


def test_correlation_matches_numpy(spark, sf_dir):
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    d = _np_data(sf_dir, "lineitem", cols)
    want = np.corrcoef(np.stack([d[c] for c in cols]))
    got = {
        (r.var_a, r.var_b): r.corr
        for r in correlation_matrix(spark, sf_dir).collect()
    }
    assert len(got) == 6
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            assert abs(got[(a, cols[j])] - want[i, j]) < 1e-6, (a, cols[j])


def test_pca_matches_numpy_dominant_eigenpair(spark, sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    evals, evecs = np.linalg.eigh(cov)
    lam_true, v_true = evals[-1], evecs[:, -1]

    rows = sorted(pca_power_iteration(spark, sf_dir).collect(),
                  key=lambda r: r.dim)
    v = np.array([r.component for r in rows])
    lam = rows[0].eigenvalue
    # unit eigenvector (components round at 1e-8, so norm drifts ~1e-6)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # dominant eigenvalue from 8 power rounds: within 2% of truth
    assert abs(lam - lam_true) / lam_true < 0.02
    # direction matches up to sign: |cos| close to 1
    assert abs(abs(float(v @ v_true)) - 1.0) < 0.05
