"""Statistical operators: numpy cross-checks and estimator invariants.

Each kernel is attested against an INDEPENDENT local computation on the
collected sf0.001 slice — numpy least-squares for the OLS normal
equations, a brute-force pooled-CDF scan for the KS distance, and a
sequential product-limit fold for Kaplan-Meier — plus the estimator
invariants (monotone survival, risk-set telescoping) that hold at any
scale.
"""

from __future__ import annotations

import math

import numpy as np

from bigdata_pipelines_aws_glue_spark.operators.stattests import (
    kaplan_meier_repeat,
    ks_test_price,
    ols_revenue_model,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    got = ols_revenue_model(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    y = np.floor(
        li["l_extendedprice"].to_numpy(float)
        * (1.0 - li["l_discount"].to_numpy(float))
        * 100
        + 0.5
    )
    x1 = li["l_quantity"].to_numpy(float)
    x2 = np.floor(li["l_discount"].to_numpy(float) * 100 + 0.5)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got["n_rows"] == len(li)
    # lstsq (SVD) vs exact Cramer on decimal sums: agree to float noise
    # relative to the coefficient scale.
    assert abs(got["beta0_cents"] - beta[0]) < 1e-4 * max(1.0, abs(beta[0]))
    assert abs(got["beta1_per_qty"] - beta[1]) < 1e-4 * max(1.0, abs(beta[1]))
    assert abs(got["beta2_per_disc_cent"] - beta[2]) < 1e-4 * max(
        1.0, abs(beta[2])
    )
    resid = y - X @ beta
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert abs(got["r2"] - r2) < 1e-6
    assert 0.0 < got["r2"] < 1.0  # revenue ~ qty is a real signal


def test_kaplan_meier_product_limit_fold(spark, sf_dir):
    rows = sorted(
        kaplan_meier_repeat(spark, sf_dir).collect(), key=lambda r: r["t"]
    )
    assert rows, "life table must be non-empty"
    # Independent sequential fold over the same life table.
    s = 1.0
    prev_surv = 1.0 + 1e-15
    for r in rows:
        assert r["n_events"] > 0  # spine filtered to event times
        assert r["n_risk"] >= r["n_events"]
        s *= 1.0 - r["n_events"] / r["n_risk"]
        assert abs(r["survival"] - s) < 5e-6
        if r["survival"] > 0 and r["log_survival_q9"] is not None:
            assert abs(math.exp(r["log_survival_q9"]) - r["survival"]) < 5e-6
        # survival is nonincreasing in t
        assert r["survival"] <= prev_surv + 1e-12
        prev_surv = r["survival"]
    # risk set telescopes: n_risk(t_min) counts every subject whose
    # observed time >= t_min (== all subjects when t_min is the global
    # minimum observed time, which it is whenever the earliest time is
    # an event time — just sanity-bound it here).
    assert rows[0]["n_risk"] >= max(r["n_risk"] for r in rows)


def test_ks_matches_bruteforce(spark, sf_dir):
    got = ks_test_price(spark, sf_dir).collect()[0]
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    v = np.floor(od["o_totalprice"].to_numpy(float) * 100 + 0.5).astype(
        np.int64
    )
    m1 = (od["o_orderpriority"] == "1-URGENT").to_numpy()
    m2 = (od["o_orderpriority"] == "5-LOW").to_numpy()
    s1, s2 = np.sort(v[m1]), np.sort(v[m2])
    n1, n2 = len(s1), len(s2)
    assert (got["n1"], got["n2"]) == (n1, n2)
    pooled = np.unique(np.concatenate([s1, s2]))
    f1 = np.searchsorted(s1, pooled, side="right") / n1
    f2 = np.searchsorted(s2, pooled, side="right") / n2
    d = float(np.max(np.abs(f1 - f2)))
    assert abs(got["d_stat"] - d) < 1e-9
    crit = 1.3581015157406195 * math.sqrt((n1 + n2) / (n1 * n2))
    assert abs(got["crit_05"] - crit) < 1e-9
    assert got["reject_05"] == (
        round(d, 9) > round(crit, 9)
    ) or abs(d - crit) < 1e-9
