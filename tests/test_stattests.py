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
    chi2_independence_docs,
    kaplan_meier_repeat,
    ks_test_price,
    mann_whitney_orders,
    ols_revenue_model,
    welch_t_test,
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


def _two_samples(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    v = np.floor(od["o_totalprice"].to_numpy(float) * 100 + 0.5).astype(
        np.int64
    )
    return (
        v[(od["o_orderpriority"] == "1-URGENT").to_numpy()],
        v[(od["o_orderpriority"] == "5-LOW").to_numpy()],
    )


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    got = mann_whitney_orders(spark, sf_dir).collect()[0]
    s1, s2 = _two_samples(spark, sf_dir)
    n1, n2 = len(s1), len(s2)
    pooled = np.concatenate([s1, s2])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), dtype=float)
    # average ranks for ties
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
        i = j
    r1 = float(ranks[:n1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    _, tie_counts = np.unique(pooled, return_counts=True)
    tie_term = float((tie_counts.astype(np.float64) ** 3 - tie_counts).sum())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["u1"] - u1) < 1e-6
    assert abs(got["z_stat"] - z) < 1e-8


def test_welch_matches_numpy(spark, sf_dir):
    got = welch_t_test(spark, sf_dir).collect()[0]
    s1, s2 = _two_samples(spark, sf_dir)
    m1, m2 = s1.mean(), s2.mean()
    v1, v2 = s1.var(ddof=1), s2.var(ddof=1)
    se1, se2 = v1 / len(s1), v2 / len(s2)
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (
        se1**2 / (len(s1) - 1) + se2**2 / (len(s2) - 1)
    )
    assert abs(got["mean1_dollars"] - m1 / 100) < 1e-3
    assert abs(got["mean2_dollars"] - m2 / 100) < 1e-3
    assert abs(got["t_stat"] - t) < 1e-8
    assert abs(got["df_welch"] - df) < 0.01


def test_chi2_independence_matches_pandas(spark, sf_dir):
    import pandas as pd

    got = chi2_independence_docs(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source"
    ).toPandas()
    ct = pd.crosstab(docs["lang"], docs["source"])
    obs = ct.to_numpy(float)
    rt = obs.sum(axis=1, keepdims=True)
    colt = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = rt @ colt / n
    chi2 = float(((obs - e) ** 2 / e).sum())
    r, c = obs.shape
    assert got["n_docs"] == int(n)
    assert (got["n_langs"], got["n_sources"]) == (r, c)
    assert got["dof"] == (r - 1) * (c - 1)
    assert abs(got["chi2"] - chi2) < 1e-4
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    assert abs(got["cramers_v"] - v) < 1e-8
    assert 0.0 <= got["cramers_v"] <= 1.0


def test_conformal_interval_python_replay(spark, sf_dir):
    """Full replay: hashlib split, numpy-Cramer fit on train, exact
    order-statistic quantile on calibration, coverage on test — plus
    the conformal finite-sample guarantee itself."""
    import hashlib

    from bigdata_pipelines_aws_glue_spark.operators.stattests import (
        _CONF_ALPHA,
        _CONF_CAL_HI,
        _CONF_MOD,
        _CONF_SEED,
        _CONF_TRAIN_HI,
        conformal_interval_orders,
    )

    got = conformal_interval_orders(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice",
    ).toPandas()
    u = np.array(
        [
            int(
                hashlib.md5(
                    f"{ok}|{ln}:{_CONF_SEED}".encode()
                ).hexdigest()[:15],
                16,
            )
            % _CONF_MOD
            for ok, ln in zip(li["l_orderkey"], li["l_linenumber"])
        ]
    )
    y = np.floor(
        li["l_extendedprice"].to_numpy(float)
        * (1.0 - li["l_discount"].to_numpy(float))
        * 100
        + 0.5
    )
    x1 = li["l_quantity"].to_numpy(float)
    x2 = np.floor(li["l_discount"].to_numpy(float) * 100 + 0.5)
    train = u < _CONF_TRAIN_HI
    cal = (u >= _CONF_TRAIN_HI) & (u < _CONF_CAL_HI)
    test = u >= _CONF_CAL_HI
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X[train], y[train], rcond=None)

    def scores(mask):
        resid = y[mask] - X[mask] @ beta
        return np.abs(np.floor(resid + 0.5)).astype(np.int64)

    s_cal = np.sort(scores(cal))
    k = math.ceil((len(s_cal) + 1) * (1 - _CONF_ALPHA))
    q = int(s_cal[k - 1])
    cov = float((scores(test) <= q).mean())

    assert (got["n_train"], got["n_cal"], got["n_test"]) == (
        int(train.sum()), int(cal.sum()), int(test.sum()),
    )
    # betas come from different algorithms (SVD vs Cramer) — residual
    # cents round identically except at exact .5 boundaries, so allow
    # q to differ by a cent and coverage by a few test points.
    assert abs(got["q_dollars"] - q / 100) < 0.02
    assert abs(got["coverage"] - cov) < 1e-3
    # the split-conformal finite-sample guarantee (and its upper
    # companion, which holds for continuous scores up to ties)
    assert got["coverage"] >= 1 - _CONF_ALPHA - 3e-3
    assert got["coverage"] <= 1 - _CONF_ALPHA + 2e-2


def test_logrank_python_replay(spark, sf_dir):
    """Independent sequential replay of the Mantel-Cox O-E/variance
    accumulation over the pooled life table."""
    from collections import defaultdict

    from bigdata_pipelines_aws_glue_spark.operators.stattests import (
        _LOGRANK_G1,
        _LOGRANK_G2,
        logrank_segments,
    )

    got = logrank_segments(spark, sf_dir).collect()[0]
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).toPandas()
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    seg = dict(zip(cu["c_custkey"], cu["c_mktsegment"]))
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    horizon = od["o_orderdate"].max()
    subj = []
    for ck, grp in od.groupby("o_custkey"):
        s = seg.get(ck)
        if s not in (_LOGRANK_G1, _LOGRANK_G2):
            continue
        ds = grp["o_orderdate"].tolist()
        if len(ds) >= 2:
            subj.append((s == _LOGRANK_G1, (ds[1] - ds[0]).days, 1))
        else:
            subj.append((s == _LOGRANK_G1, (horizon - ds[0]).days, 0))
    spine = defaultdict(lambda: [0, 0, 0, 0])  # d1,d2,a1,a2
    for g1, t, ev in subj:
        row = spine[t]
        row[0] += ev and g1
        row[1] += ev and not g1
        row[2] += g1
        row[3] += not g1
    o1 = e1q = vq = 0
    times = sorted(spine)
    for i, t in enumerate(times):
        d1 = spine[t][0]
        d2 = spine[t][1]
        if d1 + d2 == 0:
            continue
        n1 = sum(spine[u][2] for u in times[i:])
        n2 = sum(spine[u][3] for u in times[i:])
        dt, nt = d1 + d2, n1 + n2
        o1 += d1
        e1q += math.floor(dt * n1 / nt * 1e9 + 0.5)
        if nt > 1:
            vq += math.floor(
                dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1) * 1e9
                + 0.5
            )
    z = (o1 - e1q / 1e9) / math.sqrt(vq / 1e9)
    assert got["o1"] == o1
    assert abs(got["e1"] - e1q / 1e9) < 2e-6
    assert abs(got["z_stat"] - z) < 1e-8
    assert abs(got["chi2_1dof"] - z * z) < 1e-5


def test_table_checksum_detects_any_change(spark, sf_dir):
    """The checksum must move under a 1-cent change to one row and be
    invariant to row order (it is a commutative sum)."""
    from bigdata_pipelines_aws_glue_spark.operators.quality import (
        _CKSUM_MOD,
        table_checksum_audit,
    )

    rows = {r["table_name"]: r for r in
            table_checksum_audit(spark, sf_dir).collect()}
    assert set(rows) == {"orders", "lineitem", "customer"}
    for r in rows.values():
        assert 0 <= r["checksum"] < _CKSUM_MOD
        assert r["n_rows"] > 0

    # independent replay for customer + tamper sensitivity
    import hashlib

    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"
    ).toPandas()

    def h(row, tamper=0):
        cents = math.floor(row.c_acctbal * 100 + 0.5) + tamper
        s = f"{row.c_custkey}|{row.c_mktsegment}|{row.c_nationkey}|{cents}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    total = sum(h(r) for r in cu.itertuples()) % _CKSUM_MOD
    assert rows["customer"]["checksum"] == total
    assert rows["customer"]["n_rows"] == len(cu)
    tampered = (
        sum(h(r) for r in list(cu.itertuples())[1:])
        + h(next(cu.itertuples()), tamper=1)
    ) % _CKSUM_MOD
    assert tampered != total
