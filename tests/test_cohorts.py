"""Cohort retention and RFM segmentation: pandas replays and the
lifecycle invariants (month-0 retention = 1, quintile balance)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bigdata_pipelines_aws_glue_spark.operators.cohorts import (
    cohort_retention,
    rfm_segments,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_cohort_retention_replay_and_invariants(spark, sf_dir):
    got = cohort_retention(spark, sf_dir).collect()
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    od["m"] = (
        pd.to_datetime(od["o_orderdate"]).dt.to_period("M").dt.to_timestamp()
    )
    acts = od[["o_custkey", "m"]].drop_duplicates()
    c0 = acts.groupby("o_custkey")["m"].min().rename("c0")
    j = acts.join(c0, on="o_custkey")
    j["months_since"] = (j["m"].dt.year - j["c0"].dt.year) * 12 + (
        j["m"].dt.month - j["c0"].dt.month
    )
    tri = (
        j.groupby([j["c0"].dt.strftime("%Y-%m"), "months_since"])
        .size()
        .rename("n")
    )
    sizes = c0.dt.strftime("%Y-%m").value_counts()
    expect = {
        (cm, int(ms)): int(n) for (cm, ms), n in tri.items()
    }
    got_map = {
        (r["cohort_month"], r["months_since"]): r["n_active"] for r in got
    }
    assert got_map == expect
    for r in got:
        assert r["cohort_size"] == int(sizes[r["cohort_month"]])
        # month 0 holds every cohort member by construction
        if r["months_since"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert abs(r["retention_rate"] - 1.0) < 1e-9
        assert 0.0 < r["retention_rate"] <= 1.0
        assert r["months_since"] >= 0


def test_rfm_segments_replay(spark, sf_dir):
    got = rfm_segments(spark, sf_dir).collect()
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    od["d"] = pd.to_datetime(od["o_orderdate"])
    od["cents"] = np.floor(
        od["o_totalprice"].to_numpy(float) * 100 + 0.5
    ).astype(np.int64)
    mx = od["d"].max()
    g = od.groupby("o_custkey").agg(
        last_d=("d", "max"), freq=("d", "size"), monetary=("cents", "sum")
    )
    g["rec"] = (mx - g["last_d"]).dt.days

    def scores(s: pd.Series) -> pd.Series:
        ths = [np.percentile(s.to_numpy(float), q, method="linear")
               for q in (20, 40, 60, 80)]
        out = np.ones(len(s), dtype=int)
        for t in ths:
            out += (s.to_numpy(float) > t).astype(int)
        return pd.Series(out, index=s.index)

    g["r_score"] = 6 - scores(g["rec"])
    g["f_score"] = scores(g["freq"])
    g["m_score"] = scores(g["monetary"])
    expect = (
        g.groupby(["r_score", "f_score", "m_score"])
        .agg(n=("monetary", "size"), avg=("monetary", "mean"))
    )
    got_map = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_customers"],
            r["avg_lifetime_dollars"],
        )
        for r in got
    }
    assert set(got_map) == set(expect.index)
    for key, row in expect.iterrows():
        n, avg = got_map[key]
        assert n == int(row["n"])
        assert abs(avg - row["avg"] / 100) < 5e-4
    # every score in 1..5 and total customers conserved
    assert all(
        1 <= k <= 5 for key in got_map for k in key
    )
    assert sum(n for n, _ in got_map.values()) == len(g)
