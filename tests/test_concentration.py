"""Gini and ABC: numpy replays and the structural invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bigdata_pipelines_aws_glue_spark.operators.concentration import (
    abc_classification_parts,
    gini_customer_revenue,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_gini_matches_numpy_sorted_formula(spark, sf_dir):
    got = gini_customer_revenue(spark, sf_dir).collect()[0]
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    od["c"] = np.floor(
        od["o_totalprice"].to_numpy(float) * 100 + 0.5
    ).astype(np.int64)
    x = np.sort(od.groupby("o_custkey")["c"].sum().to_numpy(np.float64))
    n = len(x)
    g = 2 * float((np.arange(1, n + 1) * x).sum()) / (n * float(x.sum())) \
        - (n + 1) / n
    assert got["n_customers"] == n
    assert abs(got["total_dollars"] - x.sum() / 100) < 0.01
    assert abs(got["gini"] - g) < 1e-9
    assert 0.0 <= got["gini"] < 1.0


def test_abc_matches_pandas_replay(spark, sf_dir):
    got = {r["abc_class"]: r for r in
           abc_classification_parts(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).toPandas()
    li["rev"] = np.floor(
        li["l_extendedprice"].to_numpy(float)
        * (1.0 - li["l_discount"].to_numpy(float))
        * 100
        + 0.5
    ).astype(np.int64)
    per_part = li.groupby("l_partkey")["rev"].sum()
    tw = float(per_part.sum())
    # exclusive higher-revenue share per part (ties share one class):
    # revenue of STRICTLY greater values over total
    df = per_part.rename("x").reset_index()
    cum_gt = {
        v: float(per_part[per_part > v].sum()) for v in df["x"].unique()
    }
    share_excl = df["x"].map(lambda v: cum_gt[v] / tw)
    cls = pd.cut(
        share_excl, [-1, 0.80, 0.95, 2], labels=["A", "B", "C"], right=False
    )
    # pd.cut right=False: [-1, .8) -> A, [.8, .95) -> B — matches the
    # strict < thresholds
    expect = df.assign(cls=cls).groupby("cls", observed=True)["x"].agg(
        ["size", "sum"]
    )
    assert set(got) == set(expect.index)
    total_parts = 0
    total_share = 0.0
    for c, row in expect.iterrows():
        assert got[c]["n_parts"] == int(row["size"])
        assert abs(got[c]["revenue_dollars"] - row["sum"] / 100) < 0.02
        assert abs(got[c]["revenue_share"] - row["sum"] / tw) < 2e-6
        total_parts += got[c]["n_parts"]
        total_share += got[c]["revenue_share"]
    assert total_parts == len(per_part)
    assert abs(total_share - 1.0) < 1e-5
    # Pareto structure: A has the most revenue with the fewest parts
    if "A" in got and "C" in got:
        assert got["A"]["revenue_share"] > got["C"]["revenue_share"]
