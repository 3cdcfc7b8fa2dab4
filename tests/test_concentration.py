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


def test_demand_pattern_matches_python_replay(spark, sf_dir):
    """Full pure-Python replay of the Syntetos-Boylan classification
    at the test SF from the collected weekly demand series — exact
    equality of ADI / cv^2 (to the same 6-decimal rounding) and
    class labels; plus the fixture-regime pins: intermittent AND
    lumpy both bite, smooth/erratic are empty exactly because every
    multi-week part's measured ADI >= 1.32."""
    import math

    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.operators.concentration import (
        _SB_ADI,
        _SB_CV2,
        _WEEK_EPOCH,
        demand_pattern_parts,
    )
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    week = F.expr(
        f"datediff(l_shipdate, date'{_WEEK_EPOCH}') DIV 7"
    ).cast("long")
    q = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    pw = (
        li.groupBy(F.col("l_partkey"), week.alias("wk"))
        .agg(F.sum(q).alias("wq"))
        .collect()
    )
    series: dict[int, list[tuple[int, int]]] = {}
    for r in pw:
        series.setdefault(r["l_partkey"], []).append((r["wk"], r["wq"]))
    expect = {}
    for pk, evs in series.items():
        evs.sort()
        n = len(evs)
        s = sum(w for _, w in evs)
        s2 = sum(w * w for _, w in evs)
        mean = s / n
        cv2 = max(s2 / n - mean * mean, 0.0) / (mean * mean)
        adi = (evs[-1][0] - evs[0][0]) / (n - 1) if n > 1 else None
        if n == 1:
            cls = "single"
        elif adi < _SB_ADI and cv2 < _SB_CV2:
            cls = "smooth"
        elif adi < _SB_ADI:
            cls = "erratic"
        elif cv2 < _SB_CV2:
            cls = "intermittent"
        else:
            cls = "lumpy"
        rnd = lambda x: (
            None if x is None else math.floor(x * 1e6 + 0.5) / 1e6
        )
        expect[pk] = (n, s, rnd(adi), rnd(cv2), cls)
    got = {
        r["l_partkey"]: (
            r["n_demand_weeks"],
            r["total_qty"],
            r["adi"],
            r["cv2_sizes"],
            r["pattern"],
        )
        for r in demand_pattern_parts(spark, sf_dir).collect()
    }
    assert got == expect
    classes = {v[4] for v in got.values()}
    assert "intermittent" in classes and "lumpy" in classes
    assert "smooth" not in classes and "erratic" not in classes
    for n, _, adi, _, _ in got.values():
        if n > 1:
            assert adi >= _SB_ADI


def test_demand_pattern_dense_branches(spark):
    """Synthetic dense series the corpus never produces drive the
    smooth / erratic / single branches: consecutive-week constant
    demand -> smooth; consecutive-week wildly varying demand ->
    erratic; a lone demand week -> single with NULL ADI."""
    from bigdata_pipelines_aws_glue_spark.operators.concentration import (
        demand_pattern_from_weekly,
    )

    rows = (
        [(1, wk, 10) for wk in range(20)]
        + [(2, wk, [1, 100][wk % 2]) for wk in range(20)]
        + [(3, 5, 7)]
    )
    df = spark.createDataFrame(rows, "l_partkey long, wk long, wq long")
    got = {
        r["l_partkey"]: (r["pattern"], r["adi"])
        for r in demand_pattern_from_weekly(df).collect()
    }
    assert got[1] == ("smooth", 1.0)
    assert got[2][0] == "erratic" and got[2][1] == 1.0
    assert got[3] == ("single", None)
