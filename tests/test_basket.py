"""Semantic checks for ``operators/basket.py``."""

from __future__ import annotations

from itertools import combinations

from bigdata_pipelines_aws_glue_spark.operators.basket import (
    MIN_ITEM_SUPPORT,
    TOPK,
    market_basket_pairs,
)


def test_pairs_match_brute_force(spark, sf_dir):
    """Recompute the full pair-support table driver-side from raw
    baskets and check the operator returns exactly the top-TOPK under
    its (support desc, p1, p2) order."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item_sup: dict[int, int] = {}
    for items in baskets.values():
        for p in items:
            item_sup[p] = item_sup.get(p, 0) + 1
    frequent = {p for p, s in item_sup.items() if s >= MIN_ITEM_SUPPORT}
    pair_sup: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        for p1, p2 in combinations(sorted(items & frequent), 2):
            pair_sup[(p1, p2)] = pair_sup.get((p1, p2), 0) + 1
    expected = sorted(
        pair_sup.items(), key=lambda kv: (-kv[1], kv[0])
    )[:TOPK]
    got = market_basket_pairs(spark, sf_dir).collect()
    assert [((r.p1, r.p2), r.n_orders_both) for r in got] == expected
    n_orders = len(baskets)
    for r in got:
        s1, s2 = item_sup[r.p1], item_sup[r.p2]
        want = r.n_orders_both * n_orders / (s1 * s2)
        assert abs(r.lift - want) < 1e-5
        assert r.lift > 0
