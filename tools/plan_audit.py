"""Physical-plan audit: sweep every registry query and flag scale
anti-patterns before they cost anything at 100 TB.

Flags:
- CartesianProduct            — unkeyed pair blowup
- BroadcastNestedLoopJoin     — non-equi join fallback (OK only when one
                                side is a scalar/1-row aggregate)
- SinglePartition window/sort — serializes all data through one task
                                (global Window.orderBy with no partitionBy).
                                The final exchange of a GLOBAL AGGREGATE
                                also prints "Exchange SinglePartition" but
                                moves one partial row per partition — that
                                case is benign and NOT flagged (detector
                                requires a Sort/Window consumer).

Whitelist entries document WHY a hit is intentional; anything else is
an audit failure. Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# query -> (pattern, reason) pairs that are deliberate
WHITELIST: dict[str, dict[str, str]] = {
    "q22_idle_customers": {
        "BroadcastNestedLoopJoin": "scalar avg subquery: 1-row broadcast",
    },
    "q11_important_parts": {
        "BroadcastNestedLoopJoin": "global-total subquery: 1-row broadcast",
    },
    "dq_profile": {
        "BroadcastNestedLoopJoin": "1-row profile x 1-row orphan count",
    },
    "monthly_revenue_gapfill": {
        "BroadcastNestedLoopJoin": "date-spine bounds: 1-row broadcast",
    },
    "q15_top_supplier": {
        "BroadcastNestedLoopJoin": "global-max subquery: 1-row broadcast",
    },
    "corpus_mix_weights": {
        "BroadcastNestedLoopJoin": "corpus-total + mix-denominator scalars "
        "(1-row broadcasts onto a |languages|-row aggregate)",
    },
    "lm_perplexity_filter": {
        "BroadcastNestedLoopJoin": "LM totals (T, V) and corpus-mean-NLL "
        "scalars — 1-row broadcasts; model tables join on their keys",
    },
    "bm25_search": {
        "BroadcastNestedLoopJoin": "(n_docs, avgdl) corpus scalar — 1-row "
        "broadcast onto the (query, doc) aggregate",
    },
    "token_budget_allocation": {
        "BroadcastNestedLoopJoin": "remainder-rank self-join and "
        "totals joins over the #languages-row aggregate — bounded by "
        "language cardinality, never corpus size",
    },
    "hll_vocab_rollup": {
        "BroadcastNestedLoopJoin": "1-row global-exact x 1-row "
        "union-estimate crossJoin for the ALL row — scalar join",
    },
    "cosine_topk": {
        "BroadcastNestedLoopJoin": "query side is a bounded broadcast "
        "(N_QUERIES rows) against the corpus — by design",
    },
    "ann_lsh_recall_at10": {
        "BroadcastNestedLoopJoin": "the exact-baseline side is "
        "cosine_topk over the bounded N_QUERIES audit sample (recall "
        "auditing is always sampled); the ANN side stays a banded "
        "equi-join",
    },
    "ann_lsh_multiprobe_recall_at10": {
        "BroadcastNestedLoopJoin": "same bounded cosine_topk exact "
        "baseline as ann_lsh_recall_at10; the multiprobe side is "
        "still a banded equi-join",
    },
    "ivf_recall_at10": {
        "BroadcastNestedLoopJoin": "same bounded cosine_topk exact "
        "baseline as ann_lsh_recall_at10; the IVF side is a cell "
        "equi-join",
    },
    "ann_lsh_topk": {
        "BroadcastNestedLoopJoin": "bounded query-side broadcast",
    },
    "ivf_topk": {
        "BroadcastNestedLoopJoin": "bounded query-side broadcast",
    },
    "ivfpq_topk": {
        "BroadcastNestedLoopJoin": "k-row centroid / m*k-row codebook "
        "broadcasts (cell assignment + PQ training) — bounded tables "
        "by construction",
    },
    "kmeans_embeddings": {
        "BroadcastNestedLoopJoin": "k-row centroid broadcast per "
        "assignment round",
    },
    "kmeans_convergence": {
        "BroadcastNestedLoopJoin": "k-row centroid broadcast per "
        "assignment/inertia round + 1-row count x 1-row sum crossJoin "
        "for the certificate row",
    },
    "pq_recall_at10": {
        "BroadcastNestedLoopJoin": "the exact-L2 reference side is the "
        "bounded N_QUERIES broadcast sample (recall auditing is always "
        "sampled); the PQ side scores codes via equi-joins",
    },
    "ivfpq_recall_at10": {
        "BroadcastNestedLoopJoin": "same bounded cosine_topk exact "
        "baseline as ann_lsh_recall_at10; the IVF-PQ side is cell + "
        "code equi-joins",
    },
    "regex_functions": {
        "BroadcastNestedLoopJoin": "1-row (LIMIT 1) broadcast side",
    },
    "heavy_hitters_mg": {
        "BroadcastNestedLoopJoin": "1-row corpus-token-total scalar "
        "broadcast onto the per-term exact aggregate",
    },
    "semdedup_prune": {
        "BroadcastNestedLoopJoin": "k-row centroid broadcast for cell "
        "assignment (same bounded table as ivf_topk); the within-cell "
        "pair join itself is a SortMergeJoin on cell — verified",
    },
    "global_sorted_sample": {
        "SinglePartition": "deliberately global total order (sampled)",
    },
}

def _single_partition_sort_or_window(plan: str) -> bool:
    """True when a Sort or Window consumes an Exchange SinglePartition
    (parents precede children in the tree printout, so look at the two
    lines above the exchange)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for prev in lines[max(0, i - 2): i]:
            op = prev.lstrip(" +-*")
            if op.startswith("Sort [") or op.startswith("Window ["):
                return True
    return False


PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")

CHECKS = {
    "CartesianProduct": lambda plan: "CartesianProduct" in plan,
    "BroadcastNestedLoopJoin": lambda plan: "BroadcastNestedLoopJoin" in plan,
    "SinglePartition": _single_partition_sort_or_window,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from bigdata_pipelines_aws_glue_spark import registry
    from bigdata_pipelines_aws_glue_spark.session import get_spark

    spark = get_spark("plan-audit")
    failures: list[tuple[str, str]] = []
    n_checked = 0
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # plan construction itself failed
            failures.append((name, f"plan build error: {exc}"))
            continue
        n_checked += 1
        allowed = WHITELIST.get(name, {})
        hits = [p for p in PATTERNS if CHECKS[p](plan)]
        bad = [p for p in hits if p not in allowed]
        status = "ok" if not bad else "FLAG"
        notes = "; ".join(
            [f"{p} [allowed: {allowed[p]}]" for p in hits if p in allowed]
            + [f"{p} <-- NOT WHITELISTED" for p in bad]
        )
        print(f"  {name}: {status}" + (f"  {notes}" if notes else ""))
        if bad:
            failures.append((name, ", ".join(bad)))

    print()
    if failures:
        print(f"{len(failures)} plan flags:")
        for name, why in failures:
            print(f"  - {name}: {why}")
        return 1
    print(f"plan audit clean ({n_checked} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
