"""Central query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible,
the equivalent DuckDB SQL. Column names/aliases must match exactly
between the two (driver hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


#: Names emitted FIRST by ``queries()``/``oracle_sql()``. The driver
#: verifies exactly the first 50 dict entries per round, so ordering
#: is the verification budget — rotate it every round toward the
#: OLDEST evidence (policy encoded in ``tools/rotate_priority.py``,
#: which generated this window). Round-4 window: (a) the 16 queries
#: added mid-round (SemDeDup prune, trade-graph PageRank, ORC
#: round-trip, Flesch readability, Misra-Gries heavy hitters, CSV
#: round-trip, stateful CUSUM drift, DQ expectations suite, incremental
#: aggregate maintenance, GK-quantile accuracy attestation,
#: exact-integer correlation matrix, power-iteration PCA, BPE
#: tokenizer training, LM perplexity filter, BM25 retrieval, JSONL
#: round-trip), (b) the 11 never-attested queries from the start of
#: the round (newly-oracled PQ/IVF-PQ top-k + recall, compression
#: bounds, k-means convergence, catalog round-trip, multimodal
#: decode/frame/audio/video attestations),
#: (c) 23 of the queries whose most recent attestation is ROUND 1 —
#: the stalest evidence in the ledger. No-oracle rows stay out of
#: the window (their evidence is pytest). Deferred to round 5:
#: twenty-four r1 queries (semi_join_customers,
#: anti_join_customers, range_join_promo_windows,
#: staged_merge_orders, set_except,
#: events_window_10min,
#: events_sessionize, events_json_props,
#: events_sliding_window, events_json_typed, events_grouping_sets,
#: events_funnel, events_cohort_retention, events_attribution,
#: dedup_exact, distinct_agg, cube_status, histogram_order_totals,
#: unpivot_measures, set_union, set_intersect, union_all_by_name,
#: set_intersect_all, set_except_all), the r2-attested block, and
#: the r3-green rows whose DuckDB oracle text got BIGINT-cast
#: hardening (embedding_centroids, ivf_topk, ivf_recall_at10 —
#: local check_oracle confirms their hashes are unchanged).
PRIORITY: tuple[str, ...] = (
    # (a) added mid-round-4
    "semdedup_prune",
    "pagerank_trade_graph",
    "orc_roundtrip_lineitem",
    "doc_readability",
    "heavy_hitters_mg",
    "csv_roundtrip_customer",
    "events_cusum_drift",
    "dq_expectations",
    "incremental_monthly_revenue",
    "approx_quantiles_accuracy",
    "correlation_matrix",
    "pca_power_iteration",
    "bpe_train_merges",
    "lm_perplexity_filter",
    "bm25_search",
    "jsonl_roundtrip_events",
    # (b) new at the start of round 4 — never attested
    "pq_topk",
    "ivfpq_topk",
    "pq_recall_at10",
    "ivfpq_recall_at10",
    "doc_compression_ratio",
    "kmeans_convergence",
    "catalog_roundtrip_orders",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "multimodal_video_frames",
    # (c) last attested round 1 — aggregates / TPC-H shapes
    "q1_pricing_summary",
    "sales_trends_monthly",
    "rollup_sales",
    "q3_top_unshipped",
    "q5_local_revenue",
    "percentile_by_status",
    "pivot_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "q10_returned_items",
    "q2_top_supplier_per_nation",
    "q16_supplier_diversity",
    "stats_moments",
    "monthly_revenue_gapfill",
    # (c) sorts / windows / joins / merge
    "topk_orders",
    "global_sorted_sample",
    "window_rank_orders",
    "window_distribution_ranks",
    "scd2_rate_history",
    "window_running_total",
    "window_lead_lag",
    "full_outer_reconciliation",
    "asof_join_rates",
)


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    from bigdata_pipelines_aws_glue_spark.plans.flagship import (
        FLAGSHIP_ORACLE_SQL,
        flagship_query,
    )

    register("flagship_pipeline", flagship_query, FLAGSHIP_ORACLE_SQL)

    operator_modules = [
        "aggregates",
        "sort",
        "windows",
        "joins",
        "setops",
        "merge",
        "events_time",
        "dedup",
        "clustering",
        "curation",
        "text",
        "pii",
        "similarity",
        "multimodal",
        "sampling",
        "scalars",
        "subqueries",
        "tpch_extra",
        "quality",
        "timeseries",
        "corpus_stats",
        "trends",
        "catalog_rt",
        "retrieval",
        "bpe",
        "semdedup",
        "graph",
        "linalg",
    ]
    for mod_name in operator_modules:
        mod = importlib.import_module(
            f"bigdata_pipelines_aws_glue_spark.operators.{mod_name}"
        )
        mod._register()

    # custom stateful operator (batch twin; the streaming form is
    # exercised in tests/test_stateful.py)
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        CUSUM_ORACLE,
        EWMA_ORACLE,
        cusum_batch,
        ewma_batch,
    )

    register(
        "ewma_anomaly_per_user",
        lambda spark, sf_dir: ewma_batch(load_table(spark, sf_dir, "events")),
        EWMA_ORACLE,
    )
    register(
        "events_cusum_drift",
        lambda spark, sf_dir: cusum_batch(load_table(spark, sf_dir, "events")),
        CUSUM_ORACLE,
    )
    _LOADED = True
