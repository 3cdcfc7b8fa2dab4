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
#: OLDEST evidence (policy in ``tools/rotate_priority.py``, which
#: generated this window). Round-15 window (VERDICT_r14 item 2 —
#: executed exactly as the r14 comment's arithmetic planned, plus the
#: standing forced-first rule for new/behavior-changed rows):
#: (a) the 6 forced rows — the round-15 additions: the closed crawl
#: loop (``crawl_rounds_audit``, the K-round fetch/resolve/re-rank
#: simulation; ``fetch_schedule``, the Crawl-delay politeness
#: schedule; ``sitemap_recrawl``, the lastmod-vs-stored-fetch
#: staleness policy), the mixing pair
#: (``domain_mixture_temperature`` and its data-constrained capped
#: water-filling form ``domain_mixture_capped``), the streaming
#: frontier feed's batch twin ``frontier_refs_windowed``, and the
#: six late-session compositions — the stride-scheduling dataloader
#: interleave ``mixture_interleave_schedule`` and its concrete-doc
#: resolution ``mixture_sample_manifest``, the OPIC-style
#: authority-ordered frontier ``frontier_authority_rank``, the
#: label-propagation communities ``lpa_doc_communities`` and k-core
#: peel ``kcore_peel_audit`` over the same doc link graph, and the
#: Holt double-exponential forecast ``holt_forecast_revenue`` with
#: its per-user stateful-stream batch twin
#: ``holt_level_trend_per_user`` (the 11th streaming builder's
#: hash-oracled form), the intermittent-demand pair
#: ``demand_pattern_parts`` (Syntetos-Boylan quadrants) +
#: ``croston_demand_forecast`` (the JVM-fold Croston), and the
#: seasonal capstone ``holt_winters_revenue`` (12-slot additive
#: Holt-Winters, the full forecast ladder). The
#: window was RE-CUT for each late-addition batch per the r11-r14
#: precedent, trading the thirteen newest r9 fill slots
#: (``dedup_span_clean_text``, ``dedup_span_removal``,
#: ``dedup_span_dropstats``, ``dedup_substring_pairs``,
#: ``dedup_substring_spans``, ``pca_power_iteration``,
#: ``correlation_matrix``, ``semdedup_prune``,
#: ``lm_perplexity_filter``, ``csv_roundtrip_customer``,
#: ``orc_roundtrip_lineitem``, ``jsonl_roundtrip_events``,
#: ``catalog_roundtrip_orders``); (b) the
#: 2 remaining r8-last-green
#: rows (``gini_customer_revenue``, ``abc_classification_parts``);
#: (c) the 32 oldest r9-last-green rows, filling 50 exactly.
#:
#: Round-16 arithmetic (from tools/rotate_priority.py this round):
#: after this window attests, the deferred remainder is 260 oracled
#: rows — 17 still-r9 (``catalog_roundtrip_orders``,
#: ``jsonl_roundtrip_events``,
#: ``orc_roundtrip_lineitem``, ``csv_roundtrip_customer``,
#: ``lm_perplexity_filter``,
#: ``semdedup_prune``, ``correlation_matrix``,
#: ``pca_power_iteration``, ``dedup_substring_spans``,
#: ``dedup_substring_pairs``, ``dedup_span_dropstats``,
#: ``dedup_span_removal``, ``dedup_span_clean_text``,
#: ``cdc_chunk_dedup``, ``cdc_store_savings``,
#: ``cdc_clamped_chunks``, ``events_cusum_drift``), then r10 (49),
#: r11 (46), r12 (49), r13 (49), r14 (50). So the r16 window = any
#: r16 additions + those 17 r9 rows + oldest-r10 to fill 50. Steady
#: state, purely age-driven.
PRIORITY: tuple[str, ...] = (
    "crawl_rounds_audit",
    "fetch_schedule",
    "sitemap_recrawl",
    "domain_mixture_temperature",
    "domain_mixture_capped",
    "frontier_refs_windowed",
    "mixture_interleave_schedule",
    "frontier_authority_rank",
    "lpa_doc_communities",
    "kcore_peel_audit",
    "mixture_sample_manifest",
    "holt_forecast_revenue",
    "holt_level_trend_per_user",
    "demand_pattern_parts",
    "croston_demand_forecast",
    "holt_winters_revenue",
    "gini_customer_revenue",
    "abc_classification_parts",
    "flagship_pipeline",
    "distinct_agg",
    "approx_distinct",
    "cube_status",
    "q5_local_revenue",
    "pivot_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "q10_returned_items",
    "q2_top_supplier_per_nation",
    "monthly_revenue_gapfill",
    "topk_orders",
    "global_sorted_sample",
    "window_rank_orders",
    "window_distribution_ranks",
    "scd2_rate_history",
    "window_running_total",
    "window_lead_lag",
    "full_outer_reconciliation",
    "incremental_monthly_revenue",
    "greedy_coverage_batched",
    "doc_readability",
    "doc_compression_ratio",
    "kmeans_convergence",
    "pq_topk",
    "ivfpq_topk",
    "pq_recall_at10",
    "ivfpq_recall_at10",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "multimodal_video_frames",
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
        "classifier",
        "layout",
        "resolution",
        "drift",
        "observability",
        "gif",
        "privacy",
        "optimizer_stats",
        "basket",
        "compaction",
        "datasketches",
        "chunking",
        "setsim",
        "spandedup",
        "cdc",
        "adpcm",
        "tiff",
        "packing",
        "markup",
        "bloomjoin",
        "contrastive",
        "links",
        "urls",
        "warc",
        "warcgz",
        "funnel",
        "robots",
        "sitemap",
        "crawlloop",
        "spatial",
        "stattests",
        "cohorts",
        "concentration",
    ]
    for mod_name in operator_modules:
        mod = importlib.import_module(
            f"bigdata_pipelines_aws_glue_spark.operators.{mod_name}"
        )
        mod._register()

    # custom Python Data Source connector (Spark 4 datasource API)
    from bigdata_pipelines_aws_glue_spark.sources import pydatasource

    pydatasource._register()

    # custom stateful operator (batch twin; the streaming form is
    # exercised in tests/test_stateful.py)
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        CUSUM_ORACLE,
        EWMA_ORACLE,
        HOLT_PER_USER_ORACLE,
        cusum_batch,
        ewma_batch,
        holt_batch,
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
    register(
        "holt_level_trend_per_user",
        lambda spark, sf_dir: holt_batch(load_table(spark, sf_dir, "events")),
        HOLT_PER_USER_ORACLE,
    )
    # stateful sessionization (EventTimeTimeout) — the batch twin must
    # agree exactly with the built-in session_window, so it shares
    # events_sessionize's oracle
    from bigdata_pipelines_aws_glue_spark.operators.events_time import (
        SESSION_ORACLE,
    )
    from bigdata_pipelines_aws_glue_spark.streaming.stateful import (
        session_batch,
    )

    register(
        "sessions_stateful",
        lambda spark, sf_dir: session_batch(load_table(spark, sf_dir, "events")),
        SESSION_ORACLE,
    )
    _LOADED = True
