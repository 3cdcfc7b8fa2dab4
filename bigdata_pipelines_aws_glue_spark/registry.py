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
#: generated this window). Round-14 window (VERDICT_r13 item 2 —
#: executed exactly as the r13 comment's arithmetic planned, plus the
#: standing forced-first rule for new/behavior-changed rows):
#: (a) the 9 forced rows — the 8 round-14 additions (the two
#: corpus-funnel queries chaining warc.gz -> content -> URL curation
#: -> quality -> BPE -> packing; first-fit-decreasing packing; the
#: RFC 3986 resolution pair ``resolve_links`` /
#: ``crawl_frontier_resolved``; and — landed late, window RE-CUT
#: three times per the r11/r12/r13 precedent, trading the single
#: oldest-r9 fill slot (``flagship_pipeline``) and then the two
#: newest r8 slots (``abc_classification_parts``,
#: ``gini_customer_revenue``) — the RFC 9309 robots gate
#: ``frontier_robots_filter``, the sitemap discovery channel
#: ``sitemap_seeds``, and the combined fetch queue
#: ``crawl_queue_combined``) plus ``packing_fill_compare``, whose
#: SCHEMA changed to the three-way comparison; (b) the 41 oldest
#: remaining r8-last-green rows, filling 50 exactly.
#:
#: Round-15 arithmetic (from tools/rotate_priority.py this round):
#: after this window attests, the deferred remainder is 244 oracled
#: rows — 2 still-r8 (``gini_customer_revenue``,
#: ``abc_classification_parts``), then r9 (49), r10 (49), r11 (46),
#: r12 (49), r13 (49). So the r15 window = any r15 additions +
#: those 2 r8 rows + the 49 r9 rows + oldest-r10 to fill 50.
#: Steady state, purely age-driven.
PRIORITY: tuple[str, ...] = (
    "corpus_funnel_manifest",
    "corpus_funnel_stats",
    "pack_sequences_ffd",
    "packing_fill_compare",
    "resolve_links",
    "crawl_frontier_resolved",
    "frontier_robots_filter",
    "sitemap_seeds",
    "crawl_queue_combined",
    "asof_join_forward",
    "snapshot_diff_orders",
    "cdc_apply_changes",
    "markov_event_transitions",
    "dsir_domain_weights",
    "greedy_coverage_select",
    "pmi_collocations",
    "textrank_keywords",
    "poisson_bootstrap_ci",
    "benford_first_digit",
    "key_continuity_audit",
    "table_checksum_audit",
    "isotonic_daily_revenue",
    "acf_daily_revenue",
    "theil_sen_trend",
    "max_concurrent_orders",
    "changepoint_daily_revenue",
    "zipf_fit_terms",
    "hybrid_search_rrf",
    "bellman_ford_trade_cost",
    "classifier_calibration",
    "psi_order_value_drift",
    "observed_metrics_q6",
    "arrow_doc_stats",
    "multimodal_gif_frames",
    "l_diversity_audit",
    "bloom_membership_audit",
    "udtf_parse_fields",
    "allpairs_prefix_join",
    "spatial_nearest_grid",
    "spatial_point_in_polygon",
    "ols_revenue_model",
    "kaplan_meier_repeat",
    "ks_test_price",
    "mann_whitney_orders",
    "welch_t_test",
    "chi2_independence_docs",
    "conformal_interval_orders",
    "logrank_segments",
    "cohort_retention",
    "rfm_segments",
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
