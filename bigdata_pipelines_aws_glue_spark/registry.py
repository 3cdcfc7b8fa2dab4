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
#: generated this window). Round-6 window: (a) FORCED, the 19 rows
#: with no driver attestation or a changed oracle — the 15 round-5
#: additions the round-5 verdict scheduled first for this window,
#: the two former rows-only queries that gained full hash oracles
#: this round (kmeans_embeddings via unrolled-Lloyd's CTEs,
#: multimodal_resize via exact integer pixel sums), and the two
#: whose oracle text changed in the decimal-sum hardening
#: (stats_moments, corpus_token_entropy; count_min_sketch's changed
#: bound is already in the never-attested set); (b) the FULL 15-row
#: r2-stale backlog (the round-4 schedule, unchanged); (c) 16
#: oldest-r3 rows. After this window attests, no oracled row is
#: older than r3 and every query in the registry has driver
#: evidence. (Late round-6 swap: the 50th slot goes to
#: asof_join_rates — its shared ASOF_ORACLE text changed in the
#: sf0.001 multiplicity fix, and changed-oracle rows must re-attest;
#: top_terms_per_lang (r3) moves to the r7 window instead.)
#:
#: Round-6 hardening note: the decimal(38,0) carry for quantized
#: integer sums (functions/rounding.py::dec_qsum) touches ~50
#: registry queries Spark-side. The change is VALUE-IDENTICAL below
#: 2^53 by construction (decimal->double conversion is exact there)
#: and was verified by a full 161-query sf0.01 sweep plus sf0.1
#: spot-checks before rotation; rows already green at r4/r5
#: therefore keep their attestations and re-enter by age as usual
#: rather than crowding out never-attested evidence.
#:
#: Round-7 schedule (steady state: no row older than 2 rounds): the
#: TWENTY queries added after this window froze
#: (multimodal_mp4_frames, source_cap_sample,
#: quality_classifier_score, triangle_count_parts,
#: recursive_trade_reach, events_variant_props, pysource_lang_rollup,
#: sql_udf_revenue, theta_set_algebra, kll_quantile_merge,
#: safe_arithmetic, map_functions, xml_roundtrip_orders,
#: sessions_stateful, chunk_documents_udtf, approx_top_terms,
#: matryoshka_topk, matryoshka_recall_at10, lsh_candidate_quality,
#: split_contamination_matrix — each oracle-verified locally at
#: sf0.01 AND sf0.1 on registration, per the round-5 precedent)
#: enter FIRST as never-attested rows (they fill 20 of the 50 slots;
#: the remaining 30 take the oldest-r3 tail, pushing the r4 block to
#: r8 — still two-round steady state by r8); then the
#: ~16 remaining r3 rows (doc_repetition_stats, lang_id_markers,
#: token_count_bpe, doc_fingerprint, pii_scrub_report, cosine_topk,
#: the 3 LSH ANN rows, dedup_embedding_cosine,
#: deterministic_shuffle, train_val_test_split, string/date/array
#: functions, sql_correlated_delta, zorder_layout_key,
#: events_rolling_avg_time, events_outlier_mad, hll_vocab_rollup,
#: token_budget_allocation, sales_trend_slope,
#: rolling_7d_active_users) re-enter first, then oldest-r4
#: (q1/sales_trends/approx_quantiles/rollup_sales/q3 and the
#: remaining r4 block), filling 50 exactly; r8 takes the r4/r5
#: remainder, after which rotation is purely two-round.
PRIORITY: tuple[str, ...] = (
    "kmeans_embeddings",  # new/changed
    "multimodal_resize",  # new/changed
    "count_min_sketch",  # new/changed
    "pq_topk_sampled",  # new/changed
    "pq_sampled_recall_at10",  # new/changed
    "quality_classifier_train",  # new/changed
    "quality_classifier_weights",  # new/changed
    "zorder_layout",  # new/changed
    "zorder_pruning_gain",  # new/changed
    "fuzzy_match_parts",  # new/changed
    "er_golden_record",  # new/changed
    "split_token_drift",  # new/changed
    "k_anonymity_audit",  # new/changed
    "join_size_estimate",  # new/changed
    "market_basket_pairs",  # new/changed
    "seasonal_decompose_daily",  # new/changed
    "compaction_plan",  # new/changed
    "stats_moments",  # new/changed
    "corpus_token_entropy",  # new/changed
    "asof_join_sortmerge",  # r2
    "sequence_pack_chunks",  # r2
    "chunk_fill_report",  # r2
    "multimodal_bytes_meta",  # r2
    "stratified_sample",  # r2
    "weighted_sample_topk",  # r2
    "skew_safe_agg",  # r2
    "q4_late_shipment_priority",  # r2
    "q22_idle_customers",  # r2
    "q11_important_parts",  # r2
    "q12_priority_shipping",  # r2
    "q13_customer_distribution",  # r2
    "corpus_mix_weights",  # r2
    "crossdoc_shingle_dup",  # r2
    "ewma_anomaly_per_user",  # r2
    "asof_join_skewproof",  # r3
    "events_click_to_purchase",  # r3
    "dedup_content_hash",  # r3
    "dedup_ngram_jaccard",  # r3
    "dedup_minhash_lsh",  # r3
    "dedup_neardup_pipeline",  # r3
    "dedup_incremental_neardup",  # r3
    "dedup_simhash",  # r3
    "dedup_clusters",  # r3
    "corpus_curation_summary",  # r3
    "curation_funnel_report",  # r3
    "embedding_quantize_int8",  # r3
    "text_stats",  # r3
    "doc_sentiment_lexicon",  # r3
    "gopher_quality_filter",  # r3
    "asof_join_rates",  # oracle text changed (round-6 sf0.001 fix)
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
        "privacy",
        "optimizer_stats",
        "basket",
        "compaction",
        "datasketches",
        "chunking",
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
