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
#: is the verification budget. Round 4 front-loads (a) the 11 queries
#: with no driver row in ANY round (CORRECTNESS_r01+r02; the round-3
#: driver never ran), (b) ``embedding_quantize_int8`` — the one
#: historically-red row, reshaped to a driver-hashable string column
#: in round 3 and still awaiting a green row, (c) queries whose
#: BEHAVIOR changed in round 3 (posting-list df cap, scaled rank
#: buckets) and must be re-attested, and (d) round-4 additions. Names
#: not present are skipped; unlisted queries follow in registration
#: order.
PRIORITY: tuple[str, ...] = (
    # (a) never attested in any round
    "sql_correlated_delta",
    "string_functions",
    "regex_functions",
    "date_functions",
    "array_functions",
    "dq_profile",
    "zorder_layout_key",
    "events_rolling_avg_time",
    "events_outlier_mad",
    "sales_trend_slope",
    "rolling_7d_active_users",
    # (b) historically red, reshaped in round 3
    "embedding_quantize_int8",
    # (c) behavior changed in round 3 — re-attest
    "dedup_ngram_jaccard",
    "deterministic_shuffle",
    # (d) round-4 additions
    "ann_lsh_recall_at10",
    "ann_lsh_multiprobe_recall_at10",
    "ivf_recall_at10",
    "asof_join_skewproof",
    "gopher_quality_filter",
    "events_click_to_purchase",
    "pii_scrub_report",
    "train_val_test_split",
    "hll_vocab_rollup",
    "doc_compression_ratio",
    "pq_topk",
    "ivfpq_topk",
    "doc_sentiment_lexicon",
    "curation_funnel_report",
    "dedup_incremental_neardup",
    "token_budget_allocation",
    # high-value re-attestations: LLM-mandate + flagship + streaming
    # twins (keep these inside the 50-window so every round carries
    # fresh evidence for the headline operators)
    "flagship_pipeline",
    "dedup_content_hash",
    "dedup_minhash_lsh",
    "dedup_neardup_pipeline",
    "dedup_simhash",
    "dedup_clusters",
    "corpus_curation_summary",
    "decontaminate_against_eval",
    "text_stats",
    "lang_id_markers",
    "token_count_bpe",
    "doc_fingerprint",
    "doc_repetition_stats",
    "top_terms_per_lang",
    "cosine_topk",
    "ann_lsh_topk",
    "ivf_topk",
    "embedding_centroids",
    "dedup_embedding_cosine",
    "kmeans_embeddings",
    "multimodal_bytes_meta",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "stratified_sample",
    "weighted_sample_topk",
    "corpus_mix_weights",
    "corpus_token_entropy",
    "crossdoc_shingle_dup",
    "sequence_pack_chunks",
    "chunk_fill_report",
    "approx_distinct",
    "skew_safe_agg",
    "asof_join_sortmerge",
    "ewma_anomaly_per_user",
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
        EWMA_ORACLE,
        ewma_batch,
    )

    register(
        "ewma_anomaly_per_user",
        lambda spark, sf_dir: ewma_batch(load_table(spark, sf_dir, "events")),
        EWMA_ORACLE,
    )
    _LOADED = True
