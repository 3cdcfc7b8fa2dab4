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
#: generated this window). Round-11 window (VERDICT_r10 item 1 —
#: executed as the r10 comment planned, then re-cut as each batch of
#: r11 additions landed BEFORE the driver ran; every re-cut trades
#: oldest-r6 slots for never-attested fresh rows, strictly more
#: evidence under the same policy): (a) FORCED — the 13 round-11
#: additions (multi-word binary ANN trio, ``dedup_simhash_hamming``,
#: the asymmetric-distance pair, ``dedup_simhash_clusters``, the MIH
#: multiprobe pair, ``bucketed_join_colocation``,
#: ``salted_join_supplier_revenue``, ``multimodal_tiff_roundtrip``,
#: ``dedup_clusters_star``) plus the 2 ADPCM rows whose ORACLES
#: changed this round (NULL-text coalesce fix, ADVICE_r10 item 1 — a
#: changed oracle must re-attest even though the Spark side is
#: untouched); (b) the 4 remaining never-attested late-r10
#: binary-ANN rows (never-attested sorts first automatically);
#: (c) the 31 oldest r6-last-green rows, filling 50 exactly. Every
#: name in this window was verified green in PLAIN_SESSION at sf0.01
#: this round before the rotation commit; the 15 forced rows also at
#: sf0.1 (scale twin where registered) + plan audit.
#:
#: Round-12 arithmetic (from tools/rotate_priority.py this round):
#: after this window attests, the deferred remainder is 211 oracled
#: rows — 12 still-r6, then the r7 block (50), r8 (50), r9 (50),
#: r10 (49). So the r12 window = any r12 additions + those 12 r6
#: rows + oldest-r7 to fill 50. Steady state, purely age-driven.
PRIORITY: tuple[str, ...] = (
    "binary_multiword_topk",
    "binary_multiword_mih_topk",
    "binary_multiword_mih_recall_at10",
    "dedup_simhash_hamming",
    "binary_asymmetric_topk",
    "binary_asymmetric_recall_at10",
    "dedup_simhash_clusters",
    "binary_mih_multiprobe_topk",
    "binary_mih_multiprobe_recall_at10",
    "bucketed_join_colocation",
    "salted_join_supplier_revenue",
    "multimodal_tiff_roundtrip",
    "dedup_clusters_star",
    "multimodal_audio_adpcm",
    "multimodal_audio_adpcm_stereo",
    "binary_hamming_topk",
    "binary_hamming_recall_at10",
    "binary_mih_topk",
    "binary_mih_recall_at10",
    "dedup_content_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_neardup_pipeline",
    "dedup_incremental_neardup",
    "dedup_simhash",
    "dedup_clusters",
    "corpus_curation_summary",
    "sequence_pack_chunks",
    "curation_funnel_report",
    "chunk_fill_report",
    "embedding_quantize_int8",
    "text_stats",
    "doc_sentiment_lexicon",
    "gopher_quality_filter",
    "kmeans_embeddings",
    "pq_topk_sampled",
    "pq_sampled_recall_at10",
    "multimodal_bytes_meta",
    "stratified_sample",
    "weighted_sample_topk",
    "skew_safe_agg",
    "q4_late_shipment_priority",
    "q22_idle_customers",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "seasonal_decompose_daily",
    "count_min_sketch",
    "corpus_mix_weights",
    "corpus_token_entropy",
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
        "markup",
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
