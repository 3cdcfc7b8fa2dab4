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
#: generated this window). Round-13 window (VERDICT_r12 item 1 —
#: executed exactly as the r12 comment's arithmetic planned, plus
#: the standing forced-first rule for new/behavior-changed rows):
#: (a) the 8 round-13 additions (next-fit sequence-packing pair,
#: then — landed late, window RE-CUT per the r11/r12 precedent,
#: trading the two newest oldest-fill slots — the FIRST-FIT packing
#: pair; the URL canonicalization/dedup pair; gzip-member WARC
#: framing; then — third cut — ``crawl_frontier``, closing the
#: WARC -> HTML -> links -> frontier loop) plus the
#: 6 rows whose ORACLE TEXT changed this round (the BPE pair and
#: the four closure-embedding cluster queries — ``AS MATERIALIZED``
#: on their replay CTEs, results verified identical but the changed
#: twin must re-attest); (b) the 29 remaining r7-last-green rows;
#: (c) the 7 oldest r8-last-green rows, filling 50 exactly. Every
#: name in this window was verified green in PLAIN_SESSION at
#: sf0.01 this round before every rotation commit (the 14 forced
#: rows also at sf0.1).
#:
#: Round-14 arithmetic (from tools/rotate_priority.py this round):
#: after this window attests, the deferred remainder is 236 oracled
#: rows — 43 still-r8, then r9 (49), r10 (49), r11 (46), r12 (49).
#: So the r14 window = any r14 additions + those 43 r8 rows +
#: oldest-r9 to fill 50. Steady state, purely age-driven.
PRIORITY: tuple[str, ...] = (
    "pack_training_sequences",
    "packing_stats",
    "url_canonicalize",
    "url_dedup_hostcap",
    "warc_gz_parse_records",
    "pack_sequences_firstfit",
    "packing_fill_compare",
    "crawl_frontier",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "dedup_clusters",
    "dedup_simhash_clusters",
    "dedup_clusters_star",
    "corpus_curation_summary",
    "deterministic_shuffle",
    "train_val_test_split",
    "source_cap_sample",
    "sql_udf_revenue",
    "safe_arithmetic",
    "map_functions",
    "xml_roundtrip_orders",
    "string_functions",
    "date_functions",
    "array_functions",
    "sql_correlated_delta",
    "zorder_layout_key",
    "events_rolling_avg_time",
    "events_outlier_mad",
    "hll_vocab_rollup",
    "token_budget_allocation",
    "sales_trend_slope",
    "rolling_7d_active_users",
    "recursive_trade_reach",
    "trade_reach_frontier",
    "triangle_count_parts",
    "quality_classifier_score",
    "join_size_estimate",
    "theta_set_algebra",
    "kll_quantile_merge",
    "approx_top_terms",
    "chunk_documents_udtf",
    "pysource_lang_rollup",
    "sessions_stateful",
    "rollup_sales",
    "q3_top_unshipped",
    "percentile_by_status",
    "trimmed_mean_price",
    "equidepth_histogram",
    "inventory_balance_resets",
    "interp_asof_rates",
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
