"""Custom connector via Spark 4's Python Data Source API.

The reference's source surface is files + JDBC (SURVEY §2.1); the
modern Spark answer for "my data lives behind an API/generator that
has no built-in source" is `pyspark.sql.datasource` (Spark 4.0, with
filter pushdown in 4.1): implement a DataSource/DataSourceReader
pair, register it on the session, and `spark.read.format(name)`
plans it like any native source — partitioned for parallelism, with
the pushed filters narrowing what the source generates/fetches.

This module implements a DETERMINISTIC synthetic-document source so
the connector machinery itself is oracle-checkable: every generated
cell is a pure integer formula of ``doc_id``, which the DuckDB twin
replays over ``generate_series``. Filter pushdown is real: range
predicates on ``doc_id`` narrow the generated id range BEFORE
partitions are planned, so a filtered scan plans fewer input
partitions (asserted in tests/test_pydatasource.py) — the Python-
source analogue of parquet partition pruning.

Scale shape: ``partitions()`` yields one InputPartition per
``step``-sized id range — embarrassingly parallel executor-side
generation, no driver materialization; the same layout a real
API-backed source would use (one partition per page/shard/key-range).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

#: deterministic generator constants — mirrored in the SQL oracle.
PYSRC_N = 5_000
PYSRC_STEP = 500
PYSRC_LANGS = ("en", "de", "fr", "es", "ja")
#: Knuth multiplicative-hash constant (public); doc_id*K % 1000 is the
#: score in milli-units — integer-exact in both engines.
PYSRC_K = 2_654_435_761


def row_for(doc_id: int) -> tuple:
    """The whole record is a pure function of doc_id (shared by the
    reader and the tests; the oracle replays it in SQL)."""
    return (
        doc_id,
        PYSRC_LANGS[doc_id % len(PYSRC_LANGS)],
        50 + (doc_id * 37) % 450,
        (doc_id * PYSRC_K) % 1000,
    )


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.lo = 0
        self.hi = int(options.get("n", PYSRC_N))
        self.step = int(options.get("step", PYSRC_STEP))

    def pushFilters(self, filters):
        """Accept range/equality predicates on doc_id by narrowing
        [lo, hi) before partition planning; everything else is
        returned for Spark to evaluate post-scan. Called once at
        planning time (4.1 API). Narrowing happens EAGERLY here and a
        plain list is returned — a generator would only apply the
        pushdown if PySpark fully drained it before ``partitions()``
        (true of current internals, but partial consumption would
        silently skip pushdown while still claiming the filters)."""
        unsupported = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("doc_id",):
                unsupported.append(f)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, f.value)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, f.value + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, f.value)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, f.value + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, f.value)
                self.hi = min(self.hi, f.value + 1)
            else:
                unsupported.append(f)  # unsupported shape on doc_id
        return unsupported

    def partitions(self):
        return [
            _Range(lo, min(lo + self.step, self.hi))
            for lo in range(self.lo, self.hi, self.step)
        ]

    def read(self, partition):
        for doc_id in range(partition.lo, partition.hi):
            yield row_for(doc_id)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint, score_milli bigint"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(SyntheticDocsDataSource)


#: range pushed into the source (planner prunes partitions 0 and 7-9)
PYSRC_LO, PYSRC_HI = 500, 3_500


def pysource_lang_rollup(spark, sf_dir: str):
    """Read through the registered Python data source with a doc_id
    range filter (PUSHED into the source — the scan plans 6 of 10
    partitions; tests assert the pruning) and roll up per language.
    ``sf_dir`` is unused: the source IS the data, which is the point —
    the connector machinery itself is what this query attests, via a
    DuckDB twin that replays the generator formulas over
    generate_series."""
    from pyspark.sql import functions as F

    register_synthetic_source(spark)
    # runtime SQLConf (off by default in 4.1, and the driver's session
    # is not ours to pre-configure) — required for pushFilters to run
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthetic_docs")
        .load()
        .filter(
            (F.col("doc_id") >= PYSRC_LO) & (F.col("doc_id") < PYSRC_HI)
        )
    )
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("score_milli").alias("sum_score_milli"),
    )


PYSRC_ORACLE = f"""
WITH g AS (
    SELECT unnest(generate_series({PYSRC_LO}, {PYSRC_HI - 1})) AS doc_id
),
r AS (
    SELECT doc_id,
           (['en','de','fr','es','ja'])[doc_id % 5 + 1] AS lang,
           50 + (doc_id * 37) % 450 AS n_chars,
           (doc_id * {PYSRC_K}) % 1000 AS score_milli
    FROM g
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(score_milli) AS BIGINT) AS sum_score_milli
FROM r GROUP BY lang
"""


def _register() -> None:
    from bigdata_pipelines_aws_glue_spark import registry

    registry.register(
        "pysource_lang_rollup", pysource_lang_rollup, PYSRC_ORACLE
    )
