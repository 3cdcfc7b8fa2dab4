"""Scan operators (SURVEY.md §2.1 S1-S3).

The reference reads headered CSV twice: schema-on-read through a Glue
DynamicFrame (``glue_job.py:78-85``) and schema-declared through
``spark.read.csv`` (``glue_job.py:97,104``), then repairs types with
post-read casts (``glue_job.py:88-89``). Here both collapse into
``spark.read`` with optional explicit schema; parquet scans get
predicate pushdown + column pruning from the vectorized reader for
free, which is what makes the same code viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Driver corpus tables (TESTDATA.md); one parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan. Filters/projections placed on the result are
    pushed into the scan by Catalyst (check ``PushedFilters`` /
    ``ReadSchema`` in ``.explain``)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    timestamp_columns: tuple[str, ...] = (),
    float_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Headered CSV scan with optional declared schema (S1/S2) and
    post-read repair casts (S3, ``glue_job.py:88-89``).

    ``mode=PERMISSIVE`` keeps malformed rows as NULLs instead of
    failing the scan — the behavior the reference's schema-on-read
    DynamicFrame edge provides.
    """
    reader = spark.read.option("header", header).option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    for c in timestamp_columns:
        df = df.withColumn(c, F.to_timestamp(F.col(c)))
    for c in float_columns:
        df = df.withColumn(c, F.col(c).cast("float"))
    return df


CORRUPT_COL = "_corrupt_record"


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """S1 hardened: PERMISSIVE read with malformed lines captured in a
    quarantine frame instead of silently nulled (the
    ``columnNameOfCorruptRecord`` pattern — the production form of the
    reference's schema-on-read edge, ``glue_job.py:78-89``).

    Returns (clean_rows, quarantined_raw_lines). Caveat baked in: Spark
    requires the corrupt column in the schema, and quarantine requires
    a cache/materialization boundary to be referentially stable.
    """
    from pyspark.sql.types import StringType as _Str
    from pyspark.sql.types import StructField as _SF

    full_schema = StructType(
        [*schema.fields, _SF(CORRUPT_COL, _Str(), True)]
    )
    df = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(full_schema)
        .csv(path)
    ).cache()  # required: corrupt-record column is not stable across re-scans
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


#: (applicationId, sf_dir, name) -> analyzed DataFrame. A DataFrame is
#: an immutable plan, so sharing one per table avoids re-running the
#: schema-inference/footer job every time a query rebuilds its inputs
#: (~80ms per table per call; dozens of calls across the registry).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-corpus table from ``{sf_dir}/{name}.parquet``.

    The ``events`` table is written with parquet TIMESTAMP(NANOS),
    which Spark's reader rejects outright. Repair: read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable) and
    rebuild ``ts`` as timestamp_ntz truncated to micros, exactly what
    DuckDB's reader does with the same file. Zero-cost for the other
    tables; at scale this is a pure column expression on the scan.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # timezone-INDEPENDENT nanos->timestamp_ntz (truncating to
            # micros, matching DuckDB's reader): timestamp_micros()
            # would produce an ltz value whose ntz cast depends on the
            # session timezone — wrong under a non-UTC driver session.
            df = df.withColumn(
                "ts",
                F.expr(
                    "make_timestamp_ntz(1970, 1, 1, 0, 0, 0)"
                    " + make_dt_interval(0, 0, 0, ts div 1000000000)"
                    " + make_dt_interval(0, 0, 0,"
                    "   ((ts % 1000000000) div 1000) / 1e6)"
                ),
            )
    else:
        df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table; lazy scans, so unused tables cost nothing."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
