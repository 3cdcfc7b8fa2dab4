"""Catalog round-trip as a driver-attested query (SURVEY.md §2.1
S4-S7).

The catalog layer (``sources/catalog.py`` — external-table
registration, MSCK partition discovery; the reference's
redshift_setup.py:48-121 Glue/Athena path) was previously
pytest-only. This query moves it onto the hard correctness signal:
write ``orders`` through the partitioned parquet sink, register an
EXTERNAL table over the written layout, run MSCK partition discovery,
read the data back THROUGH the catalog, and aggregate. The DuckDB
twin computes the same aggregate straight from the source table, so a
hash match proves the sink + external table + partition discovery +
catalog read path preserved every row and value.

Money sums as exact cents (LONG both engines) — aggregation-order
independent.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.catalog import (
    register_external_table,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
from bigdata_pipelines_aws_glue_spark.sources.writers import (
    write_bucketed_table,
    write_partitioned_parquet,
    write_table,
)

#: Registered in the always-present ``default`` database: CREATE
#: DATABASE would mkdir under the session's warehouse dir, which a
#: read-only driver cwd could refuse; the external table itself needs
#: no warehouse storage. The table name embeds the SF (like the
#: scratch path) so checks at different scales sharing one metastore
#: cannot re-point each other's table between registration and read.
_TABLE_PREFIX = "catalog_rt_orders"


def catalog_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5+S6+S7 in one attested pass: partitioned sink → external
    table → MSCK → catalog read → aggregate. Partitioning by order
    status exercises partition-column reconstruction from the Hive
    layout (the value leaves the files and comes back from directory
    names). Scratch location AND table name are per-SF so concurrent
    checks at different scales sharing one metastore can't re-point
    each other's table between registration and read; overwrite mode
    keeps re-runs idempotent (C3)."""
    orders = load_table(spark, sf_dir, "orders")
    sf_tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    )
    loc = os.path.join(
        tempfile.gettempdir(), f"spark_graft_catalog_rt_{sf_tag}"
    )
    table = f"{_TABLE_PREFIX}_{sf_tag}"
    write_partitioned_parquet(orders, loc, partition_col="o_orderstatus")
    register_external_table(
        spark, table, loc, database="default", partition_cols=("o_orderstatus",)
    )
    back = spark.table(f"default.{table}")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # cents sums stay long-domain deliberately (round-6 decimal
        # sweep): wrap needs > $9e13 per status group; output is long
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("revenue_cents"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


CATALOG_RT_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus
"""


def bucketed_join_colocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed CO-LOCATED join on the hard signal (r11): orders and
    customer are written as EXTERNAL bucketed+sorted tables (8
    buckets on the join key each side), read back through the
    catalog, and sort-merge-joined — with matching bucketing on both
    sides Spark elides the join Exchange entirely (pinned by pytest:
    the join plan has SortMergeJoin and ZERO Exchange nodes). This is
    the write-once/shuffle-never layout a 100 TB fact table wants for
    its repeated key joins; the shuffle cost moves to write time.
    The aggregate after the join hashes against a straight
    join-from-parquet DuckDB twin, proving the bucketed write+read
    path preserved every row. Names/paths are per-(SF, Spark app):
    the applicationId suffix keeps two concurrent drivers against the
    same SF from racing each other's overwrite (ADVICE r11) while
    re-runs within one session stay idempotent (C3, overwrite mode)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    app_tag = spark.sparkContext.applicationId.replace("-", "_")
    sf_tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    ) + f"_{app_tag}"
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_bucketed_{sf_tag}")
    o_table = f"bucketed_orders_{sf_tag}"
    c_table = f"bucketed_customer_{sf_tag}"
    write_bucketed_table(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        o_table,
        os.path.join(base, "orders"),
        "o_custkey",
    )
    write_bucketed_table(
        customer.select("c_custkey", "c_mktsegment"),
        c_table,
        os.path.join(base, "customer"),
        "c_custkey",
    )
    o = spark.table(f"default.{o_table}")
    c = spark.table(f"default.{c_table}")
    joined = o.hint("merge").join(c, o.o_custkey == c.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("revenue_cents"),
    )


BUCKETED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def jsonl_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-interchange edge on the hard signal: write ``events`` to
    JSON-lines through the format-agnostic sink, read it back with the
    declared schema, aggregate. JSON is the round-trip-lossy-prone
    format (timestamps become ISO strings, doubles become decimal
    text), so the hash match against the parquet-direct DuckDB twin
    proves the writer/reader pair preserves micros-precision
    timestamps and every double bit (Spark emits shortest-round-trip
    decimal repr). Money-style sums quantized to exact integer cents;
    the raw-double min/max ride through unreduced."""
    events = load_table(spark, sf_dir, "events")
    sf_tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    )
    loc = os.path.join(tempfile.gettempdir(), f"spark_graft_jsonl_rt_{sf_tag}")
    # Spark's default JSON timestamp pattern carries millis only; the
    # corpus carries micros. Pin a micros NTZ pattern on BOTH edges —
    # the oracle mismatch without it (xx.824000 vs xx.824425) is the
    # exact lossiness this query exists to catch.
    ntz_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    write_table(events, loc, format="json", timestampNTZFormat=ntz_fmt)
    back = (
        spark.read.schema(events.schema)
        .option("timestampNTZFormat", ntz_fmt)
        .json(loc)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("value_cents"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-interchange edge on the hard signal: write ``lineitem``
    to ORC through the format-agnostic sink, read it back, aggregate.
    ORC is Spark's second built-in columnar analytic format (same
    min/max row-group statistics contract as parquet — the S4
    alternative storage the reference's Athena/warehouse layer could
    point at), and unlike JSON it must preserve doubles and
    ``timestamp_ntz`` natively rather than through text. The DuckDB
    twin aggregates the source parquet directly, so a hash match
    proves the ORC writer/reader pair is value-lossless for every
    type the fact table carries. Money/quantity sums as exact integer
    cents (LONG both engines) — aggregation-order independent."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    sf_tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    )
    loc = os.path.join(tempfile.gettempdir(), f"spark_graft_orc_rt_{sf_tag}")
    write_table(lineitem, loc, format="orc")
    back = spark.read.schema(lineitem.schema).orc(loc)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("qty_cents"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("price_cents"),
        F.count_distinct(F.col("l_orderkey")).alias("n_orders"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


ORC_RT_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_lines,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS qty_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS price_cents,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       min(l_shipdate) AS first_ship,
       max(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def csv_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining interchange edge (S1/S2's read side already runs
    on CSV in ``plans/reference_pipeline.py``; this attests the WRITE
    side): ``customer`` -> CSV sink (header) -> declared-schema
    read-back -> aggregate vs the parquet-direct DuckDB twin. The
    risky types here are DOUBLE-through-text (Spark emits
    shortest-round-trip decimals; the min/max acctbal ride through
    unreduced so one ulp of loss anywhere flips the hash) and
    BIGINT/INT re-parsing. The corpus strings are delimiter-free;
    arbitrary-text escaping is jsonl_roundtrip_events' job."""
    customer = load_table(spark, sf_dir, "customer")
    sf_tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    )
    loc = os.path.join(tempfile.gettempdir(), f"spark_graft_csv_rt_{sf_tag}")
    write_table(customer, loc, format="csv", header="true")
    back = (
        spark.read.schema(customer.schema).option("header", "true").csv(loc)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count_distinct(F.col("c_nationkey")).alias("n_nations"),
        F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("acctbal_cents"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.min("c_name").alias("first_name"),
        F.max("c_name").alias("last_name"),
    )


CSV_RT_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS acctbal_cents,
       min(c_acctbal) AS min_acctbal,
       max(c_acctbal) AS max_acctbal,
       min(c_name) AS first_name,
       max(c_name) AS last_name
FROM customer
GROUP BY c_mktsegment
"""


JSONL_RT_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
"""


def _register() -> None:
    registry.register(
        "catalog_roundtrip_orders", catalog_roundtrip_orders, CATALOG_RT_ORACLE
    )
    registry.register(
        "bucketed_join_colocation",
        bucketed_join_colocation,
        BUCKETED_JOIN_ORACLE,
    )
    registry.register(
        "jsonl_roundtrip_events", jsonl_roundtrip_events, JSONL_RT_ORACLE
    )
    registry.register(
        "orc_roundtrip_lineitem", orc_roundtrip_lineitem, ORC_RT_ORACLE
    )
    registry.register(
        "csv_roundtrip_customer", csv_roundtrip_customer, CSV_RT_ORACLE
    )
