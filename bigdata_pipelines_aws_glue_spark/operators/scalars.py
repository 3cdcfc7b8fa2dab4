"""Scalar-function breadth (SURVEY.md §2.8 — the categories the
reference never touches but a complete engine must cover): string,
date/time, and array functions, each as an oracle-checked query over
the corpus. Everything is a native JVM expression (pure map work, no
shuffle except the final aggregations).

Cross-dialect notes baked into the oracles:
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday
  (oracle adds 1).
- Spark ``add_months`` and DuckDB ``+ INTERVAL n MONTH`` both clamp to
  month end — verified equivalent.
- ``collect_list`` order is nondeterministic: always wrap in
  ``sort_array`` (DuckDB: ``list_sort(list(...))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.operators.skew import two_phase_agg
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: concat_ws, substring, upper/lower, length,
    lpad, replace, split+element access, startswith as filter."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment")).alias("tag"),
        F.upper(F.substring("c_mktsegment", 1, 4)).alias("seg4"),
        F.lower("c_name").alias("lname"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "short_name"
        ),
        F.element_at(F.split("c_name", "#"), -1).alias("name_suffix"),
    )


STRING_ORACLE = """
SELECT c_custkey,
       concat_ws('|', c_name, c_mktsegment) AS tag,
       upper(substring(c_mktsegment, 1, 4)) AS seg4,
       lower(c_name) AS lname,
       CAST(length(c_name) AS INT) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       replace(c_name, 'Customer', 'Cust') AS short_name,
       string_split(c_name, '#')[-1] AS name_suffix
FROM customer
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: trunc, quarter, dayofweek/dayofyear,
    last_day, add_months, datediff from a fixed epoch."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.last_day(d).alias("month_end"),
        F.add_months(d.cast("date"), 3).alias("plus3m"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch"
        ),
    )


DATE_ORACLE = """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INT) AS days_since_epoch
FROM orders
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: sorted collect_list, size, distinct count,
    min/max elements, contains — per-order line aggregation. The
    sorted list is emitted SERIALIZED (``array_join``) because the
    driver's pandas canonicalizer cannot factorize list cells — the
    exact failure mode that made ``embedding_quantize_int8`` round 2's
    one red row; same reshape, array semantics still exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("line_numbers_csv"),
            F.size(F.collect_set("l_partkey")).alias("n_distinct_parts"),
            F.array_min(F.collect_list("l_quantity")).alias("min_qty"),
            F.array_max(F.collect_list("l_quantity")).alias("max_qty"),
            F.array_contains(F.collect_list("l_returnflag"), "R").alias(
                "any_returned"
            ),
        )
    )


ARRAY_ORACLE = """
SELECT l_orderkey,
       array_to_string(list_transform(list_sort(list(l_linenumber)),
           x -> CAST(x AS VARCHAR)), ',') AS line_numbers_csv,
       CAST(count(DISTINCT l_partkey) AS INT) AS n_distinct_parts,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       bool_or(l_returnflag = 'R') AS any_returned
FROM lineitem
GROUP BY l_orderkey
"""


def skew_safe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting helper through the correctness gate: two-phase
    (partial-on-salt, final-on-key) aggregation over a pre-quantized
    integer measure — exact regardless of salt bucketing, so it
    hash-matches the straight GROUP BY oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * 10000.0 + 0.5).alias("qty_q"),
        F.lit(1).alias("cnt"),
    )
    out = two_phase_agg(
        li, ["l_returnflag"], {"qty_q": "sum", "cnt": "count"}, buckets=8
    )
    return out.select(
        "l_returnflag",
        stable_round(F.col("qty_q") / 10000.0, 2).alias("sum_qty"),
        F.col("cnt").alias("n_rows"),
    )


SKEW_ORACLE = """
SELECT l_returnflag,
       floor(((sum(floor(l_quantity * 10000.0 + 0.5)) / 10000.0)) * 100.0 + 0.5)
         / 100.0 AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def salted_join_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting helper's JOIN form through the correctness gate
    (r11, completing the named skew toolkit: salted agg was attested
    r6, AQE skew-join is session config, this is the manual
    replicate-and-salt join for when neither applies): lineitem (the
    big, potentially key-skewed side) salted over 8 buckets, the
    supplier+nation dimension replicated per salt, joined on
    (suppkey, salt) — row-identical to the plain join, so the
    straight-join DuckDB twin hash-matches. Revenue quantizes to
    cents per row BEFORE the sum (identical double parse tree both
    engines), summed in long domain."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import (
        salted_skew_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.floor(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            * F.lit(100)
            + F.lit(0.5)
        ).alias("rev_cents"),
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    joined = salted_skew_join(li, supp, ["s_suppkey"], buckets=8)
    return joined.groupBy("n_name").agg(
        F.sum("rev_cents").cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


SALTED_JOIN_ORACLE = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract (group), replace, match-filter. Patterns
    stay in the RE2 ∩ Java-regex common subset so Spark and DuckDB
    agree (no lookaround, no backrefs); both engines return '' on
    no-match for extract."""
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    # argmin via min_by: one partial-aggregatable pass, no global sort
    first_cust = cust.agg(
        F.min_by("c_name", "c_custkey").alias("c_name")
    )
    joined = part.crossJoin(F.broadcast(first_cust))
    return joined.filter(
        F.col("p_name").rlike("^(red|blue|hot|small) ")
    ).select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "^([a-z]+) ", 1).alias("color_word"),
        F.regexp_extract(F.col("p_name"), " ([a-z]+)$", 1).alias("noun"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("consonants"),
        F.regexp_extract(F.col("c_name"), "([0-9]+)", 1).alias("cust_digits"),
    )


REGEX_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+) ', 1) AS color_word,
       regexp_extract(p_name, ' ([a-z]+)$', 1) AS noun,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
       regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits
FROM part
CROSS JOIN (SELECT c_name FROM customer ORDER BY c_custkey LIMIT 1)
WHERE regexp_matches(p_name, '^(red|blue|hot|small) ')
"""


def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 ``CREATE FUNCTION``, round 6):
    a SCALAR SQL UDF for the quantized line revenue and a TABLE
    function for the returned-flag filter set, both used in one rollup.
    Unlike Python UDFs, SQL UDFs are expanded by Catalyst INTO the
    plan (macro semantics) — the aggregate stays whole-stage-codegen
    with zero serialization, which is why this is the right tool for
    shared business expressions at 100 TB. The sum carries
    decimal(38,0) per the round's dec_qsum discipline. The DuckDB
    twin inlines the same expressions (macro equivalence is the
    semantic point)."""
    from bigdata_pipelines_aws_glue_spark.sql import register_corpus_views

    register_corpus_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION line_rev_q4(p DOUBLE,"
        " d DOUBLE) RETURNS BIGINT"
        " RETURN CAST(floor(p * (1.0 - d) * 10000.0 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION returned_flags()"
        " RETURNS TABLE(m STRING)"
        " RETURN SELECT * FROM (VALUES ('A'), ('R')) t(m)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(floor((CAST(sum(CAST(line_rev_q4(l_extendedprice,
                                                     l_discount)
                                         AS DECIMAL(38,0))) AS DOUBLE)
                           / 10000.0) * 100.0 + 0.5) / 100.0
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN returned_flags() ON l_returnflag = m
        GROUP BY l_returnflag
        """
    )


SQL_UDF_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       floor((sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                             * 10000.0 + 0.5) AS BIGINT))
              / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem JOIN (VALUES ('A'), ('R')) t(m) ON l_returnflag = m
GROUP BY l_returnflag
"""


def safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` error-safe expression family (ANSI-mode
    companion, round 6): under Spark 4's ANSI-on default, a single
    bad row — divide-by-zero, overflow, malformed cast — KILLS the
    whole 100 TB job unless the pipeline opts into NULL-on-error via
    try_divide / try_add / try_cast. This query exercises each form
    with deterministic triggers and aggregates the NULL/non-NULL
    split per order status, so the oracle attests both the error
    semantics and the surviving values."""
    orders = load_table(spark, sf_dir, "orders")
    div = F.expr(
        "try_divide(o_totalprice, CAST(o_custkey % 5 AS DOUBLE))"
    )
    # +1: the corpus contains o_orderkey = 0, which would not overflow
    overflow = F.expr("try_add(9223372036854775807L, o_orderkey + 1L)")
    bad_cast = F.expr("try_cast(o_orderpriority AS INT)")
    prio_num = F.expr(
        "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
    )
    from bigdata_pipelines_aws_glue_spark.functions.rounding import dec_qsum

    return (
        orders.select(
            "o_orderstatus",
            div.alias("d"),
            overflow.alias("ovf"),
            bad_cast.alias("bad"),
            prio_num.alias("p"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("d").isNull().cast("long")).alias("n_div_by_zero"),
            stable_round(
                dec_qsum(F.coalesce(F.col("d"), F.lit(0.0)), 10000.0)
                .cast("double")
                / F.lit(10000.0),
                2,
            ).alias("sum_safe_div"),
            F.sum(F.col("ovf").isNull().cast("long")).alias("n_overflow"),
            F.sum(F.col("bad").isNull().cast("long")).alias("n_bad_cast"),
            F.min("p").alias("min_prio"),
            F.max("p").alias("max_prio"),
        )
    )


SAFE_ARITH_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_by_zero,
       floor(((sum(CAST(floor(coalesce(o_totalprice
                                       / nullif(CAST(o_custkey % 5 AS DOUBLE),
                                                0.0), 0.0)
                             * 10000.0 + 0.5) AS BIGINT)) / 10000.0))
             * 100.0 + 0.5) / 100.0 AS sum_safe_div,
       count(*) AS n_overflow,
       count(*) AS n_bad_cast,
       CAST(min(TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)) AS INT)
         AS min_prio,
       CAST(max(TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)) AS INT)
         AS max_prio
FROM orders
GROUP BY o_orderstatus
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type surface (round 6 — the remaining complex type beside
    arrays/structs/variant): props parsed as ``map<string,bigint>``
    via from_json, then element_at lookups, map_contains_key,
    map_concat with a literal map, and the map higher-order functions
    ``transform_values`` / ``map_filter`` — all native JVM
    expressions. The doubled-value identity (Σ transform_values ==
    2Σ) rides through the aggregation, so the oracle attests the HOF
    actually ran."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    enriched = F.map_concat(m, F.create_map(F.lit("one"), F.lit(1).cast("bigint")))
    doubled = F.transform_values(m, lambda k, v: v * 2)
    only_big = F.map_filter(m, lambda k, v: v >= 50)
    return (
        events.select(
            "event_type",
            F.element_at(m, "k").alias("k"),
            F.element_at(enriched, "one").alias("one"),
            F.element_at(doubled, "k").alias("k2"),
            F.size(only_big).alias("n_big"),
            F.map_contains_key(m, "k").alias("has_k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.sum("k2").alias("sum_k_doubled"),
            F.sum("one").alias("sum_ones"),
            F.sum("n_big").alias("n_k_ge_50"),
            F.min("has_k").alias("all_have_k"),
        )
    )


MAP_FUNCTIONS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) * 2 AS BIGINT)
         AS sum_k_doubled,
       CAST(count(*) AS BIGINT) AS sum_ones,
       CAST(sum(CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_k_ge_50,
       TRUE AS all_have_k
FROM events
GROUP BY event_type
"""


def xml_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML expressions (Spark 4 ``to_xml``/``from_xml``, round
    6 — the interchange format the built-in sources gained in 4.0):
    serialize each order to an XML document, parse it back with a
    declared schema, and aggregate FROM THE PARSED fields with a
    per-row round-trip fidelity boolean. Money rides as integer
    cents so text formatting can't perturb values. DuckDB has no XML
    — the twin computes the same aggregate directly from the
    original columns, so a hash match proves serialize→parse is
    lossless end-to-end."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    xml = F.to_xml(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            cents.alias("c"),
        )
    )
    p = F.from_xml(xml, "k bigint, s string, c bigint")
    rows = orders.select(
        F.col("o_orderkey"),
        cents.alias("cents0"),
        F.col("o_orderstatus"),
        p.alias("p"),
    )
    ok = (
        (F.col("p.k") == F.col("o_orderkey"))
        & (F.col("p.s") == F.col("o_orderstatus"))
        & (F.col("p.c") == F.col("cents0"))
    )
    from bigdata_pipelines_aws_glue_spark.functions.rounding import dec_qsum

    return (
        rows.groupBy(F.col("p.s").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(ok).alias("all_roundtrip_ok"),
            stable_round(
                F.sum(F.col("p.c").cast("decimal(38,0)")).cast("double")
                / F.lit(100.0),
                2,
            ).alias("revenue"),
        )
    )


XML_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       TRUE AS all_roundtrip_ok,
       floor((sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              / 100.0) * 100.0 + 0.5) / 100.0 AS revenue
FROM orders
GROUP BY o_orderstatus
"""


def _register() -> None:
    registry.register("sql_udf_revenue", sql_udf_revenue, SQL_UDF_ORACLE)
    registry.register("safe_arithmetic", safe_arithmetic, SAFE_ARITH_ORACLE)
    registry.register("map_functions", map_functions, MAP_FUNCTIONS_ORACLE)
    registry.register(
        "xml_roundtrip_orders", xml_roundtrip_orders, XML_ROUNDTRIP_ORACLE
    )
    registry.register("string_functions", string_functions, STRING_ORACLE)
    registry.register("regex_functions", regex_functions, REGEX_ORACLE)
    registry.register("date_functions", date_functions, DATE_ORACLE)
    registry.register("array_functions", array_functions, ARRAY_ORACLE)
    registry.register("skew_safe_agg", skew_safe_agg, SKEW_ORACLE)
    registry.register(
        "salted_join_supplier_revenue",
        salted_join_supplier_revenue,
        SALTED_JOIN_ORACLE,
    )
