"""Data-quality profiling and storage-layout operators.

The reference pipeline trusts its inputs blindly (no validation
anywhere in ``glue_job.py``; the catalog DDL at
``redshift_setup.py:209-243`` just declares types) — any production
deployment of it needs exactly these checks in front of the
transform. Both operators are single-pass, partial-aggregatable
DataFrame plans.

Scale posture:
- ``dq_profile``: the per-column null/distinct profile is ONE
  groupBy-free aggregate (map-side combine all the way); the
  orphan-FK check is a broadcast anti-join against the distinct key
  set of the dimension (at 100 TB the dimension key set is still the
  small side; if it weren't, AQE falls back to a shuffled hash join).
- ``zorder_layout_key``: interleaving bits of two low-cardinality
  bucket ids is a pure projection. Writing a table sorted by the
  z-value co-locates rows that are close in BOTH dimensions into the
  same parquet row groups, so min/max row-group stats prune 2-D range
  predicates — the standard lakehouse layout trick for scan-bound
  workloads. The sort itself is the usual global range-partition
  sort; no extra shuffle beyond what any re-layout write pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.functions.rounding import stable_round
from bigdata_pipelines_aws_glue_spark.hints import maybe_broadcast
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality report for the orders fact: row count,
    per-column null counts, primary-key duplication, and referential
    orphans against the customer dimension."""
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    orphans = (
        orders.join(
            maybe_broadcast(cust_keys),
            orders.o_custkey == cust_keys.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphan_custkey"))
    )
    nulls = lambda c: F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")  # noqa: E731
    profile = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct_orderkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_dup_orderkey"),
        nulls("o_custkey"),
        nulls("o_orderdate"),
        nulls("o_totalprice"),
    )
    return profile.crossJoin(F.broadcast(orphans))


DQ_PROFILE_ORACLE = """
SELECT (SELECT count(*) FROM orders) AS n_rows,
       (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct_orderkey,
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_dup_orderkey,
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_o_custkey,
       (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS null_o_orderdate,
       (SELECT count(*) FROM orders WHERE o_totalprice IS NULL) AS null_o_totalprice,
       (SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_orphan_custkey
"""

_ZBITS = 10


def _interleave_bits(a: Column, b: Column, bits: int = _ZBITS) -> Column:
    """z = interleave(a, b): bit i of ``a`` lands at 2i+1, bit i of
    ``b`` at 2i. Pure integer expression — codegen-eligible, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            .bitwiseOR(F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i + 1))
            .bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i))
        )
    return z


def _sql_interleave(a: str, b: str, bits: int = _ZBITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) << {i + 1})")
        terms.append(f"(({b} & {1 << i}) << {i})")
    return " | ".join(terms)


def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (customer bucket, price
    bucket): the 2-D clustering key used to sort a table before a
    partitioned write so parquet row-group min/max stats prune range
    predicates on EITHER dimension. Emits per-z-prefix row counts —
    the file-size planning view a layout compactor consumes.
    """
    orders = load_table(spark, sf_dir, "orders")
    ckey = (F.col("o_custkey") % 1024).cast("long")
    pkey = F.floor(F.col("o_totalprice") / F.lit(500.0)).cast("long")
    z = _interleave_bits(ckey, pkey)
    return (
        orders.select(z.alias("zval"))
        .groupBy(F.shiftright(F.col("zval"), 12).alias("z_prefix"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


ZORDER_ORACLE = f"""
WITH z AS (
  SELECT ({_sql_interleave("(o_custkey % 1024)",
                           "CAST(floor(o_totalprice / 500.0) AS BIGINT)")}) AS zval
  FROM orders
)
SELECT zval >> 12 AS z_prefix, count(*) AS n_rows
FROM z GROUP BY 1
"""


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style verification suite (public pattern: Schelter et
    al., VLDB 2018 "Automating Large-Scale Data Quality
    Verification"): one row per declared constraint with the measured
    violation metric and a pass/fail verdict — the report a
    production ingestion gate publishes per load, where
    ``dq_profile`` is the single-table metric row.

    Constraints: PK uniqueness, completeness, two referential checks
    (orders→customer, lineitem→orders), value-range checks, a
    cross-column consistency check (documents.n_chars == actual
    length), and a dimension-cardinality pin (region == 5).

    Scale posture: one aggregation pass per table (constraint
    metrics share the scan via multi-aggregate), anti-joins for the
    referential checks (customer keys broadcast; lineitem→orders
    stays a shuffled anti-join — at 100 TB the orders key set is not
    broadcastable and AQE picks the strategy). Output is ~9 rows:
    driver-safe always."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")
    region = load_table(spark, sf_dir, "region")

    def verdict(df: DataFrame, table: str, name: str, passed) -> DataFrame:
        return df.select(
            F.lit(table).alias("table_name"),
            F.lit(name).alias("check_name"),
            F.col("metric").cast("long").alias("metric"),
            passed.alias("passed"),
        )

    zero_ok = F.col("metric") == 0
    o = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
    )
    l = lineitem.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("bad_qty"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
        ).alias("bad_disc"),
    )
    orphan_o = orders.join(
        maybe_broadcast(customer.select("c_custkey").distinct()),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("metric"))
    orphan_l = lineitem.join(
        orders.select("o_orderkey").distinct(),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("metric"))
    ev = events.agg(
        F.count(F.when(F.col("value") < 0, 1)).alias("metric")
    )
    d = documents.agg(
        F.count(
            F.when(F.col("n_chars") != F.length(F.col("text")), 1)
        ).alias("metric")
    )
    r = region.agg(F.count(F.lit(1)).alias("metric"))

    parts = [
        verdict(
            o.select(F.col("dup_pk").alias("metric")),
            "orders", "pk_unique_o_orderkey", zero_ok,
        ),
        verdict(
            o.select(F.col("null_cust").alias("metric")),
            "orders", "complete_o_custkey", zero_ok,
        ),
        verdict(orphan_o, "orders", "fk_orders_customer", zero_ok),
        verdict(orphan_l, "lineitem", "fk_lineitem_orders", zero_ok),
        verdict(
            l.select(F.col("bad_qty").alias("metric")),
            "lineitem", "range_l_quantity_1_50", zero_ok,
        ),
        verdict(
            l.select(F.col("bad_disc").alias("metric")),
            "lineitem", "range_l_discount_0_01", zero_ok,
        ),
        verdict(ev, "events", "nonneg_value", zero_ok),
        verdict(d, "documents", "len_consistency_n_chars", zero_ok),
        verdict(r, "region", "dim_region_count_5", F.col("metric") == 5),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DQ_EXPECTATIONS_ORACLE = """
SELECT 'orders' AS table_name, 'pk_unique_o_orderkey' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS metric,
       count(*) = count(DISTINCT o_orderkey) AS passed
FROM orders
UNION ALL
SELECT 'orders', 'complete_o_custkey',
       CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT),
       count(CASE WHEN o_custkey IS NULL THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'orders', 'fk_orders_customer', m, m = 0 FROM (
    SELECT CAST(count(*) AS BIGINT) AS m
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL)
UNION ALL
SELECT 'lineitem', 'fk_lineitem_orders', m, m = 0 FROM (
    SELECT CAST(count(*) AS BIGINT) AS m
    FROM lineitem li
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON li.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL)
UNION ALL
SELECT 'lineitem', 'range_l_quantity_1_50',
       CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
            AS BIGINT),
       count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'lineitem', 'range_l_discount_0_01',
       CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
            AS BIGINT),
       count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'events', 'nonneg_value',
       CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT),
       count(CASE WHEN value < 0 THEN 1 END) = 0
FROM events
UNION ALL
SELECT 'documents', 'len_consistency_n_chars',
       CAST(count(CASE WHEN n_chars <> length(text) THEN 1 END) AS BIGINT),
       count(CASE WHEN n_chars <> length(text) THEN 1 END) = 0
FROM documents
UNION ALL
SELECT 'region', 'dim_region_count_5',
       CAST(count(*) AS BIGINT), count(*) = 5
FROM region
"""


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic fabricated-
    numbers screen (Benford 1938; Nigrini's forensic-accounting
    standard): the leading digit of naturally-occurring amounts
    follows P(d) = log10(1 + 1/d), and a chi-square distance from
    that curve flags synthetic or manipulated figures. (This corpus's
    totals are uniform-ish synthetics, so the audit correctly reports
    a LARGE chi-square — the detector detecting.)

    Determinism: leading digit via STRING head of exact integer cents
    (no log10 on data values); expected shares are 1e-12-quantized
    constants; each chi-square term is fixed-order double arithmetic
    on (exact count, quantized constant). One map-side-combinable
    9-group aggregate + a 9-row digit spine, joined to the 1-row
    total (whitelisted scalar broadcast)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    obs = (
        orders.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    p = F.floor(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * F.lit(1000000000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000000000.0)
    joined = (
        spine.join(obs, "digit", "left")
        .select("digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs"))
        .crossJoin(tot)
        .withColumn("p_expected", p)
    )
    exp_n = F.col("n_total").cast("double") * F.col("p_expected")
    dev = F.col("n_obs").cast("double") - exp_n
    return joined.select(
        "digit",
        "n_obs",
        stable_round(exp_n, 4).alias("expected_n"),
        stable_round(dev * dev / exp_n, 6).alias("chi2_term"),
    ).orderBy("digit")


BENFORD_ORACLE = """
WITH obs AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           count(*) AS n_obs
    FROM orders GROUP BY 1
),
spine AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs),
j AS (
    SELECT s.digit, coalesce(o.n_obs, 0) AS n_obs, t.n_total,
           floor(ln(1.0::DOUBLE + 1.0::DOUBLE / CAST(s.digit AS DOUBLE))
                 / ln(10.0::DOUBLE) * 1000000000000.0 + 0.5)
             / 1000000000000.0 AS p_expected
    FROM spine s LEFT JOIN obs o ON s.digit = o.digit CROSS JOIN tot t
)
SELECT digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       floor((CAST(n_total AS DOUBLE) * p_expected) * 10000.0 + 0.5) / 10000.0
           AS expected_n,
       floor(((CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p_expected)
              * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p_expected)
              / (CAST(n_total AS DOUBLE) * p_expected))
             * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
FROM j
ORDER BY digit
"""


def key_continuity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit of ``o_orderkey`` (TPC-H keys are
    sparse BY DESIGN — the audit should prove it, not assume it):
    island/gap statistics computed WITHOUT a global sort. The classic
    gaps-and-islands ``key - row_number()`` trick needs one globally
    ordered window (a SinglePartition plan); neighbor anti-joins get
    the same island census from keyed shuffles only: a key opens an
    island iff ``key-1`` is absent, closes one iff ``key+1`` is
    absent, and islands == opens (every island has exactly one).
    Per-island LENGTHS would need the ordered pairing of opens with
    closes — deliberately out of scope for the summary (that is the
    one part which genuinely requires ordering)."""
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    prev = keys.select((F.col("k") + 1).alias("k"))
    nxt = keys.select((F.col("k") - 1).alias("k"))
    opens = keys.join(prev, "k", "left_anti")
    closes = keys.join(nxt, "k", "left_anti")
    singles = opens.join(closes.select("k"), "k", "left_semi")
    stats = keys.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    counts = (
        opens.agg(F.count(F.lit(1)).alias("n_islands"))
        .crossJoin(singles.agg(F.count(F.lit(1)).alias("n_singletons")))
        .crossJoin(stats)
    )
    span = F.col("max_key") - F.col("min_key") + 1
    return counts.select(
        "n_keys",
        "min_key",
        "max_key",
        "n_islands",
        "n_singletons",
        (F.col("n_keys") - F.col("n_islands")).alias("n_adjacent_pairs"),
        stable_round(
            F.col("n_keys").cast("double") / span.cast("double"), 9
        ).alias("density"),
    )


KEY_CONTINUITY_ORACLE = """
WITH keys AS (SELECT o_orderkey AS k FROM orders),
opens AS (
    SELECT k FROM keys
    WHERE NOT EXISTS (SELECT 1 FROM keys p WHERE p.k = keys.k - 1)
),
closes AS (
    SELECT k FROM keys
    WHERE NOT EXISTS (SELECT 1 FROM keys n WHERE n.k = keys.k + 1)
),
singles AS (SELECT k FROM opens WHERE k IN (SELECT k FROM closes))
SELECT (SELECT count(*) FROM keys) AS n_keys,
       (SELECT min(k) FROM keys) AS min_key,
       (SELECT max(k) FROM keys) AS max_key,
       (SELECT count(*) FROM opens) AS n_islands,
       (SELECT count(*) FROM singles) AS n_singletons,
       (SELECT count(*) FROM keys) - (SELECT count(*) FROM opens)
           AS n_adjacent_pairs,
       floor((CAST((SELECT count(*) FROM keys) AS DOUBLE)
              / CAST((SELECT max(k) FROM keys)
                     - (SELECT min(k) FROM keys) + 1 AS DOUBLE))
             * 1000000000.0 + 0.5) / 1000000000.0 AS density
"""




# ---------------------------------------------------------------------------
# Order-independent table checksums (migration validation)
# ---------------------------------------------------------------------------

#: Mersenne prime 2^61 - 1: the checksum emits the exact decimal sum
#: reduced mod this, so the output is a plain BIGINT (the registry's
#: no-raw-DECIMAL rule) while the accumulation stays overflow-exact.
_CKSUM_MOD = (1 << 61) - 1


def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksums for the three volume
    tables — THE migration-validation primitive: after replatforming
    a pipeline (the reference's own story is a warehouse migration),
    "same row count AND same content checksum on both systems" is
    the cheapest end-to-end equality proof that needs no row-level
    diff and no common sort order.

    Each row canonicalizes to a '|'-joined string of its key columns
    and exact-cents measures (dates as ISO strings — identical casts
    both engines), hashes through the repo's 60-bit md5 prefix, and
    the hashes SUM (commutative -> partition-order independent) in
    decimal(38,0)/HUGEINT — exact up to ~1e38, i.e. ~1e19 rows —
    then reduce mod 2^61-1 to a plain BIGINT. One scan per table,
    map-side partial sums, a 3-row union output."""
    h60 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c), 1, 15), 16, 10
    ).cast("long")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )

    def summary(df, name, canon):
        return df.select(
            h60(canon).cast("decimal(38,0)").alias("h")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum("h") % F.lit(_CKSUM_MOD)).cast("long").alias("checksum"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "checksum")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    o = summary(
        orders,
        "orders",
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            cents("o_totalprice").cast("string"),
            F.to_date("o_orderdate").cast("string"),
            F.col("o_orderpriority"),
        ),
    )
    li = summary(
        lineitem,
        "lineitem",
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_quantity").cast("long").cast("string"),
            cents("l_extendedprice").cast("string"),
            F.to_date("l_shipdate").cast("string"),
        ),
    )
    c = summary(
        customer,
        "customer",
        F.concat_ws(
            "|",
            F.col("c_custkey").cast("string"),
            F.col("c_mktsegment"),
            F.col("c_nationkey").cast("string"),
            cents("c_acctbal").cast("string"),
        ),
    )
    return o.unionAll(li).unionAll(c)


CKSUM_ORACLE = f"""
WITH o AS (
    SELECT 'orders' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(('0x' || substring(md5(
               CAST(o_orderkey AS VARCHAR) || '|'
               || CAST(o_custkey AS VARCHAR) || '|'
               || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS VARCHAR) || '|'
               || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|'
               || o_orderpriority), 1, 15))::BIGINT::HUGEINT)
               % {_CKSUM_MOD} AS BIGINT) AS checksum
    FROM orders
),
li AS (
    SELECT 'lineitem',
           CAST(count(*) AS BIGINT),
           CAST(sum(('0x' || substring(md5(
               CAST(l_orderkey AS VARCHAR) || '|'
               || CAST(l_linenumber AS VARCHAR) || '|'
               || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '|'
               || CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS VARCHAR) || '|'
               || CAST(CAST(l_shipdate AS DATE) AS VARCHAR)), 1, 15)
               )::BIGINT::HUGEINT) % {_CKSUM_MOD} AS BIGINT)
    FROM lineitem
),
c AS (
    SELECT 'customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(('0x' || substring(md5(
               CAST(c_custkey AS VARCHAR) || '|'
               || c_mktsegment || '|'
               || CAST(c_nationkey AS VARCHAR) || '|'
               || CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS VARCHAR)), 1, 15))::BIGINT::HUGEINT)
               % {_CKSUM_MOD} AS BIGINT)
    FROM customer
)
SELECT * FROM o UNION ALL SELECT * FROM li UNION ALL SELECT * FROM c
"""


def _register() -> None:
    registry.register("dq_profile", dq_profile, DQ_PROFILE_ORACLE)
    registry.register("benford_first_digit", benford_first_digit, BENFORD_ORACLE)
    registry.register(
        "key_continuity_audit", key_continuity_audit, KEY_CONTINUITY_ORACLE
    )
    registry.register("zorder_layout_key", zorder_layout_key, ZORDER_ORACLE)
    registry.register("dq_expectations", dq_expectations, DQ_EXPECTATIONS_ORACLE)
    registry.register(
        "table_checksum_audit", table_checksum_audit, CKSUM_ORACLE
    )
