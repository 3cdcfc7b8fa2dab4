"""Z-order (Morton) data layout + zone-map pruning audit.

At 100 TB the dominant query cost is the scan, and the dominant scan
saver is file skipping: parquet footers carry per-file min/max zone
maps, so a layout that keeps each file's key ranges NARROW on the
columns queries filter by turns a full-table scan into a handful of
file reads (the public technique behind Delta/Iceberg ``OPTIMIZE
ZORDER BY``; Morton 1966). A single-column sort gives perfect
pruning on one column and none on any other; interleaving the bits
of two columns' bucket ranks gives near-sorted locality on BOTH.

``zorder_layout`` assigns every order to one of ``N_FILES`` files by
the top bits of the 16-bit Morton code of (o_custkey, o_orderdate)
— a MAP-ONLY assignment (the high bits of a z-value ARE a recursive
quadrant id, so no global sort or row_number is needed; at cluster
scale this is ``df.repartitionByRange`` on the z-value followed by a
partitioned write) — and emits each file's zone map. The only
non-map work is the two 1-row min/max stats aggregates (broadcast,
the allowlisted scalar-join shape) and the final 64-group rollup.

``zorder_pruning_gain`` then audits the layout the way a scan
planner would: for 16 equal-width customer-key probe ranges, count
the files whose custkey zone intersects, under (a) the z-order
layout and (b) a date-sorted layout (the naive time-partitioned
warehouse default). Date-sorting leaves every file spanning the full
custkey domain — zero skipping on customer probes — while z-order
confines each probe to the files of one bx quadrant band.

Both queries are exact integer arithmetic end-to-end (bucket ranks,
bit interleave via shift/AND, quadrant ids), so the DuckDB twins
hash-check bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: bits per dimension -> 256 bucket ranks each, 16-bit z-values.
BITS = 8
#: top log2(N_FILES) z-bits pick the file: 3 high bits per dimension,
#: an 8x8 quadrant grid.
N_FILES = 64
#: equal-width customer-key probe ranges for the pruning audit.
N_PROBES = 16


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders + integer bucket ranks bx (custkey) / by (orderdate) in
    [0, 2^BITS): rank = floor((v - min) * 2^BITS / span). The 1-row
    domain stats join is the standard broadcast-scalar shape; every
    per-row expression after it is codegen integer math."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("o_orderdate").alias("d_lo"),
        F.max("o_orderdate").alias("d_hi"),
    )
    b = orders.crossJoin(F.broadcast(stats))
    n_buckets = F.lit(float(1 << BITS))
    ck_span = (F.col("ck_hi") - F.col("ck_lo") + F.lit(1)).cast("double")
    dd = F.datediff(F.col("o_orderdate"), F.col("d_lo")).cast("double")
    d_span = (
        F.datediff(F.col("d_hi"), F.col("d_lo")) + F.lit(1)
    ).cast("double")
    bx = F.floor(
        (F.col("o_custkey") - F.col("ck_lo")).cast("double")
        * n_buckets
        / ck_span
    )
    return b.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("o_date"),
        bx.cast("long").alias("bx"),
        F.floor(dd * n_buckets / d_span).cast("long").alias("by"),
    )


def _morton(bx: Column, by: Column) -> Column:
    """16-bit Morton code: bx bits at even positions, by bits odd."""
    z = F.lit(0).cast("long")
    for i in range(BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _zone_maps(df: DataFrame, file_col: Column) -> DataFrame:
    return (
        df.select(file_col.alias("file_id"), "o_custkey", "o_date")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("ck_min"),
            F.max("o_custkey").alias("ck_max"),
            F.min("o_date").alias("date_min"),
            F.max("o_date").alias("date_max"),
        )
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file zone maps of the z-ordered orders layout: file_id is
    the top-6-bit z quadrant (8x8 grid over custkey x orderdate), so
    each file's custkey AND date zones are ~1/8 of their domains —
    the property the pruning audit cashes in."""
    b = _bucketed(spark, sf_dir)
    zix = F.shiftright(_morton(F.col("bx"), F.col("by")), 2 * BITS - 6)
    return _zone_maps(b, zix).orderBy("file_id")


def zorder_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-planner audit: files whose custkey zone intersects each of
    ``N_PROBES`` equal-width custkey probe ranges, under the z-order
    layout vs a date-sorted layout (file = top-6 date bucket bits).
    The probe table is N_PROBES rows (broadcast); each count is a
    zone-interval intersection, exactly what a parquet reader does
    with footer statistics."""
    b = _bucketed(spark, sf_dir)
    z_zones = _zone_maps(
        b, F.shiftright(_morton(F.col("bx"), F.col("by")), 2 * BITS - 6)
    )
    lin_zones = _zone_maps(b, F.shiftright(F.col("by"), BITS - 6))
    stats = load_table(spark, sf_dir, "orders").agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
    )
    probes = (
        spark.range(N_PROBES)
        .withColumnRenamed("id", "probe_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "probe_id",
            (
                F.col("ck_lo")
                + F.floor(
                    F.col("probe_id")
                    * (F.col("ck_hi") - F.col("ck_lo") + 1).cast("double")
                    / F.lit(float(N_PROBES))
                )
            ).cast("long").alias("p_lo"),
            (
                F.col("ck_lo")
                + F.floor(
                    (F.col("probe_id") + 1)
                    * (F.col("ck_hi") - F.col("ck_lo") + 1).cast("double")
                    / F.lit(float(N_PROBES))
                )
                - 1
            ).cast("long").alias("p_hi"),
        )
    )

    def touched(zones: DataFrame, out: str) -> DataFrame:
        hit = (F.col("ck_min") <= F.col("p_hi")) & (
            F.col("ck_max") >= F.col("p_lo")
        )
        return (
            zones.crossJoin(F.broadcast(probes))
            .groupBy("probe_id", "p_lo", "p_hi")
            .agg(F.sum(hit.cast("long")).alias(out))
        )

    z_t = touched(z_zones, "files_zorder")
    l_t = touched(lin_zones, "files_datesorted")
    return (
        z_t.join(l_t, ["probe_id", "p_lo", "p_hi"])
        .select(
            "probe_id",
            "p_lo",
            "p_hi",
            "files_zorder",
            "files_datesorted",
        )
        .orderBy("probe_id")
    )


def write_zorder_orders(spark: SparkSession, sf_dir: str, path: str) -> None:
    """MATERIALIZE the z-order layout as real parquet (round-6 close
    of the audit loop): every order lands in the file of its top-6-bit
    Morton quadrant — ``partitionBy(file_id)`` after a
    ``repartition(N_FILES, file_id)`` so each quadrant directory holds
    exactly ONE data file whose parquet footer min/max ARE the zone
    maps ``zorder_layout`` predicts. The pytest twin
    (tests/test_layout.py) reads the real footers back and asserts
    (a) footer zones == the audited zone maps and (b) the measured
    files-touched-per-probe == ``zorder_pruning_gain``'s counts, so
    the 8-14/64 skip ratio is attested on bytes, not just arithmetic.

    At cluster scale the identical plan is the same map-only
    assignment with ``maxRecordsPerFile`` bounding file size; no
    global sort or window anywhere (the z high bits are the quadrant
    id)."""
    b = _bucketed(spark, sf_dir)
    zix = F.shiftright(_morton(F.col("bx"), F.col("by")), 2 * BITS - 6)
    (
        b.withColumn("file_id", zix)
        .repartition(N_FILES, "file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(path)
    )


def _z_sql(bx: str, by: str) -> str:
    terms = []
    for i in range(BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_BUCKETED_SQL = f"""
st AS MATERIALIZED (
    SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
           min(o_orderdate) AS d_lo, max(o_orderdate) AS d_hi
    FROM orders
),
b AS MATERIALIZED (
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date,
           CAST(floor(CAST(o_custkey - ck_lo AS DOUBLE) * {1 << BITS}.0
                / CAST(ck_hi - ck_lo + 1 AS DOUBLE)) AS BIGINT) AS bx,
           CAST(floor(CAST(date_diff('day', d_lo, o_orderdate) AS DOUBLE)
                * {1 << BITS}.0
                / CAST(date_diff('day', d_lo, d_hi) + 1 AS DOUBLE))
               AS BIGINT) AS by
    FROM orders CROSS JOIN st
)"""

ZORDER_LAYOUT_ORACLE = f"""WITH {_BUCKETED_SQL}
SELECT ({_z_sql('bx', 'by')} >> {2 * BITS - 6}) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
       min(o_date) AS date_min, max(o_date) AS date_max
FROM b
GROUP BY 1
ORDER BY file_id
"""

ZORDER_PRUNING_ORACLE = f"""WITH {_BUCKETED_SQL},
zz AS MATERIALIZED (
    SELECT ({_z_sql('bx', 'by')} >> {2 * BITS - 6}) AS file_id,
           min(o_custkey) AS ck_min, max(o_custkey) AS ck_max
    FROM b GROUP BY 1
),
lz AS MATERIALIZED (
    SELECT (by >> {BITS - 6}) AS file_id,
           min(o_custkey) AS ck_min, max(o_custkey) AS ck_max
    FROM b GROUP BY 1
),
pr AS MATERIALIZED (
    SELECT p.probe_id,
           CAST(ck_lo + floor(p.probe_id
                * CAST(ck_hi - ck_lo + 1 AS DOUBLE) / {N_PROBES}.0)
               AS BIGINT) AS p_lo,
           CAST(ck_lo + floor((p.probe_id + 1)
                * CAST(ck_hi - ck_lo + 1 AS DOUBLE) / {N_PROBES}.0) - 1
               AS BIGINT) AS p_hi
    FROM (SELECT CAST(range AS BIGINT) AS probe_id
          FROM range({N_PROBES})) p
    CROSS JOIN st
)
SELECT pr.probe_id, pr.p_lo, pr.p_hi,
       (SELECT CAST(sum(CASE WHEN z.ck_min <= pr.p_hi
                              AND z.ck_max >= pr.p_lo
                         THEN 1 ELSE 0 END) AS BIGINT) FROM zz z)
         AS files_zorder,
       (SELECT CAST(sum(CASE WHEN l.ck_min <= pr.p_hi
                              AND l.ck_max >= pr.p_lo
                         THEN 1 ELSE 0 END) AS BIGINT) FROM lz l)
         AS files_datesorted
FROM pr
ORDER BY pr.probe_id
"""


def _register() -> None:
    registry.register("zorder_layout", zorder_layout, ZORDER_LAYOUT_ORACLE)
    registry.register(
        "zorder_pruning_gain", zorder_pruning_gain, ZORDER_PRUNING_ORACLE
    )
