"""Source/sink hardening tests: quarantine reads, compaction, JSON
roundtrip."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    FloatType,
    StringType,
    StructField,
    StructType,
)

from bigdata_pipelines_aws_glue_spark.sources.readers import (
    load_table,
    read_csv_with_quarantine,
)
from bigdata_pipelines_aws_glue_spark.sources.writers import compact_parquet

SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("amount", FloatType(), True),
    ]
)


def test_quarantine_read(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,amount\n"
        "a,1.5\n"
        "b,not_a_number\n"  # malformed float
        "c,2.5\n"
    )
    clean, quarantine = read_csv_with_quarantine(spark, str(p), SCHEMA)
    assert {r["id"] for r in clean.collect()} == {"a", "c"}
    bad = quarantine.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["raw_line"]


def test_compact_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    # fragment: 16 files for a tiny table
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(out)
    n_before = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_before == 16
    rows_before = spark.read.parquet(out).count()
    n_files = compact_parquet(spark, out)
    assert n_files == 1
    n_after = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_after == 1
    assert spark.read.parquet(out).count() == rows_before


def test_json_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_json")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").json(out)
    back = spark.read.schema(events.schema).json(out)
    assert back.count() == events.count()
    a = {r["event_id"] for r in events.select("event_id").collect()}
    b = {r["event_id"] for r in back.select("event_id").collect()}
    assert a == b


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the second built-in columnar format the engine supports
    (same writer contract as parquet: columnar, stats, splittable)."""
    from bigdata_pipelines_aws_glue_spark.sources.writers import write_table

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_table(nation, path, format="orc")
    back = spark.read.orc(path)
    assert back.schema == nation.schema
    assert sorted(r["n_nationkey"] for r in back.collect()) == sorted(
        r["n_nationkey"] for r in nation.collect()
    )


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir):
    """S8 warehouse bulk load (reference redshift_setup.py:175-196):
    write orders over JDBC into embedded Derby, read back with a
    partitioned parallel scan, and verify the round-trip exactly."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.sources.jdbc import (
        DERBY_DRIVER,
        bulk_load_jdbc,
        read_jdbc,
    )

    url = "jdbc:derby:memory:s8db;create=true"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    bulk_load_jdbc(
        orders, url, "ORDERS_WH", driver=DERBY_DRIVER, write_partitions=4
    )
    lo, hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    back = read_jdbc(
        spark,
        url,
        "ORDERS_WH",
        driver=DERBY_DRIVER,
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # genuinely parallel scan
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b

    # idempotent reload (C3 posture): overwrite mode replaces, not appends
    bulk_load_jdbc(
        orders, url, "ORDERS_WH", driver=DERBY_DRIVER, write_partitions=2
    )
    assert read_jdbc(spark, url, "ORDERS_WH", driver=DERBY_DRIVER).count() == orders.count()


def test_bucketed_join_elides_exchange(spark, sf_dir):
    """Bucketed co-located join (r11): with both sides written
    bucketed+sorted on the join key (8 buckets each), the sort-merge
    join plan must contain ZERO Exchange nodes and scan with
    Bucketed: true — the write-once/shuffle-never layout. Also checks
    idempotent re-run (overwrite mode) returns identical rows."""
    from bigdata_pipelines_aws_glue_spark.operators.catalog_rt import (
        bucketed_join_colocation,
    )

    first = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue_cents"])
        for r in bucketed_join_colocation(spark, sf_dir).collect()
    }
    assert first and all(n > 0 for n, _ in first.values())

    app_tag = spark.sparkContext.applicationId.replace("-", "_")
    sf_tag = (
        sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
        + f"_{app_tag}"
    )
    o = spark.table(f"default.bucketed_orders_{sf_tag}")
    c = spark.table(f"default.bucketed_customer_{sf_tag}")
    plan = (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan

    second = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue_cents"])
        for r in bucketed_join_colocation(spark, sf_dir).collect()
    }
    assert second == first
