"""Physical-plan discipline (SURVEY.md §4): filters and projections
must reach the parquet scan, and approximate aggregates must track
their exact counterparts. These are the properties that decide whether
a plan survives a 100× scale-up, asserted mechanically."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_shipdate") >= "1995-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    plan = _formatted_plan(q)
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0], (
        "ship-date predicate did not reach the scan:\n" + plan
    )


def test_column_pruning_narrows_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    plan = _formatted_plan(q)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the two referenced columns may be read — a scan that reads
    # all 11 columns for a 2-column aggregate is wrong at any scale
    assert "l_returnflag" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact, approx = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.01, (approx, exact)


def test_bloom_filter_runtime_join_pruning(spark, sf_dir):
    """Catalyst injects a runtime bloom filter on the fact side of a
    selective shuffle join (might_contain over the dim keys) — the
    join-pruning mechanism that matters at 100 TB, where the fact scan
    skips rows whose key cannot be in the filtered dim. Local corpus
    sizes sit below the production thresholds, so they're lowered here
    to prove the rewrite fires; at the mandate scale the DEFAULTS
    (creation side <= 10 MB, application side >= 10 GB) hit exactly
    this shape on their own."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        urgent = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "bloom runtime filter not injected"
        assert "bloom_filter_agg" in plan
        # and the rewrite preserves the answer
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
        plain = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert j.count() == plain > 0
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """A filter on the partition column of a partitioned parquet sink
    must become a PartitionFilter (directory pruning — no data files
    from other partitions are even listed), not a post-scan filter.
    At 100 TB this is the difference between reading one partition
    and reading the lake."""
    from bigdata_pipelines_aws_glue_spark.sources.writers import (
        write_partitioned_parquet,
    )

    target = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned_parquet(
        orders, target, partition_col="o_orderpriority"
    )
    back = spark.read.parquet(target).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in seg, f"empty partition filter: {seg!r}"
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want > 0
