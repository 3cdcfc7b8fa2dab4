"""Bucketed co-located joins (SURVEY.md §4 scale posture): writing
both join sides bucketed by the join key lets Spark join with NO
exchange on either side — the physical proof that the engine's layout
strategy eliminates the dominant shuffle at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.sources.catalog import create_database
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    create_database(spark)
    spark.sql("DROP TABLE IF EXISTS ecommerce_db.orders_b")
    spark.sql("DROP TABLE IF EXISTS ecommerce_db.lineitem_b")
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"{warehouse}/ecommerce_db.db/{t}", ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ecommerce_db.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("ecommerce_db.lineitem_b")
    )

    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("ecommerce_db.lineitem_b").join(
            spark.table("ecommerce_db.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        n = joined.count()
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
