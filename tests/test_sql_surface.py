"""Raw SQL surface + skew helper tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.skew import two_phase_agg
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table
from bigdata_pipelines_aws_glue_spark.sql import register_corpus_views, sql


def test_sql_over_corpus_views(spark, sf_dir):
    out = sql(
        spark,
        """
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus
        """,
        sf_dir,
    ).collect()
    assert sum(r["n"] for r in out) == 1500


def test_sql_flagship_trend_via_views(spark, sf_dir):
    register_corpus_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT year(l_shipdate) AS y, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert sum(r["n"] for r in out) == 6000


def test_two_phase_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: (r["s"], r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["l_quantity"], r["cnt"])
        for r in two_phase_agg(
            li.withColumn("cnt", F.lit(1)),
            ["l_returnflag"],
            {"l_quantity": "sum", "cnt": "count"},
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert abs(direct[k][0] - salted[k][0]) < 1e-6
        assert direct[k][1] == salted[k][1]
