"""End-to-end test of the reference-shaped CSV pipeline using the
reference's own 2-row smoke fixture (s3_setup.py:103-105 — one USD
row, one EUR row: both conversion branches), plus catalog DDL and
idempotent-rerun (bookmark-equivalence) checks."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.plans.reference_pipeline import (
    PipelineConfig,
    run_pipeline,
)
from bigdata_pipelines_aws_glue_spark.sources.catalog import (
    register_external_table,
    save_as_managed_table,
)

RAW_CSV = """transaction_id,user_id,product_id,amount,currency,timestamp
1,101,P100,50.00,USD,2025-04-12T10:00:00Z
2,102,P200,75.50,EUR,2025-04-12T11:30:00Z
"""
RATES_CSV = """currency,rate_to_usd,rate_date
EUR,1.08,2025-04-01T00:00:00Z
EUR,1.10,2025-04-10T00:00:00Z
GBP,1.25,2025-04-10T00:00:00Z
"""
CATS_CSV = """product_id,category
P100,Electronics
"""


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("refpipe")
    (root / "raw.csv").write_text(RAW_CSV)
    (root / "rates.csv").write_text(RATES_CSV)
    (root / "cats.csv").write_text(CATS_CSV)
    return root


def _cfg(root) -> PipelineConfig:
    return PipelineConfig(
        input_path=str(root / "raw.csv"),
        output_path=str(root / "out"),
        currency_rates_path=str(root / "rates.csv"),
        product_categories_path=str(root / "cats.csv"),
    )


def test_reference_fixture_end_to_end(spark, pipeline_dirs):
    result = run_pipeline(spark, _cfg(pipeline_dirs))
    rows = {r["transaction_id"]: r for r in result.collect()}
    assert set(rows) == {"1", "2"}
    usd = rows["1"]
    assert usd["amount_usd"] == pytest.approx(50.0)  # passthrough branch
    assert usd["category"] == "Electronics"
    eur = rows["2"]
    # latest rate (1.10 on 04-10) wins over 1.08 (glue_job.py:60)
    assert eur["amount_usd"] == pytest.approx(75.5 * 1.10, rel=1e-6)
    assert eur["category"] is None  # unmatched -> NULL (glue_job.py:121-124)
    assert eur["transaction_year"] == 2025
    assert eur["transaction_date"] == datetime.date(2025, 4, 12)

    # partitioned parquet landed under load_date=<today>
    out = spark.read.parquet(str(pipeline_dirs / "out"))
    assert out.count() == 2
    assert "load_date" in out.columns


def test_rerun_is_idempotent(spark, pipeline_dirs):
    """Bookmark-equivalence (C3): re-running the same day overwrites
    the same load_date partition — no duplicate rows."""
    run_pipeline(spark, _cfg(pipeline_dirs))
    run_pipeline(spark, _cfg(pipeline_dirs))
    out = spark.read.parquet(str(pipeline_dirs / "out"))
    assert out.count() == 2


def test_catalog_roundtrip(spark, pipeline_dirs):
    run_pipeline(spark, _cfg(pipeline_dirs))
    register_external_table(
        spark, "transactions_final", str(pipeline_dirs / "out")
    )
    n = spark.sql(
        "SELECT count(*) AS n FROM ecommerce_db.transactions_final"
    ).first()["n"]
    assert n == 2
    # trend query over the catalog table (the reference's Athena use)
    trends = spark.sql(
        """
        SELECT transaction_year, transaction_month,
               sum(amount_usd) AS total
        FROM ecommerce_db.transactions_final
        GROUP BY 1, 2
        """
    ).collect()
    assert len(trends) == 1


def test_managed_table_save(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    nation = load_table(spark, sf_dir, "nation")
    save_as_managed_table(nation, "nation_copy")
    assert spark.table("ecommerce_db.nation_copy").count() == 25


def test_pipeline_error_propagates(spark, pipeline_dirs):
    """C4/C5: failures surface as exceptions (the Step Functions
    catch-all Fail state is plain Python error propagation here)."""
    import pytest as _pytest

    bad = PipelineConfig(
        input_path=str(pipeline_dirs / "does_not_exist.csv"),
        output_path=str(pipeline_dirs / "out2"),
        currency_rates_path=str(pipeline_dirs / "rates.csv"),
        product_categories_path=str(pipeline_dirs / "cats.csv"),
    )
    with _pytest.raises(Exception):
        run_pipeline(spark, bad)
