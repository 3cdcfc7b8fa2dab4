"""Benford digit extraction, forward broadcast-array as-of, and
l-diversity on hand-built fixtures."""

from __future__ import annotations

import datetime as dt

from bigdata_pipelines_aws_glue_spark.operators.joins import (
    asof_join_broadcast_array,
)


def test_benford_digit_extraction_and_chi2(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.quality import (
        benford_first_digit,
    )

    rows = benford_first_digit(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    n_total = sum(r["n_obs"] for r in rows)
    # expected_n must sum to ~n_total (Benford shares sum to 1)
    assert abs(sum(r["expected_n"] for r in rows) - n_total) < 1.0
    # chi-square terms are non-negative and finite
    assert all(r["chi2_term"] >= 0 for r in rows)
    # digit shares of a synthetic uniform-ish corpus are far from
    # Benford: the audit must NOT report a near-zero statistic
    chi2 = sum(r["chi2_term"] for r in rows)
    assert chi2 > 16.92  # chi2_{0.05, 8 dof}: reject conformance


def test_forward_asof_picks_next_point(spark):
    t = dt.datetime
    left = spark.createDataFrame(
        [(1, "a", t(2020, 1, 5)), (2, "a", t(2020, 1, 10)),
         (3, "a", t(2020, 2, 1)), (4, "zz", t(2020, 1, 1))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(2020, 1, 1), 1.0), ("a", t(2020, 1, 10), 2.0),
         ("a", t(2020, 1, 20), 3.0)],
        "k string, rt timestamp, v double",
    )
    out = asof_join_broadcast_array(
        left, right, "k", "ts", "rt", ["v"], direction="forward"
    )
    got = {r["id"]: (r["rt"], r["v"]) for r in out.collect()}
    assert got[1] == (t(2020, 1, 10), 2.0)   # next at-or-after
    assert got[2] == (t(2020, 1, 10), 2.0)   # inclusive boundary
    assert got[3] == (None, None)            # past last point
    assert got[4] == (None, None)            # unseen key


def test_forward_asof_keeps_duplicate_left_rows(spark):
    t = dt.datetime
    left = spark.createDataFrame(
        [(1, "a", t(2020, 1, 5)), (1, "a", t(2020, 1, 5))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(2020, 1, 10), 2.0)], "k string, rt timestamp, v double"
    )
    out = asof_join_broadcast_array(
        left, right, "k", "ts", "rt", ["v"], direction="forward"
    )
    assert out.count() == 2  # multiplicity preserved (r6 bug class)


def test_l_diversity_handbuilt(spark, tmp_path):
    # 2 QI classes: class A has langs {en,de,fr} (l=3, uniform ->
    # entropy ln 3), class B all-en (l=1 -> entropy 0, below l)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = (
        [("s1", 10, "en"), ("s1", 10, "de"), ("s1", 10, "fr")]
        + [("s2", 10, "en")] * 4
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows)),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[0] for r in rows]),
            "n_chars": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from bigdata_pipelines_aws_glue_spark.operators.privacy import (
        l_diversity_audit,
    )

    row = l_diversity_audit(spark, str(tmp_path)).collect()[0]
    assert row["n_classes"] == 2
    assert row["n_rows"] == 7
    assert row["min_distinct_l"] == 1
    assert row["classes_below_l"] == 1
    assert row["rows_below_l"] == 4
    assert abs(row["min_entropy_q"]) < 1e-9  # all-en class: entropy 0
