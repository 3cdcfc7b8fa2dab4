"""Semantic checks for ``operators/layout.py`` (the hash oracle covers
cross-engine equality; these pin the layout-quality contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.layout import (
    N_FILES,
    N_PROBES,
    zorder_layout,
    zorder_pruning_gain,
)


def test_layout_is_a_partition_of_the_table(spark, sf_dir):
    zones = zorder_layout(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_rows for r in zones) == n_orders
    assert len(zones) <= N_FILES
    assert all(0 <= r.file_id < N_FILES for r in zones)
    # balanced-ish files: uniform keys -> no file above 4x the mean
    mean = n_orders / len(zones)
    assert max(r.n_rows for r in zones) < 4 * mean
    # the z property: every file's custkey zone is a narrow slice,
    # not the whole domain (one bx quadrant band = ~1/8 of it)
    ck_lo = min(r.ck_min for r in zones)
    ck_hi = max(r.ck_max for r in zones)
    domain = ck_hi - ck_lo + 1
    assert all(r.ck_max - r.ck_min + 1 <= domain / 4 for r in zones)


def test_pruning_gain_on_every_probe(spark, sf_dir):
    rows = zorder_pruning_gain(spark, sf_dir).collect()
    assert [r.probe_id for r in rows] == list(range(N_PROBES))
    for r in rows:
        assert r.p_lo <= r.p_hi
        # a probe must touch at least one file and the z layout must
        # beat the date-sorted layout on every single probe
        assert 1 <= r.files_zorder < r.files_datesorted
    # aggregate gain: z-order should skip >= 2/3 of the files the
    # date-sorted layout scans for custkey probes
    total_z = sum(r.files_zorder for r in rows)
    total_lin = sum(r.files_datesorted for r in rows)
    assert total_z * 3 <= total_lin


def test_zorder_assignment_is_map_only(spark, sf_dir):
    """The file assignment must not sort or window globally: no Sort
    or Window node may appear below the zone-map aggregation (the
    1-row stats broadcast + final orderBy of 64 rows are the only
    exchanges tolerated)."""
    plan = (
        zorder_layout(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # the only Sort allowed is the final 64-row presentation orderBy
    body = plan.split("Exchange rangepartitioning")[-1]
    assert "Sort" not in body.split("HashAggregate")[-1]


def test_materialized_zorder_footers_match_audit(spark, sf_dir, tmp_path):
    """Close the loop on real bytes: write the z-order layout as
    parquet, read the FOOTER statistics back, and assert they equal
    the audited zone maps — then replay every probe against the real
    footers and assert the measured files-touched counts equal
    ``zorder_pruning_gain``'s predictions (the 8-14/64 skip ratio),
    and that a probe scan pushes its custkey predicates into the
    parquet scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    from bigdata_pipelines_aws_glue_spark.operators.layout import (
        write_zorder_orders,
    )

    target = str(tmp_path / "orders_zorder")
    write_zorder_orders(spark, sf_dir, target)

    # one data file per quadrant directory, real footer zone per file
    footer_zones = {}
    total_rows = 0
    for d in glob.glob(os.path.join(target, "file_id=*")):
        fid = int(d.rsplit("=", 1)[1])
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"quadrant {fid}: {len(files)} files"
        meta = pq.ParquetFile(files[0]).metadata
        ck_ix = next(
            i
            for i in range(len(meta.schema))
            if meta.schema.column(i).name == "o_custkey"
        )
        lo = min(
            meta.row_group(g).column(ck_ix).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(ck_ix).statistics.max
            for g in range(meta.num_row_groups)
        )
        footer_zones[fid] = (lo, hi)
        total_rows += meta.num_rows

    audited = {
        r.file_id: (r.ck_min, r.ck_max, r.n_rows)
        for r in zorder_layout(spark, sf_dir).collect()
    }
    assert set(footer_zones) == set(audited)
    assert total_rows == sum(v[2] for v in audited.values())
    for fid, (lo, hi) in footer_zones.items():
        assert (lo, hi) == audited[fid][:2], f"file {fid} zone drift"

    # replay every probe against the REAL footers
    for r in zorder_pruning_gain(spark, sf_dir).collect():
        measured = sum(
            1
            for lo, hi in footer_zones.values()
            if lo <= r.p_hi and hi >= r.p_lo
        )
        assert measured == r.files_zorder, (
            f"probe {r.probe_id}: measured {measured} vs "
            f"audited {r.files_zorder}"
        )
        assert measured < N_FILES / 3  # the skip ratio is real

    # and the probe predicate reaches the parquet scan
    probe = zorder_pruning_gain(spark, sf_dir).collect()[0]
    back = spark.read.parquet(target).filter(
        (F.col("o_custkey") >= probe.p_lo)
        & (F.col("o_custkey") <= probe.p_hi)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "o_custkey" in pushed
