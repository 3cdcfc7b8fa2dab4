"""Sitemap ingestion: XML parse integrity, visited semantics, and
seed-queue ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.sitemap import (
    SITEMAP_ENTRIES,
    sitemap_seeds,
)
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table


def test_parse_and_fields(spark, sf_dir):
    rows = sitemap_seeds(spark, sf_dir).collect()
    assert rows
    n_hosts = (
        load_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .count()
    )
    # every host contributes; dedupe never exceeds the entry count
    by_host: dict[str, list] = {}
    for r in rows:
        assert r["url"].startswith("https://") and "/doc/" in r["url"]
        assert r["lastmod"] is not None
        assert 0.0 <= r["priority"] <= 0.9
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) == n_hosts
    for group in by_host.values():
        assert 0 < len(group) <= SITEMAP_ENTRIES


def test_visited_exactness_and_both_branches(spark, sf_dir):
    df = sitemap_seeds(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    visited_urls = {
        r["u"]
        for r in docs.select(
            F.concat(
                F.lit("https://"),
                F.col("lang"),
                F.lit(".example.test/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("u")
        ).collect()
    }
    rows = df.collect()
    n_vis = sum(1 for r in rows if r["visited"])
    assert 0 < n_vis < len(rows)  # both branches bite
    for r in rows:
        assert r["visited"] == (r["url"] in visited_urls)


def test_seed_queue_order(spark, sf_dir):
    rows = sitemap_seeds(spark, sf_dir).collect()
    by_host: dict[str, list] = {}
    for r in rows:
        assert (r["seed_rank"] is None) == r["visited"]
        if not r["visited"]:
            by_host.setdefault(r["host"], []).append(r)
    for group in by_host.values():
        group.sort(key=lambda r: r["seed_rank"])
        assert [r["seed_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        for a, b in zip(group, group[1:]):
            assert (-a["priority"], -a["lastmod"].toordinal(), a["url"]) <= (
                -b["priority"],
                -b["lastmod"].toordinal(),
                b["url"],
            )


def test_combined_queue_channels_and_order(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.sitemap import (
        crawl_queue_combined,
    )

    rows = crawl_queue_combined(spark, sf_dir).collect()
    assert rows
    channels = {r["channel"] for r in rows}
    assert channels == {"both", "sitemap", "frontier"}
    strength = {"both": 0, "sitemap": 1, "frontier": 2}
    by_host: dict[str, list] = {}
    for r in rows:
        # channel metadata is present exactly per channel
        assert (r["sm_priority"] is not None) == (
            r["channel"] in ("both", "sitemap")
        )
        assert (r["n_refs"] is not None) == (
            r["channel"] in ("both", "frontier")
        )
        by_host.setdefault(r["host"], []).append(r)
    for group in by_host.values():
        group.sort(key=lambda r: r["fetch_rank"])
        assert [r["fetch_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        for a, b in zip(group, group[1:]):
            ka = (
                strength[a["channel"]],
                -(a["n_refs"] or 0),
                -(a["sm_priority"] if a["sm_priority"] is not None else -1.0),
                a["url"],
            )
            kb = (
                strength[b["channel"]],
                -(b["n_refs"] or 0),
                -(b["sm_priority"] if b["sm_priority"] is not None else -1.0),
                b["url"],
            )
            assert ka <= kb
