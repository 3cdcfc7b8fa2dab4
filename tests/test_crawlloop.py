"""Closed crawl loop: schedule arithmetic, recrawl policy, per-round
count identities, queue/visited disjointness, and frontier
exhaustion on a closed fixture."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.crawlloop import (
    CRAWL_ROUNDS,
    FETCH_BUDGET,
    WAVE_S,
    _crawl_round,
    _initial_state,
    crawl_rounds_audit,
    fetch_schedule,
    sitemap_recrawl,
)


def test_fetch_schedule_arithmetic(spark, sf_dir):
    from bigdata_pipelines_aws_glue_spark.operators.robots import (
        robots_allowed,
    )
    from bigdata_pipelines_aws_glue_spark.operators.sitemap import (
        crawl_queue_combined,
    )

    rows = fetch_schedule(spark, sf_dir).collect()
    assert rows
    by_host: dict[str, list] = {}
    for r in rows:
        assert r["crawl_delay"] == len(r["host"]) % 5 + 1
        assert (
            r["earliest_fetch_offset_s"]
            == (r["sched_rank"] - 1) * r["crawl_delay"]
        )
        assert r["fetch_wave"] == r["earliest_fetch_offset_s"] // WAVE_S
        by_host.setdefault(r["host"], []).append(r)
    for group in by_host.values():
        group.sort(key=lambda r: r["sched_rank"])
        # sched_rank is dense per host and preserves queue order
        assert [r["sched_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        for a, b in zip(group, group[1:]):
            assert b["fetch_rank"] > a["fetch_rank"]
            # politeness: offsets strictly increase down the queue
            assert (
                b["earliest_fetch_offset_s"] > a["earliest_fetch_offset_s"]
            )
    # the schedule is EXECUTABLE: only robots-allowed URLs get slots
    # (review r15 finding — the sitemap channel enters the combined
    # queue ungated), and the allowed set == the crawl loop's q0 gate
    q = crawl_queue_combined(spark, sf_dir)
    n_allowed = q.filter(
        robots_allowed(F.col("host"), F.col("url"))
    ).count()
    assert len(rows) == n_allowed < q.count()


def test_recrawl_policy_branches(spark, sf_dir):
    rows = sitemap_recrawl(spark, sf_dir).collect()
    actions = {r["action"] for r in rows}
    assert actions == {"seed", "recrawl", "skip"}  # all branches bite
    by_key: dict[tuple, list] = {}
    for r in rows:
        if r["action"] == "seed":
            assert r["fetched_on"] is None
        else:
            assert r["fetched_on"] is not None
            stale = r["lastmod"] > r["fetched_on"]
            assert r["action"] == ("recrawl" if stale else "skip")
        assert (r["fetch_order"] is None) == (r["action"] == "skip")
        if r["fetch_order"] is not None:
            by_key.setdefault((r["host"], r["action"]), []).append(r)
    for group in by_key.values():
        group.sort(key=lambda r: r["fetch_order"])
        assert [r["fetch_order"] for r in group] == list(
            range(1, len(group) + 1)
        )


def test_crawl_rounds_count_identities(spark, sf_dir):
    q0, v0 = _initial_state(spark, sf_dir)
    q0_size, v0_size = q0.count(), v0.count()
    rows = sorted(
        crawl_rounds_audit(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, CRAWL_ROUNDS + 1))
    prev_q, prev_v = q0_size, v0_size
    for r in rows:
        assert r["n_fetched"] > 0
        # conservation: visited grows by exactly the fetched count;
        # the queue loses the fetched rows and gains the new entrants
        assert r["visited_size"] == prev_v + r["n_fetched"]
        assert r["queue_size"] == prev_q - r["n_fetched"] + r["n_new"]
        assert len(r["fetched_md5"]) == 32
        int(r["fetched_md5"], 16)
        prev_q, prev_v = r["queue_size"], r["visited_size"]
    # the loop actually closes: links are discovered, robots blocks
    # some, and some survive into the queue
    assert any(r["n_links"] > 0 for r in rows)
    assert any(r["n_blocked"] > 0 for r in rows)
    assert any(r["n_new"] > 0 for r in rows)


def test_crawl_queue_visited_disjoint(spark, sf_dir):
    q, v = _initial_state(spark, sf_dir)
    fetched_all: set[str] = set()
    for k in (1, 2):
        q_urls_before = {r["url"] for r in q.select("url").collect()}
        q, v, _ = _crawl_round(k, q, v)
        q_urls = {r["url"] for r in q.select("url").collect()}
        v_urls = {r["url"] for r in v.select("url").collect()}
        assert not q_urls & v_urls  # disjointness invariant
        round_fetched = q_urls_before - q_urls
        assert not round_fetched & fetched_all  # no URL fetched twice
        fetched_all |= round_fetched


def test_frontier_exhaustion_closed_fixture(spark):
    """A single assets-host queue (leaf fetches, no link discovery)
    drains at FETCH_BUDGET per round and hits empty — the bounded
    fixpoint a finite frontier converges to."""
    n = FETCH_BUDGET + 2
    q = spark.createDataFrame(
        [
            ("cdn9.assets.test", f"https://cdn9.assets.test/img/{i}.png", 1)
            for i in range(n)
        ],
        "host string, url string, refs long",
    )
    v = spark.createDataFrame([], "url string")
    sizes, fetches = [], []
    for k in (1, 2, 3):
        q, v, audit = _crawl_round(k, q, v)
        row = audit.collect()[0]
        assert row["n_links"] == 0  # assets host: leaves only
        sizes.append(row["queue_size"])
        fetches.append(row["n_fetched"])
    assert fetches == [FETCH_BUDGET, n - FETCH_BUDGET, 0]
    assert sizes == [n - FETCH_BUDGET, 0, 0]
    assert v.count() == n
    # an empty fetch round still emits a stable attestation hash
    final = audit.collect()[0]
    assert final["fetched_md5"] == hashlib.md5(b"").hexdigest()
