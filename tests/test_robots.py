"""robots.txt exclusion: pinned RFC 9309 longest-match/Allow-wins
precedence cases, and corpus-level decision-class + queue invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_pipelines_aws_glue_spark.operators.robots import (
    _rules,
    _verdict,
    frontier_robots_filter,
    synth_robots,
)


def _decide(spark, robots, paths):
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    rows = df.select(
        _verdict(_rules(F.lit(robots)), F.col("p")).alias("v")
    ).collect()
    return [(r["v"]["matched_rule"], r["v"]["allowed"]) for r in rows]


def test_precedence_pinned(spark):
    robots = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Disallow: /a/b/c\n"
        "Allow: /a/b/c\n"  # same length as the Disallow: Allow wins
        "Disallow: \n"  # empty path: never matches (allow-all form)
    )
    got = _decide(
        spark,
        robots,
        ["/a", "/a/x", "/a/b", "/a/b/z", "/a/b/c", "/a/b/cd", "/z"],
    )
    assert got == [
        ("D:/a", False),  # short block
        ("D:/a", False),  # prefix semantics
        ("A:/a/b", True),  # longer Allow overrides
        ("A:/a/b", True),
        ("A:/a/b/c", True),  # equal-length tie -> Allow wins
        ("A:/a/b/c", True),
        ("", True),  # no match -> default allow
    ]


def test_corpus_decision_classes(spark, sf_dir):
    """Every decision class the fixture is designed to exercise shows
    up: default-allow, each Disallow, and both Allow carve-outs."""
    df = frontier_robots_filter(spark, sf_dir)
    rows = df.groupBy("matched_rule", "allowed").count().collect()
    classes = {(r["matched_rule"], r["allowed"]) for r in rows}
    assert ("", True) in classes
    assert any(m.startswith("D:/doc/1") and not a for m, a in classes)
    assert any(m.startswith("D:/s") and not a for m, a in classes)
    assert any(m.startswith("A:/doc/1") and a for m, a in classes)
    # crawl delay parsed on every row
    assert df.filter(
        F.col("crawl_delay").isNull() | (F.col("crawl_delay") < 1)
    ).count() == 0


def test_allowed_queue_ranks(spark, sf_dir):
    rows = frontier_robots_filter(spark, sf_dir).collect()
    assert rows
    by_host: dict[str, list] = {}
    for r in rows:
        # blocked rows never get a rank; allowed rows always do
        assert (r["fetch_rank"] is None) == (not r["allowed"])
        if r["allowed"]:
            by_host.setdefault(r["host"], []).append(r)
    for group in by_host.values():
        group.sort(key=lambda r: r["fetch_rank"])
        assert [r["fetch_rank"] for r in group] == list(
            range(1, len(group) + 1)
        )
        for a, b in zip(group, group[1:]):
            assert (-a["n_refs"], a["url"]) < (-b["n_refs"], b["url"])


def test_robots_fixture_shape(spark):
    df = spark.createDataFrame(
        [("de.example.test",), ("cdn3.assets.test",)], "host string"
    )
    rows = df.select(
        synth_robots(F.col("host")).alias("r")
    ).collect()
    for r in rows:
        txt = r["r"]
        assert txt.startswith("User-agent: *\n")
        assert "Disallow: /doc/1\n" in txt
        assert "Crawl-delay: " in txt


def test_robots_gate_equals_per_row_form(spark, sf_dir):
    """r15 optimization pin: the join-form gate (robots parsed once
    per host, broadcast back) admits EXACTLY the rows the per-row
    form admits, with the original columns preserved — on the real
    queue frame, where both channels and all hosts appear."""
    from bigdata_pipelines_aws_glue_spark.operators.robots import (
        robots_allowed,
        robots_gate,
    )
    from bigdata_pipelines_aws_glue_spark.operators.sitemap import (
        crawl_queue_combined,
    )

    cq = crawl_queue_combined(spark, sf_dir).localCheckpoint(eager=True)
    joined = robots_gate(cq)
    assert joined.columns == cq.columns
    per_row = cq.filter(robots_allowed(F.col("host"), F.col("url")))
    assert joined.exceptAll(per_row).count() == 0
    assert per_row.exceptAll(joined).count() == 0
    # the gate must actually bite on this fixture
    assert joined.count() < cq.count()
