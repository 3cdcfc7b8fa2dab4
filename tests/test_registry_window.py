"""Structural invariants of the driver-verification window: the
driver attests exactly the first 50 ``queries()`` entries, so a
malformed PRIORITY silently wastes attestation slots."""

from __future__ import annotations

from bigdata_pipelines_aws_glue_spark import registry


def test_priority_window_invariants():
    pri = registry.PRIORITY
    assert len(pri) == 50
    assert len(set(pri)) == 50  # no duplicate slots
    q = registry.queries()
    o = registry.oracle_sql()
    missing = [n for n in pri if n not in q]
    assert not missing, f"PRIORITY names not registered: {missing}"
    # a window slot spent on a rows-only query is wasted (policy in
    # tools/rotate_priority.py) — every slot must be hash-checkable
    rows_only = [n for n in pri if n not in o]
    assert not rows_only, f"rows-only queries in window: {rows_only}"
    # the window is literally the head of the emitted dict
    assert list(q)[:50] == list(pri)
    assert list(o)[:50] == list(pri)


def test_no_orphan_oracles():
    q = registry.queries()
    o = registry.oracle_sql()
    # every oracle belongs to a registered query
    orphans = [n for n in o if n not in q]
    assert not orphans
