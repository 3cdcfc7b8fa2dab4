"""Size-gated broadcast hints.

An explicit ``F.broadcast`` cannot be demoted by AQE: it is an order
to build the whole table on every executor regardless of its actual
size. That is correct for PROVABLY bounded sides — ``nation`` /
``region`` (fixed 25/5 rows), k-row centroid or codebook tables,
1-row scalar aggregates, fixed query samples — and those sites keep
the plain hint. But TPC-H's ``part`` / ``supplier`` / ``customer``
grow linearly with scale factor (supplier alone is ~10 M rows per TB
of corpus), so a forced broadcast that is free at sf0.1 becomes a
multi-GB executor-OOM at the 100 TB mandate.

``maybe_broadcast`` is the discipline for those unbounded-but-
usually-small sides: hint ONLY when the optimizer's own size
estimate for the subtree is at or under the session's
``spark.sql.autoBroadcastJoinThreshold``; otherwise return the plan
unchanged and let the planner (threshold) plus AQE (runtime actual
sizes, which CAN promote a sort-merge join to broadcast after seeing
shuffle statistics) decide. The estimate is driver-side plan
metadata (parquet footer sizes propagated through the plan) — no job
runs.

``SPARK_GRAFT_ASSUME_HUGE=1`` makes every ``maybe_broadcast`` a
no-op. ``tools/plan_audit.py`` sets it to simulate the 100 TB
posture: any broadcast hint still present in a logical plan under
that flag is a FORCED hint, and the audit flags it when its subtree
scans a scale-factor-scaling base table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_bytes(raw: str) -> int:
    """Parse Spark byte-size conf strings ('64m', '10485760b', '-1')."""
    s = raw.strip().lower()
    if s.endswith("b") and len(s) > 1 and s[-2] in ("k", "m", "g", "t"):
        s = s[:-1]  # 'kb'/'mb'/'gb'/'tb' -> 'k'/'m'/'g'/'t'
    if s and s[-1] in _UNITS:
        return int(float(s[:-1]) * _UNITS[s[-1]])
    return int(s)


def broadcast_threshold_bytes(spark) -> int:
    """The live session's autoBroadcastJoinThreshold in bytes."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        return _parse_bytes(raw)
    except ValueError:
        return 10 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the DataFrame's optimized plan
    (driver-side metadata only; None when unavailable). For a parquet
    scan this is file bytes scaled by column pruning; unknown subtrees
    default to Long.Max, which safely reads as 'too big to hint'."""
    try:
        jstats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(jstats.sizeInBytes())  # py4j converts scala BigInt
    except Exception:
        return None


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast-hint ``df`` only when the optimizer estimates it at
    or under the session broadcast threshold. Use for join sides that
    scan SF-scaling base tables (part / supplier / customer / orders /
    lineitem / documents / embeddings / events); keep plain
    ``F.broadcast`` only for provably bounded sides."""
    if os.environ.get("SPARK_GRAFT_ASSUME_HUGE"):
        return df
    size = plan_size_bytes(df)
    if size is None or size < 0:
        return df
    if size <= broadcast_threshold_bytes(df.sparkSession):
        return F.broadcast(df)
    return df
