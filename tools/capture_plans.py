"""Capture ``explain("formatted")`` for named registry queries.

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` per query. With no query
args, captures every bench query (HEADLINE + EXTENDED). The plan is
captured from the same (query_fn, sf_dir) the bench times, at the
bench's default sf dir.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE  # noqa: E402
from bigdata_pipelines_aws_glue_spark import registry  # noqa: E402
from bigdata_pipelines_aws_glue_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or (HEADLINE + EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = registry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
