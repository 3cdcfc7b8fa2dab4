"""Command-line entrypoints (SURVEY.md §2.11 C1: the reference's
``getResolvedOptions(sys.argv, [JOB_NAME, S3_INPUT_PATH, ...])``
parameter surface, ``glue_job.py:19-24``, as argparse).

Usage:
    python -m bigdata_pipelines_aws_glue_spark.cli run-pipeline \\
        --input raw.csv --output out/ --rates rates.csv --categories cats.csv
    python -m bigdata_pipelines_aws_glue_spark.cli run-query \\
        --name q1_pricing_summary [--sf-dir /root/testdata/sf0.01] [--limit 20]
    python -m bigdata_pipelines_aws_glue_spark.cli list-queries
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bigdata-pipelines-spark")
    sub = p.add_subparsers(dest="command", required=True)

    rp = sub.add_parser(
        "run-pipeline", help="run the reference-shaped CSV->parquet pipeline"
    )
    rp.add_argument("--input", required=True, help="raw transactions CSV")
    rp.add_argument("--output", required=True, help="parquet output dir")
    rp.add_argument("--rates", required=True, help="currency rates CSV")
    rp.add_argument("--categories", required=True, help="product categories CSV")
    rp.add_argument("--target-currency", default="USD")

    rq = sub.add_parser("run-query", help="run a registered query")
    rq.add_argument("--name", required=True)
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)

    rc = sub.add_parser(
        "run-curation",
        help="materialize the curated pretraining corpus "
        "(Gopher gate -> exact dedup -> near-dup drop -> split) "
        "as split-partitioned parquet",
    )
    rc.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rc.add_argument("--output", required=True, help="curated parquet dir")

    sub.add_parser("list-queries", help="list registered queries")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.command == "list-queries":
        from bigdata_pipelines_aws_glue_spark import registry

        oracles = registry.oracle_sql()
        for name in sorted(registry.queries()):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    from bigdata_pipelines_aws_glue_spark.session import get_spark

    spark = get_spark("cli")
    if args.command == "run-pipeline":
        from bigdata_pipelines_aws_glue_spark.plans.reference_pipeline import (
            PipelineConfig,
            run_pipeline,
        )

        cfg = PipelineConfig(
            input_path=args.input,
            output_path=args.output,
            currency_rates_path=args.rates,
            product_categories_path=args.categories,
            target_currency=args.target_currency,
        )
        result = run_pipeline(spark, cfg)
        print(f"wrote {result.count()} rows to {args.output}")
        return 0

    if args.command == "run-query":
        from bigdata_pipelines_aws_glue_spark import registry

        queries = registry.queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    if args.command == "run-curation":
        from pyspark.sql import functions as F

        from bigdata_pipelines_aws_glue_spark.operators.curation import (
            run_curation,
        )

        run_curation(spark, args.sf_dir, args.output)
        # manifest comes from the parquet just written — a cheap
        # read-back, NOT a second funnel computation (the full
        # per-stage report is `run-query curation_funnel_report`)
        written = spark.read.parquet(args.output)
        splits = written.groupBy("split").count().orderBy("split").collect()
        total = 0
        for row in splits:
            print(f"split={row['split']}\t{row['count']}")
            total += row["count"]
        print(f"curated\t{total}")
        print(f"curated corpus written to {args.output}")
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
