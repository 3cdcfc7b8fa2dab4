"""PySpark-native analytics engine with the query and data-processing
capabilities of ``prabhuja-x/bigdata-pipelines-aws-glue``.

The reference (at ``/root/reference/``, studied read-only) is an AWS
Glue ETL pipeline: read raw e-commerce transaction CSVs, convert
currency via a latest-rate lookup, enrich with product categories,
derive calendar columns, and write partitioned Parquet for downstream
trend analysis (``glue_job.py:78-172``). This engine re-expresses that
surface — plus driver-mandated LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) — as idiomatic
Spark DataFrame / SQL code designed for 100 TB scale:

- no driver-side ``collect()`` lookups (the reference collects and
  broadcasts the rates table at ``glue_job.py:99``; we use a
  broadcast-hash join instead),
- no per-row Python UDFs on the hot path (the reference's
  ``convert_currency_udf``, ``glue_job.py:71``, becomes a join plus
  native column expressions),
- declarative plans so Catalyst handles pushdown, pruning, join
  strategy, and AQE handles skew/coalescing at runtime.
"""

__version__ = "0.1.0"
