"""Operator library (SURVEY.md §2): relational operators, LLM-data
operators, and scale helpers. Each module registers its queries with
``bigdata_pipelines_aws_glue_spark.registry``."""
