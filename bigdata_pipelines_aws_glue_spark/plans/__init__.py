"""Query plans: the flagship reference pipeline and its re-expression
over the driver corpus (SURVEY.md §3.2, §7 M0)."""

from bigdata_pipelines_aws_glue_spark.plans.flagship import (  # noqa: F401
    FLAGSHIP_ORACLE_SQL,
    flagship_query,
    latest_rate_per_currency,
    synth_currency_rates,
    synth_product_categories,
    synth_transactions,
)
