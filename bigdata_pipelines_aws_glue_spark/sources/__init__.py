"""Sources & sinks (SURVEY.md §2.1 S1-S11)."""

from bigdata_pipelines_aws_glue_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_parquet,
)
from bigdata_pipelines_aws_glue_spark.sources.writers import (  # noqa: F401
    write_partitioned_parquet,
)
