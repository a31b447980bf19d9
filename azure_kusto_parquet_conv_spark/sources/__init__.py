"""Sources: Parquet scans and footer/metadata introspection."""

from azure_kusto_parquet_conv_spark.sources.parquet import load_table, read_parquet, load_all
from azure_kusto_parquet_conv_spark.sources.metadata import (
    csl_schema,
    csl_schema_json,
    row_groups_metadata,
    schema_text,
)

__all__ = [
    "load_table",
    "load_all",
    "read_parquet",
    "csl_schema",
    "csl_schema_json",
    "row_groups_metadata",
    "schema_text",
]
