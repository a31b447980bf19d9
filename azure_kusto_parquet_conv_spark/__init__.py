"""PySpark-native analytics engine with the capability surface of
Azure/azure-kusto-parquet-conv (``pq2json``), re-designed Spark-first.

The reference (see /root/reference, surveyed in SURVEY.md) is a single-file
Parquet -> JSONL/CSV converter with Kusto-specific type rendering plus schema
introspection. This package re-expresses that surface as lazy, distributed
DataFrame programs:

- ``sources``    : Parquet scans, projection + missing-column reconciliation,
                   footer/row-group/Kusto(CSL)-schema introspection.
- ``functions``  : Column-expression builders for every conversion semantic the
                   reference implements (ticks/isostr/unixms timestamps,
                   decimal-as-string, NaN/Inf->null, bytes-as-array, ...),
                   plus text-analysis and vector kernels for the LLM-pipeline
                   extension operators.
- ``operators``  : the convert driver (JSONL/CSV sinks), relational helpers
                   (as-of/range joins, sessionization, top-k), dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                   embedding), similarity search, multimodal column plumbing.
- ``streaming``  : Structured Streaming variants over the events table.
- ``plans``      : plan-inspection utilities (pushdown / broadcast asserts).

Everything stays JVM-side (pyspark.sql.functions) unless noted; pandas UDFs
are used only where Spark lacks the expression (SimHash bit-packing,
multimodal decode).
"""

from azure_kusto_parquet_conv_spark.settings import ConvertOptions, TimestampRendering
from azure_kusto_parquet_conv_spark.session import get_spark, prepare_session
from azure_kusto_parquet_conv_spark.sources.parquet import load_table, read_parquet
from azure_kusto_parquet_conv_spark.operators.convert import convert

__all__ = [
    "ConvertOptions",
    "TimestampRendering",
    "get_spark",
    "prepare_session",
    "load_table",
    "read_parquet",
    "convert",
]

__version__ = "0.1.0"
