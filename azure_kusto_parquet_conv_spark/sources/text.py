"""Text sources + parquet sink: the reverse of the conversion engine.

The reference is one-directional (Parquet -> JSONL/CSV); ingestion
pipelines also need the way back, so the engine round-trips: lines
written by ``operators.convert`` load here into typed DataFrames and
land as Parquet. Schema handling mirrors the scan side — explicit schema
when the caller has the contract, Spark inference otherwise (inference
samples the data; at 100 TB always pass the schema so the read is one
pass, not two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from azure_kusto_parquet_conv_spark.session import prepare_session


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | str | None = None) -> DataFrame:
    """JSON-Lines -> DataFrame (the JSONL sink's output is valid input)."""
    prepare_session(spark)
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None,
             header: bool = False, line_sep: str | None = None) -> DataFrame:
    """CSV -> DataFrame. ``line_sep='\\r'`` reads the reference-style
    ``\\r``-terminated output; empty fields load as null, mirroring the
    null -> empty-field sink rule (converter.rs:192)."""
    prepare_session(spark)
    r = spark.read.options(nullValue="", emptyValue="\"\"")
    if line_sep is not None:
        r = r.option("lineSep", line_sep)
    if header:
        r = r.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  compression: str = "snappy",
                  max_records_per_file: int | None = None) -> None:
    """DataFrame -> Parquet dataset. ``max_records_per_file`` bounds file
    sizes for downstream row-group splitting; ``partition_by`` emits the
    hive layout that makes future scans prunable."""
    w = df.write.mode("overwrite").option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
