"""Storage-format transcoding between Spark's built-in columnar/row
formats.

The reference converts Parquet to Kusto-ingestible TEXT only
(converter.rs:54-58 — JSONL or CSV); this is the storage-side
generalization a lake engine needs: rewrite a dataset parquet↔ORC↔JSON
↔CSV with schema preserved, distributed, no driver materialization.
Text formats lose type width (JSON has no int32-vs-int64, CSV is
stringly) — ``round_trip_schema_safe`` says whether a format can carry
the exact schema back."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_kusto_parquet_conv_spark.session import prepare_session

_FORMATS = {"parquet", "orc", "json", "csv"}

#: formats whose read(write(df)) reproduces the exact Spark schema
LOSSLESS = {"parquet", "orc"}


def transcode(spark: SparkSession, src: str, out_path: str,
              src_format: str = "parquet", out_format: str = "orc",
              compression: str | None = None) -> None:
    """Distributed format rewrite: read ``src`` as ``src_format``, write
    ``out_path`` as ``out_format``. Narrow pipeline — no shuffle; output
    file count tracks input split count, so at 100 TB this scales with
    the cluster like any scan."""
    for f in (src_format, out_format):
        if f not in _FORMATS:
            raise ValueError(f"unsupported format {f!r} (use {_FORMATS})")
    prepare_session(spark)
    reader = spark.read
    if src_format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df: DataFrame = reader.format(src_format).load(src)
    writer = df.write.mode("overwrite")
    if out_format == "csv":
        writer = writer.option("header", "true")
    if compression:
        writer = writer.option("compression", compression)
    writer.format(out_format).save(out_path)


def compact(spark: SparkSession, src: str, out_path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            data_format: str = "parquet",
            sort_by: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a directory of many small files
    into ceil(total_bytes / target) files. The operational fix for the
    100 TB small-file problem — streaming/micro-batch sinks and
    fine-grained partitions accrete thousands of KB-sized files whose
    per-file open/footer cost dominates scans; compaction restores
    scan-sized objects. Returns the file count written.

    Plain compaction is a round-robin repartition (balanced output, one
    shuffle) — which DESTROYS any sort/cluster layout the files had.
    Pass ``sort_by`` to compact with a range repartition + in-file sort
    instead, so zone-map pruning on those columns survives compaction
    (verify with metadata.pruning_report)."""
    import math

    prepare_session(spark)
    df = spark.read.format(data_format).load(src)
    # logical bytes from the source listing (driver-only)
    from pyspark.sql.functions import input_file_name
    files = [r[0] for r in
             df.select(input_file_name().alias("f")).distinct().collect()]
    import os
    total = sum(os.path.getsize(f.removeprefix("file://")) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    if sort_by:
        out = (df.repartitionByRange(n, *sort_by)
                 .sortWithinPartitions(*sort_by))
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").format(data_format).save(out_path)
    return n
