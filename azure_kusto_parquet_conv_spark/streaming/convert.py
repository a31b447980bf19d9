"""Incremental (streaming) conversion: the reference's core pipeline as
an unbounded job.

The reference converts exactly one closed file per process invocation
(main.rs:112-126, converter.rs:30-59); Kusto's ingestion service re-runs
it per file. At 100 TB/day the same capability is a Structured Streaming
job: parquet files land in a directory (or arrive via Kafka), each
micro-batch renders only the new files, and the file sink's checkpoint
commits output exactly-once — restart-safe without re-converting history.

``render_json_lines`` / ``render_csv_cells`` are pure Column-expression
builders, so the batch converter (operators.convert) and this streaming
twin share one code path: the stream cannot drift from the batch
semantics (ticks/ISO/unixms rendering, omit-* pruning, ``{}`` null rows,
``\\r`` CSV terminator all come from the same expressions).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.query import StreamingQuery

from azure_kusto_parquet_conv_spark.functions.conversion import (
    nanos_long_to_timestamp,
)
from azure_kusto_parquet_conv_spark.operators.convert import (
    render_csv_cells,
    render_json_lines,
)
from azure_kusto_parquet_conv_spark.session import prepare_session
from azure_kusto_parquet_conv_spark.settings import ConvertOptions
from azure_kusto_parquet_conv_spark.sources.parquet import _nanos_columns


def read_parquet_stream(spark: SparkSession, src_dir: str,
                        options: ConvertOptions | None = None,
                        max_files_per_trigger: int | None = None):
    """File-source stream over a landing directory, normalized the same
    way as the batch scan: TIMESTAMP(NANOS) columns come back as
    timestamps, and the ``columns`` projection is a superset contract
    (absent names become null columns, converter.rs:46-50,74-85).

    The schema is pinned from the files already present — a streaming
    source needs a declared schema, and pinning it keeps every later
    micro-batch consistent with the first.
    """
    prepare_session(spark)
    options = options or ConvertOptions()
    static = spark.read.parquet(src_dir)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(src_dir)
    sample = sorted(glob.glob(os.path.join(src_dir, "*.parquet")))
    dtypes = dict(df.dtypes)
    for c in (_nanos_columns(sample[0]) if sample else set()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, nanos_long_to_timestamp(c))
    if options.columns is not None:
        present = set(df.columns)
        df = df.select(*[
            F.col(c) if c in present else F.lit(None).alias(c)
            for c in options.columns
        ])
    return df


def convert_stream(spark: SparkSession, src_dir: str, out_dir: str,
                   checkpoint_dir: str,
                   options: ConvertOptions | None = None,
                   max_files_per_trigger: int | None = None) -> StreamingQuery:
    """Start the incremental converter: parquet landing in ``src_dir`` →
    Kusto-rendered JSONL (or CSV) appended under ``out_dir``.

    Returns the started StreamingQuery; callers drain with
    ``processAllAvailable()`` (tests) or let it run (production). The
    sink writes one file per (micro-batch, partition) — at scale, tune
    ``maxFilesPerTrigger`` and the source partition count, not this code.
    """
    options = options or ConvertOptions()
    df = read_parquet_stream(spark, src_dir, options, max_files_per_trigger)
    if options.csv:
        rendered = render_csv_cells(df, options)
        writer = (rendered.writeStream.format("csv")
                  .option("lineSep", "\r").option("nullValue", "")
                  .option("emptyValue", "\"\""))
    else:
        rendered = render_json_lines(df, options)
        writer = rendered.writeStream.format("text")
    return (writer.option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append").start())
