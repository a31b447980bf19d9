"""Structured Streaming variants of the batch operators."""

from azure_kusto_parquet_conv_spark.streaming.events import (
    read_events_stream,
    windowed_counts,
    sessionize_stream,
)

__all__ = ["read_events_stream", "windowed_counts", "sessionize_stream"]
