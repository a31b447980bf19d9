"""Column-expression builders: conversion semantics, text analysis, vectors."""

from azure_kusto_parquet_conv_spark.functions.conversion import (
    ticks,
    iso_string,
    unix_ms,
    truncate_to_millis,
    date_string,
    real_text,
    nan_inf_to_null,
    uint64_to_long,
    bytes_to_int_array,
    decimal_string,
    kusto_rendered_column,
)

__all__ = [
    "ticks",
    "iso_string",
    "unix_ms",
    "truncate_to_millis",
    "date_string",
    "real_text",
    "nan_inf_to_null",
    "uint64_to_long",
    "bytes_to_int_array",
    "decimal_string",
    "kusto_rendered_column",
]
