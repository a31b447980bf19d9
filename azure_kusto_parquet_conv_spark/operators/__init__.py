"""Operators: conversion driver, relational helpers, dedup, similarity,
multimodal plumbing."""

from azure_kusto_parquet_conv_spark.operators.convert import (
    convert,
    render_json_lines,
    render_csv_cells,
)

__all__ = ["convert", "render_json_lines", "render_csv_cells"]
