"""Byte-exact golden pins for the CSV sink (r11 verdict #6).

The cell-level DuckDB oracle (convert_csv_nested) cannot see the sink
layer: the ``\r`` record terminator (converter.rs:153), RFC-4180 quote
DOUBLING (the Rust csv crate's QuoteStyle::Necessary — Spark's default
escape ``\\`` would emit ``\\"`` instead, so the sink sets escape to the
quote char), null -> empty field, and the omit-rule interactions
(empty bag/list -> null -> empty field under pruning; empty BINARY
stays ``[]`` even when pruned, because bytes_to_value builds the array
outside the omit_empty_lists branch, converter.rs:232-245 vs 283-289).
These pins are whole-file bytes, one per options mode.
"""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from azure_kusto_parquet_conv_spark import convert
from azure_kusto_parquet_conv_spark.settings import ConvertOptions


@pytest.fixture(scope="module")
def golden_src(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    p = str(d / "t_golden.parquet")
    pq.write_table(pa.table({
        "i": pa.array([1, None, 3], type=pa.int64()),
        # the struct string embeds BOTH a comma and a quote: the JSON
        # serializer escapes the quote (\"), then the CSV writer quotes
        # the cell and doubles the embedded quotes -> x,\""y on the wire
        "s": pa.array([{"a": 1, "b": 'x,"y'}, None, {"a": None, "b": None}],
                      type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "l": pa.array([[1, 2], None, []], type=pa.list_(pa.int64())),
        "m": pa.array([[("k", 7)], None, []],
                      type=pa.map_(pa.string(), pa.int64())),
        "b": pa.array([b"hi", None, b""], type=pa.binary()),
        "x": pa.array([1.5, None, 0.25], type=pa.float64()),
    }), p)
    return p


def _sink_bytes(spark, src, tmp_path, opts) -> bytes:
    out = str(tmp_path / "out")
    convert(spark, src, out, opts, single_file=True)
    return open(glob.glob(out + "/part-*.csv")[0], "rb").read()


def test_csv_golden_default_mode(spark, golden_src, tmp_path):
    data = _sink_bytes(spark, golden_src, tmp_path, ConvertOptions(csv=True))
    assert data == (
        b'1,"{""a"":1,""b"":""x,\\""y""}","[1,2]","{""k"":7}",'
        b'"[104,105]",1.5\r'
        b',,,,,\r'
        b'3,"{""a"":null,""b"":null}",[],{},[],0.25\r')


def test_csv_golden_pruned_mode(spark, golden_src, tmp_path):
    # omit_nulls + omit_empty_bags + omit_empty_lists: the all-null
    # struct, the empty list and the empty map all collapse to null ->
    # empty CSV field; the empty BINARY does not (reference parity)
    data = _sink_bytes(spark, golden_src, tmp_path,
                       ConvertOptions.pruned(csv=True))
    assert data == (
        b'1,"{""a"":1,""b"":""x,\\""y""}","[1,2]","{""k"":7}",'
        b'"[104,105]",1.5\r'
        b',,,,,\r'
        b'3,,,,[],0.25\r')


def test_csv_golden_terminator_and_quote_discipline(spark, golden_src,
                                                    tmp_path):
    data = _sink_bytes(spark, golden_src, tmp_path, ConvertOptions(csv=True))
    assert b"\n" not in data          # \r-only records (converter.rs:153)
    assert b'\\"' not in data.replace(b'\\""', b"")  # doubling, not \-escape
