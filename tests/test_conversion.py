"""Conversion-semantics tests pinning the reference branches cited in
SURVEY.md §1.2 (converter.rs line references in each test)."""

import json

import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark import ConvertOptions, TimestampRendering
from azure_kusto_parquet_conv_spark.functions import conversion as C
from azure_kusto_parquet_conv_spark.operators.convert import (
    render_csv_cells,
    render_json_lines,
)
from tests.conftest import lines


def read(spark, path, **kw):
    return spark.read.parquet(path)


def test_non_primitive_map_key_raises(spark, tmp_path):
    """Reference panics on non-primitive map keys (converter.rs:266); the
    engine fails the plan build with a clear error instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "badmap.parquet")
    key_t = pa.struct([("k", pa.int64())])
    t = pa.table({"m": pa.array([[({"k": 1}, 2)]],
                                type=pa.map_(key_t, pa.int64()))})
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="primitive"):
        render_json_lines(spark.read.parquet(p))


class TestFloats:
    def test_nan_inf_null(self, spark, edge_dir):
        # converter.rs:291-295
        df = read(spark, edge_dir["t_floats"])
        out = [r[0] for r in df.select(C.nan_inf_to_null("x")).collect()]
        assert out[0] is None and out[1] is None and out[2] is None
        assert out[3] == 1.5

    def test_real_text_trailing_zeros(self, spark, edge_dir):
        # ryu + truncate_trailing_zeros (converter.rs:196-212)
        df = read(spark, edge_dir["t_floats"])
        out = [r[0] for r in df.select(C.real_text("x")).collect()]
        assert out[3] == "1.5"
        assert out[4] == "2"
        assert out[5] == "0.30000000000000004"  # shortest round-trip
        assert out[0] is None  # NaN

    def test_jsonl_nan_is_null(self, spark, edge_dir):
        df = read(spark, edge_dir["t_floats"])
        got = [json.loads(l) for l in lines(render_json_lines(df))]
        assert got[0]["x"] is None
        assert got[3]["x"] == 1.5


class TestUint64:
    def test_default_keeps_unsigned(self, spark, edge_dir):
        # converter.rs:297-303 (no --convert-types): u64 value preserved
        df = read(spark, edge_dir["t_uint64"])
        got = [json.loads(l) for l in lines(render_json_lines(df))]
        assert got[3]["u"] == 18446744073709551615

    def test_convert_types_reinterprets(self, spark, edge_dir):
        # converter.rs:297-303 (--convert-types): bit-cast to i64
        df = read(spark, edge_dir["t_uint64"])
        out = [r[0] for r in df.select(C.uint64_to_long("u")).collect()]
        assert out == [0, 1, -(2 ** 63), -1, None]

    def test_default_mode_jsonl_bytes_exact(self, spark, edge_dir):
        # byte-for-byte pq2json default-mode parity: an unsigned JSON
        # NUMBER (no quotes, no sign wrap) — converter.rs:297-303
        df = read(spark, edge_dir["t_uint64"])
        out = lines(render_json_lines(df))
        assert out[2] == '{"u":9223372036854775808}'
        assert out[3] == '{"u":18446744073709551615}'

    def test_default_mode_csv_cell_unsigned(self, spark, edge_dir):
        # CSV default mode: plain unsigned digits (converter.rs:175-186
        # routes the same element_to_value dispatch into cells)
        df = read(spark, edge_dir["t_uint64"])
        cells = [r["u"] for r in render_csv_cells(df).collect()]
        assert cells[3] == "18446744073709551615"


class TestDecimal:
    def test_plain_notation_string(self, spark, edge_dir):
        # converter.rs:345-371: plain decimal string, zero-padded
        df = read(spark, edge_dir["t_decimal"])
        out = [r[0] for r in df.select(C.decimal_string("d")).collect()]
        assert out == ["0.00123", "-0.50000", "123.45600", None]


class TestTimestamps:
    def test_ticks(self, spark, edge_dir):
        # converter.rs:305-317: ms*10000 + 621355968000000000
        df = read(spark, edge_dir["t_timestamps"])
        out = [r[0] for r in df.select(C.ticks("ms")).collect()]
        assert out[0] == 621355968000000000
        assert out[1] == 621355968000000000 - 10_000_000
        assert out[3] is None

    def test_isostr_six_digit_fraction(self, spark, edge_dir):
        # converter.rs:318-329: %Y-%m-%dT%H:%M:%S.%6fZ
        df = read(spark, edge_dir["t_timestamps"])
        out = [r[0] for r in df.select(C.iso_string("ms")).collect()]
        assert out[0] == "1970-01-01T00:00:00.000000Z"
        assert out[2] == "9999-12-31T23:59:59.000000Z"

    def test_micros_truncated_to_ms(self, spark, edge_dir):
        # converter.rs:117-120: µs -> ms truncation before rendering
        df = read(spark, edge_dir["t_timestamps"])
        out = [r[0] for r in df.select(C.iso_string("us")).collect()]
        assert out[0] == "2021-03-04T05:06:07.123000Z"
        assert out[1] == "1970-01-01T00:00:01.000000Z"

    def test_unixms(self, spark, edge_dir):
        # converter.rs:330
        df = read(spark, edge_dir["t_timestamps"])
        out = [r[0] for r in df.select(C.unix_ms("ms")).collect()]
        assert out == [0, -1000, 253402300799000, None]

    def test_ticks_overflow_null(self, spark):
        # converter.rs:310-316: checked overflow -> null
        df = spark.sql("select timestamp'+294000-01-01 00:00:00' as t")
        assert df.select(C.ticks("t")).collect()[0][0] is None


class TestDates:
    def test_date_string(self, spark, edge_dir):
        # converter.rs:334-343
        df = read(spark, edge_dir["t_dates"])
        out = [r[0] for r in df.select(C.date_string("d")).collect()]
        assert out == ["1970-01-01", "2021-01-01", "1969-01-01", None]


class TestBinary:
    def test_bytes_as_number_array(self, spark, edge_dir):
        # converter.rs:283-289: [104,105], not base64
        df = read(spark, edge_dir["t_binary"])
        out = [r[0] for r in df.select(C.bytes_to_int_array("b")).collect()]
        assert out == [[104, 105], [], None]

    def test_jsonl_binary(self, spark, edge_dir):
        df = read(spark, edge_dir["t_binary"])
        got = [json.loads(l) for l in lines(render_json_lines(df))]
        assert got[0]["b"] == [104, 105]
        assert got[1]["b"] == []
        assert got[2]["b"] is None


class TestNested:
    def test_default_keeps_nulls(self, spark, edge_dir):
        df = read(spark, edge_dir["t_nested"])
        got = [json.loads(l) for l in lines(render_json_lines(df))]
        assert got[0]["s"] == {"a": 1, "b": "x"}
        assert got[1]["s"] == {"a": None, "b": None}
        assert got[0]["l"] == [1, 2] and got[1]["l"] == []
        assert got[0]["m"] == {"k1": 1, "k2": None}

    def test_omit_nulls(self, spark, edge_dir):
        # converter.rs:220,271
        df = read(spark, edge_dir["t_nested"])
        opts = ConvertOptions(omit_nulls=True)
        got = [json.loads(l) for l in lines(render_json_lines(df, opts))]
        assert got[1]["s"] == {}
        assert got[0]["m"] == {"k1": 1}

    def test_prune(self, spark, edge_dir):
        # --prune: omit-nulls + empty-bag->null + empty-list->null
        # (main.rs:42-51; converter.rs:225-229,240-244,276-280)
        df = read(spark, edge_dir["t_nested"])
        got = [json.loads(l) for l in
               lines(render_json_lines(df, ConvertOptions.pruned()))]
        assert "s" not in got[1]   # {} collapsed to null, then omitted
        assert "l" not in got[1]   # [] -> null -> omitted
        assert "m" not in got[1]
        assert got[0]["s"] == {"a": 1, "b": "x"}


class TestNullRow:
    def test_all_null_row_renders_empty_object(self, spark, edge_dir):
        # converter.rs:135-139: row rendering to null -> "{}"
        df = read(spark, edge_dir["t_nullrow"])
        got = lines(render_json_lines(df, ConvertOptions.pruned()))
        assert got[0] == "{}"
        assert json.loads(got[1]) == {"a": 1, "b": "x"}


class TestProjection:
    def test_missing_column_null_fill(self, spark, edge_dir):
        # converter.rs:46-50,74-85: unknown requested columns -> null fields
        from azure_kusto_parquet_conv_spark.sources.parquet import read_parquet
        df = read_parquet(spark, edge_dir["t_projection"],
                          columns=["a", "nope", "c"])
        assert df.columns == ["a", "nope", "c"]
        rows = df.collect()
        assert rows[0]["nope"] is None and rows[0]["a"] == 1

    def test_pushdown_reaches_scan(self, spark, edge_dir):
        from azure_kusto_parquet_conv_spark.sources.parquet import read_parquet
        df = read_parquet(spark, edge_dir["t_projection"], columns=["a"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<a:bigint>" in plan


class TestCsv:
    def test_csv_cells(self, spark, edge_dir):
        # converter.rs:190-208: nested -> embedded JSON, floats stripped
        df = read(spark, edge_dir["t_nested"])
        rows = render_csv_cells(df).collect()
        assert json.loads(rows[0]["s"]) == {"a": 1, "b": "x"}
        assert json.loads(rows[0]["l"]) == [1, 2]
        df2 = read(spark, edge_dir["t_floats"])
        cells = [r["x"] for r in render_csv_cells(df2).collect()]
        assert cells[3] == "1.5" and cells[4] == "2"
        assert cells[0] is None  # written as empty field by the CSV sink

    def test_csv_sink_cr_terminator(self, spark, edge_dir, tmp_path):
        # converter.rs:153: record terminator is \r
        from azure_kusto_parquet_conv_spark import convert
        out = str(tmp_path / "csv_out")
        convert(spark, edge_dir["t_projection"], out,
                ConvertOptions(csv=True), single_file=True)
        import glob
        data = open(glob.glob(out + "/part-*.csv")[0], "rb").read()
        assert b"\r" in data and b"\n" not in data


def test_convert_gzip_output_lines_identical(spark, sf_dir, tmp_path):
    """compression='gzip' wraps the identical rendered bytes in gzip:
    decompressed lines match the plain sink exactly."""
    import glob
    import gzip as _gzip

    from azure_kusto_parquet_conv_spark.operators.convert import convert

    plain = str(tmp_path / "plain")
    gz = str(tmp_path / "gz")
    convert(spark, f"{sf_dir}/nation.parquet", plain, single_file=True)
    convert(spark, f"{sf_dir}/nation.parquet", gz, single_file=True,
            compression="gzip")
    p = glob.glob(f"{plain}/part-*.txt")[0]
    g = glob.glob(f"{gz}/part-*.txt.gz")[0]
    assert sorted(open(p, "rb").read().splitlines()) == \
        sorted(_gzip.open(g, "rb").read().splitlines())


def test_convert_decimal_fixture_is_fixed_len_byte_array(spark, sf_dir):
    """F15's hard case is parquet's FIXED_LEN_BYTE_ARRAY decimal
    physical encoding (converter.rs:345-371): the convert_decimal
    catalog entry must exercise it for real, not via an INT64-backed
    small decimal."""
    import glob
    import os

    import pyarrow.parquet as pq

    from azure_kusto_parquet_conv_spark.queries import QUERIES

    df = QUERIES["convert_decimal"](spark, sf_dir)
    row = df.orderBy("l_orderkey", "l_linenumber").first()
    assert "." in row["price_str"]
    assert len(row["price_str"].split(".")[1]) == 6  # scale-padded
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(
        repo, "spark-warehouse",
        f"decimal_fixture_{os.path.basename(os.path.normpath(sf_dir))}")
    part = glob.glob(os.path.join(base, "part-*.parquet"))[0]
    col = pq.ParquetFile(part).schema.column(2)
    assert col.name == "price"
    assert col.physical_type == "FIXED_LEN_BYTE_ARRAY", col.physical_type
