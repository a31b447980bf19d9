"""The convert driver: Parquet -> Kusto-ingestible JSON-Lines / CSV.

Reference lifecycle (SURVEY.md §3.1): CLI -> Settings -> single-threaded
row loop -> BufWriter. Here the same semantics compile to one Catalyst
expression tree per output line, executed by whole-stage codegen across
executors, and committed by Spark's distributed file sink. At 100 TB the
scan parallelizes by row-group split, the rendering is embarrassingly
parallel (no shuffle anywhere in this pipeline), and the sink writes one
file per task — `single_file=True` exists only for byte-exact
stdout-style output at small scale.

Covers reference operators O4 (JSONL sink, converter.rs:128-143), O5 (CSV
sink, :145-188), O6 (row->JSON assembly, :214-230) and conversion functions
F1-F17 via ``functions.conversion``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from azure_kusto_parquet_conv_spark.functions.conversion import (
    kusto_rendered_column,
    real_text,
)
from azure_kusto_parquet_conv_spark.settings import ConvertOptions, TimestampRendering
from azure_kusto_parquet_conv_spark.sources.parquet import read_parquet


def _rendered(c: Column, dtype: T.DataType, opts: ConvertOptions) -> Column:
    """Recursively rewrite one value to its Kusto-rendered form.

    Mirrors the recursive ``element_to_value!`` dispatch
    (converter.rs:95-126) including the nested pruning rules:
    - struct: omit-nulls is handled by the JSON serializer; an all-null
      struct (the only way a non-empty schema yields ``{}`` under
      omit-nulls) collapses to null under omit-empty-bags
      (converter.rs:214-230).
    - array: elements rendered; ``[] -> null`` under omit-empty-lists
      (converter.rs:232-245).
    - map: values rendered (keys are stringified by the JSON serializer,
      converter.rs:253-267); null values dropped under omit-nulls; empty
      result -> null under omit-empty-bags (converter.rs:247-281).
    """
    if isinstance(dtype, T.StructType):
        fields = [
            _rendered(c.getField(f.name), f.dataType, opts).alias(f.name)
            for f in dtype.fields
        ]
        rendered = F.struct(*fields)
        struct_null_cases = [c.getField(f.name).isNull() for f in dtype.fields]
        if opts.omit_empty_bags and opts.omit_nulls and struct_null_cases:
            all_null = struct_null_cases[0]
            for cond in struct_null_cases[1:]:
                all_null = all_null & cond
            rendered = F.when(~all_null, rendered)
        return F.when(c.isNotNull(), rendered)
    if isinstance(dtype, T.ArrayType):
        rendered = F.transform(
            c, lambda x: _rendered(x, dtype.elementType, opts))
        if opts.omit_empty_lists:
            rendered = F.when(F.size(c) != 0, rendered)
        return F.when(c.isNotNull(), rendered)
    if isinstance(dtype, T.MapType):
        if isinstance(dtype.keyType, (T.StructType, T.ArrayType, T.MapType)):
            # the reference PANICS on non-primitive map keys
            # (converter.rs:266); fail the plan build with a clear error
            # instead of a worker crash mid-job
            raise ValueError(
                f"map keys must be primitive to render as JSON objects; "
                f"got {dtype.keyType.simpleString()} (reference behavior: "
                f"panic at converter.rs:266)")
        m = c
        if opts.omit_nulls:
            m = F.map_filter(m, lambda k, v: v.isNotNull())
        rendered = F.transform_values(
            m, lambda k, v: _rendered(v, dtype.valueType, opts))
        if opts.omit_empty_bags:
            rendered = F.when(F.size(m) != 0, rendered)
        return F.when(c.isNotNull(), rendered)
    return kusto_rendered_column(
        c, dtype,
        timestamp=opts.timestamp_rendering,
        convert_types=opts.convert_types,
    )


def _rendered_columns(df: DataFrame, opts: ConvertOptions) -> list[Column]:
    return [
        _rendered(F.col(f.name), f.dataType, opts).alias(f.name)
        for f in df.schema.fields
    ]


def render_json_lines(df: DataFrame, opts: ConvertOptions | None = None,
                      keep: tuple[str, ...] = ()) -> DataFrame:
    """DataFrame -> single-column ``line`` DataFrame of JSON-Lines text.

    - one JSON object per row (converter.rs:128-143)
    - ``omit_nulls`` -> serializer drops null fields (converter.rs:220,271)
    - a row that renders to JSON null normalizes to ``{}``
      (converter.rs:135-139)
    - ``keep`` carries named source columns alongside ``line`` (for a
      partitioned sink's keys)
    """
    opts = opts or ConvertOptions()
    row = F.struct(*_rendered_columns(df, opts))
    if opts.omit_empty_bags and opts.omit_nulls:
        null_cases = [F.col(f.name).isNull() for f in df.schema.fields]
        if null_cases:
            all_null = null_cases[0]
            for cond in null_cases[1:]:
                all_null = all_null & cond
            row = F.when(~all_null, row)
    line = F.to_json(row, {"ignoreNullFields": "true" if opts.omit_nulls else "false"})
    return df.select(F.coalesce(line, F.lit("{}")).alias("line"),
                     *[F.col(k) for k in keep])


def render_csv_cells(df: DataFrame, opts: ConvertOptions | None = None) -> DataFrame:
    """DataFrame -> all-string DataFrame of CSV cell texts.

    Reference CSV semantics (converter.rs:145-208): root scalars as plain
    text (floats via ryu + trailing-zero strip), nested struct/list/map as
    embedded JSON strings, null -> empty field. The actual quoting and the
    ``\\r`` record terminator are applied by the CSV writer in ``convert``.
    """
    opts = opts or ConvertOptions()
    out = []
    for f in df.schema.fields:
        c = _rendered(F.col(f.name), f.dataType, opts)
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            cell = real_text(F.col(f.name))
        elif isinstance(f.dataType, (T.StructType, T.MapType)):
            cell = F.to_json(c, {"ignoreNullFields": "true" if opts.omit_nulls else "false"})
        elif isinstance(f.dataType, (T.ArrayType, T.BinaryType)):
            cell = F.to_json(c)
        else:
            cell = c.cast("string")
        out.append(cell.alias(f.name))
    return df.select(*out)


def convert(spark: SparkSession, src: str, out_path: str | None = None,
            options: ConvertOptions | None = None,
            single_file: bool = False,
            partition_by: list[str] | None = None,
            compression: str | None = None) -> DataFrame:
    """End-to-end convert: Parquet scan -> rendered lines/cells [-> sink].

    Equivalent of ``pq2json [flags] <file> [-o out]`` (main.rs:112-147).
    Returns the rendered DataFrame either way (lazy; nothing runs until the
    sink or the caller acts on it).

    ``partition_by`` (extension; the reference writes one stream) emits a
    hive-partitioned directory keyed on the named INPUT columns — the
    at-scale output layout, one file per (partition, task), so downstream
    scans prune. Mutually exclusive with ``single_file``, which exists
    only for byte-exact stdout-style output at small scale.

    ``compression`` (extension): codec for the text/CSV sink ("gzip",
    "bzip2", "lz4", ...). Ingestion at scale ships compressed lines —
    Kusto accepts .gz natively — and the splittable-scan loss doesn't
    matter for a write-once hand-off. Line BYTES are identical to the
    uncompressed sink (same render expressions), just wrapped in the
    codec.
    """
    options = options or ConvertOptions()
    if partition_by and single_file:
        raise ValueError("partition_by and single_file are mutually exclusive")
    df = read_parquet(spark, src, options.columns)
    if options.csv:
        rendered = render_csv_cells(df, options)
        # escape == quote char => embedded quotes are DOUBLED (RFC 4180),
        # matching the reference's csv::Writer (converter.rs:151-156);
        # Spark's default escape '\' would emit \" instead.
        sink_opts = {"lineSep": "\r", "nullValue": "", "emptyValue": "\"\"",
                     "escape": "\""}
        fmt = "csv"
    else:
        rendered = render_json_lines(df, options)
        sink_opts = {}
        fmt = "text"
    if compression:
        sink_opts["compression"] = compression
    if out_path:
        if partition_by:
            # text sink: re-render with the partition keys carried beside
            # the line; CSV cells already contain them as text
            out = (render_json_lines(df, options, keep=tuple(partition_by))
                   if fmt == "text" else rendered)
            (out.write.mode("overwrite").options(**sink_opts)
                .partitionBy(*partition_by).format(fmt).save(out_path))
        else:
            w = rendered.coalesce(1) if single_file else rendered
            w.write.mode("overwrite").options(**sink_opts).format(fmt).save(out_path)
    return rendered
