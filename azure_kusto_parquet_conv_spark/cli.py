"""Command-line interface mirroring the reference ``pq2json`` CLI.

Flag surface and dispatch order reproduce pq2json/src/main.rs:10-157:
the three introspection flags are checked in priority order (--schema,
then --cslschema, then --rowgroups) and are mutually exclusive with
conversion; otherwise the file is converted to JSON-Lines (default) or
CSV (--csv), to stdout or -o FILE. Errors print to stderr and exit with
status 255, matching the reference's ``exit(-1)`` (main.rs:159-165).

The conversion itself runs through the distributed Spark sink into a
temp directory and is then streamed to the requested target, so the CLI
byte-for-byte matches the engine's file output (one code path for
quoting, terminators, null rendering).
"""

from __future__ import annotations

import argparse
import glob
import json
import shutil
import sys
import tempfile

from azure_kusto_parquet_conv_spark.settings import ConvertOptions, TimestampRendering


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pq2json-spark",
        description="Parquet -> Kusto-ingestible JSONL/CSV (PySpark engine)")
    p.add_argument("file", help="input Parquet file or directory")
    # operator-modifier flags (main.rs:13-58)
    p.add_argument("--omit-nulls", action="store_true",
                   help="omit null entries from objects/maps")
    p.add_argument("--omit-empty-bags", action="store_true",
                   help="render empty objects as null")
    p.add_argument("--omit-empty-lists", action="store_true",
                   help="render empty arrays as null")
    p.add_argument("--prune", action="store_true",
                   help="all three omit flags (main.rs:42-51)")
    p.add_argument("-r", "--convert-types", action="store_true",
                   help="reinterpret uint64 as signed int64")
    p.add_argument("--timestamp", choices=[m.value for m in TimestampRendering],
                   default=TimestampRendering.ISO_STR.value,
                   help="timestamp rendering (default isostr, main.rs:64)")
    p.add_argument("--columns", metavar="JSON",
                   help='projection as a JSON array of names, e.g. \'["a","b"]\'')
    p.add_argument("--csv", action="store_true", help="CSV output instead of JSONL")
    p.add_argument("--compression", metavar="CODEC",
                   help="compress sink output (extension; e.g. gzip)")
    p.add_argument("-o", "--out-file", metavar="FILE",
                   help="output file (default stdout)")
    # introspection commands (main.rs:92-111)
    p.add_argument("--schema", action="store_true",
                   help="print file metadata + schema and exit")
    p.add_argument("--cslschema", action="store_true",
                   help="print Kusto CSL schema JSON and exit")
    p.add_argument("--rowgroups", action="store_true",
                   help="print per-row-group metadata JSON and exit")
    # parsed but unused, like the reference's dead -v (main.rs:118-123)
    p.add_argument("-v", "--verbose", action="store_true",
                   help=argparse.SUPPRESS)
    return p


def _emit(text: str, out_file: str | None) -> None:
    if out_file:
        with open(out_file, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


def run(args: argparse.Namespace) -> int:
    from azure_kusto_parquet_conv_spark.sources import metadata as M

    # introspection dispatch, priority-ordered like main.rs:149-157
    if args.schema:
        _emit(M.schema_text(args.file), args.out_file)
        return 0
    if args.cslschema:
        _emit(M.csl_schema_json(args.file), args.out_file)
        return 0
    if args.rowgroups:
        _emit(json.dumps(M.row_groups_metadata(args.file)), args.out_file)
        return 0

    columns = None
    if args.columns is not None:
        columns = json.loads(args.columns)  # malformed -> error exit,
        # matching the reference's parse panic (main.rs:143-144)
        if (not isinstance(columns, list)
                or any(not isinstance(c, str) for c in columns)):
            raise ValueError("--columns must be a JSON array of strings")

    base = dict(
        omit_nulls=args.omit_nulls, omit_empty_bags=args.omit_empty_bags,
        omit_empty_lists=args.omit_empty_lists,
        convert_types=args.convert_types, csv=args.csv,
        timestamp_rendering=TimestampRendering(args.timestamp),
        columns=columns,
    )
    options = (ConvertOptions.pruned(**{k: v for k, v in base.items()
                                        if k not in ("omit_nulls",
                                                     "omit_empty_bags",
                                                     "omit_empty_lists")})
               if args.prune else ConvertOptions(**base))

    from azure_kusto_parquet_conv_spark.operators.convert import convert
    from azure_kusto_parquet_conv_spark.session import get_spark

    spark = get_spark("pq2json-spark")
    tmp = tempfile.mkdtemp(prefix="pq2json_spark_")
    try:
        convert(spark, args.file, tmp, options, single_file=True,
                compression=args.compression)
        ext = "csv" if args.csv else "txt"
        if args.compression:
            ext += ".gz" if args.compression == "gzip" else ".*"
        parts = sorted(glob.glob(f"{tmp}/part-*.{ext}"))
        if args.out_file:
            with open(args.out_file, "wb") as dst:
                for part in parts:
                    with open(part, "rb") as src:
                        shutil.copyfileobj(src, dst)
        else:
            out = sys.stdout.buffer
            for part in parts:
                with open(part, "rb") as src:
                    shutil.copyfileobj(src, out)
            out.flush()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return run(args)
    except SystemExit:
        raise
    except Exception as e:  # stderr + 255, like main.rs:159-165
        print(f"ERROR: {e}", file=sys.stderr)
        return 255


if __name__ == "__main__":
    sys.exit(main())
