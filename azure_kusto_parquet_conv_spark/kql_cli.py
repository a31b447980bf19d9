"""``kql-spark`` — run a KQL tabular pipeline from the command line.

The reference CLI converts one file (pq2json); this is the query-side
companion the Kusto lineage implies: `kql-spark 'events | where ... |
summarize ...'` compiles through kql.py onto the fixture tables under
``--sf-dir`` and prints the result as JSON-Lines (or CSV) to stdout.
Results stream through ``toLocalIterator`` so the driver holds one
partition at a time, not the whole result."""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kql-spark",
        description="Run a KQL tabular pipeline on the table directory")
    p.add_argument("query", nargs="?", default=None,
                   help="KQL pipeline, e.g. "
                   "'lineitem | where l_quantity > 30 | count'")
    p.add_argument("--list-queries", action="store_true",
                   help="print the engine's query-catalog inventory "
                        "(name, oracled, summary) and exit")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="directory holding <table>.parquet files")
    p.add_argument("--csv", action="store_true",
                   help="CSV output instead of JSON-Lines")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of output rows")
    p.add_argument("--explain", action="store_true",
                   help="print the physical plan (formatted) instead "
                        "of executing — the scale-review tool: check "
                        "pushdown/broadcast/shuffle before running on "
                        "real data")
    return p


def run(args: argparse.Namespace) -> int:
    if args.list_queries:
        from azure_kusto_parquet_conv_spark.queries import catalog
        for row in catalog():
            sys.stdout.write(json.dumps(row) + "\n")
        return 0
    if args.query is None:
        print("ERROR: provide a KQL query or --list-queries",
              file=sys.stderr)
        return 2
    from azure_kusto_parquet_conv_spark.kql import kql
    from azure_kusto_parquet_conv_spark.session import get_spark

    spark = get_spark("kql-spark")
    df = kql(spark, args.sf_dir, args.query)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.limit is not None:
        df = df.limit(args.limit)
    cols = df.columns
    out = sys.stdout
    if args.csv:
        out.write(",".join(cols) + "\n")
    for row in df.toLocalIterator():
        d = row.asDict(recursive=True)
        if args.csv:
            out.write(",".join("" if d[c] is None else str(d[c])
                               for c in cols) + "\n")
        else:
            out.write(json.dumps(d, default=str) + "\n")
    out.flush()
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return run(args)
    except SystemExit:
        raise
    except Exception as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 255


if __name__ == "__main__":
    sys.exit(main())
