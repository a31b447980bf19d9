"""``python -m azure_kusto_parquet_conv_spark <file> [flags]`` — the
pq2json-compatible CLI (see cli.py)."""

import sys

from azure_kusto_parquet_conv_spark.cli import main

sys.exit(main())
