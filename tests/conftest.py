"""Shared fixtures: one session-scoped SparkSession, edge-case parquet
fixtures (FIXTURES.md 'edge-case conversion fixtures')."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from azure_kusto_parquet_conv_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("aks-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def edge_dir(tmp_path_factory):
    """Write the edge-case fixture parquet files (FIXTURES.md table)."""
    d = tmp_path_factory.mktemp("edge")

    def w(name, table):
        p = str(d / f"{name}.parquet")
        pq.write_table(table, p)
        return p

    paths = {}
    paths["t_floats"] = w("t_floats", pa.table({
        "x": pa.array([float("nan"), float("inf"), float("-inf"),
                       1.5, 2.0, 0.1 + 0.2, None], type=pa.float64()),
    }))
    paths["t_uint64"] = w("t_uint64", pa.table({
        "u": pa.array([0, 1, 2 ** 63, 2 ** 64 - 1, None], type=pa.uint64()),
    }))
    paths["t_decimal"] = w("t_decimal", pa.table({
        "d": pa.array(["0.00123", "-0.5", "123.456", None]).cast(pa.decimal128(10, 5)),
    }))
    paths["t_timestamps"] = w("t_timestamps", pa.table({
        "ms": pa.array([0, -1000, 253402300799000, None], type=pa.timestamp("ms")),
        "us": pa.array([1614834367123456, 1000001, None, None], type=pa.timestamp("us")),
    }))
    paths["t_dates"] = w("t_dates", pa.table({
        "d": pa.array([0, 18628, -365, None], type=pa.date32()),
    }))
    paths["t_nested"] = w("t_nested", pa.table({
        "s": pa.array([{"a": 1, "b": "x"}, {"a": None, "b": None}, None],
                      type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "l": pa.array([[1, 2], [], None], type=pa.list_(pa.int64())),
        "m": pa.array([[("k1", 1), ("k2", None)], [], None],
                      type=pa.map_(pa.string(), pa.int64())),
    }))
    paths["t_binary"] = w("t_binary", pa.table({
        "b": pa.array([b"hi", b"", None], type=pa.binary()),
    }))
    paths["t_nullrow"] = w("t_nullrow", pa.table({
        "a": pa.array([None, 1], type=pa.int64()),
        "b": pa.array([None, "x"], type=pa.string()),
    }))
    paths["t_projection"] = w("t_projection", pa.table({
        "a": pa.array([1, 2], type=pa.int64()),
        "b": pa.array(["x", "y"], type=pa.string()),
        "c": pa.array([1.5, 2.5], type=pa.float64()),
    }))
    return paths


def lines(df):
    """Collect a rendered single-column line DataFrame as a list of str."""
    return [r[0] for r in df.collect()]
