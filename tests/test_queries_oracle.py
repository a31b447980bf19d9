"""In-repo differential harness: runs every oracled catalog query on
Spark AND DuckDB at sf0.001 and compares row count, column names, and an
order-insensitive value multiset — a local replica of the driver's
correctness gate so breakage is caught before a round ends."""

from __future__ import annotations

import math

import duckdb
import pytest

from azure_kusto_parquet_conv_spark.queries import ORACLES, QUERIES
from azure_kusto_parquet_conv_spark.sources.parquet import TABLES


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and fix float repr drift
        return f"{v + 0.0:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def multiset(rows, cols):
    out = {}
    for r in rows:
        d = dict(zip(cols, r))
        key = "|".join(canon(d[c]) for c in sorted(cols))
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}")
    sm, om = multiset(srows, scols), multiset(orows, ocols)
    if sm != om:
        only_s = [k for k in sm if sm[k] != om.get(k)][:5]
        only_o = [k for k in om if om[k] != sm.get(k)][:5]
        raise AssertionError(
            f"{name}: value multiset differs\n spark-only: {only_s}\n oracle-only: {only_o}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_unoracled_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_bench_headline_entries_exist():
    """Every bench.py headline name must be a real catalog entry —
    a rename that orphans the bench would otherwise only fail at
    driver-bench time."""
    import bench

    for name in bench.HEADLINE:
        assert name in QUERIES, name


def test_catalog_queries_stay_distributed():
    """No catalog query may materialize data on the driver: a .collect()
    / .toPandas() / .toLocalIterator() inside queries.py means the
    operator stops scaling past driver memory."""
    import os

    import azure_kusto_parquet_conv_spark.queries as qmod
    src = open(os.path.abspath(qmod.__file__)).read()
    for banned in (".collect()", ".toPandas()", ".toLocalIterator()"):
        assert banned not in src, banned


def test_catalog_every_entry_has_summary():
    from azure_kusto_parquet_conv_spark.queries import catalog

    assert all(r["summary"] for r in catalog()), [
        r["name"] for r in catalog() if not r["summary"]]
