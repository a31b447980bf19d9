"""Introspection operators O7-O9 (pq2json/src/schema.rs)."""

import json

from azure_kusto_parquet_conv_spark.sources.metadata import (
    csl_schema,
    csl_schema_json,
    row_groups_metadata,
    schema_text,
)


def test_schema_text(sf_dir):
    # schema.rs:18-35
    txt = schema_text(f"{sf_dir}/lineitem.parquet")
    assert "num_rows" in txt and "l_orderkey" in txt


def test_csl_schema_lineitem(sf_dir):
    # schema.rs:74-109 mapping over the lineitem footer
    got = {d["name"]: d["type"] for d in csl_schema(f"{sf_dir}/lineitem.parquet")}
    assert got == {
        "l_orderkey": "long", "l_partkey": "long", "l_suppkey": "long",
        "l_linenumber": "int", "l_quantity": "real",
        "l_extendedprice": "real", "l_discount": "real", "l_tax": "real",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "datetime",
    }


def test_csl_schema_nested_is_dynamic(sf_dir, edge_dir):
    # schema.rs:107: any group type -> dynamic
    got = {d["name"]: d["type"] for d in csl_schema(f"{sf_dir}/embeddings.parquet")}
    assert got["embedding"] == "dynamic"
    assert got["vec_id"] == "long" and got["label"] == "int"
    nested = {d["name"]: d["type"] for d in csl_schema(edge_dir["t_nested"])}
    assert nested == {"s": "dynamic", "l": "dynamic", "m": "dynamic"}


def test_csl_schema_edge_types(edge_dir):
    # BYTE_ARRAY/DECIMAL -> decimal vs plain BYTE_ARRAY -> dynamic;
    # INT64/TIMESTAMP -> datetime; DATE -> datetime; DOUBLE -> real
    assert csl_schema(edge_dir["t_decimal"])[0]["type"] == "decimal"
    assert csl_schema(edge_dir["t_binary"])[0]["type"] == "dynamic"
    ts = {d["name"]: d["type"] for d in csl_schema(edge_dir["t_timestamps"])}
    assert ts == {"ms": "datetime", "us": "datetime"}
    assert csl_schema(edge_dir["t_dates"])[0]["type"] == "datetime"
    assert csl_schema(edge_dir["t_floats"])[0]["type"] == "real"
    # uint64 is INT64 physical -> long (schema.rs:102)
    assert csl_schema(edge_dir["t_uint64"])[0]["type"] == "long"


def test_csl_schema_json_shape(sf_dir):
    # schema.rs:43-72: JSON array of {name, type}
    arr = json.loads(csl_schema_json(f"{sf_dir}/region.parquet"))
    assert isinstance(arr, list) and set(arr[0]) == {"name", "type"}


def test_row_groups_metadata(sf_dir):
    # schema.rs:118-143: per-group numberOfRows/totalByteSize as strings
    rgs = row_groups_metadata(f"{sf_dir}/lineitem.parquet")
    assert len(rgs) >= 1
    assert set(rgs[0]) == {"numberOfRows", "totalByteSize"}
    assert all(isinstance(v, str) for v in rgs[0].values())
    assert sum(int(r["numberOfRows"]) for r in rgs) > 0
