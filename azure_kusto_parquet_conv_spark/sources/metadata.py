"""Schema / metadata introspection (reference operators O7-O9).

All three are driver-only metadata operations — no Spark job is launched.
The Kusto (CSL) type mapping reproduces ``field_csl_schema``
(pq2json/src/schema.rs:74-109) exactly, operating on the Parquet footer via
pyarrow so physical+logical type distinctions the reference keys on
(e.g. INT32/DECIMAL -> real vs BYTE_ARRAY/DECIMAL -> decimal) survive.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq


def schema_text(path: str) -> str:
    """O7 — full Parquet + file metadata dump (schema.rs:18-35)."""
    f = pq.ParquetFile(path)
    md = f.metadata
    # pyarrow's str(ParquetSchema) leads with the object repr
    # ('<pyarrow._parquet.ParquetSchema object at 0x...>') — a
    # run-nondeterministic artifact line the reference's printer does
    # not have; drop it so the dump is deterministic and oracle-able.
    schema_lines = [l for l in str(f.schema).split("\n")
                    if not l.startswith("<pyarrow._parquet.")]
    lines = [
        "File metadata:",
        f"  version: {md.format_version}",
        f"  num_rows: {md.num_rows}",
        f"  num_row_groups: {md.num_row_groups}",
        f"  created_by: {md.created_by}",
        "Schema:",
        "\n".join(schema_lines),
    ]
    return "\n".join(lines)


def _csl_type(column) -> str:
    """Map one footer column to a Kusto CSL type (schema.rs:74-109).

    physical_type / logical_type names come from the parquet-format spec, the
    same enums the reference matches on.
    """
    phys = column.physical_type  # BOOLEAN INT32 INT64 INT96 FLOAT DOUBLE BYTE_ARRAY FIXED_LEN_BYTE_ARRAY
    logical = str(column.logical_type.type).upper() if column.logical_type is not None else "NONE"
    if phys == "BOOLEAN":
        return "bool"  # schema.rs:82
    if phys == "BYTE_ARRAY":
        if logical in ("STRING", "ENUM", "JSON"):
            return "string"  # schema.rs:83-85 (UTF8|ENUM|JSON)
        if logical == "DECIMAL":
            return "decimal"  # schema.rs:86
        return "dynamic"  # schema.rs:87
    if phys == "FIXED_LEN_BYTE_ARRAY":
        return "decimal" if logical == "DECIMAL" else "dynamic"  # schema.rs:88-91
    if phys in ("DOUBLE", "FLOAT"):
        return "real"  # schema.rs:92
    if phys == "INT32":
        if logical == "DATE":
            return "datetime"  # schema.rs:94
        if logical == "DECIMAL":
            return "real"  # schema.rs:95
        return "int"  # schema.rs:96
    if phys == "INT64":
        if logical == "TIMESTAMP":
            return "datetime"  # schema.rs:99-100
        if logical == "DECIMAL":
            return "real"  # schema.rs:101
        return "long"  # schema.rs:102
    if phys == "INT96":
        return "datetime"  # schema.rs:103
    return "dynamic"


def csl_schema(path: str) -> list[dict[str, str]]:
    """O8 — ``[{"name": ..., "type": <csl type>}, ...]`` for each top-level
    field (schema.rs:43-72). Nested groups (struct/list/map) map to
    ``dynamic`` (schema.rs:107)."""
    f = pq.ParquetFile(path)
    arrow_schema = f.schema_arrow
    footer = f.schema  # flat leaf-column view
    # Leaf columns are dotted paths; group fields (any dot, or repeated)
    # collapse to one `dynamic` top-level entry, in schema order.
    leaf_by_root: dict[str, list] = {}
    for i in range(len(footer)):
        col = footer.column(i)
        root = col.path.split(".")[0]
        leaf_by_root.setdefault(root, []).append(col)
    out = []
    for field in arrow_schema:
        leaves = leaf_by_root.get(field.name, [])
        if len(leaves) == 1 and leaves[0].path == field.name and \
                leaves[0].max_repetition_level == 0:
            out.append({"name": field.name, "type": _csl_type(leaves[0])})
        else:
            out.append({"name": field.name, "type": "dynamic"})  # schema.rs:107
    return out


def csl_schema_json(path: str) -> str:
    return json.dumps(csl_schema(path))


def row_groups_metadata(path: str) -> list[dict[str, str]]:
    """O9 — per-row-group ``{numberOfRows, totalByteSize}`` (schema.rs:118-143).

    Values are strings, as in the reference output. The reference exposes
    this so the ingestion client can split large files; Spark performs that
    split natively (spark.sql.files.maxPartitionBytes), so this is purely an
    introspection/compat surface.
    """
    md = pq.ParquetFile(path).metadata
    out = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        out.append({
            "numberOfRows": str(rg.num_rows),
            "totalByteSize": str(rg.total_byte_size),
        })
    return out


def pruning_report(paths: list[str], column: str,
                   lo, hi) -> dict[str, int]:
    """Zone-map effectiveness: using only footer min/max statistics (the
    same metadata the reference exports via --rowgroups,
    schema.rs:118-143, for its caller to plan splits), count how many row
    groups a scan with predicate ``lo <= column <= hi`` could skip.
    This is exactly the skipping Spark/any engine performs from parquet
    stats — the report quantifies what a layout (sort, Z-order,
    partitioning) buys BEFORE running a query. Driver-only metadata walk;
    no data pages are read."""
    total = kept = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            stat = None
            for ci in range(md.num_columns):
                c = g.column(ci)
                if c.path_in_schema == column and c.statistics is not None:
                    stat = c.statistics
                    break
            # no stats -> must read (cannot prove it's prunable)
            if stat is None or (stat.max >= lo and stat.min <= hi):
                kept += 1
    return {"row_groups_total": total, "row_groups_read": kept,
            "row_groups_skipped": total - kept}
