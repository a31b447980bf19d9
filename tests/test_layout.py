"""Z-order layout: key correctness vs a Python reference, and the actual
data-skipping property — per-file parquet footer min-max ranges stay
tight on BOTH clustered columns after zorder_sort."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.operators.layout import (
    zorder_key,
    zorder_sort,
    zorder_sql,
)
from azure_kusto_parquet_conv_spark.sources.parquet import load_table


def _morton_ref(vals, bits):
    z = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * n + i)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (1, 2)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", zorder_key(["a", "b"], 8).alias("z"))
             .collect()}
    for a, b in rows:
        assert got[(a, b)] == _morton_ref([a, b], 8), (a, b)


def test_zorder_sql_matches_reference():
    import duckdb
    con = duckdb.connect()
    expr = zorder_sql(["a", "b"], 8)
    for a, b in [(3, 5), (255, 0), (170, 85)]:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {a} AS a, {b} AS b)").fetchone()[0]
        assert got == _morton_ref([a, b], 8)


def test_zorder_key_validates_args(spark):
    with pytest.raises(ValueError):
        zorder_key(["a"], 8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], 40)


def _file_spans(files, col, lo, hi):
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        spans.append((fmax - fmin) / max(hi - lo, 1))
    return sum(spans) / len(spans)


def test_zorder_sort_tightens_file_stats_on_both_dims(spark, sf_dir,
                                                      tmp_path):
    """After zorder_sort on (l_orderkey, l_partkey) into 8 files, the
    average per-file min-max span must be well under the full range on
    BOTH columns — a single-column sort keeps the second column's span at
    ~1.0, which is exactly what Z-ordering fixes."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    bounds = li.agg(F.min("l_orderkey"), F.max("l_orderkey"),
                    F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    out = str(tmp_path / "zorder")
    zorder_sort(li, ["l_orderkey", "l_partkey"], bits=10,
                num_files=8).write.parquet(out)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 4, files
    span_ok = _file_spans(files, "l_orderkey", bounds[0], bounds[1])
    span_pk = _file_spans(files, "l_partkey", bounds[2], bounds[3])
    assert span_ok < 0.8, f"l_orderkey avg span {span_ok}"
    assert span_pk < 0.8, f"l_partkey avg span {span_pk}"
    # and the layout is a pure reorder: same multiset of rows
    assert spark.read.parquet(out).count() == li.count()


def test_zorder_beats_single_sort_for_second_dim(spark, sf_dir, tmp_path):
    """The quantified payoff: for a predicate on the SECOND dimension,
    a single-column sort prunes nothing (every file spans the full
    l_partkey range) while the Z-ordered layout skips row groups."""
    import glob as _glob
    from azure_kusto_parquet_conv_spark.sources.metadata import (
        pruning_report,
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    lo, hi = 10, 60  # narrow l_partkey slice
    single = str(tmp_path / "single_sort")
    (li.repartitionByRange(8, "l_orderkey")
       .sortWithinPartitions("l_orderkey").write.parquet(single))
    zord = str(tmp_path / "zorder")
    zorder_sort(li, ["l_orderkey", "l_partkey"], bits=10,
                num_files=8).write.parquet(zord)
    rep_single = pruning_report(
        sorted(_glob.glob(f"{single}/part-*.parquet")), "l_partkey", lo, hi)
    rep_z = pruning_report(
        sorted(_glob.glob(f"{zord}/part-*.parquet")), "l_partkey", lo, hi)
    assert rep_single["row_groups_skipped"] == 0, rep_single
    assert rep_z["row_groups_skipped"] > 0, rep_z


def test_zorder_key_three_columns(spark):
    """n=3 interleave: bit j of column i lands at j*3+i (same layout the
    SQL renderer emits), and the 63-bit budget guard still applies."""
    rows = [(1, 2, 3), (255, 0, 128), (7, 7, 7)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = {(r["a"], r["b"], r["c"]): r["z"] for r in
           df.select("a", "b", "c",
                     zorder_key(["a", "b", "c"], 8).alias("z")).collect()}
    for t in rows:
        assert got[t] == _morton_ref(list(t), 8), t
    import duckdb
    expr = zorder_sql(["a", "b", "c"], 8)
    con = duckdb.connect()
    for t in rows:
        v = con.execute(f"SELECT {expr} FROM (SELECT {t[0]} AS a, "
                        f"{t[1]} AS b, {t[2]} AS c)").fetchone()[0]
        assert v == _morton_ref(list(t), 8), t
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"], 22)  # 66 bits > signed long
