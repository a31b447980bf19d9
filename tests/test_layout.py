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


def test_hilbert_index_adjacency_exhaustive():
    """The defining Hilbert property, proven exhaustively on small
    grids: indices enumerate the grid exactly once AND consecutive
    indices are UNIT grid neighbors (Morton keys fail the second —
    they jump at quadrant boundaries). The Skilling transform is
    size-generic, so the 2D/3D proofs carry to any (dims, bits)."""
    from itertools import product

    from azure_kusto_parquet_conv_spark.operators.layout import (
        _hilbert_index)
    for n, b in ((2, 3), (3, 2)):
        side = 1 << b
        by_index = {}
        for pt in product(range(side), repeat=n):
            by_index[_hilbert_index(pt, b)] = pt
        assert sorted(by_index) == list(range(side ** n))
        for k in range(side ** n - 1):
            a, c = by_index[k], by_index[k + 1]
            assert sum(abs(x - y) for x, y in zip(a, c)) == 1, (a, c)
    # contrast pin: the Morton curve at (2, 3) breaks adjacency
    def morton(pt, b):
        z = 0
        for j in range(b):
            for i, v in enumerate(pt):
                z |= ((v >> j) & 1) << (j * len(pt) + i)
        return z
    m = {morton(pt, 3): pt for pt in product(range(8), repeat=2)}
    jumps = sum(sum(abs(x - y) for x, y in zip(m[k], m[k + 1])) != 1
                for k in range(63))
    assert jumps > 0


def test_hilbert_key_matches_reference_and_validates(spark):
    """The vectorized Arrow kernel equals the pure-Python reference
    point-for-point on a random grid; bad arity/width raise."""
    import random

    from azure_kusto_parquet_conv_spark.operators.layout import (
        _hilbert_index,
        hilbert_key,
    )
    rng = random.Random(7)
    rows = [(rng.randrange(1 << 10), rng.randrange(1 << 10),
             rng.randrange(1 << 10)) for _ in range(500)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = (df.withColumn("h", hilbert_key(["a", "b", "c"], 10))
             .collect())
    for r in got:
        assert r["h"] == _hilbert_index((r["a"], r["b"], r["c"]), 10)
    with pytest.raises(ValueError, match=">= 2 columns"):
        hilbert_key(["a"], 8)
    with pytest.raises(ValueError, match="signed long"):
        hilbert_key(["a", "b", "c"], 21)


def test_hilbert_sort_tightens_file_stats(spark, sf_dir, tmp_path):
    """hilbert_sort lays out files whose per-file min-max boxes are
    tight on BOTH dimensions (the multi-dim skipping contract), like
    the zorder twin."""
    from azure_kusto_parquet_conv_spark.operators.layout import (
        hilbert_sort)
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size")
    out = str(tmp_path / "hs")
    hilbert_sort(part, ["p_partkey", "p_size"], bits=8,
                 num_files=8).write.parquet(out)
    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        t = pq.read_table(f)
        if t.num_rows == 0:
            continue
        pk = t.column("p_partkey").to_pylist()
        sz = t.column("p_size").to_pylist()
        spans.append(((max(pk) - min(pk)), (max(sz) - min(sz))))
    assert len(spans) >= 4
    n_pk = max(r["p_partkey"] for r in part.collect())
    # average per-file extent must be well under the full domain on
    # at least the first interleaved dimension
    avg_pk = sum(s[0] for s in spans) / len(spans)
    assert avg_pk < 0.8 * n_pk
