"""Pins for the r10 data-maintenance / training-prep operators:
merge_upsert (ANSI MERGE), scd2_apply (dimension history),
pack_sequences (GPT-style packing map) — hand-sized inputs with
closed-form expected outputs, independent of the oracle harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.operators import layout as L
from azure_kusto_parquet_conv_spark.operators import relational as R
from azure_kusto_parquet_conv_spark.sources.parquet import load_table


def test_merge_upsert_hand_rows(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    source = spark.createDataFrame(
        [(2, "B", 200.0), (9, "new", 90.0)],
        "k long, s string, v double")
    got = {r["k"]: (r["s"], r["v"])
           for r in R.merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0),
                   9: ("new", 90.0)}


def test_merge_upsert_null_source_value_still_updates(spark):
    """A matched row takes the source row's values even when a source
    column is NULL — presence is keyed on the join match, not on value
    non-nullness (the COALESCE shortcut would get this wrong)."""
    target = spark.createDataFrame([(1, "a")], "k long, s string")
    source = spark.createDataFrame([(1, None)], "k long, s string")
    [row] = R.merge_upsert(target, source, ["k"]).collect()
    assert row["s"] is None


def test_scd2_hand_rows(spark):
    dim = spark.createDataFrame(
        [(1, "x", "2020-01-01", None), (2, "y", "2020-01-01", None),
         (3, "z", "2020-01-01", None)],
        "k long, seg string, valid_from string, valid_to string")
    upd = spark.createDataFrame(
        [(1, "x"),          # unchanged -> stays open, no new version
         (2, "Y"),          # changed -> closed + new open version
         (7, "first")],     # brand new -> first open version
        "k long, seg string")
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"])
            for r in R.scd2_apply(dim, upd, ["k"], ["seg"],
                                  batch_date="2024-06-01").collect()}
    assert rows == {
        (1, "x", "2020-01-01", None),
        (2, "y", "2020-01-01", "2024-06-01"),
        (2, "Y", "2024-06-01", None),
        (3, "z", "2020-01-01", None),
        (7, "first", "2024-06-01", None),
    }


def test_pack_sequences_hand_rows(spark):
    """Budget 10, one stratum, docs of 4/8/3/10 tokens: stream offsets
    0,4,12,15 -> chunks (0,0),(0,1),(1,1),(1,2)."""
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 8), ("a", 3, 3), ("a", 4, 10)],
        "g string, doc long, nt long")
    got = {r["doc"]: (r["start_tok"], r["first_chunk"], r["last_chunk"],
                      r["n_chunks"])
           for r in L.pack_sequences(df, "doc", "nt", budget=10,
                                     by=["g"]).collect()}
    assert got == {1: (0, 0, 0, 1), 2: (4, 0, 1, 2),
                   3: (12, 1, 1, 1), 4: (15, 1, 2, 2)}


def test_pack_sequences_empty_doc_spans_no_chunk(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 0), ("a", 3, 5)],
        "g string, doc long, nt long")
    got = {r["doc"]: (r["start_tok"], r["first_chunk"], r["last_chunk"],
                      r["n_chunks"])
           for r in L.pack_sequences(df, "doc", "nt", budget=10,
                                     by=["g"]).collect()}
    assert got[2] == (5, None, None, 0)
    assert got[3] == (5, 0, 0, 1)


def test_pack_sequences_strata_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 7), ("b", 1, 7)], "g string, doc long, nt long")
    rows = L.pack_sequences(df, "doc", "nt", budget=10,
                            by=["g"]).collect()
    assert all(r["start_tok"] == 0 for r in rows)


def test_merge_upsert_plan_has_no_cartesian(spark):
    target = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"))
    source = spark.range(10).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v"))
    plan = R.merge_upsert(target, source, ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def _chunk_ref(toks, max_tokens, overlap):
    """Python reference: stride windows, >=1 chunk, every token kept."""
    stride = max_tokens - overlap
    n = len(toks)
    k = max(1, -((n - overlap) // -stride))  # ceil div
    return [(i, " ".join(toks[i * stride:i * stride + max_tokens]),
             min(max_tokens, n - i * stride)) for i in range(k)]


def test_chunk_documents_hand_rows(spark):
    """max 4 / overlap 1 (stride 3): 8 tokens -> chunks of 4/4/2 at
    starts 0,3,6; a 3-token doc (== at-or-under window) -> one chunk."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z")], "doc_id long, t string")
    got = {(r["doc_id"], r["chunk_id"]):
           (r["chunk_text"], r["n_chunk_tokens"])
           for r in L.chunk_documents(df, F.split("t", " "),
                                      max_tokens=4, overlap=1).collect()}
    assert got == {
        (1, 0): ("a b c d", 4), (1, 1): ("d e f g", 4),
        (1, 2): ("g h", 2), (2, 0): ("x y z", 3)}


def test_chunk_documents_matches_python_reference(spark):
    """Every token count 1..25 against the closed-form reference at
    max 8 / overlap 3 — covers the <=overlap clamp, the exact-boundary
    (n == max) single chunk, and the last-partial-window arithmetic."""
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(1, 26)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = L.chunk_documents(df, F.split("t", " "),
                            max_tokens=8, overlap=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"]))
    for n, t in rows:
        assert sorted(by_doc[n]) == _chunk_ref(t.split(" "), 8, 3), n


def test_chunk_documents_every_nonfirst_chunk_adds_content(spark, sf_dir):
    """Contract over the real corpus: chunk 0 always exists, and every
    chunk after it carries MORE than `overlap` tokens (pure-overlap tail
    chunks would duplicate training text)."""
    d = load_table(spark, sf_dir, "documents")
    out = L.chunk_documents(d, F.split(F.lower("text"), " "),
                            max_tokens=32, overlap=8)
    assert out.where((F.col("chunk_id") > 0)
                     & (F.col("n_chunk_tokens") <= 8)).count() == 0
    assert out.where(F.col("chunk_id") == 0).count() == d.count()


def test_chunk_documents_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, t string")
    with pytest.raises(ValueError):
        L.chunk_documents(df, F.split("t", " "), max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        L.chunk_documents(df, F.split("t", " "), max_tokens=4, overlap=-1)
