"""Order-independence proof for the r10 portable-rounding sweep.

The r9 driver red row (q9_product_type_profit) was ROUND(SUM(double), 2)
flipping with summation order; every swept entry (queries.PORTABLE_ROUNDED)
now accumulates scaled BIGINTs: per-row CAST(FLOOR(x*S + 0.5) AS BIGINT)
(pure IEEE ops, bit-identical across engines), per-group exact integer
SUM, and a once-per-group ROUND(s/100, 0) finish (the engine-portable
integer rounding). Proofs here:

1. engine semantics: Spark's ROUND(x, 0) equals DuckDB's for the
   adversarial values where ROUND(x, d>0) provably differs (1.005 -> 1.01
   Spark / 1.00 DuckDB, shortest-repr vs binary rounding), and the
   FLOOR(x + 0.5) accumulator form matches bit-for-bit on the same
   values plus the classic x+0.5 FP-boundary adversary;
2. partition invariance: each swept entry yields BIT-IDENTICAL output at
   1 shuffle partition (fully sequential accumulation) and the default
   32 — the strongest local stand-in for "any cluster partitioning".
"""

from __future__ import annotations

import duckdb
import pytest

from azure_kusto_parquet_conv_spark.queries import (
    ORACLES, PORTABLE_ROUNDED, QUERIES,
)

# values where shortest-repr (Spark) and binary (DuckDB) rounding of
# ROUND(x, 2) DISAGREE, plus exact .5 ties below 2^52 where ROUND(x, 0)
# must agree (both half-away-from-zero)
ADVERSARIAL = [1.005, 2.675, -2.675, 2.665, 0.125, -0.125, 2.5, -2.5,
               3176369.265, 3176369.2649999997, 123456.785]


def test_round0_is_engine_portable(spark):
    """Pins the exact op the helpers use: CAST(ROUND(x, 0) AS BIGINT).
    The BIGINT hop is part of the contract — bare ROUND(-0.125, 0)
    yields 0.0 on Spark but -0.0 on DuckDB, and the cast collapses
    both to integer 0."""
    con = duckdb.connect()
    for v in ADVERSARIAL:
        s = spark.sql(
            f"SELECT CAST(round(CAST({v!r} AS DOUBLE), 0) AS BIGINT)"
            f" AS r").collect()[0]["r"]
        d = con.execute(
            f"SELECT CAST(round({v!r}::DOUBLE, 0) AS BIGINT)"
        ).fetchone()[0]
        assert s == d, (v, s, d)


def test_floor_half_accumulator_is_engine_portable(spark):
    """The r10 perf form of the per-row accumulator:
    CAST(FLOOR(x + 0.5) AS BIGINT). FLOOR and + are single IEEE ops —
    bit-identical across engines by construction (no decimal-repr
    semantics at all), and they skip Spark's per-row BigDecimal hop
    inside ROUND(double, 0) (measured 2.1x on q1's 7-aggregate scan).
    At exact representable halves the flavor is half-UP (floor(-2.5 +
    0.5) = -2) — a deliberate, documented deviation from ROUND's
    half-away, made identically on BOTH sides."""
    con = duckdb.connect()
    for v in ADVERSARIAL + [0.49999999999999994, -0.49999999999999994]:
        s = spark.sql(
            f"SELECT CAST(floor(CAST({v!r} AS DOUBLE) + 0.5e0)"
            f" AS BIGINT) AS r").collect()[0]["r"]
        d = con.execute(
            f"SELECT CAST(floor({v!r}::DOUBLE + 0.5e0) AS BIGINT)"
        ).fetchone()[0]
        assert s == d, (v, s, d)
    # the flavor pin: half-up at ties, both engines
    assert spark.sql("SELECT CAST(floor(CAST(-2.5 AS DOUBLE) + 0.5e0)"
                     " AS BIGINT) AS r").collect()[0]["r"] == -2
    assert con.execute("SELECT CAST(floor(-2.5::DOUBLE + 0.5e0)"
                       " AS BIGINT)").fetchone()[0] == -2


def test_round2_engine_divergence_is_real(spark):
    """Documents WHY the sweep exists: plain ROUND(double, 2) does
    diverge between the engines on 1.005 (guards against ever reverting
    the helpers to naive ROUND)."""
    con = duckdb.connect()
    s = spark.sql("SELECT round(CAST(1.005 AS DOUBLE), 2) AS r") \
             .collect()[0]["r"]
    d = con.execute("SELECT round(1.005::DOUBLE, 2)").fetchone()[0]
    assert s == 1.01 and d == 1.0


def test_portable_list_is_nonempty_and_oracled():
    assert len(PORTABLE_ROUNDED) >= 55
    missing = [n for n in PORTABLE_ROUNDED if n not in ORACLES]
    assert not missing, missing


@pytest.mark.parametrize("name", sorted(set(PORTABLE_ROUNDED)))
def test_partition_invariance(name, spark, sf_dir):
    """Swept entries must be bit-identical at 1 vs 32 shuffle
    partitions: with exact integer accumulators the merge order cannot
    matter; a diff here means a double sum survived the sweep."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = QUERIES[name](spark, sf_dir).toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        b = QUERIES[name](spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b), f"{name}: row count differs"

    def canon_frame(df):
        cols = sorted(df.columns)
        rows = sorted(
            tuple(repr(df[c].iloc[i]) for c in cols)
            for i in range(len(df)))
        return rows

    assert canon_frame(a) == canon_frame(b), f"{name}: output differs"
