"""Unit semantics for the relational operators against hand-computed
expectations on tiny frames (the fixture-scale differential tests live in
test_queries_oracle.py)."""

import datetime as dt

from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.operators import relational as R


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "L1"),
         (1, ts("2024-01-01 12:00:00"), "L2"),
         (2, ts("2024-01-01 10:30:00"), "L3")],
        "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 100.0),
         (1, ts("2024-01-01 11:00:00"), 200.0),
         (2, ts("2024-01-01 11:00:00"), 300.0)],
        "k long, ts timestamp, rv double")
    out = {r["lv"]: r["rv_right"]
           for r in R.asof_join(left, right, on="k").collect()}
    assert out == {"L1": 100.0, "L2": 200.0, "L3": None}


def test_asof_join_exact_tie_matches(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), "L")],
                                 "k long, ts timestamp, lv string")
    right = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), 7.0)],
                                  "k long, ts timestamp, rv double")
    [row] = R.asof_join(left, right, on="k").collect()
    assert row["rv_right"] == 7.0  # at-or-before includes equal timestamps


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), "L")],
                                 "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1.0),
         (1, ts("2024-01-01 10:30:00"), 2.0),
         (1, ts("2024-01-01 11:00:00"), 3.0)],
        "k long, ts timestamp, rv double")
    [row] = R.asof_join(left, right, on="k", direction="forward").collect()
    assert row["rv_right"] == 2.0  # nearest at-or-after


def test_sessionize_gap_rule(spark):
    rows = [(1, ts("2024-01-01 10:00:00")),
            (1, ts("2024-01-01 10:10:00")),   # same session (10 min)
            (1, ts("2024-01-01 11:00:00")),   # new session (50 min gap)
            (2, ts("2024-01-01 10:00:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = R.sessionize(df, key="user_id", ts="ts", gap="30 minutes")
    got = sorted((r["user_id"], r["ts"].isoformat(), r["session_id"])
                 for r in out.collect())
    assert [g[2] for g in got] == [1, 1, 2, 1]


def test_sessionize_exact_gap_boundary(spark):
    # gap strictly-greater-than rule: exactly 30min stays in-session
    rows = [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:30:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = R.sessionize(df, key="user_id", ts="ts", gap="30 minutes")
    assert {r["session_id"] for r in out.collect()} == {1}


def test_range_join_bucketed_equals_plain(spark, sf_dir):
    """The bucketed range join must produce exactly the plain join's pairs."""
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    ev = load_table(spark, sf_dir, "events").limit(400)
    p = ev.where(F.col("event_type") == "purchase") \
          .select(F.col("event_id").alias("pid"), "user_id", "ts")
    c = ev.where(F.col("event_type") == "click") \
          .select(F.col("event_id").alias("cid"), "user_id", "ts")
    hour = 3_600_000
    plain = p.alias("p").join(
        c.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.unix_millis(F.col("c.ts")) >= F.unix_millis(F.col("p.ts")) - hour)
        & (F.unix_millis(F.col("c.ts")) <= F.unix_millis(F.col("p.ts"))))
    plain_pairs = {(r["pid"], r["cid"]) for r in
                   plain.select("pid", "cid").collect()}
    bucketed = R.range_join_bucketed(
        p, c.select(F.col("cid"), F.col("user_id"), F.col("ts").alias("cts")),
        key="user_id", left_ts="ts", right_ts="cts",
        lower_ms=-hour, upper_ms=0)
    got = {(r["pid"], r["cid"]) for r in bucketed.select("pid", "cid").collect()}
    assert got == plain_pairs and len(plain_pairs) > 0


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9)], "g string, v long")
    out = R.top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [("a", 3), ("a", 5), ("b", 9)]


def test_approx_percentiles_near_exact(spark, sf_dir):
    """The sketch must land within 1% relative error of the exact
    percentiles at test scale (accuracy=10000 => rank error <= n/10000)."""
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    approx = {r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
              for r in QUERIES["q_approx_percentiles"](spark, sf_dir)
              .collect()}
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    exact = {r["l_returnflag"]: r["pcts"] for r in
             load_table(spark, sf_dir, "lineitem")
             .groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95, "
                         "0.99))").alias("pcts")).collect()}
    assert set(approx) == set(exact)
    for flag, pcts in approx.items():
        for a, e in zip(pcts, exact[flag]):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_freq_items_superset_guarantee(spark, sf_dir):
    """freqItems(support=s) must return every value whose true frequency
    exceeds s — verified against exact counts."""
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    exact_hot = {r["event_type"] for r in
                 ev.groupBy("event_type").count()
                 .where(F.col("count") > 0.15 * total).collect()}
    got = set(ev.stat.freqItems(["event_type"], support=0.15)
              .collect()[0]["event_type_freqItems"])
    assert exact_hot <= got, (exact_hot, got)


def test_sample_by_fractions_and_determinism(spark, sf_dir):
    """Per-stratum sample sizes must track the requested fractions
    (binomial tolerance), rare strata kept whole, and the same seed must
    reproduce the identical sample."""
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    ev = load_table(spark, sf_dir, "events")
    totals = {r["event_type"]: r["count"]
              for r in ev.groupBy("event_type").count().collect()}
    fractions = {"click": 0.2, "view": 0.2, "purchase": 1.0,
                 "signup": 1.0, "error": 0.5}
    got = {r["event_type"]: r["n_sampled"]
           for r in QUERIES["q_sample_by"](spark, sf_dir).collect()}
    for k, frac in fractions.items():
        expect = totals[k] * frac
        if frac == 1.0:
            assert got[k] == totals[k], (k, got[k], totals[k])
        else:
            sd = (totals[k] * frac * (1 - frac)) ** 0.5
            assert abs(got[k] - expect) <= 5 * sd + 1, (k, got[k], expect)
    again = {r["event_type"]: r["n_sampled"]
             for r in QUERIES["q_sample_by"](spark, sf_dir).collect()}
    assert got == again


def test_validate_single_pass_counts(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.operators import validate as V
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    li = load_table(spark, sf_dir, "lineitem")
    rep = {r["check"]: r["n_violations"] for r in V.validate(
        li,
        [V.not_null("l_orderkey"),
         V.in_range("l_discount", 0.0, 0.1),
         V.accepted_values("l_returnflag", ["A", "N", "R"]),
         V.in_range("l_quantity", 1, 10)],
        unique=["l_orderkey", "l_linenumber"]).collect()}
    assert rep["not_null(l_orderkey)"] == 0
    assert rep["in_range(l_discount,0.0,0.1)"] == 0
    assert rep["accepted_values(l_returnflag)"] == 0
    # the synthetic fixture does NOT enforce TPC-H key uniqueness — the
    # check must report exactly the surplus rows beyond one per key
    surplus = (li.groupBy("l_orderkey", "l_linenumber").count()
                 .where(F.col("count") > 1)
                 .agg(F.sum(F.col("count") - 1)).collect()[0][0])
    assert rep["unique(l_orderkey,l_linenumber)"] == surplus > 0
    # quantity runs 1..50, so the tight range must flag most rows
    n = li.count()
    exact = li.where(~F.col("l_quantity").between(1, 10)).count()
    assert rep["in_range(l_quantity,1,10)"] == exact > 0.5 * n


def test_expect_raises_with_failed_checks(spark, sf_dir):
    import pytest as _pytest
    from azure_kusto_parquet_conv_spark.operators import validate as V
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    li = load_table(spark, sf_dir, "lineitem")
    with _pytest.raises(V.ValidationError, match="in_range"):
        V.expect(li, [V.in_range("l_quantity", 1, 10)])
    V.expect(li, [V.not_null("l_orderkey")])  # passing gate: no raise


def test_drift_report_detects_shift(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.operators.validate import (
        drift_report,
    )
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    new = old.withColumn("o_totalprice", F.col("o_totalprice") * 2)
    rep = {r["column"]: r for r in drift_report(old, new).collect()}
    tp = rep["o_totalprice"]
    assert tp["new_mean"] == round(tp["old_mean"] * 2, 4) or \
        abs(tp["new_mean"] - 2 * tp["old_mean"]) < 1e-3
    assert tp["old_count"] == tp["new_count"]
    ok = rep["o_orderkey"]
    assert ok["old_min"] == ok["new_min"] and ok["old_max"] == ok["new_max"]
    pr = rep["o_orderpriority"]
    assert pr["old_mean"] is None and pr["old_null_rate"] == 0.0


def test_snapshot_diff_classification(spark):
    """Hand-built snapshots: every change class, including a present row
    whose compared values are all null (must NOT read as absent)."""
    from azure_kusto_parquet_conv_spark.operators.relational import (
        snapshot_diff)
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, None)],
        "k int, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (5, "e", 50.0), (4, None, None)],
        "k int, s string, v double")
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "update", 3: "delete",
                   5: "insert", 4: "unchanged"}


def test_snapshot_diff_carries_old_new_values(spark):
    from azure_kusto_parquet_conv_spark.operators.relational import (
        snapshot_diff)
    old = spark.createDataFrame([(1, 10.0)], "k int, v double")
    new = spark.createDataFrame([(1, 11.0)], "k int, v double")
    [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert (r["change_type"], r["old_v"], r["new_v"]) == ("update", 10.0, 11.0)
