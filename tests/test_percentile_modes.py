"""Pins for the r10 percentile sketch path (r9 verdict #4): exact
stays the default, `set percentile_mode = approx;` switches to the
bounded-state estimators, and the estimate provably agrees with exact
where the resolution allows."""

from __future__ import annotations

from azure_kusto_parquet_conv_spark.kql import kql


def test_exact_is_default_and_mode_does_not_leak(spark, sf_dir):
    import azure_kusto_parquet_conv_spark.kql as K

    assert K._PERCENTILE_MODE == "exact"
    kql(spark, sf_dir, """
      set percentile_mode = approx;
      lineitem | summarize p = percentile(l_quantity, 51)
    """).collect()
    # compile() restores the module flag after every query
    assert K._PERCENTILE_MODE == "exact"


def test_approx_plan_uses_sketch_not_exact_buffer(spark, sf_dir):
    plan_a = kql(spark, sf_dir, """
      set percentile_mode = approx;
      lineitem | summarize p = percentile(l_quantity, 51)
          by l_returnflag
    """)._jdf.queryExecution().analyzed().toString()
    assert "approx_percentile" in plan_a
    plan_e = kql(spark, sf_dir, """
      lineitem | summarize p = percentile(l_quantity, 51)
          by l_returnflag
    """)._jdf.queryExecution().analyzed().toString()
    assert "approx_percentile" not in plan_e


def test_approx_matches_exact_on_plateaus(spark, sf_dir):
    """l_quantity is a ~uniform 50-value plateau distribution: the GK
    rank error (n/10000) is far inside a plateau, so the estimate must
    return the same data value as the exact percentile."""
    a = {r["l_returnflag"]: r["p"] for r in kql(spark, sf_dir, """
      set percentile_mode = approx;
      lineitem | summarize p = percentile(l_quantity, 51)
          by l_returnflag
    """).collect()}
    e = {r["l_returnflag"]: r["p"] for r in kql(spark, sf_dir, """
      lineitem | summarize p = percentile(l_quantity, 51)
          by l_returnflag
    """).collect()}
    for flag, v in a.items():
        # exact interpolates between plateau members of the same value,
        # so it equals the plateau value too
        assert abs(v - e[flag]) < 1e-9, (flag, v, e[flag])


def test_percentilew_approx_equals_exact_at_resolving_scale(spark, sf_dir):
    """With a cent-resolution grid the bucketing is lossless for the
    2-decimal price column, so the bounded-state estimate must select
    the SAME cent value as the exact weighted percentile (compared in
    integer cents: bucket*0.01 can land one ulp off the literal parse
    of the same decimal — 5049252*0.01 = 50492.520000000004)."""
    approx = {r["l_returnflag"]: r["p50"] for r in kql(spark, sf_dir, """
      lineitem
        | evaluate percentilew_approx(l_extendedprice, l_quantity,
                                      50, 0.01, l_returnflag)
    """).collect()}
    exact = {r["l_returnflag"]: r["p50"] for r in kql(spark, sf_dir, """
      lineitem
        | summarize p50 = percentilew(l_extendedprice, l_quantity, 50)
            by l_returnflag
    """).collect()}
    assert set(approx) == set(exact)
    for flag in exact:
        assert round(approx[flag] * 100) == round(exact[flag] * 100), (
            flag, approx[flag], exact[flag])


def test_percentilew_approx_state_is_grid_bounded(spark, sf_dir):
    """The pre-aggregate keys on (group, bucket): with a $1000 grid the
    per-group frame is at most ~105 rows regardless of input size —
    the skewed-key buffer cliff of the exact fold cannot occur."""
    df = kql(spark, sf_dir, """
      lineitem
        | evaluate percentilew_approx(l_extendedprice, l_quantity,
                                      50, 1000.0, l_returnflag)
    """)
    rows = df.collect()
    assert 0 < len(rows) <= 3
    for r in rows:
        assert r["p50"] % 1000.0 == 0.0  # grid-aligned estimate
