"""KQL-flavored pipeline DSL compiled to PySpark DataFrames.

The reference feeds Azure Data Explorer, whose query language is KQL —
but the reference itself contains no query language at all (SURVEY.md
§2.4: no filters, no expressions beyond type rendering). This module is
the extension that closes that loop: a tabular subset of KQL
(`T | where .. | extend .. | summarize .. by .. | join .. | sort | take`)
parsed here and compiled to DataFrame operations, so every pipeline
stays inside Catalyst (whole-stage codegen, pushdown, broadcast — no
Python in the row path).

Design: the expression grammar is parsed with a Pratt parser into an AST
rendered as a Spark SQL expression string (`F.expr`), i.e. KQL
expressions become Catalyst expressions 1:1; tabular operators map to
DataFrame verbs (`where`→filter, `summarize`→groupBy.agg, `join`→join
with an optional broadcast hint, `top/sort/take`→orderBy/limit, which
Spark collapses to TakeOrderedAndProject).

Supported surface (each line maps to one DataFrame verb):
  [let name = scalar|tabular|materialize(tabular)
             |(param: type, ...) { scalar-fn body }; ...]
  toscalar(pipeline)  (driver-materialized one-cell literal)
  T / datatable(...)[...] / print e / range x from a to b step s /
  externaldata (schema) ['uri'] with (format=...)
    | where <pred>  /  parse-where col with pattern
    | parse [kind=simple|regex [flags=ims]] col with pattern
    | project c1, alias=expr, ...
    | project-away | project-keep | project-rename | project-reorder
    | extend alias=expr, ...   (row_number()/row_cumsum(x [, restart])/
        prev|next(x [, offset [, default]])/
        row_window_session(ts, maxDur, maxGap [, restart])
        after sort — key-partitioned inside `partition by`)
    | summarize [hint.shufflekey=k] a=agg(x), ...
        by k1, name=expr, bin(ts, 1h), bin_at(x, size, anchor)
    | make-series a=agg(x), b=agg2(y), ... [default=v|null]
        on ts [from t0 to t1] step 1d [by keys]   (dense over the FULL
        range — explicit [t0, t1) anchored at t0, else min..max of the
        data; empty bins take default — 0 when omitted, per Kusto)
    | search [kind=case_(in)sensitive] 'term'  (any-string-column match)
    | mv-expand alias=array_expr [, b, ...]  (dynamic arrays too;
        multiple arrays expand zipped, short ones null-padded)
    | scan [with_match_id=m] with (step s1: p1; step s2: p2; ...)
        (ordered sequence matching — greedy single active sequence,
        emit-on-match; predicates pre-computed as Catalyst boolean
        columns, stateful pass is an Arrow-batched applyInPandas per
        partition key)
    | mv-apply x = arr [to typeof(t)] on ( where .. | extend .. |
        top .. | summarize .. )
    | parse col with 'lit' name:type ...
    | parse-kv expr as (k1[:t1], ...) with (pair_delimiter='..',
        kv_delimiter='..' [, quote='..'] | regex=@'(k)(v)')
        (per-key anchored regexp_extract / one regexp_extract_all
        pair — log-parsing workhorse)
    | facet by c1[, c2 ...]  (N frequency tables stacked long-form
        over ONE cached scan)
    | fork [n1 =] (subpipe) [n2 =] (subpipe) ...  (N children over one
        cached input, unionByName + fork_name discriminator)
    | make-graph src --> dst [with Nodes on id | with_node_id=n]
    | graph-match [cycles=none] (a)-[e]->(b)-[*1..3]->(c)
        [where ..] project ..  (fixed patterns -> equi-join chains;
        var-length -> union of hop counts)
    | graph-shortest-paths [output=any|all] (a)-[*1..4]->(b)
        [where ..] project ..  (min-hop pairs via one grouped min)
    | graph-to-table nodes|edges [with_*_id=..]  (graph back to rows)
    | graph-mark-components [with_component_id=..]  (undirected
        components, min-id labels, iterative label propagation)
    | evaluate bag_unpack(dynamic_col)
    | evaluate pivot(col [, agg(x) [, key1, ...]])  (values -> columns)
    | evaluate autocluster([min_percent])  (attribute-pattern mining:
        exact cube enumeration, wildcard nulls, coverage+specificity)
    | evaluate basket([threshold])  (frequent itemsets, same exact
        cube pass, fractional support, Kusto default 0.05)
    | evaluate diffpatterns(split, 'A', 'B' [, min_diff])
        (cohort pattern differencing — root-cause analysis)
    | evaluate narrow()  ((Row, Column, Value) rotation; serialized
        row ids when a sort precedes)
    | evaluate funnel_sequence_completion(id, tl, start, end, bin,
        state, dynamic([states]), dynamic([windows]))  (cohorted
        funnel completion via sequential-min joins)
    | evaluate funnel_sequence(id, tl, start, end, max_window, step,
        state, dynamic([states]))  (prev/next state distribution
        around the sequence; lead-chain window match)
    | evaluate python(typeof(*|cols), 'script' [, dynamic kargs])
        (inline pandas script per Arrow batch via mapInPandas — the
        same per-extent distribution contract as Kusto's plugin)
    | evaluate sliding_window_counts(id, tl, start, end, look, bin)
        (trailing-window count/dcount per bin; explode-to-bins)
    | evaluate activity_engagement(id, tl, start, end, inner, outer)
        (DAU/MAU-style engagement ratio, one aggregate)
    | evaluate activity_counts_metrics(id, tl, start, end, window)
        (per-window count/dcount/new/cumulative distinct)
    | evaluate active_users_count(id, tl, start, end, look, period,
        n, bin)  (stickiness MAU: ids active >= n distinct periods)
    | evaluate activity_metrics(id, tl, start, end, window)
        (dcount/new/retention_rate/churn_rate vs previous window)
    | evaluate session_count(id, tl, start, end, bin, look)
        (gaps-and-islands sessions active per grid bin)
    | evaluate new_activity_metrics(id, tl, start, end, window)
        (cohort retention: new-in-from x active-in-to pairs)
    | evaluate ipv4_lookup(Lookup, ip, key [, return_unmatched])
        (CIDR longest-prefix enrichment via bounded prefix explode)
    | evaluate dcount_intersect(hll1, hll2 [, hll3, hll4])
        (audience overlap from sketches alone: inclusion-exclusion
        over hll_union — exact in the Datasketches sparse regime)
    | evaluate rows_near(cond, before [, after])  (context rows via
        one codegen window frame — grep -C for tables)
    | evaluate percentilew_exact(v, w, P [, by...])  (exact weighted
        percentile with NO per-group buffering: per-value pre-agg +
        cumulative window — the 100 TB twin of percentilew())
    | evaluate rolling_percentile(v, pct, axis, binSize, windows
        [, by...])  (per-bin exact percentile over the trailing
        window of bins; bounded explode + the same crossing window)
    | evaluate sequence_detect(tl, gap, win, s=p, ..., dims)
        (gap/window-constrained ordered sequences per key)
    | reduce by expr   (log-template mining: guid/hex/digit runs -> '*')
    | distinct c1, c2
    | sort by c1 desc, c2 asc [nulls first|last]
        (Kusto default direction: desc; asc=nulls first, desc=last)
Postfix indexer on dynamics/arrays: arr[0], arr[-1], bag['key'],
    bag[keyExpr], nested b['j']['x'] (variant out, 0-based,
    negatives from the end).
    | top N by expr  /  top-hitters N of col [by expr]
    | top-nested N of col by agg, ...
    | sample N  /  sample-distinct N of col   (seeded, deterministic)
    | take N  /  limit N  /  count  /  getschema  /  serialize
    | consume   (evaluate fully, return an empty frame — diagnostics)
    | partition by k1[, k2...] ( where .. | sort .. | extend .. |
        top .. | take .. | summarize .. | scan .. )   (per-key scope;
        serialized ops compile to key-partitioned windows — the
        scale-safe form)
    | join kind=innerunique(default)|inner|left|right|fullouter|leftsemi|
        leftanti|rightsemi|rightanti [hint.broadcast |
        hint.strategy=broadcast|shuffle | hint.shufflekey=col]
        [hint.num_partitions=N]
        (subpipeline) on key / on $left.a == $right.b
    | lookup [kind=...] (dim) on key
    | union [isfuzzy=true] [kind=...] [withsource=col] T2, ...
    | evaluate preview(N) / schema_merge([PreserveOrder])
        / diffpatterns_text(text, split, 'A', 'B' [, min_diff])
        / infer_storage_schema('path-or-table')
        / ai_embeddings|ai_embed_text(text [, 'hash' [, dim]])
          (deterministic hashing-trick provider; no network calls)
Sources: table | datatable(...) | print | range | externaldata(...)
    | union T1, T2, ...   (source position)
    | table('name') / materialized_view('name') / database('db').Name
        (db qualifier accepted and ignored)
    | find [withsource=col] in (T1, T2, ...) where pred
    | as name   /   render <charttype>
    | invoke f(args)   (tabular function-lets: let f = (T:(*), ..) {..})
Scalar fns: strlen, tolower, toupper, substring (0-based, KQL-style),
strcat, strcat_delim, iff/iif, case, toint/tolong/todouble/tostring/
tobool/todatetime, bin, bin_at, extract, extract_all, extractjson,
parse_json/todynamic (dynamic on Spark VARIANT; d.path compiles to
variant_get), series_sum/avg/min/max, series_fir, series_iir,
series_fill_const/
forward/backward/linear, series_outliers (Tukey fences), series_seasonal/series_stdev/
series_pearson_correlation, series_add/subtract/multiply/divide,
series_decompose (full additive bag + tuple assign),
series_decompose_anomalies (decompose -> Tukey-fence residual scores
-> +/-1 flags at threshold; Kusto's bundled anomaly pipeline by name),
series_fit_2lines (bare name + tuple assign over the exact pure-SQL
two-segment enumeration; bag carries variance/rvariance),
series_periods_detect (ACF peak-picker bag + tuple assign),
series_fft / series_ifft (numpy Arrow-batched kernel, tuple assign),
series_periods_validate (ACF scores at given periods),
series_fit_poly (numpy lstsq bag: rsquare/coefficients/variance/
rvariance/poly_fit; optional x + degree),
series_fit_line_dynamic (least-squares bag), series_fit_2lines_dynamic
(best two-segment piecewise fit), series_decompose_forecast
(linear trend + periodic-mean seasonal), contains/startswith/endswith/
has/has_cs/!has/has_any/has_all (term match), contains/startswith/
endswith + _cs and ! variants, matches regex, in/!in/in~/!in~,
between (lo .. hi), ==/!=/=~/!~,
arithmetic, datetime(...) literals, now/ago, format_datetime,
startof/endof day|week|month|year (Sunday weeks), dayofweek (timespan),
format_timespan (compile-time format parse), format_bytes (1024 units),
getyear/getmonth/dayofmonth/hourofday, indexof, countof, trim/
trim_start/trim_end (regex per Kusto), replace_string/replace_regex,
strrep, hash (xxhash64), isempty/isnotempty, indexof_regex, reverse,
make_datetime/make_timespan, unixtime_(seconds|milliseconds|
microseconds|nanoseconds)_todatetime, bitset_count_ones, toguid,
array_reverse, base64_decode_toarray,
unicode_codepoints_from_string/_to_string (surrogate-safe),
parse_path (bag: Scheme/RootPath/DirectoryPath/DirectoryName/Filename/
Extension/ADS), format_ipv4/format_ipv4_mask/ipv4_netmask_suffix,
pack/bag_pack (dynamic bag builder), pack_array, array_length/
array_index_of/array_slice/array_sort_asc|desc/array_concat,
set_union/set_intersect/set_difference, array_iff (+array_iif alias)/
array_rotate_*/array_shift_* (empty-array-guarded), zip (null-padded
to the longest input), isutf8, regex_quote (RE2 QuoteMeta),
convert_angle|length|mass|speed|volume|energy|force|power|pressure|
temperature (UnitsNet names, compile-time factor fold),
parse_user_agent (browser/os/device bags; major-family codegen
approximation of uap-core), parse_xml (ElementTree kernel, Kusto
'@attr'/'#text'/sibling-array convention), bag_has_key (top-level +
JSONPath), extract_json alias, startofquarter/endofquarter,
parse_urlquery ('Query Parameters' bag, url-decoded),
base64_encode_fromguid/base64_decode_toguid (.NET mixed-endian,
doc-example-pinned), treepath (bracket-quoted node paths),
estimate_data_size (JSON-octet estimate),
column_ifexists, totimespan, split/translate/url codecs/
parse_version/parse_csv/parse_ipv4 family/parse_ipv6 family
(parse_ipv6/parse_ipv6_mask/ipv6_compare/ipv6_is_match/
ipv6_is_in_range/ipv6_is_in_any_range — Arrow-batched stdlib
`ipaddress` kernels, _register_ipv6_udfs)/datetime_add-diff/
datetime_part (full part list, ISO week, sub-second from the epoch-µs
remainder)/datetime_utc_to_local + datetime_local_to_utc (JVM IANA tz
database)/bin_auto via set query_bin_auto_size|minimum/
count_distinct + count_distinctif (exact siblings of dcount[if])/
make_list_with_nulls/series_magnitude/isascii/
base64_encode_fromarray (inverse of base64_decode_toarray)/
geo_point_in_polygon (dynamic-literal polygon, compile-time-folded
even-odd ray cast)/binary ops/
tohex/strcmp/string_size/repeat/new_guid/rand(n)/isnan-isinf-isfinite,
the r8 math batch (log/log2/log10/exp/exp2/exp10, sin/cos/tan/asin/
acos/atan/atan2/cot, degrees/radians, sign/sqrt/pow/pi,
array_sum/array_avg — null/non-numeric elements ignored per Kusto),
series_abs/exp/log/sign/sqrt/floor/ceiling/pow (elementwise),
series_sin/cos/tan/asin/acos/atan (r11) + series_equals/not_equals/
greater/greater_equals/less/less_equals (pairwise bool series),
make_string (codepoints alias), replace_strings (sequential fold),
pack_all([ignore_null_empty]) (schema-aware, token-level),
pack_dictionary (pack alias), parse_command_line (windows
CommandLineToArgvW rules + posix shlex, codec-UDF kernel),
ipv4_compare/ipv4_is_match (min-prefix masking),
geo_line_length/geo_polygon_area (spherical shoelace)/
geo_polygon_centroid/geo_distance_point_to_line (local planar),
bag_merge (first-occurrence-wins map<string,variant> fold),
bag_remove_keys/bag_set_key (top-level), gettype (Kusto type names),
array_split (0-based indices, negatives wrap), has_any_index,
dynamic_to_json (recursive key-sorted canonical text via Arrow UDF),
typed null literals (long(null)/real(null)/bool(null)/datetime(null)/
timespan(null)/guid(null)/decimal(null)),
series_dot_product/series_cosine_similarity,
extend (n1, n2, ...) = series_fit_line(y) tuple assignment,
geo_distance_2points/geo_point_in_circle (haversine),
geo_point_to_geohash (compile-time-unrolled integer interleave — the
spatial bucketing key)/geo_geohash_to_central_point (HOF fold),
geo_point_to_s2cell/geo_s2cell_to_central_point (published s2geometry
face+Hilbert algorithm via an Arrow kernel; doc-example + roundtrip +
parent-containment pinned),
geo_geohash_to_polygon (cell rectangle)/geo_geohash_neighbors
(integer cell arithmetic, longitude wrap, polar rows drop),
geo_s2cell_parent/children/neighbors/to_polygon (canonical
child_begin / GetEdgeNeighbors / FromFaceIJWrap arithmetic over the
same kernels), geo_azimuth (initial great-circle bearing),
geo_polygon_perimeter (all-rings haversine edge sum),
geo_line_centroid (length-weighted), geo_distance_point_to_polygon
(even-odd inside -> 0, else min edge distance, local planar),
hash/hash_xxhash64 optional modulus, bag_pack_columns (keys = column
names), series_product, percentile_array_tdigest,
geo_*h3cell* family (point_to/central_point/parent/children/rings/
neighbors/to_polygon — DELEGATED to the optional `h3` reference
library via an import-gated socket; loud compile-time contract when
absent, see _h3_api),
geo_line_densify/geo_line_simplify/geo_polygon_densify/
geo_polygon_simplify (slerp subdivision / iterative RDP Arrow
kernels), geo_intersects_2lines (planar segment sweep),
evaluate preview(N) (sample + total_count), evaluate schema_merge
(getschema-merge, conflicts widen to variant), evaluate
diffpatterns_text (per-(token-count, anchor) consensus patterns,
exact cohort counts — documented approximation),
scalar range(start, stop[, step]) dynamic arrays,
percentiles_array, make_list_if/make_set_if, binary_all_and-or-xor.
Aggregates: count, countif, sum/avg/min/max (+ sumif/avgif/minif/maxif),
arg_max/arg_min, percentile (0-100 scale, exact), dcount/dcountif
(exact; real Kusto estimates — documented deviation), stdev, variance,
take_any, make_list, make_set, make_bag/make_bag_if (first-merged-wins),
percentilew (exact weighted percentile — deviation like percentile),
percentilesw (plural weighted, tuple assign; the sorted-pairs buffer
dedups to one aggregate per group), stdevp/variancep,
stdevif/varianceif/take_anyif/covariance[p][if] (CASE-gated), around,
hll/hll_if/hll_merge/dcount_hll (real
Datasketches HLL sketches — the mergeable re-aggregation form).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from azure_kusto_parquet_conv_spark.session import prepare_session
from azure_kusto_parquet_conv_spark.sources.parquet import TABLES, load_table

# ----------------------------------------------------------------------
# Tokenizer
# ----------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<dt>\bdatetime\s*\([^)]*\))
  | (?P<timespan>\b\d+(?:\.\d+)?(?:ms|s|m|h|d)\b)
  | (?P<hexnum>0[xX][0-9a-fA-F]+\b)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<vstr>@'(?:[^']|'')*'|@"(?:[^"]|"")*")
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<nop>!(?:contains_cs|contains|hasprefix_cs|hasprefix
              |hassuffix_cs|hassuffix|has_cs|has|startswith_cs
              |startswith|endswith_cs|endswith|between)\b|!in~|!~)
  | (?P<inci>\bin~)
  | (?P<ident>\$?[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op>==|!=|=~|<=|>=|!in\b|<|>|\(|\)|\[|\]|\{|\}|:|,|\+|-|\*|/|%|=|\.|\|)
""", re.VERBOSE)


@dataclass
class Tok:
    kind: str
    text: str


def _parens_balanced_span(text: str) -> bool:
    """True when the opening '(' at position 0 matches the CLOSING
    paren at the last position — i.e. stripping one layer is safe.
    '(A) | union (B)' starts and ends with parens but its first paren
    closes early; stripping would mis-parse (r12 review)."""
    depth = 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(text) - 1
    return False


def _kql_str_value(lit: str) -> str:
    """Decode a lexed KQL string literal token (quotes included,
    verbatim forms already normalized at lex time) to its Python
    value."""
    body = lit[1:-1]
    out, i = [], 0
    esc = {"n": "\n", "t": "\t", "r": "\r", "0": "\0",
           "a": "\a", "b": "\b", "f": "\f", "v": "\v"}
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            if n == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(esc.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"KQL: cannot tokenize at ...{s[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "hexnum":
            # Kusto hex int literals (0x1f) — normalized to decimal
            # at lex time so downstream SQL rendering stays uniform.
            # Kusto's carrier is long: 64-bit patterns wrap to signed
            # two's-complement (0xFFFFFFFFFFFFFFFF -> -1) instead of
            # silently widening to DECIMAL(20,0); wider literals are a
            # clear lex error, never a silent type change (r11 advice)
            hv = int(m.group(), 16)
            if hv >= 1 << 64:
                raise ValueError(
                    f"KQL: hex literal {m.group()} overflows long "
                    f"(64 bits)")
            if hv > (1 << 63) - 1:
                hv -= 1 << 64
            out.append(Tok("num", str(hv)))
            continue
        if kind == "vstr":
            # Kusto verbatim strings (@'...'): backslashes are
            # LITERAL, internal quotes double. Normalized to an
            # equivalent escaped standard literal at lex time so the
            # one string-rendering path serves both forms.
            raw = m.group()
            q = raw[1]
            body = raw[2:-1].replace(q + q, q)
            esc = body.replace("\\", "\\\\").replace(q, "\\" + q)
            out.append(Tok("str", q + esc + q))
            continue
        out.append(Tok(kind, m.group()))
    return out


# timespan literal → microseconds (for bin() over timestamps)
_TIMESPAN_US = {"ms": 1_000, "s": 1_000_000, "m": 60_000_000,
                "h": 3_600_000_000, "d": 86_400_000_000}


def _timespan_to_us(text: str) -> int:
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h|d)", text)
    if not m:
        raise ValueError(f"KQL: bad timespan {text!r}")
    return int(float(m.group(1)) * _TIMESPAN_US[m.group(2)])


def _timespan_us_to_text(us: int) -> str:
    """Kusto timespan text ``[-][d.]hh:mm:ss[.fffffff]`` for a µs
    value (the Python twin of _ExprParser._timespan_text_sql, used
    for compile-time literal folding). The 7th fractional digit is
    always '0' — the carrier is microseconds, not 100 ns ticks
    (documented deviation)."""
    sign = "-" if us < 0 else ""
    a = abs(us)
    d, rem = divmod(a, 86_400_000_000)
    h, rem = divmod(rem, 3_600_000_000)
    mi, rem = divmod(rem, 60_000_000)
    s, frac = divmod(rem, 1_000_000)
    out = f"{sign}{str(d) + '.' if d else ''}{h:02d}:{mi:02d}:{s:02d}"
    if frac:
        out += f".{frac:06d}0"
    return out


# ----------------------------------------------------------------------
# Pratt expression parser → Spark SQL text
# ----------------------------------------------------------------------

#: percentile()/percentiles() compile mode for the CURRENT query:
#: "exact" (interpolated fold, oracle-able) or "approx" (GK sketch,
#: bounded state — Kusto's own semantics). Set per-query by
#: `set percentile_mode = ...;`, saved/restored by compile().
_PERCENTILE_MODE = "exact"

#: bin_auto() bin size / anchor for the CURRENT query, as raw KQL
#: literal text (re-tokenized at the use site so timespan/datetime
#: literals keep their schema-aware bin handling). Set per-query by
#: `set query_bin_auto_size = ...;` / `set query_bin_auto_minimum =
#: ...;` (the real Kusto request properties); saved/restored by
#: compile().
_BIN_AUTO_SIZE: str | None = None
_BIN_AUTO_MIN: str | None = None

# The compiler whose compile() frame is innermost — lets the expression
# parser reach operand resolution for tabular in() subqueries. Saved
# and restored per compile() like the mode flags above.
_ACTIVE_COMPILER = None
_INQ_SEQ = [0]
# Temp views backing tabular in() subqueries, pending cleanup. Each
# compile() frame drops the views it created on exit (r12 verdict #3:
# they are consumed at ANALYSIS time — DataFrame construction is eager
# — so by the time compile() returns, the resolved plan no longer
# references the view and a long-lived session's catalog stays clean).
_INQ_VIEWS: list = []

_FN_RENAME = {
    "strlen": "length",
    "tolower": "lower",
    "toupper": "upper",
    "strcat": "concat",
    "tostring": "string",
    "abs": "abs",
    "round": "round",
    "floor": "floor",
    "ceiling": "ceil",
    "coalesce": "coalesce",
    "isnull": "isnull",
    "isnotnull": "isnotnull",
    "min_of": "least",
    "max_of": "greatest",
    # Kusto math scalars with exact same-arity Spark twins
    "log": "ln",
    "log2": "log2",
    "log10": "log10",
    "exp": "exp",
    "sqrt": "sqrt",
    "pow": "power",
    "sign": "sign",
    "sin": "sin",
    "cos": "cos",
    "tan": "tan",
    "asin": "asin",
    "acos": "acos",
    "atan": "atan",
    "atan2": "atan2",
    "cot": "cot",
    "degrees": "degrees",
    "radians": "radians",
    "pi": "pi",
    "isnan": "isnan",
}

_AGG_FNS = {"count", "countif", "sum", "avg", "min", "max", "dcount",
            "make_list", "make_set", "sumif", "avgif", "minif", "maxif",
            "dcountif", "take_any", "stdev", "variance", "hll",
            "hll_merge", "percentiles_array", "binary_all_and", "binary_all_or",
            "binary_all_xor", "make_list_if", "make_set_if",
            "make_bag", "make_bag_if", "percentilew",
            "make_list_with_nulls", "count_distinctif",
            "count_distinct"}

_CMP = {"==": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


_NUM_LIT_RE = re.compile(r"-?\s*\d+(?:\.\d+)?(?:[eE][+-]?\d+)?$")


def _unwrap_parse_json(sql: str) -> str | None:
    """If ``sql`` is exactly ``parse_json(X)`` (one call spanning the
    whole text, string-literal-aware paren balance), return ``X``;
    else None. Lets compilers that immediately re-serialize a dynamic
    (from_json(to_json(...)) lifts) skip the VARIANT round trip when
    the operand is a pack()/dynamic() render."""
    s = sql.strip()
    while s.startswith("(") and s.endswith(")"):
        inner = s[1:-1].strip()
        if _balanced_sql(inner):
            s = inner
        else:
            break
    if not s.startswith("parse_json(") or not s.endswith(")"):
        return None
    body = s[len("parse_json("):-1]
    return body if _balanced_sql(body) else None


def _balanced_sql(s: str) -> bool:
    """Paren balance over SQL text, skipping '...' string literals
    (with '' escapes); False if depth ever goes negative."""
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
        i += 1
    return depth == 0


_STRINGY_FN_RE = re.compile(
    r"\b(strcat|substring|substr|tostring|toupper|tolower|trim|trim_start"
    r"|trim_end|replace_string|extract|concat)\s*\(", re.IGNORECASE)


def _str_if_variant(e: str) -> str:
    """Cast a variant path to STRING for string-operator contexts
    (lower/contains/term-split fail analysis on raw VARIANT)."""
    return (f"CAST({e} AS STRING)"
            if e.lstrip("(").startswith("variant_get(") else e)


def _coerce_variant_cmp(lhs: str, rhs: str,
                        df: DataFrame | None = None) -> tuple[str, str]:
    """Kusto compares dynamics loosely; Spark VARIANT needs an explicit
    cast. When one comparison side is a variant path, cast it to the
    other side's type: the literal's type when the other side is a bare
    literal (double for numbers — Kusto dynamic numerics compare as
    real; string for string literals). For compound expressions the
    type is RESOLVED against the DataFrame schema (one selectExpr
    analysis probe, no execution) — surface-text sniffing miscasts a
    numeric expression that merely mentions a string function
    (``strlen(s) + 1``). The regex guess survives only as the last
    resort when no df is in scope (datatable/print literal rows) or
    the probe fails to analyze."""
    def fix(var_side: str, other: str) -> str:
        o = other.strip("() ")
        if _NUM_LIT_RE.fullmatch(o):
            return f"CAST({var_side} AS DOUBLE)"
        if o.startswith("'") and o.endswith("'"):
            return f"CAST({var_side} AS STRING)"
        if df is not None:
            try:
                t = df.selectExpr(f"({other}) AS __t") \
                      .schema[0].dataType.typeName()
            except Exception:
                t = None
            if t == "string":
                return f"CAST({var_side} AS STRING)"
            if t == "boolean":
                return f"CAST({var_side} AS BOOLEAN)"
            if t in ("timestamp", "timestamp_ntz"):
                return f"CAST({var_side} AS TIMESTAMP)"
            if t == "date":
                return f"CAST({var_side} AS DATE)"
            if t in ("double", "float", "decimal", "long", "integer",
                     "int", "short", "byte"):
                return f"CAST({var_side} AS DOUBLE)"
        if "'" in o or _STRINGY_FN_RE.search(o):
            return f"CAST({var_side} AS STRING)"
        return f"CAST({var_side} AS DOUBLE)"

    is_l = _variant_sql_text(lhs, df)
    is_r = _variant_sql_text(rhs, df)
    if is_l and is_r:
        # BOTH sides dynamic (r14 probe find — used to be an
        # AnalysisException): deep equality via canonical JSON text.
        # Documented deviations: bag key ORDER is significant, and
        # numerically-equal different spellings (2 vs 2.0) differ —
        # Kusto's loose numeric equality is not reproduced here.
        return f"to_json({lhs})", f"to_json({rhs})"
    if is_l and not is_r:
        lhs = fix(lhs, rhs)
    elif is_r and not is_l:
        rhs = fix(rhs, lhs)
    return lhs, rhs


def _variant_sql_text(s: str, df: DataFrame | None = None) -> bool:
    """Is compiled SQL ``s`` variant-typed? Textual prefixes catch the
    compiler's own dynamic renders (variant_get paths, parse_json
    literals); a bare column name resolves python-side against the
    frame's cached schema (no JVM round-trip)."""
    t = s.lstrip("( ")
    if t.startswith(("variant_get(", "parse_json(",
                     "try_parse_json(")):
        return True
    m = re.fullmatch(r"\s*\(*\s*(?:`([^`]+)`|([A-Za-z_]\w*))"
                     r"\s*\)*\s*", s)
    if m and df is not None:
        nm = m.group(1) or m.group(2)
        try:
            for f_ in df.schema.fields:
                if f_.name == nm:
                    return f_.dataType.typeName() == "variant"
        except Exception:
            pass
    return False


class _ExprParser:
    """Pratt parser over the token list; emits a Spark SQL string."""

    def __init__(self, toks: list[Tok],
                 df: DataFrame | None = None):
        self.toks = toks
        self.i = 0
        # schema context for type-resolved variant coercion; None in
        # pure-text contexts (datatable/print cells)
        self.df = df

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ValueError("KQL: unexpected end of expression")
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        t = self.next()
        if t.text != text:
            raise ValueError(f"KQL: expected {text!r}, got {t.text!r}")

    # precedence climbing ------------------------------------------------
    def parse(self, min_bp: int = 0) -> str:
        lhs = self._prefix()
        while True:
            t = self.peek()
            if t is None:
                return lhs
            bp = self._infix_bp(t)
            if bp is None or bp < min_bp:
                return lhs
            lhs = self._infix(lhs, self.next(), bp)

    def _infix_bp(self, t: Tok) -> int | None:
        text = t.text.lower()
        if text in ("or",):
            return 1
        if text in ("and",):
            return 2
        if t.text in _CMP or text in (
                "in", "!in", "in~", "!in~", "=~", "!~", "contains",
                "contains_cs", "!contains", "!contains_cs",
                "startswith", "startswith_cs", "!startswith",
                "!startswith_cs", "endswith", "endswith_cs",
                "!endswith", "!endswith_cs", "has", "has_cs", "!has",
                "!has_cs", "has_any", "has_all", "between", "matches",
                "hasprefix", "hasprefix_cs", "!hasprefix",
                "!hasprefix_cs", "hassuffix", "hassuffix_cs",
                "!hassuffix", "!hassuffix_cs", "!between"):
            return 3
        if t.text in ("+", "-"):
            return 4
        if t.text in ("*", "/", "%"):
            return 5
        if t.text == "[":
            return 7  # postfix indexer binds tightest
        if t.text == ".":
            # postfix member access on a rendered expression
            # (arr[0].prop, todynamic(s).key — r14 probe find); binds
            # only when an identifier follows, so `between (1 .. 5)`'s
            # bare dots still reach their expect('.') consumers
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) \
                else None
            return 7 if nxt is not None and nxt.kind == "ident" \
                else None
        return None

    def _prefix(self) -> str:
        t = self.next()
        text = t.text
        low = text.lower()
        if low == "not":
            return f"(NOT {self.parse(3)})"
        if text == "-":
            return f"(- {self.parse(6)})"
        if text == "+":
            # unary plus (Kusto accepts it, e.g. real(+inf))
            return self.parse(6)
        if text == "(":
            inner = self.parse(0)
            self.expect(")")
            return f"({inner})"
        if t.kind == "num":
            return text
        if t.kind == "dt":
            # datetime(...) literal -> TIMESTAMP literal (one token, so
            # interior spaces/colons survive tokenization)
            inner = re.match(r"datetime\s*\((.*)\)$", text,
                             re.DOTALL).group(1).strip().strip("'\"")
            if inner.lower() == "null":
                # Kusto typed null: datetime(null)
                return "CAST(NULL AS TIMESTAMP)"
            return f"TIMESTAMP '{inner}'"
        if t.kind == "timespan":
            return str(_timespan_to_us(text))
        if t.kind == "str":
            body = text[1:-1]
            return "'" + body.replace("\\'", "'").replace("'", "''") + "'"
        if t.kind == "ident":
            nxt = self.peek()
            if low == "dynamic" and nxt is not None and nxt.text == "(":
                return self._dynamic_literal()
            if nxt is not None and nxt.text == "(":
                return self._call(low)
            if low in ("true", "false", "null"):
                return low.upper()
            if text.startswith("$"):
                # $left.x / $right.x join-key references keep the prefix;
                # the join compiler strips it.
                return text
            return f"`{text}`" if "." not in text else text
        raise ValueError(f"KQL: unexpected token {text!r}")

    def _call(self, fname: str) -> str:
        self.expect("(")
        # tostring(<timespan literal>) folds to the Kusto timespan
        # text at compile time — the literal's token kind is the only
        # place its timespan-ness is still visible (compiled it is a
        # bare µs integer, indistinguishable from a number)
        if (fname == "tostring" and self.peek() is not None
                and self.peek().kind == "timespan"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1].text == ")"):
            us = _timespan_to_us(self.next().text)
            self.expect(")")
            txt = _timespan_us_to_text(us)
            return "'" + txt + "'"
        args: list[str] = []
        if self.peek() is not None and self.peek().text != ")":
            # special-case: count(*) and count()
            while True:
                if self.peek() is None:
                    # truncated input like `f(0,` — a comma promised
                    # another argument that never arrived
                    raise ValueError(
                        f"KQL: unterminated argument list in "
                        f"{fname}(...)")
                if self.peek().text == "*":
                    self.next()
                    args.append("*")
                else:
                    args.append(self.parse(0))
                if self.peek() is not None and self.peek().text == ",":
                    self.next()
                    continue
                break
        self.expect(")")
        return self._render_call(fname, args)

    @staticmethod
    def _timespan_sql(s: str) -> bool:
        """Heuristic: does compiled SQL text ``s`` denote this
        engine's µs-BIGINT timespan carrier? Timespans ride plain
        BIGINT, so the type system cannot answer; instead this
        recognizes the compiler's own timespan-producing renders,
        ANCHORED so arithmetic-wrapped forms (``dayofweek(x) / 1d``
        is a number) stay numeric: the ts-ts difference, totimespan,
        make_timespan, and bare dayofweek. A timespan that crossed a
        column boundary (extend alias, summarize output) is not
        recognizable — documented carrier limitation; tostring then
        renders the µs integer."""
        t = s.strip()
        return bool(
            re.fullmatch(r"\(unix_micros\(.*\) - unix_micros\(.*\)\)",
                         t, re.DOTALL)
            or (t.startswith("(CASE WHEN ltrim('-',")
                and "* 86400000000 +" in t)            # totimespan
            or (t.startswith("(((CAST(")
                and "* 60000000 + CAST(CAST(" in t
                and t.endswith("* 1000000 AS BIGINT))"))  # make_timespan
            or bool(re.fullmatch(
                r"\(CAST\(dayofweek\(.*\) - 1 AS BIGINT\) "
                r"\* 86400000000\)", t, re.DOTALL)))

    @staticmethod
    def _timespan_text_sql(t: str) -> str:
        """Kusto timespan text ``[-][d.]hh:mm:ss[.fffffff]`` from the
        µs BIGINT carrier (r13 verdict #3: tostring(timespan) used to
        leak the raw µs integer). The days part appears only when
        |t| >= 1d; the fractional part only when nonzero, always 7
        digits — the 7th (100 ns) digit is always '0' because the
        carrier is microseconds (documented deviation, probe-pinned).
        The operand is bound ONCE via the transform hop (the r13
        OOM lesson for spliced sub-expressions); BIGINT min (which
        ANSI abs() rejects) renders null via nullif."""
        v = "__tst_v"
        a = f"abs({v})"
        body = (
            f"concat("
            f"CASE WHEN {v} < 0 THEN '-' ELSE '' END, "
            f"CASE WHEN {a} >= 86400000000 THEN "
            f"concat(CAST({a} div 86400000000 AS STRING), '.') "
            f"ELSE '' END, "
            f"lpad(CAST(({a} div 3600000000) % 24 AS STRING), 2, '0'),"
            f" ':', "
            f"lpad(CAST(({a} div 60000000) % 60 AS STRING), 2, '0'),"
            f" ':', "
            f"lpad(CAST(({a} div 1000000) % 60 AS STRING), 2, '0'), "
            f"CASE WHEN {a} % 1000000 > 0 THEN "
            f"concat('.', lpad(CAST({a} % 1000000 AS STRING), 6, "
            f"'0'), '0') ELSE '' END)")
        return (f"element_at(transform(array(nullif(CAST({t} AS "
                f"BIGINT), -9223372036854775808)), {v} -> {body}), 1)")

    @staticmethod
    def _regex_literal_group_count(sql: str) -> int | None:
        """Capture-group count of a regex passed as a SQL STRING
        LITERAL, or None when the operand is not a literal (the count
        is then unknowable at compile time). Counts plain ``(...)``
        and named ``(?<name>...)`` groups; skips non-capturing /
        lookaround constructs, escaped parens, and parens inside
        character classes."""
        m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", sql, re.DOTALL)
        if not m:
            return None
        raw = m.group(1).replace("''", "'")
        # The operand is SQL literal TEXT: Spark's string parser
        # consumes backslash escapes, so the regex `\(` arrives here
        # as the two characters `\\(` and scanning the escaped text
        # directly would count the trailing `(` as a capture group
        # (r13 advice). Decode the SQL escapes first (`\x` -> x, with
        # the n/t/r control forms) to recover the actual regex text.
        buf, i = [], 0
        while i < len(raw):
            c = raw[i]
            if c == "\\" and i + 1 < len(raw):
                nxt = raw[i + 1]
                buf.append({"n": "\n", "t": "\t",
                            "r": "\r"}.get(nxt, nxt))
                i += 2
                continue
            buf.append(c)
            i += 1
        pat = "".join(buf)
        n, i, in_class = 0, 0, False
        while i < len(pat):
            c = pat[i]
            if c == "\\":
                i += 2
                continue
            if in_class:
                if c == "]":
                    in_class = False
            elif c == "[":
                in_class = True
            elif c == "(":
                if pat[i + 1:i + 2] != "?":
                    n += 1
                elif (pat[i + 2:i + 3] == "<"
                        and pat[i + 3:i + 4] not in ("=", "!")):
                    n += 1  # named group — Java numbers these too
            i += 1
        return n

    @staticmethod
    def _acf_sql(arr: str) -> str:
        """Biased mean-centered autocorrelation at lag ``__spd_p``
        (free variable — splice inside a transform/filter lambda over
        candidate lags): acf(p) = sum((x_i - mu)(x_{i+p} - mu)) /
        sum((x_i - mu)^2), acf(0) = 1, null when fewer than 2
        overlapping points or zero variance. Shared by
        series_periods_detect (peak search) and
        series_periods_validate (caller-supplied periods)."""
        xs = f"transform({arr}, __spd_x -> CAST(__spd_x AS DOUBLE))"
        n = f"size({xs})"
        mu = (f"(aggregate({xs}, CAST(0 AS DOUBLE), "
              f"(__spd_a, __spd_v) -> __spd_a + __spd_v) / {n})")
        den = (f"aggregate({xs}, CAST(0 AS DOUBLE), "
               f"(__spd_a, __spd_v) -> __spd_a + "
               f"(__spd_v - {mu}) * (__spd_v - {mu}))")
        return (f"CASE WHEN __spd_p = 0 THEN CAST(1 AS DOUBLE) "
                f"WHEN {n} - __spd_p >= 2 AND {den} > 0 THEN "
                f"aggregate(zip_with("
                f"slice({xs}, 1, greatest({n} - __spd_p, 0)), "
                f"slice({xs}, __spd_p + 1, "
                f"greatest({n} - __spd_p, 0)), "
                f"(__spd_u, __spd_w) -> "
                f"(__spd_u - {mu}) * (__spd_w - {mu})), "
                f"CAST(0 AS DOUBLE), "
                f"(__spd_a, __spd_v) -> __spd_a + __spd_v) / {den} "
                f"ELSE NULL END")

    _TYPED_NULL = {"long": "BIGINT", "int": "INT", "real": "DOUBLE",
                   "double": "DOUBLE", "bool": "BOOLEAN",
                   "string": "STRING", "decimal": "DECIMAL(38,18)",
                   "timespan": "BIGINT", "guid": "STRING"}

    def _tabular_in(self, lhs: str, low: str) -> str | None:
        """Kusto's tabular membership: ``col in (T)`` / ``col in ((T |
        where ...))`` — the right side is a TABLE EXPRESSION whose
        FIRST column is the value set (r12 probe find). Compiles to a
        Spark IN-subquery over a temp view, which Catalyst rewrites to
        a (broadcast-able) left-semi join — scale-safe with no 1M-value
        cap, unlike real Kusto. Called with the cursor just past the
        opening '('; consumes through the matching ')' ONLY when the
        span is tabular-shaped, else restores and returns None (the
        scalar list path parses it). Detection: no top-level comma, and
        the span either contains a '|' (pipelines only — KQL has no
        bitwise-or operator token) or is a single identifier that is
        not a column of the current frame but resolves as a table/let
        operand."""
        comp = _ACTIVE_COMPILER
        if comp is None:
            return None
        j, depth, top_comma, has_pipe = self.i, 0, False, False
        while j < len(self.toks):
            t = self.toks[j].text
            if t in ("(", "[", "{"):
                depth += 1
            elif t in (")", "]", "}"):
                if depth == 0:
                    break
                depth -= 1
            elif t == "," and depth == 0:
                top_comma = True
            elif t == "|":
                has_pipe = True
            j += 1
        if j >= len(self.toks) or top_comma:
            return None
        span = self.toks[self.i:j]
        single_ident = (len(span) == 1 and span[0].kind == "ident"
                        and not span[0].text.startswith("$"))
        if single_ident and self.df is not None \
                and span[0].text in self.df.columns:
            return None
        if not (has_pipe or single_ident
                or (span and span[0].text == "(")):
            return None
        text = " ".join(t.text for t in span)
        try:
            sub = comp._operand(text)
        except Exception:
            if not has_pipe:
                return None  # not tabular — scalar path retries
            try:
                # compound pipelines like (A) | union (B) are not
                # single operands; the full compiler handles them
                sub = comp.compile(text)
            except Exception:
                return None
        self.i = j
        self.expect(")")
        col = sub.columns[0]
        _INQ_SEQ[0] += 1
        view = f"__kql_inq_{_INQ_SEQ[0]}"
        # nulls never match membership in Kusto; under SQL three-valued
        # logic a single NULL in the set turns NOT IN into an empty
        # result (r12 review) — drop them from the value set
        sub.select(F.col(col).alias("__v")) \
           .where(F.col(col).isNotNull()) \
           .createOrReplaceTempView(view)
        _INQ_VIEWS.append((view, sub.sparkSession))
        neg = "NOT " if low.startswith("!") else ""
        if low.endswith("~"):
            return (f"(lower({_str_if_variant(lhs)}) {neg}IN "
                    f"(SELECT lower(__v) FROM {view}))")
        return f"({lhs} {neg}IN (SELECT __v FROM {view}))"

    def _probe_dtype(self, sql: str):
        """Compile-time operand type, or None when unresolvable.
        Bare column references resolve PYTHON-SIDE from the frame's
        cached schema (zero JVM round-trips — the common case for
        series ops over named columns); only composite expressions pay
        a selectExpr analysis. In df-less contexts (print bodies) a
        dummy one-row relation resolves literals."""
        probe = self.df
        if probe is None:
            s = SparkSession.getActiveSession()
            probe = s.range(1) if s is not None else None
        if probe is None:
            return None
        m = re.fullmatch(r"\s*(?:`([^`]+)`|([A-Za-z_]\w*))\s*", sql)
        if m:
            nm = m.group(1) or m.group(2)
            try:
                for f_ in probe.schema.fields:
                    if f_.name == nm:
                        return f_.dataType
            except Exception:
                pass
            return None
        try:
            return probe.selectExpr(sql).schema[0].dataType
        except Exception:
            return None

    def _lift_arr(self, sql: str, elem: str) -> str:
        """Array-operand coercion for the series/array families (r12,
        generalizing the r10 JSON-lift pattern): a NATIVE array operand
        passes through untouched (no per-row JSON round-trip on the
        make-series hot path — the compile-time schema probe below is
        what keeps this free), while a dynamic (VARIANT) operand — the
        type every parse_json/todynamic/dynamic() column carries —
        lifts through from_json(to_json(x)) in PERMISSIVE mode instead
        of failing analysis with DATATYPE_MISMATCH. ``elem`` picks the
        element carrier: 'double' for numeric series math (Kusto
        series semantics), 'variant' for order-free structural ops
        where element types must survive. Sorting/set ops stay on the
        documented typed-cast-first contract (VARIANT defines neither
        ordering nor equality)."""
        if isinstance(self._probe_dtype(sql), T.ArrayType):
            return sql
        # unresolvable (lambda vars, later-stage columns) or non-array:
        # the unconditional lift is analysis-valid for every operand
        return (f"from_json(to_json({sql}), 'array<{elem}>', "
                f"map('mode', 'PERMISSIVE'))")

    def _series_arg(self, sql: str) -> str:
        return self._lift_arr(sql, "double")

    def _dyn_arr_arg(self, sql: str) -> str:
        return self._lift_arr(sql, "variant")

    def _decompose_period_sql(self, arr: str, per: str,
                              thr: str) -> str:
        """Resolve a decompose-family period argument: -1 (Kusto's
        default auto-detect) becomes the top ACF peak from the
        series_periods_detect machinery, accepted only when its score
        clears the seasonality threshold (else 0 = no seasonal
        component). Literal -1 is recognized textually; any other
        expression passes through as scalar SQL."""
        if not re.fullmatch(r"[\s()]*-\s*1(?:\.0)?[\s()]*", per):
            return per
        a = self._series_arg(arr)
        bag = self._render_call(
            "series_periods_detect_dynamic",
            [arr, "2", f"CAST(size({a}) / 2 AS INT)", "1"])
        p0 = f"try_cast(variant_get({bag}, '$.periods[0]') AS DOUBLE)"
        s0 = f"try_cast(variant_get({bag}, '$.scores[0]') AS DOUBLE)"
        return (f"(CASE WHEN {s0} >= CAST({thr} AS DOUBLE) "
                f"THEN CAST({p0} AS INT) ELSE 0 END)")

    def _decompose_seasonal_sql(self, arr: str, per: str) -> str:
        """Seasonal component with a runtime-guarded period: period
        <= 0 (explicit 0 or a rejected auto-detect) yields an all-zero
        seasonal array instead of series_seasonal's pmod-by-zero."""
        a = self._series_arg(arr)
        seas = self._render_call("series_seasonal", [arr, per])
        return (f"(CASE WHEN ({per}) <= 0 THEN transform({a}, "
                f"__dz_v -> CAST(0 AS DOUBLE)) ELSE {seas} END)")

    def _decompose_trend_sql(self, arr: str, per: str,
                             mode: str | None) -> str:
        """Trend component for the decompose family. mode None keeps
        the engine's documented default (trailing FIR of the period
        width; overall mean when the period is <= 0); the Kusto
        literals 'avg' / 'linefit' / 'none' select the overall mean,
        the least-squares line, or zeros."""
        a = self._series_arg(arr)
        if mode is not None:
            m = re.fullmatch(r"\s*'((?:[^'\\]|\\.)*)'\s*", mode)
            if not m or m.group(1) not in ("avg", "linefit", "none"):
                raise ValueError(
                    "KQL: decompose trend must be the literal 'avg', "
                    "'linefit' or 'none'")
            kind = m.group(1)
        else:
            kind = None
        nn = (f"filter(transform({a}, __dt_x -> "
              f"CAST(__dt_x AS DOUBLE)), __dt_x -> "
              f"__dt_x IS NOT NULL)")
        mean = (f"(CASE WHEN size({nn}) = 0 THEN NULL ELSE "
                f"aggregate({nn}, CAST(0 AS DOUBLE), "
                f"(__dt_s, __dt_v) -> __dt_s + __dt_v) "
                f"/ size({nn}) END)")
        avg_arr = f"transform({a}, __dt_v -> {mean})"
        if kind == "avg":
            return avg_arr
        if kind == "none":
            return f"transform({a}, __dt_v -> CAST(0 AS DOUBLE))"
        if kind == "linefit":
            fit = self._render_call("series_fit_line_dynamic", [arr])
            return self._series_arg(
                f"variant_get({fit}, '$.line_fit')")
        fir = self._render_call("series_fir", [arr, f"({per})"])
        return f"(CASE WHEN ({per}) <= 0 THEN {avg_arr} ELSE {fir} END)"

    def _render_call(self, fname: str, args: list[str]) -> str:
        if fname in self._TYPED_NULL and len(args) == 1 \
                and args[0].strip().upper() == "NULL":
            # Kusto typed null literals: long(null), real(null), ...
            # (datetime(null) lexes as one datetime token upstream)
            return f"CAST(NULL AS {self._TYPED_NULL[fname]})"
        if fname == "real" and len(args) == 1:
            # Kusto non-finite real literals: real(+inf) / real(-inf) /
            # real(nan) (r13 probe sweep). The operand reaches here as
            # compiled SQL — a bare `inf`/`nan` identifier or a unary
            # minus around it.
            m = re.fullmatch(r"\s*\(?\s*(-)?\s*`?(inf|nan)`?\s*\)?\s*",
                             args[0], re.IGNORECASE)
            if m:
                if m.group(2).lower() == "nan":
                    return "CAST('NaN' AS DOUBLE)"
                return (f"CAST('{'-' if m.group(1) else ''}Infinity' "
                        f"AS DOUBLE)")
        if fname == "bin":
            # bin() is intercepted token-level (schema-aware timespan
            # handling) before parsing ever reaches here.
            raise ValueError("KQL: bin(expr, literal_size) expected")
        if fname in ("iff", "iif"):
            if len(args) != 3:
                raise ValueError("KQL: iff(cond, a, b) takes 3 args")
            return f"(CASE WHEN {args[0]} THEN {args[1]} ELSE {args[2]} END)"
        if fname == "substring":
            if len(args) not in (2, 3):
                raise ValueError("KQL: substring(s, start[, len])")
            s, start = args[0], args[1]
            if len(args) == 3:
                return f"substr({s}, ({start}) + 1, {args[2]})"
            return f"substr({s}, ({start}) + 1)"
        if fname in ("toint", "tolong"):
            # Kusto to*() conversions return NULL on unconvertible
            # input; plain CAST under Spark ANSI mode would error.
            # STRING operands also accept hex text ('0xff' -> 255,
            # Kusto contract — r12 probe find); the extended form is
            # type-probed in so numeric hot paths (every portable-
            # rounded aggregate rides tolong) keep the bare try_cast.
            sqlt = "INT" if fname == "toint" else "BIGINT"
            x = args[0]
            plain = f"try_cast({x} AS {sqlt})"
            xs = x.strip()
            if xs.startswith("'"):
                is_str = True  # string literal, no probe needed
            elif re.fullmatch(r"[+-]?[0-9][0-9.eE+-]*", xs):
                is_str = False  # numeric literal (a column named 'e'
                # must NOT match — r12 review)
            else:
                is_str = isinstance(self._probe_dtype(x), T.StringType)
            if not is_str:
                return plain
            # conv to base -10 = SIGNED two's-complement, matching the
            # hex-literal lexer's wrap (r12 review: the unsigned form
            # gave -1 as a literal but null as a string conversion)
            return (f"coalesce({plain}, CASE WHEN {x} RLIKE "
                    f"'^0[xX][0-9a-fA-F]{{1,16}}$' THEN "
                    f"try_cast(conv(substring({x}, 3), 16, -10) "
                    f"AS {sqlt}) END)")
        if fname == "todouble":
            return f"try_cast({args[0]} AS DOUBLE)"
        if fname == "tostring":
            # Kusto tostring over a TIMESPAN renders the
            # [-][d.]hh:mm:ss[.fffffff] text (r13 verdict #3) — the
            # carrier is BIGINT so the check is the compiler's own
            # timespan-render recognizer, not a type probe.
            if self._timespan_sql(args[0]):
                return self._timespan_text_sql(args[0])
            # Kusto tostring over a dynamic renders JSON. VARIANT's
            # string cast already does; a NATIVE array/map/struct
            # operand (parse_csv, split, pack_array pipelines) must
            # route through to_json or Spark's display rendering leaks
            # ('[a, b,c, d]' — r12 probe find). Compile-time type
            # probe; unresolvable operands keep the plain cast.
            if isinstance(self._probe_dtype(args[0]),
                          (T.ArrayType, T.MapType, T.StructType)):
                return f"to_json({args[0]})"
            return f"CAST({args[0]} AS STRING)"
        if fname == "count":
            return "count(*)" if not args or args == ["*"] else \
                f"count({args[0]})"
        if fname == "countif":
            return f"sum(CASE WHEN {args[0]} THEN 1 ELSE 0 END)"
        if fname == "dcount":
            # dcount(x[, accuracy]): exact distinct (documented
            # deviation — Kusto estimates); the accuracy knob is
            # accepted and ignored, since exact dominates any accuracy
            # level
            if len(args) not in (1, 2):
                raise ValueError("KQL: dcount(x[, accuracy])")
            return f"count(DISTINCT {args[0]})"
        if fname == "percentiles_array":
            # percentiles_array(col, p1, p2, ...) -> array of exact
            # interpolated percentiles (0-100 scale, like percentile())
            if len(args) < 2:
                raise ValueError(
                    "KQL: percentiles_array(col, p1[, p2, ...])")
            ps = ", ".join(f"CAST(({p}) / 100.0 AS DOUBLE)"
                           for p in args[1:])
            return f"percentile({args[0]}, array({ps}))"
        if fname in ("pack", "bag_pack", "pack_dictionary"):
            # pack('k1', v1, 'k2', v2, ...) -> dynamic property bag on
            # VARIANT (JSON round-trip through named_struct); keys must
            # be string literals, like Kusto's common usage
            if len(args) < 2 or len(args) % 2:
                raise ValueError(f"KQL: {fname}('k1', v1, ...) needs "
                                 f"key/value pairs")
            for k in args[::2]:
                if not k.startswith("'"):
                    raise ValueError(
                        f"KQL: {fname} keys must be string literals")
            pairs = ", ".join(f"{k}, {v}"
                              for k, v in zip(args[::2], args[1::2]))
            return f"parse_json(to_json(named_struct({pairs})))"
        if fname == "bag_pack_columns":
            # bag_pack_columns(c1, c2, ...) -> bag keyed by the COLUMN
            # NAMES. Arguments must be bare column references (that is
            # the Kusto contract too); a compiled column is exactly a
            # backticked identifier, so the key is recoverable here
            # without a token-level intercept. Nulls are kept, like
            # pack_all's default.
            if not args:
                raise ValueError("KQL: bag_pack_columns(col1, ...)")
            keys = []
            for a in args:
                m = re.fullmatch(r"`([^`]+)`", a)
                if not m:
                    raise ValueError(
                        "KQL: bag_pack_columns arguments must be "
                        "column references, got " + a)
                keys.append(m.group(1).replace("'", "''"))
            pairs = ", ".join(f"'{k}', {a}"
                              for k, a in zip(keys, args))
            return (f"parse_json(to_json(named_struct({pairs}), "
                    f"map('ignoreNullFields', 'false')))")
        if fname in ("exp2", "exp10"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(x)")
            base = "2" if fname == "exp2" else "10"
            return f"power({base}, {args[0]})"
        if fname in ("array_sum", "array_avg"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(arr)")
            # dynamic arrays ride VARIANT: one typed cast covers both
            # native arrays and parse_json output. Kusto IGNORES
            # null/non-numeric elements (try_cast turns them into null
            # slots), so fold over the non-null filter — one poisoned
            # element must not null the whole result — and array_avg
            # divides by the count of elements actually summed.
            arr = (f"filter(try_cast({args[0]} AS ARRAY<DOUBLE>), "
                   f"__as_e -> __as_e IS NOT NULL)")
            total = (f"aggregate({arr}, CAST(0.0 AS DOUBLE), "
                     f"(__as_a, __as_x) -> __as_a + __as_x)")
            if fname == "array_sum":
                return total
            return (f"(CASE WHEN size({arr}) > 0 THEN {total} "
                    f"/ size({arr}) END)")
        if fname == "array_index_of":
            # array_index_of(arr, value [, start [, length
            # [, occurrence]]]): 0-based index in the ORIGINAL array,
            # -1 when missing; negative start counts from the end,
            # length -1 = unbounded, occurrence is 1-based. Elements
            # match numerically when both sides parse as doubles
            # (exact), else by stringified equality.
            if not 2 <= len(args) <= 5:
                raise ValueError(
                    "KQL: array_index_of(arr, value [, start "
                    "[, length [, occurrence]]])")
            a = f"from_json(to_json({args[0]}), 'array<variant>')"
            v = args[1]
            start = args[2] if len(args) >= 3 else "0"
            length = args[3] if len(args) >= 4 else "-1"
            occ = args[4] if len(args) == 5 else "1"
            n = f"size({a})"
            s = (f"IF(CAST({start} AS INT) < 0, "
                 f"{n} + CAST({start} AS INT), CAST({start} AS INT))")
            hi = (f"IF(CAST({length} AS INT) < 0, {n} - 1, "
                  f"{s} + CAST({length} AS INT) - 1)")
            e = f"try_element_at({a}, __aio_i + 1)"
            match = (f"(coalesce(try_cast({e} AS DOUBLE) = "
                     f"try_cast({v} AS DOUBLE), false) "
                     f"OR coalesce(CAST({e} AS STRING) = "
                     f"CAST({v} AS STRING), false))")
            idxs = (f"filter(transform(sequence(0, {n} - 1), "
                    f"__aio_i -> IF(__aio_i >= {s} "
                    f"AND __aio_i <= {hi} AND {match}, "
                    f"__aio_i, -1)), __aio_x -> __aio_x >= 0)")
            return (f"CAST(coalesce(try_element_at({idxs}, "
                    f"CAST({occ} AS INT)), -1) AS BIGINT)")
        if fname == "base64_encode_tostring":
            if len(args) != 1:
                raise ValueError("KQL: base64_encode_tostring(s)")
            return f"base64(encode({args[0]}, 'UTF-8'))"
        if fname == "base64_decode_tostring":
            if len(args) != 1:
                raise ValueError("KQL: base64_decode_tostring(s)")
            return f"decode(unbase64({args[0]}), 'UTF-8')"
        if fname == "base64_decode_toarray":
            # base64 text -> dynamic array of byte values (same byte
            # rendering as the converter's binary sink,
            # functions/conversion.bytes_to_int_array)
            if len(args) != 1:
                raise ValueError("KQL: base64_decode_toarray(s)")
            b = f"unbase64({args[0]})"
            arr = (f"transform(sequence(1, length({b})), __bd_i -> "
                   f"CAST(conv(substring(hex({b}), "
                   f"(__bd_i - 1) * 2 + 1, 2), 16, 10) AS INT))")
            return (f"parse_json(to_json(CASE "
                    f"WHEN {b} IS NULL THEN NULL "
                    f"WHEN length({b}) = 0 THEN array() "
                    f"ELSE {arr} END))")
        if fname in ("zlib_compress_to_base64_string",
                     "zlib_decompress_from_base64_string",
                     "gzip_compress_to_base64_string",
                     "gzip_decompress_from_base64_string",
                     "punycode_from_string", "punycode_to_string",
                     "punycode_domain_from_string",
                     "punycode_domain_to_string"):
            # Kusto codec scalars; Arrow-batched stdlib kernels (see
            # _register_codec_udfs). Decoders return "" on bad input,
            # per the Kusto docs.
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(string)")
            udf = {
                "zlib_compress_to_base64_string": "__kql_zlib_c",
                "zlib_decompress_from_base64_string": "__kql_zlib_d",
                "gzip_compress_to_base64_string": "__kql_gzip_c",
                "gzip_decompress_from_base64_string": "__kql_gzip_d",
                "punycode_from_string": "__kql_puny_e",
                "punycode_to_string": "__kql_puny_d",
                "punycode_domain_from_string": "__kql_idna_e",
                "punycode_domain_to_string": "__kql_idna_d",
            }[fname]
            return f"{udf}({args[0]})"
        if fname in ("parse_ipv6", "parse_ipv6_mask", "ipv6_compare",
                     "ipv6_is_match", "ipv6_is_in_range",
                     "ipv6_is_in_any_range", "has_ipv6",
                     "has_any_ipv6"):
            return self._ipv6_fn(fname, args)
        if fname in ("gamma", "loggamma", "erf", "erfc"):
            # Kusto special functions; libm kernels (see
            # _register_math_udfs), domain errors -> null
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(x)")
            udf = {"gamma": "__kql_gamma", "loggamma": "__kql_lgamma",
                   "erf": "__kql_erf", "erfc": "__kql_erfc"}[fname]
            return f"{udf}(CAST({args[0]} AS DOUBLE))"
        if fname in ("beta_cdf", "beta_pdf", "beta_inv"):
            if len(args) != 3:
                raise ValueError(f"KQL: {fname}(x, alpha, beta)")
            udf = {"beta_cdf": "__kql_beta_cdf",
                   "beta_pdf": "__kql_beta_pdf",
                   "beta_inv": "__kql_beta_inv"}[fname]
            a = ", ".join(f"CAST({x} AS DOUBLE)" for x in args)
            return f"{udf}({a})"
        if fname == "welch_test":
            # welch_test(mean1, var1, count1, mean2, var2, count2) ->
            # two-sided p-value from per-sample moments
            if len(args) != 6:
                raise ValueError(
                    "KQL: welch_test(mean1, variance1, count1, "
                    "mean2, variance2, count2)")
            a = ", ".join(f"CAST({x} AS DOUBLE)" for x in args)
            return f"__kql_welch({a})"
        if fname in ("percentile_tdigest", "percentrank_tdigest",
                     "rank_tdigest", "percentile_array_tdigest"):
            # scalars over the grid quantile sketch built by
            # `evaluate tdigest(...)` (struct<scale, bs:array<(b,w)>>;
            # see _tdigest for why a grid, not centroids). Pure
            # higher-order SQL over the BOUNDED bucket array — stays
            # JVM-side; totals bind ONCE via the named_struct/transform
            # trick (an aggregate inlined into a lambda body would
            # re-fold per element).
            if fname != "percentile_array_tdigest" and len(args) != 2:
                raise ValueError(f"KQL: {fname}(tdigest, arg)")
            td, a = args[0], args[1]
            tot = (f"aggregate({td}.bs, 0L, "
                   f"(__tda, __tdx) -> __tda + __tdx.w)")

            def perc(a):
                cross = (
                    f"aggregate({td}.bs, "
                    f"named_struct('c', 0L, 'r', "
                    f"CAST(NULL AS BIGINT)), "
                    f"(__tda, __tdx) -> named_struct("
                    f"'c', __tda.c + __tdx.w, "
                    f"'r', CASE WHEN __tda.r IS NULL AND "
                    f"(__tda.c + __tdx.w) * 100.0e0 >= "
                    f"({a}) * __tds.t THEN __tdx.b "
                    f"ELSE __tda.r END), "
                    f"__tda -> __tda.r)")
                return (f"element_at(transform(array(named_struct("
                        f"'t', {tot})), __tds -> "
                        f"CAST({cross} AS DOUBLE) * {td}.scale), 1)")
            if fname == "percentile_tdigest":
                return perc(a)
            if fname == "percentile_array_tdigest":
                # percentile_array_tdigest(td, p1, p2, ...) or
                # (td, dynamic([...])) -> dynamic array; one crossing
                # fold per requested percentile over the bounded
                # bucket array (the outer lambda var only carries the
                # percentile, so the inner fold vars don't shadow)
                if len(args) < 2:
                    raise ValueError(
                        "KQL: percentile_array_tdigest(td, p...)")
                if len(args) == 2 and ("parse_json" in args[1]
                                       or args[1].lstrip("(")
                                       .startswith("array(")):
                    parr = (f"from_json(to_json({args[1]}), "
                            f"'array<double>')")
                else:
                    parr = ("array(" + ", ".join(
                        f"CAST({x} AS DOUBLE)" for x in args[1:])
                        + ")")
                return (f"parse_json(to_json(transform({parr}, "
                        f"__pat_p -> {perc('__pat_p')})))")
            below = (f"aggregate(filter({td}.bs, __tdx -> __tdx.b <= "
                     f"FLOOR(({a}) / {td}.scale + 0.5e0)), 0L, "
                     f"(__tda, __tdx) -> __tda + __tdx.w)")
            if fname == "rank_tdigest":
                # rank of `a` = sketched values <= a (1..n when present)
                return below
            return (f"element_at(transform(array(named_struct("
                    f"'t', {tot}, 'c', {below})), __tds -> "
                    f"__tds.c * 100.0e0 / __tds.t), 1)")
        if fname == "make_datetime":
            # make_datetime(y, m, d [, h, mi, s]) — fractional seconds
            # allowed, like Kusto
            if len(args) not in (3, 6):
                raise ValueError(
                    "KQL: make_datetime(y, m, d [, h, mi, s])")
            y, mo, d = args[:3]
            h, mi, s = (args[3:] if len(args) == 6
                        else ("0", "0", "0"))
            return (f"make_timestamp(CAST({y} AS INT), "
                    f"CAST({mo} AS INT), CAST({d} AS INT), "
                    f"CAST({h} AS INT), CAST({mi} AS INT), "
                    f"CAST({s} AS DECIMAL(16, 6)))")
        if fname == "make_timespan":
            # make_timespan([d,] h, m, s) -> microseconds (this
            # compiler's timespan carrier); s may be fractional
            if len(args) not in (3, 4):
                raise ValueError("KQL: make_timespan([d,] h, m, s)")
            d = args[0] if len(args) == 4 else "0"
            h, mi, s = args[-3:]
            return (f"(((CAST({d} AS BIGINT) * 24 "
                    f"+ CAST({h} AS BIGINT)) * 60 "
                    f"+ CAST({mi} AS BIGINT)) * 60000000 "
                    f"+ CAST(CAST({s} AS DOUBLE) * 1000000 AS BIGINT))")
        if fname in ("unixtime_seconds_todatetime",
                     "unixtime_milliseconds_todatetime",
                     "unixtime_microseconds_todatetime",
                     "unixtime_nanoseconds_todatetime"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(value)")
            x = f"CAST({args[0]} AS DOUBLE)"
            scale = {"unixtime_seconds_todatetime": 1_000_000,
                     "unixtime_milliseconds_todatetime": 1_000,
                     "unixtime_microseconds_todatetime": 1,
                     }.get(fname)
            if scale is None:  # nanoseconds: integer div, no overflow
                return (f"timestamp_micros(CAST({args[0]} AS BIGINT) "
                        f"div 1000)")
            return f"timestamp_micros(CAST({x} * {scale} AS BIGINT))"
        if fname == "bitset_count_ones":
            if len(args) != 1:
                raise ValueError("KQL: bitset_count_ones(value)")
            return f"CAST(bit_count(CAST({args[0]} AS BIGINT)) AS BIGINT)"
        if fname == "array_reverse":
            if len(args) != 1:
                raise ValueError("KQL: array_reverse(arr)")
            return (f"parse_json(to_json(reverse(from_json(to_json("
                    f"{args[0]}), 'array<variant>'))))")
        if fname == "toguid":
            # canonical 8-4-4-4-12 (any case, optional braces) or
            # bare 32-hex -> normalized lowercase guid text; else null
            if len(args) != 1:
                raise ValueError("KQL: toguid(value)")
            s = f"trim(BOTH '{{}}' FROM CAST({args[0]} AS STRING))"
            canon_pat = (r"'^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}"
                         r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
                         r"-[0-9a-fA-F]{12}$'")
            hex32 = r"'^[0-9a-fA-F]{32}$'"
            dashed = (f"concat_ws('-', substring({s}, 1, 8), "
                      f"substring({s}, 9, 4), substring({s}, 13, 4), "
                      f"substring({s}, 17, 4), substring({s}, 21, 12))")
            return (f"(CASE WHEN {s} RLIKE {canon_pat} "
                    f"THEN lower({s}) "
                    f"WHEN {s} RLIKE {hex32} THEN lower({dashed}) "
                    f"ELSE NULL END)")
        if fname == "unicode_codepoints_from_string":
            # (?s). iterates CODE POINTS in Java regex; ascii() maps a
            # one-char string to its code point
            if len(args) != 1:
                raise ValueError(
                    "KQL: unicode_codepoints_from_string(s)")
            return (f"parse_json(to_json(transform(regexp_extract_all("
                    f"{args[0]}, '(?s).', 0), "
                    f"__cp_c -> ascii(__cp_c))))")
        if fname in ("unicode_codepoints_to_string", "make_string"):
            # make_string is Kusto's (deprecated) alias for
            # unicode_codepoints_to_string — same signature
            if len(args) < 1:
                raise ValueError(
                    f"KQL: {fname}(arr | cp, ...)")
            if len(args) == 1:
                a = (f"try_cast(variant_get(parse_json(to_json("
                     f"named_struct('x', {args[0]}))), '$.x') "
                     f"AS ARRAY<INT>)")
            else:
                a = ("array(" + ", ".join(
                    f"CAST({x} AS INT)" for x in args) + ")")
            # Spark's char() truncates above 255 — render each code
            # point as a JSON \\uXXXX escape (surrogate pair above
            # the BMP) and let from_json decode; escapes also make
            # quote/backslash code points injection-safe
            esc = (f"IF(__cs_i <= 65535, "
                   f"concat('\\\\u', lpad(hex(__cs_i), 4, '0')), "
                   f"concat("
                   f"'\\\\u', lpad(hex(55296 "
                   f"+ ((__cs_i - 65536) div 1024)), 4, '0'), "
                   f"'\\\\u', lpad(hex(56320 "
                   f"+ ((__cs_i - 65536) % 1024)), 4, '0')))")
            # from_json needs a container schema — decode via a
            # one-element JSON array
            return (f"element_at(from_json(concat('[\"', "
                    f"array_join(transform({a}, __cs_i -> {esc}), "
                    f"''), '\"]'), 'array<string>'), 1)")
        if fname == "parse_urlquery":
            # query-string bag: Kusto's {"Query Parameters": {k: v}}
            # shape; '?'-prefixed/full-URL input takes the part after
            # '?', a '#fragment' tail is cut, keys and values
            # url-decode (invalid %-escapes keep the raw text)
            if len(args) != 1:
                raise ValueError("KQL: parse_urlquery(query)")
            q = f"CAST({args[0]} AS STRING)"
            qs = (f"substring_index(CASE WHEN instr({q}, '?') > 0 "
                  f"THEN substr({q}, instr({q}, '?') + 1) "
                  f"ELSE {q} END, '#', 1)")
            m = f"str_to_map({qs}, '&', '=')"
            dec = (f"transform_values(transform_keys({m}, "
                   f"(__uq_k, __uq_v) -> coalesce(try_url_decode("
                   f"__uq_k), __uq_k)), (__uq_k, __uq_v) -> "
                   f"coalesce(try_url_decode(__uq_v), __uq_v))")
            return (f"parse_json(to_json(named_struct("
                    f"'Query Parameters', {dec})))")
        if fname in ("base64_encode_fromguid", "base64_decode_toguid"):
            # .NET Guid <-> base64: the first three components are
            # LITTLE-endian in the byte form (doc example
            # ae3133f2-... <-> '8jMxriJurkmwahbmqbIS6w=='), so the hex
            # stream is permuted [3210 54 76 89abcdef] — an involution,
            # the same reorder serves both directions. Invalid input
            # (bad base64, wrong length, malformed guid) -> null.
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(value)")

            def reorder(h):
                return (f"concat(substr({h}, 7, 2), substr({h}, 5, 2), "
                        f"substr({h}, 3, 2), substr({h}, 1, 2), "
                        f"substr({h}, 11, 2), substr({h}, 9, 2), "
                        f"substr({h}, 15, 2), substr({h}, 13, 2), "
                        f"substr({h}, 17, 16))")
            if fname == "base64_encode_fromguid":
                s = (f"lower(replace(trim(BOTH '{{}}' FROM "
                     f"CAST({args[0]} AS STRING)), '-', ''))")
                return (f"(CASE WHEN {s} RLIKE '^[0-9a-f]{{32}}$' "
                        f"THEN base64(unhex({reorder(s)})) "
                        f"ELSE NULL END)")
            bx = f"try_to_binary({args[0]}, 'base64')"
            hx = f"lower(hex({bx}))"
            g = reorder(hx)
            return (f"(CASE WHEN length({bx}) = 16 THEN "
                    f"concat_ws('-', substr({g}, 1, 8), "
                    f"substr({g}, 9, 4), substr({g}, 13, 4), "
                    f"substr({g}, 17, 4), substr({g}, 21, 12)) "
                    f"ELSE NULL END)")
        if fname == "treepath":
            # every node path of the bag, Kusto's bracket-quoted form
            # (['a']['b'], numeric hops for arrays) — recursive walk in
            # the dynamic kernel registry
            if len(args) != 1:
                raise ValueError("KQL: treepath(bag)")
            return (f"parse_json(to_json(__kql_treepath("
                    f"to_json({args[0]}))))")
        if fname == "estimate_data_size":
            # DOCUMENTED ESTIMATE (like Kusto's): the JSON text octet
            # length of the argument tuple — a stable, engine-local
            # payload proxy, not byte-exact storage accounting
            if not args:
                raise ValueError("KQL: estimate_data_size(e1, ...)")
            fields = ", ".join(f"'f{i}', {a}"
                               for i, a in enumerate(args))
            return (f"CAST(octet_length(to_json(named_struct("
                    f"{fields}))) AS BIGINT)")
        if fname == "parse_url":
            # Kusto parse_url -> dynamic bag. Built from Spark's native
            # parse_url parts + str_to_map for the query string, JSON
            # round-tripped onto VARIANT so d.Host / d.QueryParameters.k
            # path access works like any other dynamic. Deviation: the
            # query bag key is QueryParameters (no space; identifier
            # paths cannot address 'Query Parameters').
            if len(args) != 1:
                raise ValueError("KQL: parse_url(url) takes 1 arg")
            u = args[0]
            qmap = (f"str_to_map(coalesce(parse_url({u}, 'QUERY'), ''), "
                    f"'&', '=')")
            # Spark's parse_url has no PORT part (HOST/PATH/QUERY/REF/
            # PROTOCOL/FILE/AUTHORITY/USERINFO only; PORT yields NULL),
            # so the port is cut from the AUTHORITY's ':NNNN' suffix;
            # nullif keeps portless URLs consistent with the other
            # components (null -> dropped by to_json, like Host etc.)
            port = (f"nullif(regexp_extract(coalesce("
                    f"parse_url({u}, 'AUTHORITY'), ''), "
                    f"':([0-9]+)$', 1), '')")
            obj = (f"named_struct("
                   f"'Scheme', parse_url({u}, 'PROTOCOL'), "
                   f"'Host', parse_url({u}, 'HOST'), "
                   f"'Port', {port}, "
                   f"'Path', parse_url({u}, 'PATH'), "
                   f"'Fragment', parse_url({u}, 'REF'), "
                   f"'QueryParameters', {qmap})")
            return f"parse_json(to_json({obj}))"
        if fname == "bag_merge":
            # Kusto bag_merge(bag1, bag2, ...): merge property bags,
            # FIRST occurrence of a key wins (earlier args shadow later
            # ones). Pure expression: each variant bag round-trips
            # through map<string,variant> (faithful — values stay
            # typed variants), an aggregate fold concatenates with a
            # keys-already-present filter (lambda vars, so the
            # accumulator is never textually duplicated), and the
            # merged map re-enters VARIANT. Null/non-object args act
            # as empty bags.
            if len(args) < 2:
                raise ValueError("KQL: bag_merge(bag1, bag2, ...)")
            maps = [f"coalesce(from_json(to_json({a}), "
                    f"'map<string,variant>'), "
                    f"from_json('{{}}', 'map<string,variant>'))"
                    for a in args]
            merged = (f"aggregate(array({', '.join(maps[1:])}), "
                      f"{maps[0]}, (__bm_a, __bm_m) -> "
                      f"map_concat(__bm_a, map_filter(__bm_m, "
                      f"(__bm_k, __bm_v) -> NOT array_contains("
                      f"map_keys(__bm_a), __bm_k))))")
            return f"parse_json(to_json({merged}))"
        if fname == "hll":
            # Kusto hll(x): a mergeable HyperLogLog sketch intermediate
            # -> Spark's Datasketches HLL aggregate. THE re-aggregation
            # primitive at 100 TB: per-group sketches merge (hll_merge)
            # without re-scanning the fact table.
            return f"hll_sketch_agg({args[0]})"
        if fname == "hll_merge":
            return f"hll_union_agg({args[0]})"
        if fname == "dcount_hll":
            return f"hll_sketch_estimate({args[0]})"
        if fname in ("make_list", "make_set"):
            # optional maxSize SECOND arg caps the collection (Kusto
            # semantics — silently ignoring it returned unbounded
            # lists, a probe-found wrong answer). The slice happens
            # after the aggregate: which elements survive is
            # unspecified in Kusto too.
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(expr [, maxSize])")
            agg = ("collect_list" if fname == "make_list"
                   else "collect_set")
            out = f"{agg}({args[0]})"
            if len(args) == 2:
                return f"slice({out}, 1, CAST({args[1]} AS INT))"
            return out
        if fname == "make_list_with_nulls":
            # collect_list drops nulls; the struct wrap keeps them
            # (a non-null struct with a null field collects fine)
            return (f"transform(collect_list(named_struct("
                    f"'v', {args[0]})), __mlwn -> __mlwn.v)")
        if fname == "count_distinct":
            # Kusto's EXACT distinct count (dcount is the HLL estimate)
            if len(args) != 1:
                raise ValueError("KQL: count_distinct(col)")
            return f"count(DISTINCT {args[0]})"
        if fname == "count_distinctif":
            # exact distinct over rows passing the predicate (the
            # exact sibling of dcountif, Kusto count_distinctif)
            if len(args) != 2:
                raise ValueError(
                    "KQL: count_distinctif(col, predicate)")
            return (f"count(DISTINCT CASE WHEN {args[1]} "
                    f"THEN {args[0]} END)")
        if fname in ("prev", "next"):
            raise ValueError(
                "KQL: prev()/next() need a preceding 'sort by' "
                "(serialized order)")
        if fname in ("percentile", "percentiles"):
            # KQL percentile(col, P) uses a 0-100 scale; Spark/ANSI use
            # a 0-1 fraction. Exact interpolated percentile by default
            # (real Kusto estimates via T-digest; same documented
            # deviation as dcount); `set percentile_mode = approx;`
            # compiles to approx_percentile instead — a GK sketch whose
            # per-group state is bounded by the accuracy parameter, not
            # the group size, so a skewed key cannot buffer its rows on
            # one executor (the 100 TB path, and Kusto's own
            # semantics).
            if len(args) != 2:
                raise ValueError("KQL: percentile(col, P) takes 2 args")
            if _PERCENTILE_MODE == "approx":
                return (f"approx_percentile({args[0]}, "
                        f"({args[1]}) / 100.0, 10000)")
            return f"percentile({args[0]}, ({args[1]}) / 100.0)"
        if fname == "extract":
            # extract(regex, capture_group, text [, typeof(T)]) ->
            # regexp_extract; the 4-arg form CONVERTS the capture
            # (failed conversion / no match -> null, Kusto contract —
            # r12 probe find)
            if len(args) not in (3, 4):
                raise ValueError(
                    "KQL: extract(regex, group, text[, typeof(T)])")
            base = f"regexp_extract({args[2]}, {args[0]}, {args[1]})"
            if len(args) == 3:
                # Kusto: no match -> NULL (regexp_extract alone yields
                # '' — indistinguishable from a legit empty capture, so
                # guard with an RLIKE probe; r13 probe sweep)
                return (f"(CASE WHEN {args[2]} RLIKE {args[0]} "
                        f"THEN {base} ELSE NULL END)")
            mt = re.fullmatch(r"typeof\(\s*`?(\w+)`?\s*\)",
                              args[3].strip())
            sqlt = mt and {"long": "BIGINT", "int": "INT",
                           "real": "DOUBLE", "double": "DOUBLE",
                           "bool": "BOOLEAN", "datetime": "TIMESTAMP",
                           "string": "STRING", "guid": "STRING",
                           "decimal": "DECIMAL(38,18)",
                           "timespan": "BIGINT"}.get(
                               mt.group(1).lower())
            if not sqlt:
                raise ValueError(
                    f"KQL: extract 4th arg must be typeof(<type>), "
                    f"got {args[3]!r}")
            if sqlt == "STRING":
                return base
            return f"try_cast(nullif({base}, '') AS {sqlt})"
        if fname == "extract_all":
            # extract_all(regex [, captureGroups], text) -> array of
            # matches; with a groups array (or a LITERAL regex carrying
            # more than one capture group — Kusto's 2-arg contract,
            # r13 probe sweep) each match yields an array of its
            # captures (one regexp_extract_all per group, bound ONCE
            # via the struct hop, zipped by match index)
            if len(args) == 2:
                n = self._regex_literal_group_count(args[0])
                if n == 0:
                    # no capture groups: whole matches (Kusto)
                    return (f"regexp_extract_all({args[1]}, "
                            f"{args[0]}, 0)")
                if n is None or n == 1:
                    # non-literal regex: group 1 (documented narrowing
                    # — the group count is unknowable at compile time)
                    return (f"regexp_extract_all({args[1]}, "
                            f"{args[0]}, 1)")
                gs, text = list(range(1, n + 1)), args[1]
            elif len(args) == 3:
                import json as _json
                # flat numeric dynamics compile to a native
                # array(CAST(n AS BIGINT), ...) literal; nested ones to
                # parse_json('...') — accept both compile-time forms
                gs = []
                mg = re.fullmatch(r"parse_json\('(.*)'\)", args[1],
                                  re.DOTALL)
                if mg:
                    try:
                        gs = [int(g) for g in _json.loads(mg.group(1))]
                    except Exception:
                        gs = []
                elif re.fullmatch(
                        r"array\((?:\s*CAST\(\d+ AS BIGINT\)\s*,?)+\)",
                        args[1]):
                    gs = [int(g) for g in
                          re.findall(r"CAST\((\d+) AS BIGINT\)",
                                     args[1])]
                if not gs:
                    raise ValueError(
                        "KQL: extract_all captureGroups must be a "
                        "dynamic([...]) literal of group numbers")
                text = args[2]
            else:
                raise ValueError(
                    "KQL: extract_all(regex [, captureGroups], text)")
            arrs = [f"regexp_extract_all({text}, {args[0]}, {g})"
                    for g in gs]
            if len(arrs) == 1:
                return arrs[0]
            fields = ", ".join(f"'g{j}', {a}"
                               for j, a in enumerate(arrs))
            elems = ", ".join(
                f"try_element_at(__ea_s.g{j}, __ea_i)"
                for j in range(len(arrs)))
            # sequence(1, 0) DESCENDS — zero matches must yield []
            idx = (f"(CASE WHEN size(__ea_s.g0) >= 1 THEN "
                   f"sequence(1, size(__ea_s.g0)) ELSE array() END)")
            return (f"parse_json(to_json(element_at(transform(array("
                    f"named_struct({fields})), __ea_s -> "
                    f"transform({idx}, "
                    f"__ea_i -> array({elems}))), 1)))")
        if fname in ("series_sum", "series_avg", "series_max",
                     "series_min", "series_product"):
            # fold over the make-series value array, JVM-side
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(series) takes 1 arg")
            arr = self._series_arg(args[0])
            total = (f"aggregate({arr}, CAST(0 AS DOUBLE), "
                     f"(a, v) -> a + CAST(v AS DOUBLE))")
            if fname == "series_sum":
                return total
            if fname == "series_product":
                return (f"aggregate({arr}, CAST(1 AS DOUBLE), "
                        f"(a, v) -> a * CAST(v AS DOUBLE))")
            if fname == "series_avg":
                # empty-series guard: ANSI mode turns the /size division
                # into a runtime DIVIDE_BY_ZERO crash (r12 registry
                # property find) — Kusto yields null
                return (f"(CASE WHEN size({arr}) = 0 THEN NULL "
                        f"ELSE {total} / size({arr}) END)")
            fn = "array_max" if fname == "series_max" else "array_min"
            return f"CAST({fn}({arr}) AS DOUBLE)"
        if fname in ("isnan", "isinf", "isfinite"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(x) takes 1 arg")
            # Kusto contract: these return BOOL, never null — a null
            # input is "not a finite number / not inf / not nan" = false
            x = f"CAST({args[0]} AS DOUBLE)"
            if fname == "isnan":
                return f"coalesce(isnan({x}), false)"
            if fname == "isinf":
                return (f"coalesce(abs({x}) = CAST('Infinity' AS DOUBLE), "
                        f"false)")
            return (f"coalesce(NOT (isnan({x}) "
                    f"OR abs({x}) = CAST('Infinity' AS DOUBLE)), false)")
        if fname == "tohex":
            # Kusto tohex emits lowercase digits; Spark hex is upper.
            # Optional minLength zero-pads (lpad truncates from the
            # LEFT when over, so guard with greatest of both lengths)
            if len(args) not in (1, 2):
                raise ValueError("KQL: tohex(int [, minLength])")
            h = f"lower(hex({args[0]}))"
            if len(args) == 2:
                ml = f"CAST({args[1]} AS INT)"
                return (f"lpad({h}, greatest(length({h}), {ml}), '0')")
            return h
        if fname == "strcmp":
            if len(args) != 2:
                raise ValueError("KQL: strcmp(s1, s2)")
            a, b = args
            return (f"(CASE WHEN {a} < {b} THEN -1 "
                    f"WHEN {a} > {b} THEN 1 "
                    f"WHEN {a} = {b} THEN 0 END)")
        if fname == "string_size":
            # size in BYTES (strlen is in characters)
            if len(args) != 1:
                raise ValueError("KQL: string_size(s)")
            return f"octet_length({args[0]})"
        if fname == "repeat":
            if len(args) != 2:
                raise ValueError("KQL: repeat(value, count)")
            return f"array_repeat({args[0]}, CAST({args[1]} AS INT))"
        if fname == "range" and len(args) in (2, 3):
            # the SCALAR range(start, stop [, step]) -> dynamic array
            # (the `range x from a to b` SOURCE operator is separate).
            # stop is inclusive, like Kusto; a zero step is null, a
            # step pointing away from stop yields an empty array
            # (Spark's sequence would error); numeric domain (the
            # datetime/timespan form is not supported — documented).
            start, stop = args[0], args[1]
            step = args[2] if len(args) == 3 else "1"
            return (f"(CASE WHEN ({step}) = 0 THEN NULL "
                    f"WHEN (({stop}) - ({start})) * ({step}) < 0 "
                    f"THEN array() "
                    f"ELSE sequence({start}, {stop}, {step}) END)")
        if fname == "new_guid":
            if args:
                raise ValueError("KQL: new_guid() takes no args")
            return "uuid()"
        if fname == "rand":
            # rand() -> [0,1) real; rand(n) -> integer in [0, n)
            if len(args) == 0:
                return "rand()"
            if len(args) == 1:
                return (f"CAST(floor(rand() * ({args[0]})) AS BIGINT)")
            raise ValueError("KQL: rand([n])")
        if fname == "parse_csv":
            # one CSV record -> string array. Quote-aware via the
            # classic lookahead split (documented subset: no embedded
            # newlines), doubled quotes unescape
            if len(args) != 1:
                raise ValueError("KQL: parse_csv(record)")
            parts = (f"split({args[0]}, "
                     f"',(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)')")
            return (f"transform({parts}, __pc_x -> CASE WHEN __pc_x "
                    f"RLIKE '^\".*\"$' THEN replace(substring(__pc_x, "
                    f"2, length(__pc_x) - 2), '\"\"', '\"') "
                    f"ELSE __pc_x END)")
        if fname in ("geo_distance_2points", "geo_point_in_circle"):
            # great-circle distance in meters on the mean-radius sphere
            # (haversine; documented deviation: Kusto computes WGS84
            # geodesics — difference <0.5%, and the DuckDB oracle twin
            # recomputes the same documented formula independently)
            if fname == "geo_distance_2points" and len(args) != 4:
                raise ValueError(
                    "KQL: geo_distance_2points(lon1, lat1, lon2, lat2)")
            if fname == "geo_point_in_circle" and len(args) != 5:
                raise ValueError(
                    "KQL: geo_point_in_circle(lon, lat, clon, clat, r)")
            lon1, lat1, lon2, lat2 = args[:4]

            def rad(x):
                return f"radians(CAST({x} AS DOUBLE))"
            hav = (f"(pow(sin(({rad(lat2)} - {rad(lat1)}) / 2), 2) "
                   f"+ cos({rad(lat1)}) * cos({rad(lat2)}) "
                   f"* pow(sin(({rad(lon2)} - {rad(lon1)}) / 2), 2))")
            dist = f"(2 * 6371009.0 * asin(least(1.0, sqrt({hav}))))"
            if fname == "geo_distance_2points":
                return dist
            return f"({dist} <= CAST({args[4]} AS DOUBLE))"
        if fname in ("geo_point_to_geohash",
                     "geo_geohash_to_central_point",
                     "geo_geohash_to_polygon",
                     "geo_geohash_neighbors"):
            return self._geohash_fn(fname, args)
        if fname == "geo_point_in_polygon":
            return self._geo_point_in_polygon(args)
        if fname in ("geo_line_length", "geo_polygon_area",
                     "geo_polygon_centroid",
                     "geo_distance_point_to_line",
                     "geo_polygon_perimeter", "geo_line_centroid",
                     "geo_distance_point_to_polygon"):
            return self._geo_measure_fn(fname, args)
        if fname == "geo_azimuth":
            # initial great-circle bearing p1 -> p2, radians clockwise
            # from true north in [0, 2*pi) (standard spherical
            # formula; same mean-radius sphere as the rest of the geo
            # family). Identical points or out-of-range coords -> null.
            if len(args) != 4:
                raise ValueError(
                    "KQL: geo_azimuth(lon1, lat1, lon2, lat2)")

            def radx(x):
                return f"radians(CAST({x} AS DOUBLE))"
            lon1, lat1, lon2, lat2 = (radx(a) for a in args)
            dlon = f"({lon2} - {lon1})"
            az = (f"atan2(sin({dlon}) * cos({lat2}), "
                  f"cos({lat1}) * sin({lat2}) "
                  f"- sin({lat1}) * cos({lat2}) * cos({dlon}))")
            ok = (f"(CAST({args[0]} AS DOUBLE) BETWEEN -180 AND 180 "
                  f"AND CAST({args[1]} AS DOUBLE) BETWEEN -90 AND 90 "
                  f"AND CAST({args[2]} AS DOUBLE) BETWEEN -180 AND 180 "
                  f"AND CAST({args[3]} AS DOUBLE) BETWEEN -90 AND 90 "
                  f"AND NOT (CAST({args[0]} AS DOUBLE) = "
                  f"CAST({args[2]} AS DOUBLE) AND "
                  f"CAST({args[1]} AS DOUBLE) = "
                  f"CAST({args[3]} AS DOUBLE)))")
            return (f"(CASE WHEN {ok} THEN "
                    f"pmod({az}, 2 * pi()) ELSE NULL END)")
        if fname == "geo_point_to_s2cell":
            # S2 cell token (published s2geometry algorithm; Arrow
            # kernel __kql_s2_encode). Kusto's default level is 11.
            if len(args) not in (2, 3):
                raise ValueError(
                    "KQL: geo_point_to_s2cell(lon, lat [, level])")
            lvl = args[2] if len(args) == 3 else "11"
            return (f"__kql_s2_encode(CAST({args[0]} AS DOUBLE), "
                    f"CAST({args[1]} AS DOUBLE), "
                    f"CAST({lvl} AS INT))")
        if fname == "geo_s2cell_to_central_point":
            if len(args) != 1:
                raise ValueError(
                    "KQL: geo_s2cell_to_central_point(token)")
            return (f"parse_json(__kql_s2_center("
                    f"CAST({args[0]} AS STRING)))")
        if fname == "geo_s2cell_parent":
            # containing cell at `level` (default one level up);
            # engine extension aligned with geo_h3cell_parent
            if len(args) not in (1, 2):
                raise ValueError(
                    "KQL: geo_s2cell_parent(token [, level])")
            lvl = args[1] if len(args) == 2 else "-1"
            return (f"__kql_s2_parent(CAST({args[0]} AS STRING), "
                    f"CAST({lvl} AS INT))")
        if fname in ("geo_s2cell_children", "geo_s2cell_neighbors"):
            # dynamic array of child (Hilbert order) / edge-neighbor
            # (down,right,up,left) tokens; null on malformed input
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(token)")
            kern = ("__kql_s2_children"
                    if fname == "geo_s2cell_children"
                    else "__kql_s2_neighbors")
            return f"parse_json({kern}(CAST({args[0]} AS STRING)))"
        if fname in ("geo_point_to_h3cell",
                     "geo_h3cell_to_central_point",
                     "geo_h3cell_parent", "geo_h3cell_children",
                     "geo_h3cell_rings", "geo_h3cell_neighbors",
                     "geo_h3cell_to_polygon"):
            # H3 family: DELEGATED to the optional `h3` reference
            # library (see _h3_api — the published base-cell constant
            # tables are not re-derivable in closed form, and a
            # lookalike would mint non-conformant tokens). Absent
            # package -> loud COMPILE-TIME contract, not silent nulls.
            if _h3_api() is None:
                raise ValueError(
                    f"KQL: {fname} requires the optional 'h3' package "
                    f"(pip install h3) — the H3 base-cell tables are "
                    f"not reproducible without it; the geohash and "
                    f"S2 cell families are the built-in alternatives")
            if fname == "geo_point_to_h3cell":
                if len(args) not in (2, 3):
                    raise ValueError(
                        "KQL: geo_point_to_h3cell(lon, lat [, res])")
                res = args[2] if len(args) == 3 else "9"
                return (f"__kql_h3_encode(CAST({args[0]} AS DOUBLE), "
                        f"CAST({args[1]} AS DOUBLE), "
                        f"CAST({res} AS INT))")
            if fname == "geo_h3cell_parent":
                if len(args) not in (1, 2):
                    raise ValueError(
                        "KQL: geo_h3cell_parent(token [, level])")
                lvl = args[1] if len(args) == 2 else "-1"
                return (f"__kql_h3_parent(CAST({args[0]} AS STRING), "
                        f"CAST({lvl} AS INT))")
            if fname in ("geo_h3cell_rings", "geo_h3cell_neighbors"):
                # neighbors == rings(1) minus self is Kusto's
                # convention for the geohash family; H3's own
                # neighbors doc returns the k-disk INCLUDING self —
                # delegate both to grid_disk and let rings carry the
                # k argument
                k = "1"
                if fname == "geo_h3cell_rings":
                    if len(args) != 2:
                        raise ValueError(
                            "KQL: geo_h3cell_rings(token, k)")
                    k = args[1]
                elif len(args) != 1:
                    raise ValueError(f"KQL: {fname}(token)")
                return (f"parse_json(__kql_h3_rings("
                        f"CAST({args[0]} AS STRING), "
                        f"CAST({k} AS INT)))")
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(token)")
            kern = {"geo_h3cell_to_central_point": "__kql_h3_center",
                    "geo_h3cell_children": "__kql_h3_children",
                    "geo_h3cell_to_polygon": "__kql_h3_polygon",
                    }[fname]
            return f"parse_json({kern}(CAST({args[0]} AS STRING)))"
        if fname in ("geo_line_densify", "geo_line_simplify",
                     "geo_polygon_densify", "geo_polygon_simplify"):
            # shape transforms over GeoJSON dynamics (Arrow kernels:
            # slerp subdivision / iterative RDP, see
            # _register_geo_shape_udfs). Second arg = tolerance meters
            # (densify: max edge length; simplify: RDP epsilon),
            # default 10 like Kusto. Invalid geometry / collapsed
            # rings -> null.
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(shape [, tolerance])")
            tol = args[1] if len(args) == 2 else "10.0"
            kern = {"geo_line_densify": "__kql_geo_densify_line",
                    "geo_line_simplify": "__kql_geo_simplify_line",
                    "geo_polygon_densify": "__kql_geo_densify_poly",
                    "geo_polygon_simplify": "__kql_geo_simplify_poly",
                    }[fname]
            return (f"parse_json({kern}(to_json({args[0]}), "
                    f"CAST({tol} AS DOUBLE)))")
        if fname == "geo_intersects_2lines":
            # planar segment sweep on raw lon/lat (the family's
            # documented planar approximation); null on invalid input
            if len(args) != 2:
                raise ValueError(
                    "KQL: geo_intersects_2lines(line1, line2)")
            return (f"__kql_geo_isect2l(to_json({args[0]}), "
                    f"to_json({args[1]}))")
        if fname == "geo_s2cell_to_polygon":
            # GeoJSON Polygon of the cell's 4 corners (chord edges;
            # true S2 edges are great circles — documented deviation
            # consistent with the planar geo measures)
            if len(args) != 1:
                raise ValueError("KQL: geo_s2cell_to_polygon(token)")
            return (f"parse_json(__kql_s2_polygon("
                    f"CAST({args[0]} AS STRING)))")
        if fname == "bag_keys":
            # dynamic bag -> array of top-level keys (JSON round-trip;
            # VARIANT has no native key enumeration yet)
            if len(args) != 1:
                raise ValueError("KQL: bag_keys(bag)")
            return f"json_object_keys(to_json({args[0]}))"
        if fname == "jaccard_index":
            if len(args) != 2:
                raise ValueError("KQL: jaccard_index(set1, set2)")
            a, b = args
            inter = f"size(array_intersect({a}, {b}))"
            uni = f"size(array_union({a}, {b}))"
            return (f"(CASE WHEN {uni} = 0 THEN CAST(NULL AS DOUBLE) "
                    f"ELSE CAST({inter} AS DOUBLE) / {uni} END)")
        if fname == "set_has_element":
            if len(args) != 2:
                raise ValueError("KQL: set_has_element(arr, value)")
            return f"array_contains({args[0]}, {args[1]})"
        if fname in ("make_bag", "make_bag_if"):
            # aggregate: merge per-row property bags into one bag.
            # Kusto picks an arbitrary value for duplicate keys; here
            # the first-merged bag wins (same policy as bag_merge) —
            # deterministic given deterministic aggregation order, and
            # oracled fixtures use disjoint keys so no policy shows.
            if fname == "make_bag_if":
                if len(args) != 2:
                    raise ValueError("KQL: make_bag_if(bag, predicate)")
                src = f"IF({args[1]}, {args[0]}, NULL)"
            else:
                if len(args) != 1:
                    raise ValueError("KQL: make_bag(bag)")
                src = args[0]
            # collect_list drops null bags (rows failing the
            # predicate). Merge = flatten all entries, keep each key's
            # FIRST occurrence, rebuild the map. Deliberately NOT an
            # aggregate() lambda-fold with a map accumulator: a Python
            # UDF (dynamic_to_json) consuming to_json of that fold in
            # the same aggregation fails Spark 4.1's UDF extraction on
            # every execution after a session's first (INTERNAL_ERROR
            # PythonUDF.eval); the entries-dedup shape is stable.
            m = f"from_json(to_json({src}), 'map<string,variant>')"
            ents = f"flatten(collect_list(map_entries({m})))"
            keys = f"transform({ents}, __mb_x -> __mb_x.key)"
            firsts = (f"filter(zip_with({ents}, "
                      f"sequence(0, size({ents}) - 1), "
                      f"(__mb_e, __mb_i) -> named_struct("
                      f"'e', __mb_e, 'i', __mb_i)), "
                      f"__mb_p -> array_position({keys}, "
                      f"__mb_p.e.key) = __mb_p.i + 1)")
            merged = (f"map_from_entries(transform({firsts}, "
                      f"__mb_p -> __mb_p.e))")
            return f"parse_json(to_json({merged}))"
        if fname == "percentilew":
            # weighted percentile: the smallest value whose running
            # weight (ascending value order) reaches P% of the total.
            # Exact — real Kusto estimates via T-digest, the same
            # documented deviation as percentile()/dcount(). Buffers
            # the group's (value, weight) pairs like Spark's own exact
            # percentile; null/non-positive weights drop.
            if len(args) != 3:
                raise ValueError(
                    "KQL: percentilew(col, weight, percentile)")
            return self._percentilew_sql(*args)
        if fname in ("percentilesw", "percentilesw_array"):
            # plural weighted percentiles -> one array (Kusto's
            # percentilesw via summarize tuple assignment, or the
            # _array form directly). Each element is the exact fold;
            # the sorted-pairs collect_list is IDENTICAL across
            # elements, so Spark's aggregation planner deduplicates it
            # to a single buffered aggregate per group.
            if len(args) < 3:
                raise ValueError(
                    "KQL: percentilesw(col, weight, p1, p2, ...)")
            v, w = args[0], args[1]
            elems = ", ".join(self._percentilew_sql(v, w, p)
                              for p in args[2:])
            return f"array({elems})"
        if fname == "gettype":
            # runtime type name in Kusto vocabulary. The value lifts
            # to VARIANT through a named_struct JSON round-trip —
            # analysis-valid for EVERY input type, where a direct
            # schema_of_variant / CAST(.. AS VARIANT) rejects typed
            # columns at analysis. Deviations, per this compiler's
            # carriers: timespans ride as bigint µs (-> 'long');
            # decimals -> 'real'; datetimes INSIDE a dynamic
            # stringify (-> 'string'; top-level datetime columns are
            # caught by the typeof branch).
            if len(args) != 1:
                raise ValueError("KQL: gettype(value)")
            x = args[0]
            vt = (f"schema_of_variant(variant_get(parse_json("
                  f"to_json(named_struct('x', {x}))), '$.x'))")
            return (f"CASE WHEN {x} IS NULL THEN 'null' "
                    f"WHEN typeof({x}) = 'timestamp' THEN 'datetime' "
                    f"WHEN {vt} = 'VOID' THEN 'null' "
                    f"WHEN {vt} IN ('BIGINT', 'INT', 'SMALLINT', "
                    f"'TINYINT') THEN 'long' "
                    f"WHEN {vt} IN ('DOUBLE', 'FLOAT') "
                    f"OR {vt} LIKE 'DECIMAL%' THEN 'real' "
                    f"WHEN {vt} = 'STRING' THEN 'string' "
                    f"WHEN {vt} = 'BOOLEAN' THEN 'bool' "
                    f"WHEN {vt} LIKE 'ARRAY%' THEN 'array' "
                    f"ELSE 'dictionary' END")
        if fname == "bag_remove_keys":
            # top-level key removal (Kusto also accepts JSON paths for
            # nested keys; the common top-level form is what compiles)
            if len(args) != 2:
                raise ValueError("KQL: bag_remove_keys(bag, keys)")
            bag, keys = args
            m = f"from_json(to_json({bag}), 'map<string,variant>')"
            ks = f"from_json(to_json({keys}), 'array<string>')"
            out = (f"map_filter({m}, (__brk_k, __brk_v) -> "
                   f"NOT array_contains({ks}, __brk_k))")
            return f"parse_json(to_json({out}))"
        if fname == "bag_set_key":
            # set/overwrite one top-level key; null/missing bag seeds
            # an empty one (matching Kusto's upsert behavior)
            if len(args) != 3:
                raise ValueError("KQL: bag_set_key(bag, key, value)")
            bag, key, val = args
            m = (f"coalesce(from_json(to_json({bag}), "
                 f"'map<string,variant>'), "
                 f"from_json('{{}}', 'map<string,variant>'))")
            k = f"CAST({key} AS STRING)"
            # named_struct round-trip lifts ANY value type to variant
            # (to_json rejects bare scalars)
            vv = (f"variant_get(parse_json(to_json(named_struct("
                  f"'v', {val}))), '$.v')")
            out = (f"map_concat(map_filter({m}, "
                   f"(__bsk_k, __bsk_v) -> __bsk_k <> {k}), "
                   f"map({k}, {vv}))")
            return f"parse_json(to_json({out}))"
        if fname == "array_split":
            # split an array into contiguous chunks at the given
            # 0-based indices (scalar or array; negatives wrap, values
            # clamp to [0, n])
            if len(args) != 2:
                raise ValueError("KQL: array_split(arr, indices)")
            arr, idx = args
            a = f"from_json(to_json({arr}), 'array<variant>')"
            vi = (f"variant_get(parse_json(to_json(named_struct("
                  f"'x', {idx}))), '$.x')")
            raw = (f"coalesce(try_cast({vi} AS ARRAY<BIGINT>), "
                   f"array(try_cast({vi} AS BIGINT)))")
            n = f"CAST(size({a}) AS BIGINT)"
            norm = (f"array_sort(transform({raw}, __as_i -> "
                    f"greatest(CAST(0 AS BIGINT), least({n}, "
                    f"IF(__as_i < 0, {n} + __as_i, __as_i)))))")
            bounds = (f"concat(array(CAST(0 AS BIGINT)), {norm}, "
                      f"array({n}))")
            parts = (f"transform(sequence(1, size({bounds}) - 1), "
                     f"__as_j -> slice({a}, "
                     f"CAST(element_at({bounds}, __as_j) AS INT) + 1, "
                     f"CAST(element_at({bounds}, __as_j + 1) "
                     f"- element_at({bounds}, __as_j) AS INT)))")
            return (f"CASE WHEN {a} IS NULL THEN NULL "
                    f"ELSE parse_json(to_json({parts})) END")
        if fname == "has_any_index":
            # 0-based index of the first term in `values` that the
            # source string `has` (whole-term match); -1 when none
            if len(args) != 2:
                raise ValueError("KQL: has_any_index(source, values)")
            src, vals = args
            toks = (f"split(lower({_str_if_variant(src)}), "
                    f"'[^a-z0-9]+')")
            vv = f"from_json(to_json({vals}), 'array<string>')"
            hits = (f"filter(transform(sequence(0, size({vv}) - 1), "
                    f"__hai_i -> IF(array_contains({toks}, "
                    f"lower(element_at({vv}, "
                    f"CAST(__hai_i + 1 AS INT)))), __hai_i, -1)), "
                    f"__hai_x -> __hai_x >= 0)")
            return (f"CASE WHEN {vv} IS NULL OR size({vv}) = 0 "
                    f"THEN -1 "
                    f"ELSE coalesce(try_element_at({hits}, 1), -1) "
                    f"END")
        if fname == "dynamic_to_json":
            # canonical JSON text: keys sorted at every nesting level
            # (json.dumps sort_keys in an Arrow-batched UDF — key
            # ordering is a text-level property Spark SQL can't see)
            if len(args) != 1:
                raise ValueError("KQL: dynamic_to_json(value)")
            return f"__kql_dyn2json(to_json({args[0]}))"
        if fname == "totimespan":
            # parse "[-][d.]hh:mm:ss[.fffffff]" (Kusto timespan text)
            # into MICROSECONDS — the same unit timespan literals carry
            # through this compiler; unparseable -> null
            if len(args) != 1:
                raise ValueError("KQL: totimespan(text)")
            s = f"CAST({args[0]} AS STRING)"
            body = f"ltrim('-', {s})"
            pat = (r"'^(?:(\\d+)\\.)?(\\d+):(\\d+):(\\d+)"
                   r"(?:\\.(\\d+))?$'")
            grp = (lambda i:
                   f"coalesce(try_cast(nullif(regexp_extract({body}, "
                   f"{pat}, {i}), '') AS BIGINT), 0)")
            frac = (f"coalesce(try_cast(substring(rpad(nullif("
                    f"regexp_extract({body}, {pat}, 5), ''), 6, '0'), "
                    f"1, 6) AS BIGINT), 0)")
            total = (f"({grp(1)} * 86400000000 + {grp(2)} * 3600000000 "
                     f"+ {grp(3)} * 60000000 + {grp(4)} * 1000000 "
                     f"+ {frac})")
            return (f"(CASE WHEN {body} RLIKE {pat} THEN "
                    f"IF(startswith({s}, '-'), -{total}, {total}) "
                    f"ELSE NULL END)")
        if fname in ("array_iff", "array_iif"):
            # element-wise conditional merge of two arrays by a
            # boolean-array mask (index-aligned; null past either end);
            # array_iif is Kusto's documented alias. Empty-mask guard:
            # sequence(1, 0) DESCENDS to [1, 0] (the round-5 gotcha),
            # so an empty cond array must short-circuit.
            if len(args) != 3:
                raise ValueError(f"KQL: {fname}(cond_arr, a, b)")
            c, a, b = [self._dyn_arr_arg(x) for x in args]
            return (f"(CASE WHEN size({c}) <= 0 THEN array() ELSE "
                    f"transform(sequence(1, size({c})), __ai_i -> "
                    f"IF(CAST(try_element_at({c}, __ai_i) AS BOOLEAN), "
                    f"try_element_at({a}, __ai_i), "
                    f"try_element_at({b}, __ai_i))) END)")
        if fname in ("array_rotate_left", "array_rotate_right"):
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(arr, n)")
            arr, n = self._dyn_arr_arg(args[0]), args[1]
            # normalize the shift into [0, size) (negative n rotates
            # the other way, like Kusto)
            k = (f"CAST(pmod({'-' if fname.endswith('right') else ''}"
                 f"({n}), size({arr})) AS INT)")
            return (f"(CASE WHEN size({arr}) = 0 THEN {arr} ELSE "
                    f"concat(slice({arr}, {k} + 1, "
                    f"size({arr}) - {k}), "
                    f"slice({arr}, 1, {k})) END)")
        if fname in ("array_shift_left", "array_shift_right"):
            # shift with null (or `fill`) padding, Kusto semantics;
            # negative n shifts the other way
            if len(args) not in (2, 3):
                raise ValueError(f"KQL: {fname}(arr, n[, fill])")
            arr, n = self._dyn_arr_arg(args[0]), args[1]
            fill = args[2] if len(args) == 3 else "NULL"
            if fname == "array_shift_right":
                n = f"(-({n}))"
            # empty-array guard: sequence(1, 0) descends to [1, 0]
            # (round-5 gotcha) — an empty input must stay empty
            return (f"(CASE WHEN size({arr}) <= 0 THEN {arr} ELSE "
                    f"transform(sequence(1, size({arr})), __as_i -> "
                    f"CASE WHEN __as_i + ({n}) BETWEEN 1 AND "
                    f"size({arr}) THEN "
                    f"element_at({arr}, CAST(__as_i + ({n}) AS INT)) "
                    f"ELSE {fill} END) END)")
        if fname == "zip":
            # zip(a1, a2, ...) -> dynamic array of n-tuples (arrays),
            # null-padded to the LONGEST input (Kusto). Each input is
            # JSON-lifted to array<variant> (accepts native arrays AND
            # dynamic literals — the r10 coercion pattern); the lifts
            # bind ONCE via the struct hop so the per-element lambda
            # body doesn't re-evaluate them (r9 O(n^2) gotcha).
            if len(args) < 2:
                raise ValueError("KQL: zip(arr1, arr2, ...)")
            binds = ", ".join(
                f"'z{i}', from_json(to_json({a}), 'array<variant>')"
                for i, a in enumerate(args))
            sizes = ", ".join(f"size(__zs.z{i})"
                              for i in range(len(args)))
            row = ", ".join(f"try_element_at(__zs.z{i}, __zp_i)"
                            for i in range(len(args)))
            return (f"element_at(transform(array(named_struct({binds})"
                    f"), __zs -> CASE WHEN greatest({sizes}) <= 0 "
                    f"THEN parse_json('[]') ELSE parse_json(to_json("
                    f"transform(sequence(1, greatest({sizes})), "
                    f"__zp_i -> array({row})))) END), 1)")
        if fname == "isutf8":
            # Kusto: true when the value is a valid utf8 string. Spark
            # strings are validated on decode, so test the utf-8 BYTES
            # of the string (surrogate damage -> false); null -> null.
            if len(args) != 1:
                raise ValueError("KQL: isutf8(s)")
            return (f"is_valid_utf8(CAST({args[0]} AS STRING))")
        if fname == "regex_quote":
            # RE2 QuoteMeta semantics: escape every ASCII char outside
            # [A-Za-z0-9_]; non-ASCII code points pass through (RE2
            # would not escape them and '\é' is not valid RE2). The
            # pattern/replacement are built via chr(92) concat because
            # Spark SQL literal backslash-escape processing mangles
            # '\x..' forms.
            if len(args) != 1:
                raise ValueError("KQL: regex_quote(s)")
            pat = (r"concat('([^A-Za-z0-9_', chr(92), 'x80-', "
                   r"chr(92), 'x{10FFFF}])')")
            rep = "concat(chr(92), chr(92), '$1')"
            return (f"regexp_replace(CAST({args[0]} AS STRING), "
                    f"{pat}, {rep})")
        if fname == "column_ifexists":
            # schema-defensive column reference: the REAL column when
            # it exists, else the default (resolved at compile time
            # against the pipeline schema, like Kusto)
            if len(args) != 2:
                raise ValueError(
                    "KQL: column_ifexists('name', default)")
            m = re.fullmatch(r"\s*'([^']*)'\s*", args[0])
            if not m:
                raise ValueError(
                    "KQL: column_ifexists needs a literal column name")
            if self.df is not None and m.group(1) in self.df.columns:
                return f"`{m.group(1)}`"
            return args[1]
        if fname == "strcat_array":
            if len(args) != 2:
                raise ValueError("KQL: strcat_array(array, sep)")
            return (f"array_join(transform({args[0]}, "
                    f"v -> CAST(v AS STRING)), {args[1]})")
        if fname == "split":
            # KQL split: LITERAL delimiter (Spark's split takes a regex
            # — \Q..\E-quote it); the 3-arg form returns a one-element
            # array with the 0-based requested part, empty array past
            # the end (Kusto's contract)
            if len(args) not in (2, 3):
                raise ValueError("KQL: split(source, delimiter[, index])")
            parts = f"split({args[0]}, concat('\\\\Q', {args[1]}, '\\\\E'))"
            if len(args) == 2:
                return parts
            idx = args[2]
            return (f"(CASE WHEN size({parts}) > ({idx}) AND ({idx}) >= 0 "
                    f"THEN array(element_at({parts}, ({idx}) + 1)) "
                    f"ELSE array() END)")
        if fname == "translate":
            # Kusto arg order is (searchList, replacementList, text);
            # Spark's translate is (text, from, to)
            if len(args) != 3:
                raise ValueError(
                    "KQL: translate(searchList, replacementList, text)")
            return f"translate({args[2]}, {args[0]}, {args[1]})"
        if fname == "url_encode":
            # form-style encoding ('+' for space); hex digits are
            # uppercase (documented deviation: Kusto emits lowercase)
            if len(args) != 1:
                raise ValueError("KQL: url_encode(url)")
            return f"url_encode({args[0]})"
        if fname == "url_encode_component":
            if len(args) != 1:
                raise ValueError("KQL: url_encode_component(url)")
            return f"replace(url_encode({args[0]}), '+', '%20')"
        if fname == "url_decode":
            if len(args) != 1:
                raise ValueError("KQL: url_decode(url)")
            return f"url_decode({args[0]})"
        if fname == "todecimal":
            if len(args) != 1:
                raise ValueError("KQL: todecimal(x)")
            return f"try_cast({args[0]} AS DECIMAL(38, 18))"
        if fname in ("binary_and", "binary_or", "binary_xor"):
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(a, b)")
            op = {"binary_and": "&", "binary_or": "|",
                  "binary_xor": "^"}[fname]
            return f"({args[0]} {op} {args[1]})"
        if fname == "binary_not":
            if len(args) != 1:
                raise ValueError("KQL: binary_not(a)")
            return f"(~({args[0]}))"
        if fname in ("binary_shift_left", "binary_shift_right"):
            # 64-bit shifts (CAST keeps Spark's int shift from wrapping
            # at 32)
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(value, shift)")
            fn = ("shiftleft" if fname == "binary_shift_left"
                  else "shiftright")
            return f"{fn}(CAST({args[0]} AS BIGINT), {args[1]})"
        if fname == "parse_version":
            # "a.b.c.d" -> a·10^24 + b·10^16 + c·10^8 + d as
            # DECIMAL(38,0) (Kusto's comparable normalization; up to 4
            # numeric parts of <= 8 digits, anything else -> null)
            if len(args) != 1:
                raise ValueError("KQL: parse_version(version)")
            parts = f"split({args[0]}, '\\\\.')"

            def _vp(i):
                return (f"CAST(coalesce(try_cast(try_element_at("
                        f"{parts}, {i}) AS BIGINT), 0) AS DECIMAL(38,0))")
            valid = (f"(size({parts}) BETWEEN 1 AND 4 AND forall({parts},"
                     f" __pv_x -> try_cast(__pv_x AS BIGINT) IS NOT NULL"
                     f" AND try_cast(__pv_x AS BIGINT) "
                     f"BETWEEN 0 AND 99999999))")
            expr = (f"((({_vp(1)} * 100000000 + {_vp(2)}) * 100000000 "
                    f"+ {_vp(3)}) * 100000000 + {_vp(4)})")
            return (f"(CASE WHEN {valid} "
                    f"THEN CAST({expr} AS DECIMAL(38,0)) ELSE NULL END)")
        if fname in ("parse_ipv4", "parse_ipv4_mask", "ipv4_is_private",
                     "ipv4_is_in_range", "format_ipv4",
                     "format_ipv4_mask", "ipv4_netmask_suffix",
                     "ipv4_compare", "ipv4_is_match",
                     "ipv4_range_to_cidr_list"):
            return self._ipv4_fn(fname, args)
        if fname in ("has_ipv4", "has_any_ipv4", "has_ipv4_prefix",
                     "has_any_ipv4_prefix", "ipv4_is_in_any_range"):
            return self._ipv4_scan_fn(fname, args)
        if fname == "datetime_part":
            # datetime_part('part', dt) -> long; sub-second parts from
            # the in-second epoch-µs remainder (storage is µs, so the
            # nanosecond part carries trailing zeros — documented)
            if len(args) != 2:
                raise ValueError("KQL: datetime_part(part, dt)")
            pm2 = re.fullmatch(r"\s*'(\w+)'\s*", args[0] or "")
            if not pm2:
                raise ValueError(
                    "KQL: datetime_part needs a literal part name")
            part = pm2.group(1).lower()
            dt = args[1]
            frac = f"pmod(unix_micros({dt}), 1000000)"
            exprs = {
                "year": f"year({dt})",
                "quarter": f"quarter({dt})",
                "month": f"month({dt})",
                "week_of_year": f"weekofyear({dt})",
                "day": f"day({dt})",
                "dayofyear": f"dayofyear({dt})",
                "hour": f"hour({dt})",
                "minute": f"minute({dt})",
                "second": f"second({dt})",
                "millisecond": f"({frac} div 1000)",
                "microsecond": frac,
                "nanosecond": f"({frac} * 1000)",
            }
            if part not in exprs:
                raise ValueError(
                    f"KQL: datetime_part: unknown part {part!r}")
            return f"CAST({exprs[part]} AS BIGINT)"
        if fname in ("datetime_utc_to_local", "datetime_local_to_utc"):
            # IANA tz-database conversions (Spark's JVM carries the tz
            # rules, incl. DST transitions)
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(dt, timezone)")
            fn = ("from_utc_timestamp"
                  if fname == "datetime_utc_to_local"
                  else "to_utc_timestamp")
            return f"{fn}({args[0]}, {args[1]})"
        if fname in ("datetime_add", "datetime_diff"):
            return self._datetime_math(fname, args)
        if fname in self._UNIT_TABLES or fname == "convert_temperature":
            return self._convert_unit(fname, args)
        if fname == "series_fir":
            # Two forms (r13 probe sweep). Kusto's documented
            # signature: series_fir(series, filter[, normalize[,
            # center]]) — finite-impulse-response convolution with a
            # coefficient ARRAY; out-of-range taps read 0
            # (zero-padding), normalize divides by sum(filter)
            # (default: yes iff no coefficient is negative — Kusto
            # errors there; this engine's omitted-arg default is the
            # same rule evaluated at runtime), center=true centers the
            # window on the current point (shift floor(m/2)).
            # ENGINE EXTENSION kept for decompose internals and
            # banked oracles: a NUMERIC second arg is a trailing
            # moving average of that width, averaging over the ACTUAL
            # (partial at the left edge) window.
            if len(args) not in (2, 3, 4):
                raise ValueError(
                    "KQL: series_fir(series, filter[, normalize"
                    "[, center]])")
            arr = self._series_arg(args[0])
            dt = self._probe_dtype(args[1])
            is_arr = (dt is not None
                      and dt.typeName() in ("array", "variant")) \
                or re.match(r"\s*(?:array\s*\(|parse_json\s*\()",
                            args[1])
            if len(args) == 2 and not is_arr:
                k = args[1]
                return (f"transform({arr}, (__fir_v, __fir_i) -> "
                        f"aggregate(slice({arr}, "
                        f"greatest(__fir_i + 2 - {k}, 1), "
                        f"least(__fir_i + 1, {k})), CAST(0 AS DOUBLE), "
                        f"(__fir_a, __fir_x) -> "
                        f"__fir_a + CAST(__fir_x AS DOUBLE)) "
                        f"/ least(__fir_i + 1, {k}))")
            fl = (f"transform(try_cast({args[1]} AS ARRAY<DOUBLE>), "
                  f"__fir_c -> CAST(__fir_c AS DOUBLE))")
            m = f"size({fl})"
            if len(args) >= 3:
                denom = (f"(CASE WHEN CAST({args[2]} AS BOOLEAN) "
                         f"THEN aggregate({fl}, CAST(0 AS DOUBLE), "
                         f"(__fir_a, __fir_c) -> __fir_a + __fir_c) "
                         f"ELSE 1.0 END)")
            else:
                denom = (f"(CASE WHEN array_min({fl}) >= 0 "
                         f"THEN aggregate({fl}, CAST(0 AS DOUBLE), "
                         f"(__fir_a, __fir_c) -> __fir_a + __fir_c) "
                         f"ELSE 1.0 END)")
            shift = (f"CAST(floor({m} / 2) AS INT)"
                     if len(args) == 4 else "0")
            shift = (f"(CASE WHEN CAST({args[3]} AS BOOLEAN) "
                     f"THEN {shift} ELSE 0 END)"
                     if len(args) == 4 else "0")
            xs = (f"transform({arr}, __fir_x -> "
                  f"CAST(__fir_x AS DOUBLE))")
            return (
                f"(CASE WHEN {m} IS NULL OR {m} <= 0 OR {denom} = 0 "
                f"THEN NULL ELSE "
                f"transform({xs}, (__fir_v, __fir_i) -> "
                f"aggregate(sequence(1, {m}), CAST(0 AS DOUBLE), "
                f"(__fir_a, __fir_j) -> __fir_a "
                f"+ element_at({fl}, __fir_j) "
                f"* coalesce(CASE WHEN __fir_i + 2 - __fir_j "
                f"+ {shift} >= 1 THEN try_element_at({xs}, "
                f"__fir_i + 2 - __fir_j + {shift}) END, 0.0)) "
                f"/ {denom}) END)")
        if fname == "series_fill_const":
            # Kusto: series_fill_const(series[, constant_value]) —
            # constant defaults to 0 (r13 probe sweep)
            if len(args) not in (1, 2):
                raise ValueError(
                    "KQL: series_fill_const(series[, value])")
            const = args[1] if len(args) == 2 else "0.0"
            return (f"transform({self._series_arg(args[0])}, v -> coalesce("
                    f"CAST(v AS DOUBLE), CAST({const} AS DOUBLE)))")
        if fname in ("series_fill_forward", "series_fill_backward"):
            # O(n) fold building the filled array; try_element_at(acc, -1)
            # is null on the empty accumulator, so leading (resp.
            # trailing) nulls stay null — Kusto's edge behavior.
            # Optional missing_value_placeholder (r13 probe sweep):
            # points equal to it count as missing too (make-series
            # grids filled with a sentinel default).
            if len(args) not in (1, 2):
                raise ValueError(
                    f"KQL: {fname}(series[, missing_value_placeholder])")
            arr = self._series_arg(args[0])
            if len(args) == 2:
                arr = (f"transform({arr}, __sfp_v -> CASE WHEN "
                       f"CAST(__sfp_v AS DOUBLE) <=> "
                       f"CAST({args[1]} AS DOUBLE) THEN NULL "
                       f"ELSE CAST(__sfp_v AS DOUBLE) END)")
            if fname == "series_fill_backward":
                arr = f"reverse({arr})"
            ff = (f"aggregate({arr}, CAST(array() AS ARRAY<DOUBLE>), "
                  f"(a, v) -> array_append(a, coalesce(CAST(v AS DOUBLE), "
                  f"try_element_at(a, -1))))")
            return ff if fname == "series_fill_forward" else f"reverse({ff})"
        if fname == "series_fill_linear":
            # linear interpolation between the nearest non-null anchors;
            # edges take the nearest anchor (Kusto series_fill_linear).
            # Pure higher-order SQL: per position, the prev/next anchor
            # is found by filtering the (value, index) pairs — O(n²) in
            # the SERIES length (calendar-bounded), zero Python.
            # Full Kusto signature (r13 probe sweep):
            # series_fill_linear(series[, missing_value_placeholder
            # [, fill_edges[, constant_value]]]) — points equal to the
            # placeholder count as missing; fill_edges=false leaves
            # edge gaps at constant_value (default null) instead of
            # the nearest anchor.
            if len(args) not in (1, 2, 3, 4):
                raise ValueError(
                    "KQL: series_fill_linear(series[, "
                    "missing_value_placeholder[, fill_edges"
                    "[, constant_value]]])")
            arr = self._series_arg(args[0])
            if len(args) >= 2 and args[1].upper().strip() not in (
                    "NULL", "CAST(NULL AS DOUBLE)"):
                arr = (f"transform({arr}, __sfp_v -> CASE WHEN "
                       f"CAST(__sfp_v AS DOUBLE) <=> "
                       f"CAST({args[1]} AS DOUBLE) THEN NULL "
                       f"ELSE CAST(__sfp_v AS DOUBLE) END)")
            edge_const = args[3] if len(args) == 4 else "NULL"
            fill_edges = args[2] if len(args) >= 3 else "true"
            # lambda vars carry a __sfl_ prefix so they can never shadow
            # a user column referenced from the inlined array expression
            wi = (f"zip_with({arr}, sequence(1, size({arr})), "
                  f"(__sfl_v, __sfl_i) -> struct(CAST(__sfl_v AS DOUBLE) "
                  f"AS v, __sfl_i AS i))")
            nn = f"filter({wi}, __sfl_q -> __sfl_q.v IS NOT NULL)"
            prev = (f"try_element_at(filter({nn}, "
                    f"__sfl_p -> __sfl_p.i < __sfl_s.i), -1)")
            nxt = (f"try_element_at(filter({nn}, "
                   f"__sfl_p -> __sfl_p.i > __sfl_s.i), 1)")
            # empty-input guard: sequence(1, 0) DESCENDS (round-5
            # gotcha) and zip_with pads to the LONGER side, so an
            # empty series would yield 2 garbage elements
            edge = (f"CAST({edge_const} AS DOUBLE)"
                    if len(args) >= 3 else "__sfl_edge_anchor")
            near_p = (f"(CASE WHEN CAST({fill_edges} AS BOOLEAN) "
                      f"THEN {prev}.v ELSE {edge} END)"
                      if len(args) >= 3 else f"{prev}.v")
            near_n = (f"(CASE WHEN CAST({fill_edges} AS BOOLEAN) "
                      f"THEN {nxt}.v ELSE {edge} END)"
                      if len(args) >= 3 else f"{nxt}.v")
            return (
                f"(CASE WHEN size({arr}) <= 0 "
                f"THEN CAST(array() AS ARRAY<DOUBLE>) ELSE "
                f"transform({wi}, __sfl_s -> "
                f"CASE WHEN __sfl_s.v IS NOT NULL THEN __sfl_s.v "
                f"WHEN {prev} IS NULL AND {nxt} IS NULL THEN NULL "
                f"WHEN {prev} IS NULL THEN {near_n} "
                f"WHEN {nxt} IS NULL THEN {near_p} "
                f"ELSE {prev}.v + ({nxt}.v - {prev}.v) "
                f"* (__sfl_s.i - {prev}.i) / ({nxt}.i - {prev}.i) END) "
                f"END)")
        if fname == "series_outliers":
            # Tukey-fence anomaly score, full Kusto signature (r13
            # probe sweep): series_outliers(series [, kind [,
            # ignore_val [, min_percentile [, max_percentile]]]]).
            # kind (string LITERAL): 'ctukey' (DEFAULT, like Kusto) =
            # custom percentile range, default 10-90; 'tukey' = the
            # classic 25-75 quartiles. Score is 0 inside
            # [q_lo - 1.5·range, q_hi + 1.5·range], else signed
            # distance past the fence in range units. Percentiles use
            # the nearest-rank (ceil) method over the sorted non-null
            # values so the DuckDB oracle reproduces them bit-for-bit
            # (documented deviation: Kusto's own quantile estimator is
            # unpublished). Points equal to ignore_val are treated as
            # missing (excluded from the percentiles, scored null).
            if len(args) not in (1, 2, 3, 4, 5):
                raise ValueError(
                    "KQL: series_outliers(series[, kind[, ignore_val"
                    "[, min_percentile[, max_percentile]]]])")
            arr = self._series_arg(args[0])
            kind = "ctukey"
            if len(args) >= 2:
                km = re.fullmatch(r"\s*'((?:[^'\\]|\\.)*)'\s*", args[1])
                if not km or km.group(1) not in ("tukey", "ctukey"):
                    raise ValueError(
                        "KQL: series_outliers kind must be the "
                        "literal 'tukey' or 'ctukey'")
                kind = km.group(1)
            ign = args[2] if len(args) >= 3 else "NULL"
            if kind == "tukey":
                plo, phi = "0.25", "0.75"
                if len(args) > 3:
                    raise ValueError(
                        "KQL: series_outliers percentiles apply to "
                        "kind 'ctukey' only")
            else:
                plo = (f"(CAST({args[3]} AS DOUBLE) / 100.0)"
                       if len(args) >= 4 else "0.10")
                phi = (f"(CAST({args[4]} AS DOUBLE) / 100.0)"
                       if len(args) == 5 else "0.90")
            # __so_ lambda-var prefix: the series expression is inlined
            # INSIDE the outer lambda body, so plain names could shadow
            # the user's column
            miss = (f"(__so_x IS NULL OR ({ign}) IS NOT NULL "
                    f"AND __so_x <=> CAST({ign} AS DOUBLE))")
            srt = (f"array_sort(filter(transform({arr}, "
                   f"__so_x -> CAST(__so_x AS DOUBLE)), "
                   f"__so_x -> NOT {miss}))")
            q1 = (f"element_at({srt}, greatest(CAST(ceil("
                  f"size({srt}) * {plo}) AS INT), 1))")
            q3 = (f"element_at({srt}, greatest(CAST(ceil("
                  f"size({srt}) * {phi}) AS INT), 1))")
            iqr = f"({q3} - {q1})"
            hi = f"({q3} + 1.5 * {iqr})"
            lo = f"({q1} - 1.5 * {iqr})"
            vmiss = (f"(__so_v IS NULL OR ({ign}) IS NOT NULL "
                     f"AND CAST(__so_v AS DOUBLE) "
                     f"<=> CAST({ign} AS DOUBLE))")
            return (
                f"transform({arr}, __so_v -> "
                f"CASE WHEN {vmiss} THEN NULL "
                f"WHEN size({srt}) = 0 OR {iqr} <= 0 THEN 0.0 "
                f"WHEN CAST(__so_v AS DOUBLE) > {hi} "
                f"THEN (CAST(__so_v AS DOUBLE) - {hi}) / {iqr} "
                f"WHEN CAST(__so_v AS DOUBLE) < {lo} "
                f"THEN (CAST(__so_v AS DOUBLE) - {lo}) / {iqr} "
                f"ELSE 0.0 END)")
        if fname == "series_stdev":
            # population stdev of the non-null points (E[x²] − E[x]²)
            if len(args) != 1:
                raise ValueError("KQL: series_stdev(series) takes 1 arg")
            arr = self._series_arg(args[0])
            nn = (f"filter(transform({arr}, __sd_x -> "
                  f"CAST(__sd_x AS DOUBLE)), __sd_x -> "
                  f"__sd_x IS NOT NULL)")
            s1 = (f"aggregate({nn}, CAST(0 AS DOUBLE), "
                  f"(__sd_a, __sd_v) -> __sd_a + __sd_v)")
            s2 = (f"aggregate({nn}, CAST(0 AS DOUBLE), "
                  f"(__sd_a, __sd_v) -> __sd_a + __sd_v * __sd_v)")
            n = f"size({nn})"
            return (f"CASE WHEN {n} = 0 THEN NULL ELSE "
                    f"sqrt(greatest({s2} / {n} - ({s1} / {n}) "
                    f"* ({s1} / {n}), 0.0)) END")
        if fname == "series_seasonal":
            # zero-sum seasonal component with period p: per-phase mean
            # minus the overall mean (the seasonal part of a classic
            # additive decomposition; pair with series_fir for trend and
            # series_subtract for the residual). Pure higher-order SQL
            # over the in-row array — O(n²/p) in the calendar-bounded
            # series length, zero shuffles.
            if len(args) != 2:
                raise ValueError("KQL: series_seasonal(series, period)")
            arr, p = self._series_arg(args[0]), args[1]
            wi = (f"zip_with({arr}, sequence(1, size({arr})), "
                  f"(__ss_v, __ss_i) -> struct(CAST(__ss_v AS DOUBLE) "
                  f"AS v, __ss_i AS i))")
            phase = (f"filter({wi}, __ss_q -> "
                     f"pmod(__ss_q.i - 1, {p}) = pmod(__ss_s.i - 1, {p})"
                     f" AND __ss_q.v IS NOT NULL)")
            ph_mean = (f"(aggregate({phase}, CAST(0 AS DOUBLE), "
                       f"(__ss_a, __ss_e) -> __ss_a + __ss_e.v) "
                       f"/ size({phase}))")
            nn = (f"filter(transform({arr}, __ss_x -> "
                  f"CAST(__ss_x AS DOUBLE)), __ss_x -> "
                  f"__ss_x IS NOT NULL)")
            overall = (f"(aggregate({nn}, CAST(0 AS DOUBLE), "
                       f"(__ss_a, __ss_v) -> __ss_a + __ss_v) "
                       f"/ size({nn}))")
            # empty-input guard: see series_fill_linear — zip_with over
            # a descending sequence(1, 0) pads 2 garbage elements
            return (f"(CASE WHEN size({arr}) <= 0 "
                    f"THEN CAST(array() AS ARRAY<DOUBLE>) ELSE "
                    f"transform({wi}, __ss_s -> "
                    f"CASE WHEN __ss_s.v IS NULL THEN NULL "
                    f"WHEN size({phase}) = 0 THEN NULL "
                    f"ELSE {ph_mean} - {overall} END) END)")
        if fname == "series_pearson_correlation":
            # Pearson r over the pairwise-non-null points of two series
            # (population formula; null when either variance is 0)
            if len(args) != 2:
                raise ValueError(
                    "KQL: series_pearson_correlation(series1, series2)")
            a, b = self._series_arg(args[0]), self._series_arg(args[1])
            pairs = (f"filter(zip_with({a}, {b}, (__pc_x, __pc_y) -> "
                     f"struct(CAST(__pc_x AS DOUBLE) AS x, "
                     f"CAST(__pc_y AS DOUBLE) AS y)), "
                     f"__pc_p -> __pc_p.x IS NOT NULL "
                     f"AND __pc_p.y IS NOT NULL)")
            def fold(expr):
                return (f"aggregate({pairs}, CAST(0 AS DOUBLE), "
                        f"(__pc_a, __pc_e) -> __pc_a + {expr})")
            n = f"CAST(size({pairs}) AS DOUBLE)"
            sx, sy = fold("__pc_e.x"), fold("__pc_e.y")
            sxy = fold("__pc_e.x * __pc_e.y")
            sxx = fold("__pc_e.x * __pc_e.x")
            syy = fold("__pc_e.y * __pc_e.y")
            vx = f"({n} * {sxx} - {sx} * {sx})"
            vy = f"({n} * {syy} - {sy} * {sy})"
            return (f"CASE WHEN size({pairs}) = 0 OR {vx} <= 0 "
                    f"OR {vy} <= 0 THEN NULL "
                    f"ELSE ({n} * {sxy} - {sx} * {sy}) "
                    f"/ (sqrt({vx}) * sqrt({vy})) END")
        if fname in ("series_stats", "series_stats_dynamic"):
            # one-pass stats bag over the in-row series: min/min_idx/
            # max/max_idx/avg/variance/stdev (population, matching
            # series_stdev; 0-based indexes of the FIRST extreme).
            # The non-dynamic spelling is the same bag — Kusto's tuple
            # form is handled by extend's multi-assign. Optional
            # ignore_nonfinite (r13 probe sweep): true drops NaN/±Inf
            # points before the stats.
            if len(args) not in (1, 2):
                raise ValueError(
                    f"KQL: {fname}(series[, ignore_nonfinite])")
            arr = self._series_arg(args[0])
            if len(args) == 2:
                # non-finite -> null (not dropped) so min_idx/max_idx
                # keep referring to ORIGINAL series positions
                arr = (f"transform({arr}, __snf_x -> CASE WHEN "
                       f"CAST({args[1]} AS BOOLEAN) "
                       f"AND (isnan(CAST(__snf_x AS DOUBLE)) "
                       f"OR abs(CAST(__snf_x AS DOUBLE)) = "
                       f"CAST('Infinity' AS DOUBLE)) THEN NULL "
                       f"ELSE CAST(__snf_x AS DOUBLE) END)")
            nn = (f"filter(transform({arr}, __st_x -> "
                  f"CAST(__st_x AS DOUBLE)), "
                  f"__st_x -> __st_x IS NOT NULL)")
            wi = (f"zip_with({arr}, sequence(0, size({arr}) - 1), "
                  f"(__st_v, __st_i) -> struct("
                  f"CAST(__st_v AS DOUBLE) AS v, __st_i AS i))")

            def first_idx(m):
                return (f"try_element_at(filter({wi}, __st_p -> "
                        f"__st_p.v <=> {m}), 1).i")
            mn, mx = f"array_min({nn})", f"array_max({nn})"
            avg = self._render_call("series_avg", [arr])
            sd = self._render_call("series_stdev", [arr])
            obj = (f"named_struct("
                   f"'min', {mn}, 'min_idx', {first_idx(mn)}, "
                   f"'max', {mx}, 'max_idx', {first_idx(mx)}, "
                   f"'avg', {avg}, "
                   f"'variance', {sd} * {sd}, "
                   f"'stdev', {sd})")
            return f"parse_json(to_json({obj}))"
        if fname == "series_iir":
            # infinite-impulse-response filter: y[i] = (sum_j b[j]
            # x[i-j] - sum_{j>=1} a[j] y[i-j]) / a[0] — recursive, so
            # a numpy Arrow-batched kernel (the series_fir sibling;
            # a = [1] degenerates to FIR). Null/empty/zero-a0 -> null.
            if len(args) != 3:
                raise ValueError("KQL: series_iir(x, b, a)")
            x, b, a = (f"try_cast({v} AS ARRAY<DOUBLE>)" for v in args)
            return f"parse_json(to_json(__kql_iir({x}, {b}, {a})))"
        if fname == "series_fit_poly_dynamic":
            # least-squares polynomial fit (numpy Arrow-batched kernel,
            # same transport as series_fft): bag {rsquare, coefficients
            # (HIGHEST power first, numpy.polyfit order), variance,
            # rvariance, poly_fit}; optional x series and degree
            # (default 1); fewer than degree+1 valid points -> null
            if len(args) not in (1, 2, 3):
                raise ValueError(
                    "KQL: series_fit_poly(y [, x [, degree]])")
            y = f"try_cast({args[0]} AS ARRAY<DOUBLE>)"
            x = (f"try_cast({args[1]} AS ARRAY<DOUBLE>)"
                 if len(args) >= 2 else
                 "CAST(NULL AS ARRAY<DOUBLE>)")
            deg = (f"CAST({args[2]} AS INT)" if len(args) == 3
                   else "1")
            return (f"parse_json(to_json(__kql_fitpoly({y}, {x}, "
                    f"{deg})))")
        if fname == "series_fit_2lines":
            # bare name = the same exact pure-SQL enumeration as the
            # _dynamic form (the bag now carries variance/rvariance so
            # Kusto's tuple-assign order splits via _MULTI_ASSIGN)
            return self._render_call("series_fit_2lines_dynamic", args)
        if fname in ("series_fft_dynamic", "series_ifft_dynamic"):
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(x_real [, x_imag])")
            udf = ("__kql_fft" if fname.startswith("series_fft")
                   else "__kql_ifft")
            xr = f"try_cast({args[0]} AS ARRAY<DOUBLE>)"
            xi = (f"try_cast({args[1]} AS ARRAY<DOUBLE>)"
                  if len(args) == 2 else
                  f"transform({xr}, __ff_x -> CAST(0.0 AS DOUBLE))")
            return f"parse_json(to_json({udf}({xr}, {xi})))"
        if fname in ("series_dot_product", "series_cosine_similarity"):
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(series1, series2)")
            # JSON-lift (the series_magnitude pattern): VARIANT
            # dynamics — todynamic() strings, dynamic literals —
            # work alongside native make-series / float arrays
            a, b = (f"from_json(to_json({x}), 'array<double>', "
                    f"map('mode', 'PERMISSIVE'))" for x in args)

            def dot(x, y):
                return (f"aggregate(zip_with({x}, {y}, "
                        f"(__dp_x, __dp_y) -> CAST(__dp_x AS DOUBLE) "
                        f"* CAST(__dp_y AS DOUBLE)), CAST(0 AS DOUBLE), "
                        f"(__dp_a, __dp_v) -> __dp_a + __dp_v)")
            if fname == "series_dot_product":
                return dot(a, b)
            na, nb = dot(a, a), dot(b, b)
            return (f"(CASE WHEN {na} = 0 OR {nb} = 0 THEN NULL "
                    f"ELSE {dot(a, b)} / (sqrt({na}) * sqrt({nb})) END)")
        if fname == "series_magnitude":
            if len(args) != 1:
                raise ValueError("KQL: series_magnitude(series)")
            # JSON-lift so VARIANT dynamics (e.g. the empty-array
            # literal) work alongside native make-series arrays
            s = f"from_json(to_json({args[0]}), 'array<double>')"
            return (f"sqrt(aggregate(transform({s}, __sm_x -> "
                    f"CAST(__sm_x AS DOUBLE) * CAST(__sm_x AS DOUBLE)),"
                    f" CAST(0 AS DOUBLE), "
                    f"(__sm_a, __sm_v) -> __sm_a + __sm_v))")
        if fname == "isascii":
            if len(args) != 1:
                raise ValueError("KQL: isascii(s)")
            return (f"(CASE WHEN {args[0]} IS NULL THEN NULL ELSE "
                    f"{args[0]} RLIKE '^[\\\\x00-\\\\x7F]*$' END)")
        if fname == "base64_encode_fromarray":
            # inverse of base64_decode_toarray: byte-number array ->
            # base64 text (per-element hex render + binary concat fold)
            if len(args) != 1:
                raise ValueError("KQL: base64_encode_fromarray(arr)")
            # JSON round-trip lift: accepts native arrays AND dynamic
            # (VARIANT) values — base64_decode_toarray returns VARIANT
            arr = f"from_json(to_json({args[0]}), 'array<bigint>')"
            return (f"base64(aggregate({arr}, CAST('' AS BINARY), "
                    f"(__bf_a, __bf_b) -> concat(__bf_a, "
                    f"unhex(lpad(hex(pmod(__bf_b, 256)), 2, '0')))))")
        if fname in ("series_abs", "series_exp", "series_log",
                     "series_sign", "series_sqrt", "series_floor",
                     "series_ceiling", "series_sin", "series_cos",
                     "series_tan", "series_asin", "series_acos",
                     "series_atan"):
            # elementwise unary transforms over the in-row series
            # (trig family added in r11 — same Spark builtin names)
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(series) takes 1 arg")
            fn = fname.removeprefix("series_")
            return (f"transform({self._series_arg(args[0])}, __su_v -> "
                    f"CAST({fn}(CAST(__su_v AS DOUBLE)) AS DOUBLE))")
        if fname in ("series_equals", "series_not_equals",
                     "series_greater", "series_greater_equals",
                     "series_less", "series_less_equals"):
            # pairwise comparison series -> boolean array (Kusto
            # returns a dynamic array of bool; null elements compare
            # to null, like the scalar operators)
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(series1, series2)")
            op_sym = {"series_equals": "=", "series_not_equals": "!=",
                      "series_greater": ">",
                      "series_greater_equals": ">=",
                      "series_less": "<",
                      "series_less_equals": "<="}[fname]
            return (f"zip_with({self._series_arg(args[0])}, "
                    f"{self._series_arg(args[1])}, "
                    f"(__sc_x, __sc_y) -> CAST(__sc_x AS DOUBLE) "
                    f"{op_sym} CAST(__sc_y AS DOUBLE))")
        if fname in ("series_add", "series_subtract", "series_multiply",
                     "series_divide", "series_pow"):
            # element-wise arithmetic over two parallel series
            # (zip_with, codegen); divide-by-zero yields null (Kusto
            # real null). Either operand may be a NUMERIC SCALAR
            # (Kusto broadcasts it across the other series — r13
            # probe sweep); an unresolvable operand type is assumed
            # to be a series, the historic behavior.
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(series1, series2)")

            def is_scalar(raw: str) -> bool:
                dt = self._probe_dtype(raw)
                return dt is not None and dt.typeName() in (
                    "long", "integer", "short", "byte", "double",
                    "float", "decimal")
            ops = {"series_add": "({x} + {y})",
                   "series_subtract": "({x} - {y})",
                   "series_multiply": "({x} * {y})",
                   "series_pow": "pow({x}, {y})",
                   "series_divide": ("CASE WHEN {y} = 0.0 THEN NULL "
                                     "ELSE {x} / {y} END")}[fname]
            a_sc, b_sc = is_scalar(args[0]), is_scalar(args[1])
            if a_sc and b_sc:
                raise ValueError(
                    f"KQL: {fname} needs at least one series operand")
            if b_sc:
                body = ops.format(x="CAST(__sb_v AS DOUBLE)",
                                  y=f"CAST({args[1]} AS DOUBLE)")
                return (f"transform({self._series_arg(args[0])}, "
                        f"__sb_v -> {body})")
            if a_sc:
                body = ops.format(x=f"CAST({args[0]} AS DOUBLE)",
                                  y="CAST(__sb_v AS DOUBLE)")
                return (f"transform({self._series_arg(args[1])}, "
                        f"__sb_v -> {body})")
            a, b = self._series_arg(args[0]), self._series_arg(args[1])
            body = ops.format(x="CAST(x AS DOUBLE)",
                              y="CAST(y AS DOUBLE)")
            return f"zip_with({a}, {b}, (x, y) -> {body})"
        if fname in ("series_fit_line_dynamic",
                     "series_decompose_forecast"):
            # Shared least-squares machinery over the in-row series
            # (x = 0-based index, non-null points only): pure
            # higher-order SQL folds, zero shuffles — the in-row twin
            # of regr_slope/regr_intercept. __fl_ lambda-var prefix so
            # inlined series expressions can't be shadowed.
            arr = self._series_arg(args[0])
            wi = (f"zip_with({arr}, sequence(0, size({arr}) - 1), "
                  f"(__fl_v, __fl_i) -> struct("
                  f"CAST(__fl_v AS DOUBLE) AS v, "
                  f"CAST(__fl_i AS DOUBLE) AS i))")
            pairs = f"filter({wi}, __fl_p -> __fl_p.v IS NOT NULL)"

            def fold(expr):
                return (f"aggregate({pairs}, CAST(0 AS DOUBLE), "
                        f"(__fl_a, __fl_e) -> __fl_a + {expr})")
            n = f"CAST(size({pairs}) AS DOUBLE)"
            sx, sy = fold("__fl_e.i"), fold("__fl_e.v")
            sxx, sxy = fold("__fl_e.i * __fl_e.i"), \
                fold("__fl_e.i * __fl_e.v")
            syy = fold("__fl_e.v * __fl_e.v")
            den = f"({n} * {sxx} - {sx} * {sx})"
            slope = (f"(CASE WHEN {n} < 2 OR {den} = 0 THEN NULL "
                     f"ELSE ({n} * {sxy} - {sx} * {sy}) / {den} END)")
            icept = f"(({sy} - {slope} * {sx}) / {n})"
            if fname == "series_fit_line_dynamic":
                # Kusto series_fit_line_dynamic: a dynamic bag
                # {rsquare, slope, variance, rvariance, interception,
                # line_fit}. Population variance convention (documented
                # deviation: Kusto does not publish its estimator);
                # degenerate series (n<2 or zero x-variance) yield null
                # slope/interception.
                if len(args) != 1:
                    raise ValueError(
                        "KQL: series_fit_line_dynamic(series)")
                sstot = f"({syy} - {sy} * {sy} / {n})"
                ssres = fold(
                    f"(__fl_e.v - ({icept} + {slope} * __fl_e.i)) "
                    f"* (__fl_e.v - ({icept} + {slope} * __fl_e.i))")
                rsq = (f"(CASE WHEN {sstot} <= 0 THEN 1.0 "
                       f"ELSE 1.0 - {ssres} / {sstot} END)")
                line = (f"transform(sequence(0, size({arr}) - 1), "
                        f"__fl_j -> {icept} + {slope} * "
                        f"CAST(__fl_j AS DOUBLE))")
                obj = (f"named_struct("
                       f"'rsquare', {rsq}, "
                       f"'slope', {slope}, "
                       f"'variance', {sstot} / {n}, "
                       f"'rvariance', {ssres} / {n}, "
                       f"'interception', {icept}, "
                       f"'line_fit', {line})")
                # zero-point guard: with no non-null points the moment
                # divisions hit ANSI DIVIDE_BY_ZERO (r12 registry
                # property find) — Kusto yields null for the whole bag
                return (f"(CASE WHEN {n} = 0 THEN NULL "
                        f"ELSE parse_json(to_json({obj})) END)")
            # series_decompose_forecast(series, points[, period
            # [, trend[, seasonality_threshold]]]): linear-trend
            # forecast extended `points` past the observed range; with
            # a seasonality period the zero-sum per-phase mean
            # component (series_seasonal's convention) is added
            # periodically. Kusto's default trend IS 'linefit' — this
            # engine's default matches; 'avg' and 'none' select the
            # overall mean / zero trend (r13 probe sweep). Period -1
            # auto-detects like series_decompose. Documented subset:
            # seasonal = periodic phase means — exactly oracle-able,
            # unlike the reference's unpublished STL variant.
            if len(args) not in (2, 3, 4, 5):
                raise ValueError(
                    "KQL: series_decompose_forecast(series, points"
                    "[, period[, trend[, seasonality_threshold]]]])")
            pts = args[1]
            if len(args) >= 4:
                tm = re.fullmatch(r"\s*'((?:[^'\\]|\\.)*)'\s*",
                                  args[3])
                if not tm or tm.group(1) not in ("avg", "linefit",
                                                 "none"):
                    raise ValueError(
                        "KQL: forecast trend must be the literal "
                        "'avg', 'linefit' or 'none'")
                if tm.group(1) == "avg":
                    slope, icept = "0.0", f"({sy} / {n})"
                elif tm.group(1) == "none":
                    slope, icept = "0.0", "0.0"
            total = f"(size({arr}) + CAST({pts} AS INT))"
            trend = f"({icept} + {slope} * CAST(__df_i AS DOUBLE))"
            if len(args) >= 3 and args[2].strip() not in ("0", "(0)"):
                p = self._decompose_period_sql(
                    args[0], args[2],
                    args[4] if len(args) == 5 else "0.7")
                p = f"greatest(({p}), 1)"
                phase = (f"filter({pairs}, __df_q -> "
                         f"pmod(CAST(__df_q.i AS INT), {p}) "
                         f"= pmod(__df_i, {p}))")
                ph_sum = (f"aggregate({phase}, CAST(0 AS DOUBLE), "
                          f"(__df_a, __df_e) -> __df_a + __df_e.v)")
                seas = (f"(CASE WHEN size({phase}) = 0 THEN 0.0 "
                        f"ELSE {ph_sum} / size({phase}) "
                        f"- {sy} / {n} END)")
            else:
                seas = "0.0"
            # sequence(0, k) DESCENDS for k < 0 (Spark gotcha) — empty
            # series + zero points must yield an empty array instead
            return (f"(CASE WHEN {total} < 1 THEN array() "
                    f"ELSE transform(sequence(0, {total} - 1), "
                    f"__df_i -> {trend} + {seas}) END)")
        if fname == "series_decompose":
            # expression position: the bag form (the tuple-assign form
            # is handled by extend's multi-assign)
            return self._render_call("series_decompose_dynamic", args)
        if fname == "series_decompose_dynamic":
            # Full additive decomposition bag over the in-row series:
            # seasonal (zero-sum periodic phase means), trend, baseline
            # = seasonal + trend, residual = series - baseline — the
            # same composition the anomalies entry verifies piecewise,
            # bundled Kusto-style. Full signature (r13 probe sweep):
            # series_decompose(series[, period[, trend[, test_points
            # [, seasonality_threshold]]]]) — period -1 auto-detects
            # via the ACF peak-picker (accepted when its score clears
            # seasonality_threshold, default 0.7; else no seasonal),
            # period 0 disables the seasonal component; trend is the
            # string LITERAL 'avg' (overall mean), 'linefit'
            # (least-squares line) or 'none'. (Documented deviation:
            # Kusto's own trend default is lowess; this engine's
            # OMITTED-trend default is the trailing FIR of the period
            # width — the pre-r13 contract the banked oracles pin.
            # test_points is accepted at its default 0 only.)
            if len(args) not in (1, 2, 3, 4, 5):
                raise ValueError(
                    "KQL: series_decompose(series[, period[, trend"
                    "[, test_points[, seasonality_threshold]]]])")
            arr = args[0]
            per_arg = args[1] if len(args) >= 2 else "7"
            thr = args[4] if len(args) == 5 else "0.7"
            tp = 0
            if len(args) >= 4:
                tpm = re.fullmatch(r"[\s()]*(\d+)[\s()]*", args[3])
                if not tpm:
                    raise ValueError(
                        "KQL: series_decompose test_points must be a "
                        "non-negative integer literal")
                tp = int(tpm.group(1))
            # bind the resolved period ONCE (__dp0 hop): the
            # auto-detect expression embeds the whole ACF machinery,
            # and the period is spliced into every component's lambdas
            # — textual composition would explode the Catalyst tree
            # (same OOM class as the anomalies bind, below)
            per = "__dp0.p"
            if tp == 0:
                per_sql = self._decompose_period_sql(arr, per_arg,
                                                     thr)
                trend = self._decompose_trend_sql(
                    arr, per, args[2] if len(args) >= 3 else None)
                seasonal = self._decompose_seasonal_sql(arr, per)
            else:
                # test_points > 0 (r14 — documented non-fix through
                # r13): the LAST tp points are excluded from learning
                # (Kusto's validation holdout) — period auto-detect,
                # trend fit, and seasonal phase means all run on the
                # training prefix, then evaluate over the FULL length
                # (trend extrapolates by index; the zero-sum phase
                # means repeat periodically). The engine's
                # trailing-FIR default trend has no separable
                # learning window, so an explicit trend literal is
                # required. Scalars and the train-length seasonal
                # array are bound ONCE via struct hops (the r9/r13
                # per-element-recompute lesson).
                # test_points is positionally AFTER trend, so an
                # explicit trend literal is always present here (the
                # engine's trailing-FIR default — which has no
                # separable learning window — is unreachable with a
                # holdout, by construction)
                mode = args[2]
                tm = re.fullmatch(r"\s*'((?:[^'\\]|\\.)*)'\s*", mode)
                if not tm or tm.group(1) not in ("avg", "linefit",
                                                 "none"):
                    raise ValueError(
                        "KQL: decompose trend must be the literal "
                        "'avg', 'linefit' or 'none'")
                kind = tm.group(1)
                a_full = self._series_arg(arr)
                train = (f"slice({a_full}, 1, "
                         f"greatest(size({a_full}) - {tp}, 0))")
                per_sql = self._decompose_period_sql(train, per_arg,
                                                     thr)
                if kind == "none":
                    trend = (f"transform({a_full}, "
                             f"__dtp_v -> CAST(0 AS DOUBLE))")
                elif kind == "avg":
                    nn = (f"filter({train}, "
                          f"__dtp_x -> __dtp_x IS NOT NULL)")
                    mean = (f"(CASE WHEN size({nn}) = 0 THEN NULL "
                            f"ELSE aggregate({nn}, "
                            f"CAST(0 AS DOUBLE), (__dtp_s, __dtp_v) "
                            f"-> __dtp_s + __dtp_v) / size({nn}) "
                            f"END)")
                    trend = (f"element_at(transform(array("
                             f"named_struct('mu', {mean})), __dtp_b "
                             f"-> transform({a_full}, "
                             f"__dtp_v -> __dtp_b.mu)), 1)")
                else:  # linefit
                    fit = self._render_call(
                        "series_fit_line_dynamic", [train])
                    slope = (f"try_cast(variant_get({fit}, "
                             f"'$.slope') AS DOUBLE)")
                    icept = (f"try_cast(variant_get({fit}, "
                             f"'$.interception') AS DOUBLE)")
                    trend = (
                        f"(CASE WHEN size({a_full}) = 0 THEN "
                        f"CAST(array() AS ARRAY<DOUBLE>) ELSE "
                        f"element_at(transform(array(named_struct("
                        f"'sl', {slope}, 'ic', {icept})), __dtp_b -> "
                        f"zip_with({a_full}, sequence(0, "
                        f"greatest(size({a_full}) - 1, 0)), "
                        f"(__dtp_v, __dtp_i) -> __dtp_b.ic + "
                        f"__dtp_b.sl * CAST(__dtp_i AS DOUBLE))), 1) "
                        f"END)")
                seas_train = self._decompose_seasonal_sql(train, per)
                seasonal = (
                    f"(CASE WHEN size({a_full}) = 0 THEN "
                    f"CAST(array() AS ARRAY<DOUBLE>) ELSE "
                    f"element_at(transform(array(named_struct("
                    f"'se', {seas_train})), __dtp_b -> "
                    f"zip_with({a_full}, sequence(0, "
                    f"greatest(size({a_full}) - 1, 0)), "
                    f"(__dtp_v, __dtp_i) -> CASE WHEN ({per}) <= 0 "
                    f"THEN CAST(0 AS DOUBLE) ELSE "
                    f"coalesce(try_element_at(__dtp_b.se, "
                    f"pmod(__dtp_i, ({per})) + 1), "
                    f"CAST(0 AS DOUBLE)) END)), 1) END)")
            baseline = self._render_call("series_add",
                                         [seasonal, trend])
            resid = self._render_call("series_subtract",
                                      [arr, baseline])
            obj = (f"named_struct('baseline', {baseline}, "
                   f"'seasonal', {seasonal}, 'trend', {trend}, "
                   f"'residual', {resid})")
            nested = (f"element_at(transform(array(named_struct("
                      f"'p', CAST({per_sql} AS INT))), "
                      f"__dp0 -> {obj}), 1)")
            return f"parse_json(to_json({nested}))"
        if fname == "series_decompose_anomalies":
            return self._render_call(
                "series_decompose_anomalies_dynamic", args)
        if fname == "series_decompose_anomalies_dynamic":
            # Kusto's canonical anomaly pipeline bundled by name: the
            # exact composition the q_kql_series_anomalies entry
            # verifies piecewise — decompose (zero-sum seasonal +
            # trend), Tukey-fence scores on the residual, flags at
            # +/-threshold (default 1.5). Full signature (r13 probe
            # sweep): series_decompose_anomalies(series[, threshold
            # [, period[, trend[, test_points[, ad_method
            # [, seasonality_threshold]]]]]]) — period -1/0 and the
            # trend literals behave as in series_decompose (omitted
            # trend keeps the engine's FIR default the banked oracles
            # pin); ad_method is series_outliers' kind ('ctukey'
            # default, like Kusto). Returns the Kusto-shaped bag
            # {ad_flag, ad_score, baseline}; tuple-assign order via
            # _MULTI_ASSIGN.
            if len(args) not in (1, 2, 3, 4, 5, 6, 7):
                raise ValueError(
                    "KQL: series_decompose_anomalies(series[, "
                    "threshold[, period[, trend[, test_points[, "
                    "ad_method[, seasonality_threshold]]]]]])")
            arr = args[0]
            thr = args[1] if len(args) >= 2 else "1.5"
            per = args[2] if len(args) >= 3 else "7"
            if len(args) >= 5 and args[4].strip() not in ("0", "(0)"):
                raise ValueError(
                    "KQL: series_decompose_anomalies test_points is "
                    "supported at its default 0 only")
            sthr = args[6] if len(args) == 7 else "0.7"
            per_sql = self._decompose_period_sql(arr, per, sthr)
            per = "__dp0.p"  # bound once in the outermost hop below
            trend = self._decompose_trend_sql(
                arr, per, args[3] if len(args) >= 4 else None)
            seasonal = self._decompose_seasonal_sql(arr, per)
            baseline = self._render_call("series_add",
                                         [seasonal, trend])
            # bind-once struct hops: series_outliers splices its input
            # ~10x textually — composing it directly over resid (which
            # itself contains baseline/trend) multiplies the expression
            # tree into a Catalyst OOM for the heavier trend modes
            # (measured with 'linefit'). Each big component is bound
            # exactly once; the single-element transform evaluates its
            # body once (the established bind-once idiom).
            resid = self._render_call("series_subtract",
                                      [arr, "__an1.b"])
            score = self._render_call(
                "series_outliers",
                ["__an2.r"] + ([args[5]] if len(args) >= 6 else []))
            flag = (f"transform(__an3.sc, __sda_s -> "
                    f"CASE WHEN __sda_s IS NULL THEN NULL "
                    f"WHEN __sda_s > ({thr}) THEN 1 "
                    f"WHEN __sda_s < -({thr}) THEN -1 "
                    f"ELSE 0 END)")
            obj = (f"named_struct('ad_flag', {flag}, "
                   f"'ad_score', __an3.sc, 'baseline', __an1.b)")
            nested = (
                f"element_at(transform(array(named_struct("
                f"'p', CAST({per_sql} AS INT))), __dp0 -> "
                f"element_at(transform(array(named_struct("
                f"'b', {baseline})), __an1 -> "
                f"element_at(transform(array(named_struct("
                f"'r', {resid})), __an2 -> "
                f"element_at(transform(array(named_struct("
                f"'sc', {score})), __an3 -> {obj}), 1)), 1)), 1)), 1)")
            return f"parse_json(to_json({nested}))"
        if fname == "series_periods_detect":
            return self._render_call("series_periods_detect_dynamic",
                                     args)
        if fname in ("series_periods_validate",
                     "series_periods_validate_dynamic"):
            # scores for CALLER-SUPPLIED candidate periods: the same
            # biased mean-centered ACF as series_periods_detect, no
            # peak search — {periods: [given...], scores: [...]}
            if len(args) < 2:
                raise ValueError(
                    "KQL: series_periods_validate(series, p1, ...)")
            arr = args[0]
            acf = self._acf_sql(arr)
            plist = ", ".join(f"CAST(floor({p}) AS INT)"
                              for p in args[1:])
            obj = (f"named_struct("
                   f"'periods', array({', '.join('CAST(' + p + ' AS DOUBLE)' for p in args[1:])}), "
                   f"'scores', transform(array({plist}), "
                   f"__spd_p -> {acf}))")
            return f"parse_json(to_json({obj}))"
        if fname == "series_periods_detect_dynamic":
            # Period detection over the in-row series (completes the
            # series_decompose family — the seasonality argument no
            # longer has to be caller-supplied): mean-centered
            # autocorrelation at every integer lag in [min_period,
            # max_period], kept only at LOCAL MAXIMA of the ACF curve
            # (acf[p] > acf[p-1] and >= acf[p+1] — a plateau of
            # near-equal neighbors like lags 11/12/13 around a true
            # period 12 yields one peak, not three), ranked by score
            # desc (ties -> smaller period), top num_periods returned
            # as the Kusto-shaped bag {periods: [..], scores: [..]}
            # with periods as doubles. Documented deviation: Kusto's
            # own detector is unpublished; this engine's contract is
            # the classic ACF peak-picker. Pure higher-order SQL —
            # O(n * max_period) folds per row, zero shuffles, zero
            # Python. Nulls in the series null the result (run a
            # series_fill_* first; make-series grids are filled).
            if len(args) != 4:
                raise ValueError(
                    "KQL: series_periods_detect(series, min_period, "
                    "max_period, num_periods)")
            arr, minp, maxp, nump = args
            xs = f"transform({arr}, __spd_x -> CAST(__spd_x AS DOUBLE))"
            n = f"size({xs})"
            acf = self._acf_sql(arr)
            mi = f"greatest(CAST(floor({minp}) AS INT), 1)"
            hi = f"least(CAST(floor({maxp}) AS INT), {n} - 2)"
            # scored lags over the EXTENDED range [mi-1, hi+1] so the
            # local-max test can see both neighbors of every candidate
            ps = (f"(CASE WHEN {hi} + 1 >= {mi} - 1 THEN "
                  f"transform(sequence({mi} - 1, {hi} + 1), "
                  f"__spd_p -> named_struct('p', __spd_p, 's', {acf})) "
                  f"ELSE CAST(array() AS "
                  f"ARRAY<STRUCT<p: INT, s: DOUBLE>>) END)")
            cand = (f"filter(transform("
                    f"CASE WHEN size({ps}) >= 3 THEN "
                    f"sequence(2, size({ps}) - 1) "
                    f"ELSE CAST(array() AS ARRAY<INT>) END, "
                    f"__spd_i -> named_struct("
                    f"'period', element_at({ps}, __spd_i).p, "
                    f"'score', element_at({ps}, __spd_i).s, "
                    f"'prv', element_at({ps}, __spd_i - 1).s, "
                    f"'nxt', element_at({ps}, __spd_i + 1).s)), "
                    f"__spd_c -> __spd_c.score IS NOT NULL "
                    f"AND (__spd_c.prv IS NULL "
                    f"OR __spd_c.score > __spd_c.prv) "
                    f"AND (__spd_c.nxt IS NULL "
                    f"OR __spd_c.score >= __spd_c.nxt))")
            top = (f"slice(array_sort({cand}, (__spd_l, __spd_r) -> "
                   f"CASE WHEN __spd_l.score > __spd_r.score THEN -1 "
                   f"WHEN __spd_l.score < __spd_r.score THEN 1 "
                   f"WHEN __spd_l.period < __spd_r.period THEN -1 "
                   f"WHEN __spd_l.period > __spd_r.period THEN 1 "
                   f"ELSE 0 END), 1, "
                   f"greatest(CAST({nump} AS INT), 0))")
            obj = (f"named_struct("
                   f"'periods', transform({top}, "
                   f"__spd_t -> CAST(__spd_t.period AS DOUBLE)), "
                   f"'scores', transform({top}, "
                   f"__spd_t -> __spd_t.score))")
            return f"parse_json(to_json({obj}))"
        if fname == "series_fit_2lines_dynamic":
            # Best two-segment piecewise-linear fit: for every split k
            # the two sides get closed-form least squares; the split
            # with minimal total SSE wins (ties -> smallest k). Exact
            # enumeration over the in-row array — O(n²) folds in the
            # calendar-bounded series length, zero shuffles, zero
            # Python. Returns the Kusto-shaped dynamic bag
            # {rsquare, split_idx, line_fit, left:{slope,interception},
            # right:{slope,interception}}. The split index is spliced
            # in via the __F2SPLIT__ placeholder so the same side
            # algebra serves both the enumeration lambda and the
            # winning-split projection.
            if len(args) != 1:
                raise ValueError("KQL: series_fit_2lines_dynamic(series)")
            arr = args[0]
            wi = (f"zip_with({arr}, sequence(0, size({arr}) - 1), "
                  f"(__f2_v, __f2_i) -> struct("
                  f"CAST(__f2_v AS DOUBLE) AS v, "
                  f"CAST(__f2_i AS DOUBLE) AS i))")
            pairs = f"filter({wi}, __f2_p -> __f2_p.v IS NOT NULL)"

            def side(cond):
                S = f"filter({pairs}, __f2_q -> {cond})"

                def fold(e):
                    return (f"aggregate({S}, CAST(0 AS DOUBLE), "
                            f"(__f2_a, __f2_e) -> __f2_a + {e})")
                n = f"CAST(size({S}) AS DOUBLE)"
                sx, sy = fold("__f2_e.i"), fold("__f2_e.v")
                sxx = fold("__f2_e.i * __f2_e.i")
                sxy = fold("__f2_e.i * __f2_e.v")
                syy = fold("__f2_e.v * __f2_e.v")
                den = f"({n} * {sxx} - {sx} * {sx})"
                sl = (f"(CASE WHEN {n} < 2 OR {den} = 0 THEN 0.0 ELSE "
                      f"({n} * {sxy} - {sx} * {sy}) / {den} END)")
                ic = (f"(CASE WHEN {n} = 0 THEN 0.0 ELSE "
                      f"({sy} - {sl} * {sx}) / {n} END)")
                # SSE expanded algebraically (one pass, no re-fold on
                # the fitted values)
                sse = (f"({syy} - 2 * {sl} * {sxy} - 2 * {ic} * {sy} "
                       f"+ {sl} * {sl} * {sxx} "
                       f"+ 2 * {sl} * {ic} * {sx} + {n} * {ic} * {ic})")
                return sl, ic, sse

            lsl, lic, lsse = side("__f2_q.i < __F2SPLIT__")
            rsl, ric, rsse = side("__f2_q.i >= __F2SPLIT__")
            sse_tot = f"({lsse} + {rsse})".replace("__F2SPLIT__",
                                                   "__f2_k")
            cands = (f"transform(transform(sequence(1, size({arr}) - 1),"
                     f" __f2_ki -> CAST(__f2_ki AS DOUBLE)), "
                     f"__f2_k -> named_struct('k', __f2_k, "
                     f"'sse', {sse_tot}))")
            best = (f"aggregate({cands}, "
                    f"named_struct('k', CAST(-1 AS DOUBLE), "
                    f"'sse', CAST('Infinity' AS DOUBLE)), "
                    f"(__f2_bacc, __f2_c) -> CASE WHEN __f2_c.sse "
                    f"< __f2_bacc.sse THEN __f2_c ELSE __f2_bacc END)")

            def fold_all(e):
                return (f"aggregate({pairs}, CAST(0 AS DOUBLE), "
                        f"(__f2_a, __f2_e) -> __f2_a + {e})")
            nn = f"CAST(size({pairs}) AS DOUBLE)"
            syall = fold_all("__f2_e.v")
            syyall = fold_all("__f2_e.v * __f2_e.v")
            sstot = f"({syyall} - {syall} * {syall} / {nn})"
            line = (f"transform({wi}, __f2_s -> CASE "
                    f"WHEN __f2_s.i < __F2SPLIT__ "
                    f"THEN {lsl} * __f2_s.i + {lic} "
                    f"ELSE {rsl} * __f2_s.i + {ric} END)")
            # reference `best` exactly ONCE: project the final bag
            # inside a transform over a single-element array, with the
            # winning split bound to __f2_bb.k
            final = (f"named_struct("
                     f"'rsquare', CASE WHEN {sstot} <= 0 THEN 1.0 "
                     f"ELSE 1.0 - __f2_bb.sse / {sstot} END, "
                     f"'split_idx', CAST(__f2_bb.k AS INT), "
                     # variance/rvariance (population forms, like
                     # fit_line) complete Kusto's documented field set
                     # so the bare-name tuple assignment can split
                     f"'variance', (CASE WHEN {nn} = 0 THEN 0.0 "
                     f"ELSE {sstot} / {nn} END), "
                     f"'rvariance', (CASE WHEN {nn} = 0 THEN 0.0 "
                     f"ELSE __f2_bb.sse / {nn} END), "
                     f"'left', named_struct('slope', {lsl}, "
                     f"'interception', {lic}), "
                     f"'right', named_struct('slope', {rsl}, "
                     f"'interception', {ric}), "
                     f"'line_fit', {line})").replace("__F2SPLIT__",
                                                     "__f2_bb.k")
            out = (f"element_at(transform(array({best}), "
                   f"__f2_bb -> {final}), 1)")
            return f"parse_json(to_json({out}))"
        if fname in ("startofday", "startofweek", "startofmonth",
                     "startofyear", "startofquarter"):
            # optional Kusto offset: the start of the period `offset`
            # periods away (expression-valued via make_interval)
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(ts [, offset])")
            if fname == "startofweek":
                # Kusto weeks start SUNDAY; Spark's WEEK truncation is
                # Monday-based. Shift by one day around the truncation.
                base = (f"(date_trunc('WEEK', {args[0]} + INTERVAL 1 "
                        f"DAY) - INTERVAL 1 DAY)")
            else:
                unit = {"startofday": "DAY", "startofmonth": "MONTH",
                        "startofyear": "YEAR",
                        "startofquarter": "QUARTER"}[fname]
                base = f"date_trunc('{unit}', {args[0]})"
            if len(args) == 1:
                return base
            n = f"CAST({args[1]} AS INT)"
            shift = {
                "startofday": f"make_interval(0, 0, 0, {n})",
                "startofweek": f"make_interval(0, 0, {n})",
                "startofmonth": f"make_interval(0, {n})",
                "startofquarter": f"make_interval(0, 3 * {n})",
                "startofyear": f"make_interval({n})"}[fname]
            return f"({base} + {shift})"
        if fname in ("extractjson", "extract_json"):
            # extractjson(jsonPath, text) -> get_json_object;
            # extract_json is Kusto's documented alias
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(jsonPath, text)")
            return f"get_json_object({args[1]}, {args[0]})"
        if fname == "bag_has_key":
            # top-level (or JSONPath '$.a.b') key membership on a
            # dynamic bag; rides the same JSON round-trip as bag_keys
            if len(args) != 2:
                raise ValueError("KQL: bag_has_key(bag, key)")
            bag, key = args
            # JSONPath form when the key LITERAL starts with '$.'
            m = re.fullmatch(r"\s*'(\$\.[^']*)'\s*", key or "")
            if m:
                return (f"(get_json_object(to_json({bag}), "
                        f"'{m.group(1)}') IS NOT NULL "
                        f"OR array_contains(json_object_keys("
                        f"get_json_object(to_json({bag}), "
                        f"'{m.group(1)[:m.group(1).rfind('.')] or '$'}')"
                        f"), '{m.group(1).split('.')[-1]}'))")
            return (f"array_contains(json_object_keys(to_json({bag})), "
                    f"CAST({key} AS STRING))")
        if fname == "arg_max":
            if len(args) != 2:
                raise ValueError("KQL: arg_max(rank_expr, return_expr)")
            return f"max_by({args[1]}, {args[0]})"
        if fname == "arg_min":
            if len(args) != 2:
                raise ValueError("KQL: arg_min(rank_expr, return_expr)")
            return f"min_by({args[1]}, {args[0]})"
        if fname == "case":
            if len(args) < 3 or len(args) % 2 == 0:
                raise ValueError(
                    "KQL: case(pred1, val1, ..., default) needs an odd "
                    "number of args >= 3")
            whens = "".join(
                f" WHEN {args[i]} THEN {args[i + 1]}"
                for i in range(0, len(args) - 1, 2))
            return f"(CASE{whens} ELSE {args[-1]} END)"
        if fname in ("isempty", "isnotempty"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(x) takes 1 arg")
            neg = "NOT " if fname == "isnotempty" else ""
            return (f"({neg}(({args[0]}) IS NULL "
                    f"OR CAST({args[0]} AS STRING) = ''))")
        if fname in ("trim", "trim_start", "trim_end"):
            # Kusto signature: trim(regex, text) — strip a REGEX match
            # from the edges (trim(' +', s) etc.), not a charset
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(regex, text)")
            rx = args[0]
            # Kusto strips ALL leading/trailing matches, not one —
            # wrap the user regex in a repetition group
            pats = {"trim": f"concat('^(', {rx}, ')+|(', {rx}, ')+$')",
                    "trim_start": f"concat('^(', {rx}, ')+')",
                    "trim_end": f"concat('(', {rx}, ')+$')"}
            return f"regexp_replace({args[1]}, {pats[fname]}, '')"
        if fname == "replace_string":
            if len(args) != 3:
                raise ValueError("KQL: replace_string(text, lookup, rewrite)")
            return f"replace({args[0]}, {args[1]}, {args[2]})"
        if fname == "replace_regex":
            if len(args) != 3:
                raise ValueError("KQL: replace_regex(text, regex, rewrite)")
            return f"regexp_replace({args[0]}, {args[1]}, {args[2]})"
        if fname == "replace_strings":
            # replace_strings(text, lookups, rewrites): sequential
            # literal replacement driven by two parallel dynamic
            # arrays (a lambda-fold — each rewrite sees the previous
            # step's output, Kusto's documented order). Mismatched
            # array lengths yield null, matching Kusto's error-free
            # null convention for invalid dynamic args.
            if len(args) != 3:
                raise ValueError(
                    "KQL: replace_strings(text, lookups, rewrites)")
            lk = f"from_json(to_json({args[1]}), 'array<string>')"
            rw = f"from_json(to_json({args[2]}), 'array<string>')"
            pairs = (f"zip_with({lk}, {rw}, (__rs_l, __rs_r) -> "
                     f"named_struct('l', __rs_l, 'r', __rs_r))")
            fold = (f"aggregate({pairs}, CAST({args[0]} AS STRING), "
                    f"(__rs_a, __rs_p) -> replace(__rs_a, __rs_p.l, "
                    f"coalesce(__rs_p.r, '')))")
            return (f"(CASE WHEN size({lk}) = size({rw}) "
                    f"THEN {fold} ELSE NULL END)")
        if fname in ("parse_json", "todynamic"):
            # Kusto dynamic == Spark 4 VARIANT: binary-encoded
            # semi-structured values, predicate/path evaluation without
            # re-parsing JSON text per access
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(text) takes 1 arg")
            # Kusto's parse_json NEVER errors: invalid JSON (incl.
            # the empty string) yields the input itself as a dynamic
            # string. try_parse_json covers the happy path; the
            # fallback lifts the raw string to VARIANT via the
            # named_struct hop (a bare string can't CAST to VARIANT).
            # NULL stays NULL (to_json drops the null field -> '{}'
            # -> variant_get returns null).
            s = f"CAST({args[0]} AS STRING)"
            lift = (f"variant_get(parse_json(to_json(named_struct("
                    f"'x', {s}))), '$.x')")
            return f"coalesce(try_parse_json({s}), {lift})"
        if fname == "todatetime":
            # null on unparseable input, per Kusto (ANSI CAST errors)
            return f"try_cast({args[0]} AS TIMESTAMP)"
        if fname == "tobool":
            return f"try_cast({args[0]} AS BOOLEAN)"
        if fname == "toreal":
            return f"try_cast({args[0]} AS DOUBLE)"
        if fname == "now":
            return "current_timestamp()"
        if fname == "ago":
            # arg is a timespan literal, already rendered as microseconds
            if len(args) != 1:
                raise ValueError("KQL: ago(timespan)")
            return (f"timestampadd(MICROSECOND, -({args[0]}), "
                    f"current_timestamp())")
        if fname == "format_datetime":
            # Kusto format specifiers (yyyy MM dd HH mm ss) are the Java
            # subset date_format understands
            if len(args) != 2:
                raise ValueError("KQL: format_datetime(dt, format)")
            return f"date_format({args[0]}, {args[1]})"
        if fname == "format_timespan":
            # timespan = epoch-µs int in this engine; the format is a
            # compile-time literal parsed into d/h/m/s/f runs, each a
            # zero-padded component expression, separators verbatim
            if len(args) != 2:
                raise ValueError("KQL: format_timespan(ts, format)")
            t = args[0]
            fm = re.fullmatch(r"\s*'(.*)'\s*", args[1] or "",
                              re.DOTALL)
            if not fm:
                raise ValueError("KQL: format_timespan needs a "
                                 "literal format string")
            at = f"abs(CAST({t} AS BIGINT))"
            comp = {
                "d": f"CAST({at} div 86400000000 AS STRING)",
                "h": f"CAST(({at} div 3600000000) % 24 AS STRING)",
                "m": f"CAST(({at} div 60000000) % 60 AS STRING)",
                "s": f"CAST(({at} div 1000000) % 60 AS STRING)",
            }
            parts, i2, spec = [], 0, fm.group(1)
            while i2 < len(spec):
                c = spec[i2]
                j2 = i2
                while j2 < len(spec) and spec[j2] == c:
                    j2 += 1
                k2 = j2 - i2
                if c in "dhms":
                    e = comp[c]
                    if k2 > 1:
                        e = f"lpad({e}, {k2}, '0')"
                    parts.append(e)
                elif c == "f":
                    if k2 > 7:
                        raise ValueError(
                            "KQL: format_timespan: at most 7 'f'")
                    parts.append(
                        f"substr(lpad(CAST({at} % 1000000 AS STRING),"
                        f" 6, '0') || '0', 1, {k2})")
                else:
                    lit = spec[i2:j2].replace("'", "\\'")
                    parts.append(f"'{lit}'")
                i2 = j2
            sign = (f"(CASE WHEN CAST({t} AS BIGINT) < 0 "
                    f"THEN '-' ELSE '' END)")
            return f"concat({sign}, {', '.join(parts)})"
        if fname == "format_bytes":
            # format_bytes(size [, precision [, units]]): humanized
            # 1024-based size string; auto-picks the largest unit with
            # value >= 1 unless a literal unit name is given
            if len(args) not in (1, 2, 3):
                raise ValueError(
                    "KQL: format_bytes(size[, precision[, units]])")
            sz = f"CAST({args[0]} AS DOUBLE)"
            prec = args[1] if len(args) >= 2 else "0"
            try:
                p = int(prec.strip("() "))
            except ValueError:
                raise ValueError("KQL: format_bytes precision must "
                                 "be an integer literal")
            units = ["Bytes", "KB", "MB", "GB", "TB", "PB", "EB"]
            if len(args) == 3:
                um = re.fullmatch(r"\s*'(\w+)'\s*", args[2])
                if not um or um.group(1) not in units:
                    raise ValueError(
                        f"KQL: format_bytes units must be a literal "
                        f"in {units}")
                k2 = units.index(um.group(1))
                val = f"round({sz} / {float(1024 ** k2)}, {p})"
                num = (f"CAST(CAST({val} AS DECIMAL(38, {p})) "
                       f"AS STRING)" if p > 0
                       else f"CAST(CAST({val} AS BIGINT) AS STRING)")
                return f"concat({num}, ' ', '{units[k2]}')"
            branches = []
            for k2 in range(len(units) - 1, 0, -1):
                div = float(1024 ** k2)
                val = f"round({sz} / {div}, {p})"
                num = (f"CAST(CAST({val} AS DECIMAL(38, {p})) "
                       f"AS STRING)" if p > 0
                       else f"CAST(CAST({val} AS BIGINT) AS STRING)")
                branches.append(f"WHEN {sz} >= {div} THEN "
                                f"concat({num}, ' {units[k2]}')")
            val0 = f"round({sz}, {p})"
            num0 = (f"CAST(CAST({val0} AS DECIMAL(38, {p})) AS STRING)"
                    if p > 0
                    else f"CAST(CAST({val0} AS BIGINT) AS STRING)")
            return (f"(CASE {' '.join(branches)} "
                    f"ELSE concat({num0}, ' Bytes') END)")
        if fname == "indexof":
            # 0-based; -1 when absent (instr/locate are 1-based, 0
            # when absent). Full Kusto signature: indexof(text,
            # lookup [, start [, length [, occurrence]]]) — start
            # offsets the search, length bounds the searched window
            # (-1 = to the end), occurrence picks the n-th match.
            if len(args) not in (2, 3, 4, 5):
                raise ValueError("KQL: indexof(text, lookup "
                                 "[, start [, length [, occurrence]]])")
            if len(args) == 2:
                return f"(instr({args[0]}, {args[1]}) - 1)"
            text, look = args[0], args[1]
            # negative start: offset from the END by abs(start)
            # (Kusto; r11 advice — locate() with a non-positive
            # position returns 0, which read as a silent miss)
            start0 = f"CAST({args[2]} AS INT)"
            start = (f"(CASE WHEN {start0} < 0 THEN "
                     f"greatest(0, CAST(length({text}) AS INT) "
                     f"+ {start0}) ELSE {start0} END)")
            if len(args) >= 4:
                ln = f"CAST({args[3]} AS INT)"
                window = (f"(CASE WHEN {ln} = -1 THEN {text} ELSE "
                          f"substr({text}, 1, {start} + {ln}) END)")
            else:
                window = text
            occ = (f"CAST({args[4]} AS INT)" if len(args) == 5
                   else "1")
            # locate(substr, str, pos) handles start; the n-th
            # occurrence walks via a bounded fold over 1..occ
            hit = (f"aggregate(sequence(1, {occ}), "
                   f"CAST({start} + 1 AS INT), (__io_p, __io_i) -> "
                   f"CAST(CASE WHEN __io_p <= 0 "
                   f"OR locate({look}, {window}, __io_p) = 0 THEN 0 "
                   f"ELSE locate({look}, {window}, __io_p) "
                   f"+ (CASE WHEN __io_i < {occ} THEN "
                   f"length({look}) ELSE 0 END) END AS INT))")
            return f"({hit} - 1)"
        if fname == "indexof_regex":
            # 0-based position of the first regex match; -1 on miss
            # (regexp_instr is 1-based, 0 on miss)
            if len(args) != 2:
                raise ValueError("KQL: indexof_regex(text, regex)")
            return f"(regexp_instr({args[0]}, {args[1]}) - 1)"
        if fname == "reverse":
            # Kusto reverse(): string reversal (typed arrays reverse
            # too — Spark's reverse covers both; dynamics need
            # a typed cast first)
            if len(args) != 1:
                raise ValueError("KQL: reverse(value)")
            return f"reverse({_str_if_variant(args[0])})"
        if fname == "parse_path":
            # file-path bag: Scheme / RootPath / DirectoryPath /
            # DirectoryName / Filename / Extension /
            # AlternateDataStreamName ('file.txt:stream'), both
            # separators, pure regex — dynamic bag out
            if len(args) != 1:
                raise ValueError("KQL: parse_path(path)")
            p = args[0]
            scheme = (f"regexp_extract({p}, "
                      f"'^([A-Za-z][A-Za-z0-9+.\\\\-]*)://', 1)")
            body = (f"regexp_replace({p}, "
                    f"'^[A-Za-z][A-Za-z0-9+.\\\\-]*://', '')")
            root = (f"regexp_extract({body}, "
                    f"'^([A-Za-z]:|[/\\\\\\\\])', 1)")
            last = f"regexp_extract({body}, '[^/\\\\\\\\]*$', 0)"
            fname_ = f"split_part({last}, ':', 1)"
            ads = f"nullif(split_part({last}, ':', 2), '')"
            dirp = (f"(CASE WHEN {body} RLIKE '[/\\\\\\\\]' THEN "
                    f"regexp_replace({body}, "
                    f"'[/\\\\\\\\][^/\\\\\\\\]*$', '') ELSE '' END)")
            dirn = f"regexp_extract({dirp}, '[^/\\\\\\\\]*$', 0)"
            ext = f"regexp_extract({fname_}, '\\\\.([^.]*)$', 1)"
            obj = (f"named_struct("
                   f"'Scheme', {scheme}, "
                   f"'RootPath', {root}, "
                   f"'DirectoryPath', {dirp}, "
                   f"'DirectoryName', {dirn}, "
                   f"'Filename', {fname_}, "
                   f"'Extension', {ext}, "
                   f"'AlternateDataStreamName', "
                   f"coalesce({ads}, ''))")
            return f"parse_json(to_json({obj}))"
        if fname == "parse_user_agent":
            return self._parse_user_agent(args)
        if fname == "parse_xml":
            # XML -> dynamic via the stdlib ElementTree kernel
            # (__kql_parse_xml, _register_codec_udfs): Kusto's
            # convention — '@attr' keys, '#text' for mixed content,
            # repeated sibling tags -> array, invalid XML -> null
            if len(args) != 1:
                raise ValueError("KQL: parse_xml(xml_text)")
            return (f"parse_json(__kql_parse_xml("
                    f"CAST({args[0]} AS STRING)))")
        if fname == "parse_command_line":
            # command text -> dynamic array of arguments via the
            # __kql_parse_cmdline kernel (_register_codec_udfs).
            # Kusto documents the 'windows' parser (CommandLineToArgvW
            # rules); 'posix' (stdlib shlex) is an extension. The
            # parser type must be a string literal, like Kusto.
            if len(args) != 2:
                raise ValueError(
                    "KQL: parse_command_line(command, parser_type)")
            pm = re.fullmatch(r"\s*'(\w+)'\s*", args[1] or "")
            if not pm or pm.group(1).lower() not in ("windows",
                                                     "posix"):
                raise ValueError(
                    "KQL: parse_command_line parser_type must be the "
                    "literal 'windows' or 'posix'")
            return (f"parse_json(__kql_parse_cmdline("
                    f"CAST({args[0]} AS STRING), "
                    f"'{pm.group(1).lower()}'))")
        if fname == "countof":
            # countof(text, search[, kind]): kind='regex' counts
            # pattern matches; default counts non-overlapping plain
            # occurrences (documented deviation: Kusto's plain kind
            # counts overlapping matches)
            if len(args) not in (2, 3):
                raise ValueError("KQL: countof(text, search[, kind])")
            s, sub = args[0], args[1]
            kind = (args[2].strip().strip("'").lower()
                    if len(args) == 3 else "normal")
            if kind == "regex":
                return f"size(regexp_extract_all({s}, {sub}, 0))"
            if kind != "normal":
                raise ValueError(
                    f"KQL: countof kind {kind!r} (normal/regex)")
            return (f"((length({s}) - length(replace({s}, {sub}, ''))) "
                    f"div length({sub}))")
        if fname in ("hash", "hash_xxhash64"):
            # Kusto hash()/hash_xxhash64() is xxhash64; the optional
            # second argument is a MODULUS (hash(v, m) in [0, m)), not
            # a second hashed value. Deviation note (stable within
            # this engine): Spark's xxhash64 hashes the value's
            # internal binary form with seed 42, not Kusto's exact
            # byte stream, so absolute hash values differ across
            # engines — all dedup/salting uses here only need a
            # stable uniform 64-bit hash.
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(value [, mod])")
            h = f"xxhash64({args[0]})"
            if len(args) == 2:
                return f"pmod({h}, CAST({args[1]} AS BIGINT))"
            return h
        if fname in ("hash_sha256", "hash_sha1", "hash_md5"):
            # cryptographic digests of the value's string form (hex
            # text out, like Kusto); the pseudonymization workhorses
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(value)")
            s = f"CAST({args[0]} AS STRING)"
            if fname == "hash_sha256":
                return f"sha2({s}, 256)"
            return f"{'sha1' if fname == 'hash_sha1' else 'md5'}({s})"
        if fname in ("hash_combine", "hash_many"):
            # combined 64-bit hash of all arguments (xxhash64 over the
            # tuple — Kusto does not publish its mixer; documented
            # deviation, stable within this engine)
            if len(args) < 2:
                raise ValueError(f"KQL: {fname}(v1, v2, ...)")
            return f"xxhash64({', '.join(args)})"
        if fname == "strrep":
            # strrep(text, n [, delimiter]) — the 3-arg form joins the
            # repeats with the delimiter (r13 probe sweep)
            if len(args) not in (2, 3):
                raise ValueError("KQL: strrep(text, n[, delimiter])")
            if len(args) == 3:
                return (f"array_join(array_repeat({args[0]}, "
                        f"CAST({args[1]} AS INT)), {args[2]})")
            return f"repeat({args[0]}, {args[1]})"
        if fname in ("getyear", "getmonth", "dayofmonth", "hourofday",
                     "monthofyear", "dayofyear", "week_of_year"):
            fn = {"getyear": "year", "getmonth": "month",
                  "dayofmonth": "day", "hourofday": "hour",
                  "monthofyear": "month", "dayofyear": "dayofyear",
                  # ISO 8601 weeks on both sides
                  "week_of_year": "weekofyear"}[fname]
            return f"{fn}({args[0]})"
        if fname in ("endofday", "endofweek", "endofmonth", "endofyear",
                     "endofquarter"):
            # optional Kusto offset, like the startof* family
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(ts [, offset])")
            n = (f"CAST({args[1]} AS INT)" if len(args) == 2
                 else "0")
            if fname == "endofweek":
                # Sunday-based weeks (see startofweek): next week start - 1µs
                return (f"(date_trunc('WEEK', {args[0]} + INTERVAL 8 DAY)"
                        f" - INTERVAL 1 DAY "
                        f"+ make_interval(0, 0, {n})"
                        f" - INTERVAL 1 MICROSECOND)")
            unit = {"endofday": "DAY", "endofmonth": "MONTH",
                    "endofyear": "YEAR", "endofquarter": "QUARTER"}[fname]
            step = {"endofday": f"make_interval(0, 0, 0, {n} + 1)",
                    "endofmonth": f"make_interval(0, {n} + 1)",
                    "endofyear": f"make_interval({n} + 1)",
                    "endofquarter":
                        f"make_interval(0, 3 * {n} + 3)"}[fname]
            return (f"(date_trunc('{unit}', {args[0]}) + {step} "
                    f"- INTERVAL 1 MICROSECOND)")
        if fname == "dayofweek":
            # Kusto returns a TIMESPAN (days since Sunday); timespans in
            # this compiler are microseconds, so 'dayofweek(t) == 1d'
            # compares correctly (Spark dayofweek: 1=Sunday)
            return f"(CAST(dayofweek({args[0]}) - 1 AS BIGINT) * 86400000000)"
        if fname == "pack_array":
            # native typed array — the fast path every set-op/series
            # consumer relies on. DOCUMENTED DEVIATION: Kusto's
            # pack_array accepts MIXED element types (dynamic out);
            # here mixed inputs fail analysis — write the dynamic
            # literal (dynamic([1, "a", true])) for that case, which
            # compiles to VARIANT directly.
            return f"array({', '.join(args)})"
        if fname == "array_length":
            return f"CAST(size({self._dyn_arr_arg(args[0])}) AS BIGINT)"
        if fname == "array_concat":
            # lift each operand: concat() over VARIANTs silently does
            # STRING concatenation ('[]' || '[]' -> '[][]') — caught by
            # the r12 registry property test
            return (f"concat("
                    f"{', '.join(self._dyn_arr_arg(a) for a in args)})")
        if fname == "array_slice":
            # Kusto: 0-based inclusive [start, end]
            if len(args) != 3:
                raise ValueError("KQL: array_slice(arr, start, end)")
            a, s, e = self._dyn_arr_arg(args[0]), args[1], args[2]
            return f"slice({a}, ({s}) + 1, ({e}) - ({s}) + 1)"
        if fname in ("array_sort_asc", "array_sort_desc"):
            desc = fname.endswith("desc")
            if len(args) == 1:
                return (f"reverse(array_sort({args[0]}))" if desc
                        else f"array_sort({args[0]})")
            # Kusto parallel-array co-sort: sort the FIRST array and
            # permute the others by the same order; returns a dynamic
            # array-of-arrays. Arrays whose length differs from the
            # first come back null (Kusto's contract). try_element_at
            # everywhere (ANSI-safe); the empty first array
            # short-circuits (sequence(1, 0) DESCENDS — the round-5
            # gotcha).
            a0 = args[0]
            pairs = (f"zip_with({a0}, sequence(1, size({a0})), "
                     f"(__as_v, __as_i) -> named_struct("
                     f"'v', __as_v, 'i', __as_i))")
            srt = f"array_sort({pairs})"
            if desc:
                srt = f"reverse({srt})"
            order = f"transform({srt}, __as_p -> __as_p.i)"
            outs = []
            for a in args:
                permuted = (f"transform({order}, __as_k -> "
                            f"try_element_at({a}, __as_k))")
                outs.append(
                    f"IF(size({a}) = size({a0}), {permuted}, NULL)")
            # arrays of DIFFERENT element types can't share a SQL
            # array() — render each to JSON text and assemble the
            # outer array textually (null -> the JSON literal)
            cells = ", ".join(
                f"coalesce(to_json(IF(size({a0}) = 0, "
                f"IF(size({a}) = 0, {a}, NULL), {o})), 'null')"
                for a, o in zip(args, outs))
            return (f"parse_json(concat('[', "
                    f"concat_ws(',', {cells}), ']'))")
        if fname == "set_union":
            out = args[0]
            for a in args[1:]:
                out = f"array_union({out}, {a})"
            return out
        if fname == "set_intersect":
            out = args[0]
            for a in args[1:]:
                out = f"array_intersect({out}, {a})"
            return out
        if fname == "set_difference":
            out = args[0]
            for a in args[1:]:
                out = f"array_except({out}, {a})"
            return out
        if fname == "strcat_delim":
            if len(args) < 2:
                raise ValueError("KQL: strcat_delim(delim, arg1, ...)")
            return f"concat_ws({', '.join(args)})"
        if fname == "anyif":
            fname = "take_anyif"  # Kusto's legacy alias
        if fname in ("sumif", "avgif", "minif", "maxif", "dcountif",
                     "stdevif", "varianceif", "take_anyif"):
            if len(args) != 2:
                raise ValueError(f"KQL: {fname}(expr, predicate)")
            agg = {"sumif": "sum", "avgif": "avg", "minif": "min",
                   "maxif": "max", "stdevif": "stddev_samp",
                   "varianceif": "var_samp", "take_anyif": "any_value",
                   "dcountif": "count(DISTINCT"}[fname]
            if fname == "dcountif":
                return (f"count(DISTINCT CASE WHEN {args[1]} "
                        f"THEN {args[0]} END)")
            if fname == "take_anyif":
                # ignoreNulls=true: the CASE's non-matching nulls must
                # not be pickable
                return (f"any_value(CASE WHEN {args[1]} "
                        f"THEN {args[0]} END, true)")
            return f"{agg}(CASE WHEN {args[1]} THEN {args[0]} END)"
        if fname in ("covariance", "covariancep", "covarianceif",
                     "covariancepif"):
            # sample/population covariance (+ the predicate-gated
            # forms: the CASE pair nulls BOTH sides for non-matching
            # rows, so covar_* skips them — Kusto's *if contract)
            base = ("covar_samp" if "p" not in fname.replace(
                "covariance", "") else "covar_pop")
            if fname in ("covariance", "covariancep"):
                if len(args) != 2:
                    raise ValueError(f"KQL: {fname}(x, y)")
                return f"{base}({args[0]}, {args[1]})"
            if len(args) != 3:
                raise ValueError(f"KQL: {fname}(x, y, predicate)")
            return (f"{base}(CASE WHEN {args[2]} THEN {args[0]} END, "
                    f"CASE WHEN {args[2]} THEN {args[1]} END)")
        if fname == "around":
            # around(value, center, delta): |value - center| <= delta
            if len(args) != 3:
                raise ValueError("KQL: around(value, center, delta)")
            return (f"(abs(CAST({args[0]} AS DOUBLE) "
                    f"- CAST({args[1]} AS DOUBLE)) "
                    f"<= CAST({args[2]} AS DOUBLE))")
        if fname in ("binary_all_and", "binary_all_or",
                     "binary_all_xor"):
            # bitwise-reduction aggregates -> Spark bit_and/or/xor
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(expr) takes 1 arg")
            fn = {"binary_all_and": "bit_and", "binary_all_or": "bit_or",
                  "binary_all_xor": "bit_xor"}[fname]
            return f"{fn}({args[0]})"
        if fname in ("make_list_if", "make_set_if"):
            # conditional collection (collect_* skips the CASE's
            # nulls); optional third arg = maxSize cap, like
            # make_list/make_set
            if len(args) not in (2, 3):
                raise ValueError(
                    f"KQL: {fname}(expr, predicate [, maxSize])")
            agg = ("collect_list" if fname == "make_list_if"
                   else "collect_set")
            out = f"{agg}(CASE WHEN {args[1]} THEN {args[0]} END)"
            if len(args) == 3:
                return f"slice({out}, 1, CAST({args[2]} AS INT))"
            return out
        if fname == "hll_if":
            # conditional sketch build (the CASE's nulls never enter
            # the sketch) — pairs with dcount_intersect fixtures
            if len(args) != 2:
                raise ValueError("KQL: hll_if(expr, predicate)")
            return (f"hll_sketch_agg(CASE WHEN {args[1]} "
                    f"THEN {args[0]} END)")
        if fname == "take_any":
            return f"any_value({args[0]})"
        if fname == "buildschema":
            # merged schema of a dynamic column across the group.
            # DOCUMENTED DEVIATION: Kusto renders a nested bag like
            # {"x":"long"}; this engine returns the merged VARIANT
            # schema in Spark DDL text (schema_of_variant_agg) — the
            # same information, deterministic, already the form
            # evaluate bag_unpack consumes internally
            if len(args) != 1:
                raise ValueError("KQL: buildschema(dynamicColumn)")
            return f"schema_of_variant_agg({args[0]})"
        if fname == "bag_zip":
            # bag_zip(keys, values) -> bag keyed by position; extra
            # keys null-pad (try_element_at), extra values drop,
            # null/empty keys drop (map keys cannot be null)
            if len(args) != 2:
                raise ValueError("KQL: bag_zip(keys, values)")
            # PERMISSIVE mode: a non-array operand (e.g. a scalar
            # dynamic) nulls out instead of erroring under the
            # session's FAILFAST default — Kusto's mismatch contract
            ks = (f"from_json(to_json({args[0]}), 'array<string>', "
                  f"map('mode', 'PERMISSIVE'))")
            vs = (f"from_json(to_json({args[1]}), 'array<variant>', "
                  f"map('mode', 'PERMISSIVE'))")
            ent = (f"filter(transform({ks}, (__bz_k, __bz_i) -> "
                   f"struct(__bz_k AS key, try_element_at({vs}, "
                   f"__bz_i + 1) AS value, __bz_i AS idx)), __bz_e -> "
                   f"__bz_e.key IS NOT NULL)")
            # duplicate keys: LAST wins (Kusto bag semantics) — keep
            # only each key's max-index entry, or Spark's EXCEPTION
            # map-key dedup policy aborts the job at runtime on valid
            # Kusto input (r11 advice). Bags are tiny; the quadratic
            # per-row filter stays inside one codegen expression.
            ded = (f"filter({ent}, __bz_d -> __bz_d.idx = "
                   f"array_max(transform(filter({ent}, __bz_s -> "
                   f"__bz_s.key = __bz_d.key), __bz_m -> __bz_m.idx)))")
            fin = (f"transform({ded}, __bz_f -> struct("
                   f"__bz_f.key AS key, __bz_f.value AS value))")
            return (f"(CASE WHEN {ks} IS NULL OR {vs} IS NULL "
                    f"THEN NULL ELSE "
                    f"parse_json(to_json(map_from_entries({fin}), "
                    f"map('ignoreNullFields', 'false'))) END)")
        if fname == "stdev":
            return f"stddev_samp({args[0]})"
        if fname == "stdevp":
            return f"stddev_pop({args[0]})"
        if fname == "variance":
            return f"var_samp({args[0]})"
        if fname == "variancep":
            return f"var_pop({args[0]})"
        mapped = _FN_RENAME.get(fname, fname)
        return f"{mapped}({', '.join(args)})"

    @staticmethod
    def _bind1(fields: dict[str, str], var: str, body: str) -> str:
        """Bind-once hop: evaluate each field expression ONCE per row
        and expose it to ``body`` as ``{var}.{name}`` — the repo's
        named_struct/transform scope. Spliced SQL text is re-evaluated
        at every reference; any sub-expression a compiled function
        references more than once (or references inside a fold) must
        ride through here (the r9 gotcha; the ipv4/geo families each
        measured >2x on it)."""
        fs = ", ".join(f"'{k}', {v}" for k, v in fields.items())
        return (f"element_at(transform(array(named_struct({fs})), "
                f"{var} -> {body}), 1)")

    @staticmethod
    def _ipv4_num(ip: str) -> tuple[str, str]:
        """(validity predicate, numeric value) for a dotted-quad string
        expression (the part BEFORE any '/prefix' suffix). Both texts
        bind the split-parts array once internally, so a reference
        costs one split, not one per octet."""
        addr = f"split_part({ip}, '/', 1)"
        parts = f"split({addr}, '\\\\.')"

        def o(i):
            return (f"CAST(coalesce(try_cast(try_element_at("
                    f"__ipn_s.p, {i}) AS INT), 0) AS BIGINT)")
        valid = _ExprParser._bind1(
            {"p": parts}, "__ipv_s",
            "(size(__ipv_s.p) = 4 AND forall(__ipv_s.p, __ip_x -> "
            "try_cast(__ip_x AS INT) BETWEEN 0 AND 255))")
        num = _ExprParser._bind1(
            {"p": parts}, "__ipn_s",
            f"((({o(1)} * 256 + {o(2)}) * 256 + {o(3)}) * 256 "
            f"+ {o(4)})")
        return valid, num

    def _ipv4_fn(self, fname: str, args: list[str]) -> str:
        """IPv4 family: dotted-quad parse to a BIGINT, prefix masks, RFC
        1918 private ranges, CIDR containment — all pure JVM integer
        expressions (the standard log-curation predicates). Invalid
        addresses yield null (try_cast guards, ANSI-safe)."""
        if fname == "parse_ipv4":
            if len(args) != 1:
                raise ValueError("KQL: parse_ipv4(ip)")
            ip = args[0]
            valid, num = self._ipv4_num(ip)
            # an 'a.b.c.d/p' input is masked to its network address
            # (Kusto's behavior); a plain address keeps /32
            # malformed '/garbage' must be NULL, not fall back to
            # /32 (r6 advice): only an ABSENT/empty suffix defaults
            pfx = (f"(CASE WHEN nullif(split_part({ip}, '/', 2), '') "
                   f"IS NULL THEN 32 ELSE try_cast("
                   f"split_part({ip}, '/', 2) AS INT) END)")
            masked = (f"(__ip4_s.n & ~(shiftleft(CAST(1 AS BIGINT), "
                      f"32 - __ip4_s.x) - 1))")
            return self._bind1(
                {"n": num, "x": pfx, "v": valid}, "__ip4_s",
                f"(CASE WHEN __ip4_s.v AND __ip4_s.x BETWEEN 0 AND 32 "
                f"THEN {masked} ELSE NULL END)")
        if fname == "parse_ipv4_mask":
            if len(args) != 2:
                raise ValueError("KQL: parse_ipv4_mask(ip, prefix)")
            ip, pfx = args
            valid, num = self._ipv4_num(ip)
            masked = (f"(__ipm_s.n & ~(shiftleft(CAST(1 AS BIGINT), "
                      f"32 - __ipm_s.x) - 1))")
            return self._bind1(
                {"n": num, "x": f"({pfx})", "v": valid}, "__ipm_s",
                f"(CASE WHEN __ipm_s.v AND __ipm_s.x BETWEEN 0 AND 32 "
                f"THEN {masked} ELSE NULL END)")
        if fname == "ipv4_range_to_cidr_list":
            # Kusto: the minimal CIDR list covering [start_ip, end_ip]
            # (r13 probe sweep). Classic greedy: at each step take the
            # largest power-of-two block that is BOTH aligned at the
            # cursor (cur & -cur) and fits in the remainder; an IPv4
            # range needs at most 64 blocks, so a bounded fold over
            # sequence(1, 64) is exact — pure JVM integer/bit codegen,
            # zero Python. Invalid addresses or start > end -> null.
            if len(args) != 2:
                raise ValueError(
                    "KQL: ipv4_range_to_cidr_list(start_ip, end_ip)")
            sv, sn = self._ipv4_num(f"CAST({args[0]} AS STRING)")
            ev, en = self._ipv4_num(f"CAST({args[1]} AS STRING)")
            low = (f"(CASE WHEN __cr_s.c = 0 THEN 4294967296 "
                   f"ELSE __cr_s.c & -__cr_s.c END)")
            blk = (f"least({low}, shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(floor(log2(CAST(__cr_s.e - __cr_s.c + 1 "
                   f"AS DOUBLE)) + 1e-9) AS INT)))")
            quad = (f"concat_ws('.', "
                    f"shiftright(__cr_s.c, 24) & 255, "
                    f"shiftright(__cr_s.c, 16) & 255, "
                    f"shiftright(__cr_s.c, 8) & 255, "
                    f"__cr_s.c & 255)")
            pfx = (f"(32 - CAST(floor(log2(CAST(__cr_b AS DOUBLE)) "
                   f"+ 0.5) AS INT))")
            step = (
                f"(__cr_s, __cr_i) -> CASE WHEN __cr_s.c > __cr_s.e "
                f"THEN __cr_s ELSE element_at(transform(array({blk}), "
                f"__cr_b -> named_struct("
                f"'c', __cr_s.c + __cr_b, 'e', __cr_s.e, "
                f"'a', array_append(__cr_s.a, "
                f"concat({quad}, '/', {pfx})))), 1) END")
            fold = (f"aggregate(sequence(1, 64), named_struct("
                    f"'c', {sn}, 'e', {en}, "
                    f"'a', CAST(array() AS ARRAY<STRING>)), {step}, "
                    f"__cr_f -> __cr_f.a)")
            return (f"(CASE WHEN {sv} AND {ev} AND {sn} <= {en} "
                    f"THEN parse_json(to_json({fold})) "
                    f"ELSE NULL END)")
        if fname in ("format_ipv4", "format_ipv4_mask"):
            # render a numeric OR dotted-quad input back to a dotted
            # quad, masked to `prefix` (2nd arg; else the input's own
            # /suffix; else 32). format_ipv4_mask appends '/prefix'.
            if len(args) not in (1, 2):
                raise ValueError(f"KQL: {fname}(ip [, prefix])")
            ip = args[0]
            s = f"CAST({ip} AS STRING)"
            valid, num = self._ipv4_num(s)
            inpfx = (f"(CASE WHEN nullif(split_part({s}, '/', 2), '') "
                     f"IS NULL THEN 32 ELSE try_cast("
                     f"split_part({s}, '/', 2) AS INT) END)")
            pfx = f"({args[1]})" if len(args) == 2 else inpfx
            n = (f"(CASE WHEN {s} RLIKE '^[0-9]+$' "
                 f"THEN try_cast({s} AS BIGINT) "
                 f"WHEN {valid} THEN {num} ELSE NULL END)")
            masked = (f"(__ipf_s.n & ~(shiftleft(CAST(1 AS BIGINT), "
                      f"32 - __ipf_s.x) - 1))")
            quad = (f"concat_ws('.', "
                    f"shiftright({masked}, 24) & 255, "
                    f"shiftright({masked}, 16) & 255, "
                    f"shiftright({masked}, 8) & 255, "
                    f"{masked} & 255)")
            out = (quad if fname == "format_ipv4"
                   else f"concat({quad}, '/', __ipf_s.x)")
            return self._bind1(
                {"n": n, "x": pfx}, "__ipf_s",
                f"(CASE WHEN __ipf_s.n BETWEEN 0 AND 4294967295 "
                f"AND __ipf_s.x BETWEEN 0 AND 32 THEN {out} "
                f"ELSE NULL END)")
        if fname == "ipv4_netmask_suffix":
            # the '/suffix' as a long; 32 when absent; null when the
            # address or suffix is invalid
            if len(args) != 1:
                raise ValueError("KQL: ipv4_netmask_suffix(ip)")
            ip = args[0]
            valid, _ = self._ipv4_num(ip)
            pfx = (f"(CASE WHEN nullif(split_part({ip}, '/', 2), '') "
                   f"IS NULL THEN 32 ELSE try_cast("
                   f"split_part({ip}, '/', 2) AS INT) END)")
            return (f"(CASE WHEN {valid} AND {pfx} BETWEEN 0 AND 32 "
                    f"THEN CAST({pfx} AS BIGINT) ELSE NULL END)")
        if fname == "ipv4_is_private":
            if len(args) != 1:
                raise ValueError("KQL: ipv4_is_private(ip)")
            valid, num = self._ipv4_num(args[0])
            # 10.0.0.0/8, 172.16.0.0/12, 192.168.0.0/16
            return self._bind1(
                {"n": num, "v": valid}, "__ipp_s",
                "(CASE WHEN __ipp_s.v THEN "
                "(__ipp_s.n BETWEEN 167772160 AND 184549375) "
                "OR (__ipp_s.n BETWEEN 2886729728 AND 2887778303) "
                "OR (__ipp_s.n BETWEEN 3232235520 AND 3232301055) "
                "ELSE NULL END)")
        if fname in ("ipv4_compare", "ipv4_is_match"):
            # ipv4_compare(a, b[, prefix]) -> -1/0/1 comparing the two
            # addresses masked to the EFFECTIVE prefix = min(a's
            # /suffix, b's /suffix, the prefix argument); null when
            # either side (or the prefix) is invalid — Kusto's
            # documented IP-prefix comparison. ipv4_is_match is the
            # equality form (compare == 0).
            if len(args) not in (2, 3):
                raise ValueError(f"KQL: {fname}(ip1, ip2[, prefix])")
            a, b = args[0], args[1]
            va, na = self._ipv4_num(a)
            vb, nb = self._ipv4_num(b)

            def sfx(ip):
                return (f"(CASE WHEN nullif(split_part({ip}, '/', 2),"
                        f" '') IS NULL THEN 32 ELSE try_cast("
                        f"split_part({ip}, '/', 2) AS INT) END)")
            parg = (f"CAST({args[2]} AS INT)" if len(args) == 3
                    else "32")
            # bind every shared sub-expression once: na/nb each cost a
            # split and were previously re-spliced into both mask
            # references on both compare branches
            pfx = "least(__ipc_s.sa, __ipc_s.sb, __ipc_s.pq)"
            ma = f"shiftright(__ipc_s.na, 32 - {pfx})"
            mb = f"shiftright(__ipc_s.nb, 32 - {pfx})"
            cmp_ = (f"(CASE WHEN {ma} < {mb} THEN -1 "
                    f"WHEN {ma} > {mb} THEN 1 ELSE 0 END)")
            body = (cmp_ if fname == "ipv4_compare"
                    else f"({ma} = {mb})")
            typ = "BIGINT" if fname == "ipv4_compare" else "BOOLEAN"
            return self._bind1(
                {"na": na, "nb": nb, "sa": sfx(a), "sb": sfx(b),
                 "pq": parg, "va": va, "vb": vb}, "__ipc_s",
                f"(CASE WHEN __ipc_s.va AND __ipc_s.vb "
                f"AND __ipc_s.sa BETWEEN 0 AND 32 "
                f"AND __ipc_s.sb BETWEEN 0 AND 32 "
                f"AND {pfx} BETWEEN 0 AND 32 "
                f"THEN CAST({body} AS {typ}) ELSE NULL END)")
        # ipv4_is_in_range(ip, 'net/prefix' | exact ip)
        if len(args) != 2:
            raise ValueError("KQL: ipv4_is_in_range(ip, range)")
        ip, rng = args
        v1, n1 = self._ipv4_num(ip)
        v2, n2 = self._ipv4_num(rng)
        pfx = (f"(CASE WHEN nullif(split_part({rng}, '/', 2), '') "
               f"IS NULL THEN 32 ELSE try_cast("
               f"split_part({rng}, '/', 2) AS INT) END)")
        return self._bind1(
            {"n1": n1, "n2": n2, "x": pfx, "v1": v1, "v2": v2},
            "__ipr_s",
            "(CASE WHEN __ipr_s.v1 AND __ipr_s.v2 "
            "AND __ipr_s.x BETWEEN 0 AND 32 "
            "THEN shiftright(__ipr_s.n1, 32 - __ipr_s.x) "
            "= shiftright(__ipr_s.n2, 32 - __ipr_s.x) "
            "ELSE NULL END)")

    # candidate dotted-quads properly delimited by non-alphanumeric,
    # non-dot characters (lookarounds: Java regex only — the DuckDB
    # oracle twins use fixture-shaped RE2 patterns instead)
    _IPV4_SCAN_RE = (r"(?<![0-9A-Za-z.])((?:[0-9]{1,3}\\.){3}"
                     r"[0-9]{1,3})(?![0-9A-Za-z.])")

    def _ipv4_scan_fn(self, fname: str, args: list[str]) -> str:
        """Embedded-IP text scanning (has_ipv4 / has_any_ipv4 /
        has_ipv4_prefix) and the multi-range membership OR
        (ipv4_is_in_any_range) — the grep-side of log curation. The
        scanners extract properly-delimited dotted-quad candidates with
        one regexp pass, then validate octet ranges with array
        predicates — all whole-stage-codegen expressions, no UDF."""
        if fname == "ipv4_is_in_any_range":
            if len(args) < 2:
                raise ValueError(
                    "KQL: ipv4_is_in_any_range(ip, range...)")
            terms = [self._ipv4_fn("ipv4_is_in_range", [args[0], r])
                     for r in args[1:]]
            return "(" + " OR ".join(terms) + ")"
        src = args[0]
        cands = (f"regexp_extract_all({src}, "
                 f"'{self._IPV4_SCAN_RE}', 1)")
        quad_ok = ("forall(split(__is_c, '\\\\.'), __is_x -> "
                   "try_cast(__is_x AS INT) BETWEEN 0 AND 255)")
        if fname == "has_ipv4":
            if len(args) != 1:
                raise ValueError("KQL: has_ipv4(source)")
            return f"exists({cands}, __is_c -> {quad_ok})"
        if fname == "has_ipv4_prefix":
            if len(args) != 2:
                raise ValueError("KQL: has_ipv4_prefix(source, prefix)")
            return (f"exists({cands}, __is_c -> {quad_ok} "
                    f"AND startswith(__is_c, {args[1]}))")
        if fname == "has_any_ipv4_prefix":
            if len(args) < 2:
                raise ValueError(
                    "KQL: has_any_ipv4_prefix(source, prefix...)")
            pref = " OR ".join(f"startswith(__is_c, {p})"
                               for p in args[1:])
            return (f"exists({cands}, __is_c -> {quad_ok} "
                    f"AND ({pref}))")
        # has_any_ipv4(source, ip1 [, ip2, ...])
        if len(args) < 2:
            raise ValueError("KQL: has_any_ipv4(source, ip...)")
        wanted = ", ".join(args[1:])
        return (f"exists({cands}, __is_c -> {quad_ok} "
                f"AND __is_c IN ({wanted}))")

    def _ipv6_fn(self, fname: str, args: list[str]) -> str:
        """IPv6 family (parse_ipv6 / parse_ipv6_mask / ipv6_compare /
        ipv6_is_match / ipv6_is_in_range / ipv6_is_in_any_range).
        128-bit addresses don't fit a BIGINT, so these ride the
        Arrow-batched stdlib-`ipaddress` kernels registered in
        _register_ipv6_udfs (the sanctioned pandas-UDF path — same
        contract as the codec scalars). Kusto semantics mirrored:
        IPv4 text is lifted to its IPv4-mapped form (::ffff:a.b.c.d,
        netmask 96 + suffix), an in-address '/p' truncates to the
        network address, compare/match mask with the MINIMUM of the
        argument prefix and both in-address suffixes, in_range masks
        with the range's prefix, invalid input -> null."""
        if fname == "parse_ipv6":
            if len(args) != 1:
                raise ValueError("KQL: parse_ipv6(ip)")
            return f"__kql_ipv6_parse({args[0]})"
        if fname == "parse_ipv6_mask":
            if len(args) != 2:
                raise ValueError("KQL: parse_ipv6_mask(ip, prefix)")
            return (f"__kql_ipv6_parse_mask({args[0]}, "
                    f"CAST({args[1]} AS BIGINT))")
        if fname in ("ipv6_compare", "ipv6_is_match"):
            if len(args) not in (2, 3):
                raise ValueError(f"KQL: {fname}(a, b [, prefix])")
            p = args[2] if len(args) == 3 else "128"
            cmp = (f"__kql_ipv6_cmp({args[0]}, {args[1]}, "
                   f"CAST({p} AS BIGINT))")
            return cmp if fname == "ipv6_compare" else f"({cmp} = 0)"
        if fname == "has_ipv6":
            if len(args) != 1:
                raise ValueError("KQL: has_ipv6(source)")
            return (f"__kql_ipv6_scan({args[0]}, "
                    f"CAST(NULL AS STRING))")
        if fname == "has_any_ipv6":
            # wanted list canonicalized at runtime so any accepted
            # notation of the same address matches (concat_ws drops
            # unparseable entries)
            if len(args) < 2:
                raise ValueError("KQL: has_any_ipv6(source, ip...)")
            wanted = ", ".join(f"__kql_ipv6_parse({a})"
                               for a in args[1:])
            return (f"__kql_ipv6_scan({args[0]}, "
                    f"concat_ws(',', {wanted}))")
        # ipv6_is_in_range(ip, range) / ipv6_is_in_any_range(ip, r...)
        if len(args) < 2:
            raise ValueError(f"KQL: {fname}(ip, range...)")
        if fname == "ipv6_is_in_range" and len(args) != 2:
            raise ValueError("KQL: ipv6_is_in_range(ip, range)")
        terms = [f"__kql_ipv6_in_range({args[0]}, {r})"
                 for r in args[1:]]
        return "(" + " OR ".join(terms) + ")"

    _GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def _geohash_fn(self, fname: str, args: list[str]) -> str:
        """Geohash codec — the spatial BUCKETING primitive (a geohash
        prefix groupBy is how a 100 TB corpus co-locates nearby points
        for spatial joins; same bit-interleaving idea as
        operators/layout.zorder_key, rendered base-32).

        geo_point_to_geohash(lon, lat [, accuracy]) unrolls at COMPILE
        TIME (accuracy is a literal) into pure integer shift/mask
        expressions — quantize lon/lat to ceil/floor(5*accuracy/2)
        bits, interleave starting with longitude, emit 5-bit groups
        through the base-32 alphabet. Whole-stage codegen end-to-end:
        no UDF in the hot grouping path.

        geo_geohash_to_central_point(gh) handles RUNTIME-length input
        with one higher-order fold: per-bit de-interleave (even bit
        positions rebuild the longitude value, odd the latitude), then
        the cell-center arithmetic in a pinned operation order
        (-180 + 360 * (q + 0.5) / 2^n — the scale by a power of two is
        exact, so both engines produce bit-identical doubles). Returns
        a dynamic GeoJSON point like Kusto; invalid input -> null."""
        if fname == "geo_point_to_geohash":
            if len(args) not in (2, 3):
                raise ValueError(
                    "KQL: geo_point_to_geohash(lon, lat [, accuracy])")
            lon, lat = args[0], args[1]
            try:
                p = int(args[2]) if len(args) == 3 else 5
            except ValueError:
                raise ValueError(
                    "KQL: geo_point_to_geohash accuracy must be an "
                    f"integer literal, got {args[2]!r}")
            if not 1 <= p <= 12:
                raise ValueError(
                    "KQL: geo_point_to_geohash accuracy must be 1..12")
            total = 5 * p
            nlon = (total + 1) // 2
            nlat = total // 2
            lonq = (f"least(CAST({(1 << nlon) - 1} AS BIGINT), "
                    f"greatest(CAST(0 AS BIGINT), CAST(floor("
                    f"(CAST({lon} AS DOUBLE) + 180.0e0) / 360.0e0 "
                    f"* {1 << nlon}) AS BIGINT)))")
            latq = (f"least(CAST({(1 << nlat) - 1} AS BIGINT), "
                    f"greatest(CAST(0 AS BIGINT), CAST(floor("
                    f"(CAST({lat} AS DOUBLE) + 90.0e0) / 180.0e0 "
                    f"* {1 << nlat}) AS BIGINT)))")
            terms = []
            for j in range(nlon):
                terms.append(f"shiftleft(shiftright(__gh_s.lq, "
                             f"{nlon - 1 - j}) & 1, {total - 1 - 2 * j})")
            for j in range(nlat):
                terms.append(f"shiftleft(shiftright(__gh_s.tq, "
                             f"{nlat - 1 - j}) & 1, {total - 2 - 2 * j})")
            morton = " + ".join(terms)
            chars = ", ".join(
                f"substring('{self._GH32}', CAST(shiftright(__gh_m, "
                f"{5 * (p - 1 - c)}) & 31 AS INT) + 1, 1)"
                for c in range(p))
            # bind the quantized values once (struct hop), then the
            # morton key once, then render the characters
            return (
                f"(CASE WHEN CAST({lon} AS DOUBLE) BETWEEN -180 AND 180 "
                f"AND CAST({lat} AS DOUBLE) BETWEEN -90 AND 90 THEN "
                f"element_at(transform(array(named_struct("
                f"'lq', {lonq}, 'tq', {latq})), __gh_s -> "
                f"element_at(transform(array({morton}), __gh_m -> "
                f"concat({chars})), 1)), 1) ELSE NULL END)")
        # shared geohash DECODE machinery: central_point / polygon /
        # neighbors all start from the de-interleaved quantized cell
        # coordinates (runtime-length higher-order folds)
        if len(args) != 1:
            raise ValueError(f"KQL: {fname}(gh)")
        gh = args[0]
        total = f"(length({gh}) * 5)"
        # bit t (0-based from the MSB): alphabet index of char t div 5,
        # bit (4 - t mod 5) of that 5-bit group
        bit = (f"shiftright(CAST(instr('{self._GH32}', "
               f"substring({gh}, CAST(__ghd_t div 5 AS INT) + 1, 1)) "
               f"- 1 AS BIGINT), CAST(4 - __ghd_t % 5 AS INT)) & 1")
        lonv = (f"aggregate(sequence(0, {total} - 1), "
                f"CAST(0 AS BIGINT), (__ghd_a, __ghd_t) -> "
                f"CASE WHEN __ghd_t % 2 = 0 THEN __ghd_a * 2 + ({bit}) "
                f"ELSE __ghd_a END)")
        latv = (f"aggregate(sequence(0, {total} - 1), "
                f"CAST(0 AS BIGINT), (__ghd_a, __ghd_t) -> "
                f"CASE WHEN __ghd_t % 2 = 1 THEN __ghd_a * 2 + ({bit}) "
                f"ELSE __ghd_a END)")
        nlon = f"(({total} + 1) div 2)"
        nlat = f"({total} div 2)"
        clon = (f"(-180.0e0 + 360.0e0 * (CAST({lonv} AS DOUBLE) "
                f"+ 0.5e0) / CAST(shiftleft(CAST(1 AS BIGINT), "
                f"CAST({nlon} AS INT)) AS DOUBLE))")
        clat = (f"(-90.0e0 + 180.0e0 * (CAST({latv} AS DOUBLE) "
                f"+ 0.5e0) / CAST(shiftleft(CAST(1 AS BIGINT), "
                f"CAST({nlat} AS INT)) AS DOUBLE))")
        ok = (f"({gh} IS NOT NULL AND length({gh}) BETWEEN 1 AND 12 "
              f"AND {gh} RLIKE '^[{self._GH32}]+$')")
        if fname == "geo_geohash_to_central_point":
            return (f"(CASE WHEN {ok} THEN parse_json(to_json("
                    f"named_struct('type', 'Point', 'coordinates', "
                    f"array({clon}, {clat})))) ELSE NULL END)")
        two_nlon = (f"CAST(shiftleft(CAST(1 AS BIGINT), "
                    f"CAST({nlon} AS INT)) AS DOUBLE)")
        two_nlat = (f"CAST(shiftleft(CAST(1 AS BIGINT), "
                    f"CAST({nlat} AS INT)) AS DOUBLE)")
        if fname == "geo_geohash_to_polygon":
            # the cell RECTANGLE as a GeoJSON polygon (west/south
            # corner from the quantized ints — power-of-two scaling,
            # exact dyadics, same convention as the center)
            w = (f"(-180.0e0 + 360.0e0 * CAST({lonv} AS DOUBLE) "
                 f"/ {two_nlon})")
            e = (f"(-180.0e0 + 360.0e0 * (CAST({lonv} AS DOUBLE) "
                 f"+ 1.0e0) / {two_nlon})")
            s = (f"(-90.0e0 + 180.0e0 * CAST({latv} AS DOUBLE) "
                 f"/ {two_nlat})")
            n = (f"(-90.0e0 + 180.0e0 * (CAST({latv} AS DOUBLE) "
                 f"+ 1.0e0) / {two_nlat})")
            ring = (f"array(array({w}, {s}), array({e}, {s}), "
                    f"array({e}, {n}), array({w}, {n}), "
                    f"array({w}, {s}))")
            return (f"(CASE WHEN {ok} THEN parse_json(to_json("
                    f"named_struct('type', 'Polygon', 'coordinates', "
                    f"array({ring})))) ELSE NULL END)")
        # geo_geohash_neighbors(gh): the up-to-8 adjacent cells at the
        # SAME accuracy — pure integer cell arithmetic (longitude
        # wraps mod 2^nlon, latitude neighbors beyond the poles drop),
        # re-interleaved and re-rendered without any float roundtrip.
        # Output is a SORTED dynamic array (deterministic order).
        ilon = f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({nlon} AS INT)) AS BIGINT)"
        ilat = f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({nlat} AS INT)) AS BIGINT)"
        combos = ", ".join(
            f"named_struct('dx', CAST({dx} AS BIGINT), "
            f"'dy', CAST({dy} AS BIGINT))"
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0))
        # per character c (0-based), bit u of its 5-bit group sits at
        # global bit t = 5c + u; even t reads the longitude int, odd t
        # the latitude int (MSB-first)
        terms = []
        for u in range(5):
            t = f"(5 * __gn_c + {u})"
            idx_lon = f"CAST({nlon} - 1 - ({t} div 2) AS INT)"
            idx_lat = f"CAST({nlat} - 1 - (({t} - 1) div 2) AS INT)"
            terms.append(
                f"shiftleft(IF(pmod({t}, 2) = 0, "
                f"shiftright(__gn_p.lq, {idx_lon}), "
                f"shiftright(__gn_p.tq, {idx_lat})) & 1, {4 - u})")
        group = " + ".join(terms)
        chars = (f"transform(sequence(0, length({gh}) - 1), "
                 f"__gn_c -> substring('{self._GH32}', "
                 f"CAST({group} AS INT) + 1, 1))")
        nbr_cells = (f"filter(transform(array({combos}), __gn_d -> "
                     f"named_struct("
                     f"'lq', pmod(__gn_s.lv + __gn_d.dx, {ilon}), "
                     f"'tq', __gn_s.tv + __gn_d.dy)), "
                     f"__gn_f -> __gn_f.tq >= 0 AND __gn_f.tq < {ilat})")
        strs = (f"transform({nbr_cells}, __gn_p -> "
                f"array_join({chars}, ''))")
        bound = (f"element_at(transform(array(named_struct("
                 f"'lv', {lonv}, 'tv', {latv})), __gn_s -> "
                 f"array_sort({strs})), 1)")
        return (f"(CASE WHEN {ok} THEN parse_json(to_json({bound})) "
                f"ELSE NULL END)")

    _GEO_R = "6371009.0"  # mean Earth radius, same as the distances

    def _geo_hav(self, p: str, q: str) -> str:
        """Haversine meters between two GeoJSON positions ([lon, lat]
        double arrays) — the same mean-radius sphere convention as
        geo_distance_2points."""
        lon1 = f"radians(element_at({p}, 1))"
        lat1 = f"radians(element_at({p}, 2))"
        lon2 = f"radians(element_at({q}, 1))"
        lat2 = f"radians(element_at({q}, 2))"
        hav = (f"(pow(sin(({lat2} - {lat1}) / 2), 2) "
               f"+ cos({lat1}) * cos({lat2}) "
               f"* pow(sin(({lon2} - {lon1}) / 2), 2))")
        return f"(2 * {self._GEO_R} * asin(least(1.0, sqrt({hav}))))"

    def _geo_measure_fn(self, fname: str, args: list[str]) -> str:
        """Runtime geo measures over GeoJSON dynamics — pure
        higher-order SQL folds, no UDF, so they ride whole-stage
        codegen over a 100 TB point/shape table.

        Documented approximations (consistent with this module's geo
        family): lengths/distances use the mean-radius sphere
        (haversine; Kusto uses WGS84 geodesics, <0.5% off);
        geo_polygon_area uses the spherical shoelace
        (Chamberlain-Duquette); geo_polygon_centroid and
        geo_distance_point_to_line evaluate planar formulas in a
        local equirectangular frame (fine for small shapes; no
        antimeridian handling, same policy as geo_point_in_polygon).
        Degenerate geometry (wrong type, <2 line points, zero-area
        ring) yields null, Kusto's error-free convention.

        Every branch binds its from_json(to_json(...)) parse ONCE per
        row through the named_struct/transform hop: the parse text was
        previously SPLICED into each fold-step reference, so each
        coordinate access re-serialized and re-parsed the whole
        geometry (measured 2.5x on the geo-measures scan at sf0.1 —
        the r9 bind-once gotcha, JSON edition). Same values, computed
        once."""
        R = self._GEO_R

        def bind(raw: str, body: str, var: str,
                 extra: dict[str, str] | None = None) -> str:
            fields = [f"'g', {raw}"]
            for k, v in (extra or {}).items():
                fields.append(f"'{k}', {v}")
            return (f"element_at(transform(array(named_struct("
                    f"{', '.join(fields)})), {var} -> {body}), 1)")

        def parsed(arg: str, schema: str) -> str:
            """from_json text for a GeoJSON argument. The generic form
            from_json(to_json(arg)) accepts any dynamic; when the arg
            is ITSELF a parse_json(X) render (every pack()/dynamic()
            literal compiles to one), read from_json(X) directly —
            same parsed values, minus one VARIANT parse and one
            re-serialization PER ROW (the geo-measures scan spends
            most of its time in exactly that round trip)."""
            inner = _unwrap_parse_json(arg)
            src = inner if inner is not None else f"to_json({arg})"
            return f"from_json({src}, '{schema}')"

        if fname == "geo_line_length":
            if len(args) != 1:
                raise ValueError("KQL: geo_line_length(lineString)")
            raw = parsed(args[0], "struct<type:string,coordinates:array<array<double>>>")
            ls = "__gll_b.g"
            pts = f"({ls}).coordinates"
            seg = self._geo_hav(f"element_at({pts}, __gl_i)",
                                f"element_at({pts}, __gl_i + 1)")
            total = (f"aggregate(sequence(1, size({pts}) - 1), "
                     f"CAST(0 AS DOUBLE), "
                     f"(__gl_a, __gl_i) -> __gl_a + {seg})")
            return bind(raw,
                        f"(CASE WHEN ({ls}).type = 'LineString' "
                        f"AND size({pts}) >= 2 THEN {total} "
                        f"ELSE NULL END)", "__gll_b")
        if fname in ("geo_polygon_area", "geo_polygon_centroid"):
            if len(args) != 1:
                raise ValueError(f"KQL: {fname}(polygon)")
            raw = parsed(args[0], "struct<type:string,coordinates:array<array<array<double>>>>")
            pg = "__gpa_b.g"
            rings = f"({pg}).coordinates"
            # EVERY ring needs >= 4 points: a short hole would feed
            # sequence(1, size-1 <= 0), which DESCENDS through index 0
            # and errors under ANSI (the round-5 gotcha) — invalid
            # geometry must null, not crash
            ok = (f"(({pg}).type = 'Polygon' AND size({rings}) >= 1 "
                  f"AND forall({rings}, __gk_r -> "
                  f"size(__gk_r) >= 4))")
            if fname == "geo_polygon_area":
                # spherical shoelace per ring (|sum| * R^2 / 2),
                # holes subtract from the outer ring
                def ring_area(r, pfx):
                    def lon(o):
                        return (f"radians(element_at(element_at({r}, "
                                f"__{pfx}_i{o}), 1))")

                    def lat(o):
                        return (f"sin(radians(element_at("
                                f"element_at({r}, __{pfx}_i{o}), 2)))")
                    term = (f"({lon(' + 1')} - {lon('')})"
                            f" * (2.0 + {lat('')} "
                            f"+ {lat(' + 1')})")
                    s = (f"aggregate(sequence(1, size({r}) - 1), "
                         f"CAST(0 AS DOUBLE), (__{pfx}_a, __{pfx}_i)"
                         f" -> __{pfx}_a + {term})")
                    return f"(abs({s}) * {R} * {R} / 2)"
                outer = ring_area(f"element_at({rings}, 1)", "go")
                hole = ring_area(f"element_at({rings}, __gh_k)", "gr")
                holes = (f"(CASE WHEN size({rings}) >= 2 THEN "
                         f"aggregate(sequence(2, size({rings})), "
                         f"CAST(0 AS DOUBLE), (__gh_a, __gh_k) -> "
                         f"__gh_a + {hole}) ELSE 0.0 END)")
                return bind(raw,
                            f"(CASE WHEN {ok} THEN "
                            f"greatest({outer} - {holes}, 0.0) "
                            f"ELSE NULL END)", "__gpa_b")
            # centroid: planar shoelace over the outer ring, returned
            # as a GeoJSON Point dynamic
            o = f"element_at({rings}, 1)"

            def coord(axis, off):
                return (f"element_at(element_at({o}, "
                        f"__gc_i{off}), {axis})")

            def fold(term):
                return (f"aggregate(sequence(1, size({o}) - 1), "
                        f"CAST(0 AS DOUBLE), (__gc_a, __gc_i) -> "
                        f"__gc_a + {term})")
            xi, yi = coord(1, ""), coord(2, "")
            xj, yj = coord(1, " + 1"), coord(2, " + 1")
            cross = f"({xi} * {yj} - {xj} * {yi})"
            a2 = fold(cross)
            cx = f"({fold(f'({xi} + {xj}) * {cross}')} / (3 * {a2}))"
            cy = f"({fold(f'({yi} + {yj}) * {cross}')} / (3 * {a2}))"
            pt = (f"named_struct('type', 'Point', 'coordinates', "
                  f"array({cx}, {cy}))")
            return bind(raw,
                        f"(CASE WHEN {ok} AND {a2} != 0 THEN "
                        f"parse_json(to_json({pt})) ELSE NULL END)",
                        "__gpa_b")
        if fname == "geo_polygon_perimeter":
            # total boundary length in meters: haversine edge sum over
            # EVERY ring (outer + holes), matching Kusto's perimeter
            # convention; GeoJSON rings repeat the first point last so
            # the edge fold needs no closing term
            if len(args) != 1:
                raise ValueError("KQL: geo_polygon_perimeter(polygon)")
            raw = parsed(args[0], "struct<type:string,coordinates:array<array<array<double>>>>")
            pg = "__gpp_b.g"
            rings = f"({pg}).coordinates"
            ok = (f"(({pg}).type = 'Polygon' AND size({rings}) >= 1 "
                  f"AND forall({rings}, __pk_r -> "
                  f"size(__pk_r) >= 4))")
            ring = f"element_at({rings}, __pq_k)"
            seg = self._geo_hav(f"element_at({ring}, __pp_i)",
                                f"element_at({ring}, __pp_i + 1)")
            ring_len = (f"aggregate(sequence(1, size({ring}) - 1), "
                        f"CAST(0 AS DOUBLE), (__pp_a, __pp_i) -> "
                        f"__pp_a + {seg})")
            total = (f"aggregate(sequence(1, size({rings})), "
                     f"CAST(0 AS DOUBLE), (__pq_a, __pq_k) -> "
                     f"__pq_a + {ring_len})")
            return bind(raw,
                        f"(CASE WHEN {ok} THEN {total} ELSE NULL END)",
                        "__gpp_b")
        if fname == "geo_line_centroid":
            # length-weighted centroid of the line's segments
            # (haversine weights, raw-degree midpoints — documented
            # planar-midpoint approximation consistent with the
            # family). A zero-length line degenerates to its first
            # point; wrong type / <2 points -> null.
            if len(args) != 1:
                raise ValueError("KQL: geo_line_centroid(lineString)")
            raw = parsed(args[0], "struct<type:string,coordinates:array<array<double>>>")
            ls = "__glc_b.g"
            pts = f"({ls}).coordinates"

            def fold(pfx, term):
                return (f"aggregate(sequence(1, size({pts}) - 1), "
                        f"CAST(0 AS DOUBLE), (__{pfx}_a, __{pfx}_i) "
                        f"-> __{pfx}_a + {term})")

            def coord(pfx, axis, off):
                return (f"element_at(element_at({pts}, "
                        f"__{pfx}_i{off}), {axis})")
            w = {p: self._geo_hav(f"element_at({pts}, __{p}_i)",
                                  f"element_at({pts}, __{p}_i + 1)")
                 for p in ("lcw", "lcx", "lcy")}
            sumw = fold("lcw", w["lcw"])
            sumx = fold("lcx", f"{w['lcx']} * ({coord('lcx', 1, '')} "
                               f"+ {coord('lcx', 1, ' + 1')}) / 2")
            sumy = fold("lcy", f"{w['lcy']} * ({coord('lcy', 2, '')} "
                               f"+ {coord('lcy', 2, ' + 1')}) / 2")
            first = f"element_at({pts}, 1)"
            pt = (f"named_struct('type', 'Point', 'coordinates', "
                  f"array({sumx} / {sumw}, {sumy} / {sumw}))")
            degen = (f"named_struct('type', 'Point', 'coordinates', "
                     f"array(element_at({first}, 1), "
                     f"element_at({first}, 2)))")
            return bind(raw,
                        f"(CASE WHEN ({ls}).type = 'LineString' "
                        f"AND size({pts}) >= 2 THEN "
                        f"(CASE WHEN {sumw} > 0 THEN "
                        f"parse_json(to_json({pt})) "
                        f"ELSE parse_json(to_json({degen})) END) "
                        f"ELSE NULL END)", "__glc_b")
        if fname == "geo_distance_point_to_polygon":
            # 0 when the point is inside (even-odd parity across ALL
            # rings — a hole flips parity back to outside), else the
            # min point-to-segment distance over every ring's edges in
            # the local equirectangular frame (meters) — the same
            # planar approximations as geo_distance_point_to_line /
            # geo_point_in_polygon, documented there
            if len(args) != 3:
                raise ValueError("KQL: geo_distance_point_to_polygon("
                                 "lon, lat, polygon)")
            raw_x = f"CAST({args[0]} AS DOUBLE)"
            raw_y = f"CAST({args[1]} AS DOUBLE)"
            raw = parsed(args[2], "struct<type:string,coordinates:array<array<array<double>>>>")
            lon0, lat0, pg = "__gdp_b.x", "__gdp_b.y", "__gdp_b.g"
            rings = f"({pg}).coordinates"
            ok = (f"(({pg}).type = 'Polygon' AND size({rings}) >= 1 "
                  f"AND forall({rings}, __pj_r -> size(__pj_r) >= 4) "
                  f"AND {lon0} BETWEEN -180 AND 180 "
                  f"AND {lat0} BETWEEN -90 AND 90)")
            ring_d = f"element_at({rings}, __pe_k)"

            def px(i):
                return (f"(radians(element_at(element_at({ring_d}, "
                        f"{i}), 1) - {lon0}) * cos(radians({lat0})) "
                        f"* {R})")

            def py(i):
                return (f"(radians(element_at(element_at({ring_d}, "
                        f"{i}), 2) - {lat0}) * {R})")
            ax, ay = px("__pd_i"), py("__pd_i")
            bx, by = px("__pd_i + 1"), py("__pd_i + 1")
            dx, dy = f"({bx} - {ax})", f"({by} - {ay})"
            d2 = f"({dx} * {dx} + {dy} * {dy})"
            t = (f"(CASE WHEN {d2} = 0 THEN 0.0 ELSE "
                 f"greatest(0.0, least(1.0, "
                 f"-({ax} * {dx} + {ay} * {dy}) / {d2})) END)")
            qx, qy = f"({ax} + {t} * {dx})", f"({ay} + {t} * {dy})"
            dist = f"sqrt({qx} * {qx} + {qy} * {qy})"
            ring_min = (f"aggregate(sequence(1, size({ring_d}) - 1), "
                        f"CAST('Infinity' AS DOUBLE), "
                        f"(__pd_a, __pd_i) -> least(__pd_a, {dist}))")
            best = (f"aggregate(sequence(1, size({rings})), "
                    f"CAST('Infinity' AS DOUBLE), "
                    f"(__pe_a, __pe_k) -> least(__pe_a, {ring_min}))")
            # even-odd ray cast on raw degrees; CASE keeps the edge
            # division unevaluated when the edge can't cross (Spark
            # AND does not guarantee short-circuit under ANSI)
            ring_c = f"element_at({rings}, __pg_k)"

            def cxy(axis, off):
                return (f"element_at(element_at({ring_c}, "
                        f"__pf_i{off}), {axis})")
            xi, yi = cxy(1, ""), cxy(2, "")
            xj, yj = cxy(1, " + 1"), cxy(2, " + 1")
            crossing = (f"(CASE WHEN ({yi} > {lat0}) != ({yj} > {lat0}) "
                        f"THEN (CASE WHEN {lon0} < ({xj} - {xi}) * "
                        f"({lat0} - {yi}) / ({yj} - {yi}) + {xi} "
                        f"THEN 1 ELSE 0 END) ELSE 0 END)")
            ring_cnt = (f"aggregate(sequence(1, size({ring_c}) - 1), "
                        f"0, (__pf_a, __pf_i) -> __pf_a + {crossing})")
            cnt = (f"aggregate(sequence(1, size({rings})), 0, "
                   f"(__pg_a, __pg_k) -> __pg_a + {ring_cnt})")
            return bind(raw,
                        f"(CASE WHEN {ok} THEN (CASE WHEN "
                        f"pmod({cnt}, 2) = 1 THEN 0.0 ELSE {best} END) "
                        f"ELSE NULL END)", "__gdp_b",
                        extra={"x": raw_x, "y": raw_y})
        # geo_distance_point_to_line(lon, lat, line): min planar
        # point-to-segment distance in a local equirectangular frame
        # centered on the point (meters)
        if len(args) != 3:
            raise ValueError(
                "KQL: geo_distance_point_to_line(lon, lat, line)")
        raw_x, raw_y = f"CAST({args[0]} AS DOUBLE)", \
            f"CAST({args[1]} AS DOUBLE)"
        raw = parsed(args[2], "struct<type:string,coordinates:array<array<double>>>")
        lon0, lat0, ls = "__gdl_b.x", "__gdl_b.y", "__gdl_b.g"
        pts = f"({ls}).coordinates"

        def px(i):
            return (f"(radians(element_at(element_at({pts}, {i}), 1) "
                    f"- {lon0}) * cos(radians({lat0})) * {R})")

        def py(i):
            return (f"(radians(element_at(element_at({pts}, {i}), 2) "
                    f"- {lat0}) * {R})")
        ax, ay = px("__gd_i"), py("__gd_i")
        bx, by = px("__gd_i + 1"), py("__gd_i + 1")
        dx, dy = f"({bx} - {ax})", f"({by} - {ay})"
        d2 = f"({dx} * {dx} + {dy} * {dy})"
        t = (f"(CASE WHEN {d2} = 0 THEN 0.0 ELSE "
             f"greatest(0.0, least(1.0, "
             f"-({ax} * {dx} + {ay} * {dy}) / {d2})) END)")
        qx, qy = f"({ax} + {t} * {dx})", f"({ay} + {t} * {dy})"
        dist = f"sqrt({qx} * {qx} + {qy} * {qy})"
        best = (f"aggregate(sequence(1, size({pts}) - 1), "
                f"CAST('Infinity' AS DOUBLE), "
                f"(__gd_a, __gd_i) -> least(__gd_a, {dist}))")
        return bind(raw,
                    f"(CASE WHEN ({ls}).type = 'LineString' "
                    f"AND size({pts}) >= 2 "
                    f"AND {lon0} BETWEEN -180 AND 180 "
                    f"AND {lat0} BETWEEN -90 AND 90 "
                    f"THEN {best} ELSE NULL END)", "__gdl_b",
                    extra={"x": raw_x, "y": raw_y})

    def _geo_point_in_polygon(self, args: list[str]) -> str:
        """geo_point_in_polygon(lon, lat, polygon) — the polygon must
        be a dynamic(...) GeoJSON LITERAL (type Polygon, outer ring +
        optional holes), which the dynamic lexer has already compiled
        to parse_json('<json>'). The geometry is therefore known at
        COMPILE TIME, so the even-odd ray cast unrolls into pure
        arithmetic: one CASE term per non-horizontal edge (horizontal
        edges never flip a horizontal-ray crossing and are dropped
        here, which also removes their zero denominator), summed and
        tested for odd parity; holes subtract. No UDF, no VARIANT at
        runtime — the polygon is constant-folded into codegen, the
        right shape for a containment filter over a 100 TB point
        table. Boundary points are undefined (as in Kusto's docs);
        invalid lon/lat -> null via the range guard.

        DOCUMENTED APPROXIMATION (r10 ADVICE): this is a PLANAR
        even-odd cast on raw lon/lat, whereas Kusto evaluates edges as
        spherical geodesics. The two agree for the small-to-regional
        polygons containment filters use in practice, but diverge for
        continent-scale edges (a geodesic bows away from the planar
        chord), polygons enclosing a pole (no planar ring can), and
        rings crossing the antimeridian. Rather than silently return
        wrong answers, rings whose consecutive vertices jump more than
        180 degrees of longitude (the standard antimeridian-crossing
        signature) are REJECTED at compile time — split such polygons
        at the +/-180 meridian into two rings, which this planar cast
        then handles exactly like Kusto's own split recommendation.
        Geodesic parity for very long edges can be recovered by
        densifying edges client-side (insert intermediate vertices);
        the compile-time unroll scales linearly in vertex count so
        densified rings stay codegen-friendly."""
        import json as _json
        if len(args) != 3:
            raise ValueError(
                "KQL: geo_point_in_polygon(lon, lat, polygon)")
        m = re.fullmatch(r"parse_json\('(.*)'\)", args[2], re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: geo_point_in_polygon needs a dynamic(...) "
                "GeoJSON Polygon literal")
        poly = _json.loads(m.group(1).replace("''", "'"))
        if poly.get("type") != "Polygon" or "coordinates" not in poly:
            raise ValueError(
                "KQL: geo_point_in_polygon polygon must be GeoJSON "
                '{"type":"Polygon","coordinates":[[...]]}')
        for ring in poly["coordinates"]:
            for (x1, _), (x2, _) in zip(ring, ring[1:]):
                if abs(x2 - x1) > 180:
                    raise ValueError(
                        "KQL: geo_point_in_polygon ring crosses the "
                        "antimeridian (consecutive longitudes "
                        f"{x1} -> {x2}); split the polygon at the "
                        "+/-180 meridian into two rings")
        x, y = f"CAST({args[0]} AS DOUBLE)", f"CAST({args[1]} AS DOUBLE)"

        def ring_inside(ring):
            terms = []
            pts = list(ring)
            if pts[0] == pts[-1]:
                pts = pts[:-1]          # closed GeoJSON rings
            for i in range(len(pts)):
                (x1, y1), (x2, y2) = pts[i], pts[(i + 1) % len(pts)]
                if y1 == y2:
                    continue
                c = (f"CASE WHEN ((CAST({y1!r} AS DOUBLE) > {y}) != "
                     f"(CAST({y2!r} AS DOUBLE) > {y})) AND ({x} < "
                     f"(CAST({x2!r} AS DOUBLE) - CAST({x1!r} AS DOUBLE))"
                     f" * ({y} - CAST({y1!r} AS DOUBLE)) / "
                     f"(CAST({y2!r} AS DOUBLE) - CAST({y1!r} AS DOUBLE))"
                     f" + CAST({x1!r} AS DOUBLE)) THEN 1 ELSE 0 END")
                terms.append(c)
            if not terms:
                return "FALSE"
            return f"(({' + '.join(terms)}) % 2 = 1)"

        rings = poly["coordinates"]
        expr = ring_inside(rings[0])
        for hole in rings[1:]:
            expr = f"({expr} AND NOT {ring_inside(hole)})"
        return (f"(CASE WHEN {x} BETWEEN -180 AND 180 "
                f"AND {y} BETWEEN -90 AND 90 THEN {expr} "
                f"ELSE NULL END)")

    @staticmethod
    def _percentilew_sql(v: str, w: str, p: str) -> str:
        """The exact weighted-percentile fold (see percentilew above):
        sorted (value, weight) pairs; the threshold and the pairs bind
        ONCE through a single-element transform scope — embedding the
        total in the fold's lambda body would re-evaluate it per
        element (O(n^2); measured hang on 20k-row groups).

        Weights ride the SAME 1e-4 integer grid as the scale path
        (percentilew_exact / the summarize fast plan), so the fold and
        the window plan agree on every input and the accumulation is
        an exact long sum — adding an unrelated sibling aggregate
        (which flips summarize between the two plans) can never change
        the answer (r12 review)."""
        pairs = (f"array_sort(collect_list(IF({v} IS NULL "
                 f"OR {w} IS NULL OR CAST({w} AS DOUBLE) <= 0, "
                 f"NULL, named_struct("
                 f"'v', CAST({v} AS DOUBLE), "
                 f"'w', CAST(FLOOR(CAST({w} AS DOUBLE) * 10000.0e0 "
                 f"+ 0.5e0) AS BIGINT)))))")
        tot = (f"aggregate({pairs}, CAST(0 AS BIGINT), "
               f"(__pw_a, __pw_x) -> __pw_a + __pw_x.w)")
        step = (f"(__pw_c, __pw_x) -> IF(__pw_c.ans IS NOT NULL, "
                f"__pw_c, named_struct("
                f"'c', __pw_c.c + __pw_x.w, "
                f"'ans', IF(__pw_c.c + __pw_x.w >= __pw_s.t, "
                f"__pw_x.v, CAST(NULL AS DOUBLE))))")
        fold = (f"aggregate(__pw_s.arr, named_struct("
                f"'c', CAST(0 AS BIGINT), "
                f"'ans', CAST(NULL AS DOUBLE)), {step}, "
                f"__pw_f -> __pw_f.ans)")
        return (f"element_at(transform(array(named_struct("
                f"'arr', {pairs}, "
                f"'t', (({p}) / 100.0) * {tot})), "
                f"__pw_s -> {fold}), 1)")

    # Kusto's convert_* unit-conversion scalars (UnitsNet unit names).
    # Factors map each unit to the family's SI base; the conversion is
    # folded at COMPILE TIME into a single multiply (value * from/to),
    # so both engines perform one identical IEEE op — raw doubles
    # hash-match without any rounding helper. The name set is the
    # commonly-used subset of UnitsNet; unknown names raise at compile
    # (never a silent wrong factor). Kusto also accepts unit names as
    # runtime expressions — this compiler requires LITERALS, same
    # documented restriction as datetime_add's period.
    _UNIT_TABLES: dict[str, dict[str, float]] = {
        "convert_angle": {
            "Radian": 1.0, "Degree": 3.141592653589793 / 180,
            "Gradian": 3.141592653589793 / 200,
            "Revolution": 2 * 3.141592653589793,
            "Arcminute": 3.141592653589793 / 10800,
            "Arcsecond": 3.141592653589793 / 648000},
        "convert_length": {
            "Meter": 1.0, "Kilometer": 1000.0, "Decimeter": 0.1,
            "Centimeter": 0.01, "Millimeter": 0.001,
            "Micrometer": 1e-6, "Nanometer": 1e-9, "Mile": 1609.344,
            "Yard": 0.9144, "Foot": 0.3048, "Inch": 0.0254,
            "NauticalMile": 1852.0},
        "convert_mass": {
            "Kilogram": 1.0, "Gram": 1e-3, "Milligram": 1e-6,
            "Microgram": 1e-9, "Tonne": 1000.0,
            "Pound": 0.45359237, "Ounce": 0.028349523125,
            "Stone": 6.35029318},
        "convert_speed": {
            "MeterPerSecond": 1.0,
            "KilometerPerHour": 1000.0 / 3600.0,
            "MilePerHour": 0.44704, "Knot": 1852.0 / 3600.0,
            "FootPerSecond": 0.3048},
        "convert_volume": {
            "CubicMeter": 1.0, "Liter": 1e-3, "Milliliter": 1e-6,
            "CubicFoot": 0.028316846592,
            "CubicInch": 1.6387064e-5, "UsGallon": 0.003785411784,
            "ImperialGallon": 0.00454609},
        "convert_energy": {
            "Joule": 1.0, "Kilojoule": 1e3, "Megajoule": 1e6,
            "Calorie": 4.184, "Kilocalorie": 4184.0,
            "WattHour": 3600.0, "KilowattHour": 3.6e6,
            "BritishThermalUnit": 1055.05585262,
            "Electronvolt": 1.602176634e-19},
        "convert_force": {
            "Newton": 1.0, "Kilonewton": 1e3, "Dyn": 1e-5,
            "PoundForce": 4.4482216152605,
            "KilogramForce": 9.80665},
        "convert_power": {
            "Watt": 1.0, "Kilowatt": 1e3, "Megawatt": 1e6,
            "MechanicalHorsepower": 745.6998715822702,
            "MetricHorsepower": 735.49875},
        "convert_pressure": {
            "Pascal": 1.0, "Kilopascal": 1e3, "Bar": 1e5,
            "Millibar": 100.0, "Atmosphere": 101325.0,
            "PoundForcePerSquareInch": 6894.757293168361,
            "MillimeterOfMercury": 133.322387415,
            "Torr": 101325.0 / 760.0},
    }
    # temperature is AFFINE to Kelvin: K = v * a + b
    _TEMP_UNITS: dict[str, tuple[float, float]] = {
        "Kelvin": (1.0, 0.0),
        "DegreeCelsius": (1.0, 273.15),
        "DegreeFahrenheit": (5.0 / 9.0, 273.15 - 32.0 * 5.0 / 9.0),
    }

    def _convert_unit(self, fname: str, args: list[str]) -> str:
        if len(args) != 3:
            raise ValueError(f"KQL: {fname}(value, from, to)")
        units = []
        for a in args[1:]:
            m = re.fullmatch(r"\s*'(\w+)'\s*", a or "")
            if not m:
                raise ValueError(
                    f"KQL: {fname} needs literal unit names, got {a!r}")
            units.append(m.group(1))
        v = f"CAST({args[0]} AS DOUBLE)"
        if fname == "convert_temperature":
            try:
                (af, bf), (at, bt) = (self._TEMP_UNITS[u]
                                      for u in units)
            except KeyError as e:
                raise ValueError(
                    f"KQL: convert_temperature unknown unit {e}; "
                    f"supported: {sorted(self._TEMP_UNITS)}") from None
            a, b = af / at, (bf - bt) / at
            return (f"({v} * CAST({a!r} AS DOUBLE) "
                    f"+ CAST({b!r} AS DOUBLE))")
        table = self._UNIT_TABLES[fname]
        try:
            ratio = table[units[0]] / table[units[1]]
        except KeyError as e:
            raise ValueError(
                f"KQL: {fname} unknown unit {e}; supported: "
                f"{sorted(table)}") from None
        return f"({v} * CAST({ratio!r} AS DOUBLE))"

    # parse_user_agent families: detection order matters (Edge and
    # Opera embed 'Chrome/'; Safari requires 'Version/'). Each row is
    # (family, version-regex over the UA text). DOCUMENTED
    # APPROXIMATION: Kusto runs the full uap-core ruleset (hundreds of
    # regexes); this covers the major engine families deterministically
    # and reports 'Other' beyond them — the right trade for a codegen
    # expression over a 100 TB log table (no UDF, no ruleset file).
    _UA_BROWSERS = [
        ("Edge", r"Edge?/([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("Opera", r"(?:OPR|Opera)[/ ]([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("Chrome", r"Chrome/([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("Firefox", r"Firefox/([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("Safari", r"Version/([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("IE", r"(?:MSIE |rv:)([0-9]+)(?:\\.([0-9]+))?()"),
    ]
    _UA_GUARDS = {
        "Edge": "Edge?/", "Opera": "(?:OPR/|Opera)",
        "Chrome": "Chrome/", "Firefox": "Firefox/",
        "Safari": "Version/[0-9.]+.*Safari/",
        "IE": "(?:MSIE |Trident/)",
    }
    _UA_OSES = [
        ("Windows", r"Windows NT ([0-9]+)(?:\\.([0-9]+))?()"),
        ("Android", r"Android ([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?"),
        ("iOS", r"(?:iPhone|CPU) OS ([0-9]+)(?:_([0-9]+))?(?:_([0-9]+))?"),
        ("Mac OS X", r"Mac OS X ([0-9]+)[_.]([0-9]+)(?:[_.]([0-9]+))?"),
        ("Linux", r"()()()"),
    ]
    _UA_OS_GUARDS = {
        "Windows": "Windows NT ", "Android": "Android ",
        "iOS": "(?:iPhone|CPU) OS ", "Mac OS X": "Mac OS X ",
        "Linux": "Linux",
    }

    def _parse_user_agent(self, args: list[str]) -> str:
        """parse_user_agent(ua, look_for) — look_for is a literal
        'browser' | 'os' | 'device' or a dynamic array of them; output
        is a dynamic bag shaped like Kusto's
        {"Browser": {"Family", "MajorVersion", "MinorVersion",
        "Patch"}, "OperatingSystem": {...}, "DeviceType": {"Family",
        "Brand", "Model"}}. Family detection unrolls into guarded
        regexp_extracts (see _UA_BROWSERS note on the uap-core
        approximation); missing version parts render ''. Device is the
        coarse class: iPhone/iPad by token, Android models from the
        '; <model> Build/' convention, else Other."""
        if len(args) != 2:
            raise ValueError("KQL: parse_user_agent(ua, look_for)")
        ua = f"CAST({args[0]} AS STRING)"
        spec = args[1].strip()
        wants: list[str] = []
        m = re.fullmatch(r"'(\w+)'", spec)
        if m:
            wants = [m.group(1).lower()]
        else:
            m2 = re.fullmatch(r"array\((.*)\)", spec, re.DOTALL) \
                or re.fullmatch(r"parse_json\('\[(.*)\]'\)", spec,
                                re.DOTALL)
            if m2:
                wants = [w.strip().strip("'\"").lower()
                         for w in m2.group(1).split(",") if w.strip()]
        bad = set(wants) - {"browser", "os", "device"}
        if not wants or bad:
            raise ValueError(
                "KQL: parse_user_agent look_for must be literal "
                "'browser'/'os'/'device' (or an array of them), got "
                f"{spec!r}")

        def fam_chain(rows, guards):
            fam = "CASE"
            for name, _pat in rows:
                fam += (f" WHEN {ua} RLIKE '{guards[name]}' "
                        f"THEN '{name}'")
            return fam + " ELSE 'Other' END"

        def part_chain(rows, guards, group):
            c = "CASE"
            for name, pat in rows:
                c += (f" WHEN {ua} RLIKE '{guards[name]}' THEN "
                      f"regexp_extract({ua}, '{pat}', {group})")
            return c + " ELSE '' END"

        fields = []
        if "browser" in wants:
            fields.append(
                "'Browser', named_struct("
                f"'Family', {fam_chain(self._UA_BROWSERS, self._UA_GUARDS)}, "
                f"'MajorVersion', {part_chain(self._UA_BROWSERS, self._UA_GUARDS, 1)}, "
                f"'MinorVersion', {part_chain(self._UA_BROWSERS, self._UA_GUARDS, 2)}, "
                f"'Patch', {part_chain(self._UA_BROWSERS, self._UA_GUARDS, 3)})")
        if "os" in wants:
            fields.append(
                "'OperatingSystem', named_struct("
                f"'Family', {fam_chain(self._UA_OSES, self._UA_OS_GUARDS)}, "
                f"'MajorVersion', {part_chain(self._UA_OSES, self._UA_OS_GUARDS, 1)}, "
                f"'MinorVersion', {part_chain(self._UA_OSES, self._UA_OS_GUARDS, 2)}, "
                f"'Patch', {part_chain(self._UA_OSES, self._UA_OS_GUARDS, 3)})")
        if "device" in wants:
            model = (f"regexp_extract({ua}, "
                     f"'; ([^;)]*?) Build/', 1)")
            dev_fam = (f"CASE WHEN {ua} RLIKE 'iPhone' THEN 'iPhone' "
                       f"WHEN {ua} RLIKE 'iPad' THEN 'iPad' "
                       f"WHEN {ua} RLIKE 'Android' AND {model} <> '' "
                       f"THEN {model} "
                       f"ELSE 'Other' END")
            brand = (f"CASE WHEN {ua} RLIKE 'iPhone|iPad' THEN 'Apple' "
                     f"ELSE '' END")
            fields.append(
                "'DeviceType', named_struct("
                f"'Family', {dev_fam}, 'Brand', {brand}, "
                f"'Model', CASE WHEN {ua} RLIKE 'iPhone' THEN 'iPhone' "
                f"WHEN {ua} RLIKE 'iPad' THEN 'iPad' "
                f"ELSE {model} END)")
        return (f"parse_json(to_json(named_struct({', '.join(fields)}"
                f")))")

    def _datetime_math(self, fname: str, args: list[str]) -> str:
        """datetime_add / datetime_diff with Kusto's period names.
        datetime_diff counts BOUNDARY crossings (calendar parts via
        year/month arithmetic, week boundaries on Kusto's Sunday weeks,
        sub-day parts via epoch integer division — exact for post-epoch
        timestamps, the domain of every fixture and of log data)."""
        m = re.fullmatch(r"\s*'(\w+)'\s*", args[0] or "")
        if not m:
            raise ValueError(
                f"KQL: {fname} needs a literal period name, got "
                f"{args[0]!r}")
        part = m.group(1).lower()
        if fname == "datetime_add":
            if len(args) != 3:
                raise ValueError("KQL: datetime_add(period, amount, dt)")
            a, dt = args[1], args[2]
            secs = ("CAST(({a}) / 1000.0 AS DECIMAL(18, 6))"
                    if part == "millisecond" else
                    "CAST(({a}) / 1000000.0 AS DECIMAL(18, 6))")
            iv = {
                "year": "make_interval({a}, 0, 0, 0, 0, 0, 0)",
                "quarter": "make_interval(0, 3 * ({a}), 0, 0, 0, 0, 0)",
                "month": "make_interval(0, {a}, 0, 0, 0, 0, 0)",
                "week": "make_interval(0, 0, {a}, 0, 0, 0, 0)",
                "day": "make_interval(0, 0, 0, {a}, 0, 0, 0)",
                "hour": "make_interval(0, 0, 0, 0, {a}, 0, 0)",
                "minute": "make_interval(0, 0, 0, 0, 0, {a}, 0)",
                "second": "make_interval(0, 0, 0, 0, 0, 0, {a})",
                "millisecond": f"make_interval(0, 0, 0, 0, 0, 0, {secs})",
                "microsecond": f"make_interval(0, 0, 0, 0, 0, 0, {secs})",
            }.get(part)
            if iv is None:
                raise ValueError(
                    f"KQL: datetime_add period {part!r} not supported")
            return f"({dt} + {iv.format(a=a)})"
        if len(args) != 3:
            raise ValueError("KQL: datetime_diff(period, dt1, dt2)")
        d1, d2 = args[1], args[2]
        if part == "year":
            return f"(year({d1}) - year({d2}))"
        if part == "quarter":
            return (f"((year({d1}) * 4 + quarter({d1})) "
                    f"- (year({d2}) * 4 + quarter({d2})))")
        if part == "month":
            return (f"((year({d1}) * 12 + month({d1})) "
                    f"- (year({d2}) * 12 + month({d2})))")
        if part == "week":
            def sow(d):
                return (f"(date_trunc('WEEK', {d} + INTERVAL 1 DAY) "
                        f"- INTERVAL 1 DAY)")
            return f"(datediff({sow(d1)}, {sow(d2)}) div 7)"
        if part == "day":
            return f"datediff(CAST({d1} AS DATE), CAST({d2} AS DATE))"
        us = {"hour": 3600000000, "minute": 60000000,
              "second": 1000000, "millisecond": 1000,
              "microsecond": 1}.get(part)
        if us is None:
            raise ValueError(
                f"KQL: datetime_diff period {part!r} not supported")
        return (f"((unix_micros({d1}) div {us}) "
                f"- (unix_micros({d2}) div {us}))")

    def _dynamic_literal(self) -> str:
        """``dynamic(<json>)`` literal: consume the balanced-paren body
        and interpret it. Flat homogeneous numeric/string arrays become
        NATIVE Spark arrays (so series_* / array_* functions consume
        them directly, like Kusto); everything else (bags, nesting,
        mixed types, scalars) lands on VARIANT via parse_json."""
        import json as _json
        self.expect("(")
        depth, parts = 1, []
        while depth:
            t = self.next()
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    break
            if t.kind == "str":
                # Kusto accepts ITS string literals inside dynamic()
                # bodies — single-quoted, KQL escapes (r12 probe find;
                # dynamic(['a']) is valid Kusto but not valid JSON).
                # Decode the KQL literal and re-emit as a JSON string.
                parts.append(_json.dumps(_kql_str_value(t.text)))
            else:
                parts.append(t.text)
        body = "".join(parts)
        try:
            val = _json.loads(body)
        except ValueError:
            raise ValueError(
                f"KQL: dynamic(...) body is not valid JSON: {body!r}")
        if isinstance(val, list) and val and \
                all(isinstance(v, bool) for v in val):
            items = ", ".join("TRUE" if v else "FALSE" for v in val)
            return f"array({items})"
        if isinstance(val, list) and val and \
                all(v is None or (isinstance(v, (int, float))
                                  and not isinstance(v, bool))
                    for v in val) and \
                any(v is not None for v in val):
            # numeric array, possibly with null gaps (series fills
            # consume these directly)
            if any(isinstance(v, float) or v is None for v in val):
                items = ", ".join(
                    "CAST(NULL AS DOUBLE)" if v is None
                    else f"CAST({v!r} AS DOUBLE)" for v in val)
            else:
                items = ", ".join(f"CAST({v} AS BIGINT)" for v in val)
            return f"array({items})"
        if isinstance(val, list) and val and \
                all(isinstance(v, str) for v in val):
            items = ", ".join("'" + v.replace("'", "''") + "'"
                              for v in val)
            return f"array({items})"
        if val is None:
            # Kusto: dynamic(null) IS null — isnull() must see a SQL
            # NULL, not a variant holding JSON null (r13 probe sweep)
            return "CAST(NULL AS VARIANT)"
        esc = body.replace("\\", "\\\\").replace("'", "''")
        return f"parse_json('{esc}')"

    def _infix(self, lhs: str, t: Tok, bp: int) -> str:
        low = t.text.lower()
        if t.text == ".":
            # postfix member access AFTER a rendered expression —
            # d.a.b[0].c / todynamic(s).key (r14 probe find; a plain
            # dotted chain lexes as ONE ident token, so this infix
            # only fires after ']' or ')'). The universal named_struct
            # lift keeps it analysis-valid for every lhs type; the
            # trailing ident may itself be a dotted chain.
            nxt = self.next()
            if nxt.kind != "ident":
                raise ValueError(
                    "KQL: expected a property name after '.'")
            path = nxt.text
            return (f"variant_get(parse_json(to_json(named_struct("
                    f"'x', {lhs}))), '$.x.{path}')")
        if t.text == "[":
            # postfix indexer: arr[i] (0-based; negatives count from
            # the end, Spark element_at semantics) or bag['key']. The
            # base lifts to VARIANT through the named_struct round
            # trip (valid for typed arrays, dynamics and paths alike);
            # both container branches evaluate and coalesce — the
            # wrong-shape branch is null (try_cast guards the int
            # index under ANSI).
            idx = self.parse(0)
            self.expect("]")
            lifted = (f"variant_get(parse_json(to_json(named_struct("
                      f"'x', {lhs}))), '$.x')")
            i = f"try_cast({idx} AS INT)"
            pos = f"IF({i} >= 0, {i} + 1, {i})"
            arrb = (f"try_element_at(from_json(to_json({lifted}), "
                    f"'array<variant>'), {pos})")
            mapb = (f"try_element_at(from_json(to_json({lifted}), "
                    f"'map<string,variant>'), CAST({idx} AS STRING))")
            return f"coalesce({arrb}, {mapb})"
        if low == "and":
            return f"({lhs} AND {self.parse(bp + 1)})"
        if low == "or":
            return f"({lhs} OR {self.parse(bp + 1)})"
        if t.text in _CMP:
            rhs = self.parse(bp + 1)
            lhs, rhs = _coerce_variant_cmp(lhs, rhs, self.df)
            return f"({lhs} {_CMP[t.text]} {rhs})"
        if low in ("=~", "!~"):
            lhs = _str_if_variant(lhs)
            rhs = _str_if_variant(self.parse(bp + 1))
            cmp_op = "=" if low == "=~" else "<>"
            return f"(lower({lhs}) {cmp_op} lower({rhs}))"
        if low == "matches":
            # `matches regex 'pattern'` (Kusto's regex-match operator;
            # Java regex here vs Kusto's RE2 — documented deviation on
            # exotic syntax, identical on the common subset)
            nxt = self.next()
            if nxt.text.lower() != "regex":
                raise ValueError("KQL: expected 'matches regex'")
            rhs = self.parse(bp + 1)
            return f"({_str_if_variant(lhs)} RLIKE {rhs})"
        if low in ("in", "!in", "in~", "!in~"):
            self.expect("(")
            tab = self._tabular_in(lhs, low)
            if tab is not None:
                return tab
            items = [self.parse(0)]
            while self.peek() is not None and self.peek().text == ",":
                self.next()
                items.append(self.parse(0))
            self.expect(")")
            neg = "NOT " if low.startswith("!") else ""
            if low.endswith("~"):
                # case-insensitive membership
                lhs = f"lower({_str_if_variant(lhs)})"
                items = [f"lower({it})" for it in items]
            else:
                # a variant path on the left takes the list's type
                # (same loose-compare coercion as binary comparisons)
                lhs, _ = _coerce_variant_cmp(lhs, items[0], self.df)
            return f"({lhs} {neg}IN ({', '.join(items)}))"
        if low in ("between", "!between"):
            # KQL range: x between (lo .. hi), inclusive both ends;
            # !between is the negated form (r12 probe find)
            self.expect("(")
            lo = self.parse(0)
            self.expect(".")
            self.expect(".")
            hi = self.parse(0)
            self.expect(")")
            lhs, _ = _coerce_variant_cmp(lhs, lo, self.df)
            neg = "NOT " if low.startswith("!") else ""
            return f"({neg}{lhs} BETWEEN {lo} AND {hi})"
        base = low.lstrip("!")
        if base in ("contains", "contains_cs", "startswith",
                    "startswith_cs", "endswith", "endswith_cs"):
            lhs = _str_if_variant(lhs)
            rhs = self.parse(bp + 1)
            fn = base.removesuffix("_cs")
            if base.endswith("_cs"):
                expr = f"{fn}({lhs}, {rhs})"
            else:
                expr = f"{fn}(lower({lhs}), lower({rhs}))"
            return (f"(NOT {expr})" if low.startswith("!")
                    else f"({expr})")
        if base in ("has", "has_cs"):
            # KQL 'has' is a whole-term match, not substring
            lhs = _str_if_variant(lhs)
            rhs = self.parse(bp + 1)
            if base == "has_cs":
                expr = (f"array_contains(split({lhs}, "
                        f"'[^a-zA-Z0-9]+'), {rhs})")
            else:
                expr = (f"array_contains(split(lower({lhs}), "
                        f"'[^a-z0-9]+'), lower({rhs}))")
            return (f"(NOT {expr})" if low.startswith("!")
                    else f"({expr})")
        if base in ("hasprefix", "hasprefix_cs", "hassuffix",
                    "hassuffix_cs"):
            # term-prefix/suffix match: some TERM of lhs starts/ends
            # with rhs (same term split as `has`)
            lhs = _str_if_variant(lhs)
            rhs = self.parse(bp + 1)
            fn = ("startswith" if base.startswith("hasprefix")
                  else "endswith")
            if base.endswith("_cs"):
                toks = f"split({lhs}, '[^a-zA-Z0-9]+')"
                needle = rhs
            else:
                toks = f"split(lower({lhs}), '[^a-z0-9]+')"
                needle = f"lower({rhs})"
            expr = (f"exists({toks}, __hp_t -> "
                    f"{fn}(__hp_t, {needle}))")
            return (f"(NOT {expr})" if low.startswith("!")
                    else f"({expr})")
        if low in ("has_any", "has_all"):
            self.expect("(")
            terms = [self.parse(0)]
            while self.peek() is not None and self.peek().text == ",":
                self.next()
                terms.append(self.parse(0))
            self.expect(")")
            toks = f"split(lower({_str_if_variant(lhs)}), '[^a-z0-9]+')"
            joiner = " OR " if low == "has_any" else " AND "
            parts = joiner.join(f"array_contains({toks}, lower({t}))"
                                for t in terms)
            return f"({parts})"
        if t.text in ("+", "-", "*", "/", "%"):
            nxt = self.peek()
            rhs_ts_lit = nxt is not None and nxt.kind == "timespan"
            rhs = self.parse(bp + 1)
            if t.text in ("+", "-"):
                out = self._dt_arith(lhs, t.text, rhs, rhs_ts_lit)
                if out is not None:
                    return out
            # Kusto arithmetic over dynamics (r14 probe find — used
            # to be an AnalysisException): a variant operand coerces
            # to DOUBLE (null on a non-numeric dynamic via try_cast).
            # Documented deviation: the result is real even when both
            # dynamics hold longs (Spark cannot branch the result
            # type on the runtime variant type).
            if _variant_sql_text(lhs, self.df):
                lhs = f"try_cast({lhs} AS DOUBLE)"
            if _variant_sql_text(rhs, self.df):
                rhs = f"try_cast({rhs} AS DOUBLE)"
            return f"({lhs} {t.text} {rhs})"
        raise ValueError(f"KQL: unexpected operator {t.text!r}")

    def _dt_arith(self, lhs: str, op: str, rhs: str,
                  rhs_ts_lit: bool) -> str | None:
        """Kusto raw datetime arithmetic (r13 probe sweep — the gap
        documented since r7): ``ts ± timespan -> timestamp``,
        ``ts - ts -> timespan`` (this engine's µs BIGINT carrier, so
        the result composes with timespan literals/comparisons), and
        ``timespan + ts -> timestamp``. Returns None for plain numeric
        arithmetic. Type detection is text-first (TIMESTAMP literals,
        now()/timestamp_micros renders) with a schema probe only for
        bare columns or when the other operand is timespan/timestamp
        shaped — composite numeric expressions never pay an analysis
        round-trip."""
        def ts_text(s: str) -> bool:
            # prefix forms: literals, now(), unixtime_*, ago(), plus
            # the datetime-returning renders date_trunc (startof*/
            # endof*/bin over datetimes) and make_timestamp
            # (make_datetime) — r13 advice: `startofday(a) - b` must
            # probe as ts-ts, not fall through to plain `-`. Suffix
            # form: an outermost (try_)cast to TIMESTAMP
            # (todatetime renders), modulo wrapping parens.
            return bool(re.match(
                r"\s*\(*\s*(TIMESTAMP '|current_timestamp\s*\("
                r"|timestamp_micros\s*\(|timestampadd\s*\("
                r"|date_trunc\s*\(|make_timestamp\s*\()", s)
                or re.search(r"AS TIMESTAMP\s*\)\s*\)*\s*$", s))

        def bare(s: str) -> bool:
            return bool(re.fullmatch(
                r"\s*\(*\s*(?:`[^`]+`|[A-Za-z_]\w*)\s*\)*\s*", s))

        def is_ts(s: str, allow_probe: bool) -> bool:
            if ts_text(s):
                return True
            if allow_probe or bare(s):
                d = self._probe_dtype(s)
                return (d is not None
                        and d.typeName().startswith("timestamp"))
            return False
        l_ts = is_ts(lhs, rhs_ts_lit or ts_text(rhs))
        if not l_ts:
            if op == "+" and is_ts(rhs, False):
                return (f"timestamp_micros(CAST({lhs} AS BIGINT) "
                        f"+ unix_micros({rhs}))")
            return None
        if is_ts(rhs, True):
            if op == "-":
                return f"(unix_micros({lhs}) - unix_micros({rhs}))"
            raise ValueError("KQL: cannot add two datetimes")
        return (f"timestamp_micros(unix_micros({lhs}) {op} "
                f"CAST({rhs} AS BIGINT))")


def _parse_expr(toks: list[Tok]) -> str:
    p = _ExprParser(toks)
    out = p.parse(0)
    if p.peek() is not None:
        raise ValueError(f"KQL: trailing tokens from {p.peek().text!r}")
    return out


# bin() needs to know whether its argument is a timestamp; that is a
# DataFrame-schema question, so it is resolved by the pipeline compiler,
# not the pure-text expression parser. We intercept bin() calls at the
# token level inside `summarize by` / `extend` instead.
def _render_bin(df: DataFrame, arg_sql: str, size_tok: Tok) -> str:
    if size_tok.kind == "timespan":
        us = _timespan_to_us(size_tok.text)
        return (f"timestamp_micros((unix_micros({arg_sql}) div {us}) "
                f"* {us})")
    size = size_tok.text
    if "." in size or "e" in size.lower():
        # a fractional size literal lexes as DECIMAL in Spark SQL text
        # (the r10 gotcha) — bin(real, 0.5) must stay DOUBLE like Kusto
        size = f"CAST({size} AS DOUBLE)"
    return f"(floor(({arg_sql}) / {size}) * {size})"


# ----------------------------------------------------------------------
# Pipeline splitter / compiler
# ----------------------------------------------------------------------

def _explodable(df: DataFrame, sql: str, bag_kind: str = "bag"):
    """Column for explode(): a dynamic (VARIANT) array casts to
    array<variant> first — Kusto's mv-expand over dynamic — while native
    arrays pass through untouched. Schema probe only, no job.
    ``bag_kind`` controls the OBJECT-dynamic shape (mv-expand
    kind=/bagexpansion=): 'bag' (default) yields one single-property
    bag per entry, 'array' yields one [key, value] two-element array
    per entry (r13 advice: kind=array silently produced the bag
    shape)."""
    c = F.expr(sql)
    try:
        dtype = df.select(c).schema.fields[0].dataType.typeName()
    except Exception:
        return c
    if dtype == "variant":
        # arrays cast straight through; a property BAG expands to one
        # single-property bag per entry (Kusto's mv-expand over an
        # object — r12 probe find) or one [key, value] array under
        # kind=array. try_cast picks the branch at
        # runtime without erroring on either shape.
        # scalar dynamics expand to their single value (Kusto); a null
        # dynamic expands to nothing (the outer CASE keeps explode's
        # null-drop) — r12 review: the 2-branch coalesce silently
        # dropped scalar rows
        bag_entry = (
            "parse_json(to_json(array(cast(__mvb_e.key AS VARIANT), "
            "__mvb_e.value)))" if bag_kind == "array" else
            "parse_json(to_json(map_from_entries(array(__mvb_e))))")
        return F.expr(
            f"CASE WHEN ({sql}) IS NULL "
            f"OR is_variant_null({sql}) THEN NULL ELSE "
            f"coalesce(try_cast(({sql}) AS ARRAY<VARIANT>), "
            f"transform(map_entries(try_cast(({sql}) AS "
            f"MAP<STRING, VARIANT>)), __mvb_e -> "
            f"{bag_entry}), "
            f"array(({sql}))) END")
    return c


def _split_top_semis(q: str) -> list[str]:
    """Split a multi-statement query on top-level ';' (KQL let-statement
    separators), respecting parens/brackets/strings."""
    parts, depth, start, i, n = [], 0, 0, 0, len(q)
    while i < n:
        c = q[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c in "'\"":
            quote = c
            i += 1
            while i < n and q[i] != quote:
                i += 2 if q[i] == "\\" else 1
        elif c == ";" and depth == 0:
            parts.append(q[start:i].strip())
            start = i + 1
        i += 1
    parts.append(q[start:].strip())
    return [p for p in parts if p]


def _split_top_commas_text(q: str) -> list[str]:
    """Split raw text on top-level ',' respecting parens/brackets/
    strings (graph-match pattern lists, where the token-based splitter
    does not apply because edge arrows are not expression tokens)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(q)
    while i < n:
        c = q[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c in "'\"":
            quote = c
            i += 1
            while i < n and q[i] != quote:
                i += 2 if q[i] == "\\" else 1
        elif c == "," and depth == 0:
            parts.append(q[start:i].strip())
            start = i + 1
        i += 1
    parts.append(q[start:].strip())
    return [p for p in parts if p]


_PY_ESC = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'",
           '"': '"', "0": "\0", "a": "\a", "b": "\b", "f": "\f",
           "v": "\v"}


def _py_str_lit(text: str) -> str:
    """KQL string literal token -> Python string (same escape table as
    the parse operator)."""
    body = text[1:-1]
    return re.sub(r"\\(.)",
                  lambda m: _PY_ESC.get(m.group(1), "\\" + m.group(1)),
                  body)


def _compile_py_expr(toks: list[Tok], columns: list[str],
                     state_vars: set[str]):
    """Compile a KQL scalar expression to a PYTHON closure
    ``f(row, st) -> value`` over (row-column dict, scan-state dict).

    This is the evaluator behind ``scan declare (...)`` step
    assignments and state-dependent step predicates — the one place
    expressions CANNOT be precomputed by Catalyst, because they read
    mutable per-sequence state. The supported grammar is the scalar
    subset that state machines actually use (documented): and/or/not,
    comparisons, + - * / %, unary minus, literals, row columns, state
    vars, and the function whitelist strcat / iff|iif / tostring /
    tolong|toint / todouble|toreal / abs / min_of / max_of / strlen /
    isempty / isnotempty / isnull / isnotnull. Null semantics:
    arithmetic with null -> null, comparisons with null -> false,
    strcat treats null as '' (Kusto's contract).

    Returns (closure, used_columns) so the kernel only materializes
    the row columns an expression actually reads."""
    used: set[str] = set()
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = peek()
        if t is None:
            raise ValueError("KQL: scan expression ended unexpectedly")
        pos[0] += 1
        return t

    def expect(text):
        t = take()
        if t.text != text:
            raise ValueError(f"KQL: scan expression expected {text!r}, "
                             f"got {t.text!r}")

    _FNS = {
        "strcat": lambda *a: "".join(
            "" if v is None else str(v) for v in a),
        "iff": lambda c, a, b: a if c else b,
        "iif": lambda c, a, b: a if c else b,
        "tostring": lambda v: "" if v is None else str(v),
        "tolong": lambda v: None if v is None else int(v),
        "toint": lambda v: None if v is None else int(v),
        "todouble": lambda v: None if v is None else float(v),
        "toreal": lambda v: None if v is None else float(v),
        "abs": lambda v: None if v is None else abs(v),
        "min_of": lambda *a: min(v for v in a if v is not None),
        "max_of": lambda *a: max(v for v in a if v is not None),
        "strlen": lambda v: None if v is None else len(str(v)),
        "isempty": lambda v: v is None or v == "",
        "isnotempty": lambda v: not (v is None or v == ""),
        "isnull": lambda v: v is None,
        "isnotnull": lambda v: v is not None,
    }

    def primary():
        t = take()
        if t.kind == "num":
            v = float(t.text) if ("." in t.text or "e" in t.text.lower()) \
                else int(t.text)
            return lambda row, st: v
        if t.kind == "str":
            s = _py_str_lit(t.text)
            return lambda row, st: s
        if t.text == "(":
            e = or_expr()
            expect(")")
            return e
        if t.kind == "ident":
            low = t.text.lower()
            if low in ("true", "false"):
                b = low == "true"
                return lambda row, st: b
            nxt = peek()
            if nxt is not None and nxt.text == "(":
                fn = _FNS.get(low)
                if fn is None:
                    raise ValueError(
                        f"KQL: scan-state expressions support only "
                        f"{sorted(_FNS)}; got {t.text!r}()")
                take()
                args = []
                if peek() is not None and peek().text != ")":
                    args.append(or_expr())
                    while peek() is not None and peek().text == ",":
                        take()
                        args.append(or_expr())
                expect(")")
                return (lambda fn, args: lambda row, st: fn(
                    *[a(row, st) for a in args]))(fn, args)
            name = t.text
            if name in state_vars:
                return lambda row, st: st[name]
            if name in columns:
                used.add(name)
                return lambda row, st: row[name]
            raise ValueError(f"KQL: scan expression references "
                             f"unknown name {name!r}")
        raise ValueError(f"KQL: bad scan expression token {t.text!r}")

    def unary():
        if peek() is not None and peek().text == "-":
            take()
            e = unary()
            return lambda row, st: (lambda v: None if v is None else -v)(
                e(row, st))
        return primary()

    def _arith(a, b, op):
        if a is None or b is None:
            return None
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b if b != 0 else None
        return a % b if b != 0 else None

    def mul():
        e = unary()
        while peek() is not None and peek().text in ("*", "/", "%"):
            op = take().text
            r = unary()
            e = (lambda e, r, op: lambda row, st: _arith(
                e(row, st), r(row, st), op))(e, r, op)
        return e

    def add():
        e = mul()
        while peek() is not None and peek().text in ("+", "-"):
            op = take().text
            r = mul()
            e = (lambda e, r, op: lambda row, st: _arith(
                e(row, st), r(row, st), op))(e, r, op)
        return e

    _CMP = {"==": lambda a, b: a == b, "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}

    def cmp():
        e = add()
        if peek() is not None and peek().text in _CMP:
            op = take().text
            r = add()

            def do(a, b, f=_CMP[op], neq=(op == "!=")):
                if a is None or b is None:
                    # KQL null comparison: != against a non-null IS
                    # true when exactly one side is null
                    return neq and (a is None) != (b is None)
                return f(a, b)
            e = (lambda e, r: lambda row, st: do(
                e(row, st), r(row, st)))(e, r)
        return e

    def not_expr():
        if peek() is not None and peek().kind == "ident" \
                and peek().text.lower() == "not":
            take()
            e = not_expr()
            return lambda row, st: not e(row, st)
        return cmp()

    def and_expr():
        e = not_expr()
        while peek() is not None and peek().kind == "ident" \
                and peek().text.lower() == "and":
            take()
            r = not_expr()
            e = (lambda e, r: lambda row, st:
                 bool(e(row, st)) and bool(r(row, st)))(e, r)
        return e

    def or_expr():
        e = and_expr()
        while peek() is not None and peek().kind == "ident" \
                and peek().text.lower() == "or":
            take()
            r = and_expr()
            e = (lambda e, r: lambda row, st:
                 bool(e(row, st)) or bool(r(row, st)))(e, r)
        return e

    out = or_expr()
    if pos[0] != len(toks):
        raise ValueError(f"KQL: trailing tokens in scan expression at "
                         f"{toks[pos[0]].text!r}")
    return out, used


_STR_LIT_RE = re.compile(r"""'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*\"""")


def _sub_outside_strings(text: str, subs: dict[str, str]) -> str:
    """Word-boundary substitution applied only OUTSIDE string literals
    (scalar let expansion must not rewrite content inside quotes)."""
    if not subs:
        return text
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in subs) + r")\b")
    out, last = [], 0
    for m in _STR_LIT_RE.finditer(text):
        out.append(pat.sub(lambda mm: f"({subs[mm.group(1)]})",
                           text[last:m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(pat.sub(lambda mm: f"({subs[mm.group(1)]})", text[last:]))
    return "".join(out)


def _find_call_spans(text: str, name: str) -> list[tuple[int, int, str]]:
    """(start, end, argtext) spans of ``name( ... )`` calls with balanced
    parens, outside string literals."""
    lit_spans = [(m.start(), m.end()) for m in _STR_LIT_RE.finditer(text)]

    def in_lit(i):
        return any(a <= i < b for a, b in lit_spans)

    spans = []
    for m in re.finditer(rf"\b{re.escape(name)}\s*\(", text):
        if in_lit(m.start()):
            continue
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if not in_lit(i):
                if text[i] == "(":
                    depth += 1
                elif text[i] == ")":
                    depth -= 1
            i += 1
        if depth == 0:
            spans.append((m.start(), i, text[m.end():i - 1]))
    return spans


def _scalar_literal_sql(v) -> str:
    """Render a driver-side Python value as a KQL literal that
    round-trips through THIS module's tokenizer/parser (the toscalar()
    materialization is substituted back into KQL text, so SQL-style
    TIMESTAMP '...' literals would fail to re-parse)."""
    import datetime as _dt
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and not math.isfinite(v):
        # repr() would emit 'inf'/'nan', which the tokenizer lexes as
        # bare identifiers; render via toreal('...') instead — it
        # re-parses as a call and compiles to CAST(.. AS DOUBLE), and
        # Java's Double.parseDouble accepts these exact spellings
        s = ("NaN" if math.isnan(v)
             else "Infinity" if v > 0 else "-Infinity")
        return f"toreal('{s}')"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        # the tokenizer lexes datetime(...) as ONE token; the parser
        # renders it as a timestamp literal — and make-series from/to
        # accepts it, unlike a space-containing SQL literal
        return f"datetime({v.strftime('%Y-%m-%d %H:%M:%S.%f')})"
    if isinstance(v, _dt.date):
        return f"datetime({v.isoformat()})"
    # KQL string escaping: backslash escapes (the tokenizer's rule)
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def _split_pipes(q: str) -> list[str]:
    """Split on top-level '|' (not inside parens/brackets/strings)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(q)
    while i < n:
        c = q[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c in "'\"":
            quote = c
            i += 1
            while i < n and q[i] != quote:
                i += 2 if q[i] == "\\" else 1
        elif c == "|" and depth == 0:
            parts.append(q[start:i].strip())
            start = i + 1
        i += 1
    parts.append(q[start:].strip())
    return [p for p in parts if p]


def _split_top_commas(toks: list[Tok]) -> list[list[Tok]]:
    groups, cur, depth = [], [], 0
    for t in toks:
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        if t.text == "," and depth == 0:
            groups.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        groups.append(cur)
    return groups


def _named_expr(toks: list[Tok], df: DataFrame,
                auto: str) -> tuple[str, str]:
    """Parse `name = expr` or bare `expr`; returns (alias, sql)."""
    if len(toks) >= 2 and toks[0].kind == "ident" and toks[1].text == "=":
        name, body = toks[0].text, toks[2:]
    else:
        name, body = None, toks
    sql = _compile_expr_tokens(body, df)
    if name is None:
        name = body[0].text if len(body) == 1 and body[0].kind == "ident" \
            else auto
    return name, sql


def _expand_col_patterns(groups: list[list[Tok]],
                         cols: list[str]) -> list[str]:
    """Column-name lists with Kusto wildcards: a group whose joined
    text contains ``*`` expands (case-insensitively) against the
    schema; plain names pass through verbatim. Kusto wildcards support
    ONLY ``*`` — ``?``/``[...]`` are literal name characters, so the
    pattern is compiled to a regex with everything but ``*`` escaped
    (r6 advice: fnmatch treated them as glob metacharacters)."""
    out = []
    for g in groups:
        pat = "".join(t.text for t in g)
        if "*" in pat:
            rx = re.compile(".*".join(
                re.escape(p) for p in pat.lower().split("*")) + r"\Z")
            out.extend(c for c in cols if rx.match(c.lower()))
        else:
            out.append(pat)
    return out


#: Row-count ceiling for UNSCOPED serialized ops (prev/next/
#: row_number/row_cumsum/row_rank/scan/sequence_detect/narrow): above
#: it the compile ERRORS instead of warning — at 100 TB a warning is
#: not a guard (r6 verdict #3). Overridable per session via
#: ``spark.kql.globalSerialize.rowLimit``; opt out entirely with
#: ``spark.kql.globalSerialize.allow=true``.
GLOBAL_SERIALIZE_ROW_LIMIT = 10_000_000


def _warn_global_serialize(what: str, df: DataFrame | None = None) -> None:
    """Serialized-order op compiling to a GLOBAL window: correct KQL
    semantics, but the sort collapses to one partition — a scale killer
    on unbounded input. Kusto's own scoping answer is
    ``partition by key ( ... )``, which this compiler supports.

    Always warns. When ``df`` is given (batch only), additionally
    probes the input size and raises above the configured row limit
    unless the session opted in. Probe design: the input's lineage
    usually carries the user's ``sort by``, and ``limit(k)`` over a
    sort plans TakeOrderedAndProject whose top-k selector ALLOCATES k
    slots — a huge configured limit would OOM the JVM right here (it
    did: k=1e9 took down a whole test run). So the fast path uses a
    small bounded k (safe top-k, one scan), and only when the input
    provably exceeds that does it fall back to a full ``count()`` —
    whose Aggregate plan lets Catalyst's EliminateSorts drop the sort
    entirely, making it memory-safe at any size (and still cheaper
    than the single-partition sort being guarded against)."""
    import warnings
    warnings.warn(
        f"KQL: {what} compiles to a single-partition global sort; "
        f"bound the input first (where/take) or scope it with "
        f"'partition by <key> ( ... )' to get a key-partitioned window",
        stacklevel=2)
    if df is None or getattr(df, "isStreaming", False):
        return
    spark = df.sparkSession
    if str(spark.conf.get("spark.kql.globalSerialize.allow",
                          "false")).lower() == "true":
        return
    limit = int(spark.conf.get("spark.kql.globalSerialize.rowLimit",
                               str(GLOBAL_SERIALIZE_ROW_LIMIT)))
    if limit <= 0:
        return
    k = min(limit, 100_000)
    if df.limit(k + 1).count() <= k:
        return  # provably <= k <= limit rows
    if limit > k and df.count() <= limit:
        return
    raise ValueError(
        f"KQL: {what} compiles to a single-partition global sort and "
        f"its input exceeds {limit} rows — a scale killer, refusing. "
        f"Scope it with 'partition by <key> ( ... )', bound the input "
        f"(where/take), raise spark.kql.globalSerialize.rowLimit, or "
        f"opt in with spark.conf.set("
        f"'spark.kql.globalSerialize.allow', 'true').")


def _compile_expr_tokens(toks: list[Tok], df: DataFrame | None,
                         order_sql: list[str] | None = None,
                         partition_sql: list[str] | None = None) -> str:
    """Expression compile with schema-aware bin() and serialized-order
    prev()/next() interception. Inside ``partition by key ( ... )``
    scope the window partitions on the key; otherwise it is a GLOBAL
    (single-partition) window — correct KQL serialized semantics, but a
    scale hazard, so a loud warning fires unless the input was bounded
    first (Kusto's own answer is `partition by` scoping)."""
    out: list[Tok] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if (t.kind == "ident" and t.text.lower() in ("prev", "next")
                and order_sql and i + 1 < len(toks)
                and toks[i + 1].text == "("):
            depth, j = 0, i + 1
            while j < len(toks):
                if toks[j].text == "(":
                    depth += 1
                elif toks[j].text == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            # prev(x [, offset [, default]]) — Kusto's full signature
            argg = _split_top_commas(toks[i + 2:j])
            if not 1 <= len(argg) <= 3:
                raise ValueError(
                    f"KQL: {t.text.lower()}(x [, offset [, default]])")
            inner = _compile_expr_tokens(argg[0], df, order_sql,
                                         partition_sql)
            off = (_compile_expr_tokens(argg[1], df)
                   if len(argg) >= 2 else "1")
            dflt = (", " + _compile_expr_tokens(argg[2], df)
                    if len(argg) == 3 else "")
            fn = "lag" if t.text.lower() == "prev" else "lead"
            if partition_sql:
                over = (f"PARTITION BY {', '.join(partition_sql)} "
                        f"ORDER BY {', '.join(order_sql)}")
            else:
                _warn_global_serialize(t.text.lower() + "()", df)
                over = f"ORDER BY {', '.join(order_sql)}"
            out.append(Tok("rendered",
                           f"{fn}({inner}, {off}{dflt}) "
                           f"OVER ({over})"))
            i = j + 1
            continue
        if (t.kind == "ident" and t.text.lower() == "pack_all"
                and i + 1 < len(toks) and toks[i + 1].text == "("):
            # pack_all([ignore_null_empty]) needs the ROW SCHEMA, so it
            # is intercepted here (like bin) where df is in scope: a
            # dynamic bag of every current column. With
            # ignore_null_empty=true, null / '' / [] / {} values are
            # dropped (Kusto semantics); otherwise nulls are kept
            # (to_json's ignoreNullFields is explicitly disabled).
            depth, j = 0, i + 1
            while j < len(toks):
                if toks[j].text == "(":
                    depth += 1
                elif toks[j].text == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = [x for x in toks[i + 2:j]]
            arg = "".join(x.text for x in inner).strip().lower()
            if arg not in ("", "true", "false"):
                raise ValueError(
                    "KQL: pack_all([ignore_null_empty]) takes at most "
                    "one boolean literal")
            if df is None:
                raise ValueError(
                    "KQL: pack_all needs a table context "
                    "(extend/project over a table, not print)")
            pairs = ", ".join(f"'{c}', `{c}`" for c in df.columns)
            base = (f"to_json(named_struct({pairs}), "
                    f"map('ignoreNullFields', 'false'))")
            if arg == "true":
                m = f"from_json({base}, 'map<string,variant>')"
                kept = (f"map_filter({m}, (__pa_k, __pa_v) -> "
                        f"__pa_v IS NOT NULL AND to_json(__pa_v) "
                        f"NOT IN ('\"\"', '[]', '{{}}', 'null'))")
                rendered = f"parse_json(to_json({kept}))"
            else:
                rendered = f"parse_json({base})"
            out.append(Tok("rendered", rendered))
            i = j + 1
            continue
        if (t.kind == "ident"
                and t.text.lower() in ("bin", "bin_at", "bin_auto")
                and i + 1 < len(toks) and toks[i + 1].text == "("):
            fn = t.text.lower()
            # find matching close paren
            depth, j = 0, i + 1
            while j < len(toks):
                if toks[j].text == "(":
                    depth += 1
                elif toks[j].text == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = toks[i + 2:j]
            groups = _split_top_commas(inner)
            if fn == "bin_auto":
                # bin_auto(x) == bin_at(x, query_bin_auto_size,
                # query_bin_auto_minimum) with the size/anchor taken
                # from the request properties (real Kusto semantics);
                # the stored literal text re-tokenizes here so timespan
                # sizes keep the schema-aware datetime handling
                if len(groups) != 1:
                    raise ValueError("KQL: bin_auto(expr)")
                if _BIN_AUTO_SIZE is None:
                    raise ValueError(
                        "KQL: bin_auto() needs "
                        "`set query_bin_auto_size = ...;`")
                size_toks = _tokenize(_BIN_AUTO_SIZE)
                if len(size_toks) != 1:
                    raise ValueError(
                        "KQL: query_bin_auto_size must be a single "
                        f"literal, got {_BIN_AUTO_SIZE!r}")
                if _BIN_AUTO_MIN is None:
                    if size_toks[0].kind == "timespan":
                        raise ValueError(
                            "KQL: a timespan query_bin_auto_size needs "
                            "`set query_bin_auto_minimum = "
                            "datetime(...);`")
                    min_toks = _tokenize("0")
                else:
                    min_toks = _tokenize(_BIN_AUTO_MIN)
                fn = "bin_at"
                groups = [groups[0], [size_toks[0]], min_toks]
            if fn == "bin":
                if len(groups) != 2 or len(groups[1]) != 1:
                    raise ValueError("KQL: bin(expr, literal_size)")
                arg_sql = _compile_expr_tokens(groups[0], df)
                rendered = _render_bin(df, arg_sql, groups[1][0])
            else:
                if len(groups) != 3 or len(groups[1]) != 1:
                    raise ValueError(
                        "KQL: bin_at(expr, literal_size, fixedPoint)")
                arg_sql = _compile_expr_tokens(groups[0], df)
                fp_sql = _compile_expr_tokens(groups[2], df)
                size_tok = groups[1][0]
                # floored alignment via pmod, so buckets BELOW the fixed
                # point land correctly (integer div truncates toward 0)
                if size_tok.kind == "timespan":
                    us = _timespan_to_us(size_tok.text)
                    rendered = (
                        f"timestamp_micros(unix_micros({arg_sql}) - "
                        f"pmod(unix_micros({arg_sql}) - "
                        f"unix_micros({fp_sql}), {us}))")
                else:
                    size = size_tok.text
                    rendered = (f"(({arg_sql}) - pmod(({arg_sql}) - "
                                f"({fp_sql}), {size}))")
            out.append(Tok("rendered", rendered))
            i = j + 1
            continue
        if (t.kind == "ident" and "." in t.text
                and not t.text.startswith("$")):
            # dynamic member access: d.k.j on a VARIANT column compiles
            # to a variant_get path (binary path walk, no JSON re-parse);
            # struct columns keep native dot access
            base = t.text.split(".", 1)[0]
            try:
                is_variant = any(
                    f.name == base
                    and f.dataType.typeName() == "variant"
                    for f in df.schema.fields)
            except Exception:
                is_variant = False
            if is_variant:
                path = t.text.split(".", 1)[1]
                out.append(Tok(
                    "rendered", f"variant_get(`{base}`, '$.{path}')"))
                i += 1
                continue
        out.append(t)
        i += 1
    # re-parse with rendered fragments treated as atoms
    return _parse_expr_with_atoms(out, df)


def _parse_expr_with_atoms(toks: list[Tok],
                           df: DataFrame | None = None) -> str:
    """Like _parse_expr but 'rendered' tokens pass through as atoms."""
    class P(_ExprParser):
        def _prefix(self):
            t = self.peek()
            if t is not None and t.kind == "rendered":
                self.next()
                return t.text
            return super()._prefix()
    p = P(toks, df)
    res = p.parse(0)
    if p.peek() is not None:
        raise ValueError(f"KQL: trailing tokens from {p.peek().text!r}")
    return res


_JOIN_KINDS = {
    "inner": "inner", "left": "left", "leftouter": "left",
    "right": "right", "rightouter": "right", "fullouter": "outer",
    "leftsemi": "left_semi", "leftanti": "left_anti",
    # Kusto's documented aliases (r13 probe sweep)
    "anti": "left_anti", "leftantisemi": "left_anti",
    "semi": "left_semi",
}

def _register_series_fft_udfs(spark: SparkSession) -> None:
    """Idempotently register the numpy-FFT pandas UDFs behind
    series_fft / series_ifft. The transform itself has no SQL
    expression (Spark has no FFT builtin), so this is one of the
    sanctioned Arrow-batched kernels: each Arrow batch moves the
    array column once, numpy does O(n log n) per series, and the
    result lands back as a struct of two double arrays."""
    if getattr(spark, "_kql_fft_registered", False):
        return
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def make(inverse):
        def f(xr, xi):
            res_r, res_i = [], []
            for r, i in zip(xr, xi):
                if r is None or len(r) == 0:
                    res_r.append(None)
                    res_i.append(None)
                    continue
                a = np.asarray(r, dtype=float)
                b = (np.zeros_like(a)
                     if i is None or len(i) != len(a)
                     else np.asarray(i, dtype=float))
                z = a + 1j * b
                out = np.fft.ifft(z) if inverse else np.fft.fft(z)
                res_r.append([float(v) for v in out.real])
                res_i.append([float(v) for v in out.imag])
            return pd.DataFrame({"real": res_r, "imag": res_i})
        # functional form: the module uses postponed annotations, so
        # decorator type-hint inference cannot see pd.Series here
        return pandas_udf(f, "struct<real:array<double>, "
                             "imag:array<double>>")

    spark.udf.register("__kql_fft", make(False))
    spark.udf.register("__kql_ifft", make(True))

    def fitpoly(ys, xs, degs):
        out = {"rsquare": [], "coefficients": [], "variance": [],
               "rvariance": [], "poly_fit": []}
        for y, x, d in zip(ys, xs, degs):
            if y is None or len(y) == 0:
                for k in out:
                    out[k].append(None)
                continue
            yv = np.asarray(y, dtype=float)
            xv = (np.asarray(x, dtype=float)
                  if x is not None and len(x) == len(yv)
                  else np.arange(len(yv), dtype=float))
            ok = ~(np.isnan(yv) | np.isnan(xv))
            deg = int(d)
            if ok.sum() < deg + 1:
                for k in out:
                    out[k].append(None)
                continue
            coef = np.polyfit(xv[ok], yv[ok], deg)
            fit = np.polyval(coef, xv)
            res = yv[ok] - np.polyval(coef, xv[ok])
            var = float(np.var(yv[ok]))
            rvar = float(np.mean(res * res))
            rsq = 1.0 if var <= 0 else 1.0 - rvar / var
            out["rsquare"].append(float(rsq))
            out["coefficients"].append([float(c) for c in coef])
            out["variance"].append(var)
            out["rvariance"].append(rvar)
            out["poly_fit"].append([float(v) for v in fit])
        return pd.DataFrame(out)

    spark.udf.register(
        "__kql_fitpoly",
        pandas_udf(fitpoly,
                   "struct<rsquare:double, "
                   "coefficients:array<double>, variance:double, "
                   "rvariance:double, poly_fit:array<double>>"))


    def iir(xs, bs, a_s):
        out = []
        for x, b, a in zip(xs, bs, a_s):
            if (x is None or b is None or a is None or len(a) == 0
                    or len(b) == 0 or a[0] == 0):
                out.append(None)
                continue
            xv = np.asarray(x, dtype=float)
            bv = np.asarray(b, dtype=float)
            av = np.asarray(a, dtype=float)
            y = np.zeros(len(xv))
            for i in range(len(xv)):
                acc = 0.0
                for j in range(len(bv)):
                    if 0 <= i - j < len(xv):
                        acc += bv[j] * xv[i - j]
                for j in range(1, len(av)):
                    if i - j >= 0:
                        acc -= av[j] * y[i - j]
                y[i] = acc / av[0]
            out.append([float(v) for v in y])
        return pd.Series(out)

    spark.udf.register("__kql_iir", pandas_udf(iir, "array<double>"))
    spark._kql_fft_registered = True


def _register_dynamic_udfs(spark: SparkSession) -> None:
    """``__kql_dyn2json``: dynamic_to_json's canonical re-serializer —
    sorts object keys at EVERY nesting level, a text-level property no
    SQL expression can reach (map/struct key order is opaque to
    Catalyst). Arrow-batched over the to_json() text of the value."""
    if getattr(spark, "_kql_dyn_registered", False):
        return
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def f(js):
        out = []
        for x in js:
            if x is None:
                out.append(None)
                continue
            try:
                out.append(json.dumps(json.loads(x), sort_keys=True,
                                      separators=(",", ":")))
            except ValueError:
                out.append(x)
        return pd.Series(out)

    # functional form: postponed annotations break decorator hints
    spark.udf.register("__kql_dyn2json", pandas_udf(f, "string"))

    def treepath(js):
        """Kusto treepath: every node path of the bag in the
        bracket-quoted ['a']['b'] form; arrays contribute one
        wildcard hop ['x'][0] per Kusto's doc example shape
        (numeric indexes enumerate), scalars are leaves."""
        def walk(node, prefix, acc):
            if isinstance(node, dict):
                for k, v in node.items():
                    p = f"{prefix}['{k}']"
                    acc.append(p)
                    walk(v, p, acc)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    p = f"{prefix}[{i}]"
                    acc.append(p)
                    walk(v, p, acc)
        out = []
        for x in js:
            if x is None:
                out.append(None)
                continue
            try:
                acc: list = []
                walk(json.loads(x), "", acc)
                out.append(acc)
            except ValueError:
                out.append(None)
        return pd.Series(out)

    spark.udf.register("__kql_treepath",
                       pandas_udf(treepath, "array<string>"))
    spark._kql_dyn_registered = True


def _geo_slerp(p, q, f):
    """Great-circle interpolation between (lon, lat) degree points at
    fraction f (spherical linear interpolation on unit vectors)."""
    import math
    lon1, lat1 = math.radians(p[0]), math.radians(p[1])
    lon2, lat2 = math.radians(q[0]), math.radians(q[1])
    v1 = (math.cos(lat1) * math.cos(lon1),
          math.cos(lat1) * math.sin(lon1), math.sin(lat1))
    v2 = (math.cos(lat2) * math.cos(lon2),
          math.cos(lat2) * math.sin(lon2), math.sin(lat2))
    dot = max(-1.0, min(1.0, sum(a * b for a, b in zip(v1, v2))))
    omega = math.acos(dot)
    if omega < 1e-12:
        return p
    sa = math.sin((1 - f) * omega) / math.sin(omega)
    sb = math.sin(f * omega) / math.sin(omega)
    x, y, z = (sa * a + sb * b for a, b in zip(v1, v2))
    return (math.degrees(math.atan2(y, x)),
            math.degrees(math.atan2(z, math.sqrt(x * x + y * y))))


def _geo_hav_m(p, q):
    """Haversine meters between (lon, lat) degree points (the same
    mean-radius sphere as the SQL geo measures)."""
    import math
    lon1, lat1 = math.radians(p[0]), math.radians(p[1])
    lon2, lat2 = math.radians(q[0]), math.radians(q[1])
    h = (math.sin((lat2 - lat1) / 2) ** 2
         + math.cos(lat1) * math.cos(lat2)
         * math.sin((lon2 - lon1) / 2) ** 2)
    return 2 * 6371009.0 * math.asin(min(1.0, math.sqrt(h)))


def _geo_densify_ring(pts, tol_m):
    """Insert great-circle intermediate points so no edge exceeds
    tol_m meters."""
    import math
    out = [pts[0]]
    for a, b in zip(pts, pts[1:]):
        d = _geo_hav_m(a, b)
        n = max(1, int(math.ceil(d / tol_m)))
        for k in range(1, n):
            out.append(list(_geo_slerp(a, b, k / n)))
        out.append(b)
    return out


def _geo_simplify_ring(pts, eps_m):
    """Ramer-Douglas-Peucker with a perpendicular-distance threshold
    of eps_m meters in a local equirectangular frame centered on the
    ring's first point (iterative stack — no recursion limit)."""
    import math
    if len(pts) <= 2:
        return list(pts)
    r = 6371009.0
    lat0 = math.radians(pts[0][1])

    def xy(p):
        return (math.radians(p[0]) * math.cos(lat0) * r,
                math.radians(p[1]) * r)
    pl = [xy(p) for p in pts]
    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = pl[i]
        bx, by = pl[j]
        dx, dy = bx - ax, by - ay
        d2 = dx * dx + dy * dy
        best, bk = -1.0, -1
        for k in range(i + 1, j):
            px, py = pl[k]
            if d2 == 0:
                dist = math.hypot(px - ax, py - ay)
            else:
                t = max(0.0, min(1.0,
                                 ((px - ax) * dx + (py - ay) * dy)
                                 / d2))
                dist = math.hypot(px - (ax + t * dx),
                                  py - (ay + t * dy))
            if dist > best:
                best, bk = dist, k
        if best > eps_m:
            keep[bk] = True
            stack.append((i, bk))
            stack.append((bk, j))
    return [list(p) for p, k in zip(pts, keep) if k]


def _geo_lines_intersect(pts1, pts2):
    """Any planar segment-pair crossing between two coordinate chains
    (raw lon/lat degrees — the family's documented planar
    approximation; includes collinear-overlap and endpoint touch)."""
    def orient(a, b, c):
        v = ((b[0] - a[0]) * (c[1] - a[1])
             - (b[1] - a[1]) * (c[0] - a[0]))
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
    for a, b in zip(pts1, pts1[1:]):
        for c, d in zip(pts2, pts2[1:]):
            o1, o2 = orient(a, b, c), orient(a, b, d)
            o3, o4 = orient(c, d, a), orient(c, d, b)
            if o1 != o2 and o3 != o4:
                return True
            if o1 == 0 and on_seg(a, b, c):
                return True
            if o2 == 0 and on_seg(a, b, d):
                return True
            if o3 == 0 and on_seg(c, d, a):
                return True
            if o4 == 0 and on_seg(c, d, b):
                return True
    return False


def _h3_api():
    """The optional `h3` package (v3 or v4 API), or None. The H3 cell
    index is defined by ~700 published base-cell/face constants
    (icosahedral gnomonic projection + aperture-7 hex hierarchy);
    unlike the S2/geohash codecs there is no compact closed-form
    arithmetic to re-derive them, so this engine DELEGATES to the
    reference library instead of shipping a lookalike that would mint
    non-conformant tokens. Same import-gated socket pattern as the
    Pillow-gated multimodal decoder."""
    try:
        import h3
    except Exception:
        return None
    return h3


def _register_h3_udfs(spark: SparkSession) -> None:
    """Arrow kernels for the Kusto geo_*h3cell* family, registered
    only when the optional `h3` package is importable (see _h3_api).
    Both the v4 (latlng_to_cell) and v3 (geo_to_h3) APIs are
    accepted."""
    if getattr(spark, "_kql_h3_registered", False):
        return
    h3 = _h3_api()
    if h3 is None:
        return
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    to_cell = getattr(h3, "latlng_to_cell", None) or h3.geo_to_h3
    to_pt = getattr(h3, "cell_to_latlng", None) or h3.h3_to_geo
    parent = getattr(h3, "cell_to_parent", None) or h3.h3_to_parent
    children = (getattr(h3, "cell_to_children", None)
                or h3.h3_to_children)
    disk = getattr(h3, "grid_disk", None) or h3.k_ring
    bound = (getattr(h3, "cell_to_boundary", None)
             or h3.h3_to_geo_boundary)

    def enc(lons, lats, ress):
        out = []
        for lon, lat, res in zip(lons, lats, ress):
            try:
                out.append(to_cell(float(lat), float(lon), int(res)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def center(tokens):
        out = []
        for t in tokens:
            try:
                lat, lon = to_pt(str(t))
                out.append('{"type":"Point","coordinates":[%r,%r]}'
                           % (lon, lat))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    getres = (getattr(h3, "get_resolution", None)
              or h3.h3_get_resolution)

    def par(tokens, levels):
        out = []
        for t, lv in zip(tokens, levels):
            try:
                lv = int(lv)
                if lv < 0:
                    lv = getres(str(t)) - 1
                out.append(parent(str(t), lv))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def kids(tokens):
        out = []
        for t in tokens:
            try:
                out.append(_json.dumps(sorted(
                    children(str(t), getres(str(t)) + 1))))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def rings(tokens, ks):
        out = []
        for t, k in zip(tokens, ks):
            try:
                out.append(_json.dumps(sorted(disk(str(t), int(k)))))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def poly(tokens):
        out = []
        for t in tokens:
            try:
                ring = [[lon, lat] for lat, lon in bound(str(t))]
                ring.append(ring[0])
                out.append(_json.dumps(
                    {"type": "Polygon", "coordinates": [ring]}))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    spark.udf.register("__kql_h3_encode", pandas_udf(enc, "string"))
    spark.udf.register("__kql_h3_center",
                       pandas_udf(center, "string"))
    spark.udf.register("__kql_h3_parent", pandas_udf(par, "string"))
    spark.udf.register("__kql_h3_children",
                       pandas_udf(kids, "string"))
    spark.udf.register("__kql_h3_rings", pandas_udf(rings, "string"))
    spark.udf.register("__kql_h3_polygon",
                       pandas_udf(poly, "string"))
    spark._kql_h3_registered = True


def _register_geo_shape_udfs(spark: SparkSession) -> None:
    """Arrow-batched kernels for the geo shape transforms
    (geo_line_densify/simplify, geo_polygon_densify/simplify,
    geo_intersects_2lines). Recursive/iterative per-shape geometry
    (RDP, slerp subdivision, segment sweep) doesn't decompose into
    SQL folds cleanly, so these ride the pandas-UDF path over the
    module-level pure kernels (directly unit-testable). Per-row cost
    is bounded by the shape's own vertex count — no cross-row state,
    so the kernels scale embarrassingly over a 100 TB shape table."""
    if getattr(spark, "_kql_geo_shape_registered", False):
        return
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _shape_lift(kind, per_ring):
        def lift(docs, params):
            out = []
            for doc, prm in zip(docs, params):
                if doc is None or prm is None:
                    out.append(None)
                    continue
                try:
                    g = _json.loads(doc)
                    p = float(prm)
                    if kind == "line":
                        if (g.get("type") != "LineString"
                                or len(g.get("coordinates", []))
                                < 2):
                            out.append(None)
                            continue
                        coords = per_ring(g["coordinates"], p)
                        if len(coords) < 2:
                            out.append(None)
                            continue
                        out.append(_json.dumps(
                            {"type": "LineString",
                             "coordinates": coords}))
                    else:
                        rings = g.get("coordinates", [])
                        if (g.get("type") != "Polygon" or not rings
                                or any(len(r) < 4 for r in rings)):
                            out.append(None)
                            continue
                        nr = []
                        for ring in rings:
                            s = per_ring(ring, p)
                            # re-close after simplification and keep
                            # ring validity (>= 4 points)
                            if s[0] != s[-1]:
                                s.append(list(s[0]))
                            nr.append(s)
                        if any(len(r) < 4 for r in nr):
                            out.append(None)
                            continue
                        out.append(_json.dumps(
                            {"type": "Polygon",
                             "coordinates": nr}))
                except Exception:
                    out.append(None)
            return pd.Series(out, dtype=object)
        return lift

    def isect_lift(docs1, docs2):
        out = []
        for d1, d2 in zip(docs1, docs2):
            if d1 is None or d2 is None:
                out.append(None)
                continue
            try:
                g1, g2 = _json.loads(d1), _json.loads(d2)
                if (g1.get("type") != "LineString"
                        or g2.get("type") != "LineString"
                        or len(g1.get("coordinates", [])) < 2
                        or len(g2.get("coordinates", [])) < 2):
                    out.append(None)
                    continue
                out.append(_geo_lines_intersect(g1["coordinates"],
                                                g2["coordinates"]))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    spark.udf.register(
        "__kql_geo_densify_line",
        pandas_udf(_shape_lift("line", _geo_densify_ring), "string"))
    spark.udf.register(
        "__kql_geo_simplify_line",
        pandas_udf(_shape_lift("line", _geo_simplify_ring), "string"))
    spark.udf.register(
        "__kql_geo_densify_poly",
        pandas_udf(_shape_lift("poly", _geo_densify_ring), "string"))
    spark.udf.register(
        "__kql_geo_simplify_poly",
        pandas_udf(_shape_lift("poly", _geo_simplify_ring), "string"))
    spark.udf.register("__kql_geo_isect2l",
                       pandas_udf(isect_lift, "boolean"))
    spark._kql_geo_shape_registered = True


def _register_math_udfs(spark: SparkSession) -> None:
    """Arrow-batched kernels for the Kusto special-function scalars —
    gamma/loggamma, erf/erfc, the beta family and welch_test. Spark
    has no SQL expression for any of these; the kernels ride libm
    (math.*) and a vectorized numpy continued-fraction incomplete
    beta (Lentz's algorithm, the standard Numerical-Recipes betacf
    shape), so accuracy is full double precision. Domain errors
    return null (Kusto's to*-style leniency), never raise."""
    if getattr(spark, "_kql_math_registered", False):
        return
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def lift1(fn):
        def f(col):
            out = []
            for x in col:
                if x is None:
                    out.append(None)
                    continue
                try:
                    out.append(float(fn(float(x))))
                except (ValueError, OverflowError):
                    out.append(None)
            return pd.Series(out, dtype="float64")
        return pandas_udf(f, "double")

    spark.udf.register("__kql_gamma", lift1(math.gamma))
    spark.udf.register("__kql_lgamma", lift1(math.lgamma))
    spark.udf.register("__kql_erf", lift1(math.erf))
    spark.udf.register("__kql_erfc", lift1(math.erfc))

    def _betainc(x, a, b):
        """Regularized incomplete beta I_x(a, b), vectorized.
        Continued fraction (Lentz) with the standard symmetry switch
        at x > (a+1)/(a+b+2) for convergence."""
        x = np.asarray(x, dtype=float)
        a = np.asarray(a, dtype=float)
        b = np.asarray(b, dtype=float)
        out = np.full(x.shape, np.nan)
        ok = (a > 0) & (b > 0) & (x >= 0) & (x <= 1)
        out[ok & (x <= 0)] = 0.0
        out[ok & (x >= 1)] = 1.0
        m = ok & (x > 0) & (x < 1)
        if not m.any():
            return out
        xs, as_, bs = x[m], a[m], b[m]
        swap = xs > (as_ + 1.0) / (as_ + bs + 2.0)
        xa = np.where(swap, 1.0 - xs, xs)
        aa = np.where(swap, bs, as_)
        bb = np.where(swap, as_, bs)
        lbeta = (np.vectorize(math.lgamma)(aa + bb)
                 - np.vectorize(math.lgamma)(aa)
                 - np.vectorize(math.lgamma)(bb))
        front = np.exp(lbeta + aa * np.log(xa)
                       + bb * np.log1p(-xa)) / aa
        tiny = 1e-300
        c = np.ones_like(xa)
        d = 1.0 - (aa + bb) * xa / (aa + 1.0)
        d = np.where(np.abs(d) < tiny, tiny, d)
        d = 1.0 / d
        h = d.copy()
        for i in range(1, 200):
            m2 = 2 * i
            num = i * (bb - i) * xa / ((aa + m2 - 1.0) * (aa + m2))
            d = 1.0 + num * d
            d = np.where(np.abs(d) < tiny, tiny, d)
            c = 1.0 + num / c
            c = np.where(np.abs(c) < tiny, tiny, c)
            d = 1.0 / d
            h *= d * c
            num = (-(aa + i) * (aa + bb + i) * xa
                   / ((aa + m2) * (aa + m2 + 1.0)))
            d = 1.0 + num * d
            d = np.where(np.abs(d) < tiny, tiny, d)
            c = 1.0 + num / c
            c = np.where(np.abs(c) < tiny, tiny, c)
            d = 1.0 / d
            delta = d * c
            h *= delta
            if np.all(np.abs(delta - 1.0) < 3e-16):
                break
        val = front * h
        out[m] = np.where(swap, 1.0 - val, val)
        return out

    def beta_cdf(xs, as_, bs):
        r = _betainc(np.asarray(xs, dtype=float),
                     np.asarray(as_, dtype=float),
                     np.asarray(bs, dtype=float))
        return pd.Series(np.where(np.isnan(r), None, r),
                         dtype="float64")

    def beta_pdf(xs, as_, bs):
        x = np.asarray(xs, dtype=float)
        a = np.asarray(as_, dtype=float)
        b = np.asarray(bs, dtype=float)
        with np.errstate(all="ignore"):
            lg = (np.vectorize(math.lgamma)(a + b)
                  - np.vectorize(math.lgamma)(a)
                  - np.vectorize(math.lgamma)(b))
            r = np.exp(lg + (a - 1.0) * np.log(x)
                       + (b - 1.0) * np.log1p(-x))
        bad = ~((a > 0) & (b > 0) & (x > 0) & (x < 1))
        r = np.where(bad, np.nan, r)
        return pd.Series(np.where(np.isnan(r), None, r),
                         dtype="float64")

    def beta_inv(ps, as_, bs):
        """Inverse regularized incomplete beta via bisection (60
        halvings = full double resolution on [0,1])."""
        p = np.asarray(ps, dtype=float)
        a = np.asarray(as_, dtype=float)
        b = np.asarray(bs, dtype=float)
        lo = np.zeros_like(p)
        hi = np.ones_like(p)
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            below = _betainc(mid, a, b) < p
            lo = np.where(below, mid, lo)
            hi = np.where(below, hi, mid)
        r = 0.5 * (lo + hi)
        bad = ~((a > 0) & (b > 0) & (p >= 0) & (p <= 1))
        r = np.where(bad, np.nan, r)
        return pd.Series(np.where(np.isnan(r), None, r),
                         dtype="float64")

    spark.udf.register("__kql_beta_cdf", pandas_udf(beta_cdf, "double"))
    spark.udf.register("__kql_beta_pdf", pandas_udf(beta_pdf, "double"))
    spark.udf.register("__kql_beta_inv", pandas_udf(beta_inv, "double"))

    def welch(m1, v1, n1, m2, v2, n2):
        """Two-sided Welch's t-test p-value from per-sample moments
        (mean, variance, count) — the student-t tail probability via
        the incomplete beta identity
        P(|T| > t) = I_{dof/(dof+t^2)}(dof/2, 1/2)."""
        m1 = np.asarray(m1, dtype=float)
        v1 = np.asarray(v1, dtype=float)
        n1 = np.asarray(n1, dtype=float)
        m2 = np.asarray(m2, dtype=float)
        v2 = np.asarray(v2, dtype=float)
        n2 = np.asarray(n2, dtype=float)
        with np.errstate(all="ignore"):
            se1, se2 = v1 / n1, v2 / n2
            t2 = (m1 - m2) ** 2 / (se1 + se2)
            dof = ((se1 + se2) ** 2
                   / (se1 ** 2 / (n1 - 1.0) + se2 ** 2 / (n2 - 1.0)))
            p = _betainc(dof / (dof + t2), dof / 2.0,
                         np.full_like(dof, 0.5))
        bad = ~((n1 > 1) & (n2 > 1) & (v1 >= 0) & (v2 >= 0)
                & ((v1 / n1 + v2 / n2) > 0))
        p = np.where(bad, np.nan, p)
        return pd.Series(np.where(np.isnan(p), None, p),
                         dtype="float64")

    spark.udf.register("__kql_welch", pandas_udf(welch, "double"))
    spark._kql_math_registered = True


def _register_codec_udfs(spark: SparkSession) -> None:
    """Arrow-batched kernels behind the Kusto codec scalars —
    zlib/gzip compress-to-base64 (and inverses) and punycode / IDNA
    domain encode/decode. No Spark SQL expression reaches DEFLATE or
    RFC 3492, so these are sanctioned pandas-UDF kernels: pure
    stdlib (zlib/gzip/base64/codecs), one Arrow hop per batch, no
    per-row Python UDF. Failure semantics follow Kusto's docs: the
    decompress / punycode functions return an EMPTY STRING on invalid
    input (not null, not an error). gzip compression pins mtime=0 so
    the emitted base64 is deterministic across runs and executors —
    without it every retry of a task would hash differently."""
    if getattr(spark, "_kql_codec_registered", False):
        return
    import base64
    import gzip
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def lift(fn):
        def f(col):
            out = []
            for x in col:
                if x is None:
                    out.append(None)
                    continue
                try:
                    out.append(fn(x))
                except Exception:
                    out.append("")
            return pd.Series(out, dtype=object)
        return pandas_udf(f, "string")

    spark.udf.register("__kql_zlib_c", lift(
        lambda s: base64.b64encode(
            zlib.compress(s.encode("utf-8"))).decode("ascii")))
    spark.udf.register("__kql_zlib_d", lift(
        lambda s: zlib.decompress(
            base64.b64decode(s, validate=True)).decode("utf-8")))
    spark.udf.register("__kql_gzip_c", lift(
        lambda s: base64.b64encode(
            gzip.compress(s.encode("utf-8"), mtime=0)).decode("ascii")))
    spark.udf.register("__kql_gzip_d", lift(
        lambda s: gzip.decompress(
            base64.b64decode(s, validate=True)).decode("utf-8")))
    # punycode_from_string -> RFC 3492 encode; _to_string -> decode
    spark.udf.register("__kql_puny_e", lift(
        lambda s: s.encode("punycode").decode("ascii")))
    spark.udf.register("__kql_puny_d", lift(
        lambda s: s.encode("ascii").decode("punycode")))
    # domain variants: IDNA per-label (xn-- prefixed) form
    spark.udf.register("__kql_idna_e", lift(
        lambda s: s.encode("idna").decode("ascii") if s else ""))
    spark.udf.register("__kql_idna_d", lift(
        lambda s: s.encode("ascii").decode("idna") if s else ""))

    # parse_xml: XML text -> Kusto's dynamic convention as JSON text
    # (attributes keyed '@name', text next to attributes/children
    # keyed '#text', repeated sibling tags collapse to an array,
    # empty elements -> null). stdlib ElementTree, deterministic
    # (document order preserved); invalid XML -> null.
    import json as _json
    import xml.etree.ElementTree as _ET

    def _xml_value(el):
        obj = {}
        for k, v in el.attrib.items():
            obj[f"@{k}"] = v
        for child in el:
            tag = child.tag
            v = _xml_value(child)
            if tag in obj:
                if not isinstance(obj[tag], list):
                    obj[tag] = [obj[tag]]
                obj[tag].append(v)
            else:
                obj[tag] = v
        text = (el.text or "").strip()
        if obj:
            if text:
                obj["#text"] = text
            return obj
        return text if text else None

    def _parse_xml(s):
        root = _ET.fromstring(s)
        return _json.dumps({root.tag: _xml_value(root)},
                           ensure_ascii=False, separators=(",", ":"))

    def xml_lift(col):
        out = []
        for x in col:
            if x is None:
                out.append(None)
                continue
            try:
                out.append(_parse_xml(x))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    spark.udf.register("__kql_parse_xml",
                       pandas_udf(xml_lift, "string"))

    # parse_command_line: command text -> JSON array of arguments.
    # 'windows' follows the documented CommandLineToArgvW rules
    # (2n backslashes + quote -> n backslashes + quote toggle,
    # 2n+1 -> n backslashes + literal quote, "" inside quotes ->
    # literal quote); 'posix' rides stdlib shlex. Null / blank
    # input -> null, unparseable posix input -> null.
    import shlex as _shlex

    def _win_cmdline(s):
        args_, cur, i, n = [], [], 0, len(s)
        in_q = started = False
        while i < n:
            c = s[i]
            if c == "\\":
                j = i
                while j < n and s[j] == "\\":
                    j += 1
                nb = j - i
                if j < n and s[j] == '"':
                    cur.append("\\" * (nb // 2))
                    started = True
                    if nb % 2:
                        cur.append('"')
                        i = j + 1
                    else:
                        i = j
                else:
                    cur.append("\\" * nb)
                    started = True
                    i = j
            elif c == '"':
                if in_q and i + 1 < n and s[i + 1] == '"':
                    cur.append('"')
                    i += 2
                else:
                    in_q = not in_q
                    started = True
                    i += 1
            elif c in " \t" and not in_q:
                if started or cur:
                    args_.append("".join(cur))
                    cur, started = [], False
                i += 1
            else:
                cur.append(c)
                started = True
                i += 1
        if started or cur:
            args_.append("".join(cur))
        return args_

    def cmdline_lift(col, typ):
        out = []
        for x, t in zip(col, typ):
            if x is None or not str(x).strip():
                out.append(None)
                continue
            try:
                toks = (_win_cmdline(str(x)) if t == "windows"
                        else _shlex.split(str(x), posix=True))
                out.append(_json.dumps(toks, ensure_ascii=False,
                                       separators=(",", ":")))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    spark.udf.register("__kql_parse_cmdline",
                       pandas_udf(cmdline_lift, "string"))
    spark._kql_codec_registered = True


_S2_LOOKUP_POS: list[int] = []
_S2_LOOKUP_IJ: list[int] = []


def _s2_tables() -> tuple[list[int], list[int]]:
    """Build the S2 Hilbert-curve lookup tables with the published
    recursion (s2geometry's init_lookup_cell — 4 bits per step, the
    POS_TO_IJ / POS_TO_ORIENTATION quadrant tables). Pure public
    algorithm; built once per process."""
    if _S2_LOOKUP_POS:
        return _S2_LOOKUP_POS, _S2_LOOKUP_IJ
    swap, invert = 1, 2
    pos_to_ij = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1],
                 [3, 1, 0, 2]]
    pos_to_orientation = [swap, 0, 0, invert | swap]
    lookup_pos = [0] * (1 << 12)
    lookup_ij = [0] * (1 << 12)

    def init(level, i, j, orig, pos, orientation):
        if level == 4:
            ij = (i << 4) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = pos_to_ij[orientation]
        for idx in range(4):
            init(level, i + (r[idx] >> 1), j + (r[idx] & 1), orig,
                 pos + idx, orientation ^ pos_to_orientation[idx])

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    _S2_LOOKUP_POS.extend(lookup_pos)
    _S2_LOOKUP_IJ.extend(lookup_ij)
    return _S2_LOOKUP_POS, _S2_LOOKUP_IJ


def _s2_st_to_ij(s):
    import math
    return max(0, min((1 << 30) - 1, int(math.floor((1 << 30) * s))))


def _s2_uv_to_st(u):
    import math
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _s2_st_to_uv(s):
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _s2_xyz_to_face_uv(x, y, z):
    # canonical largest_abs_component tie-break (ties go to the
    # LATER axis, matching s2geometry)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0:
        face += 3
    if face == 0:
        return face, y / x, z / x
    if face == 1:
        return face, -x / y, z / y
    if face == 2:
        return face, -x / z, -y / z
    if face == 3:
        return face, z / x, y / x
    if face == 4:
        return face, z / y, -x / y
    return face, -y / z, -x / z


def _s2_face_uv_to_xyz(face, u, v):
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _s2_leaf_from_face_ij(face, i, j):
    lookup_pos, _ = _s2_tables()
    n = face << 60
    bits = face & 1
    for k in range(7, -1, -1):
        mask = (1 << 4) - 1
        bits += ((i >> (k * 4)) & mask) << 6
        bits += ((j >> (k * 4)) & mask) << 2
        bits = lookup_pos[bits]
        n |= (bits >> 2) << (k * 8)
        bits &= 3
    return n * 2 + 1


def _s2_token_of(cid):
    if cid == 0:
        return "X"
    return format(cid, "016x").rstrip("0")


def _s2_encode_token(lon, lat, level):
    """(lon, lat, level) -> S2 cell token (published s2geometry
    algorithm: unit XYZ -> face (u,v) -> quadratic (s,t) -> 30-bit
    (i,j) -> Hilbert position; token = hex id, trailing zeros
    stripped). None on out-of-range input."""
    import math
    if not (-180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0
            and 0 <= level <= 30):
        return None
    phi, theta = math.radians(lat), math.radians(lon)
    cosphi = math.cos(phi)
    x = math.cos(theta) * cosphi
    y = math.sin(theta) * cosphi
    z = math.sin(phi)
    face, u, v = _s2_xyz_to_face_uv(x, y, z)
    i = _s2_st_to_ij(_s2_uv_to_st(u))
    j = _s2_st_to_ij(_s2_uv_to_st(v))
    lsb = 1 << (2 * (30 - int(level)))
    leaf = _s2_leaf_from_face_ij(face, i, j)
    return _s2_token_of((leaf & ~(lsb - 1)) | lsb)


def _s2_to_face_ij(cid):
    # canonical to_face_ij_orientation: decodes the RAW id (lsb +
    # trailing zeros participate — the center delta rule corrects)
    _, lookup_ij = _s2_tables()
    face = cid >> 61
    bits = face & 1
    i = j = 0
    for k in range(7, -1, -1):
        nbits = 4 if k < 7 else (30 - 7 * 4)
        bits += (int(cid >> (k * 8 + 1))
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = lookup_ij[bits]
        i += (bits >> 6) << (k * 4)
        j += ((bits >> 2) & ((1 << 4) - 1)) << (k * 4)
        bits &= 3
    return face, i, j


def _s2_center_of(token):
    """S2 token -> (lon, lat) of the cell center; None on a malformed
    token (bad hex, odd lsb position, face > 5)."""
    import math
    if not token or not re.fullmatch(r"[0-9a-fA-F]{1,16}",
                                     token.strip()):
        return None
    cid = int(token.strip().ljust(16, "0"), 16)
    lsb = cid & -cid
    if cid == 0 or (lsb.bit_length() - 1) % 2 or (cid >> 61) > 5:
        return None
    face, i, j = _s2_to_face_ij(cid)
    # canonical center rule: si/ti on the doubled grid with delta 1
    # (leaf) / 0 or 2 (curve-direction parity)
    if cid & 1:
        delta = 1
    else:
        delta = 2 if ((i ^ (cid >> 2)) & 1) else 0
    s = (2 * i + delta) / float(1 << 31)
    t = (2 * j + delta) / float(1 << 31)
    x, y, z = _s2_face_uv_to_xyz(face, _s2_st_to_uv(s),
                                 _s2_st_to_uv(t))
    lat = math.degrees(math.atan2(z, math.sqrt(x * x + y * y)))
    lon = math.degrees(math.atan2(y, x))
    return lon, lat


def _s2_parse(token):
    """token -> (cid, lsb, level), or None on malformed input (same
    validation as _s2_center_of)."""
    if not token or not re.fullmatch(r"[0-9a-fA-F]{1,16}",
                                     token.strip()):
        return None
    cid = int(token.strip().ljust(16, "0"), 16)
    lsb = cid & -cid
    if cid == 0 or (lsb.bit_length() - 1) % 2 or (cid >> 61) > 5:
        return None
    return cid, lsb, 30 - (lsb.bit_length() - 1) // 2


def _s2_parent_token(token, level=None):
    """Containing cell at `level` (default: one level up). None when
    the token is malformed or `level` is finer than the cell."""
    p = _s2_parse(token)
    if p is None:
        return None
    cid, _lsb, lvl = p
    tgt = lvl - 1 if level is None else int(level)
    if tgt < 0 or tgt > lvl:
        return None
    nl = 1 << (2 * (30 - tgt))
    return _s2_token_of((cid & ~(nl - 1)) | nl)


def _s2_children_tokens(token):
    """The 4 direct children in Hilbert-curve order (canonical
    child_begin arithmetic: child k = (id - lsb) + (2k+1)*(lsb>>2));
    None for malformed tokens or level-30 leaves."""
    p = _s2_parse(token)
    if p is None:
        return None
    cid, lsb, lvl = p
    if lvl >= 30:
        return None
    clsb = lsb >> 2
    return [_s2_token_of((cid - lsb) + (2 * k + 1) * clsb)
            for k in range(4)]


def _s2_st_to_ij_round(s):
    return max(0, min((1 << 30) - 1, int(round((1 << 30) * s - 0.5))))


def _s2_from_face_ij_wrap(face, i, j):
    """Canonical FromFaceIJWrap: leaf id for (i, j) up to one cell
    beyond the face boundary. Deliberately uses the LINEAR st<->uv
    relation in both directions (the quadratic projection is not
    defined outside the face) — matching s2geometry exactly."""
    k_max = 1 << 30
    i = max(-1, min(k_max, i))
    j = max(-1, min(k_max, j))
    scale = 1.0 / k_max
    limit = 1.0 + 2.220446049250313e-16
    u = max(-limit, min(limit, scale * (2 * (i - (k_max >> 1)) + 1)))
    v = max(-limit, min(limit, scale * (2 * (j - (k_max >> 1)) + 1)))
    face2, u2, v2 = _s2_xyz_to_face_uv(
        *_s2_face_uv_to_xyz(face, u, v))
    return _s2_leaf_from_face_ij(face2,
                                 _s2_st_to_ij_round(0.5 * (u2 + 1)),
                                 _s2_st_to_ij_round(0.5 * (v2 + 1)))


def _s2_neighbors_tokens(token):
    """The 4 edge neighbors at the same level (canonical
    GetEdgeNeighbors: down/right/up/left leaf probes, cross-face via
    FromFaceIJWrap, truncated back to the cell's level)."""
    p = _s2_parse(token)
    if p is None:
        return None
    cid, lsb, level = p
    size = 1 << (30 - level)
    k_max = 1 << 30
    face, i, j = _s2_to_face_ij(cid)
    nl = 1 << (2 * (30 - level))
    out = []
    for di, dj, same in ((0, -size, j - size >= 0),
                         (size, 0, i + size < k_max),
                         (0, size, j + size < k_max),
                         (-size, 0, i - size >= 0)):
        if same:
            leaf = _s2_leaf_from_face_ij(face, i + di, j + dj)
        else:
            leaf = _s2_from_face_ij_wrap(face, i + di, j + dj)
        out.append(_s2_token_of((leaf & ~(nl - 1)) | nl))
    return out


def _s2_polygon_of(token):
    """Cell boundary as a closed [(lon, lat)] ring: the 4 corners in
    (s, t) grid order via the quadratic uv projection (edges are
    rendered as straight chords; true S2 edges are great circles —
    same chord convention as the geo measures)."""
    import math
    p = _s2_parse(token)
    if p is None:
        return None
    cid, _lsb, level = p
    size = 1 << (30 - level)
    face, i, j = _s2_to_face_ij(cid)
    i0, j0 = i - (i % size), j - (j % size)
    corners = []
    for ci, cj in ((i0, j0), (i0 + size, j0),
                   (i0 + size, j0 + size), (i0, j0 + size)):
        s = ci / float(1 << 30)
        t = cj / float(1 << 30)
        x, y, z = _s2_face_uv_to_xyz(face, _s2_st_to_uv(s),
                                     _s2_st_to_uv(t))
        corners.append((math.degrees(math.atan2(y, x)),
                        math.degrees(math.atan2(
                            z, math.sqrt(x * x + y * y)))))
    corners.append(corners[0])
    return corners


def _register_s2_udfs(spark: SparkSession) -> None:
    """Arrow-batched kernels for the S2 cell scalars
    (geo_point_to_s2cell / geo_s2cell_to_central_point). The S2 cell
    id is 64-bit face+Hilbert arithmetic — not expressible in Spark
    SQL integers without the quadrant lookup tables — so this rides
    the sanctioned pandas-UDF path over the module-level pure kernels
    (_s2_encode_token / _s2_center_of, directly property-testable).
    Mutual consistency (encode(center(token)) == token at every
    level) and parent containment are pinned in tests; Kusto-vs-here
    parity holds by both implementing the same published spec (the
    Kusto doc example is pinned)."""
    if getattr(spark, "_kql_s2_registered", False):
        return
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def enc_lift(lons, lats, levels):
        out = []
        for lon, lat, lev in zip(lons, lats, levels):
            if lon is None or lat is None or lev is None:
                out.append(None)
                continue
            try:
                out.append(_s2_encode_token(float(lon), float(lat),
                                            int(lev)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def dec_lift(tokens):
        out = []
        for tok in tokens:
            if tok is None:
                out.append(None)
                continue
            try:
                c = _s2_center_of(str(tok))
                out.append(None if c is None else
                           '{"type":"Point","coordinates":[%r,%r]}'
                           % (c[0], c[1]))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    import json as _json

    def _tok_lift(fn):
        def lift(tokens):
            out = []
            for tok in tokens:
                if tok is None:
                    out.append(None)
                    continue
                try:
                    r = fn(str(tok))
                    out.append(None if r is None else _json.dumps(r))
                except Exception:
                    out.append(None)
            return pd.Series(out, dtype=object)
        return lift

    def parent_lift(tokens, levels):
        out = []
        for tok, lev in zip(tokens, levels):
            if tok is None:
                out.append(None)
                continue
            try:
                out.append(_s2_parent_token(
                    str(tok), None if lev is None or int(lev) < 0
                    else int(lev)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    def poly_lift(tokens):
        out = []
        for tok in tokens:
            if tok is None:
                out.append(None)
                continue
            try:
                ring = _s2_polygon_of(str(tok))
                out.append(None if ring is None else _json.dumps(
                    {"type": "Polygon",
                     "coordinates": [[[lo, la] for lo, la in ring]]}))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    spark.udf.register("__kql_s2_encode", pandas_udf(enc_lift, "string"))
    spark.udf.register("__kql_s2_center", pandas_udf(dec_lift, "string"))
    spark.udf.register("__kql_s2_parent",
                       pandas_udf(parent_lift, "string"))
    spark.udf.register("__kql_s2_children",
                       pandas_udf(_tok_lift(_s2_children_tokens),
                                  "string"))
    spark.udf.register("__kql_s2_neighbors",
                       pandas_udf(_tok_lift(_s2_neighbors_tokens),
                                  "string"))
    spark.udf.register("__kql_s2_polygon",
                       pandas_udf(poly_lift, "string"))
    spark._kql_s2_registered = True


def _register_ipv6_udfs(spark: SparkSession) -> None:
    """Arrow-batched kernels behind the Kusto IPv6 scalars. 128-bit
    address arithmetic doesn't fit Spark's BIGINT, so parsing/masking
    ride Python ints via the stdlib `ipaddress` module — one Arrow hop
    per batch, no per-row Python UDF, deterministic (pure string/int
    math). Semantics (Kusto): IPv4 text lifts to the IPv4-mapped form
    ::ffff:a.b.c.d with netmask 96 + suffix (96 + 32 when absent); an
    in-address '/p' masks to the network address; canonical output is
    the full zero-padded lower-case 8-group form; any invalid address
    or out-of-range prefix -> null. The fixed-width canonical form
    makes lexicographic order equal numeric order — the property the
    DuckDB oracle twin relies on."""
    if getattr(spark, "_kql_ipv6_registered", False):
        return
    import ipaddress

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def parse(s):
        """(value, prefix) for ipv6/ipv4 text with optional '/p',
        or None when invalid."""
        if s is None:
            return None
        addr, sep, sfx = s.strip().partition("/")
        if sep and not sfx.isdigit():
            return None
        if "%" in addr:
            # zone indices (fe80::1%eth0) are a host-local concept the
            # stdlib accepts but Kusto rejects — reject for parity
            return None
        try:
            if ":" not in addr:
                val = 0xFFFF_0000_0000 | int(ipaddress.IPv4Address(addr))
                pfx = 96 + (int(sfx) if sep else 32)
            else:
                val = int(ipaddress.IPv6Address(addr))
                pfx = int(sfx) if sep else 128
        except ValueError:
            return None
        return (val, pfx) if 0 <= pfx <= 128 else None

    def mask(val, pfx):
        return val & ~((1 << (128 - pfx)) - 1)

    def canon(val):
        return ":".join(f"{(val >> (112 - 16 * i)) & 0xFFFF:04x}"
                        for i in range(8))

    def ipv6_parse(col):
        out = []
        for s in col:
            p = parse(s)
            out.append(None if p is None else canon(mask(*p)))
        return pd.Series(out, dtype=object)

    def ipv6_parse_mask(col, pcol):
        out = []
        for s, p in zip(col, pcol):
            a = parse(s)
            if a is None or p is None or not 0 <= p <= 128:
                out.append(None)
            else:
                out.append(canon(mask(a[0], min(a[1], int(p)))))
        return pd.Series(out, dtype=object)

    def ipv6_cmp(acol, bcol, pcol):
        out = []
        for sa, sb, p in zip(acol, bcol, pcol):
            a, b = parse(sa), parse(sb)
            if a is None or b is None or p is None or not 0 <= p <= 128:
                out.append(None)
                continue
            pfx = min(int(p), a[1], b[1])
            ma, mb = mask(a[0], pfx), mask(b[0], pfx)
            out.append(0 if ma == mb else (-1 if ma < mb else 1))
        return pd.Series(out, dtype="Int64")

    import re as _re
    # candidate runs of hex/colon/dot with at least one ':' — validated
    # by the real parser, so the pattern only needs to over-approximate;
    # delimiters are non-candidate characters by construction
    _cand = _re.compile(r"[0-9A-Fa-f:.]*:[0-9A-Fa-f:.]*")

    def ipv6_scan(col, wanted_col):
        """has_ipv6 (wanted is None) / has_any_ipv6 (wanted is a
        comma-joined canonical list): any properly-delimited valid
        IPv6 literal in the text (dotted-quad IPv4 text does NOT
        count — Kusto's has_ipv6 matches IPv6 notation only)."""
        out = []
        for s, w in zip(col, wanted_col):
            if s is None:
                out.append(None)
                continue
            want = None
            if w is not None:
                want = set(w.split(","))
            hit = False
            for m in _cand.finditer(s):
                # proper delimiting: the maximal hex/colon/dot run must
                # not touch an alphanumeric (xfe80::1 and ::zz:: reject;
                # '%' and punctuation are delimiters)
                if m.start() > 0 and s[m.start() - 1].isalnum():
                    continue
                if m.end() < len(s) and s[m.end()].isalnum():
                    continue
                c = m.group(0).strip(".")  # sentence-final dots
                if "%" in c or ":" not in c:
                    continue
                try:
                    v = int(ipaddress.IPv6Address(c))
                except ValueError:
                    continue
                if want is None or canon(v) in want:
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out, dtype=object)

    def ipv6_in_range(icol, rcol):
        out = []
        for si, sr in zip(icol, rcol):
            i, r = parse(si), parse(sr)
            if i is None or r is None:
                out.append(None)
            else:
                out.append(mask(i[0], r[1]) == mask(r[0], r[1]))
        return pd.Series(out, dtype=object)

    spark.udf.register("__kql_ipv6_parse",
                       pandas_udf(ipv6_parse, "string"))
    spark.udf.register("__kql_ipv6_parse_mask",
                       pandas_udf(ipv6_parse_mask, "string"))
    spark.udf.register("__kql_ipv6_cmp", pandas_udf(ipv6_cmp, "long"))
    spark.udf.register("__kql_ipv6_in_range",
                       pandas_udf(ipv6_in_range, "boolean"))
    spark.udf.register("__kql_ipv6_scan",
                       pandas_udf(ipv6_scan, "boolean"))
    spark._kql_ipv6_registered = True


#: fork/facet/materialize cache shared inputs with persist() so N
#: consumers read ONE scan. Handles are registered in COMPILER-SCOPED
#: groups: eviction happens at group granularity, keeping the newest
#: _PERSIST_KEEP compilers' caches live and unpersisting entire older
#: groups. Scoping by compiler (r8 advice) guarantees the
#: currently-compiling query can NEVER evict its own handles — a single
#: query with a materialized let plus many fork/facet persist sites
#: keeps every handle until 4 NEWER queries have compiled, so
#: materialize()'s evaluate-once contract holds for any per-query fanout
#: (including non-deterministic bodies: all consumers observe one
#: evaluation), while a long session still cannot accumulate unbounded
#: executor storage.
_PERSIST_KEEP = 4
#: list of (compiler, handles) — newest last; strong refs are fine
#: (at most _PERSIST_KEEP compilers are retained).
_persisted_groups: list = []


def _register_persist(compiler, df: DataFrame) -> DataFrame:
    df = df.persist()
    for owner, handles in _persisted_groups:
        if owner is compiler:
            handles.append(df)
            return df
    _persisted_groups.append((compiler, [df]))
    while len(_persisted_groups) > _PERSIST_KEEP:
        _, old = _persisted_groups.pop(0)
        for h in old:
            try:
                h.unpersist()
            except Exception:
                pass
    return df


class KqlCompiler:
    """Compiles one KQL tabular pipeline against a table resolver."""

    def _persist_bounded(self, df: DataFrame) -> DataFrame:
        """Persist a shared subtree (fork/facet input, materialize()
        body) in this compiler's eviction group — see
        ``_persisted_groups``: handles created by the current query are
        never evicted before 4 newer queries compile."""
        return _register_persist(self, df)

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        # `sort by` records its keys here; row_number() requires them
        # (KQL's serialized-order semantics made explicit and
        # deterministic — a window over an unordered table would be both
        # nondeterministic and a single-partition bottleneck at scale).
        self._order: list | None = None
        self._order_sql: list[str] | None = None
        # `partition by key ( ... )` sets these for the subquery scope:
        # serialized ops (prev/next/row_number, sort, take) then compile
        # to key-partitioned windows instead of a global sort.
        self._partition: list | None = None
        self._partition_sql: list[str] | None = None
        # True while the current scoped pipeline's rows are ALREADY
        # hash-partitioned by the `partition by` keys and sorted
        # (keys, serialized order) within partitions — i.e. right
        # after the scoped `sort by` stage and through any
        # order/partition-preserving narrow stage. The serialized
        # kernels (scan, row_window_session) consume it to skip their
        # own repartition + sortWithinPartitions: an explicit
        # REPARTITION_BY_COL exchange can never be elided by Catalyst,
        # so without this flag every scoped kernel paid a second
        # shuffle + sort of data already laid out correctly
        # (guide §2.4 — share one exchange between operations keyed
        # the same way).
        self._scoped_sorted = False
        # let-statement bindings: tabular -> DataFrame, scalar -> KQL
        # text, function -> (params, body) expanded macro-style
        self._lets: dict[str, DataFrame] = {}
        self._scalar_lets: dict[str, str] = {}
        self._fn_lets: dict[str, tuple[list[str], str]] = {}
        # tabular-parameter functions: name -> (table_param,
        # scalar_params, raw body) for `T | invoke f(args)`
        self._tab_fn_lets: dict[str, tuple[str, list[str], str]] = {}
        prepare_session(spark)
        _register_series_fft_udfs(spark)
        _register_dynamic_udfs(spark)
        _register_codec_udfs(spark)
        _register_math_udfs(spark)
        _register_ipv6_udfs(spark)
        _register_s2_udfs(spark)
        _register_geo_shape_udfs(spark)
        _register_h3_udfs(spark)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def compile(self, query: str) -> DataFrame:
        """Compile a (possibly multi-statement) query: zero or more
        ``let name = <tabular|scalar|function>;`` statements, then one
        tabular expression. Tabular lets become named DataFrames
        resolvable as sources/operands; scalar lets are expanded
        textually (outside string literals) into the final statement
        before compilation — Catalyst constant-folds them, so a let
        scalar is free. ``let f = (x: type, ...) { expr }`` defines a
        scalar FUNCTION expanded macro-style at each call site (types
        documentary; the body compiles through the normal expression
        parser after parameter substitution). ``toscalar(pipeline)``
        materializes a one-cell subquery on the driver into a literal —
        exactly Kusto's semantics (a separate tiny job, then constant
        folding).

        ``set percentile_mode = approx;`` switches percentile()/
        percentiles() in THIS query to the sketch path (Spark's native
        approx_percentile, a Greenwald-Khanna summary with bounded
        per-group state) — mirroring real Kusto, whose percentile() is
        always a T-digest estimate. The exact interpolated fold stays
        the default because only it can be hash-checked against a SQL
        oracle; the save/restore keeps toscalar sub-compiles from
        leaking the option across queries."""
        global _PERCENTILE_MODE, _BIN_AUTO_SIZE, _BIN_AUTO_MIN
        global _ACTIVE_COMPILER
        prev = (_PERCENTILE_MODE, _BIN_AUTO_SIZE, _BIN_AUTO_MIN)
        prev_comp = _ACTIVE_COMPILER
        _ACTIVE_COMPILER = self
        inq_mark = len(_INQ_VIEWS)
        try:
            return self._compile_stmts(query)
        finally:
            _PERCENTILE_MODE, _BIN_AUTO_SIZE, _BIN_AUTO_MIN = prev
            _ACTIVE_COMPILER = prev_comp
            # drop tabular-in() temp views created in THIS frame: the
            # returned DataFrame's plan was analyzed eagerly, so the
            # view reference is already resolved away (nested toscalar
            # compiles clean their own slice the same way)
            for view, sess in _INQ_VIEWS[inq_mark:]:
                try:
                    sess.catalog.dropTempView(view)
                except Exception:
                    pass
            del _INQ_VIEWS[inq_mark:]

    def _compile_stmts(self, query: str) -> DataFrame:
        stmts = _split_top_semis(query)
        if not stmts:
            raise ValueError("KQL: empty query")
        for s in stmts[:-1]:
            pm = re.match(r"set\s+percentile_mode\s*=\s*(\w+)\s*$", s)
            if pm:
                global _PERCENTILE_MODE
                mode = pm.group(1).lower()
                if mode not in ("exact", "approx"):
                    raise ValueError(
                        f"KQL: percentile_mode must be exact|approx, "
                        f"got {mode!r}")
                _PERCENTILE_MODE = mode
                continue
            ba = re.match(r"set\s+query_bin_auto_(size|minimum)\s*=\s*"
                          r"(.+?)\s*$", s, re.DOTALL)
            if ba:
                global _BIN_AUTO_SIZE, _BIN_AUTO_MIN
                if ba.group(1) == "size":
                    _BIN_AUTO_SIZE = ba.group(2)
                else:
                    _BIN_AUTO_MIN = ba.group(2)
                continue
            if re.match(r"set\s+\w+", s):
                # Kusto client request properties (`set notruncation;`,
                # `set query_results_cache_max_age = ...;`): execution
                # knobs for Kusto's own service — no analogue here,
                # accepted and ignored so real-world scripts run as-is
                continue
            m = re.match(r"let\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*)$",
                         s, re.DOTALL)
            if not m:
                raise ValueError(
                    f"KQL: expected 'let name = ...;', got {s[:40]!r}")
            name, body = m.group(1), m.group(2).strip()
            fm = re.match(r"\(\s*(?P<params>[^)]*)\)\s*\{(?P<body>.*)\}\s*$",
                          body, re.DOTALL)
            mm = re.match(r"materialize\s*\((.*)\)\s*$", body, re.DOTALL)
            tf = re.match(r"\(\s*(?P<t>\w+)\s*:\s*\(\s*\*\s*\)\s*"
                          r"(?:,(?P<rest>[^)]*))?\)\s*\{(?P<body>.*)\}\s*$",
                          body, re.DOTALL)
            if tf:
                # `let f = (T:(*), p1:type, ...) { T | ... };` — a
                # TABULAR function for `| invoke f(...)`: the first
                # parameter binds the piped-in table, the rest expand
                # textually like scalar function-lets
                sparams = [p.split(":")[0].strip()
                           for p in (tf.group("rest") or "").split(",")
                           if p.strip()]
                self._tab_fn_lets[name] = (
                    tf.group("t"), sparams, tf.group("body").strip())
                continue
            if fm:
                # `name:type [= default]` — defaults fill missing
                # trailing call args (Kusto's optional parameters);
                # the default stays RAW KQL text like call args
                params, defaults = [], []
                ptext = fm.group("params").strip()
                if ptext:
                    for p in ptext.split(","):
                        head, _, dflt = p.partition("=")
                        params.append(head.split(":")[0].strip())
                        defaults.append(dflt.strip() or None)
                self._fn_lets[name] = (params, defaults,
                                       self._preprocess(
                    fm.group("body").strip(), keep=frozenset(params)))
            elif mm:
                # Kusto materialize(): evaluate once, reuse — Spark's
                # persist() is the exact analogue (first action fills the
                # cache; later references read it instead of recomputing);
                # handles go through the same bounded LRU registry as
                # fork/facet so long sessions cannot accumulate storage
                self._lets[name] = self._persist_bounded(self._compile_tabular(
                    self._preprocess(mm.group(1).strip())))
            else:
                # decide tabular-vs-scalar AFTER preprocessing: a body
                # that was entirely a toscalar(...) call collapses to a
                # literal and must bind as a scalar let
                pre = self._preprocess(body)
                if self._looks_tabular(pre):
                    self._lets[name] = self._compile_tabular(pre)
                else:
                    self._scalar_lets[name] = pre
        return self._compile_tabular(self._preprocess(stmts[-1]))

    def _preprocess(self, text: str,
                    keep: frozenset[str] = frozenset()) -> str:
        """Statement-level textual passes, in dependency order:
        function-let call expansion (repeated for nested calls, bounded),
        toscalar() materialization, then scalar-let substitution.
        ``keep`` names are EXCLUDED from scalar-let substitution — a
        function-let body preprocessed at definition time must keep its
        parameter names free even when a scalar let shadows one."""
        # True-recursion check up front (call-graph cycle over the
        # function-let bodies): a cycle can never converge, while an
        # acyclic graph always does — so the pass loop below needs no
        # call-site-count cap (a legitimate query with hundreds of call
        # sites must not trip a fixed limit); the huge guard only
        # protects against compiler bugs.
        if self._fn_lets:
            self._check_fn_let_recursion()
        for guard in range(1_000_000):
            changed = False
            for fname, (params, defaults,
                        fbody) in self._fn_lets.items():
                spans = _find_call_spans(text, fname)
                if not spans:
                    continue
                # ONE span per pass — the rightmost (innermost for
                # self-nesting); replacing it invalidates the other
                # spans' offsets, so they are recomputed next pass
                start, end, argtext = spans[-1]
                # args stay RAW KQL text (token round-trip): the
                # expanded body re-enters the KQL parser, so SQL
                # rendering here would double-translate
                args = [" ".join(t.text for t in g) for g in
                        _split_top_commas(_tokenize(argtext))] \
                    if argtext.strip() else []
                if len(args) < len(params):
                    # fill trailing defaults; a missing param with no
                    # default is still an arity error
                    fill = defaults[len(args):]
                    if any(d is None for d in fill):
                        raise ValueError(
                            f"KQL: {fname}() takes {len(params)} "
                            f"args, got {len(args)}")
                    args = args + fill
                elif len(args) > len(params):
                    raise ValueError(
                        f"KQL: {fname}() takes {len(params)} args, "
                        f"got {len(args)}")
                expanded = _sub_outside_strings(
                    fbody, dict(zip(params, args)))
                text = text[:start] + f"({expanded})" + text[end:]
                changed = True
            if not changed:
                break
        else:
            raise ValueError(
                "KQL: function-let expansion exceeded 1,000,000 passes "
                "on an acyclic call graph (compiler bug)")
        # Each pass replaces one toscalar() span with a literal that
        # contains no toscalar (nested calls resolve inside the
        # recursive _preprocess), so the span count strictly decreases
        # — no cap needed, any number of call sites converges.
        while True:
            spans = _find_call_spans(text, "toscalar")
            if not spans:
                break
            # ONE span per pass, rightmost = innermost for nesting;
            # replacing it shifts every other span's offsets, so they
            # are recomputed (a nested toscalar thus resolves
            # inside-out, each inner value collected exactly once)
            start, end, sub = spans[-1]
            inner = self._compile_tabular(self._preprocess(sub.strip()))
            row = inner.limit(1).collect()
            val = row[0][0] if row else None
            text = text[:start] + _scalar_literal_sql(val) + text[end:]
        subs = {k: v for k, v in self._scalar_lets.items()
                if k not in keep}
        return _sub_outside_strings(text, subs)

    def _check_fn_let_recursion(self) -> None:
        """Raise on a cycle in the function-let call graph (f calling
        itself directly or via other lets) — textual expansion of a
        cyclic definition can never terminate, while an acyclic graph
        always does (each expansion strictly reduces the remaining
        topological depth)."""
        graph = {
            f: {g for g in self._fn_lets
                if _find_call_spans(body, g)}
            for f, (_, _, body) in self._fn_lets.items()}
        WHITE, GRAY, BLACK = 0, 1, 2
        color = dict.fromkeys(graph, WHITE)

        def visit(node, stack):
            color[node] = GRAY
            for nxt in graph[node]:
                if color[nxt] == GRAY:
                    cyc = stack[stack.index(nxt):] + [nxt] \
                        if nxt in stack else [node, nxt]
                    raise ValueError(
                        "KQL: recursive function-let "
                        f"({' -> '.join(cyc)}) — expansion cannot "
                        "terminate")
                if color[nxt] == WHITE:
                    visit(nxt, stack + [nxt])
            color[node] = BLACK

        for f in graph:
            if color[f] == WHITE:
                visit(f, [f])

    def _looks_tabular(self, body: str) -> bool:
        if "|" in _STR_LIT_RE.sub("", body):
            return True
        head = body.strip()
        return (re.match(r"datatable\s*\(|print\b|range\b|"
                         r"externaldata\s*\(|find\b", head) is not None
                or head in self._lets
                or head in TABLES)

    def _compile_tabular(self, query: str) -> DataFrame:
        stages = _split_pipes(query)
        if not stages:
            raise ValueError("KQL: empty query")
        df = self._source(stages[0].strip())
        for stage in stages[1:]:
            df = self._apply(df, stage)
        return df

    def _source(self, text: str) -> DataFrame:
        """A pipeline source: a let-bound table, an inline datatable, a
        ``print`` row, or a stored table name."""
        if text in self._lets:
            return self._lets[text]
        if text.startswith("(") and text.endswith(")"):
            # parenthesized subpipeline in source position — the shape
            # a PARAMETERIZED TABULAR function-let expands to when
            # called as a source (`let f = (lo:long) { range ... };
            # f(5) | ...`, r12 probe find)
            return self.compile(text[1:-1].strip())
        if re.match(r"datatable\s*\(", text):
            return self._datatable(text)
        if re.match(r"print\b", text):
            return self._print(text)
        if re.match(r"range\b", text):
            return self._range(text)
        if re.match(r"externaldata\s*\(", text):
            return self._externaldata(text)
        if re.match(r"find\b", text):
            return self._find(text)
        if re.match(r"search\b", text):
            # source-position search (r13 probe sweep):
            # `search [kind=...] [in (T1, T2, ...)] 'term'` — the
            # in-list unions by name like find, then the piped search
            # operator's OR-of-Contains predicate applies
            ms = re.match(r"search\s+(?P<kind>kind\s*=\s*\w+\s+)?"
                          r"(?:in\s*\((?P<tabs>[^)]*)\)\s*)?"
                          r"(?P<term>.+)$", text, re.DOTALL)
            if ms and ms.group("tabs"):
                names = [t.strip() for t in ms.group("tabs").split(",")
                         if t.strip()]
                out = None
                for n in names:
                    t = (self._lets[n] if n in self._lets
                         else self.table(n))
                    t = t.withColumn("source_", F.lit(n))
                    out = t if out is None else out.unionByName(
                        t, allowMissingColumns=True)
                return self._apply(
                    out, f"search {ms.group('kind') or ''}"
                         f"{ms.group('term').strip()}")
            raise ValueError(
                "KQL: source-position search needs in (T1, ...) — "
                "pipe a table into `| search 'term'` otherwise")
        if re.match(r"union\b", text):
            # Kusto's source-position union: `union T1, T2 | ...`
            return self._union(None, text[len("union"):].strip())
        t = self._table_fn(text)
        if t is not None:
            return t
        return self.table(text)

    def _table_fn(self, text: str):
        """Kusto's table-reference functions: ``table('name')``,
        ``materialized_view('name')`` (reads the backing table of the
        same name — this engine has no view materializer, documented
        deviation), and the cross-database forms
        ``database('db').Name`` / ``database('db').table('name')``
        (the database qualifier is accepted and IGNORED: one sf_dir is
        the whole catalog here). Returns None when the text is not a
        table-reference call."""
        m = re.fullmatch(
            r"(?:database\s*\(\s*'[^']*'\s*\)\s*\.\s*)?"
            r"(?:table|materialized_view)\s*\(\s*'([^']+)'\s*\)",
            text.strip())
        if m:
            name = m.group(1)
            return (self._lets[name] if name in self._lets
                    else self.table(name))
        m = re.fullmatch(r"database\s*\(\s*'[^']*'\s*\)\s*\.\s*"
                         r"([A-Za-z_]\w*)", text.strip())
        if m:
            name = m.group(1)
            return (self._lets[name] if name in self._lets
                    else self.table(name))
        return None

    def _find(self, text: str) -> DataFrame:
        """``find [withsource=col] in (T1, T2, ...) where pred``:
        cross-table search — the tables union by NAME with missing
        columns null-filled, a source column names the origin table,
        and the predicate filters the union. Documented subset of
        Kusto's plugin: all columns are returned null-filled (real
        Kusto packs non-referenced non-common columns into ``pack_``
        — the flat form is the Spark-native shape and strictly more
        queryable). Catalyst pushes the predicate into each branch of
        the union, so at scale each table is scanned once with the
        filter applied at the source."""
        m = re.match(r"find\s+(?:withsource\s*=\s*(?P<src>\w+)\s+)?"
                     r"in\s*\((?P<tabs>[^)]*)\)\s*"
                     r"where\s+(?P<pred>.*)$", text, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: find [withsource=col] in (T1, T2, ...) where pred")
        src_col = m.group("src") or "source_"
        names = [t.strip() for t in m.group("tabs").split(",")
                 if t.strip()]
        if not names:
            raise ValueError("KQL: find needs at least one table")
        parts = []
        for n in names:
            t = self._lets[n] if n in self._lets else self.table(n)
            parts.append(t.withColumn(src_col, F.lit(n)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        pred = m.group("pred").strip()
        pm = re.fullmatch(
            r"\*\s+(?P<op>has|has_cs|contains|contains_cs|hasprefix|"
            r"hassuffix|startswith|endswith)\s+"
            r"(?P<lit>'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")\s*",
            pred, re.DOTALL)
        if pm:
            # Kusto's canonical `where * has 'term'` form (r13 probe
            # sweep): the wildcard expands to an OR over EVERY string
            # column of the union. Column names that are not bare
            # identifiers cannot be spelled in KQL predicate text, so
            # the operator semantics are compiled ONCE against a
            # placeholder identifier and the backtick-quoted real name
            # is substituted into the SQL per column (r13 advice:
            # filtering such columns out silently missed their rows).
            cols = [f.name for f in out.schema.fields
                    if f.dataType.typeName() == "string"]
            if not cols:
                raise ValueError("KQL: find * found no string columns")
            ph = "__kql_find_star_col"
            tmpl = _compile_expr_tokens(_tokenize(
                f"{ph} {pm.group('op')} {pm.group('lit')}"), out)
            # the compiler may render the placeholder backticked or
            # bare depending on the operator path — normalize to bare
            # first, then substitute the quoted real name
            tmpl = tmpl.replace(f"`{ph}`", ph)
            sql = " OR ".join(
                "(" + tmpl.replace(
                    ph, f"`{c.replace('`', '``')}`") + ")"
                for c in cols)
            return out.where(F.expr(sql))
        sql = _compile_expr_tokens(_tokenize(pred), out)
        return out.where(F.expr(sql))

    def _externaldata(self, text: str) -> DataFrame:
        """``externaldata (col:type, ...) ['uri', ...] with
        (format='csv', ignoreFirstRecord=true)`` — read external files
        with a declared schema (csv default; json/parquet/txt too). The
        declared schema skips inference (no extra pass over the data)."""
        m = re.match(r"externaldata\s*\(([^)]*)\)\s*\[(.*?)\]"
                     r"\s*(?:with\s*\((.*)\))?\s*$", text, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: externaldata (name:type, ...) ['uri'] with (...)")
        cols = []
        for part in m.group(1).split(","):
            bits = [b.strip() for b in part.split(":")]
            if len(bits) != 2 or bits[1] not in self._DT_TYPES:
                raise ValueError(f"KQL: bad externaldata column {part!r}")
            cols.append((bits[0], self._DT_TYPES[bits[1]]))
        uris = [t.text[1:-1] for t in _tokenize(m.group(2))
                if t.kind == "str"]
        if not uris:
            raise ValueError("KQL: externaldata needs at least one uri")
        opts = dict(re.findall(r"(\w+)\s*=\s*'?([^,')]+)'?",
                               m.group(3) or ""))
        fmt = opts.get("format", "csv").lower()
        schema = ", ".join(f"`{n}` {t}" for n, t in cols)
        reader = self.spark.read.schema(schema)
        header = opts.get("ignoreFirstRecord", "false").lower() == "true"
        # Kusto's delimited-text family maps to the csv reader with the
        # format's separator (r13 probe sweep): tsv tab, psv pipe,
        # scsv semicolon, sohsv SOH (0x01)
        seps = {"csv": ",", "tsv": "\t", "psv": "|", "scsv": ";",
                "sohsv": "\x01"}
        if fmt in seps:
            return (reader.option("header", header)
                          .option("sep", seps[fmt]).csv(uris))
        if fmt in ("json", "multijson"):
            return reader.json(uris)
        if fmt == "parquet":
            return reader.parquet(*uris)
        if fmt in ("txt", "raw"):
            return self.spark.read.text(uris).withColumnRenamed(
                "value", cols[0][0])
        raise ValueError(f"KQL: externaldata format {fmt!r} not supported")

    def _range(self, text: str) -> DataFrame:
        """``range x from a to b step s`` — a generated numeric source
        (spark.range: no input, splits across the cluster; Kusto's
        inclusive upper bound preserved)."""
        m = re.match(r"range\s+(\w+)\s+from\s+(-?\d+)\s+to\s+(-?\d+)"
                     r"\s+step\s+(-?\d+)\s*$", text)
        if m:
            name, a, b, s = (m.group(1), int(m.group(2)),
                             int(m.group(3)), int(m.group(4)))
        else:
            # expression bounds (Kusto allows them; a parameterized
            # tabular let substitutes call args here — r12 probe find):
            # constant-fold on a one-row frame, then spark.range as
            # usual. The bounds must still be integral constants after
            # folding — data-dependent bounds have no table analogue.
            me = re.match(r"range\s+(\w+)\s+from\s+(.*?)\s+to\s+(.*?)"
                          r"\s+step\s+(.+?)\s*$", text, re.DOTALL)
            if not me:
                raise ValueError("KQL: range name from a to b step s")
            name = me.group(1)
            try:
                sqls = [_parse_expr(_tokenize(g))
                        for g in (me.group(2), me.group(3),
                                  me.group(4))]
                shape = self.spark.sql("SELECT " + ", ".join(
                    f"({s_}) AS c{i}" for i, s_ in enumerate(sqls)))
                dts = [f.dataType.typeName()
                       for f in shape.schema.fields]
                if any(t.startswith("decimal") or t in
                       ("double", "float") for t in dts):
                    raise ValueError(
                        "KQL: range supports integer and datetime "
                        "bounds (fractional steps are not "
                        "implemented)")
                # datetime bounds fold to MICROSECONDS so the
                # timespan-literal step (bigint µs) lines up; the
                # output column converts back (r12 review — a bare
                # BIGINT cast read epoch SECONDS against a µs step
                # and silently produced garbage rows)
                is_dt = [t.startswith("timestamp") for t in dts]
                if is_dt[2] or (is_dt[0] != is_dt[1]):
                    raise ValueError(
                        "KQL: range needs both bounds datetime (step "
                        "a timespan) or both integers")
                sel = [(f"unix_micros(CAST(({s_}) AS TIMESTAMP))"
                        if d else f"CAST(({s_}) AS BIGINT)")
                       for s_, d in zip(sqls, is_dt)]
                row = self.spark.sql(
                    "SELECT " + ", ".join(sel)).collect()[0]
                a, b, s = row[0], row[1], row[2]
            except ValueError:
                raise
            except Exception as exc:
                raise ValueError(
                    f"KQL: range bounds must fold to integers "
                    f"({text[:60]!r})") from exc
            if a is None or b is None or s is None:
                raise ValueError("KQL: range bounds must be non-null")
            if is_dt[0]:
                if s == 0:
                    raise ValueError("KQL: range step must be nonzero")
                end = b + (1 if s > 0 else -1)
                return self.spark.range(a, end, s).select(
                    F.timestamp_micros(F.col("id")).alias(name))
        if s == 0:
            raise ValueError("KQL: range step must be nonzero")
        end = b + (1 if s > 0 else -1)  # Kusto's bound is inclusive
        return self.spark.range(a, end, s).select(
            F.col("id").alias(name))

    def _print(self, text: str) -> DataFrame:
        """``print [name =] expr [, ...]`` — a one-row literal table."""
        rest = re.sub(r"^print\s*", "", text, flags=re.DOTALL)
        cols = []
        for i, g in enumerate(_split_top_commas(_tokenize(rest))):
            if len(g) >= 2 and g[0].kind == "ident" and g[1].text == "=":
                name, body = g[0].text, g[2:]
            else:
                name, body = f"print_{i}" if i else "print_0", g
            # r14: print bodies route through the token-level
            # interceptions too, so bin()/bin_at()/bin_auto() work in
            # pure-text contexts (documented non-fix since r10);
            # df=None — schema-dependent forms raise cleanly.
            cols.append(
                f"{_compile_expr_tokens(body, None)} AS `{name}`")
        if not cols:
            raise ValueError("KQL: print needs at least one expression")
        return self.spark.sql("SELECT " + ", ".join(cols))

    # ------------------------------------------------------------------
    def _apply(self, df: DataFrame, stage: str) -> DataFrame:
        m = re.match(r"([A-Za-z_-]+)\s*(.*)", stage, re.DOTALL)
        if not m:
            raise ValueError(f"KQL: bad stage {stage!r}")
        op, rest = m.group(1).lower(), m.group(2).strip()
        if op == "where":
            return df.where(F.expr(_compile_expr_tokens(_tokenize(rest), df)))
        if op == "project":
            cols = []
            for i, g in enumerate(_split_top_commas(_tokenize(rest))):
                name, sql = _named_expr(g, df, f"col{i}")
                cols.append(F.expr(sql).alias(name))
            if not cols:
                # a bare `project` would silently yield a ZERO-column
                # frame (fuzz find); Kusto requires at least one
                raise ValueError("KQL: project needs at least one "
                                 "column or expression")
            return df.select(*cols)
        if op == "project-away":
            names = _expand_col_patterns(
                _split_top_commas(_tokenize(rest)), df.columns)
            return df.drop(*names)
        if op == "project-keep":
            groups = _split_top_commas(_tokenize(rest))
            keep = set(_expand_col_patterns(groups, df.columns))
            literal = {"".join(t.text for t in g) for g in groups
                       if not any(t.text == "*" for t in g)}
            missing = literal - set(df.columns)
            if missing:
                raise ValueError(f"KQL: project-keep: unknown {missing}")
            return df.select(*[c for c in df.columns if c in keep])
        if op == "project-rename":
            for g in _split_top_commas(_tokenize(rest)):
                if len(g) != 3 or g[1].text != "=":
                    raise ValueError("KQL: project-rename new = old")
                df = df.withColumnRenamed(g[2].text, g[0].text)
            return df
        if op == "project-reorder":
            first = _expand_col_patterns(
                _split_top_commas(_tokenize(rest)), df.columns)
            rest_cols = [c for c in df.columns if c not in set(first)]
            return df.select(*first, *rest_cols)
        if op == "serialize":
            # order-freeze marker: with a preceding sort the order is
            # already serialized (no-op). WITHOUT one (Kusto lets
            # row_number()/prev() run on arrival order), materialize a
            # per-row serial — monotonically_increasing_id is
            # partition-ordered, so the frozen order is the scan order,
            # matching Kusto's "current order" contract as closely as a
            # distributed engine can (r12 probe find). The helper
            # column is dropped at pipeline end.
            if self._order is None:
                # unmaterialized: a helper COLUMN would leak into
                # getschema / distinct * / project wildcards; the bare
                # expression orders windows identically (partition
                # index, then row position) without touching the schema
                self._order = [F.monotonically_increasing_id().asc()]
                self._order_sql = ["monotonically_increasing_id() ASC"]
            if rest.strip():
                # Kusto: `serialize name = expr, ...` — the operator
                # takes extend-style assignments evaluated AFTER the
                # order freezes (r13 probe sweep)
                return self._apply(df, f"extend {rest}")
            return df
        if op == "partition":
            return self._partition_by(df, rest)
        if op == "scan":
            return self._scan(df, rest)
        if op == "reduce":
            # ``reduce by expr``: string pattern clustering (log
            # template mining). Documented subset of Kusto's
            # similarity-based plugin with a DETERMINISTIC
            # generalization instead: GUIDs, hex runs (>=4), and digit
            # runs collapse to '*', then group by the template. Output
            # matches Kusto's shape — Pattern, Count, Representative
            # (lexicographic min of the group, deterministic where
            # Kusto's choice is unspecified). One shuffle, all
            # expressions codegen.
            m = re.match(r"by\s+(.*)$", rest, re.DOTALL)
            if not m:
                raise ValueError("KQL: reduce by expr")
            sql = _compile_expr_tokens(_tokenize(m.group(1)), df)
            guid = (r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
                    r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}")
            pat = F.expr(sql).cast("string")
            pat = F.regexp_replace(pat, guid, "*")
            pat = F.regexp_replace(pat, r"\b0[xX][0-9a-fA-F]+\b", "*")
            # standalone hex tokens only (word-bounded, must contain a
            # digit — else words like 'added' or 'node17' substrings
            # would collapse)
            pat = F.regexp_replace(
                pat, r"\b(?=[0-9a-fA-F]*[0-9])[0-9a-fA-F]{4,}\b", "*")
            pat = F.regexp_replace(pat, r"[0-9]+", "*")
            pat = F.regexp_replace(pat, r"\*(\.\*)+", "*")
            return (df.select(pat.alias("Pattern"),
                              F.expr(sql).cast("string").alias("__v"))
                      .groupBy("Pattern")
                      .agg(F.count("*").cast("long").alias("Count"),
                           F.min("__v").alias("Representative")))
        if op == "getschema":
            # Kusto's four columns. Deviation (documented): DataType
            # carries the Spark type name where Kusto prints the .NET
            # System.* name; ColumnType is the faithful CSL name via
            # the same map the cslschema introspection uses
            def csl(dt) -> str:
                s = dt.simpleString()
                base = s.split("(")[0]
                m = {"bigint": "long", "int": "int", "smallint": "int",
                     "tinyint": "int", "double": "real",
                     "float": "real", "string": "string",
                     "boolean": "bool", "timestamp": "datetime",
                     "timestamp_ntz": "datetime", "date": "datetime",
                     "decimal": "decimal", "variant": "dynamic",
                     "binary": "string"}
                if base in m:
                    return m[base]
                return "dynamic"  # array/struct/map nest as dynamic
            rows = [(f.name, i, f.dataType.simpleString(),
                     csl(f.dataType))
                    for i, f in enumerate(df.schema.fields)]
            return self.spark.createDataFrame(
                rows, "ColumnName string, ColumnOrdinal long, "
                      "DataType string, ColumnType string")
        if op == "extend":
            for i, g in enumerate(_split_top_commas(_tokenize(rest))):
                if g and g[0].text == "(":
                    df = self._extend_multi_assign(df, g)
                    continue
                if len(g) >= 2 and g[0].kind == "ident" \
                        and g[1].text == "=":
                    name, body = g[0].text, g[2:]
                else:
                    name, body = f"col{i}", g
                sql = _compile_expr_tokens(body, df, self._order_sql,
                                           self._partition_sql)
                mcs = re.match(r"row_cumsum\s*\((.*)\)\s*$", sql.strip(),
                               re.DOTALL)
                mrr = re.match(r"row_rank_(dense|min)\s*\((.*)\)\s*$",
                               sql.strip(), re.DOTALL)
                if mrr:
                    # Kusto row_rank_dense / row_rank_min: serialized
                    # RUN-based ranks — dense starts at 1 and advances
                    # whenever Term changes vs the previous row;
                    # min is the first row number of the current run of
                    # equal Term values. On input sorted by Term these
                    # coincide with classic DENSE_RANK / RANK. Null-safe
                    # change detection (<=>).
                    if self._order is None:
                        raise ValueError(
                            f"KQL: row_rank_{mrr.group(1)}() needs a "
                            "preceding 'sort by' (serialized order)")
                    from pyspark.sql import Window
                    term = F.expr(mrr.group(2))
                    if self._partition:
                        w = Window.partitionBy(*self._partition) \
                                  .orderBy(*self._order)
                    else:
                        _warn_global_serialize(
                            f"row_rank_{mrr.group(1)}()", df)
                        w = Window.orderBy(*self._order)
                    # first row is always a change (rank starts at 1,
                    # even for a null Term — lag of a constant detects
                    # the window start null-safely)
                    chg = F.when(
                        F.lag(F.lit(1), 1).over(w).isNull(), F.lit(1)
                    ).when(
                        F.lag(term, 1).over(w).eqNullSafe(term),
                        F.lit(0)).otherwise(F.lit(1))
                    wrun = w.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
                    dense = F.sum(chg).over(wrun).cast("long")
                    if mrr.group(1) == "dense":
                        df = df.withColumn(name, dense)
                    else:
                        # the run-id window repartitions on
                        # (keys, run): scope-key rows may now span
                        # partitions — scoped layout no longer holds
                        self._scoped_sorted = False
                        df = df.withColumn("__rr_run", dense) \
                               .withColumn("__rr_rn",
                                           F.row_number().over(w))
                        wmin = Window.partitionBy(
                            *(list(self._partition or [])
                              + [F.col("__rr_run")]))
                        df = (df.withColumn(
                                  name,
                                  F.min("__rr_rn").over(wmin)
                                   .cast("long"))
                                .drop("__rr_run", "__rr_rn"))
                    continue
                mws = re.match(r"row_window_session\s*\((.*)\)\s*$",
                               sql.strip(), re.DOTALL)
                if mws:
                    df = self._row_window_session(df, name,
                                                  mws.group(1))
                    continue
                mrn = re.fullmatch(r"row_number\(\s*(\d+)?\s*"
                                   r"(?:,(?P<restart>.+))?\)",
                                   sql.strip(), re.DOTALL)
                if mrn or mcs:
                    what = "row_cumsum()" if mcs else "row_number()"
                    if self._order is None:
                        raise ValueError(
                            f"KQL: {what} needs a preceding "
                            "'sort by' (serialized order)")
                    from pyspark.sql import Window
                    if self._partition:
                        w = Window.partitionBy(*self._partition) \
                                  .orderBy(*self._order)
                    else:
                        _warn_global_serialize(what, df)
                        w = Window.orderBy(*self._order)
                    if mcs:
                        # running sum over the serialized order; the
                        # two-arg form row_cumsum(x, restart) resets
                        # the accumulation AT each row where restart
                        # is true (run id = running count of restarts,
                        # then the sum re-partitions by run)
                        inner = mcs.group(1)
                        parts, depth, cur = [], 0, []
                        for ch in inner:
                            if ch in "([":
                                depth += 1
                            elif ch in ")]":
                                depth -= 1
                            if ch == "," and depth == 0:
                                parts.append("".join(cur))
                                cur = []
                            else:
                                cur.append(ch)
                        parts.append("".join(cur))
                        if len(parts) > 2:
                            raise ValueError(
                                "KQL: row_cumsum(x [, restart])")
                        wrun = w.rowsBetween(
                            Window.unboundedPreceding,
                            Window.currentRow)
                        if len(parts) == 2:
                            # (keys, run) window repartitions — scoped
                            # layout no longer holds past this stage
                            self._scoped_sorted = False
                            df = df.withColumn(
                                "__rc_run",
                                F.sum(F.expr(
                                    f"IF({parts[1]}, 1, 0)"))
                                 .over(wrun))
                            w2 = Window.partitionBy(
                                *(list(self._partition or [])
                                  + [F.col("__rc_run")])) \
                                .orderBy(*self._order) \
                                .rowsBetween(
                                    Window.unboundedPreceding,
                                    Window.currentRow)
                            df = (df.withColumn(
                                      name,
                                      F.sum(F.expr(parts[0]))
                                       .over(w2))
                                    .drop("__rc_run"))
                        else:
                            df = df.withColumn(
                                name,
                                F.sum(F.expr(parts[0])).over(wrun))
                    else:
                        # row_number(StartingIndex [, Restart]): Kusto
                        # offsets the first row to the given index;
                        # the 2-arg form RESTARTS numbering at every
                        # row where the boolean is true (r13 probe
                        # sweep — run id = running count of restarts,
                        # the row_cumsum restart shape)
                        base = (int(mrn.group(1)) - 1
                                if mrn.group(1) else 0)
                        if mrn.group("restart"):
                            # (keys, run) window repartitions — scoped
                            # layout no longer holds past this stage
                            self._scoped_sorted = False
                            from pyspark.sql import Window as _W
                            wrun = w.rowsBetween(
                                _W.unboundedPreceding, _W.currentRow)
                            df = df.withColumn(
                                "__rn_run",
                                F.sum(F.expr(
                                    f"IF({mrn.group('restart')}, "
                                    f"1, 0)")).over(wrun))
                            w2 = _W.partitionBy(
                                *(list(self._partition or [])
                                  + [F.col("__rn_run")])) \
                                .orderBy(*self._order)
                            df = (df.withColumn(
                                      name,
                                      (F.row_number().over(w2)
                                       + F.lit(base)).cast("long"))
                                    .drop("__rn_run"))
                        else:
                            df = df.withColumn(
                                name, (F.row_number().over(w)
                                       + F.lit(base)).cast("long"))
                    continue
                df = df.withColumn(name, F.expr(sql))
            return df
        if op == "summarize":
            return self._summarize(df, rest)
        if op == "distinct":
            if rest == "*":
                return df.distinct()
            names = [g[0].text for g in _split_top_commas(_tokenize(rest))]
            return df.select(*names).distinct()
        if op == "sort" or op == "order":
            rest = re.sub(r"^by\s+", "", rest)
            cols = self._sort_cols(df, rest)
            self._order = cols
            return df.orderBy(*cols)
        if op == "top":
            m2 = re.match(r"(\d+)\s+by\s+(.*)", rest, re.DOTALL)
            if not m2:
                raise ValueError("KQL: top N by expr")
            n = int(m2.group(1))
            return df.orderBy(*self._sort_cols(df, m2.group(2))).limit(n)
        if op in ("take", "limit"):
            # tolerate wrapping parens: scalar-let / function-arg
            # substitution parenthesizes for precedence safety
            return df.limit(int(rest.strip("() \t\n")))
        if op == "count":
            return df.agg(F.count("*").alias("count_"))
        if op == "consume":
            # Kusto's diagnostic sink: run the pipeline, discard the
            # rows, return an empty result with the input schema. The
            # noop write FORCES full evaluation (a bare limit(0)
            # would never execute the input), matching consume's
            # purpose of exercising the query for cost measurement.
            # `decodeblocks=...` arguments are accepted and ignored.
            df.write.format("noop").mode("overwrite").save()
            return df.limit(0)
        if op == "mv-expand":
            # mv-expand col  /  mv-expand alias=expr [to typeof(t)]
            # [, b, ...] : one output row per array element (explode,
            # codegen'd Generate — no Python). Multiple arrays expand
            # ZIPPED (Kusto): positions beyond a shorter array null.
            def split_typeof(g):
                for j, t in enumerate(g):
                    if (t.kind == "ident" and t.text == "to"
                            and j + 1 < len(g)
                            and g[j + 1].text == "typeof"):
                        if (j + 4 >= len(g) or g[j + 2].text != "("
                                or g[j + 4].text != ")"):
                            raise ValueError(
                                "KQL: mv-expand ... to typeof(type)")
                        tname = g[j + 3].text
                        ct = self._DT_TYPES.get(tname)
                        if ct is None:
                            raise ValueError(
                                f"KQL: mv-expand to typeof({tname}) "
                                f"not supported")
                        return g[:j], ct
                return g, None

            # `kind=array|bag` prefix (r13 probe sweep, shape fixed per
            # r13 advice): both kinds expand ARRAY dynamics one element
            # per row; they differ on OBJECT dynamics — kind=bag (the
            # default) yields one single-property bag per entry,
            # kind=array yields one [key, value] two-element array per
            # entry (Kusto's documented bagexpansion=array shape)
            bag_kind = "bag"
            mk = re.match(r"(?:kind\s*=\s*(array|bag)\s+"
                          r"|bagexpansion\s*=\s*(array|bag)\s+)(.*)$",
                          rest, re.DOTALL)
            if mk:
                bag_kind = mk.group(1) or mk.group(2)
                rest = mk.group(3)
            # `with_itemindex=name` prefix: emit the 0-based element
            # position (posexplode / the shared zip position)
            idx_col = None
            mi = re.match(r"with_itemindex\s*=\s*([A-Za-z_]\w*)\s+(.*)$",
                          rest, re.DOTALL)
            if mi:
                idx_col, rest = mi.group(1), mi.group(2)
            # trailing `limit N`: Kusto's per-record expansion cap —
            # the blowup guard for a 100 TB corpus with pathological
            # array rows; applied as slice(arr, 1, N) BEFORE the
            # explode so the oversized tail is never generated
            exp_limit = None
            ml = re.search(r"\blimit\s+(\d+)\s*$", rest)
            if ml:
                exp_limit, rest = int(ml.group(1)), rest[:ml.start()]
            g = _split_top_commas(_tokenize(rest))

            def capped(arr):
                return (F.slice(arr, 1, exp_limit)
                        if exp_limit is not None else arr)
            if len(g) == 1:
                g0, cast_t = split_typeof(g[0])
                name, sql = _named_expr(g0, df, "value")
                if idx_col:
                    ex = F.posexplode(capped(
                        _explodable(df, sql, bag_kind)))
                    other = [c for c in df.columns if c != name]
                    out = df.select(*other, ex.alias(idx_col, name)) \
                        .withColumn(idx_col,
                                    F.col(idx_col).cast("long"))
                else:
                    out = df.withColumn(
                        name,
                        F.explode(capped(
                            _explodable(df, sql, bag_kind))))
                if cast_t:
                    out = out.withColumn(name, F.col(name).cast(cast_t))
                return out
            parts = [split_typeof(gi) for gi in g]
            pairs = [_named_expr(gi, df, f"value{i}")
                     for i, (gi, _) in enumerate(parts)]
            casts = [ct for _, ct in parts]
            arrs = [capped(_explodable(df, sql, bag_kind))
                    for _, sql in pairs]
            longest = F.greatest(*[F.size(a) for a in arrs]) \
                if len(arrs) > 1 else F.size(arrs[0])
            # guard: sequence(1, 0) DESCENDS to [1, 0] in Spark; when
            # every zipped array is empty the row must drop (Kusto) —
            # the unmatched when() yields null, which explode drops
            out = df.withColumn(
                "__mv_pos", F.explode(F.when(
                    longest >= 1, F.sequence(F.lit(1), longest))))
            for (name, _), a, ct in zip(pairs, arrs, casts):
                v = F.try_element_at(a, F.col("__mv_pos"))
                out = out.withColumn(name, v.cast(ct) if ct else v)
            if idx_col:
                return out.withColumn(
                    idx_col,
                    (F.col("__mv_pos") - 1).cast("long")) \
                    .drop("__mv_pos")
            return out.drop("__mv_pos")
        if op == "join":
            return self._join(df, rest)
        if op == "union":
            return self._union(df, rest)
        if op == "parse":
            return self._parse(df, rest)
        if op == "parse-where":
            return self._parse(df, rest, where=True)
        if op == "parse-kv":
            return self._parse_kv(df, rest)
        if op == "make-graph":
            return self._make_graph(df, rest)
        if op == "graph-match":
            return self._graph_match(df, rest)
        if op == "graph-shortest-paths":
            return self._graph_shortest_paths(df, rest)
        if op == "graph-to-table":
            return self._graph_to_table(df, rest)
        if op == "graph-mark-components":
            return self._graph_mark_components(df, rest)
        if op == "facet":
            return self._facet(df, rest)
        if op == "fork":
            return self._fork(df, rest)
        if op == "mv-apply":
            return self._mv_apply(df, rest)
        if op == "invoke":
            # `T | invoke f(args)`: apply a tabular function-let — the
            # piped table binds the function's table parameter, scalar
            # args expand textually (same macro discipline as scalar
            # function-lets), and the body compiles as a normal
            # pipeline with the bound table as its source
            m = re.match(r"(\w+)\s*\((?P<args>.*)\)\s*$", rest,
                         re.DOTALL)
            if not m:
                raise ValueError("KQL: invoke fn(args)")
            fname = m.group(1)
            if fname not in self._tab_fn_lets:
                raise ValueError(
                    f"KQL: invoke: {fname!r} is not a tabular function "
                    f"(define it as `let {fname} = (T:(*), ...) "
                    f"{{ ... }};`)")
            tparam, sparams, body = self._tab_fn_lets[fname]
            argtext = m.group("args").strip()
            args = [" ".join(t.text for t in g) for g in
                    _split_top_commas(_tokenize(argtext))] \
                if argtext else []
            if len(args) != len(sparams):
                raise ValueError(
                    f"KQL: invoke {fname}() takes {len(sparams)} args, "
                    f"got {len(args)}")
            expanded = _sub_outside_strings(body,
                                            dict(zip(sparams, args)))
            saved = self._lets.get(tparam)
            self._lets[tparam] = df
            try:
                return self._compile_tabular(self._preprocess(expanded))
            finally:
                if saved is None:
                    self._lets.pop(tparam, None)
                else:
                    self._lets[tparam] = saved
        if op == "render":
            return self._render(df, rest)
        if op == "as":
            # names the intermediate result for later operands
            name = rest.strip()
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
                raise ValueError(f"KQL: as needs a plain name, got {name!r}")
            self._lets[name] = df
            return df
        if op == "top-hitters":
            # top-hitters N of col [by sumExpr]: heavy-hitter summary.
            # Exact here (Kusto's is approximate): one partial-agg
            # shuffle + TakeOrdered — no global sort materialization.
            m2 = re.match(r"(\d+)\s+of\s+(\w+)(?:\s+by\s+(.*))?$",
                          rest, re.DOTALL)
            if not m2:
                raise ValueError("KQL: top-hitters N of col [by expr]")
            n, col, by = int(m2.group(1)), m2.group(2), m2.group(3)
            if by:
                sql = _compile_expr_tokens(_tokenize(by), df)
                out_name = f"approximate_sum_{col}"
                agg = F.expr(f"sum({sql})").alias(out_name)
            else:
                out_name = f"approximate_count_{col}"
                agg = F.count("*").cast("long").alias(out_name)
            return (df.groupBy(col).agg(agg)
                      .orderBy(F.col(out_name).desc(), F.col(col))
                      .limit(n))
        if op in ("sample", "sample-distinct"):
            # Kusto's sample is nondeterministic; here it is a SEEDED
            # hash-order sample (documented): deterministic across runs
            # and executors, compiles to TakeOrderedAndProject
            if op == "sample":
                n = int(rest)
                key = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
                return df.orderBy(key).limit(n)
            m2 = re.match(r"(\d+)\s+of\s+(\w+)\s*$", rest)
            if not m2:
                raise ValueError("KQL: sample-distinct N of col")
            n, col = int(m2.group(1)), m2.group(2)
            return (df.select(col).distinct()
                      .orderBy(F.xxhash64(F.col(col))).limit(n))
        if op == "evaluate":
            return self._evaluate(df, rest)
        if op == "top-nested":
            return self._top_nested(df, rest)
        if op == "lookup":
            return self._lookup(df, rest)
        if op == "make-series":
            return self._make_series(df, rest)
        if op == "search":
            # search [kind=case_insensitive|case_sensitive] 'term':
            # filter rows where ANY string column contains the term
            # (Kusto's cross-column text search, scoped to the piped
            # table). Compiles to one OR-of-Contains predicate — fully
            # codegen, pushdown-eligible, no shuffle. Non-string columns
            # are not searched (documented narrowing of Kusto, which
            # also matches rendered dynamics).
            m2 = re.match(r"(?:kind\s*=\s*(?P<kind>case_sensitive|"
                          r"case_insensitive)\s+)?"
                          r"(?P<lit>'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")"
                          r"\s*$", rest)
            if not m2:
                raise ValueError("KQL: search [kind=...] 'term'")
            term = m2.group("lit")[1:-1]
            term = re.sub(r"\\(.)", r"\1", term)
            sensitive = m2.group("kind") == "case_sensitive"
            pred = None
            for f in df.schema.fields:
                if f.dataType.typeName() != "string":
                    continue
                c = F.col(f.name)
                hit = (c.contains(term) if sensitive
                       else F.lower(c).contains(term.lower()))
                pred = hit if pred is None else (pred | hit)
            if pred is None:
                raise ValueError("KQL: search found no string columns")
            return df.where(pred)
        raise ValueError(f"KQL: unsupported operator {op!r}")

    def _operand(self, text: str) -> DataFrame:
        """A tabular operand: ``(sub-pipeline)``, an inline datatable,
        or a bare table."""
        text = text.strip()
        if text.startswith("(") and text.endswith(")") \
                and _parens_balanced_span(text):
            return self.compile(text[1:-1].strip())
        if re.match(r"datatable\s*\(", text):
            return self._datatable(text)
        t = self._table_fn(text)
        if t is not None:
            return t
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", text):
            # let-bound / `as`-named results shadow on-disk tables,
            # mirroring _source (a bare name as a join/union/lookup
            # operand must see the same binding environment)
            if text in self._lets:
                return self._lets[text]
            return self.table(text)
        raise ValueError(f"KQL: bad tabular operand {text!r}")

    _DT_TYPES = {"long": "long", "int": "int", "real": "double",
                 "double": "double", "string": "string",
                 "bool": "boolean", "boolean": "boolean",
                 "datetime": "timestamp", "dynamic": "variant",
                 # timespan rides this compiler's BIGINT-microseconds
                 # carrier (timespan literals already compile to it)
                 "timespan": "long",
                 "decimal": "decimal(38, 18)", "guid": "string"}

    def _datatable(self, text: str) -> DataFrame:
        """``datatable (col:type, ...) [v1, v2, ...]`` — an inline
        literal table (the standard Kusto idiom for small lookup/test
        inputs). Values are scalar literal expressions laid out row-major;
        the whole thing compiles to one local relation on the driver —
        Catalyst folds it, and joins against it broadcast by size."""
        m = re.match(r"datatable\s*\(([^)]*)\)\s*\[(.*)\]\s*$",
                     text, re.DOTALL)
        if not m:
            raise ValueError("KQL: datatable (name:type, ...) [values]")
        cols = []
        for part in m.group(1).split(","):
            bits = [b.strip() for b in part.split(":")]
            if len(bits) != 2 or bits[1] not in self._DT_TYPES:
                raise ValueError(f"KQL: bad datatable column {part!r}")
            cols.append((bits[0], self._DT_TYPES[bits[1]]))
        body = m.group(2).strip()
        schema = ", ".join(f"`{n}` {t}" for n, t in cols)
        if not body:
            return self.spark.createDataFrame([], schema)
        cells = [_parse_expr(g) for g in _split_top_commas(_tokenize(body))]
        if len(cells) % len(cols):
            raise ValueError(
                f"KQL: datatable has {len(cells)} values for "
                f"{len(cols)} columns (must be a multiple)")
        row_sqls = []
        for r in range(0, len(cells), len(cols)):
            row_sqls.append("SELECT " + ", ".join(
                f"CAST({cells[r + i]} AS {t}) AS `{n}`"
                for i, (n, t) in enumerate(cols)))
        return self.spark.sql(" UNION ALL ".join(row_sqls))

    _VARIANT_SCALARS = {"BIGINT", "INT", "SMALLINT", "TINYINT", "STRING",
                        "DOUBLE", "FLOAT", "BOOLEAN", "DATE", "TIMESTAMP"}

    def _evaluate(self, df: DataFrame, rest: str) -> DataFrame:
        """``evaluate bag_unpack(col)``: expand a dynamic (VARIANT)
        property bag into typed top-level columns.

        Two phases, like Kusto's own plugin: (1) one aggregation job
        computes the merged bag schema (schema_of_variant_agg — partial
        merge, tiny result), (2) the projection adds one variant_get per
        discovered key, typed when the merged schema gives a scalar type
        and left dynamic otherwise."""
        # Kusto's optional output-schema clause (r13 probe sweep):
        # ``evaluate plugin(args) : (name:type, ...)`` — the declared
        # schema is applied AFTER the plugin as a typed projection
        # (missing columns become typed nulls, like Kusto's
        # schema-bound evaluate; extras are dropped).
        out_schema = None
        sm = re.match(r"(.*\))\s*:\s*\(([^)]*)\)\s*$", rest, re.DOTALL)
        if sm:
            rest = sm.group(1)
            out_schema = []
            for part in sm.group(2).split(","):
                nm, _, ty = part.partition(":")
                if not nm.strip() or not ty.strip():
                    raise ValueError(
                        "KQL: evaluate output schema must be "
                        "(name:type, ...)")
                out_schema.append((nm.strip(), ty.strip().lower()))
        m = re.match(r"(\w+)\s*\((.*)\)\s*$", rest, re.DOTALL)
        if not m:
            raise ValueError("KQL: evaluate plugin(args)")
        plugin, argtext = m.group(1).lower(), m.group(2).strip()
        if out_schema is not None:
            out = self._evaluate(df, rest)
            cols = []
            for nm, ty in out_schema:
                sqlt = {"string": "STRING", "long": "BIGINT",
                        "int": "INT", "real": "DOUBLE",
                        "double": "DOUBLE", "bool": "BOOLEAN",
                        "boolean": "BOOLEAN", "datetime": "TIMESTAMP",
                        "decimal": "DECIMAL(38,18)",
                        "guid": "STRING"}.get(ty)
                if ty == "dynamic":
                    c = (F.col(nm) if nm in out.columns
                         else F.expr("parse_json('null')"))
                elif sqlt is None:
                    raise ValueError(
                        f"KQL: evaluate output schema: unsupported "
                        f"type {ty!r}")
                elif nm in out.columns:
                    c = F.expr(f"try_cast(`{nm}` AS {sqlt})")
                else:
                    c = F.expr(f"CAST(NULL AS {sqlt})")
                cols.append(c.alias(nm))
            return out.select(*cols)
        if plugin == "pivot":
            return self._pivot(df, argtext)
        if plugin == "autocluster":
            return self._autocluster(df, argtext)
        if plugin == "basket":
            return self._basket(df, argtext)
        if plugin == "funnel_sequence_completion":
            return self._funnel_completion(df, argtext)
        if plugin == "funnel_sequence":
            return self._funnel_sequence(df, argtext)
        if plugin == "python":
            return self._python_plugin(df, argtext)
        if plugin == "sliding_window_counts":
            return self._sliding_window_counts(df, argtext)
        if plugin == "activity_engagement":
            return self._activity_engagement(df, argtext)
        if plugin == "activity_counts_metrics":
            return self._activity_counts_metrics(df, argtext)
        if plugin == "active_users_count":
            return self._active_users_count(df, argtext)
        if plugin == "activity_metrics":
            return self._activity_metrics(df, argtext)
        if plugin == "session_count":
            return self._session_count(df, argtext)
        if plugin == "new_activity_metrics":
            return self._new_activity_metrics(df, argtext)
        if plugin == "ipv4_lookup":
            return self._ipv4_lookup(df, argtext)
        if plugin == "percentilew_approx":
            return self._percentilew_approx(df, argtext)
        if plugin == "percentilew_exact":
            return self._percentilew_exact(df, argtext)
        if plugin == "rolling_percentile":
            return self._rolling_percentile(df, argtext)
        if plugin == "tdigest":
            return self._tdigest(df, argtext)
        if plugin in ("tdigest_merge", "merge_tdigest"):
            return self._tdigest_merge(df, argtext)
        if plugin == "dcount_intersect":
            return self._dcount_intersect(df, argtext)
        if plugin == "rows_near":
            return self._rows_near(df, argtext)
        if plugin == "diffpatterns":
            return self._diffpatterns(df, argtext)
        if plugin == "diffpatterns_text":
            return self._diffpatterns_text(df, argtext)
        if plugin == "preview":
            return self._preview(df, argtext)
        if plugin == "schema_merge":
            return self._schema_merge(df, argtext)
        if plugin in ("ai_embeddings", "ai_embed_text"):
            return self._ai_embeddings(df, argtext)
        if plugin == "infer_storage_schema":
            # Kusto's external-data schema inference: here the
            # argument is a parquet path (file or table directory;
            # bare table names resolve against this compiler's
            # sf_dir), and the result is Kusto's one-row
            # (TableName:TypeName, ...) CSL schema string via the O8
            # type-mapping machinery (sources/metadata.py, cited to
            # schema.rs:74-109). The piped-in table is ignored, like
            # Kusto's own plugin.
            import os as _os

            from azure_kusto_parquet_conv_spark.sources.metadata \
                import csl_schema
            arg = argtext.strip().strip("'\"")
            path = arg
            if not _os.path.exists(path):
                cand = _os.path.join(self.sf_dir, arg + ".parquet")
                if _os.path.exists(cand):
                    path = cand
                else:
                    raise ValueError(
                        f"KQL: infer_storage_schema: no parquet at "
                        f"{arg!r} (tried {cand!r} too)")
            cols = csl_schema(path)
            text = ", ".join(f"{c['name']}:{c['type']}" for c in cols)
            return self.spark.createDataFrame(
                [(text,)], "schema string")
        if plugin == "narrow":
            return self._narrow(df, argtext)
        if plugin == "sequence_detect":
            return self._sequence_detect(df, argtext)
        if plugin != "bag_unpack":
            raise ValueError(f"KQL: evaluate plugin {plugin!r} not "
                             f"supported (see the module docstring's "
                             f"plugin list: bag_unpack, pivot, "
                             f"autocluster, basket, diffpatterns[_text], "
                             f"narrow, preview, schema_merge, "
                             f"infer_storage_schema, ai_embeddings, "
                             f"sequence_detect, the activity/percentile "
                             f"/tdigest families, ...)")
        uparts = _split_top_commas(_tokenize(argtext))
        if len(uparts) not in (1, 2):
            raise ValueError(
                "KQL: bag_unpack(column [, 'OutputColumnPrefix'])")
        col = "".join(t.text for t in uparts[0]).strip("` ")
        prefix = ""
        if len(uparts) == 2:
            pt = uparts[1][0] if uparts[1] else None
            if pt is None or pt.kind != "str" or len(uparts[1]) != 1:
                raise ValueError("KQL: bag_unpack prefix must be a "
                                 "string literal")
            prefix = _py_str_lit(pt.text)
        if dict(df.dtypes).get(col) != "variant":
            raise ValueError(f"KQL: bag_unpack needs a dynamic column, "
                             f"{col!r} is {dict(df.dtypes).get(col)!r}")
        schema_str = df.agg(
            F.expr(f"schema_of_variant_agg(`{col}`)")).first()[0]
        if not (schema_str or "").startswith("OBJECT<"):
            raise ValueError(
                f"KQL: bag_unpack: {col!r} holds {schema_str!r}, "
                f"not an object bag")
        inner = schema_str[len("OBJECT<"):-1]
        fields, depth, cur = [], 0, []
        for ch in inner:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            if ch == "," and depth == 0:
                fields.append("".join(cur)); cur = []
            else:
                cur.append(ch)
        if cur:
            fields.append("".join(cur))
        news = []
        for fld in fields:
            name, typ = fld.split(":", 1)
            name, typ = name.strip(), typ.strip()
            if typ in self._VARIANT_SCALARS or typ.startswith("DECIMAL("):
                c = F.expr(f"variant_get(`{col}`, '$.{name}', '{typ}')")
            else:  # nested object/array stays dynamic
                c = F.expr(f"variant_get(`{col}`, '$.{name}')")
            news.append(c.alias(prefix + name))
        keep_names = [c for c in df.columns if c != col]
        clash = ({prefix + f.split(":", 1)[0].strip() for f in fields}
                 & set(keep_names))
        if clash:
            raise ValueError(
                f"KQL: bag_unpack output column(s) {sorted(clash)} "
                f"collide with existing columns (Kusto errors too; "
                f"use the OutputColumnPrefix argument)")
        return df.select(*[F.col(c) for c in keep_names], *news)

    def _sequence_detect(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate sequence_detect(timeline, maxGap, maxWindow,
        s1 = pred1, s2 = pred2, ..., dim1[, dim2 ...])`` — detect
        ordered event sequences per dim key where successive steps are
        within ``maxGap`` and the whole sequence within ``maxWindow``
        (both timespan literals). One output row per COMPLETED
        sequence: the dims plus one ``<step>_ts`` timestamp per step.

        Subset contract: steps are the NAMED arguments (``s = pred``),
        dims the bare trailing idents — Kusto's positional split of
        Exprs vs Dims is ambiguous in text. Greedy single-sequence
        LATEST-START automaton per key (scan's semantics): ANY event
        matching step 1 — stray mid-sequence, or one that also matches
        the expected next step but violates a gap/window constraint —
        restarts matching at step 1 from that event. Because gap and
        window constraints are monotone in the start time, restarting
        at a later step-1 event can only loosen them, so for two-step
        funnels this finds a superset of the keep-earliest-start
        alternative; the tradeoff (a stray step-1 match discards a
        longer partial prefix for 3+ steps) is pinned explicitly in
        tests/test_kql.py's restart fixture and Python differential.

        Spark-first shape: step predicates become Catalyst boolean
        bits, the stateful pass is ONE partition-sorted Arrow-batched
        mapInPandas kernel carrying automaton state across batches
        (same shape as `scan` — per-batch overhead, not per-key)."""
        import pandas as pd

        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) < 5:
            raise ValueError(
                "KQL: sequence_detect(timeline, maxGap, maxWindow, "
                "s1 = p1, s2 = p2, ..., dim, ...)")
        tl_sql = _compile_expr_tokens(groups[0], df)

        def us_of(toks, what):
            sql = _compile_expr_tokens(toks, df)
            try:
                return int(sql.strip("() "))
            except ValueError:
                raise ValueError(
                    f"KQL: sequence_detect {what} must be a timespan "
                    f"literal, got {sql!r}")
        gap_us = us_of(groups[1], "maxGap")
        win_us = us_of(groups[2], "maxWindow")
        steps, dims = [], []
        for g in groups[3:]:
            if len(g) >= 2 and g[0].kind == "ident" and g[1].text == "=":
                steps.append((g[0].text,
                              _compile_expr_tokens(g[2:], df)))
            elif len(g) == 1 and g[0].kind == "ident":
                dims.append(g[0].text)
            else:
                raise ValueError(
                    "KQL: sequence_detect args after the window must "
                    "be 'name = predicate' steps or bare dim columns")
        if len(steps) < 2:
            raise ValueError("KQL: sequence_detect needs >= 2 steps")
        if not dims:
            _warn_global_serialize("sequence_detect", df)
            df = df.withColumn("__sq_g", F.lit(1))
            dims = ["__sq_g"]
            drop_dims = True
        else:
            drop_dims = False
        n_steps = len(steps)
        work = df.withColumn("__sq_ts", F.expr(
            f"unix_micros(CAST({tl_sql} AS TIMESTAMP))"))
        mask = None
        for i, (_, psql) in enumerate(steps):
            bit = F.when(F.expr(psql).cast("boolean"),
                         F.lit(1 << i)).otherwise(F.lit(0))
            mask = bit if mask is None else mask + bit
        work = work.withColumn("__sq_m", mask.cast("long"))
        part = (work.select(*dims, "__sq_ts", "__sq_m")
                    .where(F.col("__sq_ts").isNotNull())
                    .repartition(*[F.col(d) for d in dims])
                    .sortWithinPartitions(
                        *[F.col(d).asc() for d in dims],
                        F.col("__sq_ts").asc()))
        out_cols = ([] if drop_dims else list(dims)) \
            + [f"{n}_ts" for n, _ in steps]
        out_schema = part.select(
            *(dims if not drop_dims else []),
            *[F.timestamp_micros(F.col("__sq_ts")).alias(f"{n}_ts")
              for n, _ in steps]).schema

        def kernel(batches):
            state_key = object()
            k, first, prev, tss = 0, 0, 0, []
            for pdf in batches:
                if not len(pdf):
                    continue
                keys = [pdf[d].to_numpy() for d in dims]
                ts = pdf["__sq_ts"].to_numpy()
                m = pdf["__sq_m"].to_numpy()
                rows = []
                for i in range(len(pdf)):
                    kt = tuple(None if v != v else v
                               for v in (a[i] for a in keys))
                    if kt != state_key:
                        state_key, k, tss = kt, 0, []
                    t = int(ts[i])
                    bit = int(m[i])
                    if k > 0 and bit & (1 << k) \
                            and t - prev <= gap_us \
                            and t - first <= win_us:
                        tss.append(t)
                        prev = t
                        k += 1
                    elif bit & 1:
                        # latest-start greedy: ANY step-1 match —
                        # stray or constraint-violating — restarts
                        # the automaton here. For monotone gap/window
                        # constraints a later start can only loosen
                        # them, so for 2-step funnels this finds a
                        # superset of the keep-earliest alternative
                        # (pinned in the Python differential below).
                        k, first, prev, tss = 1, t, t, [t]
                    else:
                        continue
                    if k == n_steps:
                        row = {}
                        if not drop_dims:
                            for d, a in zip(dims, keys):
                                row[d] = a[i]
                        for (nme, _), tv in zip(steps, tss):
                            row[f"{nme}_ts"] = pd.Timestamp(
                                tv, unit="us")
                        rows.append(row)
                        k, tss = 0, []
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)

        return part.mapInPandas(kernel, out_schema)

    #: multi-assign sources: bag-returning function + its keys in
    #: Kusto's documented output order (prefix-assignable)
    #: key -> (dynamic variant, [(field, is_array)]) in Kusto's
    #: documented output order
    _MULTI_ASSIGN = {
        "series_fit_line": ("series_fit_line_dynamic",
                            [("rsquare", False), ("slope", False),
                             ("variance", False), ("rvariance", False),
                             ("interception", False),
                             ("line_fit", True)]),
        "series_decompose": ("series_decompose_dynamic",
                             [("baseline", True), ("seasonal", True),
                              ("trend", True), ("residual", True)]),
        "series_decompose_anomalies": (
            "series_decompose_anomalies_dynamic",
            [("ad_flag", True), ("ad_score", True),
             ("baseline", True)]),
        "series_stats": ("series_stats_dynamic",
                         [("min", False), ("min_idx", False),
                          ("max", False), ("max_idx", False),
                          ("avg", False), ("stdev", False),
                          ("variance", False)]),
        "series_periods_detect": ("series_periods_detect_dynamic",
                                  [("periods", True),
                                   ("scores", True)]),
        "series_periods_validate": ("series_periods_validate_dynamic",
                                    [("periods", True),
                                     ("scores", True)]),
        "series_fit_2lines": ("series_fit_2lines_dynamic",
                              [("rsquare", False), ("split_idx", False),
                               ("variance", False),
                               ("rvariance", False),
                               ("line_fit", True)]),
        "series_fit_poly": ("series_fit_poly_dynamic",
                            [("rsquare", False),
                             ("coefficients", True),
                             ("variance", False),
                             ("rvariance", False),
                             ("poly_fit", True)]),
        "series_fft": ("series_fft_dynamic",
                       [("real", True), ("imag", True)]),
        "series_ifft": ("series_ifft_dynamic",
                        [("real", True), ("imag", True)]),
    }

    def _extend_multi_assign(self, df: DataFrame,
                             g: list[Tok]) -> DataFrame:
        """``extend (n1, n2, ...) = series_fit_line(y)`` — Kusto's
        tuple-assignment idiom: the function's dynamic bag is computed
        once and its fields are projected onto the names in the
        documented output order (a prefix may be taken: ``(rsquare,
        slope) = ...``). Scalar fields land as doubles, array fields
        stay dynamic."""
        depth, j = 0, 0
        names = []
        for j, t in enumerate(g):
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    break
            elif depth == 1 and t.kind == "ident":
                names.append(t.text)
        if not names or j + 2 >= len(g) or g[j + 1].text != "=":
            raise ValueError("KQL: extend (n1, n2, ...) = fn(...)")
        call = g[j + 2:]
        fname = call[0].text.lower() if call else ""
        entry = self._MULTI_ASSIGN.get(fname)
        if entry is None:
            raise ValueError(
                f"KQL: multi-assign extend supports "
                f"{sorted(self._MULTI_ASSIGN)}, got {fname!r} — use the "
                f"_dynamic variant and path access instead")
        dyn_name, keys = entry
        if len(names) > len(keys):
            raise ValueError(
                f"KQL: {fname} yields {len(keys)} values, "
                f"{len(names)} names given")
        call = [Tok("ident", dyn_name)] + call[1:]
        sql = _compile_expr_tokens(call, df, self._order_sql,
                                   self._partition_sql)
        tmp = "__ma_bag"
        df = df.withColumn(tmp, F.expr(sql))
        for name, (key, is_array) in zip(names, keys):
            v = F.expr(f"variant_get(`{tmp}`, '$.{key}')")
            if not is_array:
                v = v.cast("double")
            df = df.withColumn(name, v)
        return df.drop(tmp)

    def _narrow(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate narrow()``: rotate the table into (Row, Column,
        Value) triples — input row i becomes one output row per column,
        Value stringified (complex/dynamic types as JSON) — Kusto's
        display-unpivot plugin. Row numbering follows the serialized
        order when a ``sort by`` precedes the plugin (the meaningful
        Kusto usage: row ids are only defined on a serialized input);
        without one the ids are partition-ordered and the standard
        serialized warning fires, mirroring Kusto's own undefined
        unsorted order."""
        if argtext.strip():
            raise ValueError("KQL: evaluate narrow() takes no args")
        from pyspark.sql import Window
        if self._order:
            w = Window.orderBy(*self._order)
            base = df.withColumn(
                "Row", (F.row_number().over(w) - 1).cast("long"))
        else:
            _warn_global_serialize("evaluate narrow()", df)
            base = df.withColumn("Row", F.monotonically_increasing_id())

        def val(c, t):
            if any(t.startswith(x) for x in
                   ("array", "map", "struct", "variant")):
                return F.to_json(F.col(c))
            return F.col(c).cast("string")
        pairs = F.array(*[
            F.struct(F.lit(c).alias("Column"), val(c, t).alias("Value"))
            for c, t in df.dtypes])
        return (base.select("Row", F.explode(pairs).alias("__np"))
                    .select("Row", F.col("__np.Column").alias("Column"),
                            F.col("__np.Value").alias("Value")))

    def _pivot(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate pivot(pivotCol [, agg(x) [, key1, key2, ...]])``:
        rotate the distinct values of ``pivotCol`` into columns
        (Kusto's pivot plugin ≡ Spark's RelationalGroupedDataset.pivot).
        Default aggregate is count(); when key columns are omitted,
        every remaining column (minus the pivot column and the
        aggregate's inputs) groups, per Kusto. Spark launches one small
        distinct-values job, then a single pivot aggregate — the same
        two phases as Kusto's plugin."""
        groups = _split_top_commas(_tokenize(argtext))
        if not groups:
            raise ValueError("KQL: evaluate pivot(col [, agg [, keys]])")
        pcol = groups[0][0].text
        agg_used: set[str] = set()
        if len(groups) >= 2:
            _, agg_sql = _named_expr(groups[1], df, "agg")
            agg_expr = F.expr(agg_sql)
            agg_used = {t.text for t in groups[1]
                        if t.kind == "ident" and t.text in df.columns}
        else:
            agg_expr = F.count(F.lit(1))
        if len(groups) >= 3:
            keys = [g[0].text for g in groups[2:]]
        else:
            keys = [c for c in df.columns
                    if c != pcol and c not in agg_used]
        return df.groupBy(*keys).pivot(pcol).agg(agg_expr)

    def _autocluster(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate autocluster([min_percent])``: mine the
        over-represented attribute patterns of the piped table — every
        combination of the table's STRING columns (null = wildcard)
        whose row coverage is at least ``min_percent`` (default 1.0),
        with its count, coverage percent, and specificity (number of
        fixed attributes; the all-wildcard row is excluded).

        Kusto's plugin is a heuristic seed-expand search; this is the
        EXACT enumeration via one ``cube()`` aggregate — a superset of
        what autocluster surfaces, at 2^k grouping sets for k attribute
        columns (project to the few low-cardinality attributes first;
        that bound is the documented contract, and each grouping set is
        map-side partial-aggregated in the same single pass). Attribute
        columns must be non-null (wildcard and source null are
        indistinguishable in a cube — pre-coalesce if needed)."""
        min_pct = float(argtext) if argtext.strip() else 1.0
        cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() == "string"]
        if not cols:
            raise ValueError("KQL: autocluster found no string columns")
        if len(cols) > 6:
            raise ValueError(
                "KQL: autocluster over >6 string columns (2^k grouping "
                "sets) — project to the attribute columns first")
        total = df.count()  # one tiny job, like the Kusto plugin
        spec = None
        for c in cols:
            s = F.when(F.col(c).isNotNull(), 1).otherwise(0)
            spec = s if spec is None else spec + s
        return (df.cube(*cols).count()
                  .withColumn("percent",
                              F.round(F.col("count") * 100.0 / total, 4))
                  .withColumn("specificity", spec.cast("long"))
                  .where((F.col("specificity") >= 1)
                         & (F.col("percent") >= min_pct))
                  .withColumn("count", F.col("count").cast("long")))

    def _window_base(self, df: DataFrame, groups, what, lo_hi=None):
        """Shared arg parsing for the sliding-window plugins:
        (id, timeline, start, end, ...) -> (base frame with __w_id /
        __w_t / __w_lo / __w_hi epoch-µs columns, remaining groups).
        ``lo_hi`` injects pre-evaluated literal epoch-µs bounds so a
        caller that ALSO sizes a driver-side spine from Start/End
        (session_count) filters with the very same values — a volatile
        expression (now()-relative) can otherwise diverge between the
        compile-time spine and the per-row execution-time filter."""
        id_sql = _compile_expr_tokens(groups[0], df)
        tl_sql = _compile_expr_tokens(groups[1], df)
        if lo_hi is not None:
            lo_col = F.lit(lo_hi[0]).cast("long")
            hi_col = F.lit(lo_hi[1]).cast("long")
        else:
            start_sql = _compile_expr_tokens(groups[2], df)
            end_sql = _compile_expr_tokens(groups[3], df)
            lo_col = F.expr(
                f"unix_micros(CAST({start_sql} AS TIMESTAMP))")
            hi_col = F.expr(
                f"unix_micros(CAST({end_sql} AS TIMESTAMP))")
        base = df.select(
            F.expr(id_sql).alias("__w_id"),
            F.expr(f"unix_micros(CAST({tl_sql} AS TIMESTAMP))")
             .alias("__w_t"),
            lo_col.alias("__w_lo"),
            hi_col.alias("__w_hi"),
        ).where(F.col("__w_t").isNotNull()
                & (F.col("__w_t") >= F.col("__w_lo"))
                & (F.col("__w_t") <= F.col("__w_hi")))

        def us_lit(toks, name):
            sql2 = _compile_expr_tokens(toks, df)
            try:
                v = int(sql2.strip("() "))
            except ValueError:
                raise ValueError(
                    f"KQL: {what} {name} must be a timespan literal, "
                    f"got {sql2!r}")
            if v <= 0:
                raise ValueError(f"KQL: {what} {name} must be > 0")
            return v
        return base, us_lit

    def _sliding_window_counts(self, df: DataFrame,
                               argtext: str) -> DataFrame:
        """``evaluate sliding_window_counts(IdColumn, Timeline, Start,
        End, LookbackWindow, Bin)`` — per grid bin T (Start..End step
        Bin), the event count and distinct-id count inside the
        trailing window (T - Lookback, T] — Kusto's rolling
        count/dcount plugin (the MAU-curve workhorse).

        Spark-first shape: each event EXPLODES to the <=
        ceil(Lookback/Bin) grid bins it contributes to (a generated
        in-row sequence — bounded fan-out, no self-join, no window
        over an unbounded frame), then ONE map-side-combined groupBy
        computes count + exact countDistinct per bin. At 100 TB the
        fan-out factor is Lookback/Bin (e.g. 30 for MAU/day) — the
        standard explode-to-bins trade; swap countDistinct for an HLL
        sketch when exactness is negotiable."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 6:
            raise ValueError(
                "KQL: sliding_window_counts(id, timeline, start, end, "
                "lookback, bin)")
        base, us_lit = self._window_base(
            df, groups, "sliding_window_counts")
        look = us_lit(groups[4], "lookback")
        bin_us = us_lit(groups[5], "bin")
        k = -(-look // bin_us)  # ceil: max bins one event can touch
        # first contributing grid bin >= t (grid aligned to Start)
        t0 = ("__w_lo + CAST(ceil((__w_t - __w_lo) "
              f"/ CAST({bin_us} AS DOUBLE)) AS BIGINT) * {bin_us}")
        binned = base.select(
            "__w_id",
            F.explode(F.expr(
                f"filter(transform(sequence(0, {k - 1}), "
                f"__swc_j -> ({t0}) + __swc_j * {bin_us}), "
                f"__swc_b -> __swc_b - __w_t < {look} "
                f"AND __swc_b <= __w_hi)")).alias("__w_bin"))
        return (binned.groupBy("__w_bin")
                .agg(F.count("*").alias("count_"),
                     F.countDistinct("__w_id").alias("dcount"))
                .select(F.timestamp_micros(F.col("__w_bin"))
                         .alias("bin"), "count_", "dcount"))

    def _activity_engagement(self, df: DataFrame,
                             argtext: str) -> DataFrame:
        """``evaluate activity_engagement(IdColumn, Timeline, Start,
        End, InnerActivityWindow, OuterActivityWindow)`` — the
        DAU/MAU-style engagement ratio: for each grid bin T (step =
        inner window), dcount of ids active in the inner trailing
        window over dcount active in the outer trailing window, both
        ending at T. Same explode-to-bins shape as
        sliding_window_counts with two conditional distinct counts in
        ONE aggregate (the inner flag is a per-row bin-distance test,
        so no second pass)."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 6:
            raise ValueError(
                "KQL: activity_engagement(id, timeline, start, end, "
                "inner, outer)")
        base, us_lit = self._window_base(
            df, groups, "activity_engagement")
        inner = us_lit(groups[4], "inner window")
        outer = us_lit(groups[5], "outer window")
        if outer % inner != 0:
            raise ValueError("KQL: activity_engagement outer window "
                             "must be a multiple of the inner window")
        k = outer // inner
        t0 = ("__w_lo + CAST(ceil((__w_t - __w_lo) "
              f"/ CAST({inner} AS DOUBLE)) AS BIGINT) * {inner}")
        binned = base.select(
            "__w_id", F.col("__w_t"),
            F.explode(F.expr(
                f"filter(transform(sequence(0, {k - 1}), "
                f"__ae_j -> ({t0}) + __ae_j * {inner}), "
                f"__ae_b -> __ae_b - __w_t < {outer} "
                f"AND __ae_b <= __w_hi)")).alias("__w_bin"))
        in_inner = (F.col("__w_bin") - F.col("__w_t")) < inner
        return (binned.groupBy("__w_bin")
                .agg(F.countDistinct(
                         F.when(in_inner, F.col("__w_id")))
                       .alias("dcount_activities_inner"),
                     F.countDistinct("__w_id")
                       .alias("dcount_activities_outer"))
                .select(
                    F.timestamp_micros(F.col("__w_bin")).alias("bin"),
                    "dcount_activities_inner",
                    "dcount_activities_outer",
                    F.round(F.col("dcount_activities_inner")
                            / F.col("dcount_activities_outer"), 4)
                     .alias("activity_ratio")))

    def _rows_near(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate rows_near(Condition, NumRows [, RowsAfter])`` —
        rows within NumRows BEFORE and RowsAfter (default NumRows)
        AFTER any condition-matching row, in serialized order — the
        log-context operator (grep -C for tables).

        Pure window function: ``max(cond) OVER (rows BETWEEN
        -RowsAfter AND +NumRows)`` marks the neighborhood (note the
        frame inversion: a row is kept when a MATCH lies at most
        NumRows ahead of it or RowsAfter behind it), whole-stage
        codegen, no Python. Inside ``partition by key (...)`` the
        frame is key-partitioned (the scale shape); unscoped input
        hits the serialize guard."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) not in (2, 3):
            raise ValueError(
                "KQL: rows_near(condition, rows_before[, rows_after])")
        if self._order is None:
            raise ValueError("KQL: rows_near needs a preceding "
                             "'sort by' (serialized order)")
        cond_sql = _compile_expr_tokens(groups[0], df,
                                        self._order_sql,
                                        self._partition_sql)

        def n_of(toks, what):
            sql2 = _compile_expr_tokens(toks, df)
            try:
                v = int(sql2.strip("() "))
            except ValueError:
                raise ValueError(f"KQL: rows_near {what} must be an "
                                 f"integer literal, got {sql2!r}")
            if v < 0:
                raise ValueError(f"KQL: rows_near {what} must be >= 0")
            return v
        before = n_of(groups[1], "rows_before")
        after = n_of(groups[2], "rows_after") if len(groups) == 3 \
            else before
        from pyspark.sql import Window
        if self._partition:
            w = Window.partitionBy(*self._partition) \
                      .orderBy(*self._order)
        else:
            _warn_global_serialize("rows_near()", df)
            w = Window.orderBy(*self._order)
        w = w.rowsBetween(-after, before)
        mark = F.max(F.expr(cond_sql).cast("boolean")
                      .cast("int")).over(w)
        return (df.withColumn("__rn_keep", mark)
                  .where(F.col("__rn_keep") == 1)
                  .drop("__rn_keep"))

    def _activity_counts_metrics(self, df: DataFrame,
                                 argtext: str) -> DataFrame:
        """``evaluate activity_counts_metrics(IdColumn, Timeline,
        Start, End, Window)`` — per tumbling window: total events,
        distinct ids, NEW distinct ids (first ever seen in that
        window), and the cumulative distinct count up to and
        including the window (Kusto's aggregated_dcount).

        Spark-first shape: one groupBy for per-window count/dcount;
        new ids from a per-id MIN(timeline) aggregate re-binned (one
        extra map-side-combined pass — no self-join); the cumulative
        distinct is the running SUM of new ids over the window axis
        (exactly equal to dcount-so-far, since each id is new exactly
        once) — a tiny window over the per-bin frame, not the data."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 5:
            raise ValueError(
                "KQL: activity_counts_metrics(id, timeline, start, "
                "end, window)")
        base, us_lit = self._window_base(
            df, groups, "activity_counts_metrics")
        win = us_lit(groups[4], "window")
        binned = base.withColumn(
            "__w_bin",
            F.col("__w_lo") + ((F.col("__w_t") - F.col("__w_lo"))
                               / win).cast("long") * win)
        if not df.isStreaming:
            # two aggregation branches (per-bin counts, per-id first
            # seen) over the same binned events: scan once
            binned = self._persist_bounded(binned)
        per_bin = (binned.groupBy("__w_bin")
                   .agg(F.count("*").alias("count_"),
                        F.countDistinct("__w_id").alias("dcount")))
        first_seen = (binned.groupBy("__w_id")
                      .agg(F.min("__w_bin").alias("__w_bin")))
        new_per_bin = (first_seen.groupBy("__w_bin")
                       .agg(F.count("*").alias("new_dcount")))
        from pyspark.sql import Window
        out = (per_bin.join(new_per_bin, "__w_bin", "left")
               .withColumn("new_dcount",
                           F.coalesce(F.col("new_dcount"),
                                      F.lit(0)).cast("long")))
        wrun = Window.orderBy("__w_bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        return (out.withColumn("aggregated_dcount",
                               F.sum("new_dcount").over(wrun)
                                .cast("long"))
                   .select(F.timestamp_micros(F.col("__w_bin"))
                            .alias("bin"), "count_", "dcount",
                           "new_dcount", "aggregated_dcount"))

    def _activity_metrics(self, df: DataFrame,
                          argtext: str) -> DataFrame:
        """``evaluate activity_metrics(IdColumn, Timeline, Start, End,
        Window)`` — per tumbling window (aligned to Start): distinct
        ids, NEW distinct ids, and retention/churn vs the PREVIOUS
        window — retained = ids active in both the previous and the
        current window; ``retention_rate`` = retained / previous
        window's dcount, ``churn_rate`` = 1 - retention_rate (both
        0.0 when there is no previous activity; documented).

        Spark-first shape: ONE distinct (window, id) frame feeds
        everything — per-window dcount (groupBy), first-seen new ids
        (per-id min + re-bin, no self-join), and retained ids via a
        single equi-join of the frame against itself shifted one
        window on (id, window) keys. Every stage is a
        map-side-combined shuffle on small keys; the joined frame is
        (distinct ids x windows), already collapsed from raw events."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 5:
            raise ValueError(
                "KQL: activity_metrics(id, timeline, start, end, "
                "window)")
        base, us_lit = self._window_base(df, groups,
                                         "activity_metrics")
        win = us_lit(groups[4], "window")
        wi = (base.select(
                  F.col("__w_id"),
                  (F.col("__w_lo")
                   + ((F.col("__w_t") - F.col("__w_lo")) / win)
                     .cast("long") * win).alias("__w_bin"))
                  .distinct())
        if not df.isStreaming:
            # the distinct (window, id) frame feeds FOUR branches
            # (dcount, first-seen, the shifted prev side, retained);
            # persist it once so raw events are scanned and
            # deduplicated a single time (bounded LRU registry)
            wi = self._persist_bounded(wi)
        per_bin = (wi.groupBy("__w_bin")
                   .agg(F.count("*").alias("dcount_values")))
        first_seen = (wi.groupBy("__w_id")
                      .agg(F.min("__w_bin").alias("__w_bin")))
        new_per_bin = (first_seen.groupBy("__w_bin")
                       .agg(F.count("*").alias("dcount_newvalues")))
        prev = wi.select(F.col("__w_id"),
                         (F.col("__w_bin") + win).alias("__w_bin"))
        retained = (wi.join(prev, ["__w_id", "__w_bin"], "inner")
                    .groupBy("__w_bin")
                    .agg(F.count("*").alias("__am_ret")))
        prev_dc = per_bin.select(
            (F.col("__w_bin") + win).alias("__w_bin"),
            F.col("dcount_values").alias("__am_prev"))
        out = (per_bin
               .join(new_per_bin, "__w_bin", "left")
               .join(retained, "__w_bin", "left")
               .join(prev_dc, "__w_bin", "left")
               .withColumn("dcount_newvalues",
                           F.coalesce("dcount_newvalues", F.lit(0))
                            .cast("long"))
               .withColumn("__am_ret",
                           F.coalesce("__am_ret", F.lit(0)))
               .withColumn(
                   "retention_rate",
                   F.round(F.when(F.col("__am_prev") > 0,
                                  F.col("__am_ret")
                                  / F.col("__am_prev"))
                            .otherwise(F.lit(0.0)), 4))
               .withColumn(
                   "churn_rate",
                   F.round(F.when(F.col("__am_prev") > 0,
                                  1 - F.col("__am_ret")
                                  / F.col("__am_prev"))
                            .otherwise(F.lit(0.0)), 4)))
        return out.select(
            F.timestamp_micros(F.col("__w_bin")).alias("bin"),
            "dcount_values", "dcount_newvalues",
            "retention_rate", "churn_rate")

    def _dcount_intersect(self, df: DataFrame,
                          argtext: str) -> DataFrame:
        """``evaluate dcount_intersect(hll_1, hll_2 [, hll_3, hll_4])``
        — Kusto's audience-overlap plugin: per input row, ``s0`` =
        dcount of set 1, ``s1`` = dcount of sets 1∩2, ``s2`` = 1∩2∩3,
        ... computed from the hll() SKETCH columns alone via
        inclusion-exclusion over sketch unions (|∩S| = Σ (-1)^(|r|+1)
        |∪r| over nonempty r ⊆ S) — sketches union losslessly but
        cannot intersect, so this identity IS the production recipe:
        the fact table is never re-scanned, only per-group sketches
        combine. Pure JVM expressions (hll_union + estimate per term;
        2^k terms, k <= 4 — bounded). Estimates are EXACT while every
        union stays in the Datasketches sparse regime (hundreds of
        distincts), which is what the oracled entry pins; beyond that
        the usual HLL error applies, same documented deviation as
        dcount. Output: pass-through columns + s0..s{k-1} (long);
        the sketch columns are consumed."""
        from itertools import combinations

        groups = _split_top_commas(_tokenize(argtext))
        if not 2 <= len(groups) <= 4:
            raise ValueError(
                "KQL: dcount_intersect(hll1, hll2[, hll3[, hll4]])")
        cols = []
        for g in groups:
            if len(g) != 1 or g[0].kind != "ident" \
                    or g[0].text not in df.columns:
                raise ValueError(
                    "KQL: dcount_intersect args must be hll-sketch "
                    "columns of the input table")
            cols.append(g[0].text)

        def union_est(subset) -> str:
            # an empty set's sketch aggregates to NULL (all inputs
            # filtered); Kusto treats it as the empty set, so the
            # union is null-safe (null ∪ X = X) and only an
            # all-empty union estimates to 0
            expr = f"`{subset[0]}`"
            for c in subset[1:]:
                expr = (f"(CASE WHEN {expr} IS NULL THEN `{c}` "
                        f"WHEN `{c}` IS NULL THEN {expr} "
                        f"ELSE hll_union({expr}, `{c}`) END)")
            return f"coalesce(hll_sketch_estimate({expr}), 0)"

        sels = [F.col(c) for c in df.columns if c not in cols]
        for i in range(len(cols)):
            sub = cols[:i + 1]
            terms = []
            for r in range(1, len(sub) + 1):
                for combo in combinations(sub, r):
                    sign = "+" if r % 2 == 1 else "-"
                    terms.append(f"{sign} {union_est(combo)}")
            sels.append(F.expr("(" + " ".join(terms) + ")")
                         .cast("long").alias(f"s{i}"))
        return df.select(*sels)

    def _percentilew_approx(self, df: DataFrame, argtext: str) \
            -> DataFrame:
        """``evaluate percentilew_approx(value, weight, P, scale [,
        by...])``: weighted percentile ESTIMATE with bounded state —
        the scale path for percentilew() (kql.py exact fold), whose
        collect_list buffers a whole group's rows on one executor when
        a key skews (the r9 verdict's one perf flag).

        Shape: (1) portable-round each value onto a fixed grid
        (``bucket = ROUND(value / scale, 0)`` — resolution is the
        caller's accuracy/state trade) and pre-aggregate the scaled
        integer weights per (group, bucket): map-side combinable, one
        shuffle, per-group state bounded by the GRID cardinality, not
        the group's row count; (2) a cumulative window over the tiny
        bucket frame picks the smallest bucket whose running weight
        reaches P% of the total — the same crossing rule as the exact
        fold, so estimate == exact whenever ``scale`` resolves the
        data (pinned in tests). All accumulators are exact integers
        (weights at 1e4), so the result is engine-portable and
        hash-checkable."""
        parts = [p.strip() for p in _split_top_commas_text(argtext)]
        if len(parts) < 4:
            raise ValueError(
                "KQL: percentilew_approx(value, weight, P, scale"
                "[, by...])")
        v, w, p, scale = parts[0], parts[1], float(parts[2]), \
            float(parts[3])
        by = parts[4:]
        from pyspark.sql import Window as _W
        # FLOOR(x + 0.5) bucketing: the one convention across the
        # sketch family (tdigest uses it too) — single IEEE ops,
        # bit-identical cross-engine, no per-row BigDecimal hop
        # (see queries.py portable-rounding note)
        bucket = F.floor(F.col(v) / F.lit(scale) + F.lit(0.5)) \
                  .cast("long")
        wgt = F.floor(F.col(w) * F.lit(10000.0) + F.lit(0.5)) \
               .cast("long")
        pre = (df.where(F.col(v).isNotNull() & F.col(w).isNotNull()
                        & (F.col(w) > 0))
                 .groupBy(*by, bucket.alias("__pwb"))
                 .agg(F.sum(wgt).alias("__pww")))
        win = _W.partitionBy(*by).orderBy("__pwb") \
                .rowsBetween(_W.unboundedPreceding, 0)
        tot = _W.partitionBy(*by)
        cum = (pre.withColumn("__pwc", F.sum("__pww").over(win))
                  .withColumn("__pwt", F.sum("__pww").over(tot)))
        crossed = cum.where(
            F.col("__pwc") >= F.lit(p / 100.0) * F.col("__pwt"))
        out_col = f"p{p:g}".replace(".", "_")
        return (crossed.groupBy(*by)
                       .agg((F.min("__pwb") * F.lit(scale))
                            .alias(out_col)))

    def _percentilew_exact(self, df: DataFrame, argtext: str) \
            -> DataFrame:
        """``evaluate percentilew_exact(value, weight, P [, by...])``:
        exact weighted percentile WITHOUT per-group buffering — the
        100 TB shape for percentilew() when the estimate isn't
        acceptable. The summarize-form percentilew() collect_lists a
        whole group's (value, weight) pairs onto one executor (fine
        until a key skews); this plugin is the relational form of the
        same crossing rule: pre-aggregate weights per (group, DISTINCT
        value) — map-side combinable, one shuffle — then a cumulative
        window over values picks the smallest value whose running
        weight reaches P% of the total. State per group is the
        distinct-value count, spread across executors by the shuffle,
        never a single-task array.

        Exactness contract: values are exact (no grid — this is the
        difference from percentilew_approx); weights land on a 1e-4
        resolution integer scale so the cumulative sums are
        order-independent exact integers (hash-portable; the fold's
        raw-double accumulation is summation-order-dependent and
        could not be oracled). Same null/non-positive-weight drops as
        the fold. Output column p<P> next to the by-keys."""
        parts = [p.strip() for p in _split_top_commas_text(argtext)]
        if len(parts) < 3:
            raise ValueError(
                "KQL: percentilew_exact(value, weight, P [, by...])")
        v, w, p = parts[0], parts[1], float(parts[2])
        by = parts[3:]
        from pyspark.sql import Window as _W
        wgt = F.floor(F.col(w) * F.lit(10000.0) + F.lit(0.5)) \
               .cast("long")
        pre = (df.where(F.col(v).isNotNull() & F.col(w).isNotNull()
                        & (F.col(w) > 0))
                 .groupBy(*by, F.col(v).cast("double").alias("__pev"))
                 .agg(F.sum(wgt).alias("__pew")))
        win = _W.partitionBy(*by).orderBy("__pev") \
                .rowsBetween(_W.unboundedPreceding, 0)
        tot = _W.partitionBy(*by)
        cum = (pre.withColumn("__pec", F.sum("__pew").over(win))
                  .withColumn("__pet", F.sum("__pew").over(tot)))
        crossed = cum.where(
            F.col("__pec") >= F.lit(p / 100.0) * F.col("__pet"))
        out_col = f"p{p:g}".replace(".", "_")
        return (crossed.groupBy(*by)
                       .agg(F.min("__pev").alias(out_col)))

    def _rolling_percentile(self, df: DataFrame, argtext: str) \
            -> DataFrame:
        """``evaluate rolling_percentile(value, pct, binAxis, binSize,
        rollingWindows [, by...])`` — Kusto's rolling-window
        percentile: for every ``binSize`` bin of ``binAxis``, the
        exact pct-percentile of ``value`` over the last
        ``rollingWindows`` bins (current bin included).

        Scale shape: each row fans out to the <= rollingWindows output
        bins it contributes to (a bounded explode — the bins-spine
        pattern every activity plugin here uses), weights
        pre-aggregate per (group, out-bin, DISTINCT value) —
        map-side combinable, one shuffle — and a cumulative window
        picks the smallest value whose running count reaches pct% of
        the window total: the same crossing rule as
        percentilew_exact, with counts as exact integer weights, so
        the output is engine-portable. No per-window array is ever
        buffered. Output: by-keys, bin (timestamp or numeric like the
        axis), p<pct>. Bins with no contributing rows are absent
        (Kusto emits the observed axis range; the spine-join to fill
        gaps composes with make-series downstream)."""
        parts = [p.strip() for p in _split_top_commas_text(argtext)]
        if len(parts) < 5:
            raise ValueError(
                "KQL: rolling_percentile(value, pct, binAxis, "
                "binSize, rollingWindows [, by...])")
        v, pct_s, axis, binsize_s, wins_s = parts[:5]
        by = parts[5:]
        pct = float(pct_s)
        wins = int(wins_s)
        if wins < 1:
            raise ValueError(
                "KQL: rolling_percentile rollingWindows must be >= 1")
        axis_col = F.col(axis)
        axis_type = df.select(axis_col.alias("__rpa")) \
                      .schema[0].dataType.typeName()
        if axis_type in ("timestamp", "timestamp_ntz"):
            size_us = _timespan_to_us(binsize_s)
            bin_idx = F.floor(F.unix_micros(axis_col)
                              / F.lit(size_us)).cast("long")

            def bin_out(idx):
                return F.timestamp_micros(idx * F.lit(size_us))
        else:
            size = float(binsize_s)
            bin_idx = F.floor(axis_col / F.lit(size)).cast("long")

            def bin_out(idx):
                return idx * F.lit(size)
        from pyspark.sql import Window as _W
        fan = (df.where(F.col(v).isNotNull()
                        & axis_col.isNotNull())
                 .withColumn("__rpb", bin_idx)
                 .withColumn("__rpo", F.explode(F.sequence(
                     F.col("__rpb"),
                     F.col("__rpb") + F.lit(wins - 1))))
                 .groupBy(*by, F.col("__rpo"),
                          F.col(v).cast("double").alias("__rpv"))
                 .agg(F.count(F.lit(1)).alias("__rpw")))
        # clip fanned-out bins to the observed axis range per group
        # (a trailing row must not invent future bins past the data).
        # No broadcast hint: the per-group max frame is tiny and AQE
        # broadcasts it at runtime (hint policy, PLANS.md)
        rng = (df.withColumn("__rpb", bin_idx)
                 .groupBy(*by)
                 .agg(F.max("__rpb").alias("__rpmax")))
        fan = (fan.join(rng, by, "inner") if by
               else fan.crossJoin(rng))
        fan = fan.where(F.col("__rpo") <= F.col("__rpmax"))
        win = _W.partitionBy(*by, "__rpo").orderBy("__rpv") \
                .rowsBetween(_W.unboundedPreceding, 0)
        tot = _W.partitionBy(*by, "__rpo")
        cum = (fan.withColumn("__rpc", F.sum("__rpw").over(win))
                  .withColumn("__rpt", F.sum("__rpw").over(tot)))
        crossed = cum.where(
            F.col("__rpc") >= F.lit(pct / 100.0) * F.col("__rpt"))
        out_col = f"p{pct:g}".replace(".", "_")
        return (crossed.groupBy(*by, "__rpo")
                       .agg(F.min("__rpv").alias(out_col))
                       .select(*by,
                               bin_out(F.col("__rpo")).alias("bin"),
                               out_col))

    def _tdigest(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate tdigest(value, scale [, by...])``: build a
        MERGEABLE quantile sketch per group — the re-aggregatable
        carrier Kusto's tdigest()/tdigest_merge()/percentile_tdigest()
        family provides, realized as a deterministic GRID sketch
        instead of an opaque centroid t-digest: values land on a fixed
        bucket grid (``FLOOR(value/scale + 0.5)``, resolution = the
        caller's accuracy/state trade) and the sketch is the sorted
        (bucket, count) array. Deliberate deviation from Kusto's
        centroid digest, for a reason the hash gate enforces: centroid
        t-digests are MERGE-ORDER-DEPENDENT (two cluster topologies
        give two different sketches), while the grid sketch is
        bit-identical under any partitioning/merge order — same
        accuracy knob, reproducible answers.

        Scale shape: groupBy(by, bucket) count (map-side combinable,
        one shuffle, state bounded by grid cardinality) then ONE
        sort_array(collect_list) per group whose size is the grid
        cardinality, never the row count. Output column ``tdigest`` =
        struct<scale:double, bs:array<struct<b,w>>>."""
        parts = [p.strip() for p in _split_top_commas_text(argtext)]
        if len(parts) < 2:
            raise ValueError(
                "KQL: tdigest(value, scale [, by...])")
        v, scale = parts[0], float(parts[1])
        by = parts[2:]
        bucket = F.floor(F.col(v) / F.lit(scale) + F.lit(0.5)) \
                  .cast("long")
        pre = (df.where(F.col(v).isNotNull())
                 .groupBy(*by, bucket.alias("__tdb"))
                 .agg(F.count("*").alias("__tdw")))
        return (pre.groupBy(*by)
                .agg(F.struct(
                    F.lit(scale).alias("scale"),
                    F.sort_array(F.collect_list(F.struct(
                        F.col("__tdb").alias("b"),
                        F.col("__tdw").alias("w")))).alias("bs"))
                    .alias("tdigest")))

    def _tdigest_merge(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate tdigest_merge(td [, by...])``: re-aggregate grid
        sketches (see _tdigest) to a coarser grouping — explode the
        bounded bucket arrays, SUM counts per (group, bucket), pack
        back sorted. Exact-integer merge, so
        merge(per-shard sketches) == sketch(all rows) IDENTICALLY (the
        re-aggregation identity the oracled entry proves — a property
        centroid t-digests only approximate). All input sketches must
        share one scale (built by the same tdigest call — mixing
        scales is a caller error; the first scale wins, documented)."""
        parts = [p.strip() for p in _split_top_commas_text(argtext)]
        if len(parts) < 1:
            raise ValueError("KQL: tdigest_merge(td [, by...])")
        td = parts[0]
        by = parts[1:]
        ex = (df.select(*by, F.col(f"{td}.scale").alias("__tds"),
                        F.explode(f"{td}.bs").alias("__tde"))
                .groupBy(*by, F.col("__tde.b").alias("__tdb"))
                .agg(F.sum("__tde.w").alias("__tdw"),
                     F.first("__tds").alias("__tds1")))
        return (ex.groupBy(*by)
                .agg(F.struct(
                    F.first("__tds1").alias("scale"),
                    F.sort_array(F.collect_list(F.struct(
                        F.col("__tdb").alias("b"),
                        F.col("__tdw").alias("w")))).alias("bs"))
                    .alias(td)))

    def _ipv4_lookup(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate ipv4_lookup(LookupTable, SourceIPColumn,
        LookupKeyColumn [, return_unmatched])`` — enrich rows by
        matching an IPv4 string column against a CIDR lookup table;
        on multiple matching networks the LONGEST prefix wins
        (Kusto's contract). ``return_unmatched=true`` keeps unmatched
        source rows with null lookup columns (left join), default
        drops them (inner).

        Spark-first shape: the lookup's DISTINCT prefix lengths
        (driver-side bounded collect — a CIDR table is a dimension,
        and there are at most 33 lengths) drive a bounded in-row
        explode of each source IP into its (len, ip >> (32-len))
        keys, which EQUI-JOIN the broadcast lookup on (len, shifted
        net) — a hash join per se, never a theta/cross join, and the
        fan-out is |distinct prefix lengths|, not |lookup|. One
        row_number over (source row id, prefix desc) keeps the
        longest match. Lookup column names must not collide with
        source columns (documented; rename in the lookup pipe)."""
        from pyspark.sql import Window

        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) not in (3, 4):
            raise ValueError(
                "KQL: ipv4_lookup(LookupTable, SourceIPColumn, "
                "LookupKeyColumn [, return_unmatched])")
        if len(groups[0]) != 1 or groups[0][0].kind != "ident":
            raise ValueError(
                "KQL: ipv4_lookup lookup table must be a table / "
                "let-bound name")
        lk = self._operand(groups[0][0].text)
        ip_col = _compile_expr_tokens(groups[1], df)
        if len(groups[2]) != 1 or groups[2][0].kind != "ident" \
                or groups[2][0].text not in lk.columns:
            raise ValueError(
                "KQL: ipv4_lookup key must be a column of the lookup "
                "table")
        key = groups[2][0].text
        unmatched = False
        if len(groups) == 4:
            txt = "".join(t.text for t in groups[3]).replace(" ", "")
            if txt not in ("return_unmatched=true",
                           "return_unmatched=false", "true", "false"):
                raise ValueError(
                    "KQL: ipv4_lookup 4th arg must be "
                    "return_unmatched=true|false")
            unmatched = txt.endswith("true")
        collide = [c for c in lk.columns if c != key
                   and c in df.columns]
        if collide:
            raise ValueError(
                f"KQL: ipv4_lookup lookup columns {collide} collide "
                f"with source columns — project-rename them first")
        # Kusto returns the lookup key (CIDR) column with the match;
        # keep it, renamed only if it collides with a source column
        out_key = key if key not in df.columns else f"{key}_lookup"
        net_sql = f"split_part(`{key}`, '/', 1)"
        valid, net_num = _ExprParser._ipv4_num(net_sql)
        plen_sql = (f"(CASE WHEN nullif(split_part(`{key}`, '/', 2), "
                    f"'') IS NULL THEN 32 ELSE try_cast("
                    f"split_part(`{key}`, '/', 2) AS INT) END)")
        lk2 = (lk.withColumn("__ipl_len", F.expr(plen_sql))
                 .withColumn("__ipl_net", F.expr(
                     f"CASE WHEN {valid} THEN {net_num} END"))
                 .where(F.col("__ipl_net").isNotNull()
                        & F.col("__ipl_len").between(0, 32))
                 .withColumn("__ipl_key", F.expr(
                     "shiftright(__ipl_net, 32 - __ipl_len)"))
                 .withColumn("__ipl_hit", F.lit(1))
                 .withColumnRenamed(key, out_key)
                 .drop("__ipl_net"))
        plens = sorted({r[0] for r in
                        lk2.select("__ipl_len").distinct().collect()})
        if not plens:
            raise ValueError("KQL: ipv4_lookup lookup table has no "
                             "valid CIDR keys")
        s_valid, s_num = _ExprParser._ipv4_num(ip_col)
        src = (df.withColumn("__ipl_rid",
                             F.monotonically_increasing_id())
                 .withColumn("__ipl_ip", F.expr(
                     f"CASE WHEN {s_valid} THEN {s_num} END")))
        keys = F.array(*[
            F.struct(F.lit(L).alias("__ipl_len"),
                     F.expr(f"shiftright(__ipl_ip, {32 - L})")
                      .alias("__ipl_key"))
            for L in plens])
        exploded = (src.withColumn("__ipl_k", F.explode(keys))
                    .select("*", "__ipl_k.__ipl_len",
                            "__ipl_k.__ipl_key").drop("__ipl_k"))
        joined = exploded.join(F.broadcast(lk2),
                               ["__ipl_len", "__ipl_key"],
                               "left" if unmatched else "inner")
        # matched rows first (the left join pads EVERY exploded prefix
        # length of an unmatched row, and __ipl_len survives from the
        # left side — only the lookup-side hit marker distinguishes a
        # real match), then the longest prefix among matches, then the
        # CIDR key text — then every other lookup column — so duplicate
        # equal-length (even textually identical) networks break ties
        # DETERMINISTICALLY across runs (r8 advice)
        lk_order = [F.col(out_key).asc_nulls_last()] + [
            F.col(c).asc_nulls_last() for c in lk.columns if c != key]
        w = Window.partitionBy("__ipl_rid").orderBy(
            F.col("__ipl_hit").desc_nulls_last(),
            F.col("__ipl_len").desc(), *lk_order)
        out = (joined.withColumn("__ipl_rn",
                                 F.row_number().over(w))
               .where(F.col("__ipl_rn") == 1))
        return out.drop("__ipl_rid", "__ipl_ip", "__ipl_len",
                        "__ipl_key", "__ipl_rn", "__ipl_hit")

    def _new_activity_metrics(self, df: DataFrame,
                              argtext: str) -> DataFrame:
        """``evaluate new_activity_metrics(IdColumn, Timeline, Start,
        End, Window)`` — COHORT retention: for every (from, to)
        window pair with to >= from, the ids NEW in `from` (first
        ever seen there), how many of them are active in `to`
        (retained), how many are not (churned), and the rates over
        the cohort size. The diagonal (from == to) is the cohort
        definition row (retention 1.0 by construction).

        Spark-first shape: the distinct (window, id) frame and the
        per-id first-seen frame both derive from ONE aggregation
        pass; cohort x activity is a single equi-join on id (cohort
        rows carry their first window, activity rows every window —
        the join output is bounded by sum over ids of their active
        windows, never |ids| x |windows|); one groupBy on the (from,
        to) pair finishes. Churn falls out arithmetically
        (cohort - retained) — no anti-join."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 5:
            raise ValueError(
                "KQL: new_activity_metrics(id, timeline, start, end, "
                "window)")
        base, us_lit = self._window_base(df, groups,
                                         "new_activity_metrics")
        win = us_lit(groups[4], "window")
        wi = (base.select(
                  F.col("__w_id"),
                  (F.col("__w_lo")
                   + ((F.col("__w_t") - F.col("__w_lo")) / win)
                     .cast("long") * win).alias("__w_bin"))
                  .distinct())
        if not df.isStreaming:
            # three consumers (first-seen, activity join side twice
            # removed): one scan + one distinct, then reuse
            wi = self._persist_bounded(wi)
        first_seen = (wi.groupBy("__w_id")
                      .agg(F.min("__w_bin").alias("__nam_from")))
        cohort = (first_seen.groupBy("__nam_from")
                  .agg(F.count("*").alias("dcount_new_values")))
        pairs = (first_seen.join(wi, "__w_id")
                 .where(F.col("__w_bin") >= F.col("__nam_from"))
                 .groupBy("__nam_from",
                          F.col("__w_bin").alias("__nam_to"))
                 .agg(F.count("*")
                       .alias("dcount_retained_newvalues")))
        out = (pairs.join(cohort, "__nam_from")
               .withColumn("dcount_churn_newvalues",
                           (F.col("dcount_new_values")
                            - F.col("dcount_retained_newvalues"))
                           .cast("long"))
               .withColumn("retention_rate",
                           F.round(F.col("dcount_retained_newvalues")
                                   / F.col("dcount_new_values"), 4))
               .withColumn("churn_rate",
                           F.round(F.col("dcount_churn_newvalues")
                                   / F.col("dcount_new_values"), 4)))
        return out.select(
            F.timestamp_micros(F.col("__nam_from")).alias("from_bin"),
            F.timestamp_micros(F.col("__nam_to")).alias("to_bin"),
            "dcount_new_values", "dcount_retained_newvalues",
            "dcount_churn_newvalues", "retention_rate", "churn_rate")

    def _session_count(self, df: DataFrame,
                       argtext: str) -> DataFrame:
        """``evaluate session_count(IdColumn, Timeline, Start, End,
        Bin, LookBackWindow)`` — per grid bin T (Start..End step Bin),
        the number of SESSIONS active at T. A session is the classic
        gaps-and-islands run: it starts at an id's first event (or an
        event more than LookBackWindow after the previous one) and
        stays active until LookBackWindow passes with no activity —
        i.e. it covers [first_t, last_t + LookBack).

        Spark-first shape: per-id sessionization is ONE window pass
        (lag + conditional-sum island ids — no self-join), sessions
        collapse to (start, end) by groupBy, and the per-bin count is
        a range join of the session segments against the BROADCAST
        bins spine (#bins rows — compile-time tiny), aggregated
        map-side. Session count per bin is bounded by active ids, the
        spine by the grid — nothing scales with raw event count after
        the first aggregate."""
        from pyspark.sql import Window

        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 6:
            raise ValueError(
                "KQL: session_count(id, timeline, start, end, bin, "
                "lookback)")
        # Start/End evaluate ONCE driver-side (a literal SELECT, no
        # scan — the toscalar precedent) and the same values feed BOTH
        # the bins spine and the row filter, so a volatile expression
        # cannot diverge between them (r8 advice); an inverted or
        # null range is an error, never a silent empty spine
        start_sql = _compile_expr_tokens(groups[2], df)
        end_sql = _compile_expr_tokens(groups[3], df)
        row0 = self.spark.sql(
            f"SELECT unix_micros(CAST({start_sql} AS TIMESTAMP)) "
            f"AS lo, unix_micros(CAST({end_sql} AS TIMESTAMP)) "
            f"AS hi").first()
        lo, hi = row0["lo"], row0["hi"]
        if lo is None or hi is None:
            raise ValueError(
                "KQL: session_count Start/End must evaluate to "
                "datetimes")
        if hi < lo:
            raise ValueError(
                f"KQL: session_count End must be >= Start "
                f"(got Start={lo}us > End={hi}us)")
        base, us_lit = self._window_base(df, groups, "session_count",
                                         lo_hi=(lo, hi))
        bin_us = us_lit(groups[4], "bin")
        look = us_lit(groups[5], "lookback")
        w = Window.partitionBy("__w_id").orderBy("__w_t")
        marked = (base
                  .withColumn("__sc_prev", F.lag("__w_t").over(w))
                  .withColumn(
                      "__sc_new",
                      (F.col("__sc_prev").isNull()
                       | (F.col("__w_t") - F.col("__sc_prev")
                          > look)).cast("long"))
                  .withColumn("__sc_sid",
                              F.sum("__sc_new").over(
                                  w.rowsBetween(Window.unboundedPreceding,
                                                Window.currentRow))))
        sessions = (marked.groupBy("__w_id", "__sc_sid")
                    .agg(F.min("__w_t").alias("__sc_s"),
                         (F.max("__w_t") + look).alias("__sc_e")))
        bins = (self.spark.range(0, (hi - lo) // bin_us + 1)
                .select((F.lit(lo) + F.col("id") * bin_us)
                        .alias("__sc_bin")))
        return (sessions.join(
                    F.broadcast(bins),
                    (F.col("__sc_bin") >= F.col("__sc_s"))
                    & (F.col("__sc_bin") < F.col("__sc_e")), "inner")
                .groupBy("__sc_bin")
                .agg(F.count("*").alias("count_"))
                .select(F.timestamp_micros(F.col("__sc_bin"))
                         .alias("bin"), "count_"))

    def _active_users_count(self, df: DataFrame,
                            argtext: str) -> DataFrame:
        """``evaluate active_users_count(IdColumn, Timeline, Start,
        End, LookbackWindow, Period, ActivePeriodsCount, Bin)`` —
        per grid bin T (Start..End step Bin), the number of distinct
        ids that were active in at least ``ActivePeriodsCount``
        DISTINCT periods (epoch-aligned, width ``Period``) inside the
        trailing window (T - Lookback, T] — Kusto's stickiness-aware
        MAU plugin (a user must show up on >= N separate days to
        count, filtering drive-by activity).

        Spark-first shape: the sliding_window_counts explode-to-bins
        fan-out (bounded, no self-join) carrying the event's period
        index, then TWO map-side-combined aggregations — per (bin,
        id) distinct-period count, filter >= N, per-bin count. At
        100 TB both shuffles are on (bin, id) / bin keys; no state
        beyond the aggregation hash maps."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 8:
            raise ValueError(
                "KQL: active_users_count(id, timeline, start, end, "
                "lookback, period, active_periods, bin)")
        base, us_lit = self._window_base(
            df, groups, "active_users_count")
        look = us_lit(groups[4], "lookback")
        per = us_lit(groups[5], "period")
        n_req_sql = _compile_expr_tokens(groups[6], df)
        try:
            n_req = int(n_req_sql.strip("() "))
        except ValueError:
            raise ValueError(
                "KQL: active_users_count active_periods must be an "
                f"integer literal, got {n_req_sql!r}")
        if n_req < 1:
            raise ValueError(
                "KQL: active_users_count active_periods must be >= 1")
        bin_us = us_lit(groups[7], "bin")
        k = -(-look // bin_us)
        t0 = ("__w_lo + CAST(ceil((__w_t - __w_lo) "
              f"/ CAST({bin_us} AS DOUBLE)) AS BIGINT) * {bin_us}")
        binned = base.select(
            "__w_id",
            # floor division (not DIV, which truncates toward zero):
            # pre-epoch timestamps must bucket to the floor period like
            # the DuckDB // convention
            F.expr(f"CAST(floor(__w_t / CAST({per} AS DOUBLE)) "
                   f"AS BIGINT)").alias("__w_p"),
            F.explode(F.expr(
                f"filter(transform(sequence(0, {k - 1}), "
                f"__auc_j -> ({t0}) + __auc_j * {bin_us}), "
                f"__auc_b -> __auc_b - __w_t < {look} "
                f"AND __auc_b <= __w_hi)")).alias("__w_bin"))
        per_id = (binned.groupBy("__w_bin", "__w_id")
                  .agg(F.countDistinct("__w_p").alias("__auc_np")))
        return (per_id.where(F.col("__auc_np") >= n_req)
                .groupBy("__w_bin")
                .agg(F.count("*").alias("dcount"))
                .select(F.timestamp_micros(F.col("__w_bin"))
                         .alias("bin"), "dcount"))

    def _python_plugin(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate python(typeof(<schema>), '<script>'
        [, kargs])`` — Kusto's inline-Python plugin: the script
        receives the input as a pandas DataFrame ``df`` (plus
        ``kargs`` and pre-imported ``pd``/``np``) and must assign a
        pandas DataFrame ``result`` matching the declared output
        schema. ``typeof(*)`` keeps the input schema; ``typeof(*,
        c:type)`` appends columns; ``typeof(c1:t1, ...)`` replaces it.

        Spark-first shape — and the SAME distribution contract as
        Kusto, which runs the script once per data extent: the script
        executes once per Arrow batch inside ``mapInPandas``, so it
        must be partition-local (row-wise transforms, per-row
        featurization). Global computations belong in KQL operators
        around the plugin, exactly as Kusto's docs prescribe. kargs
        must be a dynamic(...) literal (broadcast with the closure)."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) not in (2, 3):
            raise ValueError(
                "KQL: python(typeof(...), 'script' [, dynamic kargs])")
        spec = "".join(t.text for t in groups[0]).strip()
        sm = re.fullmatch(r"typeof\s*\((.*)\)", spec, re.DOTALL)
        if not sm:
            raise ValueError("KQL: python() first arg must be "
                             "typeof(...)")
        fields: list[tuple[str, str]] = []
        star = False
        body = sm.group(1).strip()
        if body:
            for part in body.split(","):
                part = part.strip()
                if part == "*":
                    star = True
                    continue
                bits = [b.strip() for b in part.split(":")]
                if (len(bits) != 2 or bits[1] not in self._DT_TYPES
                        or bits[1] == "dynamic"):
                    # dynamic out-columns excluded: Arrow can't carry
                    # VARIANT back from pandas — emit JSON text and
                    # todynamic() it after the plugin
                    raise ValueError(
                        f"KQL: python() bad typeof field {part!r}")
                fields.append((bits[0], self._DT_TYPES[bits[1]]))
        if not star and not fields:
            raise ValueError("KQL: python() typeof() needs * or "
                             "name:type fields")
        st = groups[1][0] if groups[1] else None
        if st is None or st.kind != "str" or len(groups[1]) != 1:
            raise ValueError("KQL: python() script must be one "
                             "string literal")
        script = _py_str_lit(st.text)
        kargs: dict = {}
        if len(groups) == 3:
            ktext = "".join(t.text for t in groups[2]).strip()
            km = re.fullmatch(r"dynamic\s*\((.*)\)", ktext, re.DOTALL)
            if not km:
                raise ValueError("KQL: python() kargs must be a "
                                 "dynamic({...}) literal")
            import json as _json
            kargs = _json.loads(km.group(1))
        in_schema = [(f.name, f.dataType.simpleString())
                     for f in df.schema.fields]
        out_fields = (in_schema + fields) if star else fields
        out_ddl = ", ".join(f"`{n}` {t}" for n, t in out_fields)
        out_names = [n for n, _ in out_fields]
        code = compile(script, "<kql python()>", "exec")

        def run(batches):
            import numpy as np
            import pandas as pd
            for pdf in batches:
                ns = {"df": pdf, "kargs": kargs, "pd": pd, "np": np}
                exec(code, ns)
                res = ns.get("result")
                if not isinstance(res, pd.DataFrame):
                    raise ValueError(
                        "KQL: python() script must assign a pandas "
                        "DataFrame to `result`")
                yield res[out_names]

        return df.mapInPandas(run, out_ddl)

    def _funnel_sequence(self, df: DataFrame,
                         argtext: str) -> DataFrame:
        """``evaluate funnel_sequence(IdColumn, Timeline, Start, End,
        MaxSequenceStepWindow, Step, StateColumn,
        dynamic(['s1','s2',...]))`` — Kusto's funnel-sequence plugin:
        for ids that executed the state sequence (consecutive events,
        each within MaxSequenceStepWindow of the previous), the
        distribution of the state immediately BEFORE the sequence and
        immediately AFTER it, as distinct-id counts per (prev, next)
        pair. Missing prev/next render as '' like Kusto. ``Step`` is
        validated but only shapes Kusto's secondary per-period tables,
        which this single-table rendering does not emit (documented).

        Spark-first shape: one window per id (single shuffle on the id
        key), a LEAD-CHAIN of the compile-time sequence length for the
        match predicate — no per-row Python, no automaton — then a
        tiny (prev, next) distinct-count rollup. Window order is
        (timeline, state) so ties are deterministic."""
        from pyspark.sql.window import Window
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 8:
            raise ValueError(
                "KQL: funnel_sequence(id, timeline, start, end, "
                "max_step_window, step, state, dynamic([states]))")
        id_sql = _compile_expr_tokens(groups[0], df)
        tl_sql = _compile_expr_tokens(groups[1], df)
        start_sql = _compile_expr_tokens(groups[2], df)
        end_sql = _compile_expr_tokens(groups[3], df)

        def us_lit(toks, what):
            sql2 = _compile_expr_tokens(toks, df)
            try:
                return int(sql2.strip("() "))
            except ValueError:
                raise ValueError(
                    f"KQL: funnel_sequence {what} must be a timespan "
                    f"literal, got {sql2!r}")
        max_us = us_lit(groups[4], "max step window")
        us_lit(groups[5], "step")  # periods not rendered; validated
        state_sql = _compile_expr_tokens(groups[6], df)
        text = "".join(t.text for t in groups[7])
        am = re.fullmatch(r"dynamic\s*\(\s*\[(.*)\]\s*\)", text,
                          re.DOTALL)
        if not am:
            raise ValueError("KQL: funnel_sequence sequence must be a "
                             "dynamic([...]) literal")
        states = []
        for g in _split_top_commas(_tokenize(am.group(1))):
            t0 = g[0] if g else None
            if t0 is None or t0.kind != "str":
                raise ValueError("KQL: funnel_sequence states must be "
                                 "string literals")
            states.append(_py_str_lit(t0.text))
        if not states:
            raise ValueError("KQL: funnel_sequence needs >= 1 state")
        k = len(states)
        base = (df.select(
                    F.expr(id_sql).alias("__fs_id"),
                    F.expr(f"unix_micros(CAST({tl_sql} AS TIMESTAMP))")
                     .alias("__fs_t"),
                    F.expr(state_sql).alias("__fs_s"))
                  .where(F.col("__fs_t").isNotNull())
                  .where((F.col("__fs_t") >= F.expr(
                      f"unix_micros(CAST({start_sql} AS TIMESTAMP))"))
                      & (F.col("__fs_t") <= F.expr(
                      f"unix_micros(CAST({end_sql} AS TIMESTAMP))"))))
        w = Window.partitionBy("__fs_id").orderBy("__fs_t", "__fs_s")
        cond = F.col("__fs_s") == states[0]
        prev_t = F.col("__fs_t")
        for i in range(1, k):
            s_i = F.lead("__fs_s", i).over(w)
            t_i = F.lead("__fs_t", i).over(w)
            cond = cond & (s_i == states[i]) \
                & ((t_i - prev_t) <= F.lit(max_us))
            prev_t = t_i
        matches = (base
                   .withColumn("__fs_prev", F.lag("__fs_s", 1).over(w))
                   .withColumn("__fs_next",
                               F.lead("__fs_s", k).over(w))
                   # window exprs can't live in WHERE — materialize
                   .withColumn("__fs_m", cond)
                   .where(F.col("__fs_m")))
        return (matches
                .groupBy(F.coalesce("__fs_prev", F.lit(""))
                          .alias("prev"),
                         F.coalesce("__fs_next", F.lit(""))
                          .alias("next"))
                .agg(F.count_distinct("__fs_id").cast("long")
                      .alias("dcount")))

    def _funnel_completion(self, df: DataFrame,
                           argtext: str) -> DataFrame:
        """``evaluate funnel_sequence_completion(IdColumn, Timeline,
        Start, End, BinStep, StateColumn, dynamic(['s1','s2',...]),
        dynamic([w1, w2, ...]))`` — Kusto's funnel-completion plugin:
        cohort users by the period (BinStep bins of [Start, End)) of
        their FIRST step-1 event, then for each sequence prefix k
        count the distinct ids that completed steps 1..k in order
        within ``w_k`` of that first event.

        Spark-first shape: prefix k's completion time is the
        SEQUENTIAL MIN — t_k = min(timeline of state_k AFTER t_{k-1})
        — computed as one groupBy-min per step chained by an equi-join
        on the id (k steps = k aggregates + k joins, all
        shuffle-on-key or AQE broadcast; no per-row Python, no
        automaton). Output: one row per (period, prefix) with the
        prefix text and distinct-id count — a long-form rendering of
        Kusto's output (documented shape)."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) != 8:
            raise ValueError(
                "KQL: funnel_sequence_completion(id, timeline, start, "
                "end, step, state, dynamic([states]), "
                "dynamic([windows]))")
        id_sql = _compile_expr_tokens(groups[0], df)
        tl_sql = _compile_expr_tokens(groups[1], df)
        start_sql = _compile_expr_tokens(groups[2], df)
        end_sql = _compile_expr_tokens(groups[3], df)

        def us_lit(toks, what):
            sql2 = _compile_expr_tokens(toks, df)
            try:
                return int(sql2.strip("() "))
            except ValueError:
                raise ValueError(
                    f"KQL: funnel_sequence_completion {what} must be "
                    f"a timespan literal, got {sql2!r}")
        step_us = us_lit(groups[4], "bin step")
        state_sql = _compile_expr_tokens(groups[5], df)

        def arr_lit(toks, what):
            text = "".join(t.text for t in toks)
            am = re.fullmatch(r"dynamic\s*\(\s*\[(.*)\]\s*\)", text,
                              re.DOTALL)
            if not am:
                raise ValueError(
                    f"KQL: funnel_sequence_completion {what} must be "
                    f"a dynamic([...]) literal")
            return _split_top_commas(_tokenize(am.group(1)))
        state_toks = arr_lit(groups[6], "sequence")
        win_toks = arr_lit(groups[7], "windows")
        states = []
        for g in state_toks:
            t0 = g[0] if g else None
            if t0 is None or t0.kind != "str":
                raise ValueError("KQL: funnel sequence states must be "
                                 "string literals")
            states.append(_py_str_lit(t0.text))
        wins = [us_lit(g, "window") for g in win_toks]
        if len(states) < 1 or len(wins) != len(states):
            raise ValueError("KQL: funnel sequence and windows must "
                             "have the same nonzero length")

        # SQL-text batching (r15, guide §7.3): every projection,
        # filter and aggregate below compiles as text — one py4j round
        # trip per DataFrame op instead of 2-4 per Column — the same
        # trick as the minhash 64-agg composition. The parsed trees
        # are identical to the old Column-algebra forms (`/` on longs
        # is double division and CAST(double AS BIGINT) truncates
        # toward zero in both APIs), so results are bit-identical.
        def _sq(s):
            return ("'" + s.replace("\\", "\\\\").replace("'", "\\'")
                    + "'")

        base = df.selectExpr(
            f"({id_sql}) AS __fc_id",
            f"unix_micros(CAST({tl_sql} AS TIMESTAMP)) AS __fc_t",
            f"({state_sql}) AS __fc_s",
            f"unix_micros(CAST({start_sql} AS TIMESTAMP)) AS __fc_lo",
            f"unix_micros(CAST({end_sql} AS TIMESTAMP)) AS __fc_hi",
        ).where("__fc_t IS NOT NULL AND __fc_t >= __fc_lo "
                "AND __fc_t < __fc_hi")
        # t0: first step-1 event per id -> the id's cohort period
        cur = (base.where(f"__fc_s = {_sq(states[0])}")
                   .groupBy("__fc_id")
                   .agg(F.expr("min(__fc_t) AS __fc_t0"),
                        F.expr("first(__fc_lo) AS __fc_lo")))
        cur = cur.withColumn("period", F.expr(
            f"timestamp_micros(__fc_lo + CAST((__fc_t0 - __fc_lo) "
            f"/ {step_us} AS BIGINT) * {step_us})"))
        out_rows = []
        prev_col = "__fc_t0"
        for k in range(len(states)):
            if k > 0:
                ev_k = (base.where(f"__fc_s = {_sq(states[k])}")
                            .selectExpr("__fc_id",
                                        "__fc_t AS __fc_ek"))
                cur = (cur.join(ev_k, "__fc_id")
                          .where(f"__fc_ek > {prev_col}")
                          .groupBy("__fc_id", "__fc_t0", "period")
                          .agg(F.expr(f"min(__fc_ek) AS __fc_t{k}")))
                prev_col = f"__fc_t{k}"
            done = cur.where(f"{prev_col} - __fc_t0 <= {wins[k]}")
            prefix = " -> ".join(states[:k + 1])
            out_rows.append(
                done.groupBy("period")
                    .agg(F.expr("count(DISTINCT __fc_id) AS n_ids"))
                    .selectExpr("period",
                                f"CAST({k + 1} AS BIGINT) "
                                f"AS prefix_len",
                                f"{_sq(prefix)} AS prefix", "n_ids"))
        out = out_rows[0]
        for o in out_rows[1:]:
            out = out.unionByName(o)
        return out

    def _basket(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate basket([threshold])``: frequent-itemset mining
        over the table's string attributes — every attribute
        combination (null = wildcard) covering at least ``threshold``
        fraction of rows (Kusto's default 0.05), with count and
        percent. Kusto's plugin is Apriori; this is the same EXACT
        cube enumeration as autocluster (one aggregate pass, map-side
        combined, 2^k grouping sets with the documented k<=6 bound) —
        Apriori's level-wise pruning is an optimization for when the
        lattice doesn't fit one pass, which at k<=6 it always does.
        Differences from autocluster (matching Kusto's plugins): the
        threshold is a FRACTION, defaults to 0.05, and all frequent
        patterns are returned (no specificity-based segment cover)."""
        thr = float(argtext) if argtext.strip() else 0.05
        if not (0 < thr <= 1):
            raise ValueError("KQL: basket threshold must be in (0, 1]")
        cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() == "string"]
        if not cols:
            raise ValueError("KQL: basket found no string columns")
        if len(cols) > 6:
            raise ValueError(
                "KQL: basket over >6 string columns (2^k grouping "
                "sets) — project to the attribute columns first")
        total = df.count()
        spec = None
        for c in cols:
            s = F.when(F.col(c).isNotNull(), 1).otherwise(0)
            spec = s if spec is None else spec + s
        return (df.cube(*cols).count()
                  .withColumn("percent",
                              F.round(F.col("count") * 100.0 / total,
                                      4))
                  .withColumn("__spec", spec)
                  .where((F.col("__spec") >= 1)
                         & (F.col("count") >= thr * total))
                  .drop("__spec")
                  .withColumn("count", F.col("count").cast("long")))

    def _diffpatterns(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate diffpatterns(split_col, 'A', 'B' [, min_diff])``:
        which attribute patterns differ most between two cohorts — the
        root-cause-analysis twin of autocluster (Kusto's diffpatterns).
        Attributes are the table's remaining string columns; for every
        cube pattern the two cohorts' coverage percentages (of their
        own cohort sizes) and the difference are reported, keeping
        patterns with |diff| >= min_diff (default 1.0). ONE cube
        aggregate with conditional counts — single pass, map-side
        combined; same exact-enumeration contract and k<=6 bound as
        autocluster."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) not in (3, 4):
            raise ValueError(
                "KQL: diffpatterns(split_col, 'A', 'B' [, min_diff])")
        split = groups[0][0].text
        va = _compile_expr_tokens(groups[1], df)
        vb = _compile_expr_tokens(groups[2], df)
        min_diff = (float("".join(t.text for t in groups[3]))
                    if len(groups) == 4 else 1.0)
        cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() == "string" and f.name != split]
        if not cols:
            raise ValueError("KQL: diffpatterns found no attribute columns")
        if len(cols) > 6:
            raise ValueError(
                "KQL: diffpatterns over >6 attribute columns — project "
                "to the attribute columns first")
        in_a = F.expr(f"`{split}` = {va}")
        in_b = F.expr(f"`{split}` = {vb}")
        totals = df.agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("ta"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("tb")).first()
        ta, tb = totals["ta"] or 0, totals["tb"] or 0
        if ta == 0 or tb == 0:
            raise ValueError("KQL: diffpatterns: empty cohort")
        spec = None
        for c in cols:
            s = F.when(F.col(c).isNotNull(), 1).otherwise(0)
            spec = s if spec is None else spec + s
        agg = (df.where(in_a | in_b)
                 .cube(*cols)
                 .agg(F.sum(F.when(in_a, 1).otherwise(0)).cast("long")
                       .alias("count_a"),
                      F.sum(F.when(in_b, 1).otherwise(0)).cast("long")
                       .alias("count_b")))
        pa = F.round(F.col("count_a") * 100.0 / ta, 4)
        pb = F.round(F.col("count_b") * 100.0 / tb, 4)
        return (agg.withColumn("percent_a", pa)
                   .withColumn("percent_b", pb)
                   .withColumn("percent_diff",
                               F.round(pa - pb, 4))
                   .withColumn("specificity", spec.cast("long"))
                   .where((F.col("specificity") >= 1)
                          & (F.abs(F.col("percent_diff")) >= min_diff)))

    def _ai_embeddings(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate ai_embeddings(TextCol [, 'provider' [, dim]])``
        (alias ``ai_embed_text``): append an ``embedding``
        array<float> column — the entry point that chains into this
        engine's knn/IVF-PQ/RRF retrieval stack.

        Providers:
        - ``'hash'`` (default): the DETERMINISTIC hashing-trick
          embedder — tokens bucket by xxhash64 into ``dim`` (default
          64) counts, L2-normalized. Pure codegen (no UDF, no
          service), reproducible across engines and runs; the
          documented stand-in where Kusto calls a hosted model.
          Honest contract: it captures lexical overlap only — real
          semantic similarity needs a model provider.
        - any other name: loud COMPILE-TIME error — this engine makes
          no network calls; the extension point for a real model is a
          pandas-UDF kernel via ``evaluate python(...)`` or a
          precomputed embedding column (the embeddings fixture
          table), both documented in the error."""
        groups = _split_top_commas(_tokenize(argtext))
        if not groups or len(groups) > 3:
            raise ValueError(
                "KQL: ai_embeddings(textCol [, 'provider' [, dim]])")
        col = _compile_expr_tokens(groups[0], df)
        provider = "hash"
        if len(groups) >= 2:
            t = groups[1][0]
            if t.kind != "str":
                raise ValueError(
                    "KQL: ai_embeddings provider must be a string "
                    "literal")
            provider = t.text[1:-1].lower()
        dim = 64
        if len(groups) == 3:
            dim = int("".join(t.text for t in groups[2]))
            if not (1 <= dim <= 4096):
                raise ValueError("KQL: ai_embeddings dim in [1, 4096]")
        if provider != "hash":
            raise ValueError(
                f"KQL: ai_embeddings provider {provider!r} — this "
                f"engine makes no network calls; use 'hash' (the "
                f"deterministic hashing-trick embedder), wire a model "
                f"kernel via `evaluate python(...)`, or join a "
                f"precomputed embedding column")
        toks = (f"filter(split(lower(trim(CAST({col} AS STRING))), "
                f"'[^a-z0-9]+'), __ae_t -> __ae_t != '')")
        counts = (f"transform(sequence(0, {dim - 1}), __ae_i -> "
                  f"CAST(size(filter({toks}, __ae_t -> "
                  f"pmod(xxhash64(__ae_t), {dim}) = __ae_i)) "
                  f"AS DOUBLE))")
        # bind-once (the r9 lambda-body re-evaluation gotcha): the
        # bucket fold is O(dim * tokens) per row, so it must evaluate
        # ONCE — outer struct hop binds counts, inner binds the norm
        norm = (f"sqrt(aggregate(__ae_s1.c, CAST(0 AS DOUBLE), "
                f"(__ae_a, __ae_v) -> __ae_a + __ae_v * __ae_v))")
        inner = (f"CASE WHEN __ae_s2.n = 0 THEN "
                 f"transform(__ae_s2.c, __ae_v -> CAST(0 AS FLOAT)) "
                 f"ELSE transform(__ae_s2.c, __ae_v -> "
                 f"CAST(__ae_v / __ae_s2.n AS FLOAT)) END")
        emb = (f"(CASE WHEN {col} IS NULL THEN NULL ELSE "
               f"element_at(transform(array(named_struct("
               f"'c', {counts})), __ae_s1 -> "
               f"element_at(transform(array(named_struct("
               f"'c', __ae_s1.c, 'n', {norm})), __ae_s2 -> {inner}), "
               f"1)), 1) END)")
        return df.withColumn("embedding", F.expr(emb))

    def _preview(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate preview(N)``: Kusto returns TWO tables (an N-row
        sample plus the total row count); this engine's single-frame
        contract folds them into one result — the sample rows with a
        constant ``total_count`` column carrying the second table's
        value. Which N rows are previewed is unspecified in Kusto too;
        here it's the first N in partition order. Scale shape: the
        limit short-circuits the scan, the count is one map-side-
        combined aggregate, and the 1-row join broadcasts under AQE."""
        n = int(argtext.strip())
        if n <= 0:
            raise ValueError("KQL: preview(N) needs N >= 1")
        cnt = df.agg(F.count("*").cast("long").alias("total_count"))
        return df.limit(n).crossJoin(cnt)

    def _schema_merge(self, df: DataFrame, argtext: str) -> DataFrame:
        """``evaluate schema_merge([PreserveOrder])`` over a union of
        ``getschema`` outputs (ColumnName, ColumnOrdinal, DataType):
        one row per column name, first-seen ordinal, the data type
        when all sources agree. DOCUMENTED DEVIATION: on a type
        conflict Kusto's closed-source plugin reports an error-typed
        column; here the merged type widens to 'variant' (this
        engine's dynamic carrier) — the honest supertype for a reader
        that must load both shards. PreserveOrder=true (default)
        orders by first-seen ordinal, else by column name."""
        arg = argtext.strip().lower()
        if arg not in ("", "true", "false"):
            raise ValueError("KQL: schema_merge([PreserveOrder])")
        need = {"ColumnName", "ColumnOrdinal", "DataType"}
        if not need <= set(df.columns):
            raise ValueError(
                "KQL: schema_merge input must be getschema-shaped "
                "(ColumnName, ColumnOrdinal, DataType)")
        merged = (df.groupBy("ColumnName")
                    .agg(F.min("ColumnOrdinal").cast("long")
                          .alias("ColumnOrdinal"),
                         F.when(F.count_distinct("DataType") == 1,
                                F.min("DataType"))
                          .otherwise(F.lit("variant"))
                          .alias("DataType")))
        order = ("ColumnName" if arg == "false" else "ColumnOrdinal")
        return merged.orderBy(order).select(
            "ColumnName", "ColumnOrdinal", "DataType")

    def _diffpatterns_text(self, df: DataFrame,
                           argtext: str) -> DataFrame:
        """``evaluate diffpatterns_text(text_col, split_col, 'A', 'B'
        [, min_diff])``: which whitespace-token line patterns differ
        between two cohorts — the text twin of diffpatterns, sharing
        its argument and output conventions (count_a/b, percent_a/b,
        percent_diff vs each cohort's own size; |diff| >= min_diff,
        default 1.0).

        DOCUMENTED APPROXIMATION of Kusto's closed-source plugin
        (whose algorithm is unpublished): lines group by (token count,
        first token) — the event-type anchor that dominates log
        formats — and each token position keeps its token when the
        whole group agrees, else generalizes to '*'. Every line
        matches its group's pattern BY CONSTRUCTION, so counts are
        exact for the emitted patterns under any partitioning (no
        sampling, unlike Kusto's).

        Scale shape: tokenize + posexplode -> two groupBy passes
        (per-position consensus, then per-group pattern assembly) and
        one groupBy for cohort counts — all map-side combinable, no
        driver-side rows, no UDF."""
        groups = _split_top_commas(_tokenize(argtext))
        if len(groups) not in (4, 5):
            raise ValueError(
                "KQL: diffpatterns_text(text_col, split_col, 'A', "
                "'B' [, min_diff])")
        text = groups[0][0].text
        split = groups[1][0].text
        va = _compile_expr_tokens(groups[2], df)
        vb = _compile_expr_tokens(groups[3], df)
        min_diff = (float("".join(t.text for t in groups[4]))
                    if len(groups) == 5 else 1.0)
        in_a = F.expr(f"`{split}` = {va}")
        in_b = F.expr(f"`{split}` = {vb}")
        totals = df.agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("ta"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("tb")).first()
        ta, tb = totals["ta"] or 0, totals["tb"] or 0
        if ta == 0 or tb == 0:
            raise ValueError("KQL: diffpatterns_text: empty cohort")
        toks = F.expr(
            f"filter(split(trim(CAST(`{text}` AS STRING)), "
            f"'\\\\s+'), __dt_t -> __dt_t != '')")
        base = (df.where(in_a | in_b)
                  .select(F.when(in_a, 1).otherwise(0).alias("__ina"),
                          F.when(in_b, 1).otherwise(0).alias("__inb"),
                          toks.alias("__toks"))
                  .withColumn("__n", F.size("__toks"))
                  .withColumn("__anchor",
                              F.coalesce(F.element_at("__toks", 1),
                                         F.lit(""))))
        counts = (base.groupBy("__n", "__anchor")
                      .agg(F.sum("__ina").cast("long").alias("count_a"),
                           F.sum("__inb").cast("long")
                            .alias("count_b")))
        pos = (base.select("__n", "__anchor",
                           F.posexplode("__toks")
                            .alias("__pos", "__tok"))
                   .groupBy("__n", "__anchor", "__pos")
                   .agg(F.when(F.count_distinct("__tok") == 1,
                               F.min("__tok")).otherwise(F.lit("*"))
                         .alias("__part")))
        pats = (pos.groupBy("__n", "__anchor")
                   .agg(F.array_join(
                        F.expr("transform(array_sort(collect_list("
                               "struct(__pos, __part))), "
                               "__dp_s -> __dp_s.__part)"), " ")
                        .alias("pattern")))
        pa = F.round(F.col("count_a") * 100.0 / ta, 4)
        pb = F.round(F.col("count_b") * 100.0 / tb, 4)
        # left join + coalesce: blank lines have no exploded tokens,
        # hence no pattern row — they surface as the '' pattern
        return (counts.join(pats, ["__n", "__anchor"], "left")
                      .withColumn("pattern",
                                  F.coalesce("pattern", F.lit("")))
                      .select("pattern", "count_a", "count_b",
                              pa.alias("percent_a"),
                              pb.alias("percent_b"),
                              F.round(pa - pb, 4)
                               .alias("percent_diff"))
                      .where(F.abs(F.col("percent_diff")) >= min_diff)
                      .orderBy(F.abs(F.col("percent_diff")).desc(),
                               F.col("pattern")))

    def _render(self, df: DataFrame, rest: str) -> DataFrame:
        """``render <charttype> [with (...)]`` — a presentation hint with
        no tabular effect; validated and discarded (this engine has no
        chart surface; ADX renders client-side)."""
        m = re.match(r"([a-z]+chart|table|card|timeline|areachart)"
                     r"\s*(with\s*\(.*\))?\s*$", rest.strip(), re.DOTALL)
        if not m:
            raise ValueError(f"KQL: render: unknown chart type {rest!r}")
        return df

    def _mv_apply(self, df: DataFrame, rest: str) -> DataFrame:
        """``mv-apply elem = arrayExpr on ( subquery )``: expand the
        array per record, run the subquery over each record's expanded
        rows, append its output to the record.

        Spark-first shape: ONE lineage, no self-join — a synthetic
        record id (monotonically_increasing_id, unique within the plan)
        keys the per-record scope; a ``summarize`` inside the subquery
        becomes groupBy(record_id [+ by-keys]) carrying the original
        columns through with first() (all rows in a group share them);
        ``top N by`` becomes a record-partitioned window. Everything
        stays in codegen — no Python, one shuffle iff the subquery
        aggregates.

        Determinism constraint (ENFORCED): the record id is assigned by
        partition layout, so the INPUT to mv-apply must be
        deterministic up to partitioning (a scan + narrow ops). When
        the input plan contains a shuffle-inducing node, a task retry
        could reassign ids between the explode and the groupBy
        (SPARK-23207-class hazard), so the compiler detects the
        shuffle boundary and freezes the input with an eager
        localCheckpoint before assigning ids."""
        from pyspark.sql import Window

        m = re.match(r"(?P<head>.+?)\s+on\s*\((?P<sub>.*)\)\s*$",
                     rest, re.DOTALL)
        if not m:
            raise ValueError("KQL: mv-apply col = expr on ( ... )")
        head = m.group("head")
        # `with_itemindex = name` prefix: emit the 0-based element
        # index alongside each expanded element (r13 probe sweep)
        idx_name = None
        mi = re.match(r"with_itemindex\s*=\s*([A-Za-z_]\w*)\s+(.*)$",
                      head, re.DOTALL)
        if mi:
            idx_name, head = mi.group(1), mi.group(2)
        # trailing `limit N`: keep only the first N elements per
        # record BEFORE the subquery runs (r13 probe sweep)
        lim = None
        ml = re.search(r"\s+limit\s+(\d+)\s*$", head)
        if ml:
            lim = int(ml.group(1))
            head = head[:ml.start()]
        # `to typeof(t)`: cast each expanded element (the standard Kusto
        # idiom for typing dynamic-array elements)
        mt = re.search(r"\s+to\s+typeof\s*\(\s*(\w+)\s*\)\s*$", head)
        cast_t = None
        if mt:
            cast_t = self._DT_TYPES.get(mt.group(1))
            if cast_t is None:
                raise ValueError(
                    f"KQL: mv-apply to typeof({mt.group(1)}) not supported")
            head = head[:mt.start()]
        groups = _split_top_commas(_tokenize(head))
        if len(groups) != 1:
            raise ValueError("KQL: mv-apply supports one applied column")
        rid = "__mv_rid"
        orig_cols = df.columns
        # Enforce the determinism constraint (SPARK-23207 class): the
        # record id below is assigned by partition layout, so a task
        # retry over POST-SHUFFLE input (shuffle fetch order is
        # nondeterministic) could reassign ids between the explode and
        # a downstream groupBy. If the input plan contains a
        # shuffle-inducing node, freeze it with an eager
        # localCheckpoint first — id assignment then reads stable
        # materialized partitions. Scan + narrow ops (the common
        # mv-apply input) skip this entirely.
        try:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception:
            plan = ""
        if re.search(r"\b(Join|Aggregate|Repartition|"
                     r"RepartitionByExpression|Rebalance|Sort|Window|"
                     r"Deduplicate|Distinct|Intersect|Except)\b", plan):
            df = df.localCheckpoint(eager=True)
        name, sql = _named_expr(groups[0], df, "value")
        base = df.withColumn(rid, F.monotonically_increasing_id())
        if idx_name is not None or lim is not None:
            # positional explode path: the element index feeds
            # with_itemindex and/or the per-record limit
            out = base.select(
                "*", F.posexplode(_explodable(df, sql))
                      .alias("__mv_pos", "__mv_val"))
            if lim is not None:
                out = out.where(F.col("__mv_pos") < lim)
            # bare `mv-apply a on ...` rebinds the source column to
            # the element (drop is a no-op when the name is new)
            out = out.drop(name).withColumnRenamed("__mv_val", name)
            if idx_name is not None:
                out = out.withColumnRenamed("__mv_pos", idx_name) \
                         .withColumn(idx_name,
                                     F.col(idx_name).cast("long"))
            else:
                out = out.drop("__mv_pos")
        else:
            out = base.withColumn(name, F.explode(_explodable(df, sql)))
        if cast_t:
            out = out.withColumn(name, F.col(name).cast(cast_t))
        for stage in _split_pipes(m.group("sub")):
            sm = re.match(r"([A-Za-z_-]+)\s*(.*)", stage, re.DOTALL)
            sop, srest = sm.group(1).lower(), sm.group(2).strip()
            if sop in ("where", "extend"):
                out = self._apply(out, stage)
            elif sop == "top":
                m2 = re.match(r"(\d+)\s+by\s+(.*)", srest, re.DOTALL)
                if not m2:
                    raise ValueError("KQL: top N by expr")
                w = Window.partitionBy(rid).orderBy(
                    *self._sort_cols(out, m2.group(2)))
                out = (out.withColumn("__mv_rn", F.row_number().over(w))
                          .where(F.col("__mv_rn") <= int(m2.group(1)))
                          .drop("__mv_rn"))
            elif sop == "summarize":
                out = self._mv_summarize(out, srest, rid, orig_cols)
            else:
                raise ValueError(
                    f"KQL: mv-apply subquery operator {sop!r} not "
                    f"supported (where/extend/top/summarize are)")
        return out.drop(rid)

    def _mv_summarize(self, df: DataFrame, rest: str, rid: str,
                      orig_cols: list[str]) -> DataFrame:
        """summarize inside mv-apply: per-record aggregation — group on
        the record id (+ any explicit by-keys), carry original columns
        with first() (constant within a record's group)."""
        toks = _tokenize(rest)
        by_idx, depth = None, 0
        for i, t in enumerate(toks):
            if t.text in ("(", "["):
                depth += 1
            elif t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "ident" and t.text.lower() == "by":
                by_idx = i
                break
        agg_toks = toks[:by_idx] if by_idx is not None else toks
        key_toks = toks[by_idx + 1:] if by_idx is not None else []
        aggs, agg_names = [], []
        for i, g in enumerate(_split_top_commas(agg_toks)):
            name, sql = _named_expr(g, df, f"agg{i}")
            aggs.append(F.expr(sql).alias(name))
            agg_names.append(name)
        keys, key_names = [F.col(rid)], []
        for i, g in enumerate(_split_top_commas(key_toks)):
            name, sql = _named_expr(g, df, f"key{i}")
            keys.append(F.expr(sql).alias(name))
            key_names.append(name)
        carry = [F.first(c).alias(c) for c in orig_cols
                 if c not in agg_names and c not in key_names]
        out = df.groupBy(*keys).agg(*carry, *aggs)
        ordered = ([c for c in orig_cols
                    if c not in agg_names and c not in key_names]
                   + key_names + agg_names)
        return out.select(rid, *ordered)

    def _top_nested(self, df: DataFrame, rest: str) -> DataFrame:
        """top-nested N1 of col1 by agg1, top-nested N2 of col2 by agg2...

        Hierarchical top-k: top N1 col1 groups by agg1; within each,
        top N2 col2 groups by agg2; and so on. Each level is ONE
        aggregation shuffle over the input plus a broadcast semi-join
        against the (tiny, <=prod(Ni)-row) parent winner set — never a
        nested loop. Ties break deterministically on the key column."""
        from pyspark.sql import Window

        levels = []
        for i, part in enumerate(re.split(r",\s*top-nested\s+",
                                          rest.strip())):
            m = re.match(r"(\d+)\s+of\s+(?P<of>.+?)"
                         r"(?:\s+with\s+others\s*=\s*"
                         r"(?P<oth>'[^']*'|\"[^\"]*\"))?"
                         r"\s+by\s+(.*)$",
                         part, re.DOTALL)
            if not m:
                raise ValueError(
                    "KQL: top-nested N of <col|name = expr> [with "
                    "others = 'label'] by <agg> [, top-nested ...]")
            # `of` accepts a named or bare EXPRESSION, not just a
            # column (r13 probe sweep) — computed keys materialize as
            # columns before the level aggregates group on them
            of_toks = _tokenize(m.group("of"))
            if len(of_toks) == 1 and of_toks[0].kind == "ident":
                col = of_toks[0].text
            else:
                col, csql = _named_expr(of_toks, df, f"level{i}")
                df = df.withColumn(col, F.expr(csql))
            name, sql = _named_expr(_tokenize(m.group(4)), df,
                                    f"aggregated_{col}")
            oth = m.group("oth")
            levels.append((int(m.group(1)), col, name, sql,
                           oth[1:-1] if oth else None))
        if any(lab is not None for *_, lab in levels[:-1]):
            raise ValueError(
                "KQL: 'with others' is supported on the LAST top-nested "
                "level (an others bucket has no deeper nesting)")
        winners = None
        parent_winners = None
        carried: list[str] = []  # parent key + agg columns carried along
        for n, col, name, sql, label in levels:
            prev_keys = [c for c, is_key in carried if is_key]
            agg = df.groupBy(*prev_keys, col).agg(F.expr(sql).alias(name))
            if winners is not None:
                agg = agg.join(F.broadcast(winners), prev_keys)
            w = Window.partitionBy(*prev_keys).orderBy(
                F.col(name).desc(), F.col(col).asc())
            top = (agg.withColumn("__rn", F.row_number().over(w))
                      .where(F.col("__rn") <= n).drop("__rn"))
            parent_winners = winners
            carried = [*carried, (col, True), (name, False)]
            winners = top.select(*[c for c, _ in carried])
        if levels[-1][4] is not None:
            # others bucket per parent: the aggregate RECOMPUTED over the
            # rows outside the winner set (correct for any aggregate,
            # not just decomposable ones), keyed by the string label
            n, col, name, sql, label = levels[-1]
            prev_keys = [c for c, is_key in carried[:-2] if is_key]
            rest_rows = df
            if parent_winners is not None:
                rest_rows = rest_rows.join(F.broadcast(parent_winners),
                                           prev_keys)
            rest_rows = rest_rows.join(
                F.broadcast(winners.select(*prev_keys, col)),
                [*prev_keys, col], "left_anti")
            # group on ALL carried parent columns (keys + their agg
            # values, functionally dependent) so others rows carry the
            # parent aggregates like normal winner rows do
            parent_cols = [c for c, _ in carried[:-2]]
            others = (rest_rows.groupBy(*parent_cols)
                      .agg(F.expr(sql).alias(name))
                      .withColumn(col, F.lit(label)))
            if dict(df.dtypes).get(col) != "string":
                raise ValueError(
                    "KQL: top-nested with others needs a string key "
                    f"column, {col!r} is {dict(df.dtypes).get(col)!r}")
            winners = winners.unionByName(
                others.select(*[c for c, _ in carried]))
        return winners

    _PARSE_PART = re.compile(
        r"""\s*(?:'(?P<sq>(?:[^'\\]|\\.)*)'
              |"(?P<dq>(?:[^"\\]|\\.)*)"
              |(?P<star>\*)
              |(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?::(?P<type>[a-z]+))?)""",
        re.VERBOSE)
    _PARSE_TYPES = {"long": "bigint", "int": "int", "real": "double",
                    "double": "double", "string": None, None: None}

    def _parse(self, df: DataFrame, rest: str,
               where: bool = False) -> DataFrame:
        """parse <col> with ['literal' | name[:type] | *]+
        (``where=True`` = the parse-where operator: rows that do not
        match the pattern are dropped instead of yielding nulls)

        Kusto's pattern-extraction operator: the literal/column sequence
        compiles to ONE anchored regex; each named column is a
        regexp_extract of its capture group (codegen, single scan — no
        Python). Columns between literals capture lazily, a trailing
        column captures to end-of-string; non-matching rows yield null
        (try_cast keeps Kusto's null-on-miss under ANSI mode)."""
        # optional `kind=simple|regex|relaxed [flags=ims]` prefix:
        # regex kind passes quoted fragments through as raw regex
        # (Kusto's escape hatch for patterns `parse` literals can't
        # express); flags map to inline (?ims); relaxed compiles
        # progressive nested-optional groups (r14 — was a documented
        # non-fix through r13).
        kind, rx_flags = "simple", ""
        km = re.match(r"kind\s*=\s*(\w+)(?:\s+flags\s*=\s*(\w+))?\s+(.*)$",
                      rest, re.DOTALL)
        if km:
            kind, rest = km.group(1).lower(), km.group(3)
            if kind not in ("simple", "regex", "relaxed"):
                raise ValueError(f"KQL: parse kind {kind!r}")
            for fl in (km.group(2) or ""):
                if fl not in "ims":
                    raise ValueError(
                        f"KQL: parse flag {fl!r} (i, m, s supported)")
            if km.group(2):
                rx_flags = f"(?{km.group(2)})"
        m = re.match(r"(\w+)\s+with\s+(.*)$", rest, re.DOTALL)
        if not m:
            raise ValueError("KQL: parse <column> with <pattern...>")
        src, spec = m.group(1), m.group(2).strip()
        pieces, cols, i, group = ["^"], [], 0, 0
        while i < len(spec):
            pm = self._PARSE_PART.match(spec, i)
            if not pm or pm.end() == i:
                raise ValueError(f"KQL: bad parse pattern at {spec[i:]!r}")
            i = pm.end()
            if pm.group("sq") is not None or pm.group("dq") is not None:
                lit = pm.group("sq") or pm.group("dq") or ""
                # Kusto string-literal escapes: \n/\t/... decode to their
                # control characters (not the bare letter); quotes and
                # backslash unescape; unknown escapes keep the backslash
                esc = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                       "'": "'", '"': '"', "0": "\0", "a": "\a",
                       "b": "\b", "f": "\f", "v": "\v"}
                if kind == "regex":
                    # raw regex fragment (only quote escapes decode);
                    # its own capturing groups shift the numbering of
                    # later column groups — count them
                    frag = (lit.replace("\\'", "'")
                            if pm.group("sq") is not None
                            else lit.replace('\\"', '"'))
                    pieces.append(frag)
                    group += len(re.findall(r"(?<!\\)\((?!\?)", frag))
                    continue
                lit = re.sub(r"\\(.)",
                             lambda em: esc.get(em.group(1),
                                                "\\" + em.group(1)), lit)
                pieces.append(re.escape(lit))
            elif pm.group("star"):
                pieces.append(".*?")
            else:
                typ = pm.group("type")
                if typ not in self._PARSE_TYPES:
                    raise ValueError(f"KQL: parse type {typ!r} not supported")
                group += 1
                pieces.append(None)  # placeholder; greediness set below
                cols.append((pm.group("name"), typ, group, len(pieces) - 1))
        if kind == "relaxed":
            # Kusto's relaxed mode: every extended column is optional
            # PROGRESSIVELY — the row matches as far as the prefix
            # holds and later columns go unmatched. One regex still:
            # each column opens a nested optional group that contains
            # the capture AND everything after it, so a failed unit
            # fails all later units. Typed columns use TYPED
            # subpatterns (a non-numeric token breaks the chain there,
            # like Kusto); try_cast of the unmatched group's '' yields
            # the null. Documented deviation: an UNMATCHED string
            # column renders '' (Spark's regexp_extract cannot
            # distinguish a non-participating group from a
            # matched-empty one), where Kusto renders null.
            # Typed captures self-delimit, so their trailing literal
            # is optional too (the unit closes right after the
            # capture and the remainder nests one level deeper:
            # 'slices=7' with no trailing text still extracts 7, and
            # a failed typed capture nulls everything after it —
            # Kusto's propagation). A lazy STRING capture has no
            # boundary of its own, so its following literal stays
            # mandatory inside its group.
            n_opt = 0
            for name, typ, gi, pos in cols:
                if typ in ("long", "int"):
                    cap = r"(?:([-+]?\d+)(?:"
                    n_opt += 2
                elif typ in ("real", "double"):
                    cap = (r"(?:([-+]?\d+(?:\.\d+)?"
                           r"(?:[eE][+-]?\d+)?)(?:")
                    n_opt += 2
                else:
                    cap = ("(?:(.*)" if pos == len(pieces) - 1
                           else "(?:(.*?)")
                    n_opt += 1
                pieces[pos] = cap
            pattern = rx_flags + "".join(pieces) + ")?" * n_opt
        else:
            for name, typ, gi, pos in cols:
                # lazy between literals, greedy to end-of-string when
                # last
                pieces[pos] = ("(.*)" if pos == len(pieces) - 1
                               else "(.*?)")
            pattern = rx_flags + "".join(pieces)
        # Kusto null semantics: null only on pattern NON-match. A string
        # column that matches with an empty capture is an empty string
        # (the old nullif() folded it to null); typed columns get null
        # either way since try_cast('') is null.
        matched = F.col(src).rlike(pattern)
        if where:
            df = df.where(matched)
        for name, typ, gi, _pos in cols:
            c = F.regexp_extract(F.col(src), pattern, gi)
            sql_type = self._PARSE_TYPES[typ]
            if sql_type:
                c = c.try_cast(sql_type)
            else:
                c = F.when(matched, c)
            df = df.withColumn(name, c)
        return df

    def _parse_kv(self, df: DataFrame, rest: str) -> DataFrame:
        """``parse-kv Expr as (k1 [:t1], k2 [:t2], ...) with
        (pair_delimiter='...', kv_delimiter='...' [, quote='...'])`` —
        Kusto's key-value extraction operator (the log-parsing
        workhorse next to parse/extract), specified-delimiters mode.

        Spark-first: each requested key compiles to ONE anchored
        ``regexp_extract`` (codegen, single scan, no Python, no map
        build — Spark's str_to_map is unusable here because the default
        mapKeyDedupPolicy=EXCEPTION throws on the duplicate keys real
        log lines contain). The key must start a pair (start-of-string
        or right after a pair delimiter), mirroring Kusto's tokenized
        matching; the FIRST occurrence wins; a missing key yields
        null for typed columns and empty-string for string columns
        (Kusto's documented default for unmatched string keys is the
        empty string). With ``quote``, a quoted value may contain the
        pair delimiter and the surrounding quotes are stripped.

        Subset: regex-mode delimiters and the greedy/escape options are
        not supported (documented)."""
        m = re.match(r"(.+?)\s+as\s*\((?P<keys>.*?)\)\s*"
                     r"(?:with\s*\((?P<opts>.*)\)\s*)?$",
                     rest, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: parse-kv Expr as (key[:type], ...) "
                "with (pair_delimiter='..', kv_delimiter='..')")
        src_sql = _compile_expr_tokens(_tokenize(m.group(1)), df)
        keys = []
        for g in _split_top_commas(_tokenize(m.group("keys"))):
            txt = "".join(t.text for t in g)
            name, _, typ = txt.partition(":")
            typ = typ.strip() or None
            if typ not in self._PARSE_TYPES:
                raise ValueError(f"KQL: parse-kv type {typ!r} "
                                 f"not supported")
            keys.append((name.strip(), typ))
        if not keys:
            raise ValueError("KQL: parse-kv needs at least one key")
        opts = {}
        for part in re.split(r",", m.group("opts") or ""):
            om = re.match(r"\s*(\w+)\s*=\s*(@?)'((?:[^'\\]|\\.)*)'\s*$",
                          part or "")
            if om:
                val = om.group(3)
                if not om.group(2):  # @'...' verbatim: keep as-is
                    val = val.replace("\\\\", "\\").replace("\\'", "'")
                opts[om.group(1).lower()] = val
            elif part.strip():
                raise ValueError(f"KQL: bad parse-kv option {part!r}")
        unsupported = set(opts) - {"pair_delimiter", "kv_delimiter",
                                   "quote", "regex"}
        if unsupported:
            raise ValueError(f"KQL: parse-kv options {sorted(unsupported)}"
                             f" not supported (pair_delimiter, "
                             f"kv_delimiter, quote, regex are)")
        if "regex" in opts:
            # REGEX extraction mode (Kusto): a pattern with exactly two
            # capture groups (key, value); all matches are pulled with
            # ONE pair of regexp_extract_all calls (codegen), then each
            # requested key reads the FIRST occurrence via
            # array_position — no Python, no map build, duplicate-key
            # safe. Delimiter options cannot combine with regex.
            if {"pair_delimiter", "kv_delimiter", "quote"} & set(opts):
                raise ValueError("KQL: parse-kv regex mode cannot "
                                 "combine with delimiter options")
            pat = opts["regex"]
            # Column API, not F.expr: an embedded SQL string literal
            # would re-interpret the pattern's backslashes
            src_col = F.expr(src_sql)
            ks = F.regexp_extract_all(src_col, F.lit(pat), F.lit(1))
            vs = F.regexp_extract_all(src_col, F.lit(pat), F.lit(2))
            for name, typ in keys:
                pos = F.array_position(ks, name)
                c = F.when(pos > 0,
                           F.element_at(vs, pos.cast("int"))
                           ).otherwise(F.lit(""))
                sql_type = self._PARSE_TYPES[typ]
                if sql_type:
                    c = c.try_cast(sql_type)
                df = df.withColumn(name, c)
            return df
        pd_, kvd = opts.get("pair_delimiter", " "), \
            opts.get("kv_delimiter", "=")
        quote = opts.get("quote")
        epd, ekvd = re.escape(pd_), re.escape(kvd)
        if quote:
            eq = re.escape(quote)
            val = f"(?:{eq}([^{eq}]*){eq}|((?:(?!{epd}).)*))"
        else:
            val = f"((?:(?!{epd}).)*)"
        for name, typ in keys:
            pat = (f"(?:^|{epd}){re.escape(name)}{ekvd}{val}")
            if quote:
                # regexp_extract returns '' for a non-participating
                # group, never null — pick the group by whether the
                # FIRST match's value opens with the quote character.
                # Deciding quoted-ness with a whole-string rlike broke
                # first-occurrence-wins when the same key appears first
                # unquoted then quoted in one line (r7 advice #4): the
                # rlike saw the LATER quoted pair while group 1 was
                # extracted from the FIRST (unquoted) match. Group 0 of
                # the same pattern IS the first match, so testing its
                # own prefix keeps the decision and the extraction on
                # the same occurrence.
                first_match = F.regexp_extract(F.expr(src_sql), pat, 0)
                c = F.when(
                    first_match.rlike(
                        f"^(?:{epd})?{re.escape(name)}{ekvd}{eq}"),
                    F.regexp_extract(F.expr(src_sql), pat, 1)
                ).otherwise(F.regexp_extract(F.expr(src_sql), pat, 2))
            else:
                c = F.regexp_extract(F.expr(src_sql), pat, 1)
            sql_type = self._PARSE_TYPES[typ]
            if sql_type:
                c = c.try_cast(sql_type)
            df = df.withColumn(name, c)
        return df

    def _facet(self, df: DataFrame, rest: str) -> DataFrame:
        """``facet by col1 [, col2 ...]`` — one value-frequency table
        per facet column. Kusto emits N separate tables; a DataFrame
        pipeline has one output, so the tables are stacked into the
        long form ``(facet_column, value, count_)`` with the facet
        value STRINGIFIED (the only schema all facets share).

        Multi-output shape (r6 verdict #6): the input is cached ONCE
        and the N children are independent groupBy aggregations over
        that shared scan — at 100 TB the source is read once, and each
        child is its own map-side-combined single shuffle. The ``with
        (subquery)`` clause is not supported (documented subset) —
        pipe the same source through the subquery directly instead."""
        m = re.match(r"by\s+(.*)$", rest, re.DOTALL)
        if not m:
            raise ValueError("KQL: facet by col1[, col2 ...]")
        if re.search(r"\bwith\s*\(", m.group(1)):
            raise ValueError("KQL: facet ... with (subquery) not "
                             "supported; run the subquery as its own "
                             "pipeline over the same source")
        cols = [c.strip().strip("`") for c in m.group(1).split(",")]
        unknown = [c for c in cols if c not in df.columns]
        if not cols or unknown:
            raise ValueError(f"KQL: facet by unknown columns {unknown}")
        if not df.isStreaming:
            df = self._persist_bounded(df)
        parts = [
            df.groupBy(F.col(c).cast("string").alias("value"))
              .agg(F.count("*").alias("count_"))
              .select(F.lit(c).alias("facet_column"), "value", "count_")
            for c in cols]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _fork(self, df: DataFrame, rest: str) -> DataFrame:
        """``fork [name1 =] (subpipe1) [name2 =] (subpipe2) ...`` —
        run N independent sub-pipelines over the same input. Kusto
        emits N tables; here they are stacked with a ``fork_name``
        discriminator column via unionByName(allowMissingColumns) —
        columns a child lacks are null (children whose shared column
        NAMES carry incompatible types are a compile error from
        Spark's union resolver; documented subset).

        Multi-output shape (r6 verdict #6): the input is cached ONCE;
        each child compiles on the cached scan with this compiler's
        own stage machinery (full stage surface, same expression
        semantics as anywhere else)."""
        children, depth, cur, name, names = [], 0, [], None, []
        i = 0
        text = rest
        while i < len(text):
            ch = text[i]
            if depth == 0:
                nm = re.match(r"\s*(?:([A-Za-z_]\w*)\s*=\s*)?\(",
                              text[i:])
                if not nm:
                    if text[i:].strip():
                        raise ValueError(
                            f"KQL: fork expects [name =] (subquery) "
                            f"groups, got {text[i:].strip()[:40]!r}")
                    break
                names.append(nm.group(1))
                i += nm.end()
                depth, cur = 1, []
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    children.append("".join(cur))
                    i += 1
                    continue
            cur.append(ch)
            i += 1
        if depth != 0:
            raise ValueError("KQL: fork: unbalanced parentheses")
        if len(children) < 2:
            raise ValueError("KQL: fork needs >= 2 (subquery) groups")
        if not df.isStreaming:
            df = self._persist_bounded(df)
        outs = []
        for j, (nm, sub) in enumerate(zip(names, children)):
            # Each child compiles in an ISOLATED serialized scope: a
            # `sort by`/`top` inside one child must not leak
            # _order/_order_sql (or a partition scope) into sibling
            # children or post-fork stages — mirror of _partition's
            # snapshot/restore (r7 advice #1).
            saved = (self._partition, self._partition_sql,
                     self._order, self._order_sql)
            try:
                child = df
                for stage in _split_pipes(sub.strip().lstrip("|")):
                    if stage.strip():
                        child = self._apply(child, stage.strip())
            finally:
                (self._partition, self._partition_sql,
                 self._order, self._order_sql) = saved
            outs.append(child.select(
                F.lit(nm or f"fork_{j}").alias("fork_name"), "*"))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o, allowMissingColumns=True)
        return out

    def _make_graph(self, df: DataFrame, rest: str) -> DataFrame:
        """``make-graph Src --> Dst [with NodesTable on NodeId |
        with_node_id=Name]`` — bind the piped table as a graph's edge
        list (every other column an edge property) plus an optional
        node table with properties. No computation happens here: the
        graph is metadata on the compiler (edge df, endpoint columns,
        node df, id column) that the following ``graph-match`` stage
        compiles into joins; the edge table flows through unchanged.

        Undirected ``Src -- Dst`` binds each edge row in BOTH
        directions (the edge table is unioned with its endpoint swap
        before any pattern compiles — one narrow union, no shuffle);
        note with cycles=unique_edges the two directions of one
        undirected row count as distinct edges (documented subset).
        Nodes from a named table / let / subquery via ``with ... on
        ...``, or derived implicitly (ids only) bare or via
        ``with_node_id=``."""
        m = re.match(
            r"([A-Za-z_]\w*)\s*(-->|--)\s*([A-Za-z_]\w*)\s*"
            r"(?:with_node_id\s*=\s*(?P<nid>\w+)"
            r"|with\s+(?:\((?P<sub>.*)\)|(?P<ntab>[A-Za-z_]\w*))"
            r"\s+on\s+(?P<on>\w+))?\s*$",
            rest, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: make-graph Src -->|-- Dst [with Nodes on Id | "
                "with_node_id=Name]")
        src, arrow, dst = m.group(1), m.group(2), m.group(3)
        for c in (src, dst):
            if c not in df.columns:
                raise ValueError(f"KQL: make-graph: no edge column "
                                 f"{c!r}")
        if arrow == "--":
            # undirected: one narrow union with swapped endpoints —
            # every downstream operator (match, shortest-paths,
            # components) then sees both directions
            swapped = df.select(
                *[F.col(dst).alias(src) if c == src
                  else F.col(src).alias(dst) if c == dst
                  else F.col(c) for c in df.columns])
            df = df.unionByName(swapped)
        nodes, nid = None, None
        if m.group("on"):
            nid = m.group("on")
            nodes = (self.compile(m.group("sub").strip())
                     if m.group("sub") is not None
                     else self._operand(m.group("ntab")))
            if nid not in nodes.columns:
                raise ValueError(f"KQL: make-graph: node table has no "
                                 f"column {nid!r}")
        self._graph = {"edges": df, "src": src, "dst": dst,
                       "nodes": nodes, "nid": nid,
                       "nid_name": m.group("nid")}
        return df

    #: variable-length edge cap: -[*1..k]-> expands to a UNION of k
    #: fixed chains; beyond this the query should be an iterative
    #: connected-components / BFS job, not a pattern match
    _GRAPH_MAX_HOPS = 8

    def _graph_match(self, df: DataFrame, rest: str) -> DataFrame:
        """``graph-match [cycles=all|none|unique_edges]
        (a)-[e]->(b)[-[f]->(c)...] [, (x)-[g]->(y)...] [where expr]
        project name = expr, ...`` — fixed-pattern graph matching
        compiled to EQUI-JOIN CHAINS (the Spark-first answer to an
        operator Spark lacks: each pattern edge is one alias of the
        edge table, consecutive edges join on the shared node id,
        node properties join in from the node table). At 100 TB every
        join is a plain shuffle-on-key (or broadcast when the
        dimension side is small — AQE decides), no driver-side
        traversal, no iteration.

        Anonymous variable-length edges ``-[*1..3]->`` (cap 8 hops)
        COLLAPSE to a (entry, exit, path-count) segment frame before
        joining the rest of the pattern (their inner bindings are
        never projectable): per-path multiplicity — Kusto's one row
        per matched path — is restored by ONE final explode over the
        product of segment counts, so intermediates stay bounded at
        |V|^2 per hop level instead of O(avg_degree^hops) enumerated
        paths (r7 verdict #6).

        ``cycles=`` default is **unique_edges** (Kusto's default: no
        edge repeated within one match), enforced pairwise over fixed
        edge aliases on (src, dst) and inside each variable-length
        segment; documented subset: parallel edges (duplicate
        (src, dst) rows) count as one edge for uniqueness, and
        uniqueness is not enforced ACROSS a collapsed segment
        boundary. ``cycles=all`` allows repeated edges (segments then
        use the pure count-BFS recurrence); ``cycles=none``
        additionally makes all named node variables pairwise
        distinct (segment-interior nodes exempt — documented).

        Supported subset (documented): directed ``-[e]->`` /
        ``<-[e]-`` and undirected ``-[e]-`` edges (r13 verdict #5:
        an undirected pattern edge is one alias over the
        two-orientation union of the edge table — each physical edge
        matches in both directions, Kusto/Cypher semantics, still one
        narrow union + equi-join per edge); chains and comma-separated
        patterns sharing
        node variables (patterns must be CONNECTED — a disconnected
        pattern would be a cartesian product and is rejected);
        ``project`` is required. ``where``/``project`` reference
        node/edge variables as ``var.column`` (a bare node var is its
        node id); with derived nodes (no ``with ... on``) only bare
        node vars are available. Kusto's all_* path aggregates are
        not supported; with cycles=unique_edges the two orientations
        of one undirected edge count as distinct edges (same
        documented subset as make-graph ``--``)."""
        if not getattr(self, "_graph", None):
            raise ValueError("KQL: graph-match needs a preceding "
                             "make-graph stage")
        g = self._graph
        cm = re.match(r"cycles\s*=\s*(\w+)\s+(.*)$", rest, re.DOTALL)
        cycles = "unique_edges"
        if cm:
            cycles = cm.group(1).lower()
            rest = cm.group(2)
            if cycles == "allow":
                cycles = "all"
            if cycles not in ("all", "none", "unique_edges"):
                raise ValueError(
                    "KQL: graph-match cycles=all|none|unique_edges")
        wm = re.search(r"\bwhere\b", rest)
        pm = re.search(r"\bproject\b", rest)
        if not pm:
            raise ValueError("KQL: graph-match requires a project "
                             "clause")
        pat_text = rest[:wm.start() if wm else pm.start()].strip()
        where_text = rest[wm.end():pm.start()].strip() if wm else None
        proj_text = rest[pm.end():].strip()
        if wm and wm.start() > pm.start():
            raise ValueError("KQL: graph-match clause order is "
                             "pattern [where] project")

        # ---- parse patterns into (src_var, edge_var, dst_var, lo, hi)
        node_re = re.compile(r"\(\s*([A-Za-z_]\w*)\s*\)")
        fwd_re = re.compile(
            r"-\[\s*([A-Za-z_]\w*)?\s*"
            r"(?:\*\s*(\d+)\s*\.\.\s*(\d+)\s*)?\]->")
        rev_re = re.compile(
            r"<-\[\s*([A-Za-z_]\w*)?\s*"
            r"(?:\*\s*(\d+)\s*\.\.\s*(\d+)\s*)?\]-")
        undir_re = re.compile(
            r"-\[\s*([A-Za-z_]\w*)?\s*"
            r"(?:\*\s*(\d+)\s*\.\.\s*(\d+)\s*)?\]-(?!>)")
        edges_spec = []

        def parse_chain(text):
            pos = 0
            nm = node_re.match(text, pos)
            if not nm:
                raise ValueError(f"KQL: graph-match bad pattern "
                                 f"{text!r}")
            cur_var, pos = nm.group(1), nm.end()
            while pos < len(text):
                fm2 = fwd_re.match(text, pos)
                rm2 = rev_re.match(text, pos)
                um2 = None if (fm2 or rm2) else undir_re.match(text,
                                                               pos)
                em = fm2 or rm2 or um2
                if not em:
                    raise ValueError(f"KQL: graph-match bad edge at "
                                     f"{text[pos:pos + 20]!r}")
                pos = em.end()
                nm2 = node_re.match(text, pos)
                if not nm2:
                    raise ValueError(f"KQL: graph-match edge needs a "
                                     f"target node at "
                                     f"{text[pos:pos + 20]!r}")
                nxt, pos = nm2.group(1), nm2.end()
                evar, lo, hi = em.group(1), em.group(2), em.group(3)
                if lo is not None:
                    if evar:
                        raise ValueError(
                            "KQL: graph-match variable-length edges "
                            "must be anonymous (-[*1..3]->)")
                    lo, hi = int(lo), int(hi)
                    if not (1 <= lo <= hi
                            <= self._GRAPH_MAX_HOPS):
                        raise ValueError(
                            f"KQL: graph-match hop range must satisfy "
                            f"1 <= lo <= hi <= {self._GRAPH_MAX_HOPS}")
                a, b = (nxt, cur_var) if rm2 else (cur_var, nxt)
                edges_spec.append((a, evar, b,
                                   lo if lo is not None else None,
                                   hi if hi is not None else None,
                                   um2 is not None))
                cur_var = nxt

        for chain in _split_top_commas_text(pat_text):
            parse_chain(chain.strip())
        if not edges_spec:
            raise ValueError("KQL: graph-match needs at least one "
                             "edge")

        # ---- compile the pattern to ONE join chain. A fixed edge is
        # one alias of the edge table; an anonymous variable-length
        # edge -[*lo..hi]-> is COLLAPSED to a segment frame of
        # (entry, exit, path-count) BEFORE it joins the rest of the
        # pattern (r7 verdict #6): its inner bindings are never
        # projectable, so the only observable is the per-path row
        # MULTIPLICITY — carried as an aggregated count and re-expanded
        # by ONE explode at the end. Intermediates stay bounded at
        # |V|^2 per hop level instead of O(avg_degree^hops) paths.
        e_src, e_dst = g["src"], g["dst"]
        edges_df, nodes_df = g["edges"], g["nodes"]

        def _bq(c):
            return "`" + c.replace("`", "``") + "`"

        def both_orient(ed):
            """Two-orientation union for an UNDIRECTED pattern edge:
            endpoints swap, every edge property rides along — one
            narrow union, no shuffle (same shape as make-graph --).
            selectExpr strings, not Column algebra: one py4j round
            trip instead of ~3 per column (r15; guide §7.3
            driver-side build cost)."""
            swapped = ed.selectExpr(
                *[f"{_bq(e_dst)} AS {_bq(e_src)}" if c == e_src
                  else f"{_bq(e_src)} AS {_bq(e_dst)}" if c == e_dst
                  else _bq(c) for c in ed.columns])
            return ed.unionByName(swapped)

        def segment_frame(lo2, hi2, pref, base_df):
            """(entry, exit, count-of-paths) for lo..hi hops."""
            if cycles == "all":
                # count-BFS recurrence: paths_{ln+1}(a,c) =
                # sum_b paths_ln(a,b) * edges(b,c) — one equi-join +
                # one map-side-combined groupBy per level, every level
                # bounded by |V|^2 pairs regardless of path count
                step = base_df.select(F.col(e_src).alias("__sg_s"),
                                      F.col(e_dst).alias("__sg_d"))
                lvl = (step.groupBy(F.col("__sg_s").alias("__sg_a"),
                                    F.col("__sg_d").alias("__sg_b"))
                           .agg(F.count("*").cast("long")
                                 .alias("__sg_c")))
                frames = []
                for ln in range(1, hi2 + 1):
                    if ln > 1:
                        lvl = (lvl.join(step, F.col("__sg_b")
                                        == F.col("__sg_s"))
                                  .groupBy(F.col("__sg_a"),
                                           F.col("__sg_d")
                                           .alias("__sg_b"))
                                  .agg(F.sum("__sg_c")
                                        .alias("__sg_c")))
                    if ln >= lo2:
                        frames.append(lvl)
            else:
                # unique_edges/none exclude walks that reuse an edge
                # inside the segment: per-length chains with pairwise
                # edge-distinct predicates (parallel edges — duplicate
                # (src,dst) rows — count as one edge for uniqueness;
                # documented subset), each length collapsed by count
                # at the segment boundary before touching the rest of
                # the pattern. Hop cap 8 bounds the chain depth.
                frames = []
                for ln in range(lo2, hi2 + 1):
                    cur2, prefs = None, []
                    for j in range(ln):
                        p = f"{pref}l{ln}_{j}_"
                        e = base_df.selectExpr(
                            f"{_bq(e_src)} AS {_bq(p + 's')}",
                            f"{_bq(e_dst)} AS {_bq(p + 'd')}")
                        if cur2 is None:
                            cur2 = e
                        else:
                            cur2 = cur2.join(
                                e, F.expr(
                                    f"{_bq(prefs[-1] + 'd')} = "
                                    f"{_bq(p + 's')}"), "inner")
                        prefs.append(p)
                    # all pairwise edge-distinct predicates as ONE
                    # compiled text (O(ln^2) where() round trips -> 1)
                    pw = [f"NOT ({_bq(prefs[x] + 's')} <=> "
                          f"{_bq(prefs[y] + 's')} AND "
                          f"{_bq(prefs[x] + 'd')} <=> "
                          f"{_bq(prefs[y] + 'd')})"
                          for x in range(ln) for y in range(x + 1, ln)]
                    if pw:
                        cur2 = cur2.where(" AND ".join(pw))
                    frames.append(
                        cur2.groupBy(
                            F.col(prefs[0] + "s").alias("__sg_a"),
                            F.col(prefs[-1] + "d").alias("__sg_b"))
                            .agg(F.count("*").cast("long")
                                  .alias("__sg_c")))
            seg = frames[0]
            for fr in frames[1:]:
                seg = seg.unionByName(fr)
            # lengths are not observable (inner nodes are anonymous):
            # total path count per (entry, exit) is the multiplicity
            seg = (seg.groupBy("__sg_a", "__sg_b")
                      .agg(F.sum("__sg_c").alias("__sg_c")))
            return seg.select(F.col("__sg_a").alias(pref + "s"),
                              F.col("__sg_b").alias(pref + "d"),
                              F.col("__sg_c").alias(pref + "cnt"))

        def compile_pattern(spec):
            bound: dict[str, str] = {}   # node var -> id column name
            evars: dict[str, str] = {}   # edge var -> column prefix
            fixed_prefs: list[str] = []  # fixed-edge aliases
            cnt_cols: list[str] = []     # segment multiplicity columns
            cur = None
            pending = list(spec)
            progress = True
            idx = 0
            while pending:
                if not progress:
                    raise ValueError(
                        "KQL: graph-match pattern is disconnected "
                        "(a cartesian product at scale) — share a "
                        "node variable between patterns")
                progress = False
                for k, (a, ev, b, lo2, hi2, undir) \
                        in enumerate(pending):
                    if cur is not None and a not in bound \
                            and b not in bound:
                        continue
                    pref = f"__ge_{idx}_"
                    idx += 1
                    base = both_orient(edges_df) if undir else edges_df
                    if lo2 is not None:
                        e = segment_frame(lo2, hi2, pref, base)
                        scol, dcol = pref + "s", pref + "d"
                        cnt_cols.append(pref + "cnt")
                    else:
                        e = base.selectExpr(
                            *[f"{_bq(c)} AS {_bq(pref + c)}"
                              for c in base.columns])
                        scol, dcol = pref + e_src, pref + e_dst
                        fixed_prefs.append(pref)
                    if ev:
                        if ev in evars:
                            raise ValueError(
                                f"KQL: graph-match edge variable "
                                f"{ev!r} bound twice")
                        evars[ev] = pref
                    if cur is None:
                        cur = e
                    else:
                        conds = []
                        if a in bound:
                            conds.append(f"{_bq(bound[a])} = "
                                         f"{_bq(scol)}")
                        if b in bound:
                            conds.append(f"{_bq(bound[b])} = "
                                         f"{_bq(dcol)}")
                        cur = cur.join(e, F.expr(" AND ".join(conds)),
                                       "inner")
                    if a not in bound:
                        bound[a] = scol
                    if b not in bound:
                        bound[b] = dcol
                    pending.pop(k)
                    progress = True
                    break
            if cycles in ("unique_edges", "none"):
                # Kusto's DEFAULT: no edge repeated within one match —
                # pairwise-distinct (src, dst) over the fixed edge
                # aliases (uniqueness across a collapsed segment
                # boundary is not enforced; documented subset)
                pw = []
                for x in range(len(fixed_prefs)):
                    for y in range(x + 1, len(fixed_prefs)):
                        px, py = fixed_prefs[x], fixed_prefs[y]
                        pw.append(
                            f"NOT ({_bq(px + e_src)} <=> "
                            f"{_bq(py + e_src)} AND "
                            f"{_bq(px + e_dst)} <=> "
                            f"{_bq(py + e_dst)})")
                if pw:
                    # one compiled predicate text, not O(n^2) where()s
                    cur = cur.where(" AND ".join(pw))
            # node-property joins (real node vars only)
            node_prefs: dict[str, str] = {}
            if nodes_df is not None:
                for v, idc in bound.items():
                    npref = f"__gn_{v}_"
                    n = nodes_df.selectExpr(
                        *[f"{_bq(c)} AS {_bq(npref + c)}"
                          for c in nodes_df.columns])
                    cur = cur.join(
                        n, F.expr(f"{_bq(idc)} = "
                                  f"{_bq(npref + g['nid'])}"),
                        "inner")
                    node_prefs[v] = npref
            if cycles == "none":
                real = list(bound)
                pw2 = [f"NOT ({_bq(bound[real[x]])} <=> "
                       f"{_bq(bound[real[y]])})"
                       for x in range(len(real))
                       for y in range(x + 1, len(real))]
                if pw2:
                    cur = cur.where(" AND ".join(pw2))
            return cur, bound, evars, node_prefs, cnt_cols

        def rewrite(toks, bound, evars, node_prefs):
            out = []
            for t in toks:
                if t.kind == "ident" and "." in t.text:
                    v, _, p = t.text.partition(".")
                    if v in evars:
                        out.append(Tok("ident", evars[v] + p))
                        continue
                    if v in node_prefs:
                        out.append(Tok("ident", node_prefs[v] + p))
                        continue
                    if v in bound:
                        raise ValueError(
                            f"KQL: graph-match: node {v!r} has no "
                            f"property table (make-graph without "
                            f"'with ... on' derives id-only nodes)")
                elif t.kind == "ident" and t.text in bound:
                    out.append(Tok("ident", bound[t.text]))
                    continue
                elif t.kind == "ident" and t.text in evars:
                    raise ValueError(
                        f"KQL: graph-match: bare edge variable "
                        f"{t.text!r} — reference a property "
                        f"({t.text}.col)")
                out.append(t)
            return out

        cur, bound, evars, node_prefs, cnt_cols = \
            compile_pattern(edges_spec)
        if where_text:
            toks = rewrite(_tokenize(where_text), bound, evars,
                           node_prefs)
            cur = cur.where(F.expr(_compile_expr_tokens(toks, cur)))
        cols = []
        for i2, grp in enumerate(
                _split_top_commas(_tokenize(proj_text))):
            # output names come from the ORIGINAL tokens (bare
            # node var -> var; bare var.prop -> var_prop) — the
            # rewritten internal column names must never leak into
            # the schema
            if len(grp) >= 2 and grp[0].kind == "ident" \
                    and grp[1].text == "=":
                name, body = grp[0].text, grp[2:]
            else:
                name, body = None, grp
            if name is None:
                if len(body) == 1 and body[0].kind == "ident":
                    name = body[0].text.replace(".", "_")
                else:
                    name = f"col{i2}"
            body = rewrite(body, bound, evars, node_prefs)
            sql = _compile_expr_tokens(body, cur)
            cols.append(f"({sql}) AS {_bq(name)}")
        if not cnt_cols:
            return cur.selectExpr(*cols)
        # one output row per MATCHED PATH (Kusto's contract): the
        # collapsed segments carried their path counts through the
        # joins; ONE explode at the very end restores the exact
        # per-path multiplicity without ever materializing the paths
        mult = " * ".join(_bq(c) for c in cnt_cols)
        return (cur.selectExpr(*cols, f"({mult}) AS __gm_mult")
                   .selectExpr(
                       "*",
                       "explode(sequence(CAST(1 AS BIGINT), "
                       "__gm_mult)) AS __gm_i")
                   .drop("__gm_mult", "__gm_i"))

    def _graph_to_table(self, df: DataFrame, rest: str) -> DataFrame:
        """``graph-to-table nodes [with_node_id=name]`` /
        ``graph-to-table edges [with_source_id=a] [with_target_id=b]``
        — project the bound graph back to a relational table. Edges:
        the edge table verbatim with optionally renamed endpoint
        columns (zero computation). Nodes: the node table when
        make-graph bound one; otherwise the DISTINCT endpoint ids
        (one union + one distinct — the only derivation that exists).
        Kusto's both-tables form is two pipelines here (one output per
        pipeline, as with facet's with-clause)."""
        if not getattr(self, "_graph", None):
            raise ValueError("KQL: graph-to-table needs a preceding "
                             "make-graph stage")
        g = self._graph
        m = re.match(r"(nodes|edges)\b\s*(.*)$", rest.strip(),
                     re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: graph-to-table nodes [with_node_id=n] | "
                "edges [with_source_id=a] [with_target_id=b]")
        what, opts_text = m.group(1), m.group(2)
        opts = dict(re.findall(r"(with_\w+)\s*=\s*(\w+)", opts_text))
        leftover = re.sub(r"(with_\w+)\s*=\s*(\w+)", "",
                          opts_text).strip()
        if leftover:
            raise ValueError(f"KQL: graph-to-table: unexpected "
                             f"{leftover!r}")
        if what == "edges":
            bad = set(opts) - {"with_source_id", "with_target_id"}
            if bad:
                raise ValueError(f"KQL: graph-to-table edges options "
                                 f"{sorted(bad)}")
            out = g["edges"]
            if "with_source_id" in opts:
                out = out.withColumnRenamed(g["src"],
                                            opts["with_source_id"])
            if "with_target_id" in opts:
                out = out.withColumnRenamed(g["dst"],
                                            opts["with_target_id"])
            return out
        bad = set(opts) - {"with_node_id"}
        if bad:
            raise ValueError(f"KQL: graph-to-table nodes options "
                             f"{sorted(bad)}")
        if g["nodes"] is not None:
            out = g["nodes"]
            if "with_node_id" in opts:
                out = out.withColumnRenamed(g["nid"],
                                            opts["with_node_id"])
            return out
        nid = opts.get("with_node_id") or g.get("nid_name") \
            or "node_id"
        e = g["edges"]
        return (e.select(F.col(g["src"]).alias(nid))
                 .unionByName(e.select(F.col(g["dst"]).alias(nid)))
                 .distinct())

    def _graph_mark_components(self, df: DataFrame,
                               rest: str) -> DataFrame:
        """``graph-mark-components [with_component_id=name]`` — label
        every node with its (undirected) connected component. The
        component id is the MINIMUM node id in the component — a
        deterministic canonical representative (documented; Kusto's
        own ids are arbitrary), so results hash-compare across engines.

        Implementation: the dedup family's iterative min-label
        propagation (operators/dedup.py dedup_clusters) — per round
        one join + grouped min across edges, localCheckpoint lineage
        truncation, O(component diameter) rounds. Output: node id +
        component column (+ node properties when a node table is
        bound)."""
        if not getattr(self, "_graph", None):
            raise ValueError("KQL: graph-mark-components needs a "
                             "preceding make-graph stage")
        g = self._graph
        m = re.match(r"\s*(?:with_component_id\s*=\s*(\w+)\s*)?$",
                     rest)
        if not m:
            raise ValueError("KQL: graph-mark-components "
                             "[with_component_id=name]")
        cid = m.group(1) or "component_id"
        from azure_kusto_parquet_conv_spark.operators.dedup import (
            dedup_clusters)
        e = g["edges"]
        nid = g["nid"] if g["nodes"] is not None else \
            (g.get("nid_name") or "node_id")
        nodes_ids = (e.select(F.col(g["src"]).alias(nid))
                      .unionByName(e.select(F.col(g["dst"])
                                            .alias(nid)))
                      .distinct())
        if g["nodes"] is not None:
            nodes_ids = nodes_ids.unionByName(
                g["nodes"].select(F.col(g["nid"]).alias(nid))
            ).distinct()
        pairs = e.select(F.col(g["src"]).alias("id_a"),
                         F.col(g["dst"]).alias("id_b"))
        labeled = dedup_clusters(nodes_ids, pairs, id_col=nid) \
            .withColumnRenamed("cluster_id", cid)
        if g["nodes"] is not None:
            labeled = labeled.join(
                g["nodes"].withColumnRenamed(g["nid"], nid), nid,
                "left")
        return labeled

    def _graph_shortest_paths(self, df: DataFrame,
                              rest: str) -> DataFrame:
        """``graph-shortest-paths [output=any|all]
        (a)-[*lo..hi]->(b) [where expr] project ...`` — minimal-hop
        reachability between node bindings, bounded by the hop range
        (cap 8, as graph-match).

        Spark-first shape: LEVEL-SYNCHRONOUS BFS — each hop count's
        frame is the DISTINCT (source, frontier-node) pair set derived
        from the previous level by one equi-join + one distinct, so
        every level is bounded by |V|^2 pairs regardless of how many
        paths realize them (r7 verdict #2: a plain self-join chain
        enumerates O(avg_degree^hops) paths on a dense graph); the
        union of levels is then reduced to the per-pair minimum by one
        grouped aggregation — no iterative driver loop, every stage a
        shuffle-on-key. ``output=any`` (default, Kusto's too)
        emits ONE row per (a, b) pair at its shortest length;
        ``output=all`` keeps every distinct binding at that length.
        ``where``/``project`` reference the endpoint node variables
        (``a`` bare = its id; ``a.prop`` with a node table); the
        pattern's inner nodes are anonymous by construction, and
        ``hops`` is available to project. Subset: one pattern, one
        variable-length anonymous edge (Kusto's general patterns and
        path-array aggregates are not supported; fixed patterns
        belong to graph-match)."""
        if not getattr(self, "_graph", None):
            raise ValueError("KQL: graph-shortest-paths needs a "
                             "preceding make-graph stage")
        g = self._graph
        om = re.match(r"output\s*=\s*(\w+)\s+(.*)$", rest, re.DOTALL)
        output = "any"
        if om:
            output = om.group(1).lower()
            rest = om.group(2)
            if output not in ("any", "all"):
                raise ValueError(
                    "KQL: graph-shortest-paths output=any|all")
        pm = re.search(r"\bproject\b", rest)
        wm = re.search(r"\bwhere\b", rest)
        if not pm:
            raise ValueError("KQL: graph-shortest-paths requires a "
                             "project clause")
        pat_text = rest[:wm.start() if wm and wm.start() < pm.start()
                        else pm.start()].strip()
        where_text = rest[wm.end():pm.start()].strip() \
            if wm and wm.start() < pm.start() else None
        proj_text = rest[pm.end():].strip()
        mm = re.fullmatch(
            r"\(\s*([A-Za-z_]\w*)\s*\)\s*"
            r"-\[\s*\*\s*(\d+)\s*\.\.\s*(\d+)\s*\]->\s*"
            r"\(\s*([A-Za-z_]\w*)\s*\)", pat_text)
        if not mm:
            raise ValueError(
                "KQL: graph-shortest-paths pattern must be "
                "(a)-[*lo..hi]->(b)")
        av, bv = mm.group(1), mm.group(4)
        lo, hi = int(mm.group(2)), int(mm.group(3))
        if not (1 <= lo <= hi <= self._GRAPH_MAX_HOPS):
            raise ValueError(
                f"KQL: graph-shortest-paths hop range must satisfy "
                f"1 <= lo <= hi <= {self._GRAPH_MAX_HOPS}")
        edges_df, e_src, e_dst = g["edges"], g["src"], g["dst"]
        # Level-synchronous BFS (r7 verdict #2): each length frame is
        # the DISTINCT (source, frontier-node) pair set, built from
        # the previous frame by one equi-join + one distinct — every
        # level is bounded by |V|^2 PAIRS, never by the number of
        # paths (a chain of self-joins without the per-level dedup is
        # O(avg_degree^hops) intermediate rows on a dense or
        # near-cyclic graph, independent of input size). Shortest-path
        # needs frontiers, not paths: min-hops per pair is identical.
        step = edges_df.select(F.col(e_src).alias("__gsp_s"),
                               F.col(e_dst).alias("__gsp_d"))
        frontier = (step.select(F.col("__gsp_s").alias("__gsp_a"),
                                F.col("__gsp_d").alias("__gsp_b"))
                        .distinct())
        ln_frames = []
        for ln in range(1, hi + 1):
            if ln > 1:
                frontier = (frontier
                            .join(step,
                                  F.col("__gsp_b") == F.col("__gsp_s"),
                                  "inner")
                            .select(F.col("__gsp_a"),
                                    F.col("__gsp_d").alias("__gsp_b"))
                            .distinct())
            if ln >= lo:
                ln_frames.append(frontier.withColumn(
                    "hops", F.lit(ln).cast("long")))
        un = ln_frames[0]
        for fr in ln_frames[1:]:
            un = un.unionByName(fr)
        if output == "any":
            un = (un.groupBy("__gsp_a", "__gsp_b")
                    .agg(F.min("hops").alias("hops")))
        else:
            from pyspark.sql import Window
            w = Window.partitionBy("__gsp_a", "__gsp_b")
            un = (un.withColumn("__gsp_min",
                                F.min("hops").over(w))
                    .where(F.col("hops") == F.col("__gsp_min"))
                    .drop("__gsp_min"))
        bound = {av: "__gsp_a", bv: "__gsp_b"}
        node_prefs: dict[str, str] = {}
        if g["nodes"] is not None:
            for v, idc in bound.items():
                npref = f"__gn_{v}_"
                n = g["nodes"].select(
                    *[F.col(c).alias(npref + c)
                      for c in g["nodes"].columns])
                un = un.join(n, F.col(idc) == F.col(npref + g["nid"]),
                             "inner")
                node_prefs[v] = npref

        def rewrite(toks):
            out = []
            for t in toks:
                if t.kind == "ident" and "." in t.text:
                    v, _, p = t.text.partition(".")
                    if v in node_prefs:
                        out.append(Tok("ident", node_prefs[v] + p))
                        continue
                    if v in bound:
                        raise ValueError(
                            f"KQL: graph-shortest-paths: node {v!r} "
                            f"has no property table")
                elif t.kind == "ident" and t.text in bound:
                    out.append(Tok("ident", bound[t.text]))
                    continue
                out.append(t)
            return out

        if where_text:
            un = un.where(F.expr(_compile_expr_tokens(
                rewrite(_tokenize(where_text)), un)))
        cols = []
        for i2, grp in enumerate(
                _split_top_commas(_tokenize(proj_text))):
            if len(grp) >= 2 and grp[0].kind == "ident" \
                    and grp[1].text == "=":
                name, body = grp[0].text, grp[2:]
            else:
                name, body = None, grp
            if name is None:
                if len(body) == 1 and body[0].kind == "ident":
                    name = body[0].text.replace(".", "_")
                else:
                    name = f"col{i2}"
            cols.append(F.expr(_compile_expr_tokens(
                rewrite(body), un)).alias(name))
        return un.select(*cols)

    def _union(self, df: DataFrame | None, rest: str) -> DataFrame:
        """union [isfuzzy=true] [kind=outer|inner] [withsource=col]
        operand[, ...]

        Works in BOTH positions Kusto allows: piped (``T | union U``)
        and source (``union T1, T2 | ...`` — df is None and the first
        resolved operand becomes the left side, so its withsource
        label is its own name rather than ``$input``).

        kind=outer (Kusto default): column superset, absent columns null
        — unionByName(allowMissingColumns). kind=inner: columns common to
        all operands. ``withsource=col`` labels each row with its origin
        (the table name for bare operands, ``$input`` for the piped-in
        side, ``union_argN`` for subpipelines). ``isfuzzy=true`` skips
        operands whose table doesn't resolve (Kusto's multi-cluster
        convenience — here: a missing parquet fixture) instead of
        erroring; at least one operand must resolve. Pure concatenation
        — no shuffle; each source keeps its own partitioning and
        pushdowns."""
        m = re.match(r"(?:isfuzzy\s*=\s*(?P<fuzzy>\w+)\s+)?"
                     r"(?:kind\s*=\s*(\w+)\s+)?"
                     r"(?:withsource\s*=\s*(?P<src>\w+)\s+)?"
                     r"(.*)$", rest, re.DOTALL)
        fuzzy = (m.group("fuzzy") or "false").lower()
        if fuzzy not in ("true", "false"):
            raise ValueError(
                f"KQL: union isfuzzy must be true/false, got {fuzzy!r}")
        kind = (m.group(2) or "outer").lower()
        if kind not in ("outer", "inner"):
            raise ValueError(f"KQL: union kind must be inner/outer, got {kind!r}")
        # split operands on top-level commas (parens may contain commas)
        parts, depth, cur = [], 0, []
        for ch in m.group(4):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur)); cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        parts = [p for p in parts if p.strip()]
        if fuzzy == "true":
            resolved, kept = [], []
            for p in parts:
                try:
                    resolved.append(self._operand(p))
                    kept.append(p)
                except Exception:
                    continue  # isfuzzy: unresolved operands drop
            if not resolved:
                raise ValueError(
                    "KQL: union isfuzzy=true resolved no operand")
            others, parts = resolved, kept
        else:
            others = [self._operand(p) for p in parts]
        if not others:
            raise ValueError("KQL: union needs at least one operand")
        src = m.group("src")

        def label(i, text):
            text = text.strip()
            return (text if re.fullmatch(r"[A-Za-z_]\w*", text)
                    else f"union_arg{i}")
        if df is None:
            df = others.pop(0)
            first_label = label(0, parts.pop(0))
            off = 1  # operand 0 became the left side
        else:
            first_label = "$input"
            off = 0  # piped form: subpipelines stay union_arg0.. (r11
            # advice — the source-position offset had leaked in and
            # shifted existing queries' labels)
        if src:
            df = df.withColumn(src, F.lit(first_label))
            others = [o.withColumn(src, F.lit(label(i + off, p)))
                      for i, (o, p) in enumerate(zip(others, parts))]
        if kind == "inner":
            common = [c for c in df.columns
                      if all(c in o.columns for o in others)]
            out = df.select(*common)
            for o in others:
                out = out.unionByName(o.select(*common))
            return out
        out = df
        for o in others:
            out = out.unionByName(o, allowMissingColumns=True)
        return out

    def _lookup(self, df: DataFrame, rest: str) -> DataFrame:
        """lookup [kind=leftouter|inner] (dimension) on key[, key...]

        Kusto's lookup is an equi-join against a SMALL dimension — the
        contract is dimension-sized right side, so it always broadcasts
        (map-side hash join, no fact-table shuffle)."""
        m = re.match(r"(?:kind\s*=\s*(\w+)\s+)?\((?P<sub>.*)\)\s+on\s+"
                     r"(?P<on>.*)$", rest, re.DOTALL)
        if not m:
            raise ValueError(f"KQL: bad lookup syntax {rest!r}")
        kind = {"leftouter": "left", "inner": "inner", None: "left"}.get(
            (m.group(1) or None) and m.group(1).lower() or None)
        if kind is None:
            raise ValueError(f"KQL: unsupported lookup kind {m.group(1)!r}")
        right = self.compile(m.group("sub").strip())
        on_text = m.group("on").strip()
        if "$left" in on_text:
            # qualified form: on $left.x == $right.y [and ...]
            # (r13 probe sweep) — differing key names join like the
            # join operator's qualified clause; the right key column
            # is dropped afterwards, matching the bare-key output
            pairs = []
            for part in re.split(r"\band\b", on_text,
                                 flags=re.IGNORECASE):
                m2 = re.fullmatch(
                    r"\s*\$left\.(\w+)\s*==\s*\$right\.(\w+)\s*", part)
                if not m2:
                    raise ValueError(
                        f"KQL: bad lookup condition {part!r}")
                pairs.append((m2.group(1), m2.group(2)))
            right = F.broadcast(right)
            conds = None
            for lk, rk in pairs:
                c = df[lk] == right[rk]
                conds = c if conds is None else (conds & c)
            out = df.join(right, conds, kind)
            for _, rk in pairs:  # one drop per Column object
                out = out.drop(right[rk])
            return out
        keys = [k.strip() for k in on_text.split(",")]
        return df.join(F.broadcast(right), keys, kind)

    def _make_series(self, df: DataFrame, rest: str) -> DataFrame:
        """make-series a=agg(x) [default=v] on ts step 1d [by k1, k2]:
        dense series over the observed bin range per group; empty bins
        take ``default`` (0 when omitted, Kusto's default; ``default=
        real(null)``/``default=null`` keeps them null for the
        series_fill_* family). The bin/group grid is calendar-x-keys
        sized and broadcasts; the only input-sized shuffle is the
        per-bin pre-aggregate. NOTE: that pre-aggregate is evaluated
        twice (once for the min/max range row, once as the join input)
        — at 100 TB put a materialization (cache/table) upstream if the
        source scan itself is the dominant cost."""
        m = re.match(r"(?P<agg>.+?)"
                     r"(?:\s+default\s*=\s*(?P<dflt>real\s*\(\s*null\s*\)"
                     r"|null|-?\d+(?:\.\d+)?))?"
                     r"\s+on\s+(?P<ts>\w+)"
                     r"(?:\s+from\s+(?P<from>datetime\s*\([^)]*\)|\S+))?"
                     r"(?:\s+to\s+(?P<to>datetime\s*\([^)]*\)|\S+))?"
                     r"\s+step\s+"
                     r"(?P<step>\S+)(?:\s+by\s+(?P<by>.+))?$",
                     rest, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: make-series a=agg(x) [default=v] on ts "
                "[from t0 to t1] step 1d [by keys]")
        aggs = []  # (name, sql, default-text) per comma-separated agg
        for i, g in enumerate(_split_top_commas(_tokenize(m.group("agg")))):
            gd = None  # per-aggregate `default = v` suffix (Kusto)
            for j, t in enumerate(g):
                if (t.kind == "ident" and t.text == "default"
                        and j + 1 < len(g) and g[j + 1].text == "="):
                    gd = "".join(tt.text for tt in g[j + 2:])
                    g = g[:j]
                    break
            name, agg_sql = _named_expr(
                g, df, "series" if i == 0 else f"series{i}")
            aggs.append((name, agg_sql, gd))
        if m.group("dflt") and aggs[-1][2] is None:
            # the regex-captured trailing default belongs to the last agg
            aggs[-1] = (*aggs[-1][:2], m.group("dflt"))
        step_us = _timespan_to_us(m.group("step"))
        ts_name = m.group("ts")
        start = (_compile_expr_tokens(_tokenize(m.group("from")), df)
                 if m.group("from") else None)
        end = (_compile_expr_tokens(_tokenize(m.group("to")), df)
               if m.group("to") else None)
        if start is not None:
            # explicit start: bins anchor at `from` (bin_at semantics)
            # and rows before it are excluded
            bin_col = F.expr(
                f"timestamp_micros(unix_micros({start}) + "
                f"((unix_micros(`{ts_name}`) - unix_micros({start})) "
                f"div {step_us}) * {step_us})")
            df = df.where(F.expr(f"`{ts_name}` >= {start}"))
        else:
            bin_col = F.expr(
                f"timestamp_micros((unix_micros(`{ts_name}`)"
                f" div {step_us}) * {step_us})")
        if end is not None:
            df = df.where(F.expr(f"`{ts_name}` < {end}"))
        if start is not None and end is not None:
            # both bounds: the grid is a constant-folded sequence — no
            # second pass over the pre-aggregate to discover the range
            last = (f"timestamp_micros(unix_micros({start}) + "
                    f"((unix_micros({end}) - unix_micros({start}) - 1) "
                    f"div {step_us}) * {step_us})")
            bins_expr = (f"CASE WHEN {end} > {start} THEN "
                         f"sequence({start}, {last}, interval {step_us} "
                         f"microsecond) ELSE array() END")
            bins = (self.spark.range(1)
                    .select(F.explode(F.expr(bins_expr)).alias("__bin")))
        else:
            # from-only / to-only (r13 probe sweep): the open side of
            # the grid comes from the observed data, the bounded side
            # from the bound itself (handled in the range row below)
            bins = None
        keys = []
        if m.group("by"):
            # `by` accepts named/bare expressions, not just columns
            # (r13 probe sweep): computed keys materialize as columns
            # before the pre-aggregate
            for i, g in enumerate(
                    _split_top_commas(_tokenize(m.group("by")))):
                if len(g) == 1 and g[0].kind == "ident":
                    keys.append(g[0].text)
                    continue
                kname, ksql = _named_expr(g, df, f"key{i}")
                df = df.withColumn(kname, F.expr(ksql))
                keys.append(kname)
        pre = (df.withColumn("__bin", bin_col)
                 .groupBy(*keys, "__bin")
                 .agg(*[F.expr(sql).alias(f"__v{i}")
                        for i, (_, sql, _d) in enumerate(aggs)]))
        # full calendar grid min..max (Kusto fills EVERY step in the
        # range, not just observed bins — required for the
        # series_fill_* interpolation family); the range row is a
        # single-row agg, the exploded grid is calendar-sized
        if bins is None:
            rng = pre.agg(F.min("__bin").alias("__mn"),
                          F.max("__bin").alias("__mx"))
            if start is not None:
                # from-only: the grid starts at the anchor even when
                # the first observed bin is later
                rng = rng.select(
                    F.expr(f"CAST({start} AS TIMESTAMP)").alias("__mn"),
                    F.col("__mx"))
            if end is not None:
                # to-only: the grid runs through the last bin before
                # `to` even when the data stops earlier
                anchor = f"unix_micros({start})" if start is not None \
                    else "CAST(0 AS BIGINT)"
                rng = rng.select(
                    F.col("__mn"),
                    F.expr(f"timestamp_micros({anchor} + "
                           f"((unix_micros({end}) - {anchor} - 1) "
                           f"div {step_us}) * {step_us})").alias("__mx"))
            bins = (rng.where("__mn IS NOT NULL AND __mx IS NOT NULL "
                              "AND __mx >= __mn")
                       .select(F.explode(F.expr(
                           f"sequence(__mn, __mx, interval {step_us} "
                           f"microsecond)")).alias("__bin")))
        grid = (pre.select(*keys).distinct().crossJoin(F.broadcast(bins))
                if keys else bins)
        # fill literal cast to each aggregate's own type so count()
        # series stay long and avg() series stay double
        def fill_for(i):
            d = (aggs[i][2] or "0").strip()
            null_fill = d == "null" or d.startswith("real")
            lit = F.lit(None) if null_fill else F.lit(float(d))
            return lit.cast(pre.schema[f"__v{i}"].dataType)
        filled = (grid.join(pre, [*keys, "__bin"], "left")
                      .select(*keys, "__bin",
                              *[F.coalesce(f"__v{i}", fill_for(i))
                                 .alias(f"__v{i}")
                                for i in range(len(aggs))]))
        # ONE sorted collect of (bin, v0, v1, ...) structs feeds every
        # series array — adding aggregates costs no extra shuffle
        packed = F.array_sort(F.collect_list(
            F.struct("__bin", *[f"__v{i}" for i in range(len(aggs))])))
        out = (filled.groupBy(*keys) if keys else filled.groupBy())
        out = out.agg(packed.alias("__packed"),
                      F.array_sort(F.collect_set("__bin")).alias("bins"))
        def extract(field):
            # factory, not a default-arg lambda: F.transform reads lambda
            # arity, and a second (defaulted) param would make it pass
            # the element index as that argument
            return lambda s: s[field]
        for i, (name, _sql, _d) in enumerate(aggs):
            out = out.withColumn(
                name, F.transform("__packed", extract(f"__v{i}")))
        return out.select(*keys, *[n for n, _s, _d in aggs], "bins")

    def _sort_cols(self, df: DataFrame, rest: str):
        cols = []
        sqls = []
        for g in _split_top_commas(_tokenize(rest)):
            # Kusto default sort direction is DESCENDING (sort by / top)
            # with nulls first for asc / last for desc (Spark's own
            # defaults) — `nulls first|last` overrides explicitly
            nulls = None
            if (len(g) >= 2 and g[-2].kind == "ident"
                    and g[-2].text.lower() == "nulls"
                    and g[-1].text.lower() in ("first", "last")):
                nulls = g[-1].text.lower()
                g = g[:-2]
            desc = True
            if g and g[-1].kind == "ident" and g[-1].text.lower() in (
                    "asc", "desc"):
                desc = g[-1].text.lower() == "desc"
                g = g[:-1]
            sql = _compile_expr_tokens(g, df)
            suffix = (" DESC" if desc else " ASC") + (
                f" NULLS {nulls.upper()}" if nulls else "")
            sqls.append(sql + suffix)
            c = F.expr(sql)
            if nulls == "first":
                cols.append(c.desc_nulls_first() if desc
                            else c.asc_nulls_first())
            elif nulls == "last":
                cols.append(c.desc_nulls_last() if desc
                            else c.asc_nulls_last())
            else:
                cols.append(c.desc() if desc else c.asc())
        self._order_sql = sqls
        return cols

    def _summarize_percentilew_fast(self, df: DataFrame,
                                    agg_groups: list[list["Tok"]],
                                    key_toks: list["Tok"]):
        """Scale-safe default plan for ``summarize percentilew(...)``
        (r11 verdict #2): when EVERY aggregate in the stage is a
        top-level percentilew / percentilesw call over one shared
        (value, weight) pair with literal percentiles, compile to the
        percentilew_exact pre-agg + cumulative-window plan instead of
        the collect_list fold — per-(group, DISTINCT value) weight
        sums are map-side combinable and the running sum spreads
        across executors, so a skewed group never lands its whole
        (value, weight) pair list on one task. Returns None when the
        shape doesn't fit (mixed aggregates, differing (v, w) pairs,
        expression percentiles, nested use) — those keep the fold,
        whose single-expression form composes anywhere.

        Weight contract: identical to ``evaluate percentilew_exact``
        (kql.py header) — raw-invalid weights (null / <= 0) drop, then
        weights land on the 1e-4 integer grid so cumulative sums are
        order-independent exact integers (hash-portable under any
        partitioning; the fold's sorted raw-double accumulation only
        coincides for grid-exact weights). Groups whose every weight
        is invalid keep their row with a NULL percentile (spine join),
        matching the fold's empty-pairs -> null."""
        specs: list[tuple[str, float]] = []
        vw: tuple[str, str] | None = None

        def parse_call(body, n_fixed):
            # -> (v_sql, w_sql, [p floats], [p raw texts]) or None;
            # raw texts feed the bare-form auto-names so the fast plan
            # and the fold name non-canonical literals identically
            # (r12 advisory: `50.0` must yield percentile_v_50_0 on
            # BOTH paths, never depend on which plan is chosen)
            if not (body and body[0].kind == "ident"
                    and len(body) >= 4 and body[1].text == "("
                    and body[-1].text == ")"):
                return None
            arggroups = _split_top_commas(body[2:-1])
            if len(arggroups) < n_fixed + 1:
                return None
            raws = ["".join(t.text for t in g)
                    for g in arggroups[n_fixed:]]
            try:
                ps = [float(r) for r in raws]
            except ValueError:
                return None
            v_sql = _compile_expr_tokens(arggroups[0], df)
            w_sql = _compile_expr_tokens(arggroups[1], df)
            return v_sql, w_sql, ps, raws

        for i, g in enumerate(agg_groups):
            if g and g[0].text == "(":
                # tuple assignment: (n1, n2) = percentilesw(v, w, p..)
                depth, j, names = 0, 0, []
                for j, t in enumerate(g):
                    if t.text == "(":
                        depth += 1
                    elif t.text == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    elif depth == 1 and t.kind == "ident":
                        names.append(t.text)
                if (not names or j + 2 >= len(g) or g[j + 1].text != "="
                        or g[j + 2].text.lower()
                        not in ("percentilesw", "percentilesw_array")):
                    return None
                parsed = parse_call(g[j + 2:], 2)
                if parsed is None or len(parsed[2]) != len(names):
                    return None
                pairs = list(zip(names, parsed[2]))
            elif (g and g[0].kind == "ident"
                    and g[0].text.lower() == "percentilesw"
                    and len(g) >= 2 and g[1].text == "("):
                # bare plural form: Kusto auto-names per percentile
                parsed = parse_call(g, 2)
                if parsed is None:
                    return None
                col = (g[2].text
                       if g[3].text == "," and g[2].kind == "ident"
                       else "value")
                pairs = [(f"percentile_{col}_"
                          + re.sub(r"[^0-9]+", "_", raw).strip("_"),
                          p) for p, raw in zip(parsed[2], parsed[3])]
            else:
                if len(g) >= 2 and g[0].kind == "ident" \
                        and g[1].text == "=":
                    name, body = g[0].text, g[2:]
                else:
                    name, body = None, g
                if not (body and body[0].kind == "ident"
                        and body[0].text.lower() == "percentilew"):
                    return None
                parsed = parse_call(body, 2)
                if parsed is None or len(parsed[2]) != 1:
                    return None
                pairs = [(name if name is not None else f"agg{i}",
                          parsed[2][0])]
            if vw is None:
                vw = (parsed[0], parsed[1])
            elif vw != (parsed[0], parsed[1]):
                return None
            specs.extend(pairs)
        if vw is None:
            return None

        from pyspark.sql import Window as _W
        keys = []
        for i, g in enumerate(_split_top_commas(key_toks)):
            name, sql = _named_expr(g, df, f"key{i}")
            keys.append((name, sql))
        bynames = [n for n, _ in keys]
        base = df.select(
            *[F.expr(s).alias(n) for n, s in keys],
            F.expr(vw[0]).cast("double").alias("__pwv"),
            F.expr(vw[1]).cast("double").alias("__pww"))
        # Single-pass spine (r14 optimization): rows failing the weight
        # filter previously required a SECOND full input scan (key
        # spine) outer-joined back so groups whose every weight is
        # invalid keep their row with a NULL percentile. Instead,
        # invalid rows collapse into ONE zero-weight NULL-value row
        # per group inside the same pre-aggregation: sorted first
        # (asc_nulls_first), weight 0, they shift no cumulative sum
        # and no total, min(when(...)) ignores the NULL value, and an
        # all-invalid group yields exactly the old spine-join NULL row
        # (tot = 0, the 0 >= 0 crossing selects the NULL value).
        # Verified output-identical incl. null group keys (which now
        # flow through groupBy instead of the eqNullSafe join).
        pred = (F.col("__pwv").isNotNull() & F.col("__pww").isNotNull()
                & (F.col("__pww") > 0))
        wgt = F.floor(F.col("__pww") * F.lit(10000.0) + F.lit(0.5)) \
               .cast("long")
        pre = (base.groupBy(*bynames,
                            F.when(pred, F.col("__pwv")).alias("__pwv"))
                   .agg(F.sum(F.when(pred, wgt).otherwise(F.lit(0)))
                         .alias("__pws")))
        win = _W.partitionBy(*bynames) \
                .orderBy(F.col("__pwv").asc_nulls_first()) \
                .rowsBetween(_W.unboundedPreceding, 0)
        cum = (pre.withColumn("__pwc", F.sum("__pws").over(win))
                  .withColumn("__pwt", F.sum("__pws").over(
                      _W.partitionBy(*bynames))))
        return cum.groupBy(*bynames).agg(*[
            F.min(F.when(
                F.col("__pwc") >= F.lit(p / 100.0) * F.col("__pwt"),
                F.col("__pwv"))).alias(name)
            for name, p in specs])

    def _summarize(self, df: DataFrame, rest: str):
        # hint.shufflekey=col: pre-partition on the hinted key so the
        # aggregation exchange reuses it (Kusto's shuffle strategy hint)
        mh = re.match(r"hint\.shufflekey\s*=\s*(\w+)\s+"
                      r"(?:hint\.num_partitions\s*=\s*(\d+)\s+)?(.*)$",
                      rest, re.DOTALL)
        if mh:
            pargs = [int(mh.group(2))] if mh.group(2) else []
            df = df.repartition(*pargs, F.col(mh.group(1)))
            rest = mh.group(3)
        # split on top-level ' by '
        toks = _tokenize(rest)
        by_idx = None
        depth = 0
        for i, t in enumerate(toks):
            if t.text in ("(", "["):
                depth += 1
            elif t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "ident" and t.text.lower() == "by":
                by_idx = i
                break
        agg_toks = toks[:by_idx] if by_idx is not None else toks
        key_toks = toks[by_idx + 1:] if by_idx is not None else []
        fast = self._summarize_percentilew_fast(
            df, _split_top_commas(agg_toks), key_toks)
        if fast is not None:
            return fast
        aggs = []
        post = []  # (tuple_names, array_alias) for tuple assignments
        for i, g in enumerate(_split_top_commas(agg_toks)):
            if (g and g[0].kind == "ident"
                    and g[0].text.lower() in ("percentiles",
                                              "percentilesw")
                    and len(g) >= 2 and g[1].text == "("
                    and g[-1].text == ")"):
                # BARE plural percentiles: Kusto auto-names one output
                # column per requested percentile
                # (percentile_<col>_<P>) — rewrite into the tuple
                # assignment below
                fn = g[0].text.lower()
                arggroups = _split_top_commas(g[2:-1])
                skip = 1 if fn == "percentiles" else 2
                if len(arggroups) > skip:
                    col = (arggroups[0][0].text
                           if len(arggroups[0]) == 1 else "value")
                    names = []
                    for ag in arggroups[skip:]:
                        p = "".join(t.text for t in ag)
                        names.append("percentile_" + col + "_"
                                     + re.sub(r"[^0-9]+", "_", p)
                                     .strip("_"))
                    g = _tokenize("(" + ", ".join(names) + ") = ") + g
            if g and g[0].text == "(":
                # `(p5, p95) = percentiles(v, 5, 95)`: Kusto's tuple
                # aggregate — compiled as ONE percentiles_array
                # aggregate, then split positionally after the agg
                depth2, j = 0, 0
                names = []
                for j, t in enumerate(g):
                    if t.text == "(":
                        depth2 += 1
                    elif t.text == ")":
                        depth2 -= 1
                        if depth2 == 0:
                            break
                    elif depth2 == 1 and t.kind == "ident":
                        names.append(t.text)
                if not names or j + 2 >= len(g) or g[j + 1].text != "=":
                    raise ValueError(
                        "KQL: summarize (n1, n2, ...) = percentiles(..)")
                call = g[j + 2:]
                fn = call[0].text.lower() if call else ""
                array_form = {
                    "percentiles": "percentiles_array",
                    "percentiles_array": "percentiles_array",
                    "percentilesw": "percentilesw_array",
                    "percentilesw_array": "percentilesw_array",
                }.get(fn)
                if array_form is None:
                    raise ValueError(
                        "KQL: summarize tuple assignment supports "
                        "percentiles(col, p1, ...) and "
                        "percentilesw(col, w, p1, ...)")
                call = [Tok("ident", array_form)] + call[1:]
                sql = _compile_expr_tokens(call, df)
                alias = f"__tup{i}"
                aggs.append(F.expr(sql).alias(alias))
                post.append((names, alias))
                continue
            star = (len(g) >= 5 and g[0].kind == "ident"
                    and g[0].text.lower() in ("arg_max", "arg_min")
                    and g[1].text == "(" and g[-2].text == "*"
                    and g[-1].text == ")" and g[-3].text == ",")
            if star:
                # `arg_max(rank_expr, *)`: the whole winning ROW —
                # Kusto's latest-record-per-entity idiom. One
                # max_by/min_by over a struct of every column, expanded
                # after the aggregate (key columns stay the group keys,
                # not duplicated from the struct).
                fn = ("max_by" if g[0].text.lower() == "arg_max"
                      else "min_by")
                rank_sql = _compile_expr_tokens(g[2:-3], df)
                cols = ", ".join(f"`{c}`" for c in df.columns)
                alias = f"__argstar{i}"
                aggs.append(F.expr(
                    f"{fn}(struct({cols}), {rank_sql})").alias(alias))
                post.append((["*"], alias))
                continue
            any_star = (len(g) == 4 and g[0].kind == "ident"
                        and g[0].text.lower() == "take_any"
                        and g[1].text == "(" and g[2].text == "*"
                        and g[3].text == ")")
            if any_star:
                # `take_any(*)`: one arbitrary whole row per group
                # (Kusto; r12 probe find) — any_value over a struct of
                # every column, expanded like arg_max(expr, *)
                cols = ", ".join(f"`{c}`" for c in df.columns)
                alias = f"__anystar{i}"
                aggs.append(F.expr(f"any_value(struct({cols}))")
                            .alias(alias))
                post.append((["*"], alias))
                continue
            bare_multi = (not star and len(g) >= 4 and g[0].kind == "ident"
                          and g[0].text.lower() in ("arg_max", "arg_min")
                          and g[1].text == "(" and g[-1].text == ")")
            if bare_multi:
                arggroups = _split_top_commas(g[2:-1])
                if len(arggroups) >= 2:
                    # bare `arg_max(rank, r1[, r2...])`: Kusto outputs
                    # the maximized expression AND every return column
                    # (r12 probe find — the named form `x = arg_max(a,
                    # b)` stays the scalar max_by). One max_by over a
                    # struct, field-expanded after the aggregate.
                    fn = ("max_by" if g[0].text.lower() == "arg_max"
                          else "min_by")
                    items = []
                    for j, ag in enumerate(arggroups):
                        nm = (ag[0].text
                              if len(ag) == 1 and ag[0].kind == "ident"
                              else f"{g[0].text.lower()}_arg{j}")
                        items.append((nm, _compile_expr_tokens(ag, df)))
                    rank_sql = items[0][1]
                    struct_sql = ", ".join(
                        f"({s}) AS `{n}`" for n, s in items)
                    alias = f"__argmulti{i}"
                    aggs.append(F.expr(
                        f"{fn}(struct({struct_sql}), {rank_sql})")
                        .alias(alias))
                    post.append((["**"], alias))
                    continue
            name, sql = _named_expr(g, df, f"agg{i}")
            aggs.append(F.expr(sql).alias(name))
        if not aggs:
            raise ValueError("KQL: summarize needs at least one aggregate")
        if not key_toks:
            out = df.agg(*aggs)
        else:
            keys = []
            for i, g in enumerate(_split_top_commas(key_toks)):
                name, sql = _named_expr(g, df, f"key{i}")
                keys.append(F.expr(sql).alias(name))
            out = df.groupBy(*keys).agg(*aggs)
        for names, alias in post:
            if names == ["*"]:
                taken = set(out.columns) - {alias}
                for c in df.columns:
                    if c not in taken:
                        out = out.withColumn(c, F.col(f"{alias}.{c}"))
            elif names == ["**"]:
                # bare multi-column arg_max/arg_min: expand the winning
                # struct's own fields under their Kusto output names
                taken = set(out.columns) - {alias}
                for c in out.schema[alias].dataType.names:
                    if c not in taken:
                        out = out.withColumn(c, F.col(f"`{alias}`.`{c}`"))
            else:
                for k, nm in enumerate(names):
                    out = out.withColumn(
                        nm, F.element_at(F.col(alias), k + 1))
            out = out.drop(alias)
        return out

    def _partition_by(self, df: DataFrame, rest: str):
        """``partition by key ( subquery )`` — Kusto's scoping operator:
        the subquery runs per key value, and its results union. This is
        THE scale-safe home for serialized ops: inside the scope,
        prev()/next()/row_number() compile to windows PARTITIONED on the
        key (one shuffle, every partition independent), `sort by`
        becomes repartition(key) + sortWithinPartitions (no global
        sort), `take`/`top` become per-key window cuts, and `summarize`
        gains the key as an extra grouping column. Supported subquery
        operators: where / extend / project* / sort / top / take /
        summarize (matching the serialized-pipeline use cases; Kusto's
        legacy strategy caps at 64 partitions, the native strategy —
        modeled here — does not)."""
        from pyspark.sql import Window

        m = re.match(r"(?:hint\.\S+\s+)*by\s+"
                     r"(?P<keys>[A-Za-z_][A-Za-z0-9_]*"
                     r"(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)"
                     r"\s*\((?P<sub>.*)\)\s*$", rest, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: partition [hint...] by col[, col2...] ( subquery )")
        keys = [k.strip() for k in m.group("keys").split(",")]
        sub = m.group("sub").strip()
        for key in keys:
            if key not in df.columns:
                raise ValueError(
                    f"KQL: partition key {key!r} not in input")
        key_cols = [F.col(k) for k in keys]
        saved = (self._partition, self._partition_sql,
                 self._order, self._order_sql, self._scoped_sorted)
        self._partition = key_cols
        self._partition_sql = [f"`{k}`" for k in keys]
        self._order = self._order_sql = None
        self._scoped_sorted = False
        # stages that keep rows hash-partitioned by the scope keys and
        # sorted within partitions: filters, projections, parsers, and
        # the serialized kernels themselves (they emit rows in input
        # order and mapInPandas is narrow). Anything else (distinct,
        # mv-expand, evaluate plugins, summarize, take/top windows)
        # conservatively invalidates the layout.
        _LAYOUT_PRESERVING = {"where", "extend", "project",
                              "project-away", "project-keep",
                              "project-rename", "project-reorder",
                              "parse", "parse-where", "parse-kv",
                              "serialize", "scan"}
        try:
            out = df
            for stage in _split_pipes(sub):
                sm = re.match(r"([A-Za-z_-]+)\s*(.*)", stage.strip(),
                              re.DOTALL)
                sop, srest = sm.group(1).lower(), sm.group(2).strip()
                if sop in ("where", "extend", "project", "project-away",
                           "project-keep", "project-rename",
                           "project-reorder", "distinct", "serialize",
                           "parse", "parse-where", "parse-kv",
                           "mv-expand", "scan", "evaluate"):
                    # evaluate plugins that honor serialized/partition
                    # scope (rows_near, sequence_detect, scan-family)
                    # read self._partition/_order like any stage
                    if sop not in _LAYOUT_PRESERVING:
                        self._scoped_sorted = False
                    out = self._apply(out, stage)
                elif sop in ("sort", "order"):
                    cols = self._sort_cols(
                        out, re.sub(r"^by\s+", "", srest))
                    self._order = cols
                    # per-key serialized order, never a global sort
                    out = (out.repartition(*key_cols)
                              .sortWithinPartitions(*key_cols, *cols))
                    self._scoped_sorted = True
                elif sop in ("take", "limit"):
                    self._scoped_sorted = False
                    n = int(srest)
                    order = self._order or [F.monotonically_increasing_id()]
                    w = Window.partitionBy(*key_cols).orderBy(*order)
                    out = (out.withColumn("__p_rn",
                                          F.row_number().over(w))
                              .where(F.col("__p_rn") <= n)
                              .drop("__p_rn"))
                elif sop == "top":
                    self._scoped_sorted = False
                    m2 = re.match(r"(\d+)\s+by\s+(.*)", srest, re.DOTALL)
                    if not m2:
                        raise ValueError("KQL: top N by expr")
                    cols = self._sort_cols(out, m2.group(2))
                    self._order = cols
                    w = Window.partitionBy(*key_cols).orderBy(*cols)
                    out = (out.withColumn("__p_rn",
                                          F.row_number().over(w))
                              .where(F.col("__p_rn") <= int(m2.group(1)))
                              .drop("__p_rn"))
                elif sop == "summarize":
                    self._scoped_sorted = False
                    # every partition key is implicitly a grouping column
                    stripped = _STR_LIT_RE.sub("", srest)
                    add = list(keys)
                    if re.search(r"\bby\b", stripped):
                        by_part = stripped.split("by", 1)[1]
                        add = [k for k in keys if not
                               re.search(rf"\b{re.escape(k)}\b", by_part)]
                        srest2 = (srest if not add
                                  else f"{srest}, {', '.join(add)}")
                        out = self._summarize(out, srest2)
                    else:
                        out = self._summarize(
                            out, f"{srest} by {', '.join(add)}")
                else:
                    raise ValueError(
                        f"KQL: partition subquery operator {sop!r} not "
                        f"supported (where/extend/project*/parse*/"
                        f"mv-expand/scan/evaluate/sort/top/"
                        f"take/summarize are)")
            return out
        finally:
            (self._partition, self._partition_sql,
             self._order, self._order_sql, self._scoped_sorted) = saved

    def _scan(self, df: DataFrame, rest: str) -> DataFrame:
        """``scan [with_match_id=name] [declare (v:type = init, ...)]
        with (step s1: p1 [=> v = expr, ...]; step s2: p2; ...)`` —
        ordered sequence matching with per-sequence STATE (the funnel
        generalization; Kusto's process-mining operator; SQL
        MATCH_RECOGNIZE's cousin, which Spark lacks).

        Supported subset of Kusto semantics (documented): rows are
        scanned in serialized order; ONE active sequence per scan
        scope advances greedily. Per row, in priority order: the row
        ADVANCES the sequence if it satisfies the next expected
        step's predicate; else it EXTENDS the sequence if it
        satisfies the CURRENT (last-matched) step's predicate again —
        Kusto's repeated-step matching, which is what makes the
        cumulative-sum idiom (``step s: true => cum = cum + x``)
        accumulate across every row (r7 verdict #4); else, if the
        final step has fired (the sequence is complete but still
        extendable at its last step), a row satisfying step 1 against
        DEFAULT state starts a fresh sequence with the next
        ``match_id`` and freshly-reset declared state. Non-matching
        rows are skipped and leave the sequence active. Every
        matching row is emitted with its step name, the 0-based
        sequence ``match_id``, and the declared state variables as
        output columns (Kusto emits on match, not on completion;
        incomplete trailing sequences still emit). Documented
        deviation from full Kusto: a single active sequence per scope
        rather than Kusto's concurrent sequence spawning — a row that
        matches step 1 while a sequence is mid-flight does not spawn
        a second sequence (extend/advance of the active sequence
        always wins).

        ``declare`` state: assignments (``=> v = expr``) run when
        their step matches, in order, BEFORE the row is emitted; a
        step predicate may also READ state variables (e.g. ``n < 10``)
        — such predicates, and all assignment right-hand sides, are
        the one place expressions cannot be precomputed by Catalyst
        (they read mutable per-sequence state), so they compile to
        Python closures over (row, state) via ``_compile_py_expr``
        (scalar whitelist; see its docstring) and evaluate inside the
        SAME Arrow-batched kernel — only the columns they actually
        reference are materialized per matching row, and state-free
        predicates keep the Catalyst bitmask fast path.

        Spark-first shape: each step predicate is pre-computed as a
        BOOLEAN COLUMN by Catalyst (codegen, pushdown-eligible) before
        the stateful pass, so the Python kernel only walks a bool
        matrix and never evaluates expressions. The stateful pass is
        ``repartition(keys)`` + ``sortWithinPartitions(keys, order)``
        + ONE ``mapInPandas`` kernel that detects group boundaries
        itself and carries automaton state ACROSS Arrow batches —
        per-batch overhead, not per-group (groupBy().applyInPandas
        costs ~1 ms of pandas frame construction per group: at 1 500
        groups/sf0.1 that was 4.36 s; this shape runs the same input
        in 0.54 s, and at 100 TB the cost stays proportional to
        batches, not keys). Inside ``partition by key (...)`` each key
        scans independently (the 100 TB shape); an unscoped scan is a
        single serialized group guarded by the same warn-then-error
        row-limit probe as the other serialized ops."""
        import pandas as pd

        m = re.match(r"(?:with_match_id\s*=\s*(?P<mid>\w+)\s+)?"
                     r"(?:declare\s*\((?P<decl>[^)]*)\)\s*)?"
                     r"with\s*\((?P<body>.*)\)\s*$", rest, re.DOTALL)
        if not m:
            raise ValueError(
                "KQL: scan [with_match_id=name] [declare (v:type=init, "
                "...)] with (step s: pred [=> v = expr, ...]; ...)")
        # ---- declare clause: typed state variables with literal
        # defaults; they become OUTPUT columns, reset at each new match
        _DECL_TYPES = {"long": "long", "int": "long", "real": "double",
                       "double": "double", "string": "string",
                       "bool": "boolean", "boolean": "boolean"}
        decl_names: list[str] = []
        decl_types: dict[str, str] = {}
        decl_inits: dict[str, object] = {}
        for part in _split_top_commas_text(m.group("decl") or ""):
            dm = re.match(r"([A-Za-z_]\w*)\s*:\s*(\w+)\s*(?:=\s*(.*))?$",
                          part.strip(), re.DOTALL)
            if not dm:
                raise ValueError(f"KQL: bad scan declare {part!r}")
            nm2, ty = dm.group(1), dm.group(2).lower()
            if ty not in _DECL_TYPES:
                raise ValueError(
                    f"KQL: scan declare type {ty!r} not supported "
                    f"({sorted(set(_DECL_TYPES))} are)")
            if nm2 in df.columns:
                raise ValueError(f"KQL: scan declare {nm2!r} shadows "
                                 f"an input column")
            decl_names.append(nm2)
            decl_types[nm2] = _DECL_TYPES[ty]
            if dm.group(3) is not None:
                init_fn, _ = _compile_py_expr(
                    [t for t in _tokenize(dm.group(3))], [], set())
                decl_inits[nm2] = init_fn({}, {})
            else:
                decl_inits[nm2] = None
        var_set = set(decl_names)

        def split_arrow(text):
            """step body -> (predicate text, assignments text|None),
            splitting on the first top-level '=>'."""
            depth, i2, n2 = 0, 0, len(text)
            while i2 < n2:
                c = text[i2]
                if c in "([":
                    depth += 1
                elif c in ")]":
                    depth -= 1
                elif c in "'\"":
                    q2 = c
                    i2 += 1
                    while i2 < n2 and text[i2] != q2:
                        i2 += 2 if text[i2] == "\\" else 1
                elif c == "=" and depth == 0 and i2 + 1 < n2 \
                        and text[i2 + 1] == ">":
                    return text[:i2], text[i2 + 2:]
                i2 += 1
            return text, None

        steps = []          # (name, catalyst_sql | None)
        py_preds = {}       # step index -> (closure, used cols)
        assigns = {}        # step index -> [(var, closure, used cols)]
        for part in _split_top_semis(m.group("body")):
            part = part.strip()
            if not part:
                continue
            sm = re.match(r"step\s+([A-Za-z_]\w*)\s*:\s*(.*)$",
                          part, re.DOTALL)
            if not sm:
                raise ValueError(f"KQL: bad scan step {part!r}")
            pred_text, assign_text = split_arrow(sm.group(2))
            i_step = len(steps)
            ptoks = _tokenize(pred_text)
            if any(t.kind == "ident" and t.text in var_set
                   for t in ptoks):
                # state-dependent predicate: Catalyst cannot see scan
                # state, so this one evaluates in the kernel
                py_preds[i_step] = _compile_py_expr(
                    ptoks, df.columns, var_set)
                steps.append((sm.group(1), None))
            else:
                steps.append((sm.group(1),
                              _compile_expr_tokens(ptoks, df,
                                                   self._order_sql,
                                                   self._partition_sql)))
            if assign_text is not None:
                if not var_set:
                    raise ValueError(
                        "KQL: scan step assignments need a declare "
                        "clause")
                alist = []
                for grp in _split_top_commas(_tokenize(assign_text)):
                    if len(grp) < 3 or grp[0].kind != "ident" \
                            or grp[1].text != "=":
                        raise ValueError(
                            "KQL: scan assignment must be "
                            "'var = expr'")
                    if grp[0].text not in var_set:
                        raise ValueError(
                            f"KQL: scan assigns to undeclared "
                            f"{grp[0].text!r}")
                    fn2, used2 = _compile_py_expr(
                        grp[2:], df.columns, var_set)
                    alist.append((grp[0].text, fn2, used2))
                assigns[i_step] = alist
        if not steps:
            raise ValueError("KQL: scan needs at least one step")
        if not self._order_sql:
            raise ValueError(
                "KQL: scan needs a preceding 'sort by' (serialized order)")
        mid_name = m.group("mid") or "match_id"
        # order keys -> materialized columns + ascending flags (pandas
        # sorts inside each group; Spark does not guarantee group
        # order). All materialized columns ride ONE selectExpr (r15:
        # each withColumn was 2-4 py4j round trips + a full analysis
        # pass; guide §7.3 driver-side build cost).
        order_names, asc_flags = [], []
        new_cols = []
        for i, osql in enumerate(self._order_sql):
            expr_sql, direction = osql.rsplit(" ", 1)
            order_names.append(f"__scan_o{i}")
            asc_flags.append(direction.upper() != "DESC")
            new_cols.append(f"({expr_sql}) AS __scan_o{i}")
        for i, (_, psql) in enumerate(steps):
            new_cols.append(
                f"CAST(({psql}) AS BOOLEAN) AS __scan_p{i}"
                if psql is not None
                else f"CAST(NULL AS BOOLEAN) AS __scan_p{i}")
        if self._partition_sql:
            group_cols = [s.strip("`") for s in self._partition_sql]
        else:
            _warn_global_serialize("scan", df)
            new_cols.append("1 AS __scan_g")
            group_cols = ["__scan_g"]
        work = df.selectExpr("*", *new_cols)
        keep = [c for c in df.columns]
        step_names = [n for n, _ in steps]
        n_steps = len(steps)
        # row columns the kernel must read for python-side predicates
        # and assignments (only these get materialized per matching row)
        py_cols = sorted(set().union(
            *[u for _, u in py_preds.values()],
            *[u for al in assigns.values() for _, _, u in al],
            set()))
        out_schema = work.select(*keep).schema
        for v in decl_names:
            out_schema = out_schema.add(v, decl_types[v])
        out_schema = out_schema.add("step", "string") \
                               .add(mid_name, "long")

        # Partition on the scan key and sort key-then-order WITHIN each
        # partition, then walk the whole partition with ONE mapInPandas
        # kernel that detects group boundaries itself and carries the
        # automaton state (key, step, match_id) across Arrow batches.
        # groupBy().applyInPandas pays one pandas-DataFrame construction
        # per GROUP — measured 2.8 s of pure per-group overhead on 1500
        # small groups at sf0.1 (vs 0.57 s for the identical JVM
        # shuffle+sort); per-Arrow-batch overhead amortizes over the
        # default 10k rows instead.
        sort_cols = [F.col(c).asc() for c in group_cols]
        for nm, asc in zip(order_names, asc_flags):
            sort_cols.append(F.col(nm).asc() if asc else F.col(nm).desc())
        if self._partition_sql and self._scoped_sorted:
            # the scoped `sort by` already hash-partitioned on the scope
            # keys and sorted (keys, order) within partitions, and only
            # layout-preserving narrow stages ran since — the kernel's
            # own repartition+sort would be a redundant second
            # Exchange+Sort of identically laid-out rows (guide §2.4)
            part = work
        else:
            part = (work.repartition(*[F.col(c) for c in group_cols])
                        .sortWithinPartitions(*sort_cols))

        init_st = dict(decl_inits)

        def kernel(batches):
            state_key = object()  # sentinel: != any real key tuple
            k = 0
            mid = 0
            st = dict(init_st)
            for pdf in batches:
                if not len(pdf):
                    continue
                key_arrays = [pdf[c].to_numpy() for c in group_cols]
                preds = [pdf[f"__scan_p{i}"].fillna(False).astype(bool)
                         .to_numpy() for i in range(n_steps)]
                py_arrs = {c: pdf[c].to_numpy() for c in py_cols}
                idx, labels, mids = [], [], []
                var_out = {v: [] for v in decl_names}

                def row_at(i):
                    return {c: (None if a[i] != a[i] else a[i])
                            if a.dtype.kind in "fO" else a[i]
                            for c, a in py_arrs.items()}

                def step_hit(j, i, state):
                    if steps[j][1] is None:
                        return bool(py_preds[j][0](row_at(i), state))
                    return bool(preds[j][i])

                def emit(j, i):
                    if j in assigns:
                        row = row_at(i)
                        for v, fn2, _u in assigns[j]:
                            st[v] = fn2(row, st)
                    idx.append(i)
                    labels.append(step_names[j])
                    mids.append(mid)
                    for v in decl_names:
                        var_out[v].append(st[v])

                for i in range(len(pdf)):
                    # normalize NaN/NaT (x != x) so a null scan key still
                    # forms ONE group, matching groupBy null semantics
                    kt = tuple(None if v != v else v
                               for v in (a[i] for a in key_arrays))
                    if kt != state_key:
                        state_key, k, mid = kt, 0, 0
                        st = dict(init_st)
                    # k = number of steps matched by the active
                    # sequence (0 = idle; n_steps = completed, still
                    # extendable at the last step). Priority per row:
                    # ADVANCE to step k, else EXTEND step k-1 (Kusto's
                    # repeated-step matching — the cumulative idiom),
                    # else if completed START a fresh sequence at
                    # step 0 against default state.
                    if k < n_steps and step_hit(k, i, st):
                        emit(k, i)
                        k += 1
                    elif k > 0 and step_hit(k - 1, i, st):
                        emit(k - 1, i)
                    elif k == n_steps:
                        fresh = dict(init_st)
                        if step_hit(0, i, fresh):
                            st = fresh
                            mid += 1
                            emit(0, i)
                            k = 1
                res = pdf.iloc[idx][keep].copy()
                for v in decl_names:
                    res[v] = pd.Series(var_out[v], index=res.index,
                                       dtype="object")
                res["step"] = labels
                res[mid_name] = pd.array(mids, dtype="int64")
                yield res

        return part.mapInPandas(kernel, out_schema)

    def _row_window_session(self, df: DataFrame, name: str,
                            args_sql: str) -> DataFrame:
        """``extend s = row_window_session(Expr, MaxDistanceFromFirst,
        MaxDistanceBetweenValues [, Restart])`` — Kusto's serialized
        sessionizer: every row gets the Expr value of the FIRST row of
        its session; a new session starts at the partition's first
        row, when Restart is true, when the gap from the previous
        row's Expr exceeds MaxDistanceBetweenValues, or when the
        distance from the session's first Expr exceeds
        MaxDistanceFromFirst.

        The duration cap is what makes this non-windowable: the
        session start depends recursively on the previous session
        start (gaps-and-islands SQL only handles the gap rule), so
        the pass is the scan-shaped kernel — Catalyst materializes
        Expr (as epoch-µs for timestamps) and the Restart bit,
        then ONE repartition + sortWithinPartitions + mapInPandas
        with cross-batch state walks each key's rows in serialized
        order. Inside ``partition by key (...)`` each key sessionizes
        independently (the scale shape); unscoped input hits the same
        warn-then-error serialize guard as every serialized op."""
        import pandas as pd

        if self._order is None:
            raise ValueError("KQL: row_window_session needs a "
                             "preceding 'sort by' (serialized order)")
        parts = _split_top_commas_text(args_sql)
        if len(parts) not in (3, 4):
            raise ValueError(
                "KQL: row_window_session(expr, max_from_first, "
                "max_between [, restart])")
        expr_sql, mf_sql, mb_sql = parts[0], parts[1], parts[2]
        restart_sql = parts[3] if len(parts) == 4 else None

        def us_of(sql2, what):
            try:
                return int(sql2.strip("() "))
            except ValueError:
                raise ValueError(
                    f"KQL: row_window_session {what} must be a "
                    f"timespan/numeric literal, got {sql2!r}")
        max_first = us_of(mf_sql, "max_from_first")
        max_between = us_of(mb_sql, "max_between")

        # all materialized columns ride ONE selectExpr (r15: each
        # withColumn was 2-4 py4j round trips + an analysis pass);
        # the Expr type probe analyzes a one-column projection first
        vtype = df.selectExpr(
            f"({expr_sql}) AS __rws_orig").schema[0].dataType
        new_cols = [f"({expr_sql}) AS __rws_orig"]
        if vtype.typeName() in ("timestamp", "timestamp_ntz"):
            new_cols.append(
                f"unix_micros(CAST(({expr_sql}) AS TIMESTAMP)) "
                "AS __rws_v")
        else:
            new_cols.append(
                f"CAST(({expr_sql}) AS DOUBLE) AS __rws_v")
        new_cols.append(
            f"CAST(({restart_sql}) AS BOOLEAN) AS __rws_r"
            if restart_sql else "false AS __rws_r")
        order_names, asc_flags = [], []
        for i, osql in enumerate(self._order_sql):
            e_sql, direction = osql.rsplit(" ", 1)
            order_names.append(f"__rws_o{i}")
            asc_flags.append(direction.upper() != "DESC")
            new_cols.append(f"({e_sql}) AS __rws_o{i}")
        if self._partition_sql:
            group_cols = [s.strip("`") for s in self._partition_sql]
        else:
            _warn_global_serialize("row_window_session()", df)
            new_cols.append("1 AS __rws_g")
            group_cols = ["__rws_g"]
        work = df.selectExpr("*", *new_cols)
        keep = list(df.columns)
        out_schema = work.select(*keep).schema.add(name, vtype)
        sort_cols = [F.col(c).asc() for c in group_cols]
        for nm, asc in zip(order_names, asc_flags):
            sort_cols.append(F.col(nm).asc() if asc
                             else F.col(nm).desc())
        if self._partition_sql and self._scoped_sorted:
            # input already partitioned by the scope keys and sorted
            # (keys, serialized order) by the scoped `sort by` — skip
            # the kernel's redundant Exchange+Sort (guide §2.4)
            part = work
        else:
            part = (work.repartition(*[F.col(c) for c in group_cols])
                        .sortWithinPartitions(*sort_cols))

        def kernel(batches):
            state_key = object()
            prev_v = first_v = None
            first_orig = None
            for pdf in batches:
                if not len(pdf):
                    continue
                key_arrays = [pdf[c].to_numpy() for c in group_cols]
                vs = pdf["__rws_v"].to_numpy()
                origs = pdf["__rws_orig"]
                rs = pdf["__rws_r"].fillna(False).astype(bool) \
                    .to_numpy()
                out_vals = []
                for i in range(len(pdf)):
                    kt = tuple(None if v != v else v
                               for v in (a[i] for a in key_arrays))
                    v = vs[i]
                    if kt != state_key:
                        state_key = kt
                        prev_v = first_v = None
                        first_orig = None
                    if v != v:
                        # null Expr value: emit null for THIS row only
                        # and clear the session state so the next
                        # non-null row starts a fresh session — without
                        # the reset every NaN comparison below is False
                        # and one null timestamp would poison the rest
                        # of the key's output (r7 advice #2)
                        prev_v = first_v = None
                        first_orig = None
                        out_vals.append(None)
                        continue
                    if (first_v is None or rs[i]
                            or (prev_v is not None
                                and v - prev_v > max_between)
                            or v - first_v > max_first):
                        first_v = v
                        first_orig = origs.iloc[i]
                    prev_v = v
                    out_vals.append(first_orig)
                res = pdf[keep].copy()
                res[name] = pd.Series(out_vals, index=res.index,
                                      dtype=origs.dtype)
                yield res

        return part.mapInPandas(kernel, out_schema)

    def _join(self, df: DataFrame, rest: str):
        m = re.match(
            r"(?:kind\s*=\s*(\w+)\s+)?"
            r"(?:(hint\.broadcast)\s+"
            r"|hint\.strategy\s*=\s*(?P<strat>broadcast|shuffle)\s+"
            r"|hint\.shufflekey\s*=\s*(?P<skey>\w+)\s+)?"
            r"(?:hint\.num_partitions\s*=\s*(?P<nparts>\d+)\s+)?"
            r"(?:\((?P<sub>.*)\)|(?P<name>[A-Za-z_][A-Za-z0-9_]*))"
            r"\s+on\s+(?P<on>.*)$",
            rest, re.DOTALL)
        if not m:
            raise ValueError(f"KQL: bad join syntax {rest!r}")
        kindraw = (m.group(1) or "innerunique").lower()
        if m.group("sub") is not None:
            right = self.compile(m.group("sub").strip())
        else:
            # bare-name operand: a let-bound/`as`-named result or table
            right = self._operand(m.group("name"))
        nparts = int(m.group("nparts")) if m.group("nparts") else None
        if m.group(2) or m.group("strat") == "broadcast":
            right = F.broadcast(right)
        elif m.group("strat") == "shuffle":
            # Kusto's shuffle-strategy hint: force the partitioned
            # (shuffle-hash) join even when Spark would broadcast
            right = right.hint("shuffle_hash")
        elif nparts and not m.group("skey"):
            right = right.repartition(nparts)
        on_text = m.group("on").strip()
        # parse the on-clause into (left_key, right_key) pairs
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(\s*,\s*"
                        r"[A-Za-z_][A-Za-z0-9_]*)*", on_text):
            pairs = [(k.strip(), k.strip()) for k in on_text.split(",")]
            bare = True
        else:
            pairs, bare = [], False
            for part in re.split(r"\band\b", on_text, flags=re.IGNORECASE):
                m2 = re.fullmatch(
                    r"\s*\$left\.(\w+)\s*==\s*\$right\.(\w+)\s*", part)
                if not m2:
                    raise ValueError(f"KQL: bad join condition {part!r}")
                pairs.append((m2.group(1), m2.group(2)))
        if m.group("skey"):
            # hint.shufflekey=col: pre-partition BOTH sides on the
            # hinted key (Kusto's skew/strategy control). The hint
            # names a LEFT column; the right side repartitions on the
            # PAIRED right key when the hint is a join key, else on
            # the same name if it exists there. Implies the
            # partitioned join, like Kusto; hint.num_partitions sizes
            # the exchange.
            skey = m.group("skey")
            pargs = [nparts] if nparts else []
            if skey in df.columns:
                df = df.repartition(*pargs, F.col(skey))
            rkey = next((rk for lk, rk in pairs if lk == skey),
                        skey if skey in right.columns else None)
            if rkey is not None:
                right = right.repartition(*pargs, F.col(rkey))
            right = right.hint("shuffle_hash")
        if kindraw == "innerunique":
            # Kusto's DEFAULT kind: the LEFT side is deduplicated on the
            # join keys (one arbitrary row per key) before an inner join
            df = df.dropDuplicates([lk for lk, _ in pairs])
            kindraw = "inner"
        if kindraw == "rightantisemi":
            kindraw = "rightanti"  # Kusto alias (r13 probe sweep)
        if kindraw in ("rightsemi", "rightanti"):
            # Spark only has left-side semi/anti: swap sides (output
            # columns are the right operand's, per Kusto)
            swapped = "left_semi" if kindraw == "rightsemi" else "left_anti"
            if bare:
                return right.join(df, [lk for lk, _ in pairs], swapped)
            conds = None
            for lk, rk in pairs:
                c = right[rk] == df[lk]
                conds = c if conds is None else (conds & c)
            return right.join(df, conds, swapped)
        kind = _JOIN_KINDS.get(kindraw)
        if kind is None:
            raise ValueError(f"KQL: unsupported join kind {m.group(1)!r}")
        if bare:
            return df.join(right, [lk for lk, _ in pairs], kind)
        conds = None
        for lk, rk in pairs:
            c = df[lk] == right[rk]
            conds = c if conds is None else (conds & c)
        return df.join(right, conds, kind)


def kql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Compile and return a KQL tabular pipeline as a DataFrame."""
    return KqlCompiler(spark, sf_dir).compile(query)


def kql_stream(df: DataFrame, query: str,
               watermark: str = "2 hours") -> DataFrame:
    """Compile a KQL pipeline onto an UNBOUNDED (streaming) DataFrame.

    The stream IS the source, so ``query`` starts at the first stage
    (optionally with a leading ``|``), e.g.::

        where event_type == 'click'
          | summarize n=count() by b=bin(ts, 1h), event_type

    Stateless stages (where / extend / project / project-away /
    mv-expand) compile exactly as in batch — same expression compiler,
    so stream and batch cannot drift. A ``summarize ... by bin(ts,
    step)[, keys]`` stage becomes a WATERMARKED tumbling-window
    aggregate: Spark's epoch-aligned window() is bin()'s streaming twin
    (identical bucket boundaries), the watermark bounds state, and
    append-mode emits each window once, finalized — the only shape that
    survives an unbounded 100 TB/day stream. The window start is
    projected under the bin key's alias so the output schema matches the
    batch pipeline column-for-column."""
    # real constructor (not a hand-rolled field list, which drifted once
    # when new compiler state was added): the stream has no table dir
    comp = KqlCompiler(df.sparkSession, sf_dir=None)
    for stage in _split_pipes(query.lstrip().lstrip("|")):
        m = re.match(r"([A-Za-z_-]+)\s*(.*)", stage, re.DOTALL)
        op, rest = m.group(1).lower(), m.group(2).strip()
        if op == "summarize" and df.isStreaming:
            df = _stream_summarize(df, rest, watermark)
        else:
            df = comp._apply(df, stage)
    return df


def _stream_summarize(df: DataFrame, rest: str,
                      watermark: str) -> DataFrame:
    """summarize aggs by bin(ts, step)[, keys] on a streaming input."""
    toks = _tokenize(rest)
    by_idx, depth = None, 0
    for i, t in enumerate(toks):
        if t.text in ("(", "["):
            depth += 1
        elif t.text in (")", "]"):
            depth -= 1
        elif depth == 0 and t.kind == "ident" and t.text.lower() == "by":
            by_idx = i
            break
    if by_idx is None:
        raise ValueError(
            "KQL stream: summarize needs 'by bin(<ts>, <step>)' — an "
            "unwindowed global aggregate never finalizes on a stream")
    aggs, agg_names = [], []
    for i, g in enumerate(_split_top_commas(toks[:by_idx])):
        name, sql = _named_expr(g, df, f"agg{i}")
        aggs.append(F.expr(sql).alias(name))
        agg_names.append(name)
    bin_alias, ts_col, step_us = None, None, None
    other_keys, key_order = [], []
    for i, g in enumerate(_split_top_commas(toks[by_idx + 1:])):
        texts = [t.text.lower() for t in g]
        # [name =] bin ( col , step )
        if "bin" in texts:
            if len(g) >= 2 and g[1].text == "=":
                bin_alias, g = g[0].text, g[2:]
            if not (len(g) == 6 and g[0].text.lower() == "bin"
                    and g[1].text == "(" and g[3].text == ","
                    and g[5].text == ")"):
                raise ValueError("KQL stream: bin key must be "
                                 "[name=]bin(<col>, <step>)")
            ts_col = g[2].text
            step_us = _timespan_to_us(g[4].text)
            if bin_alias is None:
                bin_alias = f"key{i}"
            key_order.append(bin_alias)
        else:
            name, sql = _named_expr(g, df, f"key{i}")
            other_keys.append((name, sql))
            key_order.append(name)
    if ts_col is None:
        raise ValueError("KQL stream: summarize keys must include "
                         "bin(<ts>, <step>) for a finalizable window")
    win = F.window(F.col(ts_col), f"{step_us} microseconds")
    key_cols = [F.expr(sql).alias(name) for name, sql in other_keys]
    out = (df.withWatermark(ts_col, watermark)
             .groupBy(win.alias("__w"), *key_cols)
             .agg(*aggs)
             .withColumn(bin_alias, F.col("__w.start")))
    return out.select(*key_order, *agg_names)
