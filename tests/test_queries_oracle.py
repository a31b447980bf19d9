"""In-repo differential harness: runs every oracled catalog query on
Spark AND DuckDB at sf0.001 and compares row count, column names, and an
order-insensitive value multiset — a local replica of the driver's
correctness gate so breakage is caught before a round ends."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from azure_kusto_parquet_conv_spark.queries import (
    DRIVER_WINDOW, ORACLES, QUERIES,
)
from azure_kusto_parquet_conv_spark.sources.parquet import TABLES


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(v):
    """Driver-faithful cell canonicalization: the driver hashes pandas
    frames WITHOUT dtype coercion, so an integer-valued float64 (what
    pandas makes of DuckDB HUGEINT / nullable BIGINT) must NOT equal a
    true int64 — the type is part of the value. Round-1 lesson: the old
    lenient canon collapsed 1000.0 == 1000 and passed locally where the
    driver's hash failed."""
    import numpy as np

    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        # FULL precision (r9 verdict #2): the driver hashes exact values,
        # so the replica must distinguish every distinct double — the old
        # %.6g canon collapsed 3176369.26 vs .27 and passed locally while
        # the driver red-flagged q9. repr() is the shortest repr that
        # round-trips, i.e. injective over doubles. Only -0.0 is still
        # collapsed (the +0.0 add), matching the catalog convention that
        # zero signs are sanitized via BIGINT casts before output.
        return f"f:{float(v) + 0.0!r}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if v is None or v is pd.NaT or v != v:
        return "NULL"
    return repr(v)


def multiset(pdf):
    # column-wise access (s.iloc[i]) keeps each column's dtype;
    # iterrows() upcasts MIXED rows to one dtype (int8 next to float64
    # becomes float64), silently defeating canon's dtype-strictness —
    # it masked an int8-vs-double and a -0.0 oracle divergence in r9
    out = {}
    series = [pdf[c] for c in sorted(pdf.columns)]
    for i in range(len(pdf)):
        key = "|".join(canon(s.iloc[i]) for s in series)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    scols = list(sdf.columns)
    odf = ddb.execute(ORACLES[name]).df()
    ocols = list(odf.columns)
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(sdf) == len(odf), (
        f"{name}: row count {len(sdf)} vs oracle {len(odf)}")
    sm, om = multiset(sdf), multiset(odf)
    if sm != om:
        only_s = [k for k in sm if sm[k] != om.get(k)][:5]
        only_o = [k for k in om if om[k] != sm.get(k)][:5]
        raise AssertionError(
            f"{name}: value multiset differs\n spark-only: {only_s}\n oracle-only: {only_o}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_unoracled_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_bench_headline_entries_exist():
    """Every bench.py headline name must be a real catalog entry —
    a rename that orphans the bench would otherwise only fail at
    driver-bench time."""
    import bench

    for name in bench.HEADLINE:
        assert name in QUERIES, name


def test_catalog_queries_stay_distributed():
    """No catalog query may materialize data on the driver: a .collect()
    / .toPandas() / .toLocalIterator() inside queries.py means the
    operator stops scaling past driver memory."""
    import os

    import azure_kusto_parquet_conv_spark.queries as qmod
    src = open(os.path.abspath(qmod.__file__)).read()
    for banned in (".collect()", ".toPandas()", ".toLocalIterator()"):
        assert banned not in src, banned


def test_catalog_every_entry_has_summary():
    from azure_kusto_parquet_conv_spark.queries import catalog

    assert all(r["summary"] for r in catalog()), [
        r["name"] for r in catalog() if not r["summary"]]


# Permanent window slots: the full SURVEY §2.1 (O1-O9) / §2.2 (F1-F17)
# reference-parity surface plus one representative per extension family.
# Window rotation (swapping in never-driver-checked entries each round)
# must never drop one of these — that would silently remove parity
# coverage from the driver's hash gate.
PARITY_SLOTS = {
    # §2.1 O1-O9: scan, projection pushdown, null-fill, JSONL/CSV sinks,
    # row→JSON, schema print, CSL schema, row-group metadata
    "q_filter_projection", "q_missing_column_fill",
    "convert_jsonl_region", "convert_csv_lineitem",
    "q_schema_lineitem", "csl_schema_lineitem", "rowgroups_lineitem",
    # §2.2 F1-F17: type dispatch + timestamp modes + binary + dates
    "convert_isostr", "convert_ticks", "convert_unixms",
    "convert_date_string", "convert_events_ns_unixms",
    "q_convert_binary",
}
# The r7 window deliberately rotates in the rows-only families (no SQL
# twin BY NATURE — sketches, seeded-hash LSH, sampling; pytest pins
# their semantics) for their first driver contact: the driver records
# the weaker rows-only row, and after CORRECTNESS_r07 every catalog
# entry ever staged has driver attestation (r6 verdict demand #1).
# Any OTHER unoracled rotated slot is still an error — for ordinary
# entries a rows-only rotated slot wastes the slot.
ROWS_ONLY_ROTATED_R7 = {
    "q_kql_scan_funnel", "q_kql_sequence_detect", "q_kql_hll_reagg",
    "q_dedup_incremental", "q_knn_ivf", "q_knn_pq", "q_knn_lsh",
    "q_knn_ivfpq", "q_dedup_simhash", "q_dedup_embedding",
    "q_dedup_clusters", "q_multimodal_frames", "q_approx_percentiles",
    "q_freq_items", "q_sample_by",
    # r9 attestation refresh (r8 verdict #4): the two r2-vintage
    # rows-only-by-nature sketches rotate back in so their driver
    # attestation ages with the rest of the catalog
    "q_approx_distinct", "q_text_rolling_fp",
    # r12 staleness-ceiling refresh: seeded-LSH near-dedup is rows-only
    # by nature (its hard certificate is q_dedup_minhash_exact, oracled
    # and attested r7); the base entry rotates back in because its r4
    # attestation hit the ceiling, same protocol as its r4 rows-only row
    "q_dedup_minhash",
}


def test_driver_window_is_first_and_covers_families():
    """The correctness driver hash-checks only the first 50 catalog
    entries; that window must stay exactly DRIVER_WINDOW, keep every
    permanent parity slot, and every rotated slot must carry a hard SQL
    oracle unless it is one of the named rows-only families staged for
    their first (rows-only) driver contact. (The 11 r3/r4
    family-representative slots were released to rotation in r5 per
    the round-4 verdict — banked driver-green in r1-r4, now
    replica-covered like the rest of the catalog.)"""
    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    missing = PARITY_SLOTS - set(DRIVER_WINDOW)
    assert not missing, f"rotation dropped permanent slots: {missing}"
    rows_only = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert set(rows_only) <= {"q_schema_lineitem",
                              "rowgroups_lineitem"} \
        | ROWS_ONLY_ROTATED_R7, rows_only
    rotated = set(DRIVER_WINDOW) - PARITY_SLOTS
    unoracled_rotated = rotated - set(ORACLES) - ROWS_ONLY_ROTATED_R7
    assert not unoracled_rotated, unoracled_rotated
    # the rows-only families really are unoracled by nature — if one
    # gains an oracle later, drop it from ROWS_ONLY_ROTATED_R7
    assert not ROWS_ONLY_ROTATED_R7 & set(ORACLES)


# The deliberate-split escape for the never-checked hygiene rule: an
# entry here yields its first-attestation slot to a HIGHER-priority
# window obligation, with the reason, and is first in line next round.
# An entry may live here at most ONE round (the r10 post-freeze batch
# was deferred once and fully took the r11 window).
# r13: q_kql_ipv4_cidr yielded its first-attestation slot to the
# q_kql_series_outliers re-attestation (code AND oracle changed that
# round). r14: EMPTY — q_kql_ipv4_cidr is seated first in the r14
# window, as owed; no entry defers this round.
DEFERRED_NEVER_CHECKED: set[str] = set()

# DISPLACEMENT CAP ledger (r12 verdict #6): an already-attested
# oracled entry displaced from a window it was owed must be seated in
# the VERY NEXT round's window — at most one displacement, ever, per
# entry. Map: name -> (round it was displaced in, round it must be
# seated in). q_weighted_sample is the precedent: displaced from the
# r12 window by q_kql_in_tabular, seated in r13. Entries stay in the
# ledger permanently so a second displacement of the same name is a
# loud diff, not a silent ageing.
DISPLACED_ONCE: dict[str, tuple[int, int]] = {
    "q_weighted_sample": (12, 13),
}


def test_displacement_happens_at_most_once():
    """r12 verdict #6: window pressure may never age an oracled,
    already-attested entry twice. Every ledgered displacement must (a)
    be owed exactly the round after the displacement, and (b) once the
    displacement round's CORRECTNESS file is banked, the entry must
    hold a DRIVER_WINDOW slot until its owed attestation is banked."""
    latest, newest = _attestation_vintages()
    for name, (displaced_in, owed_in) in DISPLACED_ONCE.items():
        assert owed_in == displaced_in + 1, (
            f"{name}: a displaced entry is owed the very next window, "
            f"not r{owed_in}")
        assert name in QUERIES, f"{name}: ledgered but not in catalog"
        if displaced_in <= newest < owed_in:
            assert name in DRIVER_WINDOW, (
                f"{name}: displaced in r{displaced_in}, owed a "
                f"r{owed_in} slot, but absent from DRIVER_WINDOW — "
                f"that would be a second displacement")
        if newest >= owed_in:
            assert latest.get(name, 0) >= owed_in, (
                f"{name}: owed a r{owed_in} attestation but the newest "
                f"banked row is r{latest.get(name, 0)} — the debt was "
                f"never paid")

# Oldest-vintage members that do NOT fit the current window after the
# higher-priority never-checked obligation is met (rotation priority
# policy, r11 — see the ledger comment above DRIVER_WINDOW). Every
# name here must belong to the oldest outstanding vintage, carries
# code UNCHANGED since its last attestation, stays replica-covered
# (test_oracle_match), and is forced into the next window by the
# staleness ceiling below.
# r14: EMPTY — all 25 r6 stragglers hold window slots (the r6 vintage
# clears entirely when CORRECTNESS_r14 banks). The moment it banks,
# the oldest vintage becomes r7 with the members not seated this
# round; the rotation meta-test will then fail by design until the
# r15 window seats them (see the r15-planner note above DRIVER_WINDOW
# in queries.py for the exact list).
DEFERRED_OLDEST: set[str] = set()


def test_driver_window_covers_every_never_checked_entry():
    """r7 verdict #8 hygiene rule: every catalog entry that has no
    driver CORRECTNESS row across the banked rounds MUST hold a
    DRIVER_WINDOW slot in the round it lands — the attestation gap can
    never exceed one round's additions. (If the never-checked set ever
    outgrows the 37 rotating slots, this fails loudly and the rotation
    must be split across rounds deliberately, not silently —
    DEFERRED_NEVER_CHECKED is that split, each entry with its reason.)"""
    import glob
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        seen |= set(json.load(open(p)))
    assert seen, "no banked CORRECTNESS files found"
    never = {n for n in QUERIES if n not in seen}
    missing = never - set(DRIVER_WINDOW) - DEFERRED_NEVER_CHECKED
    assert not missing, (
        f"entries with no driver attestation are missing a window "
        f"slot: {sorted(missing)}")
    # the deferral list may not silently rot: deferred entries must
    # still be never-checked (once attested, drop them), and may never
    # hide an entry that actually holds a slot
    stale = DEFERRED_NEVER_CHECKED - never
    assert not stale, f"already attested, remove from deferrals: {stale}"
    assert not DEFERRED_NEVER_CHECKED & set(DRIVER_WINDOW)
    # a deferred entry must be oracled — deferring a rows-only entry
    # would silently hand the next round's window a weaker slot
    unoracled = DEFERRED_NEVER_CHECKED - set(ORACLES)
    assert not unoracled, f"deferred entries without oracles: {unoracled}"


def _attestation_vintages():
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds = []
    for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        rounds.append(r)
        for k in json.load(open(p)):
            latest[k] = max(latest.get(k, 0), r)
    return latest, max(rounds)


def test_attestation_rotation_is_priority_ordered():
    """r9 verdict #3 hygiene, extended in r11 after the two rotation
    obligations (never-checked entries + a 37-member oldest vintage)
    first exceeded the 37 rotating slots. The rotation claim is derived
    from the banked CORRECTNESS data, never from the ledger comment.
    Enforced invariants:

    1. every catalog entry of the OLDEST outstanding vintage holds a
       DRIVER_WINDOW slot OR is named in DEFERRED_OLDEST (the explicit
       overflow ledger — nothing falls out silently);
    2. DEFERRED_OLDEST may contain ONLY oldest-vintage entries (it can
       never hide a younger entry, and empties the moment the vintage
       clears);
    3. deferral cannot starve a vintage: while DEFERRED_OLDEST is
       non-empty, every rotating window slot must be spent on a
       never-checked entry or an oldest-vintage entry — deferring an
       oldest member while seating a younger attested one is the
       regression this guards against;
    4. HARD staleness ceiling — entries attested at newest-7 or
       earlier must hold a window slot OR sit in DEFERRED_OLDEST, and
       a DEFERRED_OLDEST entry gets at most ONE extra round: at
       newest-8 nothing may be outside the window, ledger or not.
       (The ceiling must tolerate the newest banked file being THIS
       round's own window — the driver banks CORRECTNESS_r{N} after
       the round freezes, so at judge time `newest` already includes
       the round whose rotation the deferral ledger feeds.)
    """
    latest, newest = _attestation_vintages()
    tracked = {n: r for n, r in latest.items() if n in QUERIES}
    oldest = min(tracked.values())
    stragglers = {n for n, r in tracked.items() if r == oldest}
    missing = stragglers - set(DRIVER_WINDOW) - DEFERRED_OLDEST
    assert not missing, (
        f"oldest vintage r{oldest} entries neither in the window nor "
        f"explicitly deferred: {sorted(missing)}")
    hidden = DEFERRED_OLDEST - stragglers
    assert not hidden, (
        f"DEFERRED_OLDEST entries not of the oldest vintage "
        f"r{oldest}: {sorted(hidden)}")
    assert not DEFERRED_OLDEST & set(DRIVER_WINDOW)
    if DEFERRED_OLDEST:
        never = {n for n in QUERIES if n not in latest}
        rotating = set(DRIVER_WINDOW) - PARITY_SLOTS
        wasted = rotating - never - stragglers
        assert not wasted, (
            f"rotating slots spent on younger attested entries while "
            f"oldest-vintage members sit deferred: {sorted(wasted)}")
    overdue = {n for n, r in tracked.items() if r <= newest - 7}
    missing2 = overdue - set(DRIVER_WINDOW) - DEFERRED_OLDEST
    assert not missing2, (
        f"entries past the staleness ceiling (attested <= "
        f"r{newest - 7}) are missing a window slot: {sorted(missing2)}")
    hard = {n for n, r in tracked.items() if r <= newest - 8}
    missing3 = hard - set(DRIVER_WINDOW)
    assert not missing3, (
        f"entries past the deferral-exhausted ceiling (attested <= "
        f"r{newest - 8}) must hold a window slot, ledger or not: "
        f"{sorted(missing3)}")


ATOMIC = {"string", "long", "integer", "short", "byte", "double", "float",
          "boolean", "date", "timestamp", "timestamp_ntz", "binary",
          "decimal"}


def test_catalog_outputs_are_hashable(spark, sf_dir):
    """Every catalog entry must yield only atomic column types: the
    driver's canonicalizer row-sorts a pandas frame and crashes on
    array/map cells (round-2 q_convert_binary lesson). Schema-only —
    nothing executes."""
    bad = {}
    for name, fn in QUERIES.items():
        types = {f.name: f.dataType.typeName()
                 for f in fn(spark, sf_dir).schema.fields}
        nonatomic = {c: t for c, t in types.items() if t not in ATOMIC}
        if nonatomic:
            bad[name] = nonatomic
    assert not bad, bad
