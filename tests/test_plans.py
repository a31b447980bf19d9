"""Physical-plan assertions: the scale contract. These fail if a change
un-pushes a filter, reads unneeded columns, drops a broadcast, or
introduces a cartesian product — regressions that only hurt at 100 TB."""

import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.plans import (
    assert_no_cartesian,
    executed_plan,
    has_pushed_filters,
    join_strategies,
    read_schema,
)
from azure_kusto_parquet_conv_spark.queries import QUERIES
from azure_kusto_parquet_conv_spark.sources.parquet import load_table


@pytest.fixture(autouse=True)
def _cold_cache(spark):
    """Plan-shape assertions need a cold cache: a persisted fragment left
    by another test (e.g. MinHash signatures) would substitute an
    InMemoryTableScan for the parquet scan and hide PushedFilters."""
    spark.catalog.clearCache()
    yield


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["q_filter_projection"](spark, sf_dir)
    assert has_pushed_filters(df, "l_quantity"), executed_plan(df)[:1500]
    assert has_pushed_filters(df, "l_returnflag")


def test_q1_prunes_columns(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    [schema] = read_schema(df)
    # only the 7 referenced columns are read, not all 11
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in schema, f"{col} should be pruned:\n{schema}"
    assert "l_shipdate" in schema and "l_quantity" in schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = QUERIES["q5_supplier_volume"](spark, sf_dir)
    joins = join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 4, joins
    assert "CartesianProduct" not in joins


def test_no_accidental_cartesians_across_catalog(spark, sf_dir):
    # cross joins are intentional ONLY in the two brute-force similarity
    # queries (broadcast NLJ over a small side)
    allowed_nlj = {"q_knn_bruteforce", "q_knn_hamming",
                   "q_embed_sim_pairs", "q_dedup_jaccard",
                   "q_cross_join", "q_tfidf", "q_bm25",
                   # RRF's dense arm is knn_bruteforce's bounded-probe
                   # broadcast NLJ (vec_id < 10 cap)
                   "q_rrf_fusion",
                   # PQ ADC: broadcast query distance-tables x the
                   # compact code table — the intended probe shape
                   # (the _exact twin shares knn_pq's flat-ADC scan;
                   # knn_ivfpq_exact equi-joins on list_id instead)
                   "q_knn_pq", "q_knn_pq_exact",
                   # 1-row global-scalar broadcasts (total / median /
                   # concentration threshold)
                   "q_key_skew", "q_mad_robust_stats",
                   "q11_value_concentration", "q22_dormant_rich_customers",
                   "q_unigram_logprob",
                   # certificate twins crossing 1-row aggregates (the
                   # corpus total / detected-items array / fingerprint
                   # stats row) against <=5-row certificate frames —
                   # every NLJ side is a global-aggregate reduction
                   "q_freq_items_exact", "q_kql_hll_reagg_exact",
                   "q_text_rolling_fp_exact",
                   # bounded range join against the tiny day dimension,
                   # and the (groups x days) series grid
                   "q_trailing_wau", "q_kql_session_count",
                   "q_make_series", "q_kql_make_series",
                   "q_kql_series_fill", "q_kql_series_outliers",
                   "q_kql_series_smooth", "q_kql_series_seasonal",
                   "q_kql_series_corr", "q_kql_series_anomalies",
                   "q_kql_series_forecast", "q_kql_fit_line"}
    for name, fn in QUERIES.items():
        if name in ("q_dedup_simhash",):  # pandas UDF: plan has no joins of interest
            continue
        df = fn(spark, sf_dir)
        assert_no_cartesian(df, allow_broadcast_nlj=name in allowed_nlj)


def test_pair_space_baselines_are_input_bounded(spark, sf_dir):
    """Quadratic verification baselines (lang-blocked pair self-joins)
    must carry a pushed-down input bound: blocking on a low-cardinality
    key bounds nothing at corpus scale — one language block IS the
    corpus. The bound is the scale contract; MinHash is the real path."""
    for name in ("q_dedup_jaccard", "q_dedup_ngram_jaccard"):
        df = QUERIES[name](spark, sf_dir)
        assert has_pushed_filters(df, "doc_id"), (name, executed_plan(df)[:800])


def test_rrf_fusion_probe_bounds_reach_both_scans(spark, sf_dir):
    """RRF's two retrieval arms must push their query-set bounds to
    the source: the dense arm's vec_id cap to the embeddings scan and
    the lexical arm's doc_id cap to (one of) the documents scans —
    at 100 TB the query side is the only frame that may be small, and
    that's only true if the bound reaches the parquet reader."""
    df = QUERIES["q_rrf_fusion"](spark, sf_dir)
    assert has_pushed_filters(df, "vec_id"), executed_plan(df)[:800]
    assert has_pushed_filters(df, "doc_id"), executed_plan(df)[:800]


def test_embed_sim_pairs_probe_is_bounded_broadcast(spark, sf_dir):
    """The similar-pairs entry must be bounded-probe x corpus with the
    probe broadcast and its bound pushed to the scan — never an unbounded
    corpus self-join."""
    df = QUERIES["q_embed_sim_pairs"](spark, sf_dir)
    assert has_pushed_filters(df, "vec_id"), executed_plan(df)[:800]
    assert "BroadcastNestedLoopJoin" in join_strategies(df)


def test_fuzzy_pairs_block_key_includes_first_token(spark, sf_dir):
    """The fuzzy-match self-join must block on (lang, length bucket,
    first token): without the token component hot (lang, length)
    buckets go quadratic on a web corpus (r4 verdict item 6). The
    assert reads the physical join keys, not the code."""
    df = QUERIES["q_fuzzy_prefix_pairs"](spark, sf_dir)
    plan = executed_plan(df)
    join_line = next(l for l in plan.splitlines() if "HashJoin" in l)
    for key in ("lang", "blk", "tok"):
        assert key in join_line, f"{key} missing from join keys:\n{join_line}"
    assert_no_cartesian(df)


def test_asof_join_single_shuffle_no_join(spark, sf_dir):
    """The as-of implementation must be a window over a union — zero join
    operators, one shuffle for the window partitioning."""
    df = QUERIES["q_asof_join"](spark, sf_dir)
    assert join_strategies(df) == [], executed_plan(df)[:1500]


def test_convert_pipeline_is_shuffle_free(spark, sf_dir):
    df = QUERIES["convert_isostr"](spark, sf_dir)
    assert "Exchange" not in executed_plan(df)


def test_repetition_signals_is_shuffle_free(spark, sf_dir):
    """The repetition quality signals are pure per-row array math
    (array_distinct / sorted-array max-run) — any Exchange means the
    implementation regressed to the explode->groupBy(doc_id, gram)
    shape that shuffles one row per gram occurrence at 100 TB."""
    df = QUERIES["q_repetition_signals"](spark, sf_dir)
    assert "Exchange" not in executed_plan(df)


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Chunking is tokenize + explode(sequence) + per-row slice — pure
    map-side. An Exchange would mean a groupBy/window crept into the
    chunk grid and the operator stopped scaling at scan throughput."""
    df = QUERIES["q_chunk_documents"](spark, sf_dir)
    assert "Exchange" not in executed_plan(df)


def test_chunk_pack_single_stratum_shuffle(spark, sf_dir):
    """The chunk -> pack composition must shuffle exactly ONCE — the
    per-language window partition. A second Exchange would mean the
    packing regressed to a global sort (the shape the docstring rules
    out for 100 TB); the Initial Plan section AQE appends to the plan
    string is stripped before counting."""
    df = QUERIES["q_chunk_pack"](spark, sf_dir)
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "hashpartitioning(lang" in plan


def test_sort_limit_uses_take_ordered(spark, sf_dir):
    df = QUERIES["q_sort_limit"](spark, sf_dir)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_salted_distinct_is_two_stage(spark, sf_dir):
    """Both aggregation stages must survive in the plan: per-(key,salt)
    distinct then per-key sum — the shape that bounds a hot key."""
    plan = executed_plan(QUERIES["q_salted_distinct"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan[:1500]  # partial+final x2


def test_scalar_subquery_broadcasts_aggregate(spark, sf_dir):
    """The decorrelated per-key average must come back via broadcast, not
    a fact-sized shuffle join."""
    joins = join_strategies(QUERIES["q_scalar_subquery"](spark, sf_dir))
    assert "BroadcastHashJoin" in joins, joins


def test_string_not_like_pushes_to_scan(spark, sf_dir):
    df = QUERIES["q_string_predicates"](spark, sf_dir)
    assert has_pushed_filters(df, "p_name"), executed_plan(df)[:1500]


def test_minhash_persists_signatures(spark, sf_dir):
    """The LSH self-join must scan the cached signatures, not recompute
    the shingle->aggregate chain per side."""
    plan = executed_plan(QUERIES["q_dedup_minhash"](spark, sf_dir))
    assert "InMemoryTableScan" in plan, plan[:1500]


def test_train_test_split_is_shuffle_free(spark, sf_dir):
    """Hash-based split assignment is a pure map — any Exchange here
    would be pointless data movement at 100 TB."""
    df = QUERIES["q_train_test_split"](spark, sf_dir)
    assert "Exchange" not in executed_plan(df)


def test_lag_lead_single_shuffle(spark, sf_dir):
    """Navigation window must shuffle once on user_id and sort within
    partitions — a second Exchange would double the network cost."""
    plan = executed_plan(QUERIES["q_window_lag_lead"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_stats_agg_two_stage(spark, sf_dir):
    """Co-moment aggregates must keep map-side partials: partial+final
    HashAggregate around exactly one Exchange."""
    plan = executed_plan(QUERIES["q_stats_agg"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_unpivot_feed_broadcasts_dimension(spark, sf_dir):
    """The nation dim join under the unpivot must broadcast; the melt
    itself adds no Exchange beyond the aggregate's."""
    df = QUERIES["q_unpivot"](spark, sf_dir)
    assert "BroadcastHashJoin" in join_strategies(df)
    assert executed_plan(df).count("Exchange hashpartitioning") == 1


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    """Correlated EXISTS must become a single hash semi join with the
    'R' filter pushed into the lineitem scan — the probe side shrinks
    before the shuffle, not after."""
    df = QUERIES["q_exists_subquery"](spark, sf_dir)
    plan = executed_plan(df)
    assert "LeftSemi" in plan, plan[:1500]
    assert has_pushed_filters(df, "l_returnflag"), plan[:1500]


def test_q10_broadcasts_nation_only(spark, sf_dir):
    """Q10: nation broadcasts; the fact-fact joins may be broadcast at
    test scale, but no cartesian ever."""
    joins = join_strategies(QUERIES["q10_returned_items"](spark, sf_dir))
    assert "BroadcastHashJoin" in joins, joins
    assert "CartesianProduct" not in joins


def test_tfidf_broadcasts_vocab(spark, sf_dir):
    """TF-IDF scoring join (term counts x document frequencies) must
    broadcast the vocabulary-sized df side, never shuffle the corpus."""
    joins = join_strategies(QUERIES["q_tfidf"](spark, sf_dir))
    assert "BroadcastHashJoin" in joins, joins


def test_group_concat_broadcasts_dim(spark, sf_dir):
    joins = join_strategies(QUERIES["q_group_concat"](spark, sf_dir))
    assert joins == ["BroadcastHashJoin"], joins


def test_histogram_two_stage_agg(spark, sf_dir):
    """Histogram must keep map-side partials: shuffle carries one row
    per (partition, bucket), not per input row."""
    plan = executed_plan(QUERIES["q_histogram"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_pivot_bounded_shuffles(spark, sf_dir):
    """Catalyst lowers pivot to pre-aggregate on (key, pivot col) then a
    pivotfirst aggregate on key — two Exchanges total regardless of how
    many values are pivoted, each fed by a map-side partial."""
    plan = executed_plan(QUERIES["q_pivot"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1500]
    assert "partial_pivotfirst" in plan, plan[:1500]


def test_partition_pruning_skips_directories(spark, sf_dir, tmp_path):
    """A filter on a hive partition column must become PartitionFilters
    (directory pruning before any IO) — at 100 TB this is the difference
    between scanning one partition and scanning the lake."""
    src = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_parted")
    (src.withColumn("prio", F.col("o_orderpriority"))
        .write.partitionBy("prio").parquet(out))
    df = (spark.read.parquet(out)
          .where(F.col("prio") == "1-URGENT")
          .select("o_orderkey", "o_totalprice"))
    plan = executed_plan(df)
    assert "PartitionFilters" in plan and "1-URGENT" in plan, plan[:1500]
    [schema] = read_schema(df)
    assert "o_custkey" not in schema  # pruned columns stay pruned


def test_q7_single_fact_shuffle_join(spark, sf_dir):
    """Q7's only non-broadcast join should be the fact-fact pair; every
    dimension (nation-filtered supplier/customer subsets) broadcasts."""
    df = QUERIES["q7_nation_trade"](spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies.count("SortMergeJoin") + strategies.count(
        "ShuffledHashJoin") <= 1, strategies
    assert strategies.count("BroadcastHashJoin") >= 3, strategies


def test_q2_all_dims_broadcast(spark, sf_dir):
    """Adapted Q2: the correlated min becomes a window over the pairs
    aggregate — no shuffle join anywhere, dims all broadcast."""
    df = QUERIES["q2_min_cost_supplier"](spark, sf_dir)
    strategies = join_strategies(df)
    assert "SortMergeJoin" not in strategies, strategies
    assert "ShuffledHashJoin" not in strategies, strategies


def test_q16_anti_join_broadcasts(spark, sf_dir):
    """Adapted Q16: flagged-supplier anti-join and part probe both
    broadcast; the distinct is the only fact shuffle."""
    df = QUERIES["q16_supplier_count"](spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies == ["BroadcastHashJoin", "BroadcastHashJoin"], strategies


def test_bucketed_join_is_colocated(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key into the same bucket count →
    SortMergeJoin with ZERO exchanges (the write-time shuffle is reused).
    This is the repeated-fact-join answer at 100 TB: pay the shuffle once."""
    from azure_kusto_parquet_conv_spark.plans.tuning import scoped_confs
    from azure_kusto_parquet_conv_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8,
                   path=str(tmp_path / "li"))
    write_bucketed(o, "t_o_bucketed", ["o_orderkey"], 8,
                   path=str(tmp_path / "o"))
    try:
        with scoped_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            j = colocated_join(spark, "t_li_bucketed", "t_o_bucketed",
                               F.col("l_orderkey") == F.col("o_orderkey"))
            plan = executed_plan(j)
            assert "SortMergeJoin" in plan, plan[:1500]
            assert "Exchange" not in plan, plan[:1500]
            # and it still computes the right thing
            n_bucketed = j.count()
        n_plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_runtime_bloom_filter_injects(spark, sf_dir):
    """With thresholds lowered (test scale), a selective non-broadcast dim
    side grows a bloom_filter_agg and the fact scan a might_contain probe
    — the shuffle then moves only ~matching fact rows. Results must be
    identical with and without the filter."""
    from azure_kusto_parquet_conv_spark.plans.explain import optimized_plan
    from azure_kusto_parquet_conv_spark.plans.tuning import (
        bloom_join_confs,
        scoped_confs,
    )
    li = load_table(spark, sf_dir, "lineitem")
    sel = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")

    def shape(df):
        return (df.join(sel, df.l_orderkey == sel.o_orderkey)
                  .groupBy("l_returnflag").count())

    confs = dict(bloom_join_confs())
    confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    with scoped_confs(spark, confs):
        plan = optimized_plan(shape(li))
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        rows_bloom = sorted(map(tuple, shape(li).collect()))
    # restored session: rule must no longer fire, results identical
    plan_after = optimized_plan(shape(li))
    assert "bloom_filter_agg" not in plan_after
    rows_plain = sorted(map(tuple, shape(li).collect()))
    assert rows_bloom == rows_plain


def test_q14_date_filter_pushed_and_part_broadcast(spark, sf_dir):
    df = QUERIES["q14_promo_revenue"](spark, sf_dir)
    assert has_pushed_filters(df, "l_shipdate"), executed_plan(df)[:1500]
    assert "SortMergeJoin" not in join_strategies(df)


def test_q19_extracts_single_side_prefilters(spark, sf_dir):
    """Catalyst must extract the disjunction's single-side implications
    (brand IN set on the build side) below the broadcast join."""
    df = QUERIES["q19_disjunctive_join"](spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in join_strategies(df)
    assert "Brand#12" in plan.split("BroadcastHashJoin")[-1] or \
           "p_brand" in plan.split("BroadcastHashJoin")[-1], plan[:2000]


def test_partition_stats_balanced_after_repartition(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.plans.diagnose import partition_stats
    ev = load_table(spark, sf_dir, "events").repartition(4, "event_id")
    rows = partition_stats(ev).collect()
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    assert len(rows) == 4
    assert max(r["n_rows"] for r in rows) < 2 * total / len(rows)


def test_key_skew_report(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.plans.diagnose import key_skew
    rep = key_skew(load_table(spark, sf_dir, "events"), "event_type",
                   top=3).collect()
    assert len(rep) == 3
    assert rep[0]["n"] >= rep[1]["n"] >= rep[2]["n"]
    assert all(0 < r["share"] < 1 and r["skew_ratio"] > 0 for r in rep)


def test_cohort_retention_bounded_shuffles(spark, sf_dir):
    """first-seen agg, self-join, and distinct all key on user_id — the
    plan must not exceed 4 exchanges (scan-side agg, join alignment,
    distinct, final rollup); a regression that re-keys mid-pipeline shows
    up as a 5th."""
    from azure_kusto_parquet_conv_spark.plans.explain import shuffle_count
    df = QUERIES["q_cohort_retention"](spark, sf_dir)
    assert shuffle_count(df) <= 4, executed_plan(df)[:2000]


def test_q6_all_filters_pushed_no_shuffle_join(spark, sf_dir):
    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert has_pushed_filters(df, col), executed_plan(df)[:1500]
    assert join_strategies(df) == []


def test_q8_q17_dims_broadcast(spark, sf_dir):
    """Q8: only the orders⋈lineitem join may shuffle; Q17: no shuffle
    join at all (brand list and per-part limits both broadcast)."""
    q8 = QUERIES["q8_market_share"](spark, sf_dir)
    s8 = join_strategies(q8)
    assert s8.count("SortMergeJoin") + s8.count("ShuffledHashJoin") <= 1, s8
    q17 = QUERIES["q17_small_quantity_revenue"](spark, sf_dir)
    s17 = join_strategies(q17)
    assert "SortMergeJoin" not in s17 and "ShuffledHashJoin" not in s17, s17


def test_join_strategy_hints_respected(spark, sf_dir):
    """With broadcast off, the engine can still steer the physical join:
    shuffle_hash keeps the small side as an in-memory build (no sort),
    merge forces SMJ — the knob that matters when one side is modest but
    the other is 100 TB (sorting the huge side is the cost to avoid)."""
    from azure_kusto_parquet_conv_spark.plans.tuning import scoped_confs
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    with scoped_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        shj = li.join(o.hint("shuffle_hash"),
                      li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority").count()
        assert "ShuffledHashJoin" in join_strategies(shj)
        smj = li.join(o.hint("merge"),
                      li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority").count()
        assert "SortMergeJoin" in join_strategies(smj)


def test_find_pushes_predicate_into_union_branches(spark, sf_dir):
    """find's predicate over the null-filled union must simplify and
    push into EACH branch's parquet scan (the null-literal columns of
    the other table constant-fold away) — at scale each table is
    scanned once with its own filter at the source."""
    from azure_kusto_parquet_conv_spark.kql import kql
    df = kql(spark, sf_dir, """
      find in (customer, supplier)
        where c_nationkey == 5 or s_nationkey == 5
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 2
    assert any("c_nationkey" in s and "= 5" in s.split("DataFilters")[1]
               for s in scans if "DataFilters" in s)
    assert any("s_nationkey" in s and "= 5" in s.split("DataFilters")[1]
               for s in scans if "DataFilters" in s)


def test_no_forced_broadcast_of_fact_scale_frames(spark, sf_dir):
    """The 100 TB OOM guard (PLANS.md broadcast-hint policy): an explicit
    F.broadcast bypasses autoBroadcastJoinThreshold AND AQE's runtime
    size check, so a hint on a frame whose row count grows with the
    input is a forced executor-memory blowup at scale — the plan cannot
    degrade to a shuffle join. Sweep every catalog entry's ANALYZED plan
    and reject any hinted subtree that scans a fact-scale table, unless
    (a) a global 1-row aggregate reduces it (scalar thresholds/stats —
    auto-detected) or (b) the entry is allowlisted below with the reason
    its hinted frame is bounded BY CONSTRUCTION, not merely small at
    test scale."""
    from azure_kusto_parquet_conv_spark.plans.explain import (
        fact_scale_hint_violations)
    allowed = {
        # Bounded probe/query sets: an explicit tiny id-filter selects
        # the probe side; corpus growth grows the UNHINTED side only.
        # (q_rrf_fusion's hinted frame is its dense arm's query set,
        # vec_id < 10 — the lexical arm and the fusion join are
        # unhinted, AQE-decided.)
        "q_knn_bruteforce", "q_knn_hamming", "q_embed_sim_pairs",
        "q_rrf_fusion",
        "q_knn_ivf", "q_knn_ivf_exact", "q_knn_lsh", "q_knn_lsh_exact",
        "q_knn_ivfpq_indexed", "q_knn_ivfpq_append",
        # + fixed-size trained artifacts (codebooks, centroids): size is
        # (n_lists|2^bits) x dim regardless of corpus rows.
        "q_knn_pq", "q_knn_pq_exact", "q_knn_ivfpq", "q_knn_ivfpq_exact",
        # Incremental dedup: the hinted side is the NEW BATCH (small by
        # contract — the point of incremental); the corpus/store side
        # stays unhinted and is semi-joined down to candidates.
        "q_dedup_incremental", "q_dedup_incremental_exact",
        # The benchmark shingle set: external eval suites are a bounded
        # artifact; only the training corpus side grows.
        "q_decontaminate",
        # Grouped stats over a bounded-domain key (event_type enum).
        "q_anomaly_outliers",
        # Calendar day spine: bounded by the time range, not row count.
        "q_trailing_wau",
        # top-nested winner frames: bounded by the user's N per level.
        "q_kql_top_nested",
        # KQL `lookup` operator contract: right side IS a dimension
        # (Kusto semantics); the entry exercises that operator.
        "q_kql_lookup",
        # Deliberate user-directed `hint.broadcast` DSL demo — the
        # feature under test is hint plumbing; user hints are opt-in.
        "q_kql_join_revenue",
    }
    offenders = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        viol = fact_scale_hint_violations(df)
        if viol and name not in allowed:
            offenders[name] = viol[0].splitlines()[0]
        elif not viol and name in allowed:
            # keep the allowlist honest: drop entries that no longer hint
            offenders[name] = "allowlisted but no fact-scale hint found"
    assert not offenders, offenders


def test_ivfpq_indexed_scan_prunes_partitions(spark, sf_dir):
    """The persisted IVF-PQ index read path (r8 verdict #3): the probe's
    scan of the list_id-partitioned index must carry a static
    PartitionFilters `list_id IN (...)` — directories outside the
    probed lists are never opened, so a probe touches n_probe/n_lists
    of the corpus at the source. With n_probe=1 and a strict query
    subset, at least one list must actually be pruned."""
    import re
    df = QUERIES["q_knn_ivfpq_indexed"](spark, sf_dir)
    plan = executed_plan(df)
    scans = [ln for ln in plan.splitlines()
             if "FileScan" in ln and "ivfpq_index" in ln]
    assert scans, plan[:1500]
    m = re.search(r"PartitionFilters: \[([^\]]*)", scans[0])
    assert m, scans[0]
    # the membership filter renders IN (a,b,...) or INSET a, b, ...
    probed = re.search(r"list_id#\d+ IN \(([\d,]+)\)", m.group(1)) \
        or re.search(r"list_id#\d+ INSET ([\d, ]+)", m.group(1))
    assert probed, m.group(1)
    n_lists = len(probed.group(1).replace(" ", "").split(","))
    assert 0 < n_lists < 16, m.group(1)


def test_diffpatterns_text_plan_shape(spark, sf_dir):
    """diffpatterns_text must stay the explode -> groupBy shape: no
    cartesian/NLJ (the pattern/count join is an equi-join on the
    (token-count, anchor) key) and no Python UDF in the plan."""
    from azure_kusto_parquet_conv_spark.kql import kql
    df = kql(spark, sf_dir, """
      documents | take 500
      | extend cohort = iff(doc_id % 2 == 0, 'A', 'B')
      | evaluate diffpatterns_text(text, cohort, 'A', 'B', 0.0)
    """)
    plan = executed_plan(df)
    assert_no_cartesian(df)
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_preview_short_circuits_scan(spark, sf_dir):
    """preview(N)'s sample side must plan a limit (CollectLimit /
    LocalLimit), not a full materialization, and the 1-row count side
    may broadcast (allowlisted BroadcastNestedLoopJoin)."""
    from azure_kusto_parquet_conv_spark.kql import kql
    df = kql(spark, sf_dir, "lineitem | evaluate preview(5)")
    plan = executed_plan(df)
    assert "Limit" in plan, plan[:1200]
    assert df.count() == 5


def test_ivf_assignment_udf_not_duplicated(spark, sf_dir):
    """r14 optimization pin (guide §4.4): the list_id join's generated
    isnotnull predicate must NOT re-evaluate the nearest() assignment
    UDF below the rebalance exchange — exactly one nearest() Python
    node per corpus side in the IVF plans."""
    for name in ("q_knn_ivf", "q_knn_ivfpq"):
        df = QUERIES[name](spark, sf_dir)
        plan = executed_plan(df)
        assert plan.count("nearest(") == 1, (name, plan[:2000])


def test_relation_cache_reuses_and_invalidates(spark, tmp_path):
    """r14 optimization pin: load-path relation metadata is cached per
    (path, mtime, size) — same file returns the cached plan, a
    rewritten file (new stat signature) is re-read with its new
    schema/content."""
    import os
    import time as _time

    from azure_kusto_parquet_conv_spark.sources.parquet import read_parquet

    p = str(tmp_path / "t.parquet")
    spark.range(5).select(F.col("id").alias("a")).write.mode(
        "overwrite").parquet(p)
    df1 = read_parquet(spark, p)
    assert df1.count() == 5
    df2 = read_parquet(spark, p)
    assert df2.count() == 5  # served via the cached relation
    # rewrite with different content + schema; ensure the stat
    # signature changes even on coarse mtime filesystems
    _time.sleep(0.01)
    spark.range(7).select(F.col("id").alias("b")).write.mode(
        "overwrite").parquet(p)
    os.utime(p)
    df3 = read_parquet(spark, p)
    assert df3.count() == 7 and "b" in df3.columns


def test_scoped_serialized_kernels_share_the_scope_exchange(spark,
                                                            sf_dir):
    """r15 optimization pin (guide §2.4): inside ``partition by key
    ( sort by ... | <kernel> )`` the scan / row_window_session kernels
    must reuse the scoped sort's hash exchange instead of issuing
    their own repartition — exactly ONE Exchange in the plan. The
    kernel-side repartition is an explicit REPARTITION_BY_COL that
    Catalyst can never elide, so the compiler tracks the scoped
    layout itself."""
    # expected Exchange counts: the scope shuffle itself, plus (for
    # scan_funnel_exact) the downstream summarize aggregation's — the
    # kernels themselves contribute none
    for name, want in (("q_kql_row_window_session", 1),
                       ("q_kql_scan_declare", 1),
                       ("q_kql_scan_funnel_exact", 2)):
        df = QUERIES[name](spark, sf_dir)
        plan = executed_plan(df)
        n_exchanges = plan.count("+- Exchange") + plan.count(
            ":- Exchange")
        assert n_exchanges == want, (name, plan[:2500])
