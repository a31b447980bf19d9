"""Similarity search: brute-force correctness on hand vectors, LSH recall
against the brute-force truth, plan shape (broadcast, no shuffled
cartesian)."""

import pytest
from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.functions import vectors as V
from azure_kusto_parquet_conv_spark.operators import similarity as S
from azure_kusto_parquet_conv_spark.sources.parquet import load_table


def test_vector_kernels(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]),
         ([3.0, 4.0], [3.0, 4.0])],
        "a array<float>, b array<float>")
    rows = df.select(V.dot("a", "b").alias("d"),
                     V.cosine("a", "b").alias("c"),
                     V.norm("a").alias("n"),
                     V.l2_distance("a", "b").alias("l2")).collect()
    assert rows[0]["d"] == 0.0 and abs(rows[0]["c"]) < 1e-12
    assert abs(rows[1]["c"] - 1.0) < 1e-12
    assert rows[2]["n"] == 5.0 and rows[2]["l2"] == 0.0


def test_knn_bruteforce_hand_vectors(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    q = corpus.where(F.col("vec_id") == 1)
    out = [(r["neighbor_id"], r["rank"])
           for r in S.knn_bruteforce(q, corpus, k=2).collect()]
    assert out == [(2, 1), (3, 2)]  # nearest first, self excluded


def test_knn_lsh_recall(spark, sf_dir):
    """LSH top-5 must recover most of the exact top-5 neighbor sets."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = S.knn_bruteforce(q, e, k=5).collect()
    approx = S.knn_lsh(q, e, k=5, planes=4, tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid, truth in exact_sets.items():
        hits += len(truth & approx_sets.get(qid, set()))
        total += len(truth)
    recall = hits / total
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_knn_ivf_recall(spark, sf_dir):
    """IVF top-5 with n_probe=6/16 must recover most of the exact top-5,
    and n_probe=n_lists must be exactly the brute-force result."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = S.knn_bruteforce(q, e, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    approx = S.knn_ivf(q, e, k=5, n_lists=16, n_probe=6).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth & approx_sets.get(qid, set()))
               for qid, truth in exact_sets.items())
    total = sum(len(t) for t in exact_sets.values())
    assert hits / total >= 0.6, f"IVF recall {hits/total:.2f} too low"

    full = S.knn_ivf(q, e, k=5, n_lists=8, n_probe=8).collect()
    full_pairs = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in full}
    exact_pairs = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact}
    assert full_pairs == exact_pairs, "n_probe=n_lists must equal brute force"


def test_approx_distinct_within_5pct(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.queries import QUERIES
    row = QUERIES["q_approx_distinct"](spark, sf_dir).collect()[0]
    for a, x in (("approx_parts", "exact_parts"),
                 ("approx_orders", "exact_orders")):
        rel = abs(row[a] - row[x]) / row[x]
        assert rel <= 0.05, f"{a}={row[a]} vs {x}={row[x]} ({rel:.1%})"


def test_knn_plan_broadcasts_queries(spark, sf_dir):
    from azure_kusto_parquet_conv_spark.plans import join_strategies
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    plan_joins = join_strategies(S.knn_bruteforce(q, e, k=3))
    # the query side must be broadcast (small), never a shuffled cartesian
    assert "CartesianProduct" not in plan_joins
    assert any("Broadcast" in j for j in plan_joins)


def test_ivfpq_recall_and_pruned_probe_plan(spark, sf_dir):
    """IVF-PQ composition (r4 verdict item 3): recall@5 vs brute force
    >= 0.8, returned cosines exact on overlap, and the probe is an
    equi-join on list_id — NO cross/nested-loop join over the code
    table (the pruning that makes the 100 TB PQ story true)."""
    from azure_kusto_parquet_conv_spark.plans import join_strategies
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in S.knn_bruteforce(q, e, k=5).collect()}
    cents = S.train_ivf_centroids(e, n_lists=16, seed=42)
    books = S.train_pq_codebooks(e, seed=42)
    out = S.knn_ivfpq(q, e, k=5, n_lists=16, n_probe=8,
                      centroids=cents, codebooks=books)
    got_rows = out.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, recall
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in S.knn_bruteforce(q, e, k=5).collect()}
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(r["cosine"] - exact[key]) < 1e-6
    # pruned probe: list_id equi-join, no cartesian over the codes
    plan_joins = join_strategies(out)
    assert "CartesianProduct" not in plan_joins
    assert "BroadcastNestedLoopJoin" not in plan_joins
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in phys


def test_index_training_is_partition_order_independent(spark, sf_dir):
    """Seeded-hash-order sampling (r4 verdict item 5): centroids and
    codebooks must be identical after an arbitrary repartition —
    limit(n) without order was partition-order dependent."""
    e = load_table(spark, sf_dir, "embeddings")
    shuffled = e.repartition(7)
    assert S.train_ivf_centroids(e, n_lists=8, seed=1) == \
        S.train_ivf_centroids(shuffled, n_lists=8, seed=1)
    assert S.train_pq_codebooks(e, m=8, ks=8, seed=1) == \
        S.train_pq_codebooks(shuffled, m=8, ks=8, seed=1)


def test_pq_recall_and_exact_scores(spark, sf_dir):
    """ADC+rerank PQ: recall@5 vs brute force stays high, returned
    cosines are exact (re-ranked), codes are m small ints."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in S.knn_bruteforce(q, e, k=5).collect()}
    books = S.train_pq_codebooks(e, seed=42)
    got_rows = S.knn_pq(q, e, k=5, codebooks=books).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, recall
    # exact re-rank: any overlapping pair carries the same cosine as truth
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in S.knn_bruteforce(q, e, k=5).collect()}
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert abs(r["cosine"] - exact[key]) < 1e-6
    # compact codes
    codes = S.pq_encode(e, books).first()["codes"]
    assert len(codes) == 16 and all(0 <= c < 16 for c in codes)


def test_binary_quantize_bit_patterns(spark):
    """Sign-bit packing: known component signs produce the exact word
    bits; >64-dim vectors pack into multiple words; Hamming distance
    counts differing signs."""
    from azure_kusto_parquet_conv_spark.operators.similarity import (
        binary_quantize, hamming_distance)
    # dims 0,2 positive -> bits 0,2 set -> word 5
    v1 = [1.0, -1.0, 2.0, -0.5]
    # dims 0,1 positive -> word 3; differs from v1 at dims 1,2 -> H=2
    v2 = [3.0, 0.5, -2.0, -0.1]
    # 70-dim: dim 0 and dim 69 positive -> words [1, 1 << 5]
    v3 = [1.0] + [-1.0] * 68 + [2.0]
    df = spark.createDataFrame(
        [(1, v1, v2), (2, v3, v3)],
        "id long, a array<double>, b array<double>")
    rows = {r["id"]: r for r in df.select(
        "id", binary_quantize("a").alias("ca"),
        binary_quantize("b").alias("cb")).collect()}
    assert rows[1]["ca"] == [5] and rows[1]["cb"] == [3]
    assert rows[2]["ca"] == [1, 1 << 5]
    hd = {r["id"]: r["h"] for r in df.select(
        "id",
        hamming_distance(binary_quantize("a"),
                         binary_quantize("b")).alias("h")).collect()}
    assert hd == {1: 2, 2: 0}


def test_ivfpq_persisted_index_partition_prunes(spark, sf_dir, tmp_path):
    """The documented 100 TB shape: ivfpq_index written
    partitionBy(list_id) and handed back via ``index`` must (a) return
    the same results as the in-memory path and (b) PRUNE partitions at
    the scan — the probe's list_id values reach the file source as
    partition filters, so a query touches n_probe/n_lists of the code
    table on disk, not all of it."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    cents = S.train_ivf_centroids(e, n_lists=16, seed=42)
    books = S.train_pq_codebooks(e, seed=42)
    idx = S.ivfpq_index(e, cents, books)
    path = str(tmp_path / "ivfpq_index")
    idx.write.partitionBy("list_id").mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    mem = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
           S.knn_ivfpq(q, e, k=5, n_lists=16, n_probe=4,
                       centroids=cents, codebooks=books).collect()}
    out = S.knn_ivfpq(q, e, k=5, n_lists=16, n_probe=4,
                      centroids=cents, codebooks=books, index=stored)
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in out.collect()}
    assert got == mem and len(got) > 0
    # partition pruning proof: the parquet scan of the stored index
    # carries dynamic/partition filters on list_id, and the number of
    # partition directories read is bounded by the probed lists
    phys = out._jdf.queryExecution().executedPlan().toString()
    # dynamic partition pruning must be wired: the stored-index scan
    # receives a runtime list_id subquery from the broadcast probe
    # side (SubqueryAdaptiveBroadcast dynamicpruning#N ... [list_id])
    dpp_lines = [l for l in phys.splitlines()
                 if "dynamicpruning" in l.lower()]
    assert dpp_lines, phys[:2000]
    assert any("list_id" in l for l in dpp_lines), dpp_lines


def test_ivfpq_append_and_recall_probe(spark, sf_dir, tmp_path):
    """r9 verdict #6: append encodes new rows with FROZEN codebooks into
    the partitioned layout (searchable afterwards, self-pair provable),
    and the staleness probe reports recall against brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = S.train_ivf_centroids(e, n_lists=8, seed=42)
    books = S.train_pq_codebooks(e, m=8, seed=42)
    path = str(tmp_path / "idx")
    base = e.where(F.col("vec_id") % 10 != 0)
    newr = e.where(F.col("vec_id") % 10 == 0)
    S.write_ivfpq_index(base, path, cents, books)
    n_base = spark.read.parquet(path).count()
    S.append_ivfpq_index(newr, path, cents, books)
    appended = spark.read.parquet(path)
    assert appended.count() == e.count() > n_base
    # appended rows carry codes from the FROZEN books: the index codes
    # for a new row equal a fresh encode with the same books
    fresh = S.ivfpq_index(newr, cents, books)
    new_ids = {r["vec_id"] for r in newr.select("vec_id").collect()}
    a = {r["neighbor_id"]: (int(r["list_id"]), tuple(r["codes"]))
         for r in appended.collect() if r["neighbor_id"] in new_ids}
    f = {r["neighbor_id"]: (int(r["list_id"]), tuple(r["codes"]))
         for r in fresh.collect()}
    assert a == f
    # appended vectors are searchable: self-pair at rank 1, n_probe=1
    q = newr.where(F.col("vec_id") < 200)
    out = S.knn_ivfpq_indexed(spark, q, path, e, cents, books,
                              k=1, n_probe=1, include_self=True)
    got = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    want = {(r["vec_id"], r["vec_id"]) for r in q.collect()}
    assert got == want and got
    # staleness probe: 1 row, sane recall on an un-drifted index
    rec = S.ivfpq_index_recall(spark, path, e, cents, books,
                               sample_n=16, k=3, n_probe=4).collect()
    assert len(rec) == 1
    r = rec[0]
    assert r["n_pairs"] == 16 * 3
    assert 0.0 <= r["recall"] <= 1.0
    assert r["recall"] >= 0.3  # ANN on its own corpus finds most truth


def test_knn_ivf_stable_across_reruns(spark, sf_dir):
    """r14 regression pin (the r9 PythonUDF-extraction gotcha, vector
    edition): a pandas UDF whose argument inlines the bind-once
    element_at(transform(array(named_struct(...)))) unit hop
    intermittently fails UDF extraction and dies with INTERNAL_ERROR
    "Cannot evaluate expression: PythonUDF" on executions AFTER a
    session's first. The IVF paths therefore normalize with
    unit(bind_once=False) on every column a pandas UDF consumes
    (vectors.unit docstring); this pin re-executes the same IVF query
    three times and requires identical results each time."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    cents = S.train_ivf_centroids(e, n_lists=8, seed=42)
    first = None
    for _ in range(3):
        got = sorted(map(tuple, S.knn_ivf(
            q, e, k=3, n_lists=8, n_probe=2, centroids=cents).collect()))
        if first is None:
            first = got
        assert got == first
