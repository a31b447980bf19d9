"""Similarity search over embedding columns (``array<float>``).

- ``knn_bruteforce``: exact top-k by cosine. The query side is broadcast
  (queries are small by construction); the corpus streams through codegen,
  and per-query top-k is a window over (query, -sim) — no corpus shuffle
  beyond the final per-query k rows.
- ``knn_lsh``: random-hyperplane sign buckets on both sides restrict the
  dot products to colliding buckets; multiple hash tables trade recall
  for cost.
- ``knn_ivf``: the other classic scale path — spherical k-means centroids
  (trained driver-side on a sample, the standard IVF recipe) partition
  the corpus into inverted lists; each query probes only its ``n_probe``
  closest lists. At 100 TB the list assignment is a one-off job whose
  output is written partitioned by list id, so a query's scan prunes to
  n_probe/n_lists of the corpus.

The reference has no similarity surface (SURVEY.md §2.4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from azure_kusto_parquet_conv_spark.functions import vectors as V
from azure_kusto_parquet_conv_spark.sources.parquet import rebalance

# Guide §4.2: Arrow/pandas-UDF kernels want large batches — fanning a
# tiny corpus out to defaultParallelism pays one Python round-trip per
# near-empty task. 256 rows/task measured best for the 64-dim kernels
# at sf0.1 (assign: 32 -> 8 tasks = 0.58 -> 0.34 s); at real scale the
# cap never binds (rebalance docstring).
_ROWS_PER_TASK = 256


def _round4(col) -> F.Column:
    """Engine-portable 4-decimal rounding of a similarity score:
    ROUND(x, 0) is bit-identical across engines (ties are exact
    dyadics below 2^52, both round half-away); ROUND(x, 4) is not —
    Spark rounds the shortest decimal repr, DuckDB the binary value
    (see queries.osum docstring). The BIGINT hop also sanitizes -0.0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10000.0), 0).cast("long") / F.lit(10000.0)


def knn_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   query_id: str = "vec_id", corpus_id: str = "vec_id",
                   query_vec: str = "embedding",
                   corpus_vec: str = "embedding",
                   include_self: bool = False) -> DataFrame:
    """Exact cosine top-k: broadcast(queries) x corpus -> window top-k.

    Both sides are L2-normalized ONCE before the pair space, so the
    per-pair kernel is a plain dot product (3x less per-pair arithmetic
    than cosine's dot + two norms — the norms would otherwise be
    recomputed |Q| times per corpus row).

    Output: (query_id, neighbor_id, rank, cosine) with deterministic
    tie-break on neighbor id.
    """
    q = queries.select(F.col(query_id).alias("query_id"),
                       V.unit(query_vec).alias("__qv"))
    c = rebalance(corpus, rows_per_task=_ROWS_PER_TASK).select(F.col(corpus_id).alias("neighbor_id"),
                                 V.unit(corpus_vec).alias("__cv"))
    joined = c.crossJoin(broadcast(q))
    if not include_self:
        joined = joined.where(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.select(
        "query_id", "neighbor_id",
        V.dot("__qv", "__cv").alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        _round4("__sim").alias("cosine")))


def _det_sample(df: DataFrame, cols: list[str], n: int,
                seed: int) -> DataFrame:
    """Order-independent bounded sample: seeded-hash-order top-n.
    ``limit(n)`` alone is partition-order dependent (which rows arrive
    first depends on the cluster layout), so index builds trained on it
    drift across layouts; ordering by a seeded xxhash64 of the row makes
    the SAME n rows win on any partitioning, and it compiles to
    TakeOrderedAndProject (distributed partial top-n, no full sort)."""
    key = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    return df.orderBy(key).limit(n)


def train_ivf_centroids(corpus: DataFrame, vec_col: str = "embedding",
                        n_lists: int = 16, sample_size: int = 10_000,
                        iters: int = 10, seed: int = 42) -> list[list[float]]:
    """Spherical k-means centroids from a corpus sample (driver-side
    numpy — IVF training is a tiny-sample problem even for a 100 TB
    corpus; only the ASSIGNMENT must be distributed). The sample is
    seeded-hash-ordered (_det_sample) so the trained index is identical
    across partition layouts."""
    import numpy as np

    rows = _det_sample(corpus.select(vec_col), [vec_col],
                       sample_size, seed).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12
    return [[float(v) for v in c] for c in C]


def _stack(series) -> "object":
    """pandas Series of array<double> -> (rows, dim) float64 matrix;
    null vectors become zero rows (they dot to 0 with every centroid)."""
    import numpy as np
    vals = series.to_numpy()
    dim = next((len(v) for v in vals if v is not None), 0)
    return np.vstack([np.zeros(dim) if v is None else np.asarray(v)
                      for v in vals])


def assign_ivf_list(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "__v") -> DataFrame:
    """Add ``list_id`` = (1-based) argmax centroid dot product.

    Arrow-batched pandas UDF with the centroid matrix captured in the
    closure: one (batch x dim) @ (dim x n_lists) matmul per batch.
    (Catalyst-literal centroids were tried first: a 16x64-literal
    expression tree per row optimizes/compiles for seconds and still
    evaluates interpreted — dense linear algebra is the declared
    pandas-UDF case.) Assignment is narrow (no shuffle); at scale, write
    the output partitioned by ``list_id`` so probing prunes partitions.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64).T  # dim x n_lists

    @pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        dots = _stack(v) @ C
        return pd.Series(np.argmax(dots, axis=1) + 1).astype("int32")

    # Guide §4.4: the list_id equi-join downstream generates an
    # isnotnull(list_id) predicate which filter-pushdown copies BELOW
    # the rebalance exchange, re-evaluating the whole assignment UDF
    # (plus its inlined O(dim) normalize argument) a second time — on
    # the UNREPARTITIONED scan. Marking the UDF non-deterministic
    # forbids the duplication; the function itself is deterministic,
    # so results are unchanged (plan pin: one ArrowEvalPython
    # [nearest] in tests/test_plans.py).
    return df.withColumn("list_id",
                         nearest.asNondeterministic()(F.col(vec_col)))


def _probe_lists_udf(centroids: list[list[float]], n_probe: int):
    """pandas UDF: vector -> array<int> of its n_probe nearest list ids
    (stable argsort on -dot, ties to the lower id, matching assignment)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64).T

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        dots = _stack(v) @ C
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe] + 1
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probes


def knn_ivf(queries: DataFrame, corpus: DataFrame, k: int = 5,
            query_id: str = "vec_id", corpus_id: str = "vec_id",
            query_vec: str = "embedding", corpus_vec: str = "embedding",
            n_lists: int = 16, n_probe: int = 4, seed: int = 42,
            centroids: list[list[float]] | None = None,
            include_self: bool = False) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into ``n_lists`` inverted
    lists by nearest spherical-k-means centroid; each query scans only its
    ``n_probe`` nearest lists. Recall rises with n_probe (n_probe=n_lists
    is exact brute force, so the knob trades cost for recall smoothly)."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, corpus_vec, n_lists,
                                        seed=seed)
    # bind_once=False on both sides: the assignment / probe pandas
    # UDFs consume these columns, and a PythonUDF over the bound-struct
    # unit hop intermittently fails UDF extraction (vectors.unit doc).
    c = assign_ivf_list(
        rebalance(corpus, rows_per_task=_ROWS_PER_TASK).select(F.col(corpus_id).alias("neighbor_id"),
                                 V.unit(corpus_vec, bind_once=False)
                                  .alias("__v")),
        centroids)
    probes = _probe_lists_udf(centroids, n_probe)
    q = (queries.select(F.col(query_id).alias("query_id"),
                        V.unit(query_vec, bind_once=False).alias("__qv"))
         .withColumn("list_id", F.explode(probes(F.col("__qv")))))
    cand = c.join(broadcast(q), "list_id")
    if not include_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    sims = cand.select("query_id", "neighbor_id",
                       V.dot("__qv", "__v").alias("__sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        _round4("__sim").alias("cosine")))


def _bucket_keys(vec_col: str, dim: int, planes: int, tables: int,
                 seed: int) -> list:
    import random
    rnd = random.Random(seed)
    keys = []
    for _ in range(tables):
        plane_lits = [F.array(*[F.lit(rnd.gauss(0, 1)) for _ in range(dim)])
                      for _ in range(planes)]
        bits = [(V.dot(F.col(vec_col), p) > 0).cast("int")
                for p in plane_lits]
        key = bits[0]
        for b in bits[1:]:
            key = key * 2 + b
        keys.append(key)
    return keys


def knn_lsh(queries: DataFrame, corpus: DataFrame, k: int = 5,
            query_id: str = "vec_id", corpus_id: str = "vec_id",
            query_vec: str = "embedding", corpus_vec: str = "embedding",
            planes: int = 6, tables: int = 4, seed: int = 42,
            include_self: bool = False, dim: int | None = None) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``tables`` hash
    tables of ``planes`` sign bits. Candidates = bucket collisions in any
    table; exact cosine ranks the candidates. Recall rises with
    ``tables`` and falls with ``planes`` (bucket granularity).

    Pass ``dim`` when known — otherwise one extra (tiny, LIMIT-1) Spark
    job peeks at a single corpus row before candidate generation."""
    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])

    def bucketize(df, id_alias, idc, vecc):
        # unit vectors: hyperplane sign bits are scale-invariant, and the
        # exact re-rank then needs only a dot product per candidate.
        # One projection + posexplode over the per-table keys instead of
        # a ``tables``-way union: the union shape re-scanned the corpus
        # and re-evaluated the L2 normalization once PER TABLE (guide
        # §2.4 — do the work once, fan out rows cheaply); posexplode's
        # 0-based position is exactly the old ``lit(t)`` table id, so
        # the (table, bucket) candidate space is unchanged.
        keys = _bucket_keys(vecc, dim, planes, tables, seed)
        return df.select(F.col(idc).alias(id_alias),
                         V.unit(vecc).alias(f"__{id_alias}_v"),
                         F.posexplode(F.array(*keys))
                          .alias("table", "bucket"))

    qb = bucketize(queries, "query_id", query_id, query_vec)
    cb = bucketize(rebalance(corpus, rows_per_task=_ROWS_PER_TASK), "neighbor_id", corpus_id, corpus_vec)
    # Dot BEFORE the collision dedup, dedup on the scalar id pair: the
    # old shape ran DISTINCT over the two 64-dim vector columns, and
    # array group keys force the slow sort-based aggregate and shuffle
    # the vectors themselves (guide §2.3 — shuffle keys, not payloads).
    # A pair's dot is identical across its <= ``tables`` collision
    # duplicates, so MIN over the id pair returns the same value and
    # the shuffle carries three scalars per candidate.
    cand = (cb.join(broadcast(qb), ["table", "bucket"])
              .select("query_id", "neighbor_id",
                      V.dot("__query_id_v", "__neighbor_id_v")
                       .alias("__sim")))
    if not include_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    sims = (cand.groupBy("query_id", "neighbor_id")
                .agg(F.min("__sim").alias("__sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        _round4("__sim").alias("cosine")))


def train_pq_codebooks(corpus: DataFrame, vec_col: str = "embedding",
                       m: int = 16, ks: int = 16,
                       sample_size: int = 10_000, iters: int = 10,
                       seed: int = 42) -> list[list[list[float]]]:
    """Product-quantization codebooks: per-subspace k-means on a bounded
    UNIT-NORMALIZED sample (driver-side numpy — like IVF training, a
    tiny-sample problem; only encoding/scoring must be distributed).
    Returns m codebooks of ks centroids each over dim/m-wide slices.
    Seeded-hash-ordered sample (_det_sample): identical codebooks on
    any partition layout."""
    import numpy as np

    rows = _det_sample(corpus.select(V.unit(vec_col).alias("v")),
                       ["v"], sample_size, seed).collect()
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[rng.choice(len(S), size=min(ks, len(S)), replace=False)].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(C)):
                pts = S[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books.append(C.tolist())
    return books


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """pandas UDF factory: vector -> m nearest-centroid codes
    (vectorized argmin per Arrow batch, no per-row Python)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = [np.array(b, dtype=np.float64) for b in codebooks]
    m, sub = len(B), B[0].shape[1]

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * sub:(j + 1) * sub]
            d = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = d.argmin(1)
        return pd.Series([row.tolist() for row in out])

    return enc


def pq_encode(corpus: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode each vector to m uint8-sized codes (nearest centroid per
    subspace) — a 64-float vector becomes 8 small ints, a 32x memory
    compression that lets a 100 TB corpus's index fit hot. Arrow-batched
    pandas UDF (vectorized argmin per batch, no per-row Python)."""
    enc = _pq_encode_udf(codebooks)
    return rebalance(corpus, rows_per_task=_ROWS_PER_TASK).select(
        F.col(id_col).alias("neighbor_id"),
        enc(F.col(vec_col)).alias("codes"))


def _adc_tables_udf(codebooks: list[list[list[float]]]):
    """pandas UDF factory: query vector -> (m x ks) squared-distance
    table from its unit-normalized subvectors to every centroid."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = [np.array(b, dtype=np.float64) for b in codebooks]
    m, sub = len(B), B[0].shape[1]

    @pandas_udf("array<array<double>>")
    def dtables(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        out = []
        for row in X:
            t = [(((row[j * sub:(j + 1) * sub][None, :] - B[j]) ** 2)
                  .sum(-1)).tolist() for j in range(m)]
            out.append(t)
        return pd.Series(out)

    return dtables


_ADC_EXPR_TEMPLATE = ("aggregate(sequence(0, {last}), CAST(0 AS DOUBLE), "
                      "(acc, j) -> acc + __tables[j][codes[j]])")


def _adc_rerank(pairs: DataFrame, corpus: DataFrame, m: int, k: int,
                rerank: int, corpus_id: str, corpus_vec: str,
                include_self: bool) -> DataFrame:
    """Shared ADC tail: pure-SQL lookup-sum distance, per-query top
    ``rerank*k`` cut, exact-dot re-rank of the survivors."""
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    adc = pairs.withColumn(
        "__adc", F.expr(_ADC_EXPR_TEMPLATE.format(last=m - 1)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc())
    cand = (adc.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k * rerank)
               .select("query_id", "neighbor_id", "__qv"))
    vecs = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                         V.unit(corpus_vec).alias("__cv"))
    exact = (cand.join(vecs, "neighbor_id")
                 .select("query_id", "neighbor_id",
                         V.dot("__qv", "__cv").alias("__sim")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w2))
                 .where(F.col("rank") <= k)
                 .select("query_id", "neighbor_id", "rank",
                         _round4("__sim").alias("cosine")))


def knn_pq(queries: DataFrame, corpus: DataFrame, k: int = 5,
           query_id: str = "vec_id", corpus_id: str = "vec_id",
           query_vec: str = "embedding", corpus_vec: str = "embedding",
           m: int = 16, ks: int = 16, seed: int = 42,
           codebooks: list[list[list[float]]] | None = None,
           codes: DataFrame | None = None, rerank: int = 10,
           include_self: bool = False) -> DataFrame:
    """PQ approximate top-k via asymmetric distance computation (ADC):

    - each query precomputes an (m x ks) table of squared distances from
      its subvectors to every centroid (pandas UDF, tiny output);
    - the corpus side carries only its codes; the approximate distance
      is a pure-SQL table lookup-sum (codegen, no Python per pair);
    - the top ``rerank*k`` ADC candidates per query are re-ranked with
      the EXACT dot product (the standard ADC+rerank recipe), so
      returned cosines are exact and recall depends only on whether the
      true neighbor survives the ADC cut.

    Unit-normalizing both sides first makes squared-L2 ranking identical
    to cosine ranking, so ADC approximates the same ordering
    knn_bruteforce produces. Scale note: this is the textbook FLAT-ADC
    baseline — every query batch still scans the full (compact) code
    table. ``knn_ivfpq`` is the production 100 TB path: it routes the
    same ADC scoring through IVF list pruning so each query touches only
    n_probe/n_lists of the codes."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, corpus_vec, m=m, ks=ks, seed=seed)
    if codes is None:
        codes = pq_encode(corpus, codebooks, corpus_vec, corpus_id)
    dtables = _adc_tables_udf(codebooks)
    # bind_once=False: __qv shares a projection with the dtables pandas
    # UDF (and probes consumes it in the IVF variants) — keep the
    # UDF-extraction-safe shape (vectors.unit doc).
    q = queries.select(F.col(query_id).alias("query_id"),
                       V.unit(query_vec, bind_once=False).alias("__qv"),
                       dtables(F.col(query_vec)).alias("__tables"))
    pairs = codes.crossJoin(broadcast(q))
    return _adc_rerank(pairs, corpus, len(codebooks), k, rerank,
                       corpus_id, corpus_vec, include_self)


def knn_ivfpq(queries: DataFrame, corpus: DataFrame, k: int = 5,
              query_id: str = "vec_id", corpus_id: str = "vec_id",
              query_vec: str = "embedding", corpus_vec: str = "embedding",
              n_lists: int = 16, n_probe: int = 4, m: int = 16,
              ks: int = 16, seed: int = 42, rerank: int = 10,
              centroids: list[list[float]] | None = None,
              codebooks: list[list[list[float]]] | None = None,
              index: DataFrame | None = None,
              include_self: bool = False) -> DataFrame:
    """IVF-PQ: the composed 100 TB ANN recipe — IVF list pruning routes
    each query to its ``n_probe`` nearest inverted lists, and within
    those lists the PQ/ADC lookup-sum scores the (32x compressed) codes;
    the top ``rerank*k`` survivors are re-ranked with the exact dot
    product, so returned cosines are exact and only recall is
    approximate.

    The corpus index (one row per vector: list_id + PQ codes) is built
    in ONE narrow pass — both assignments come from the same Arrow batch
    stream, no self-join. At 100 TB the index is written once,
    partitioned by ``list_id``, so a query's scan prunes to
    n_probe/n_lists of the code table (the piece flat ADC lacks); pass
    it back via ``index`` to amortize across query batches. The probe
    itself is an equi-join on list_id against the broadcast query side —
    never a full code-table cross join."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, corpus_vec, n_lists,
                                        seed=seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, corpus_vec, m=m, ks=ks, seed=seed)
    if index is None:
        index = ivfpq_index(corpus, centroids, codebooks,
                            vec_col=corpus_vec, id_col=corpus_id)
    dtables = _adc_tables_udf(codebooks)
    probes = _probe_lists_udf(centroids, n_probe)
    q = (queries.select(F.col(query_id).alias("query_id"),
                        V.unit(query_vec, bind_once=False).alias("__qv"),
                        dtables(F.col(query_vec)).alias("__tables"))
         .withColumn("list_id", F.explode(probes(F.col("__qv")))))
    pairs = index.join(broadcast(q), "list_id")
    return _adc_rerank(pairs, corpus, len(codebooks), k, rerank,
                       corpus_id, corpus_vec, include_self)


def ivfpq_index(corpus: DataFrame, centroids: list[list[float]],
                codebooks: list[list[list[float]]],
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """The IVF-PQ corpus index: (neighbor_id, list_id, codes) in one
    narrow pass over the vectors. At scale, persist this partitioned by
    list_id (``.write.partitionBy('list_id')``) and hand the scan back
    to knn_ivfpq via ``index`` — probes then prune at the source."""
    enc = _pq_encode_udf(codebooks)
    base = rebalance(corpus, rows_per_task=_ROWS_PER_TASK).select(F.col(id_col).alias("neighbor_id"),
                                    F.col(vec_col).alias("__cvec"))
    return (assign_ivf_list(base, centroids, vec_col="__cvec")
            .select("neighbor_id", "list_id",
                    enc(F.col("__cvec")).alias("codes")))


def write_ivfpq_index(corpus: DataFrame, path: str,
                      centroids: list[list[float]],
                      codebooks: list[list[list[float]]],
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      mode: str = "overwrite") -> None:
    """Materialize the IVF-PQ index PARTITIONED BY list id — the 100 TB
    layout promised in the module docstring: one parquet directory per
    inverted list, so a probe's scan PRUNES to n_probe/n_lists of the
    corpus at the source (PartitionFilters, no data read outside the
    probed lists). Build is one narrow pass (ivfpq_index) plus the
    partitioned write's shuffle-free fan-out; at scale this runs once
    and every query batch amortizes it. Lifecycle (build → append →
    recall probe → rebuild trigger): PLANS.md 'The ANN index lifecycle
    at 100 TB'."""
    (ivfpq_index(corpus, centroids, codebooks, vec_col, id_col)
     .write.mode(mode).partitionBy("list_id").parquet(path))


def append_ivfpq_index(new_rows: DataFrame, path: str,
                       centroids: list[list[float]],
                       codebooks: list[list[list[float]]],
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> None:
    """Incrementally grow a persisted IVF-PQ index: encode ONLY the new
    corpus rows with the FROZEN centroids/codebooks (no retrain — the
    quantizer is a model; retraining it would silently re-key every
    existing code) and append them into the same list_id-partitioned
    layout. A 100 TB pipeline ingests continuously; rebuilding the
    whole index per batch would be O(corpus) while this is O(batch).
    Drift is the price of frozen codebooks — measure it with
    :func:`ivfpq_index_recall` and rebuild when recall decays. The
    full loop and its cost table: PLANS.md 'The ANN index lifecycle
    at 100 TB'."""
    write_ivfpq_index(new_rows, path, centroids, codebooks,
                      vec_col, id_col, mode="append")


def ivfpq_index_recall(spark, index_path: str, corpus: DataFrame,
                       centroids: list[list[float]],
                       codebooks: list[list[list[float]]],
                       sample_n: int = 32, k: int = 5,
                       n_probe: int = 4, seed: int = 7,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Index staleness probe: recall@k of the persisted index against
    brute force on a deterministic sample of corpus vectors — the
    health metric that tells an append-heavy pipeline when frozen
    codebooks have drifted from the data and the index needs a
    rebuild. Returns a 1-row DataFrame (n_queries, hits, recall);
    everything stays distributed (semi-join + count aggregates).
    When and how to act on the number (alert floor, rebuild + path
    swap): PLANS.md 'The ANN index lifecycle at 100 TB'."""
    qs = _det_sample(corpus, [id_col], sample_n, seed)
    truth = knn_bruteforce(qs, corpus, k=k, query_id=id_col,
                           corpus_id=id_col, query_vec=vec_col,
                           corpus_vec=vec_col)
    got = knn_ivfpq_indexed(spark, qs, index_path, corpus, centroids,
                            codebooks, k=k, n_probe=n_probe,
                            query_id=id_col, corpus_id=id_col,
                            query_vec=vec_col, corpus_vec=vec_col)
    hits = truth.join(got.select("query_id", "neighbor_id"),
                      ["query_id", "neighbor_id"], "left_semi")
    return (truth.agg(F.count("*").alias("__n"))
                 .crossJoin(hits.agg(F.count("*").alias("__h")))
                 .select(F.col("__n").cast("long").alias("n_pairs"),
                         F.col("__h").cast("long").alias("hits"),
                         (F.col("__h") / F.col("__n")).alias("recall")))


def read_ivfpq_index(spark, path: str) -> DataFrame:
    """Read a written IVF-PQ index; ``list_id`` comes back as the
    partition column (int)."""
    df = spark.read.parquet(path)
    return df.withColumn("list_id", F.col("list_id").cast("int"))


def knn_ivfpq_indexed(spark, queries: DataFrame, index_path: str,
                      corpus: DataFrame,
                      centroids: list[list[float]],
                      codebooks: list[list[list[float]]],
                      k: int = 5, n_probe: int = 4, rerank: int = 10,
                      query_id: str = "vec_id",
                      corpus_id: str = "vec_id",
                      query_vec: str = "embedding",
                      corpus_vec: str = "embedding",
                      include_self: bool = False) -> DataFrame:
    """IVF-PQ probe against a PERSISTED partitioned index: the batch's
    probe list ids (at most n_lists values — bounded regardless of
    query count) resolve driver-side from the bounded query set, and
    the index scan carries a STATIC ``list_id IN (...)`` predicate that
    Spark turns into PartitionFilters — directories outside the probed
    lists are never opened. This is the production read path
    ``knn_ivfpq`` recomputes inline; ``corpus`` is only touched for the
    exact re-rank of the rerank*k survivors (an equi-join on id)."""
    dtables = _adc_tables_udf(codebooks)
    probes = _probe_lists_udf(centroids, n_probe)
    q = (queries.select(F.col(query_id).alias("query_id"),
                        V.unit(query_vec, bind_once=False).alias("__qv"),
                        dtables(F.col(query_vec)).alias("__tables"))
         .withColumn("list_id", F.explode(probes(F.col("__qv")))))
    # bounded driver materialization: <= n_lists ints, query side only
    probe_ids = sorted({r[0] for r in
                        q.select("list_id").distinct().collect()})
    index = (read_ivfpq_index(spark, index_path)
             .where(F.col("list_id").isin(probe_ids)))
    pairs = index.join(broadcast(q), "list_id")
    return _adc_rerank(pairs, corpus, len(codebooks), k, rerank,
                       corpus_id, corpus_vec, include_self)


def binary_quantize(vec: Column | str) -> Column:
    """Sign-bit binary quantization: one bit per dimension (set iff the
    component is > 0), packed into an ``array<bigint>`` of 64-bit
    words — a 32x compression of float32 embeddings that keeps
    neighborhood structure (the standard first-stage filter of a
    100 TB vector store; Hamming distance on the codes is a cheap
    proxy for angular distance). Pure higher-order SQL: zero Python,
    whole-stage codegen, sign pattern identical on every engine."""
    v = f"`{vec}`" if isinstance(vec, str) else vec
    if not isinstance(v, str):
        raise TypeError("binary_quantize takes a column NAME (the "
                        "packer is a generated SQL expression)")
    # SQL-side shiftleft accepts expression bit counts (the pyspark
    # wrapper takes only Python ints); __bq_ lambda-var prefixes keep
    # user columns unshadowed when inlined
    word = (f"aggregate(zip_with("
            f"slice({v}, __bq_j * 64 + 1, "
            f"least(64, size({v}) - __bq_j * 64)), "
            f"sequence(0, least(63, size({v}) - __bq_j * 64 - 1)), "
            f"(__bq_x, __bq_i) -> IF(__bq_x > 0, "
            f"shiftleft(CAST(1 AS BIGINT), __bq_i), "
            f"CAST(0 AS BIGINT))), "
            f"CAST(0 AS BIGINT), (__bq_a, __bq_b) -> __bq_a | __bq_b)")
    return F.expr(
        f"transform(sequence(0, CAST(floor((size({v}) - 1) / 64) "
        f"AS INT)), __bq_j -> {word})")


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed bit-code arrays
    (XOR + popcount per 64-bit word, summed)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb,
                   lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, d: acc + d).cast("long")


def knn_hamming(queries: DataFrame, corpus: DataFrame, k: int = 5,
                query_id: str = "vec_id", corpus_id: str = "vec_id",
                query_vec: str = "embedding",
                corpus_vec: str = "embedding",
                include_self: bool = False) -> DataFrame:
    """Top-k by Hamming distance over sign-bit codes: the compressed
    exhaustive path — the corpus scan touches 1 long per 64 dims
    instead of 64 floats (32x less IO), XOR+popcount per candidate
    instead of a float dot product. Deterministic total order
    (distance, then neighbor id). Output: (query_id, neighbor_id,
    rank, hamming). At 100 TB, persist the quantized corpus once and
    feed it back as ``corpus`` with the codes precomputed."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       binary_quantize(query_vec).alias("__qc"))
    c = rebalance(corpus, rows_per_task=_ROWS_PER_TASK).select(F.col(corpus_id).alias("neighbor_id"),
                                 binary_quantize(corpus_vec)
                                 .alias("__cc"))
    joined = c.crossJoin(broadcast(q))
    if not include_self:
        joined = joined.where(F.col("query_id") != F.col("neighbor_id"))
    d = joined.select("query_id", "neighbor_id",
                      hamming_distance("__qc", "__cc").alias("hamming"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc())
    return (d.withColumn("rank", F.row_number().over(w).cast("long"))
             .where(F.col("rank") <= k)
             .select("query_id", "neighbor_id", "rank", "hamming"))
