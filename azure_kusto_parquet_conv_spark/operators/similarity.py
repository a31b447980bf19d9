"""Similarity search over embedding columns (``array<float>``).

- ``knn_bruteforce``: exact top-k by cosine. The query side is broadcast
  (queries are small by construction); the corpus streams through codegen,
  and per-query top-k is a window over (query, -sim) — no corpus shuffle
  beyond the final per-query k rows.
- ``knn_lsh``: the scale path. Random-hyperplane sign buckets on both
  sides restrict the dot products to colliding buckets; multiple hash
  tables trade recall for cost. At 100 TB the corpus bucketing is a
  one-off pre-partitioning job and queries touch only their buckets.

The reference has no similarity surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from azure_kusto_parquet_conv_spark.functions import vectors as V
from azure_kusto_parquet_conv_spark.sources.parquet import rebalance


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
    c = rebalance(corpus).select(F.col(corpus_id).alias("neighbor_id"),
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
                        F.round("__sim", 4).alias("cosine")))


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
            include_self: bool = False) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``tables`` hash
    tables of ``planes`` sign bits. Candidates = bucket collisions in any
    table; exact cosine ranks the candidates. Recall rises with
    ``tables`` and falls with ``planes`` (bucket granularity)."""
    dim = len(corpus.select(corpus_vec).first()[0])

    def bucketize(df, id_alias, idc, vecc):
        # unit vectors: hyperplane sign bits are scale-invariant, and the
        # exact re-rank then needs only a dot product per candidate
        keys = _bucket_keys(vecc, dim, planes, tables, seed)
        per_table = [
            df.select(F.col(idc).alias(id_alias),
                      V.unit(vecc).alias(f"__{id_alias}_v"),
                      F.lit(t).alias("table"),
                      key.alias("bucket"))
            for t, key in enumerate(keys)
        ]
        out = per_table[0]
        for p in per_table[1:]:
            out = out.unionByName(p)
        return out

    qb = bucketize(queries, "query_id", query_id, query_vec)
    cb = bucketize(rebalance(corpus), "neighbor_id", corpus_id, corpus_vec)
    cand = (cb.join(broadcast(qb), ["table", "bucket"])
              .select("query_id", "neighbor_id", "__query_id_v",
                      "__neighbor_id_v")
              .distinct())
    if not include_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    sims = cand.select(
        "query_id", "neighbor_id",
        V.dot("__query_id_v", "__neighbor_id_v").alias("__sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("__sim", 4).alias("cosine")))
