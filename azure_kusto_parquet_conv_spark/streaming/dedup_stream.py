"""Continuous-crawl near-dedup: an unbounded document stream deduped
against a GROWING persisted MinHash signature store.

The batch operator ``minhash_dedup_incremental`` (operators/dedup.py)
is the one-delivery flow: sign the batch, LSH-probe the store, verify
candidates exactly. A crawl pipeline runs that flow FOREVER — every
micro-batch must see all previously streamed documents without ever
re-signing them. Structured Streaming has no mutable-table state big
enough for a corpus store, so this is the canonical ``foreachBatch``
composition (same pattern as streaming/upsert.py):

per micro-batch B_i:
  1. cross pairs  = minhash_dedup_incremental(B_i, store_sigs,
                    store_text)           -- B_i x (B_0..B_{i-1})
  2. intra pairs  = minhash_dedup_pairs(B_i)        -- B_i x B_i
  3. append normalized (id_a < id_b, jaccard) pairs
  4. append B_i's signatures + text to the store

Every unordered document pair lands in exactly one micro-batch's cross
or intra computation, and both operators share one signature algebra —
so after the stream drains, the accumulated pairs EQUAL the full batch
self-join ``minhash_dedup_pairs(all docs)``, produced incrementally
with per-batch cost O(|B_i| + candidates), never O(corpus). Pinned by
tests/test_streaming.py::test_incremental_dedup_stream_equals_batch_self_join.

Scale notes:
- The store is append-only parquet partitioned by micro-batch
  directory; each batch writes ``batch=<id>`` dirs with OVERWRITE, so a
  replayed batch (checkpoint recovery) rewrites its own output instead
  of double-appending — idempotent without a table format. With
  Iceberg/Delta the same function body becomes a MERGE/append commit.
- Only the NEW side is broadcast in the probe (bounded by delivery
  size, the minhash_dedup_incremental contract); the store-side band
  table streams through the join and is never collected.
- State growth is the signature store itself (num_hashes longs per
  doc), the honest minimum for exact-recall incremental dedup — there
  is no watermark to evict by, because an old document can always be
  the duplicate target of a new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from azure_kusto_parquet_conv_spark.operators.dedup import (
    minhash_dedup_incremental,
    minhash_dedup_pairs,
    minhash_signatures,
)


def _read_store(spark, path: str) -> DataFrame | None:
    try:
        return (spark.read.option("recursiveFileLookup", "true")
                .parquet(path))
    except Exception:  # first batch: store not created yet
        return None


def incremental_dedup_stream(docs: DataFrame, store_dir: str,
                             pairs_dir: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             threshold: float = 0.8,
                             num_hashes: int = 64, bands: int = 16,
                             shingle_n: int = 3, seed: int = 42):
    """Wire the continuous-dedup flow onto ``docs`` (a streaming
    DataFrame of documents); returns the DataStreamWriter (caller
    configures checkpoint/trigger and ``.start()``s it).

    ``store_dir`` accumulates ``sigs/`` and ``text/`` (the persisted
    corpus signature store and the id->text map used for exact
    verification); ``pairs_dir`` accumulates the discovered
    (id_a, id_b, jaccard) rows, id_a < id_b, identical to the batch
    self-join's output over all documents streamed so far."""
    kw = dict(text_col=text_col, id_col=id_col, threshold=threshold,
              num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
              seed=seed)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            pairs = minhash_dedup_pairs(batch, **kw)
            sigs = _read_store(spark, f"{store_dir}/sigs")
            if sigs is not None:
                text = _read_store(spark, f"{store_dir}/text")
                cross = minhash_dedup_incremental(batch, sigs, text, **kw)
                # replay guard: a batch recovered after its store append
                # sees ITSELF in the store — drop self-pairs and collapse
                # any intra pair the cross probe re-found (same jaccard
                # both ways, so dropDuplicates is value-preserving)
                pairs = pairs.unionByName(
                    cross.where(F.col("new_id") != F.col("corpus_id"))
                         .select(
                        F.least("new_id", "corpus_id").alias("id_a"),
                        F.greatest("new_id", "corpus_id").alias("id_b"),
                        "jaccard")).dropDuplicates(["id_a", "id_b"])
            # overwrite THIS batch's own directories: replay-idempotent
            pairs.write.mode("overwrite").parquet(
                f"{pairs_dir}/batch={batch_id}")
            minhash_signatures(batch, text_col, id_col, num_hashes,
                               shingle_n, seed=seed) \
                .write.mode("overwrite") \
                .parquet(f"{store_dir}/sigs/batch={batch_id}")
            batch.write.mode("overwrite") \
                 .parquet(f"{store_dir}/text/batch={batch_id}")
        finally:
            batch.unpersist()

    return docs.writeStream.outputMode("update").foreachBatch(step)
