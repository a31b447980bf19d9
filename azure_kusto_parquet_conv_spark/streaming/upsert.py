"""foreachBatch upsert sink: maintain a keep-latest-per-key snapshot from
an unbounded stream (the CDC/materialized-view pattern).

Windowed aggregates and dedup (events.py) emit *new* rows; an upsert
sink instead maintains CURRENT STATE — one row per key, latest event
wins — queryable between micro-batches. Structured Streaming has no
built-in mutable-table sink, so this is the canonical composition:
``foreachBatch`` gives each micro-batch to a batch function that merges
it into the snapshot with the same keep-latest window the batch catalog
uses (operators/relational.py top-1-per-group).

Scale note: this demo rewrites the full snapshot per batch (atomic via
write-then-swap), which is right when state fits one overwrite (dims,
per-user profiles). At 100 TB state you partition the snapshot on the
key and rewrite ONLY partitions the batch touches (partition-pruned
merge), or hand the merge to a table format with file-level upsert
(Iceberg/Delta MERGE) — the foreachBatch structure stays identical."""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _keep_latest(df: DataFrame, keys: list[str], ts: str) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(ts).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))


def upsert_stream(events: DataFrame, snapshot_path: str,
                  keys: list[str] | None = None, ts: str = "ts_ns"):
    """Start building a keep-latest snapshot at ``snapshot_path`` from the
    stream; returns the DataStreamWriter (caller .start()s it).

    Ties on ``ts`` within a key break by the largest remaining tuple, so
    replayed batches reconverge to the same snapshot (idempotent merge —
    required for exactly-once output from a replayed source)."""
    keys = keys or ["user_id"]
    spark = events.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark_ = batch_df.sparkSession
        try:
            current = spark_.read.parquet(snapshot_path)
            merged = current.unionByName(batch_df)
        except Exception:  # first batch: no snapshot yet
            merged = batch_df
        out = _keep_latest(merged, keys, ts)
        tmp = snapshot_path + ".tmp"
        out.write.mode("overwrite").parquet(tmp)
        # re-read from tmp so the overwrite of the live path does not
        # invalidate the plan's own input files mid-write
        shutil.rmtree(snapshot_path, ignore_errors=True)
        shutil.move(tmp, snapshot_path)

    return (events.writeStream
            .outputMode("update")
            .foreachBatch(merge))
