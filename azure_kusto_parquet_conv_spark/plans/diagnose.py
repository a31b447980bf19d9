"""Skew and partition diagnostics.

Salting (operators/relational.py salted aggregates) and AQE skew-join
handle skew once you know it's there; these helpers are the measuring
side: per-partition row counts and per-key frequency skew, both as
small distributed aggregates (no collect of data rows — the outputs are
one row per partition / per hot key, driver-safe at any scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_stats(df: DataFrame) -> DataFrame:
    """One row per physical partition: row count. Balanced output after a
    repartition means the partitioner is doing its job; a long tail here
    predicts straggler tasks at scale."""
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
              .agg(F.count("*").cast("long").alias("n_rows")))


def key_skew(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key report: the ``top`` heaviest values of ``key`` with their
    share of all rows and the ratio to the mean key frequency — the
    number that decides whether a shuffle on ``key`` needs salting
    (ratio >> 1 → the hottest key's partition becomes the straggler).
    Two-stage: per-key counts (one shuffle), then a broadcast of the
    2-value global aggregate back onto the top keys."""
    counts = df.groupBy(key).agg(F.count("*").cast("long").alias("n"))
    totals = counts.agg(F.sum("n").alias("total"),
                        F.avg("n").alias("mean_n"))
    return (counts.orderBy(F.col("n").desc(), key).limit(top)
                  .crossJoin(F.broadcast(totals))
                  .select(key, "n",
                          F.round(F.col("n") / F.col("total"), 6)
                           .alias("share"),
                          F.round(F.col("n") / F.col("mean_n"), 2)
                           .alias("skew_ratio")))
