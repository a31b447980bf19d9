"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join
(orders ⋈ lineitem every run) is re-shuffling both sides on the join
key. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and
each bucket is sorted, so a later join compiles to a zero-exchange
SortMergeJoin reading matching bucket files pairwise. The reference has
no multi-file concept at all (SURVEY.md §1.1, converter.rs:35-36 reads
exactly one file); this is the Spark-native answer to "partition
planning delegated to the caller" (schema.rs:118-143 --rowgroups).

Rules that make co-location actually kick off shuffle-free plans:
- both sides bucketed by the SAME keys into the SAME bucket count;
- read through the table catalog (``spark.table``) — a plain
  ``read.parquet`` of the directory loses bucket metadata;
- ``spark.sql.sources.bucketing.enabled`` on (default) and the join keys
  exactly the bucket keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from azure_kusto_parquet_conv_spark.session import prepare_session


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_keys: Sequence[str],
    num_buckets: int,
    sort_keys: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table named ``name``.

    ``sort_keys`` defaults to ``bucket_keys`` so merge joins can skip the
    per-bucket sort too. ``path`` makes it an external table (data under
    ``path``, metadata in the session catalog).
    """
    sort_keys = list(sort_keys) if sort_keys is not None else list(bucket_keys)
    writer = df.write.format("parquet").bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode(mode).saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; the plan should contain no
    Exchange under the join (verify with plans.explain.join_strategies /
    shuffle_count — pinned in tests/test_plans.py)."""
    prepare_session(spark)
    return spark.table(left_name).join(spark.table(right_name), on, how)
