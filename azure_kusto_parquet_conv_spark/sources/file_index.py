"""File-level secondary index: key -> containing-files inverted map for
point-lookup pruning.

Min-max zone maps (sources/metadata.py pruning_report) only help when a
layout clusters the column; for a high-cardinality key scattered across
files (user_id in an event lake), a point lookup still opens every file.
A secondary index inverts that: one distributed pass builds
``key -> [files]``, persisted as its own small parquet dataset; a lookup
reads the index (tiny), resolves the file list, and scans ONLY those
files. This is the Hudi/Iceberg-style record-level-index pattern, sized
so the big scan is O(files containing the key), not O(all files).

Index freshness is the caller's contract (rebuild after compaction or
new data lands — same lifecycle as any secondary index)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from azure_kusto_parquet_conv_spark.session import prepare_session


def build_file_index(spark: SparkSession, data_dir: str, key: str,
                     index_path: str,
                     data_format: str = "parquet") -> None:
    """One pass over the dataset: distinct (key, file) pairs aggregated
    to ``key -> sorted file list``, written as parquet. Shuffle is on the
    key (combinable distinct); index size ~ distinct keys, independent of
    row count."""
    prepare_session(spark)
    df = spark.read.format(data_format).load(data_dir)
    (df.select(F.col(key).alias("k"),
               F.input_file_name().alias("f"))
       .distinct()
       .groupBy("k")
       .agg(F.array_sort(F.collect_set("f")).alias("files"))
       .write.mode("overwrite").parquet(index_path))


def lookup(spark: SparkSession, index_path: str, data_dir: str, key: str,
           value, data_format: str = "parquet") -> DataFrame:
    """Point lookup: resolve the file list from the index (driver reads
    one key's row), then scan only those files with the predicate pushed
    down. A missing key returns a schema-correct empty DataFrame without
    touching any data file's pages."""
    prepare_session(spark)
    hit = (spark.read.parquet(index_path)
           .where(F.col("k") == value).select("files").collect())
    if not hit:
        return (spark.read.format(data_format).load(data_dir)
                .where(F.lit(False)))
    files = list(hit[0]["files"])
    return (spark.read.format(data_format).load(files)
            .where(F.col(key) == value))
