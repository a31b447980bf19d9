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


def delete_keys(spark: SparkSession, data_dir: str, key: str, values,
                index_path: str | None = None,
                data_format: str = "parquet") -> dict[str, int]:
    """Targeted row deletion (right-to-be-forgotten): remove every row
    whose ``key`` is in ``values``, rewriting ONLY the files that contain
    those keys — resolved from the secondary index when given, else from
    one scan. Untouched files are left byte-identical, so at 100 TB the
    cost is O(affected files), not a full-dataset rewrite (the same
    copy-on-write granularity table formats use for DELETE).

    Each affected file is rewritten alone (one task's worth of data) via
    a temp file then swapped; returns counts for reporting."""
    import glob as _glob
    import os
    import uuid

    prepare_session(spark)
    vals = list(values)
    if index_path is not None:
        rows = (spark.read.parquet(index_path)
                .where(F.col("k").isin(vals)).select("files").collect())
        affected = sorted({f.removeprefix("file://")
                           for r in rows for f in r["files"]})
    else:
        rows = (spark.read.format(data_format).load(data_dir)
                .where(F.col(key).isin(vals))
                .select(F.input_file_name().alias("f")).distinct().collect())
        affected = sorted({r["f"].removeprefix("file://") for r in rows})
    deleted = 0
    for path in affected:
        df = spark.read.format(data_format).load(path)
        keep = df.where(~F.col(key).isin(vals))
        n_before = df.count()
        n_after = keep.count()
        deleted += n_before - n_after
        tmp_dir = os.path.join(os.path.dirname(path),
                               f".rewrite-{uuid.uuid4().hex}")
        keep.coalesce(1).write.format(data_format).save(tmp_dir)
        part = _glob.glob(os.path.join(tmp_dir, "part-*"))[0]
        os.replace(part, path)
        # Hadoop's ChecksumFileSystem keeps a sidecar .<name>.crc; the
        # replaced bytes no longer match it, so drop it (reads would
        # fail checksum verification otherwise)
        crc = os.path.join(os.path.dirname(path),
                           "." + os.path.basename(path) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
        import shutil as _sh
        _sh.rmtree(tmp_dir, ignore_errors=True)
    # rewritten files changed length in place: drop the session's cached
    # FileStatus entries for this path or later scans read stale sizes
    spark.catalog.refreshByPath(data_dir)
    return {"files_total": len(_glob.glob(os.path.join(data_dir, "part-*"))),
            "files_rewritten": len(affected), "rows_deleted": deleted}


def lookup_many(spark: SparkSession, index_path: str, data_dir: str,
                key: str, values,
                data_format: str = "parquet") -> DataFrame:
    """Batch point lookup: resolve the UNION of file lists for all
    ``values`` from one index read, then scan that file subset once with
    an IN predicate (pushed down). N separate lookups would open shared
    files N times; the union scan opens each file once — the batch-get
    shape a feature-store or sample-debugging workflow needs."""
    prepare_session(spark)
    vals = list(values)
    rows = (spark.read.parquet(index_path)
            .where(F.col("k").isin(vals))
            .select(F.explode("files").alias("f")).distinct().collect())
    files = sorted(r["f"] for r in rows)
    if not files:
        return (spark.read.format(data_format).load(data_dir)
                .where(F.lit(False)))
    return (spark.read.format(data_format).load(files)
            .where(F.col(key).isin(vals)))


def update_file_index(spark: SparkSession, index_path: str, key: str,
                      new_files: list[str],
                      data_format: str = "parquet") -> None:
    """Incremental index maintenance: fold newly-landed files into an
    existing index WITHOUT rescanning the whole dataset — cost is
    O(new data) + O(index), the property that keeps a record-level index
    affordable on a lake receiving continuous drops. One outer merge on
    the key: existing file lists union the new files' lists, new keys
    appear, untouched keys pass through."""
    prepare_session(spark)
    fresh = (spark.read.format(data_format).load(new_files)
             .select(F.col(key).alias("k"),
                     F.input_file_name().alias("f"))
             .distinct()
             .groupBy("k")
             .agg(F.collect_set("f").alias("new_files")))
    old = spark.read.parquet(index_path)
    merged = (old.join(fresh, "k", "full")
                 .select("k", F.array_sort(F.array_distinct(F.concat(
                     F.coalesce(F.col("files"), F.array()),
                     F.coalesce(F.col("new_files"), F.array()))))
                     .alias("files")))
    tmp = index_path + ".new"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil as _sh
    _sh.rmtree(index_path, ignore_errors=True)
    _sh.move(tmp, index_path)
    spark.catalog.refreshByPath(index_path)
