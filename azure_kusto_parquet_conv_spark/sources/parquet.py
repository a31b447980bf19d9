"""Parquet scan layer.

Reference operators covered (SURVEY.md §2.1):
- O1 scan: ``SerializedFileReader`` row iterator (converter.rs:35-36,52) ->
  ``spark.read.parquet`` — vectorized columnar reader, multi-file and
  partitioned-directory native, splits by row group automatically.
- O2 projection pushdown: hand-built projected schema (converter.rs:61-93)
  -> ``df.select``; Catalyst ColumnPruning pushes the ReadSchema into the
  scan so undecoded columns are never materialized.
- O3 missing-column null-fill: requested-but-absent columns become null
  output fields instead of errors (converter.rs:46-50,74-85,160-169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from azure_kusto_parquet_conv_spark.functions.conversion import nanos_long_to_timestamp
from azure_kusto_parquet_conv_spark.session import prepare_session

#: Fixture tables (TESTDATA.md); `events.ts` is stored as timestamp[ns].
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


#: Driver-side footer-probe cache keyed on (path, mtime_ns, size): the
#: two probes below open the parquet footer with pyarrow on every
#: DataFrame BUILD, which a query that touches five tables pays five
#: times per plan (and a min-of-N bench N times over). Footer facts
#: only change when the file does, so the stat signature is the safe
#: invalidation key — the same contract a catalog/metastore relies on.
_FOOTER_CACHE: dict = {}


def _footer_probe(path: str):
    import os
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, None, None)
    hit = _FOOTER_CACHE.get(key)
    if hit is not None:
        return hit
    nanos: set[str] = set()
    brotli: set[str] = set()
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
        f = pq.ParquetFile(path)
        nanos = {fl.name for fl in f.schema_arrow
                 if pa.types.is_timestamp(fl.type)
                 and fl.type.unit == "ns"}
        md = f.metadata
        codecs = {md.row_group(i).column(j).compression
                  for i in range(md.num_row_groups)
                  for j in range(md.row_group(i).num_columns)}
        brotli = {c for c in codecs if c and c.upper() == "BROTLI"}
    except Exception:
        pass
    _FOOTER_CACHE[key] = (nanos, brotli)
    if len(_FOOTER_CACHE) > 4096:  # bound driver memory on wide lakes
        _FOOTER_CACHE.pop(next(iter(_FOOTER_CACHE)))
    return nanos, brotli


def _nanos_columns(path: str) -> set[str]:
    """Top-level TIMESTAMP(NANOS) columns per the Parquet footer — Spark
    scans these as raw int64 (legacy.parquet.nanosAsLong) and we normalize
    them back to timestamps."""
    return _footer_probe(path)[0]


def _jvm_unreadable_codecs(path: str) -> set[str]:
    """Codecs present in the footer that Spark's JVM reader cannot decode
    without an extra classpath jar (brotli needs brotli-codec)."""
    return _footer_probe(path)[1]


def read_parquet_arrow(spark: SparkSession, path: str,
                       columns: list[str] | None = None) -> DataFrame:
    """Distributed pyarrow-based parquet scan: one Spark task per row
    group, each decoding with pyarrow (which bundles brotli) and handing
    Arrow batches back through mapInPandas.

    This is the fallback for codecs the JVM reader lacks — it keeps the
    scan DISTRIBUTED (row-group-parallel, the same split unit Spark's
    native reader uses) and Arrow-vectorized, at the cost of the Python
    worker hop. The reference compiles brotli in (pq2json/Cargo.toml:9);
    this preserves that capability on any cluster without classpath
    surgery. Column projection is honored inside pyarrow (only requested
    columns are decoded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    f = pq.ParquetFile(path)
    n_groups = f.metadata.num_row_groups
    schema_arrow = f.schema_arrow
    file_cols = set(schema_arrow.names)
    read_cols = ([c for c in columns if c in file_cols]
                 if columns is not None else list(schema_arrow.names))
    if columns is not None and not read_cols:
        # none of the requested columns exist: honor the superset-
        # projection contract (all-null columns, row count preserved)
        # instead of handing mapInPandas a zero-column frame
        return spark.range(f.metadata.num_rows).select(
            *[F.lit(None).alias(c) for c in columns])
    out_arrow = schema_arrow if columns is None else \
        pa.schema([schema_arrow.field(c) for c in read_cols])
    spark_schema = from_arrow_schema(out_arrow)

    def scan(iterator):
        import pyarrow.parquet as pq  # executor-side
        for pdf in iterator:
            pf = pq.ParquetFile(path)
            for rg in pdf["rg"].tolist():
                yield pf.read_row_group(
                    int(rg), columns=read_cols).to_pandas()

    groups = spark.createDataFrame(
        [(i,) for i in range(n_groups)], "rg int") \
        .repartition(max(n_groups, 1))
    df = groups.mapInPandas(scan, schema=spark_schema)
    if columns is None:
        return df
    present = set(df.columns)
    return df.select(*[
        F.col(c) if c in present else F.lit(None).alias(c) for c in columns
    ])


def _relation_cache(spark: SparkSession) -> dict:
    """Per-SparkSession relation (catalog) cache: base-scan DataFrames
    keyed on the file's stat signature. ``spark.read.parquet`` re-lists
    the path and re-reads footers for schema inference ON THE DRIVER on
    every call (~100 ms even warm at sf0.1) — metadata work a catalog/
    metastore does once per table, not once per query build (guide §6:
    file-listing/metadata caches; §7.3: driver-side planning cost is
    real). The cached object is the IMMUTABLE lazy plan of the base
    scan — no rows are materialized and every action still scans the
    parquet data from disk; only the driver-side listing + schema
    inference is reused. Stored ON the session object so it dies with
    the session (id()-keyed module dicts resurrect across GC; see
    session._ship_package)."""
    cache = getattr(spark, "_akpcs_relations", None)
    if cache is None:
        cache = {}
        try:
            spark._akpcs_relations = cache
        except Exception:
            pass
    return cache


def _stat_key(path: str):
    """(path, mtime_ns, size) stat signature, or None when the path is
    not os.stat-able (remote URIs: s3://, abfss://, hdfs://). A None
    key means DO NOT CACHE — the old constant (path, None, None) key
    would have served a stale relation for the life of the session
    after a remote rewrite (r14 ADVICE item 1)."""
    import os
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _base_scan(spark: SparkSession, path: str) -> DataFrame:
    """JVM parquet scan of ``path`` with the relation cache applied."""
    key = _stat_key(path)
    if key is None:  # non-statable path: bypass the cache entirely
        return spark.read.parquet(path)
    cache = _relation_cache(spark)
    df = cache.get(key)
    if df is None:
        df = cache[key] = spark.read.parquet(path)
        if len(cache) > 1024:  # bound driver memory on wide lakes
            cache.pop(next(iter(cache)))
    return df


def read_parquet(spark: SparkSession, path: str,
                 columns: list[str] | None = None) -> DataFrame:
    """Scan with optional projection and missing-column reconciliation.

    Requested columns absent from the file come back as null columns in the
    requested order (converter.rs:46-50,74-85). Unknown names are therefore
    never an error — the reference treats the projection list as a superset
    contract with the file. TIMESTAMP(NANOS) columns (which Spark's reader
    only accepts as raw int64) are converted back to timestamps so the
    conversion semantics (ms truncation etc.) apply uniformly. Files whose
    codec the JVM reader cannot decode (brotli) route through the
    distributed pyarrow scan (read_parquet_arrow) transparently.
    """
    prepare_session(spark)
    if _jvm_unreadable_codecs(path):
        return read_parquet_arrow(spark, path, columns)
    df = _base_scan(spark, path)
    dtypes = dict(df.dtypes)
    for c in _nanos_columns(path):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, nanos_long_to_timestamp(c))
    if columns is None:
        return df
    present = set(df.columns)
    return df.select(*[
        F.col(c) if c in present else F.lit(None).alias(c) for c in columns
    ])


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: timestamp[ns] (which Spark's reader only accepts as raw
    int64 via legacy.parquet.nanosAsLong) and plain timestamp[us]. Both
    normalize to the same logical surface: a microsecond TimestampType
    ``ts`` plus the integer epoch-nanosecond view ``ts_ns`` (bigint), so
    downstream integer time arithmetic is encoding-independent.
    """
    prepare_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    # The normalized table is itself cached per (session, stat sig):
    # the events ts handling below costs an analysis pass (df.dtypes),
    # paid once per file state instead of once per query build.
    cache = _relation_cache(spark)
    sig = _stat_key(path)
    key = ("load_table", sig)
    hit = cache.get(key) if sig is not None else None
    if hit is not None:
        return hit
    # Fixture tables inherit the same codec fallback as the conversion
    # path: a brotli-compressed regeneration routes through the
    # distributed pyarrow scan instead of dying on a JVM codec error.
    if _jvm_unreadable_codecs(path):
        df = read_parquet_arrow(spark, path)
    else:
        df = _base_scan(spark, path)
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = (df.withColumnRenamed("ts", "ts_ns")
                    .withColumn("ts", nanos_long_to_timestamp("ts_ns")))
        elif dt is not None and dt.startswith("timestamp"):
            df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
    cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def rebalance(df: DataFrame, min_partitions: int | None = None,
              rows_per_task: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before compute-heavy,
    embarrassingly-parallel stages (shingle hashing, cosine kernels).

    Parquet scans split at row-group boundaries, so a small file with one
    row group is ONE partition — and a per-row-expensive operator chained
    on it runs on one core while the rest of the cluster idles. At real
    scale inputs arrive in thousands of row groups and this is a no-op
    (we never repartition DOWN); the round-robin shuffle only triggers
    when input partitions < the target, i.e. when its cost is trivially
    small by construction.

    ``rows_per_task`` (optimization guide §4.2: keep Arrow batches
    large enough for vectorization to pay off) caps the fan-out so no
    task receives fewer than that many rows — a tiny table fanned out
    to defaultParallelism otherwise pays one Python-worker/Arrow
    round-trip per near-empty task, which dominates the kernel itself
    (measured at sf0.1: IVF assignment over 2k vectors, 32 -> 8 tasks
    = 0.58 -> 0.34 s). Row counts come from the same bounded footer
    reads as the row-group estimate; at real scale row counts are far
    above ``rows_per_task * defaultParallelism``, so the cap never
    binds and the no-op contract above is unchanged.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Estimate the scan's parallelism from the parquet footers instead of
    # probing the RDD partition count — touching the legacy RDD view
    # converts the whole plan per call, which is analysis churn
    # on a path every dedup/similarity query takes. Two bounds apply:
    # scans split at row-group boundaries (row groups cap the partition
    # count from above), but Spark also BIN-PACKS small files/row-groups
    # into shared partitions (maxPartitionBytes + openCostInBytes), so
    # many tiny row groups do NOT mean many partitions — the byte-based
    # packing estimate caps the row-group count. A DataFrame with no
    # input files has a shuffle upstream and is already spread across
    # shuffle partitions.
    files = df.inputFiles()
    if not files:
        return df
    try:
        import os

        import pyarrow.parquet as pq
        sample = files[:64]  # bounded driver-side footer reads
        row_groups = n_bytes = n_rows = 0
        for fp in sample:
            p = fp.removeprefix("file:")
            sig = _stat_key(p)
            skey = ("rebalance", sig)
            hit = _FOOTER_CACHE.get(skey) if sig is not None else None
            if hit is None:  # footer facts change only with the file
                meta = pq.ParquetFile(p).metadata
                hit = (meta.num_row_groups, meta.num_rows,
                       os.path.getsize(p))
                if sig is not None:
                    _FOOTER_CACHE[skey] = hit
                    # same bound as _footer_probe's insertions — this
                    # call site previously grew the module cache
                    # without limit (r14 ADVICE item 3)
                    while len(_FOOTER_CACHE) > 4096:
                        _FOOTER_CACHE.pop(next(iter(_FOOTER_CACHE)))
            row_groups += hit[0]
            n_rows += hit[1]
            n_bytes += hit[2]
        if len(files) > 64:  # sampled: scale the estimates
            row_groups = row_groups * len(files) // 64
            n_bytes = n_bytes * len(files) // 64
            n_rows = n_rows * len(files) // 64
        if rows_per_task and n_rows:
            target = min(target, max(1, -(-n_rows // rows_per_task)))
        conf = df.sparkSession.conf
        open_cost = _conf_bytes(conf, "spark.sql.files.openCostInBytes",
                                4 << 20)
        max_pb = _conf_bytes(conf, "spark.sql.files.maxPartitionBytes",
                             128 << 20)
        packed = -(-(n_bytes + open_cost * len(files)) // max_pb)  # ceil
        est = min(row_groups, packed)
    except Exception:
        est = len(files)
    if est < target:
        return df.repartition(target)
    return df


_SIZE_SUFFIX = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                "t": 1 << 40}


def _conf_bytes(conf, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m',
    '128MB') to an int; missing/unparsable -> default."""
    import re
    try:
        v = str(conf.get(key)).strip().lower()
    except Exception:
        return default
    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", v)
    if not m:
        return default
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2)]


def read_parquet_resilient(spark: SparkSession, path: str,
                           columns: list[str] | None = None) -> DataFrame:
    """Corrupt/missing-shard-tolerant directory read — the operational
    posture for a 100 TB ingest where a few of millions of files are
    truncated uploads or were compacted away between listing and read:
    per-relation ``ignoreCorruptFiles`` / ``ignoreMissingFiles`` options
    (scoped to THIS read — the session-wide confs stay strict, so the
    default pipelines still fail loudly on corruption). Each task skips
    an unreadable file after logging it and the scan continues; use for
    best-effort bulk reads, never for the correctness-gated paths.

    The reference propagates any parquet error and exits (main.rs
    error handling, exit 255 on unreadable input) — this is the
    distributed-fleet extension of that contract: one bad shard must
    not kill a thousand-task job that a single-file CLI would simply
    re-run."""
    import glob as _glob
    import os

    r = (spark.read
         .option("ignoreCorruptFiles", "true")
         .option("ignoreMissingFiles", "true"))
    # the per-relation options govern TASK-side reads, but schema
    # inference reads footers on the driver and fails hard on the
    # first corrupt one (Spark 4) — so probe for healthy footers
    # (pyarrow, driver-side, same machinery as _footer_probe) and pass
    # an explicit schema; with an explicit schema the bad shard is
    # only ever touched by tasks, where the option skips it.
    #
    # r10 ADVICE fixes: the probe walks RECURSIVELY (partitioned /
    # nested layouts previously fell back to driver-side inference and
    # still died on the first corrupt footer), and the schema is
    # MERGED across a bounded sample of healthy footers — first and
    # last healthy file per directory, capped — so columns added in
    # later shards survive. Columns that exist ONLY in unprobed middle
    # shards are still dropped (bounded driver work is the point);
    # pass an explicit .schema() upstream when that matters.
    if os.path.isdir(path):
        import pyarrow.parquet as _pq

        healthy: list[str] = []
        probes = 0
        for root, _dirs, files in sorted(os.walk(path)):
            names = sorted(f for f in files if f.endswith(".parquet"))
            picked = 0
            for fn in [*names, *reversed(names)]:
                if picked >= 2 or probes >= 256:
                    break
                f = os.path.join(root, fn)
                probes += 1
                try:
                    _pq.ParquetFile(f)
                except Exception:
                    continue
                if f not in healthy:
                    healthy.append(f)
                picked += 1
        if healthy:
            merged = (spark.read.option("mergeSchema", "true")
                      .parquet(*healthy[:32]).schema)
            # drop partition-dir columns Spark inferred from the probe
            # paths: the real read re-derives them from the full tree
            import pyarrow.parquet as _pq2
            file_cols = set()
            for f in healthy[:32]:
                file_cols |= set(_pq2.ParquetFile(f).schema_arrow.names)
            from pyspark.sql.types import StructType
            r = r.schema(StructType(
                [fld for fld in merged.fields if fld.name in file_cols]))
    df = r.parquet(path)
    return df.select(*columns) if columns else df
