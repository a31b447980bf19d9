"""Data-layout clustering: Z-order (Morton) sort for multi-dimensional
scan pruning.

Parquet scans prune at two granularities — partition directories and
row-group/file min-max statistics. A single-column sort gives tight
min-max ranges on that column only; filters on a second column still
read everything. Z-ordering interleaves the bits of several columns into
one sort key, so every file covers a small HYPER-RECTANGLE of the key
space and the footer stats stay tight on ALL participating columns —
multi-dimensional data skipping with zero read-path changes (the pruning
is the stock min-max logic the reference delegates to its caller via
--rowgroups, schema.rs:118-143).

Everything here is JVM-side integer bit arithmetic (shiftleft/and/or
Column expressions) — no UDFs — and the final layout step is
repartitionByRange + sortWithinPartitions, i.e. one range shuffle at
write time, amortized over every subsequent scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Morton key: bit j of column i lands at position
    ``j * n_cols + i``. Columns must already be range-normalized (see
    ``zorder_sort`` for the min-max normalizing wrapper)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        cl = c.cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cl, j).bitwiseAND(F.lit(1)),
                            j * n + i))
    return z


def zorder_sql(cols: Sequence[str], bits: int = 12) -> str:
    """The same Morton key as ``zorder_key`` rendered as ANSI SQL text
    (`>>`, `&`, `|`, `<<`) — runnable by DuckDB for differential checks,
    kept in lockstep with the Column builder above."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for j in range(bits):
            terms.append(f"((({c} >> {j}) & 1) << {j * n + i})")
    return "(" + " | ".join(terms) + ")"


def zorder_sort(df: DataFrame, cols: Sequence[str], bits: int = 12,
                num_files: int | None = None) -> DataFrame:
    """Range-normalize ``cols`` to ``[0, 2^bits)``, build the Morton key,
    and lay the rows out so each output file covers a narrow key range.

    Normalization bounds come from one tiny agg job (driver-collected
    scalars folded into the expression as literals — at 100 TB this is a
    metadata-cheap full-scan agg, or can be fed from known domain bounds).
    The layout step is ``repartitionByRange`` on the key (range shuffle,
    balanced output files) + ``sortWithinPartitions`` so min-max stats
    are tight inside each file too."""
    bounds = df.agg(*[f for c in cols
                      for f in (F.min(c).alias(f"min_{c}"),
                                F.max(c).alias(f"max_{c}"))]).collect()[0]
    top = (1 << bits) - 1
    normed = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = max(int(hi) - int(lo), 1)
        normed.append(((F.col(c).cast("long") - F.lit(int(lo)))
                       * F.lit(top) / F.lit(span)).cast("long"))
    keyed = df.withColumn("__z", zorder_key(normed, bits))
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (keyed.repartitionByRange(parts, "__z")
                 .sortWithinPartitions("__z")
                 .drop("__z"))


def _hilbert_index(coords: Sequence[int], bits: int) -> int:
    """Pure-Python Hilbert index of one point (Skilling's published
    transform, "Programming the Hilbert curve", AIP 2004): coords ->
    transposed Gray-code form -> bit-interleaved index. The reference
    the vectorized kernel is differentially tested against; also the
    exhaustive-grid adjacency proof target (consecutive indices are
    unit grid neighbors)."""
    n = len(coords)
    x = [int(c) & ((1 << bits) - 1) for c in coords]
    m = 1 << (bits - 1)
    # inverse-undo pass
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    # Gray encode
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        x[i] ^= t
    # transposed -> single index (x[0] carries the most significant
    # bit at each level)
    key = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            key = (key << 1) | ((x[i] >> j) & 1)
    return key


def hilbert_key(cols: Sequence[Column | str], bits: int = 12) -> Column:
    """Hilbert-curve clustering key over >= 2 range-normalized integer
    columns — the locality-tighter sibling of ``zorder_key``. A Morton
    key jumps across the space at every quadrant boundary; the Hilbert
    curve is CONTINUOUS (consecutive keys are unit grid neighbors,
    proven exhaustively in tests), so consecutive output files cover
    adjacent hyper-rectangles and a range predicate touches fewer
    files at 100 TB. The per-level state rotation makes the key
    inexpressible as a fixed SQL bit-interleave, so it rides ONE
    Arrow-batched numpy kernel (mask-vectorized Skilling transform —
    loops run over bits x dims, not rows; nulls enter as 0, same as
    zorder's cast). Prefer ``zorder_key`` when pure-SQL
    differential checking matters more than locality."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n = len(cols)
    if n < 2:
        raise ValueError("hilbert needs >= 2 columns")
    if bits * n > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]

    def kernel(*series):
        mask_bits = (1 << bits) - 1
        xs = [s.fillna(0).to_numpy(dtype="int64") & mask_bits
              for s in series]
        m = 1 << (bits - 1)
        q = m
        while q > 1:
            p = q - 1
            for i in range(n):
                hit = (xs[i] & q) != 0
                t = (xs[0] ^ xs[i]) & p
                x0_else, xi_else = xs[0] ^ t, xs[i] ^ t
                xs[0] = np.where(hit, xs[0] ^ p, x0_else)
                if i:  # xs[0]'s else-branch already applied above
                    xs[i] = np.where(hit, xs[i], xi_else)
            q >>= 1
        for i in range(1, n):
            xs[i] = xs[i] ^ xs[i - 1]
        t = np.zeros_like(xs[0])
        q = m
        while q > 1:
            t = t ^ np.where((xs[n - 1] & q) != 0, q - 1, 0)
            q >>= 1
        xs = [x ^ t for x in xs]
        key = np.zeros_like(xs[0])
        for j in range(bits - 1, -1, -1):
            for i in range(n):
                key = (key << 1) | ((xs[i] >> j) & 1)
        return pd.Series(key)

    return pandas_udf(kernel, "long")(*[c.cast("long") for c in cs])


def hilbert_sort(df: DataFrame, cols: Sequence[str], bits: int = 12,
                 num_files: int | None = None) -> DataFrame:
    """``zorder_sort`` with the Hilbert key: min-max normalize, key,
    range-shuffle once at write time, sort within partitions."""
    bounds = df.agg(*[f for c in cols
                      for f in (F.min(c).alias(f"min_{c}"),
                                F.max(c).alias(f"max_{c}"))]).collect()[0]
    top = (1 << bits) - 1
    normed = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = max(int(hi) - int(lo), 1)
        normed.append(((F.col(c).cast("long") - F.lit(int(lo)))
                       * F.lit(top) / F.lit(span)).cast("long"))
    keyed = df.withColumn("__h", hilbert_key(normed, bits))
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (keyed.repartitionByRange(parts, "__h")
                 .sortWithinPartitions("__h")
                 .drop("__h"))


def pack_sequences(df: DataFrame, order_col: str, n_tok_col: str,
                   budget: int, by: Sequence[str] = ()) -> DataFrame:
    """GPT-style sequence packing map for LLM pretraining: documents are
    concatenated in ``order_col`` order into one token stream per
    ``by`` stratum and the stream is chunked every ``budget`` tokens;
    each document reports where its tokens land — ``start_tok`` (0-based
    offset in the stream), ``first_chunk``/``last_chunk`` (the training
    windows it straddles) and ``n_chunks``. This is the deterministic
    "which sample contains which document" map a data-curation pipeline
    materializes before tokenizer sharding.

    Scale shape: ONE cumulative-sum window partitioned by the stratum —
    no global sort when ``by`` is given (the 100 TB form: stratify by
    shard/lang so each partition's stream is independent; an unstratified
    call serializes and is for small corpora only). Integer arithmetic
    throughout, so the map is bit-identical on any engine/partitioning.
    """
    w = (Window.partitionBy(*by).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    n = F.col(n_tok_col).cast("long")
    cum = F.sum(n).over(w)
    first = F.floor((cum - n) / F.lit(budget)).cast("long")
    last = F.floor((cum - 1) / F.lit(budget)).cast("long")
    return df.select(
        *by, order_col,
        n.alias("n_tok"),
        (cum - n).alias("start_tok"),
        F.when(n > 0, first).alias("first_chunk"),
        F.when(n > 0, last).alias("last_chunk"),
        F.when(n > 0, last - first + 1).otherwise(0).alias("n_chunks"))


def chunk_documents(df: DataFrame, tokens_col: Column | str,
                    max_tokens: int, overlap: int,
                    keep: Sequence[str] = ("doc_id",)) -> DataFrame:
    """Overlapping token-window chunking — the RAG / context-window
    training-prep primitive: split each document's token array into
    windows of ``max_tokens`` tokens advancing by ``stride = max_tokens
    - overlap``, so consecutive chunks share ``overlap`` tokens and no
    token is dropped. Chunk count is the closed form
    ``k = max(1, ceil((n - overlap) / stride))`` — a document at or
    under one window yields exactly one chunk, and every non-first
    chunk carries more than ``overlap`` tokens (i.e. contributes new
    content). Emits one row per chunk: ``keep`` columns + ``chunk_id``
    (0-based), ``chunk_text`` (space-joined window) and
    ``n_chunk_tokens``.

    Scale shape: pure map-side — tokenize, one ``explode(sequence)``,
    per-row ``slice`` — no shuffle, no UDF, whole-stage codegen
    end-to-end; output rows ~= corpus_tokens / stride, produced
    streaming per input partition, so a 100 TB corpus chunks at scan
    throughput with zero cluster coordination. The token array is
    staged as a real column ONCE before the explode (the word_bigrams
    lesson: inlining the tokenizer into per-chunk expressions
    re-tokenizes the document per chunk — O(tokens^2) per row).

    The integer chunk-count division is truncating in Spark (`div`) and
    flooring in DuckDB (`//`); they agree here because the only inputs
    where the two differ (negative numerators, i.e. n <= overlap) are
    clamped by the ``greatest(1, ...)`` on both sides.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    staged = df.select(*keep, toks.alias("__ck_toks"))
    n = F.size(F.col("__ck_toks"))
    k = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(size(__ck_toks) - {overlap} + {stride - 1}) div {stride}"))
    return (staged
            .withColumn("__ck_n", n.cast("long"))
            .withColumn("chunk_id",
                        F.explode(F.sequence(F.lit(0).cast("long"), k - 1)))
            .select(
                *keep, "chunk_id",
                F.array_join(
                    F.slice(F.col("__ck_toks"),
                            (F.col("chunk_id") * stride + 1).cast("int"),
                            max_tokens),
                    " ").alias("chunk_text"),
                F.least(F.lit(max_tokens).cast("long"),
                        F.col("__ck_n") - F.col("chunk_id") * stride)
                 .alias("n_chunk_tokens")))
