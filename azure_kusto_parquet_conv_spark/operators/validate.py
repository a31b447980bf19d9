"""Data-quality validation gate: declarative expectations evaluated in
ONE aggregate pass.

The landing step of a pipeline ("did this drop of files meet the
contract?") needs not-null / uniqueness / range / set-membership checks
before anything downstream runs. Each check compiles to a conditional
count inside a single `agg` — one scan for the whole suite, map-side
combinable, no per-check jobs (uniqueness is the exception: it needs its
own distinct aggregate, so it runs as a second count on the projected
key columns only).

Checks are (name, Column-predicate) pairs where the predicate marks a
VIOLATION; `validate` returns one row per check with its violation
count, and `expect` raises on any non-zero count — the CI-gate form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})",
            c.isNotNull() & ~c.between(lo, hi))


def accepted_values(col: str, values: Sequence) -> tuple[str, Column]:
    c = F.col(col)
    return (f"accepted_values({col})",
            c.isNotNull() & ~c.isin(list(values)))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return (f"matches({col})", c.isNotNull() & ~c.rlike(pattern))


def validate(df: DataFrame, checks: Sequence[tuple[str, Column]],
             unique: Sequence[str] | None = None) -> DataFrame:
    """One row per check: (check, n_violations). All predicate checks
    share a single aggregate pass; the optional ``unique`` key adds one
    distinct-count comparison on the projected keys."""
    aggs = [F.sum(F.when(pred, 1).otherwise(0)).cast("long")
            .alias(f"_c{i}") for i, (_, pred) in enumerate(checks)]
    wide = df.agg(*aggs)
    # melt via explicit structs: check names are free text (dots, commas)
    # that unpivot would misparse as qualified column names
    pairs = [F.struct(F.lit(name).alias("check"),
                      F.col(f"_c{i}").alias("n_violations"))
             for i, (name, _) in enumerate(checks)]
    long = (wide.select(F.explode(F.array(*pairs)).alias("r"))
                .select("r.check", "r.n_violations"))
    if unique:
        dup = (df.groupBy(*unique).count().where(F.col("count") > 1)
                 .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                       .cast("long").alias("n_violations"))
                 .select(F.lit(f"unique({','.join(unique)})").alias("check"),
                         "n_violations"))
        long = long.unionByName(dup)
    return long


class ValidationError(AssertionError):
    pass


def expect(df: DataFrame, checks: Sequence[tuple[str, Column]],
           unique: Sequence[str] | None = None) -> None:
    """CI-gate form: raise ValidationError listing every failed check."""
    failed = [(r["check"], r["n_violations"])
              for r in validate(df, checks, unique).collect()
              if r["n_violations"] > 0]
    if failed:
        raise ValidationError(
            "; ".join(f"{c}: {n} violations" for c, n in failed))


def drift_report(old: DataFrame, new: DataFrame,
                 columns: Sequence[str] | None = None) -> DataFrame:
    """Snapshot-to-snapshot drift: per-column (count, null-rate, min,
    max, mean for numerics) for two versions of a table, joined into one
    row per column with both sides — the check before promoting a new
    data drop ("did the distribution move?"). One aggregate pass PER
    SNAPSHOT regardless of column count; schema-only columns (added /
    removed) appear with nulls on the missing side."""
    def profile(df: DataFrame, side: str) -> DataFrame:
        cols = [c for c in (columns or df.columns)]
        rows = []
        aggs = []
        for i, c in enumerate(cols):
            dt = dict(df.dtypes)[c]
            numeric = dt in ("int", "bigint", "double", "float",
                             "smallint", "tinyint") or dt.startswith(
                                 "decimal")
            aggs += [F.count("*").cast("long").alias(f"_n{i}"),
                     F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                      .cast("long").alias(f"_z{i}")]
            if numeric:
                aggs += [F.min(c).cast("double").alias(f"_lo{i}"),
                         F.max(c).cast("double").alias(f"_hi{i}"),
                         F.round(F.avg(F.col(c).cast("double")), 6)
                          .alias(f"_mu{i}")]
        wide = df.agg(*aggs)
        for i, c in enumerate(cols):
            dt = dict(df.dtypes)[c]
            numeric = dt in ("int", "bigint", "double", "float",
                             "smallint", "tinyint") or dt.startswith(
                                 "decimal")
            rows.append(F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n{i}").alias(f"{side}_count"),
                F.round(F.col(f"_z{i}") / F.col(f"_n{i}"), 6)
                 .alias(f"{side}_null_rate"),
                (F.col(f"_lo{i}") if numeric else F.lit(None)
                 .cast("double")).alias(f"{side}_min"),
                (F.col(f"_hi{i}") if numeric else F.lit(None)
                 .cast("double")).alias(f"{side}_max"),
                (F.col(f"_mu{i}") if numeric else F.lit(None)
                 .cast("double")).alias(f"{side}_mean")))
        return (wide.select(F.explode(F.array(*rows)).alias("r"))
                    .select("r.*"))

    return profile(old, "old").join(profile(new, "new"), "column", "full")
