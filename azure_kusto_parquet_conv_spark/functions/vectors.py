"""Vector kernels over ``array<float>`` embedding columns.

JVM-side expressions (zip_with + aggregate) — no Python in the row path.
At 100 TB scale these run inside whole-stage codegen next to the scan; the
similarity-search operators (operators/similarity.py) build on them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        _col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null/zero-norm inputs -> null."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn > 0, d / nn)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(_col(a), _col(b),
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def unit(a: Column | str) -> Column:
    """L2-normalize -> array<double>; pre-normalizing the corpus once turns
    per-pair cosine into a plain dot product (the at-scale pattern)."""
    n = norm(a)
    return F.when(n > 0, F.transform(_col(a), lambda x: x.cast("double") / n))
