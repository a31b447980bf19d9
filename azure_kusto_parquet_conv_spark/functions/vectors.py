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


def unit(a: Column | str, bind_once: bool = True) -> Column:
    """L2-normalize -> array<double>; pre-normalizing the corpus once turns
    per-pair cosine into a plain dot product (the at-scale pattern).

    Default form: the norm is bound ONCE through a single-element
    transform scope (the repo's bind-once hop) — an expression embedded
    in a SQL lambda body is re-evaluated PER ELEMENT by the interpreted
    evaluator, so the naive ``transform(a, x -> x / norm(a))`` costs
    O(dim^2) interpreted evals per row (measured ~2x on the LSH corpus
    scan at sf0.1). Same divisions by the same norm double, so results
    are bit-identical between the two forms.

    ``bind_once=False`` keeps the naive shape and MUST be used when the
    result feeds a Python UDF argument: the r9 gotcha class strikes
    again here — a PythonUDF whose argument inlines the
    element_at(transform(array(named_struct(...)))) hop intermittently
    fails UDF extraction and dies with INTERNAL_ERROR "Cannot evaluate
    expression: PythonUDF" on repeat executions (reproduced with the
    IVF assignment UDF; pinned by
    tests/test_similarity.py::test_knn_ivf_stable_across_reruns)."""
    ca = _col(a)
    n = norm(a)
    if not bind_once:
        return F.when(n > 0,
                      F.transform(ca, lambda x: x.cast("double") / n))
    return F.element_at(
        F.transform(
            F.array(F.struct(n.alias("n"), ca.alias("a"))),
            lambda s: F.when(
                s["n"] > 0,
                F.transform(s["a"], lambda x: x.cast("double") / s["n"]))),
        1)
