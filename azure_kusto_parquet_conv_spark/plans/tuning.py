"""Runtime tuning helpers: scoped conf changes and runtime-filter
(Bloom) join setup.

Spark's InjectRuntimeFilter rule builds a Bloom filter over the join
keys of a *selective* dimension side and pushes a ``might_contain``
probe into the fact-side scan — a semi-join pre-filter that kills most
fact rows before the shuffle. At 100 TB this is the difference between
shuffling the full fact table and shuffling only the ~matching slice.
The rule only fires above size thresholds tuned for clusters, so local
tests (and small dims) must lower them explicitly; production keeps the
defaults.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_UNSET = object()


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Temporarily apply runtime confs; always restore previous values.

    Needed because session confs are process-global: an operator that
    mutated them would silently re-plan every other query in the session.
    """
    saved: dict[str, object] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = _UNSET
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, prev in saved.items():
            if prev is _UNSET:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)


def bloom_join_confs(
    creation_side_threshold: str = "10GB",
    application_side_threshold: str = "0",
) -> dict[str, str]:
    """Confs that let InjectRuntimeFilter build a Bloom filter from a
    selective dim (creation side up to ``creation_side_threshold``) and
    probe it on any fact scan (``application_side_threshold`` floor).

    Broadcast joins already imply an exact runtime filter, so the Bloom
    path matters exactly when the dim is too big to broadcast but still
    selective — pair with autoBroadcastJoinThreshold=-1 in tests to
    demonstrate.
    """
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            application_side_threshold,
    }
