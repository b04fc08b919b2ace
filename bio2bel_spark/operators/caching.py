"""Tracked persistence for operator intermediates.

Several multi-consumer plans (LSH banding, embedding near-pair buckets,
PageRank iterations, node-index joins) persist a narrow intermediate so it
is computed once instead of once per consumer. Those blocks stay pinned in
executor memory after the query's action finishes — harmless for one query,
but a session that runs the whole 89-query registry accumulates dozens of
dead MEMORY_AND_DISK blocks that squeeze live shuffles at scale.

Every operator persist goes through :func:`tracked_persist`, which records a
weak reference per session; :func:`release_cached` unpersists everything the
library pinned in that session — and ONLY that, so a caller's own ``cache()``
data survives (unlike ``spark.catalog.clearCache()``). The bench harness
calls it between queries; long-lived applications should call it whenever a
query's results have been fully consumed.

Weak references keep the registry from leaking plans: a DataFrame that was
garbage-collected has already had its blocks released by the ContextCleaner,
so dead entries are simply dropped.
"""

from __future__ import annotations

import weakref

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

__all__ = ["tracked_persist", "release_cached"]

_REGISTRY: "weakref.WeakKeyDictionary[SparkSession, list]" = (
    weakref.WeakKeyDictionary()
)


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)``, recorded for later :func:`release_cached`."""
    df = df.persist(level)
    _REGISTRY.setdefault(df.sparkSession, []).append(weakref.ref(df))
    return df


def release_cached(spark: SparkSession) -> int:
    """Unpersist every block this library pinned in ``spark``.

    Returns the number of DataFrames released. Non-blocking unpersist: the
    executors drop blocks asynchronously, the plans stay valid (re-running
    them just recomputes).
    """
    refs = _REGISTRY.pop(spark, [])
    released = 0
    for ref in refs:
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:  # noqa: BLE001 — a stopped session is fine
            pass
    return released
