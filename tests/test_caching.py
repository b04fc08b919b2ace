"""tracked_persist / release_cached registry behavior."""

from __future__ import annotations

from bio2bel_spark.operators.caching import release_cached, tracked_persist


def test_release_cached_unpersists_only_tracked(spark):
    tracked = tracked_persist(spark.range(10))
    own = spark.range(5).cache()
    tracked.count(), own.count()
    assert tracked.storageLevel.useMemory
    assert release_cached(spark) == 1
    assert not tracked.storageLevel.useMemory
    # the caller's own cache survives (unlike catalog.clearCache)
    assert own.storageLevel.useMemory
    own.unpersist()
    # registry drained: second release is a no-op
    assert release_cached(spark) == 0


def test_operator_persists_are_tracked(spark, tables):
    from bio2bel_spark.operators.dedup import _banded_buckets

    release_cached(spark)
    banded = _banded_buckets(
        tables["documents"].limit(50), "text", "doc_id",
        n_hashes=16, bands=4, backend="md5",
    )
    banded.count()
    assert release_cached(spark) >= 1
