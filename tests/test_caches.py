"""Cache-hygiene contract: caches.release() must drop every engine-cached
relation AND leave every operator fully functional (memo registries
re-cache on next use), so a long-running host session can call it
between queries to keep its heap bounded."""

from __future__ import annotations

from bangdatapipeline_spark import caches
from bangdatapipeline_spark.operators import graph_analytics as ga

from tests.conftest import SMOKE_SF_DIR


def _n_cached(spark) -> int:
    jcm = spark._jsparkSession.sharedState().cacheManager()
    return 0 if jcm.isEmpty() else 1


def test_release_drops_blocks_and_memos(spark):
    before = ga.graph_triangles(spark, SMOKE_SF_DIR).collect()
    assert ga._op_cache and ga._oriented_cache  # memoized by the run
    assert _n_cached(spark) == 1  # CacheManager holds engine relations

    caches.release(spark)
    assert _n_cached(spark) == 0
    assert not ga._op_cache
    assert not ga._oriented_cache
    assert not ga._adj_cache

    # operators keep working and re-memoize after a release
    after = ga.graph_triangles(spark, SMOKE_SF_DIR).collect()
    assert after == before
    assert ga._op_cache and _n_cached(spark) == 1


def test_release_if_pressured_threshold(spark):
    """Below-threshold headroom triggers a release (forced by an
    impossible threshold); ample headroom does not (threshold 0)."""
    frac = caches.free_heap_fraction(spark)
    assert 0.0 < frac < 1.0
    assert caches.release_if_pressured(spark, min_free_fraction=0.0) is False
    assert caches.release_if_pressured(spark, min_free_fraction=1.01) is True
    assert _n_cached(spark) == 0
