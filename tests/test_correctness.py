"""Replicates the driver's t2 gate locally: every registered query vs its
DuckDB oracle at the driver's correctness scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from bangdatapipeline_spark.registry import load_all
from tests.oracle import compare_query

REGISTRY = load_all()


@pytest.mark.sweep
@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, key):
    ok, msg = compare_query(spark, REGISTRY[key], sf_dir)
    assert ok, f"{key}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_registry_contract():
    """Every oracle is non-empty SQL; keys are snake_case."""
    for key, q in REGISTRY.items():
        assert key.replace("_", "").isalnum()
        if q.oracle is not None:
            assert "select" in q.oracle.lower()


def test_bench_keys_all_registered():
    """Every bench entry must point at a registered query (guards key
    drift between bench.py and the registry) and metric names are
    unique."""
    import bench

    metrics = [m for m, _ in bench.BENCH_QUERIES]
    assert len(metrics) == len(set(metrics))
    missing = [k for _, k in bench.BENCH_QUERIES if k not in REGISTRY]
    assert not missing, missing
