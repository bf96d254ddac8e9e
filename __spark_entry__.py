"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All three functions delegate to the engine's query registry
(bangdatapipeline_spark.registry) — one source of truth shared with
tests/ and bench.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bangdatapipeline_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["agg_groupby"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: q.fn for key, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every key in ``queries()`` — the full
    registry is hash-checked (the LSH/IVF approximate-NN pipelines use
    deterministic arithmetic codebooks, replicated in SQL).
    """
    return {key: q.oracle for key, q in load_all().items() if q.oracle is not None}
