"""The query registry — the correctness contract.

Every operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when the semantics
are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. The driver
(and our local self-check in tests/) runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash.

Rules every registered query follows (SURVEY.md §4.4):
  * every computed column is aliased IDENTICALLY on both sides;
  * every floating aggregate is rounded IDENTICALLY on both sides
    (makes the hash deterministic across engines/partitionings);
  * every LIMIT/top-k has a unique tie-break sort key;
  * no ``dropDuplicates`` in hash-checked paths (nondeterministic keeper);
  * timestamps are naive (timestamp_ntz / DuckDB TIMESTAMP) at µs precision.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``key`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = Query(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all operator modules (side effect: registration) and return REGISTRY."""
    import bangdatapipeline_spark.operators  # noqa: F401

    return REGISTRY
