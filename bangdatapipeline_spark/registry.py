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


def query_hash(q: Query) -> str:
    """Evidence fingerprint for a registered query: md5 of the Spark
    function's source text plus its oracle SQL.

    Green CORRECTNESS evidence is only evidence FOR THE CODE THAT RAN —
    a key rewritten after its last green round must re-verify, which the
    age-based rotation alone cannot see (VERDICT r8: three r8 rewrites
    shipped on pre-rewrite evidence). The sweep harness records this
    fingerprint with each green result (scripts/green_hashes.json);
    ``__spark_entry__`` drops any key whose CURRENT fingerprint differs
    from its last-green one into the re-verify tier.

    Limitation (documented, accepted by the verdict's prescription): the
    fingerprint covers the registered function's own source and the
    oracle string as registered. A behavior change hidden entirely in a
    shared helper the function calls at runtime would not move the
    Spark-side hash — but any parity-relevant change must touch the
    oracle too (both sides change together by the registry's rules), and
    oracle strings are baked at registration time, so helper-driven
    oracle changes DO move the hash.
    """
    import hashlib
    import inspect

    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):  # builtins / REPL-defined: fall back
        src = repr(q.fn)
    return hashlib.md5((src + (q.oracle or "")).encode()).hexdigest()
