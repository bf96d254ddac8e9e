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


_PKG = "bangdatapipeline_spark"


def _code_names(code) -> set[str]:
    """All global/free names referenced by a code object, including
    inside nested lambdas/comprehensions (their code rides in co_consts)."""
    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        names.update(c.co_freevars)
        for const in c.co_consts:
            if hasattr(const, "co_names"):
                stack.append(const)
    return names


def _walk_fingerprint(fn, seen: set[str], parts: list[str]) -> None:
    """DFS over ``fn`` and every IN-PACKAGE function/class/constant it
    references by name (directly or via an in-package module alias),
    appending each one's source (or ``name=repr`` for simple constants)
    to ``parts``. Deterministic: sorted name iteration + a seen-set."""
    import inspect

    ident = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', '?')}"
    if ident in seen:
        return
    seen.add(ident)
    try:
        parts.append(inspect.getsource(fn))
    except (OSError, TypeError):  # builtins / REPL-defined: fall back
        parts.append(repr(fn))
        return
    code = getattr(fn, "__code__", None)
    if code is None:
        return
    # default argument values bind at def time (``bits=_Z_BITS`` stores 8,
    # not the name), so capture simple-constant defaults by value.
    for d in getattr(fn, "__defaults__", None) or ():
        if isinstance(d, (bool, int, float, str, bytes, tuple, frozenset)):
            parts.append(f"default={d!r}")
    kwd = getattr(fn, "__kwdefaults__", None) or {}
    for k in sorted(kwd):
        if isinstance(kwd[k], (bool, int, float, str, bytes, tuple, frozenset)):
            parts.append(f"default:{k}={kwd[k]!r}")
    names = _code_names(code)
    g = getattr(fn, "__globals__", {})
    closure = dict(zip(code.co_freevars, getattr(fn, "__closure__", None) or ()))
    # attribute access through an in-package module alias (``mod.helper``)
    # puts both the alias and the attr in co_names — search those
    # modules' namespaces too.
    namespaces = [g]
    for n in sorted(names):
        v = g.get(n)
        if inspect.ismodule(v) and (getattr(v, "__name__", "") or "").startswith(_PKG):
            namespaces.append(vars(v))
    resolved = {}
    for n in names:
        if n in closure:
            try:
                resolved[n] = closure[n].cell_contents
            except ValueError:
                pass
            continue
        for ns in namespaces:
            if n in ns:
                resolved[n] = ns[n]
                break
    for n in sorted(resolved):
        v = resolved[n]
        if inspect.isfunction(v) and (getattr(v, "__module__", "") or "").startswith(_PKG):
            _walk_fingerprint(v, seen, parts)
        elif inspect.isclass(v) and (getattr(v, "__module__", "") or "").startswith(_PKG):
            cident = f"{v.__module__}.{v.__qualname__}"
            if cident not in seen:
                seen.add(cident)
                try:
                    parts.append(inspect.getsource(v))
                except (OSError, TypeError):
                    parts.append(repr(v))
        elif isinstance(v, (bool, int, float, str, bytes, tuple, frozenset)):
            parts.append(f"{n}={v!r}")


def fingerprint_material(q: Query) -> str:
    """The exact text ``query_hash`` digests — exposed so tests can pin
    that helper sources and constants are actually inside it."""
    parts: list[str] = []
    _walk_fingerprint(q.fn, set(), parts)
    return "\n".join(parts) + (q.oracle or "")


def query_hash(q: Query) -> str:
    """Evidence fingerprint for a registered query: md5 of the Spark
    function's source text, the source of every in-package helper it
    (transitively) references, the repr of every module-level constant
    it reads, and its oracle SQL.

    Green CORRECTNESS evidence is only evidence FOR THE CODE THAT RAN —
    a key rewritten after its last green round must re-verify, which the
    age-based rotation alone cannot see (VERDICT r8: three r8 rewrites
    shipped on pre-rewrite evidence). The sweep harness records this
    fingerprint with each green result (scripts/green_hashes.json);
    ``__spark_entry__`` drops any key whose CURRENT fingerprint differs
    from its last-green one into the re-verify tier.

    r10 (ADVICE): the fingerprint now walks ``fn.__globals__`` for
    transitively-called in-package callees (functions, classes, module
    aliases, simple constants), closing the r9 blind spot where moving a
    kernel into a shared helper froze its consumers' fingerprints. A
    formula change invalidates recorded hashes by construction, so
    ``scripts/refresh_green_hashes.py`` applies THIS live formula to the
    evidence commit's source (see its docstring) — never an inlined copy.
    """
    import hashlib

    return hashlib.md5(fingerprint_material(q).encode()).hexdigest()
