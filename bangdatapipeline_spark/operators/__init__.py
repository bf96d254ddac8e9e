"""Operator modules. Importing this package registers every query."""

from bangdatapipeline_spark.operators import (  # noqa: F401
    aggregates,
    functions,
    joins,
    llm_text,
    relational,
    reshape,
    setops,
    windows,
)
