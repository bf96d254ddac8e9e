"""Operator modules. Importing this package registers every query."""

from bangdatapipeline_spark.operators import (  # noqa: F401
    aggregates,
    curation,
    dedup_near,
    functions,
    graph_analytics,
    incremental,
    joins,
    llm_text,
    multimodal,
    relational,
    reshape,
    sampling,
    setops,
    similarity,
    streaming_batch,
    timeseries,
    tpch_sql,
    udfs,
    windows,
)
