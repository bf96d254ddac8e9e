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

# round-4 additions, imported LAST on purpose: registration order feeds the
# driver's self-steering correctness window (never-checked keys sort first
# within their tier by insertion index), so new keys appending here land at
# the tail and never displace an already-soaked window prefix mid-round.
from bangdatapipeline_spark.operators import (  # noqa: E402,F401
    dataquality,
    layout_ops,
)

# round-8 additions (same tail-append contract as above).
from bangdatapipeline_spark.operators import (  # noqa: E402,F401
    inference,
    privacy,
)
