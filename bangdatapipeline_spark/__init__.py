"""bangdatapipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of StanfordHCI/bangdatapipeline (a pandas ETL client for
experiment batch data), extended with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and designed
for 100 TB scale: every operator is declared as DataFrame transformations
so Catalyst/Tungsten/AQE choose the physical plan; no driver-side loops,
no collects inside operators, broadcast hints only where a side is
provably dimension-sized.

Layout:
    session.py   — SparkSession configuration (runtime-settable; works on a
                   driver-provided session too)
    tables.py    — canonical table loader (nanos-timestamp normalization)
    registry.py  — the query registry: each operator = Spark callable +
                   DuckDB oracle SQL (the correctness contract)
    operators/   — operator implementations grouped by family (SURVEY.md §2)
    streaming/   — Structured Streaming variants of the §2.11 operators
"""

from bangdatapipeline_spark.registry import REGISTRY, register
from bangdatapipeline_spark.session import configure_session, get_spark
from bangdatapipeline_spark.tables import TABLES, load_tables, register_views

__all__ = [
    "REGISTRY",
    "TABLES",
    "configure_session",
    "get_spark",
    "load_tables",
    "register",
    "register_views",
]
