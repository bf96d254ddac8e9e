"""Custom Python DataSource (Spark 4 API): the Bang REST-cache connector.

The reference's ingestion boundary is a directory of fetched batch JSON
documents (its REST cache — SURVEY §3.1 step 1). ``spark.read.json`` covers
the plain case (bang.load_batches); this module shows the same cache dir as
a FIRST-CLASS Spark connector via the Python DataSource API new in Spark 4
(`pyspark.sql.datasource`): one cache file = one InputPartition, so a
1000-file cache reads as 1000 parallel tasks with per-file Python-side
parsing on the EXECUTORS (not the driver), and the connector surfaces
summary columns (round/team/message counts) without materializing the
nested tree at all.

This is the template for connectors Spark has no built-in reader for
(bespoke REST caches, internal formats): implement ``partitions()`` to
enumerate work units and ``read(partition)`` to yield rows, register the
class once per session, and the source composes with every downstream
DataFrame op. Predicate pushdown/column pruning do NOT cross the Python
boundary — keep connector output narrow (summary/metadata columns, as
here) and canonicalize to parquet for anything queried repeatedly
(sources.canonicalize_parquet).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("template", StringType()),
        StructField("team_size", IntegerType()),
        StructField("n_users", IntegerType()),
        StructField("n_rounds", IntegerType()),
        StructField("n_teams", IntegerType()),
        StructField("n_messages", IntegerType()),
        StructField("file", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BangCacheDataSource(DataSource):
    """``spark.read.format("bangcache").option("path", dir).load()`` —
    one row of batch-level summary per cached document."""

    @classmethod
    def name(cls) -> str:
        return "bangcache"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> "BangCacheReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("bangcache requires .option('path', <cache dir>)")
        return BangCacheReader(path)


class BangCacheReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):  # driver side: enumerate work units only
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".json")
        )
        return [_FilePartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition: _FilePartition):  # executor side: parse one file
        with open(partition.path) as f:
            doc = json.load(f)
        rounds = doc.get("rounds") or []
        teams = [t for r in rounds for t in (r.get("teams") or [])]
        yield (
            doc.get("batch_id"),
            doc.get("template"),
            doc.get("team_size"),
            len(doc.get("users") or []),
            len(rounds),
            len(teams),
            sum(len(t.get("chat") or []) for t in teams),
            os.path.basename(partition.path),
        )


def register(spark) -> None:
    """Register the connector on a session (idempotent per session)."""
    spark.dataSource.register(BangCacheDataSource)
