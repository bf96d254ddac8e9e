"""Sources & sinks (SURVEY.md §2.1) — the reference's ETL boundary on Spark.

The reference fetches nested JSON batches from a REST API, caches them on
disk, flattens to DataFrames, and exports CSV. The Spark-native shape:

  raw JSON (cache dir) --spark.read.json--> DataFrame
      --write.parquet--> canonical columnar store (partitioned)
      --read.parquet--> all downstream queries (predicate/column pushdown)
      --write.csv--> notebook deliverable

At 100 TB: JSON is read once and canonicalized to partitioned, compressed
parquet — every downstream query then scans only the columns/partitions it
needs. Partition column choice (here `lang`; in general a low-cardinality,
filter-frequent key like date) bounds file counts while enabling partition
pruning. The REST fetch itself is out of scope offline (the cache dir is
the interface; on a cluster the same dir lives on S3/HDFS).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def ingest_json(
    spark: SparkSession, cache_dir: str, schema: StructType | None = None
) -> DataFrame:
    """Read a JSON cache directory (one doc per line / multiLine files).

    Pass an explicit schema in production: schema inference scans the data
    twice and silently widens types.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(cache_dir)


def canonicalize_parquet(
    df: DataFrame, out_dir: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Write the canonical parquet store, optionally hive-partitioned.

    Partitioned writes first repartition on the partition columns so each
    task writes to few partition dirs — without this, every task writes a
    file into every partition (tasks × partitions small files at 100 TB).
    """
    w = df
    if partition_by:
        w = df.repartition(*[F.col(c) for c in partition_by])
    writer = w.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)


def export_csv(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """CSV export (the reference's notebook deliverable)."""
    df.write.mode(mode).option("header", True).csv(out_dir)


def flatten_batch(raw: DataFrame) -> DataFrame:
    """Flatten a nested batch document (batch -> rounds[] -> users[]) into
    one row per (batch, round, user) — the reference's json_normalize
    step as explode + struct expansion."""
    return (
        raw.select("batch_id", F.explode("rounds").alias("r"))
        .select("batch_id", F.col("r.round_id").alias("round_id"), F.explode("r.users").alias("u"))
        .select("batch_id", "round_id", "u.*")
    )


def read_partitioned(spark: SparkSession, root: str) -> DataFrame:
    """Read a hive-partitioned parquet layout (partition pruning applies
    when filtering on the partition column)."""
    return spark.read.parquet(root)


def partition_files(root: str) -> dict[str, int]:
    """Count data files per partition dir (layout introspection helper)."""
    out: dict[str, int] = {}
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and "=" in entry:
            out[entry] = sum(f.endswith(".parquet") for f in os.listdir(p))
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed + per-bucket-sorted parquet table (hash-bucketed
    on ``bucket_cols``).

    Bucketing pre-pays the join/agg shuffle at write time: two tables
    bucketed on the same key with the same bucket count sort-merge-join
    with NO Exchange and NO per-query Sort — the layout carries the
    hash-partitioning + order guarantee. At 100 TB this converts every
    recurring fact-fact join on the bucket key from a full-data shuffle
    into a zero-movement merge; the write-side cost is one repartition,
    paid once. (Plan property asserted in tests/test_plans.py.)

    The leading repartition guarantees exactly ONE file per bucket
    (repartition's hash partitioning and the bucket-id hash are the same
    murmur3-pmod), which is the invariant that makes it safe to also set
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` and elide
    the per-query Sorts — Spark stopped trusting bucket sort order by
    default (Spark 3.0) precisely because multi-file buckets break it.
    """
    (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def upsert_partitions(df: DataFrame, out_dir: str, partition_by: list[str]) -> None:
    """Idempotent partition-level upsert: overwrite ONLY the hive
    partitions present in ``df``, leaving sibling partitions untouched
    (``partitionOverwriteMode=dynamic`` scoped to this write).

    This is the batch backfill/re-run primitive at 100 TB: recompute one
    day (or one (day, lang) cell) and land it atomically per partition —
    re-running the same job replaces the same partitions instead of
    duplicating or truncating the table. The mode is set per-write via
    DataFrameWriter option, not session-wide, so concurrent static
    overwrites keep their semantics.
    """
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(out_dir)
    )
