"""Canonical table loader.

The reference (a pandas ETL client) fetches nested JSON from a REST API,
caches it, and flattens to DataFrames. Our engine's canonical store is
parquet (the driver's testdata), read declaratively so Catalyst gets
predicate pushdown + column pruning on the scan for free.

Scale notes (100 TB posture):
  * Each table is a plain ``spark.read.parquet`` — on a cluster the same
    call reads a partitioned directory layout; nothing here assumes a
    single file.
  * ``load_tables`` returns *lazy* DataFrames; no materialization happens
    at load time, so the full pipeline stays one Catalyst plan.
  * The ``events.ts`` nanos normalization is a projection (cast), which
    Spark pushes below nothing but also costs nothing — it stays inside
    whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.caches import session_key
from bangdatapipeline_spark.session import configure_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# DataFrame-plan cache: a DataFrame is an immutable logical plan, so reusing
# one per (session, dir, table) skips the repeated file-listing + footer-read
# job that otherwise taxes every small query with ~100 ms of fixed overhead.
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing the events nanos timestamp.

    ``events.parquet`` is TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as bigint ns;
    ``timestamp_micros(ts div 1000)`` truncates ns->us exactly the way
    DuckDB reads the same file (verified equal at the microsecond), and the
    cast to timestamp_ntz (under a UTC session tz) makes it comparable with
    DuckDB's naive TIMESTAMP.
    """
    key = (session_key(spark), sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Depending on the Spark build, parquet TIMESTAMP(NANOS) arrives
        # either as bigint ns (legacy nanosAsLong path) or natively as
        # timestamp_ntz truncated to microseconds. Both normalize to the
        # same us-precision timestamp_ntz DuckDB produces for this file
        # (verified equal at the microsecond on both paths).
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        elif ts_type == "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _df_cache[key] = df
    return df


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition to the session's default parallelism.

    The driver's tables are single-row-group parquet files, so a scan —
    and every operator FUSED into its stage, up to the first exchange —
    runs as one task no matter how many cores the session has. For
    queries whose scan stage carries heavy per-row work (tokenization,
    replicate explosion, wide product aggregations) that single task IS
    the wall clock. Spreading the narrow projected input first costs one
    small shuffle and parallelizes everything downstream (guide §2.5:
    "one huge unsplittable file -> repartition immediately after the
    read"). Scale-adaptive by construction: the width tracks
    ``defaultParallelism`` (the driver benches several core counts), and
    on a cluster reading many >=row-group files the same call is a
    cheap rebalance rather than a correctness hazard. Apply it to the
    PROJECTED few-column input, never the full-width row.

    With ``keys``, partitions by a DETERMINISTIC synthetic hash key —
    ``pmod(xxhash64(keys), 100 * N)`` (100x distinct values per
    partition so the hash spreads evenly; guide §2.5's exact recipe) —
    instead of round-robin. Measured ~2x cheaper on the map side:
    every keyless ``repartition(n)`` first pays a local sort of its
    input (``spark.sql.execution.sortBeforeRepartition``, on so task
    retries reproduce the same row placement), and on a single-task
    600k-row scan stage that sort IS most of the spread's cost
    (0.66 s -> 0.29 s exchange, ship-delay CDF 1.33 s -> 0.71 s).
    The data-derived key is retry-safe without the sort (re-run tasks
    rehash identical inputs to identical partitions — the SPARK-38388
    hazard only afflicts rand()-derived keys). Pass a high-cardinality,
    non-null column (a primary id); keyless round-robin stays for
    callers with no such column."""
    from pyspark.sql import functions as F

    n = df.sparkSession.sparkContext.defaultParallelism
    if keys:
        return df.repartition(
            n, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(100 * n))
        )
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables as a dict of lazy DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
