"""File-source replay: re-run the `events` table as a stream.

Writes the (ts-normalized) events into N parquet chunk files in arrival
order, then reads them back with ``maxFilesPerTrigger=1`` so each chunk
becomes one micro-batch — a deterministic replay of the stream, including
out-of-order arrival when ``shuffled=True`` (the same LCG pseudo-shuffle
the ``stream_late`` batch diagnostic uses).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.operators.streaming_batch import ARRIVAL
from bangdatapipeline_spark.tables import load_table


def write_chunks(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 8,
    shuffled: bool = False,
    base_dir: str | None = None,
    df: DataFrame | None = None,
    order_col: str = "event_id",
) -> str:
    """Materialize events (or ``df``) as ``n_chunks`` single-file parquet
    chunks in arrival order (``order_col`` when not shuffled)."""
    out = os.path.join(
        base_dir or tempfile.gettempdir(), f"events_replay_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(out)
    ev = df if df is not None else load_table(spark, sf_dir, "events")
    order = F.expr(ARRIVAL) if shuffled else F.col(order_col)
    chunked = ev.withColumn("_chunk", F.ntile(n_chunks).over(Window.orderBy(order)))
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.parquet(os.path.join(out, f"chunk_{i:03d}"))
        )
    return out


def read_stream(spark: SparkSession, chunk_dir: str) -> DataFrame:
    """Open the chunk dir as a file-source stream, 1 chunk per micro-batch."""
    schema = spark.read.parquet(os.path.join(chunk_dir, "chunk_001")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*"))
    )


def run_stream(df: DataFrame, mode: str, name: str | None = None) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink and
    return the sink contents as a batch DataFrame."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(tempfile.gettempdir(), f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
