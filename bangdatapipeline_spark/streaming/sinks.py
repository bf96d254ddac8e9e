"""Streaming sinks: exactly-once parquet output via foreachBatch.

Structured Streaming's file sink is append-only; for sinks that need
upsert/merge or transactional rewrite the standard pattern is
``foreachBatch`` + idempotent-by-batchId writes: each micro-batch lands in
its own ``batch_id=N`` directory with overwrite mode, so a replayed batch
(failure between write and checkpoint commit) overwrites its own earlier
attempt instead of duplicating rows. Combined with the checkpoint, the
sink is effectively exactly-once end to end.

At cluster scale the same hook is where MERGE INTO (Delta/Iceberg) or a
JDBC transactional upsert goes — the contract foreachBatch gives is
"(batch_df, batch_id), called once per micro-batch, replays possible,
same batch_id on replay".
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def exactly_once_parquet_sink(df: DataFrame, target: str | None = None):
    """Start a streaming write of ``df`` where each micro-batch overwrites
    its own ``batch_id=N`` partition directory. Returns (query, target).

    Idempotence: re-delivery of batch N rewrites batch_id=N in place —
    asserted in tests by invoking the batch function twice with the same
    id.
    """
    target = target or os.path.join(
        tempfile.gettempdir(), f"eo_sink_{uuid.uuid4().hex[:8]}"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(target, f"batch_id={batch_id}"))
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"ckpt_eo_{uuid.uuid4().hex[:8]}"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q, target


def read_sink(spark: SparkSession, target: str) -> DataFrame:
    """Read everything the exactly-once sink has committed."""
    return spark.read.option("basePath", target).parquet(
        os.path.join(target, "batch_id=*")
    )
