#!/usr/bin/env python
"""CDC MERGE into a transactional parquet table (toy delta-log format).

Demonstrates the production sink for the CDC/MERGE operator family
(`merge_cdc_upsert` / `merge_cdc_with_deletes`): instead of returning a
merge-audit DataFrame, the changelog is MERGEd into an ACID table whose
state is defined by a JSON transaction log over immutable parquet files
(`bangdatapipeline_spark.sources.txn_table`).

What it shows, in order:

  1. CREATE the table from the customer snapshot (hash-bucketed on the
     merge key — the unit of copy-on-write).
  2. MERGE a CDC changelog (upserts + delete tombstones, latest-wins):
     only the buckets containing changed keys are rewritten; untouched
     files carry over by reference in the new commit.
  3. REPLAY the exact same merge (same app_id + batch version): a no-op
     — the txn stamp in the log makes re-delivery exactly-once, which is
     what a streaming foreachBatch caller relies on.
  4. A second batch advances the version and applies normally.

Run from the repo root:  python examples/cdc_txn_merge.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bangdatapipeline_spark.session import get_spark  # noqa: E402
from bangdatapipeline_spark.sources.txn_table import TxnTable  # noqa: E402
from bangdatapipeline_spark.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("cdc-txn-merge-example")
    path = os.path.join(tempfile.gettempdir(), f"txn_demo_{uuid.uuid4().hex[:8]}")

    base = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    table = TxnTable.create(spark, path, base, key_col="c_custkey", n_buckets=8)
    print(f"CREATE: {base.count()} rows, {len(table.snapshot())} data files")

    # CDC changelog: purchases upsert the balance, errors are tombstones;
    # keys straddle the base key range so all merge paths occur.
    ev = load_table(spark, SF_DIR, "events")
    shift = 140
    changelog = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        (F.col("user_id") + shift).alias("c_custkey"),
        F.concat(F.lit("cdc-"), F.col("user_id").cast("string")).alias("c_name"),
        F.round("value", 2).alias("c_acctbal"),
        (F.col("event_type") == "error").alias("is_delete"),
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        "event_id",
    )

    stats = table.merge_cdc(changelog, app_id="cdc-pipe", version=1)
    print(
        f"MERGE v1: touched buckets {stats['touched_buckets']}, "
        f"+{stats['files_added']} files, -{stats['files_removed']}, "
        f"{stats['files_carried']} carried untouched; "
        f"table now {table.read().count()} rows"
    )

    replay = table.merge_cdc(changelog, app_id="cdc-pipe", version=1)
    print(f"REPLAY v1: skipped={replay['skipped']} ({replay['reason']})")

    batch2 = changelog.withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1, 2)
    ).withColumn("ts_us", F.col("ts_us") + 1)
    stats2 = table.merge_cdc(batch2, app_id="cdc-pipe", version=2)
    print(
        f"MERGE v2: applied={not stats2['skipped']}, "
        f"last committed version = {table.last_txn_version('cdc-pipe')}"
    )

    print("\nfinal merge-key sample:")
    table.read().orderBy(F.col("c_custkey").desc()).show(5, truncate=False)

    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
