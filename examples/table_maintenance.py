#!/usr/bin/env python
"""Storage-layout maintenance walkthrough — the ops loop a 100 TB table
actually lives by, end to end on the test data:

  1. PLAN    — layout_compaction_plan: metadata-only FFD bin-packing of
               small files into target-size rewrite groups.
  2. REWRITE — TxnTable OPTIMIZE: copy-on-write compaction commit; the
               table is row-identical before/after, re-running is a
               no-op (idempotent maintenance).
  3. SKIP    — layout_zonemap_skip vs layout_file_bloom: zone maps prune
               range predicates on layout-correlated columns; Bloom
               filters prune point lookups on UNcorrelated ones — the
               two complementary data-skipping indexes parquet footers
               carry.
  4. PRUNE   — layout_partition_prune: hive partitioning turns a date
               predicate into a directory-listing filter.
  5. PRE-PAY — layout_bucketed_join: bucketing pays the fact-fact join
               shuffle once at write time; the nightly join runs as a
               zero-Exchange sort-merge join.

Run from the repo root:  python examples/table_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("table-maintenance", cpus="8")
    reg = load_all()

    print("== 1. compaction PLAN (metadata only — one row per file) ==")
    plan = reg["layout_compaction_plan"].fn(spark, SF_DIR)
    plan.orderBy("source", "bin_id", "file_id").show(8, truncate=False)
    summary = plan.groupBy().agg(
        F.countDistinct("source", "file_id").alias("files_in"),
        F.countDistinct("source", "bin_id").alias("bins_out"),
    )
    summary.show()

    print("== 2. transactional OPTIMIZE (copy-on-write, idempotent) ==")
    reg["txn_optimize_table"].fn(spark, SF_DIR).orderBy("source").show()

    print("== 3a. zone maps: the DATE predicate prunes (layout-correlated) ==")
    zm = reg["layout_zonemap_skip"].fn(spark, SF_DIR)
    zm.groupBy().agg(
        F.count(F.lit(1)).alias("files"),
        F.sum(F.when(F.col("skip_date"), 1).otherwise(0)).alias("skipped_by_date"),
        F.sum(F.when(F.col("skip_price"), 1).otherwise(0)).alias("skipped_by_price"),
    ).show()

    print("== 3b. file blooms: POINT lookups prune where zone maps can't ==")
    reg["layout_file_bloom"].fn(spark, SF_DIR).orderBy("probe_key").show()

    print("== 4. hive-partition pruning (date range -> 5 of 30 dirs) ==")
    reg["layout_partition_prune"].fn(spark, SF_DIR).orderBy("day").show()

    print("== 5. bucketed (pre-paid-shuffle) join ==")
    reg["layout_bucketed_join"].fn(spark, SF_DIR).orderBy(
        "segment", "order_year"
    ).show(8)

    print("maintenance walkthrough complete")


if __name__ == "__main__":
    main()
