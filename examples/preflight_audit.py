#!/usr/bin/env python
"""Pre-flight data-audit walkthrough — the checks a pipeline team runs
BEFORE pointing a 1000-executor job at a new 100 TB drop, end to end on
the test data:

  1. KEYS      — dq_referential_integrity: are the foreign keys closed
                 (orphans break joins silently)?
  2. RANGES    — dq_sequence_gaps: which key ranges are missing from the
                 extract (the backfill work-list)?
  3. MONEY     — dq_reconciliation: do order headers equal the sum of
                 their lines, per priority band, on an exact cents
                 lattice?
  4. SHAPE     — dq_benford_first_digit: does the amount distribution
                 look organic (Benford) or fabricated/truncated?
  5. FEEDS     — dq_freshness + ts_max_silence: is any source lagging
                 NOW, and did any source stall-and-recover in the past
                 (an outage current-lag monitoring cannot see)?
  6. VOLUME    — dq_volume_anomaly + ts_forecast_snaive_eval: daily
                 volumes vs a robust median/MAD band, and how far the
                 cheapest weekly-seasonal forecast drifts per feed.

Every step is one registered operator (same DataFrame the driver
hash-checks against DuckDB); this file only sequences them into the
report a human reads. Run:  python examples/preflight_audit.py [sf_dir]
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
    spark = get_spark("preflight-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def run(key: str):
        return registry[key].fn(spark, SF_DIR)

    print("== 1. foreign-key closure ==")
    run("dq_referential_integrity").show(truncate=False)

    print("== 2. missing key ranges (top 5 widest) ==")
    run("dq_sequence_gaps").limit(5).show()

    print("== 3. header-vs-detail reconciliation ==")
    run("dq_reconciliation").orderBy("o_orderpriority").show()

    print("== 4. Benford first-digit screen ==")
    (
        run("dq_benford_first_digit")
        .orderBy("digit")
        .withColumn("verdict", F.when(F.col("dev_ppm") > 30000, "SUSPECT").otherwise("ok"))
        .show()
    )

    print("== 5a. feed freshness (current lag) ==")
    run("dq_freshness").orderBy("event_type").show()

    print("== 5b. longest historical silence per feed ==")
    run("ts_max_silence").orderBy(F.desc("max_gap_s")).show()

    print("== 6a. daily-volume anomalies (flagged days only) ==")
    run("dq_volume_anomaly").filter(F.col("is_anomaly")).show()

    print("== 6b. seasonal-naive volume backtest (MAE per feed) ==")
    run("ts_forecast_snaive_eval").orderBy(F.desc("mae_cents")).show()

    spark.stop()


if __name__ == "__main__":
    main()
