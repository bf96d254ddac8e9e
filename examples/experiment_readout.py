#!/usr/bin/env python
"""Experiment readout, end to end — the inference family as one workflow.

The analysis an experimentation platform runs when a test concludes:

  1. sanity: sample-ratio-mismatch check (`events_srm_check`),
  2. headline effect: difference-in-differences (`events_diff_in_diff`),
  3. robustness: paired sign-flip permutation test
     (`stats_permutation_test`) — is the drift distinguishable from
     noise at all?
  4. distribution: quantile treatment effects
     (`stats_quantile_treatment`) — did the tails move when the mean
     didn't?
  5. uncertainty: deterministic Poisson-bootstrap CIs
     (`stats_bootstrap_ci`),
  6. time-to-event: Kaplan-Meier conversion curves per segment
     (`surv_kaplan_meier`).

Every step is a registered, DuckDB-hash-checked query; this script just
sequences them the way an analyst would read them.

Run from the repo root:  python examples/experiment_readout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("experiment-readout")
    reg = load_all()

    print("== 1. sample-ratio sanity (SRM) ==")
    reg["events_srm_check"].fn(spark, SF_DIR).show(truncate=False)

    print("== 2. difference-in-differences ==")
    did = reg["events_diff_in_diff"].fn(spark, SF_DIR)
    did.orderBy("event_type").show(truncate=False)

    print("== 3. paired permutation test (is ANY drift real?) ==")
    reg["stats_permutation_test"].fn(spark, SF_DIR).show(truncate=False)

    print("== 4. quantile treatment effects (purchase values) ==")
    reg["stats_quantile_treatment"].fn(spark, SF_DIR).orderBy("pct").show()

    print("== 5. bootstrap CIs for mean order value ==")
    reg["stats_bootstrap_ci"].fn(spark, SF_DIR).orderBy("priority").show()

    print("== 6. Kaplan-Meier conversion curves (first 5 points/segment) ==")
    km = reg["surv_kaplan_meier"].fn(spark, SF_DIR)
    km.createOrReplaceTempView("km")
    spark.sql(
        "SELECT * FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY segment ORDER BY t_days)"
        "         AS rn FROM km) WHERE rn <= 5 ORDER BY segment, t_days"
    ).drop("rn").show(50, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
