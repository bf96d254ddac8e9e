"""Pre-verify a prefix window of the driver's queries() ordering.

Runs the same compare as scripts/driver_sim.py but only over the first N
keys of the self-steering ordering (the keys the next driver round will
actually check), printing per-key PASS/FAIL and row counts so degenerate
0-row results are visible before the round gate.

Usage: python scripts/window_check.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("window-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from bangdatapipeline_spark.registry import load_all
    from tests.oracle import compare_query

    qs = list(e.queries())[:n]
    registry = load_all()
    failed = []
    for key in qs:
        t0 = time.time()
        try:
            ok, msg = compare_query(spark, registry[key], sf_dir)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {key}: {msg} ({time.time()-t0:.1f}s)", flush=True)
        if not ok:
            failed.append(key)
    print(json.dumps({"window": n, "sf_dir": sf_dir, "failed": failed}))
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
