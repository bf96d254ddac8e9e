"""Check specific registry keys by name against their DuckDB oracles.

Ad-hoc companion to window_check.py for iterating on NEW operators
without waiting for the whole window prefix.

Usage: python scripts/key_check.py key1 [key2 ...] [--sf sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("key-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bangdatapipeline_spark.registry import load_all
    from tests.oracle import compare_query

    registry = load_all()
    failed = []
    for key in args:
        t0 = time.time()
        try:
            ok, msg = compare_query(spark, registry[key], sf_dir)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {key}: {msg} ({time.time()-t0:.1f}s)", flush=True)
        if not ok:
            failed.append(key)
    print(json.dumps({"keys": len(args), "sf_dir": sf_dir, "failed": failed}))
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
