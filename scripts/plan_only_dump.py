#!/usr/bin/env python
"""Dump `.explain("formatted")` for specific registry keys WITHOUT
executing them (plan construction only — cheap enough to run while the
oracle sweep owns the cores). Used to capture before/after plan evidence
for plans/r12/; the executed-plan probes (scripts/probe_keys.py) remain
the timing tool.

Usage: python scripts/plan_only_dump.py OUTDIR KEY [KEY...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    keys = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    registry = load_all()
    spark = get_spark("plan_only_dump")
    for key in keys:
        df = registry[key].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{key}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"dumped {key}")
    spark.stop()


if __name__ == "__main__":
    main()
