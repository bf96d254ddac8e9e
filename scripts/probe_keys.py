#!/usr/bin/env python
"""Per-key optimization probe (guide §1): isolate a registry key with the
noop sink so the computation is timed without the Arrow-collect result
path, capture `.explain("formatted")`, and count plan features (Exchange,
join strategies, Python-eval nodes).

Usage:
    python scripts/probe_keys.py KEY [KEY...] [--plan-dir DIR] [--runs N]

For each key: 1 cold noop run (warm-up; populates any session caches the
operator declares) + N timed fresh-lineage noop runs; prints
cold/median/min plus plan-node counts, and writes the formatted plan to
--plan-dir/<key>.txt when given. Timing methodology matches bench.py
(fresh DataFrame per run) except for the sink: noop write instead of
toPandas, per guide §1.4 — used for optimization work only, never for
published bench numbers.
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_FEATURES = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
]


def _formatted(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("probe")
    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    for key in args.keys:
        if key not in registry:
            print(f"{key}: NOT REGISTERED", flush=True)
            continue
        fn = registry[key].fn
        spark.sparkContext.setJobDescription(f"probe:{key}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        samples = []
        for _ in range(args.runs):
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        plan = _formatted(fn(spark, SF_DIR))
        counts = {
            f: len(re.findall(rf"\b{f}\b", plan))
            for f in _FEATURES
            if re.search(rf"\b{f}\b", plan)
        }
        # Exchange counts BroadcastExchange too; split them apart
        if "Exchange" in counts and "BroadcastExchange" in counts:
            counts["Exchange"] -= counts["BroadcastExchange"]
        print(
            f"{key}: cold={cold:.3f} med={statistics.median(samples):.3f} "
            f"min={min(samples):.3f} runs={['%.3f' % s for s in samples]} "
            f"plan={counts}",
            flush=True,
        )
        if args.plan_dir:
            out = os.path.join(args.plan_dir, f"{key}{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)


if __name__ == "__main__":
    main()
