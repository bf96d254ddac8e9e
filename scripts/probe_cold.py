#!/usr/bin/env python
"""Cold-path (fresh-lineage, empty-cache) probe for registry keys.

VERDICT r12: the published bench's warm medians bank cross-run cache
hits, while at 100 TB a query runs ONCE — the cold path is the product.
This probe measures exactly that cost, repeatably: before every timed
run it calls ``caches.release(spark)`` (drops every cached relation and
resets the engine memo registries), so each sample pays the full
first-materialization cost of the key — cache builds included — with
only JVM/JIT/parquet-footer warmth carried over (same as bench.py's
shared-session methodology).

Usage:
    python scripts/probe_cold.py KEY [KEY...] [--runs N] [--plan-dir DIR]

Noop sink per guide §1.4 — optimization-only tool, never published
bench numbers.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark import caches  # noqa: E402
from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("probe-cold")
    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)

    # one throwaway warm-up key so the first measured key does not absorb
    # one-time JVM/codegen costs
    first = args.keys[0]
    if first in registry:
        registry[first].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    for key in args.keys:
        if key not in registry:
            print(f"{key}: NOT REGISTERED", flush=True)
            continue
        fn = registry[key].fn
        samples = []
        for _ in range(args.runs):
            caches.release(spark)
            spark.sparkContext.setJobDescription(f"probe-cold:{key}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        # one warm follow-up (caches left populated by the last cold run)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(
            f"{key}: cold_med={statistics.median(samples):.3f} "
            f"cold_min={min(samples):.3f} warm={warm:.3f} "
            f"runs={['%.3f' % s for s in samples]}",
            flush=True,
        )
        if args.plan_dir:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(args.plan_dir, f"{key}{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())


if __name__ == "__main__":
    main()
