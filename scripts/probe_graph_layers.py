#!/usr/bin/env python
"""Time each memoized layer of the graph substrate's cold build
(optimization probe, never published numbers)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark import caches  # noqa: E402
from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, df):
    t0 = time.perf_counter()
    n = df.count()  # materializes the cache
    print(f"{label:28s} {time.perf_counter() - t0:6.2f} s  rows={n}", flush=True)


def main() -> None:
    registry = load_all()
    spark = get_spark("probe-layers")
    from bangdatapipeline_spark.operators import graph_analytics as ga

    # JVM warm-up
    registry["graph_kcore"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for rnd in range(int(os.environ.get("ROUNDS", "2"))):
        caches.release(spark)
        print(f"--- round {rnd}", flush=True)
        t0 = time.perf_counter()
        op = ga._order_part(spark, SF_DIR)
        t("order_part", op)
        oriented, deg, edges = ga._oriented_copurchase(spark, SF_DIR)
        t("edges", edges)
        t("deg", deg)
        t("oriented", oriented)
        t("out_adjacency", ga._out_adjacency(spark, SF_DIR))
        t("triangle_rows", ga._triangle_rows(spark, SF_DIR))
        t("in_adjacency", ga._in_adjacency(spark, SF_DIR))
        t("und_adjacency", ga._und_adjacency(spark, SF_DIR))
        print(f"total {time.perf_counter() - t0:6.2f} s", flush=True)
        # then the ops that consume them, warm
        for k in ("graph_triangles", "graph_hits_counts", "graph_kcore"):
            t0 = time.perf_counter()
            registry[k].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{k:28s} {time.perf_counter() - t0:6.2f} s (post-layers)", flush=True)


if __name__ == "__main__":
    main()
