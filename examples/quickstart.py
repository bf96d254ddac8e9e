#!/usr/bin/env python
"""Quickstart: using bangdatapipeline_spark as a library.

Shows the three entry surfaces a user of the reference library would
migrate to:

  1. the fluent Pipeline facade (the reference's eager verb chain,
     compiled lazily into one Catalyst plan),
  2. the query registry (150 named, oracle-verified operators),
  3. plain DataFrame/SQL composition over the canonical tables.

Run from the repo root:  python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bangdatapipeline_spark.pipeline import Pipeline  # noqa: E402
from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402
from bangdatapipeline_spark.tables import load_table, register_views  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("quickstart")

    # -- 1. the fluent facade: filter -> dedup -> profile -> export ------
    p = Pipeline(spark, SF_DIR)
    clean = (
        p.table("documents")
        .filter(F.col("n_chars").between(200, 2000))
        .dedup(keys=["text"], order_by=[F.col("doc_id").asc()])
    )
    print("clean docs:", clean.df.count())
    clean.profile(["lang", "n_chars"]).df.show(truncate=False)
    out = os.path.join(tempfile.gettempdir(), "quickstart_out")
    clean.to_parquet(out, partition_by=["lang"])
    print("exported to", out)

    # -- 2. the registry: run named, oracle-verified operators -----------
    registry = load_all()
    registry["pipeline_train_prep"].fn(spark, SF_DIR).show(truncate=False)
    registry["knn_gemm_topk"].fn(spark, SF_DIR).show(5)

    # -- 3. plain DataFrame / SQL over the canonical tables --------------
    orders = load_table(spark, SF_DIR, "orders")
    top = (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("o_orderpriority")
    )
    top.show()
    register_views(spark, SF_DIR)
    spark.sql(
        "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1 ORDER BY 1"
    ).show()


if __name__ == "__main__":
    main()
