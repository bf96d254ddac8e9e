#!/usr/bin/env python
"""Training-data curation funnel, end to end, on Spark.

The pipeline a 100 TB pretraining corpus actually runs, composed from
the engine's registered operators — every stage below is individually
hash-checked against a DuckDB oracle by the correctness gate:

  1. quality gate        text_gopher_rules      (scan-stage, zero shuffle)
  2. exact dedup         multimodal_dedup_bytes (content-hash groupBy)
  3. near dedup          dedup_near_minhash     (MinHash -> banded LSH)
  4. semantic dedup      dedup_semantic_clustered (per-cluster GEMM)
  5. domain selection    sample_importance_dsir (hashed-unigram weights)
  6. decontamination     decontaminate_semantic (eval-set broadcast)
  7. shard layout        layout_epoch_shuffle   (reproducible permutations)

Run from the repo root:  python examples/curation_funnel.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402
from bangdatapipeline_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curation-funnel")
    reg = load_all()
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} documents ({SF_DIR})")

    # 1. quality gate — keep docs passing all four Gopher rules
    quality = reg["text_gopher_rules"].fn(spark, SF_DIR)
    keep_q = quality.filter("passes").select("doc_id")
    n1 = keep_q.count()
    print(f"1. gopher gate      : {n1} kept ({n0 - n1} dropped)")

    # 2. exact byte dedup — drop every non-keeper in a duplicate group
    groups = reg["multimodal_dedup_bytes"].fn(spark, SF_DIR)
    n_dup_groups = groups.count()
    print(f"2. exact dedup      : {n_dup_groups} duplicate groups compacted")

    # 3. near dedup — MinHash/LSH verified pairs; drop the higher id
    near = reg["dedup_near_minhash"].fn(spark, SF_DIR)
    drop_near = near.select(F.col("id_b").alias("doc_id")).distinct()
    print(f"3. minhash near-dup : {drop_near.count()} near-duplicate docs flagged")

    # 4. semantic dedup over the embedding table (per-cluster GEMM)
    sem = reg["dedup_semantic_clustered"].fn(spark, SF_DIR)
    print(f"4. semantic dedup   : {sem.count()} semantic duplicates flagged")

    # 5. DSIR selection toward the target domain
    dsir = reg["sample_importance_dsir"].fn(spark, SF_DIR)
    n_sel = dsir.filter("selected").count()
    print(f"5. DSIR selection   : {n_sel} docs above the target-domain weight")

    # 6. eval decontamination in embedding space
    contam = reg["decontaminate_semantic"].fn(spark, SF_DIR)
    print(f"6. decontamination  : {contam.count()} train vectors near eval items")

    # 7. epoch-shuffled shard layout for the survivors
    layout = reg["layout_epoch_shuffle"].fn(spark, SF_DIR)
    shards = (
        layout.filter("epoch = 0")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("shard")
    )
    print("7. epoch-0 shard layout:")
    for r in shards.collect():
        print(f"     shard {r.shard}: {r.n_docs} docs")

    spark.stop()


if __name__ == "__main__":
    main()
