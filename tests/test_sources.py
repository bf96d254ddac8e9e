"""Sources/sinks round-trip tests (SURVEY.md §2.1 harness rows).

Covers the reference's ETL boundary: nested-JSON ingestion + flattening,
parquet canonicalization with partitioned layout (+ partition pruning
visible in the plan), and CSV export round-trip.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from bangdatapipeline_spark import sources
from bangdatapipeline_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_json_ingest_and_flatten(spark, tmp_path):
    # synthesize a nested batch doc shaped like the reference's data model:
    # batch -> rounds[] -> users[] with per-user survey answers
    docs = [
        {
            "batch_id": f"b{i}",
            "rounds": [
                {
                    "round_id": r,
                    "users": [
                        {"user_id": u, "team": f"t{u % 2}", "score": r * 10 + u}
                        for u in range(3)
                    ],
                }
                for r in range(2)
            ],
        }
        for i in range(4)
    ]
    cache = tmp_path / "cache"
    cache.mkdir()
    for d in docs:
        (cache / f"{d['batch_id']}.json").write_text(json.dumps(d))

    raw = sources.ingest_json(spark, str(cache))
    flat = sources.flatten_batch(raw)
    rows = flat.collect()
    assert len(rows) == 4 * 2 * 3
    assert set(flat.columns) == {"batch_id", "round_id", "user_id", "team", "score"}
    assert {r.score for r in rows if r.round_id == 1 and r.user_id == 2} == {12}


def test_parquet_partitioned_roundtrip_and_pruning(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    sources.canonicalize_parquet(docs, out, partition_by=["lang"])

    layout = sources.partition_files(out)
    assert set(layout) == {f"lang={l}" for l in ("de", "en", "es", "fr", "zh")}

    back = sources.read_partitioned(spark, out)
    assert back.count() == docs.count()

    # partition pruning: the partition-column filter must become a
    # PartitionFilter on the scan (not a post-scan Filter over all files)
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_csv_export_roundtrip(spark, tmp_path):
    region = load_table(spark, SF, "region")
    out = str(tmp_path / "region_csv")
    sources.export_csv(region, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 5
    assert sorted(back.columns) == sorted(region.columns)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the second columnar format Spark ships natively — verify
    write/read round-trip with schema + values intact (the canonical
    store stays parquet; this pins the alternate-format path works)."""
    orders = load_table(spark, sf_dir, "orders").limit(500)
    out = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
