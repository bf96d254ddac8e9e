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


def test_dynamic_partition_upsert_touches_only_written_partitions(spark, sf_dir, tmp_path):
    from bangdatapipeline_spark.sources import upsert_partitions

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    days = [r.day for r in ev.select("day").distinct().orderBy("day").limit(3).collect()]
    base = ev.filter(F.col("day").isin(days))
    out = str(tmp_path / "upsert")
    upsert_partitions(base, out, ["day"])
    # read-back infers the partition column as DATE -> key dicts by str
    before = {str(r.day): r.n for r in spark.read.parquet(out).groupBy("day")
              .agg(F.count("*").alias("n")).collect()}

    # re-run ONLY the middle day with a halved payload
    redo = base.filter(F.col("day") == days[1]).filter(F.col("event_id") % 2 == 0)
    upsert_partitions(redo, out, ["day"])
    after = {str(r.day): r.n for r in spark.read.parquet(out).groupBy("day")
             .agg(F.count("*").alias("n")).collect()}

    assert after[days[0]] == before[days[0]]          # untouched
    assert after[days[2]] == before[days[2]]          # untouched
    assert after[days[1]] < before[days[1]]           # replaced, not appended
    # idempotence: same re-run -> same result
    upsert_partitions(redo, out, ["day"])
    again = {str(r.day): r.n for r in spark.read.parquet(out).groupBy("day")
             .agg(F.count("*").alias("n")).collect()}
    assert again == after


def test_schema_evolution_merge_read(spark, tmp_path):
    """Old files without a column + new files with it read as one table
    under mergeSchema; the missing column is NULL for old rows — the
    append-only schema-evolution contract of a parquet lake."""
    out = str(tmp_path / "evolve")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(out + "/v1")
    spark.range(5, 8).selectExpr(
        "id", "id * 2 AS a", "'new' AS b"
    ).write.parquet(out + "/v2")
    df = spark.read.option("mergeSchema", True).parquet(out + "/v1", out + "/v2")
    assert set(df.columns) == {"id", "a", "b"}
    assert df.filter(F.col("b").isNull()).count() == 5
    assert df.filter(F.col("b") == "new").count() == 3
