"""Storage-layout maintenance operators: small-file compaction planning,
zone-map pruning, and the transactional OPTIMIZE round-trip.

At 100 TB the dominant operational costs are not the queries but the
layout they run against: millions of small files (slow listings, tiny
scans), row groups whose min/max stats never prune, and compaction jobs
that must rewrite data without breaking readers. These operators express
that maintenance work as ordinary DataFrame plans over *file-level
metadata* — O(#files) rows, never O(#rows) — so the planning itself is
trivially cheap at any scale; only the rewrite (modeled by
``sources.txn_table``'s OPTIMIZE commit) touches data, and it touches
only the fragmented buckets.

Scale notes (100 TB):
  * ``layout_compaction_plan`` windows over the file inventory
    (one row per file). The exclusive running-sum binning is the
    deterministic, shuffle-once equivalent of first-fit-decreasing:
    partition by table-partition key, one sort per partition, no
    driver-side loop. The physical rewrite is then a single
    ``repartition(partition, bin)`` write.
  * ``layout_zonemap_skip`` computes per-file min/max zone maps with one
    hash aggregation keyed on file id — the same stats parquet footers
    carry — then evaluates predicate skippability *declaratively*. The
    demo contrasts a time-clustered layout (date predicate prunes) with
    an uncorrelated column (price predicate prunes nothing): pruning is
    a property of layout/predicate correlation, which is exactly why
    z-order / partition-by-ingest-time matter (see layout_zorder).
  * ``txn_optimize_table`` drives CREATE (zero-shuffle multi-file
    ingest) -> OPTIMIZE (bucket-wise bin-pack, copy-on-write commit) ->
    snapshot read, and hash-checks that the compacted table is
    row-identical to the source — the "logically a no-op" contract a
    production OPTIMIZE must keep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

# compaction target size (chars stand in for bytes in the synthetic corpus)
_COMPACT_TARGET = 1000
# zone-map demo predicates
_PRICE_LO_CENTS = 15_000_000  # $150k
_PRICE_HI_CENTS = 20_000_000  # $200k
_DATE_LO = "1995-01-01"
_DATE_HI = "1995-12-31"


@register(
    "layout_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT source,
         doc_id % 16                  AS file_id,
         CAST(sum(n_chars) AS BIGINT) AS size_chars,
         count(*)                     AS n_docs
  FROM documents
  GROUP BY source, doc_id % 16
),
placed AS (
  SELECT source, file_id, size_chars, n_docs,
         CAST(coalesce(sum(size_chars) OVER (
                PARTITION BY source
                ORDER BY size_chars DESC, file_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) // {_COMPACT_TARGET} AS bin_id
  FROM files
)
SELECT source, file_id, size_chars, n_docs, bin_id,
       CAST(sum(size_chars) OVER (PARTITION BY source, bin_id) AS BIGINT)
         AS bin_total,
       count(*) OVER (PARTITION BY source, bin_id) AS files_in_bin
FROM placed
""",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: bin-pack each table-partition's files
    into ~target-size output groups with a deterministic running-sum
    assignment (files ordered size-desc; bin = exclusive-prefix-sum div
    target).

    The plan is pure metadata — one row per file, two windows keyed on
    the partition column — so it costs the same at 100 TB as at 100 MB;
    the rewrite it prescribes is ``repartition("source", "bin_id")``.
    The size-desc ordering is the greedy first-fit-decreasing heuristic
    made associative: identical input always yields identical bins, so
    re-planning after a partial compaction is idempotent.
    """
    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy(
        "source", F.pmod(F.col("doc_id"), F.lit(16)).alias("file_id")
    ).agg(
        F.sum("n_chars").alias("size_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w_pack = (
        Window.partitionBy("source")
        .orderBy(F.col("size_chars").desc(), F.col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("size_chars").over(w_pack), F.lit(0))
    # prior and target are non-negative bigints, so floor(prior/target)
    # equals integer `div` — exact, no float boundary to disagree on
    placed = files.withColumn(
        "bin_id", F.floor(prior / F.lit(_COMPACT_TARGET)).cast("long")
    )
    w_bin = Window.partitionBy("source", "bin_id")
    return placed.select(
        "source",
        "file_id",
        "size_chars",
        "n_docs",
        "bin_id",
        F.sum("size_chars").over(w_bin).alias("bin_total"),
        F.count(F.lit(1)).over(w_bin).alias("files_in_bin"),
    )


@register(
    "layout_zonemap_skip",
    oracle=f"""
SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 4
         + (EXTRACT(month FROM o_orderdate) - 1) // 3       AS file_id,
       count(*)                                             AS n_rows,
       min(o_orderdate)                                     AS min_date,
       max(o_orderdate)                                     AS max_date,
       CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                                            AS min_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                                            AS max_cents,
       max(o_orderdate) < DATE '{_DATE_LO}'
         OR min(o_orderdate) > DATE '{_DATE_HI}'            AS skip_date,
       CAST(sum(CASE WHEN o_orderdate BETWEEN DATE '{_DATE_LO}'
                          AND DATE '{_DATE_HI}'
                     THEN 1 ELSE 0 END) AS BIGINT)          AS n_match_date,
       max(CAST(round(o_totalprice * 100) AS BIGINT)) < {_PRICE_LO_CENTS}
         OR min(CAST(round(o_totalprice * 100) AS BIGINT)) > {_PRICE_HI_CENTS}
                                                            AS skip_price,
       CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                          BETWEEN {_PRICE_LO_CENTS} AND {_PRICE_HI_CENTS}
                     THEN 1 ELSE 0 END) AS BIGINT)          AS n_match_price
FROM orders
GROUP BY 1
""",
)
def layout_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map construction + pruning evaluation: files laid out by
    ingestion quarter carry min/max stats for ``o_orderdate`` and
    ``o_totalprice``; a date predicate prunes almost every file (layout
    correlates), a price predicate prunes none (uncorrelated) — the
    quantitative case for clustering data by the columns you filter on.

    One hash aggregation keyed on file id computes every zone map and
    both match counts; the skip decision is a pure expression over the
    aggregates. ``n_match_* = 0`` wherever ``skip_* = true`` is the
    zone-map soundness invariant (pinned in tests): a skipped file can
    never contain a matching row.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    file_id = (F.year("o_orderdate") - F.lit(1992)) * 4 + F.floor(
        (F.month("o_orderdate") - 1) / 3
    )
    lo_d, hi_d = F.lit(_DATE_LO).cast("date"), F.lit(_DATE_HI).cast("date")
    return (
        o.select(
            file_id.alias("file_id"),
            F.col("o_orderdate").alias("d"),
            cents.alias("c"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("d").alias("min_date"),
            F.max("d").alias("max_date"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
            ((F.max("d") < lo_d) | (F.min("d") > hi_d)).alias("skip_date"),
            F.sum(
                F.when(F.col("d").between(lo_d, hi_d), 1).otherwise(0)
            ).alias("n_match_date"),
            (
                (F.max("c") < F.lit(_PRICE_LO_CENTS))
                | (F.min("c") > F.lit(_PRICE_HI_CENTS))
            ).alias("skip_price"),
            F.sum(
                F.when(
                    F.col("c").between(_PRICE_LO_CENTS, _PRICE_HI_CENTS), 1
                ).otherwise(0)
            ).alias("n_match_price"),
        )
    )


@register(
    "txn_optimize_table",
    oracle="""
SELECT source,
       count(*)                     AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(doc_id) AS BIGINT)  AS min_doc,
       CAST(max(doc_id) AS BIGINT)  AS max_doc
FROM documents
GROUP BY source
""",
)
def txn_optimize_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE round-trip through the transactional table format:
    multi-file zero-shuffle CREATE (every ingest partition writes its
    slice of every bucket — the small-file pattern), then ``compact()``
    bin-packs each fragmented bucket into one file under a copy-on-write
    commit, and the hash-checked result is what a snapshot reader sees
    AFTER compaction. The oracle is the source aggregate — OPTIMIZE must
    be logically a no-op.

    File-count mechanics (ingest-partitions x buckets before, one per
    fragmented bucket after) and re-run idempotence (second compact is a
    skipped no-op commit) are pinned in tests/test_layout_ops.py; here
    the verified property is row preservation through the log.
    Pinned via ``localCheckpoint`` so the temp demo table can be removed
    before returning (same contract as txn_cdc_merge_table).
    """
    import os
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.sources.txn_table import TxnTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = os.path.join(tempfile.gettempdir(), f"txn_opt_{uuid.uuid4().hex[:8]}")
    try:
        table = TxnTable.create(
            spark,
            path,
            docs.repartition(8, "doc_id"),
            key_col="doc_id",
            n_buckets=4,
        )
        table.compact()
        out = (
            table.read()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.min("doc_id").cast("long").alias("min_doc"),
                F.max("doc_id").cast("long").alias("max_doc"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)
