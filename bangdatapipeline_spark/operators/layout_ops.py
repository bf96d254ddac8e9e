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

Cents-lattice convention (VERDICT r11 task 3): the zone-map operators
(``layout_zonemap_skip``, ``layout_file_stats`` family) use the
``round(x*100)`` spelling, consistently on BOTH Spark and oracle sides
of each pairing, over non-negative prices where it agrees with the
repo-default ``floor(x*100+0.5)``; the txn/merge-on-read operators
below interpolate ``lattice.cents_sql`` (the default). The two lattices
never meet inside one pairing — do not swap a spelling on one side
only; see ``operators/lattice.py`` for the signed-data divergence.

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

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
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


# file-bloom parameters: files are ROW-BOUNDED (like parquet row groups),
# so keys-per-file — and therefore the false-positive rate — stays flat as
# data grows: scale adds files, not bits-per-key pressure.
_BLOOM_FILE_ROWS = 1024  # orderkeys per modeled file
_FB_M = 8192  # bloom bits per file
_FB_K = 3  # hash probes (non-overlapping md5 hex windows)
_FB_WORD = 32  # bits per packed word (1 << pos fits int range everywhere)
# point-lookup probes: mostly-present keys plus two certainly-absent ones
_FB_PROBES = [1, 7, 42, 123, 999, 1_000_000_007, 1_000_000_009]


def _fb_pos_sql(key_expr: str) -> list[str]:
    return [
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), {1 + 8 * i}, 8)) "
        f"AS BIGINT) % {_FB_M}"
        for i in range(_FB_K)
    ]


def _fb_pos_spark(key_col) -> list:
    h = F.md5(F.encode(key_col.cast("string"), "utf-8"))
    return [
        (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % _FB_M)
        for i in range(_FB_K)
    ]


@register(
    "layout_file_bloom",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT o_orderkey // {_BLOOM_FILE_ROWS} AS fid, o_custkey AS k
  FROM orders
),
bits AS (
  SELECT fid, unnest([{', '.join(_fb_pos_sql('k'))}]) AS pos FROM keys
),
words AS (
  SELECT fid, pos // {_FB_WORD} AS w,
         bit_or(CAST(1 AS BIGINT) << (pos % {_FB_WORD})) AS word
  FROM bits GROUP BY fid, pos // {_FB_WORD}
),
probes AS (
  SELECT k AS probe_key, unnest([{', '.join(_fb_pos_sql('k'))}]) AS pos
  FROM (SELECT unnest({_FB_PROBES}) AS k)
),
files AS (SELECT DISTINCT fid FROM keys),
checks AS (
  SELECT f.fid, p.probe_key,
         coalesce((w.word >> (p.pos % {_FB_WORD})) & 1, 0) = 1 AS bit_ok
  FROM files f
  CROSS JOIN probes p
  LEFT JOIN words w ON w.fid = f.fid AND w.w = p.pos // {_FB_WORD}
),
pass AS (
  SELECT fid, probe_key, bool_and(bit_ok) AS pass_bloom
  FROM checks GROUP BY fid, probe_key
),
matches AS (SELECT DISTINCT fid, k AS probe_key FROM keys
            WHERE k IN {tuple(_FB_PROBES)}),
flagged AS (
  SELECT p.probe_key, p.pass_bloom, m.probe_key IS NOT NULL AS is_match
  FROM pass p LEFT JOIN matches m
    ON m.fid = p.fid AND m.probe_key = p.probe_key
)
SELECT probe_key,
       CAST(count(*) AS BIGINT)                                AS n_files,
       CAST(count(*) FILTER (WHERE pass_bloom) AS BIGINT)      AS n_pass_bloom,
       CAST(count(*) FILTER (WHERE is_match) AS BIGINT)        AS n_match,
       CAST(count(*) FILTER (WHERE pass_bloom AND NOT is_match) AS BIGINT)
                                                               AS n_false_pos,
       CAST(count(*) FILTER (WHERE is_match AND NOT pass_bloom) AS BIGINT)
                                                               AS n_missed
FROM flagged
GROUP BY probe_key
""",
)
def layout_file_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom filters for point-lookup data skipping — the
    complement of ``layout_zonemap_skip``: zone maps prune range
    predicates on layout-correlated columns, but a point lookup on an
    uncorrelated column (``o_custkey = ?``) prunes NOTHING by min/max.
    A per-file Bloom (what parquet stores per row group) skips most
    files for such lookups at a fixed false-positive cost.

    The filter is stored RELATIONALLY as a sparse word table — one row
    per (file, nonzero 32-bit word), packed with ``bit_or(1 << pos)`` —
    so M scales to any width without widening the schema, and probing is
    an equi-join on (file, word index): ``bit_ok`` for each of the K=3
    md5-window hashes, ``bool_and`` per (file, probe). Files are
    row-bounded (1024 orderkeys, the row-group model), so keys-per-file
    and the fp rate stay flat as data scales out — measured ~1-3%% here
    with M=8192, K=3.

    The report audits both directions per probe key: ``n_false_pos``
    (cost: files read in vain) and ``n_missed`` (soundness: MUST be 0 —
    a Bloom never false-negatives; pinned in tests). Everything shuffles
    on (fid, ...) keys bounded by #files × 256 words; the probe grid is
    #files × 7 rows via a broadcast cross of the 7-key probe list.
    """
    o = load_table(spark, sf_dir, "orders")
    # keys feeds TWO consumers (the word build and the probed file list)
    # — pinned so the distinct shuffle executes once per materialization
    # (r12, the same dual-consumer rule as graph_kcore's d1).
    keys = (
        o.select(
            (F.col("o_orderkey") / _BLOOM_FILE_ROWS).cast("long").alias("fid"),
            F.col("o_custkey").alias("k"),
        )
        .distinct()
        .cache()
    )
    bits = keys.select(
        "fid", F.explode(F.array(*_fb_pos_spark(F.col("k")))).alias("pos")
    )
    words = (
        bits.select(
            "fid",
            (F.col("pos") / _FB_WORD).cast("long").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_FB_WORD} AS INT))"
            ).alias("m"),
        )
        .groupBy("fid", "w")
        .agg(F.bit_or("m").alias("word"))
    )
    probes = spark.createDataFrame(
        [(k,) for k in _FB_PROBES], "probe_key long"
    ).select(
        "probe_key",
        F.explode(F.array(*_fb_pos_spark(F.col("probe_key")))).alias("pos"),
    )
    files = keys.select("fid").distinct()
    checks = (
        files.crossJoin(F.broadcast(probes))  # #files x 21 rows, declared
        .join(
            words,
            (F.col("w") == (F.col("pos") / _FB_WORD).cast("long"))
            & (words["fid"] == files["fid"]),
            "left",
        )
        .select(
            files["fid"],
            "probe_key",
            (
                F.coalesce(
                    F.expr(
                        f"shiftright(word, CAST(pos % {_FB_WORD} AS INT)) & 1"
                    ),
                    F.lit(0),
                )
                == 1
            ).alias("bit_ok"),
        )
    )
    pass_df = checks.groupBy("fid", "probe_key").agg(
        F.bool_and("bit_ok").alias("pass_bloom")
    )
    matches = (
        keys.filter(F.col("k").isin(_FB_PROBES))
        .select("fid", F.col("k").alias("probe_key"))
        .distinct()
        .withColumn("is_match", F.lit(True))
    )
    flagged = pass_df.join(matches, ["fid", "probe_key"], "left").fillna(
        False, subset=["is_match"]
    )
    return flagged.groupBy("probe_key").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(F.col("pass_bloom"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass_bloom"),
        F.sum(F.when(F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
        F.sum(F.when(F.col("pass_bloom") & ~F.col("is_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_match") & ~F.col("pass_bloom"), 1).otherwise(0))
        .cast("long")
        .alias("n_missed"),
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


_PRUNE_LO = "2024-01-10"
_PRUNE_HI = "2024-01-14"


@register(
    "layout_partition_prune",
    oracle=f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d')          AS day,
       CAST(count(*) AS BIGINT)                        AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT)         AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_PRUNE_LO}' AND DATE '{_PRUNE_HI}'
GROUP BY 1
""",
)
def layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partition pruning round-trip: land events partitioned by
    ``event_date`` (the ingest layout a 100 TB event store actually
    uses), then run a date-range aggregate against the partitioned copy
    — Catalyst's partition pruning turns the predicate into a DIRECTORY
    listing filter, so only 5 of 30 day-directories are ever opened
    (``PartitionFilters`` in the scan, inputFiles == matched partitions;
    pinned in tests/test_layout_dq.py). The hash-checked result proves
    the pruned scan computes exactly what the full-scan oracle does.

    The write uses one file per partition (repartition on the partition
    column before ``partitionBy``); the measured value column is summed
    on the exact cents lattice, so the aggregate is order-free.
    Temp copy removed after ``localCheckpoint`` pins the result (same
    contract as txn_optimize_table).
    """
    import os
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = os.path.join(
        tempfile.gettempdir(), f"prune_demo_{uuid.uuid4().hex[:8]}"
    )
    try:
        (
            ev.repartition(F.col("event_date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
        part = spark.read.parquet(path).filter(
            F.col("event_date").between(_PRUNE_LO, _PRUNE_HI)
        )
        out = (
            part.groupBy(
                F.date_format("event_date", "yyyy-MM-dd").alias("day")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "sum_cents"
                ),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "layout_bucketed_join",
    oracle="""
SELECT c.c_mktsegment                                   AS segment,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT)    AS order_year,
       CAST(count(*) AS BIGINT)                         AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                                        AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-paid-shuffle (bucketed) join round-trip: both sides land
    hash-bucketed + per-bucket-sorted on the join key, then the
    recurring join runs as a ZERO-Exchange sort-merge join — the layout
    carries the partitioning, so a 100 TB fact-fact join that recurs
    nightly shuffles once at write time instead of every query.
    (The no-Exchange / no-Sort plan property is pinned in
    tests/test_plans.py::test_bucketed_join_has_no_exchange_no_sort;
    here the hash-checked result proves the bucketed layout computes
    exactly what the plain-join oracle does.)

    Broadcast is disabled inside the demo window so the co-located SMJ
    path actually exercises (restored after the eager checkpoint);
    revenue sums on the exact cents lattice. Demo tables are unique per
    call and dropped after the result is pinned.
    """
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.sources import write_bucketed

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tag = uuid.uuid4().hex[:8]
    t_o, t_c = f"b_orders_{tag}", f"b_customer_{tag}"
    d_o = tempfile.mkdtemp(prefix=f"bj_o_{tag}")
    d_c = tempfile.mkdtemp(prefix=f"bj_c_{tag}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(o, t_o, d_o, ["o_custkey"])
        write_bucketed(c, t_c, d_c, ["c_custkey"])
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            spark.table(t_o)
            .join(
                spark.table(t_c),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy(
                F.col("c_mktsegment").alias("segment"),
                F.year("o_orderdate").cast("int").alias("order_year"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    "revenue_cents"
                ),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")
        shutil.rmtree(d_o, ignore_errors=True)
        shutil.rmtree(d_c, ignore_errors=True)


@register(
    "source_orc_roundtrip",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum({cents_sql("value")}) AS BIGINT)
         AS sum_cents
FROM events GROUP BY event_type
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector round-trip: land the events table as ORC (the other
    major columnar format a lakehouse ingests from Hive-era producers),
    read it back through the ORC reader, and hash-check an aggregate
    against the ORIGINAL parquet rows — value-preserving ingestion is
    the entire contract of a format connector, and this proves it
    column-type by column-type (bigint keys, strings, doubles on the
    exact cents lattice).

    Write: repartition(4) so the ORC dataset is multi-stripe/multi-file
    and the read-back scan splits (same canonical-layout rationale as
    BASELINE.md round 2). Predicate pushdown and column pruning work in
    the ORC reader the same as parquet (Catalyst emits ORC
    PushedFilters); the demo aggregate prunes to 3 columns. Result
    pinned via localCheckpoint so the temp dataset is removed before
    returning (txn_optimize_table contract).
    """
    import os
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(tempfile.gettempdir(), f"orc_rt_{uuid.uuid4().hex[:8]}")
    try:
        ev.repartition(4).write.orc(path)
        back = spark.read.orc(path)
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(cents_col(F.col("value"))).alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


_BINFILE_BOUND = 100  # files materialized for the connector round-trip


@register(
    "source_binaryfile_ingest",
    oracle=f"""
SELECT doc_id,
       CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
       md5(text || chr(10)) AS content_md5
FROM documents WHERE doc_id < {_BINFILE_BOUND}
""",
)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` connector ingest — the entry point every multimodal
    corpus passes through at 100 TB: raw files (images, audio, shards)
    land on object storage and the first Spark job reads them as
    (path, modificationTime, length, content) rows to shard into
    parquet with typed metadata (operators/multimodal.py takes over
    from there). This proves the connector end to end: a bounded set of
    documents is materialized as one FILE per document (text sink,
    one-row partitions), read back through ``binaryFile``, and each
    file's byte length and content digest are hash-checked against the
    ORIGINAL rows — byte-preserving ingestion is the connector's entire
    contract. The text sink appends one trailing newline per row, so
    the expected digest is md5(text || chr(10)) over exactly strlen+1
    bytes; the check holds even for texts containing newlines because
    each document is ALONE in its file.

    Scale shape: binaryFile scans parallelize per file (and split never
    — a file is one row), so ingest throughput is file-count x task
    parallelism; spark.sql.files.maxPartitionBytes packs small files
    per task. The demo bounds materialization to {_BINFILE_BOUND}
    driver-side files; the read-back plan is the same at any corpus
    size. Result pinned via localCheckpoint so the temp files are
    removed before returning (source_orc_roundtrip contract).
    """
    import os
    import shutil
    import tempfile
    import uuid

    d = load_table(spark, sf_dir, "documents")
    sel = d.filter(F.col("doc_id") < _BINFILE_BOUND).select("doc_id", "text")
    root = os.path.join(tempfile.gettempdir(), f"binf_{uuid.uuid4().hex[:8]}")
    try:
        sel.write.partitionBy("doc_id").text(root)
        back = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "part-*")
            .load(root)
        )
        out = back.select(
            F.regexp_extract(F.col("path"), r"doc_id=(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "layout_merge_on_read",
    oracle=f"""
WITH delta AS (
  SELECT c_custkey AS key,
         CASE WHEN c_custkey % 13 = 0 THEN TRUE ELSE FALSE END AS is_delete,
         {cents_sql("c_acctbal")} + 777 AS new_cents
  FROM customer WHERE c_custkey % 13 = 0 OR c_custkey % 7 = 0
),
merged AS (
  SELECT c.c_mktsegment,
         coalesce(d.new_cents, {cents_sql("c.c_acctbal")})
           AS cents,
         d.key IS NOT NULL AND NOT d.is_delete AS updated
  FROM customer c LEFT JOIN delta d ON d.key = c.c_custkey
  WHERE NOT coalesce(d.is_delete, FALSE)
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count_if(updated) AS BIGINT) AS n_updated,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged GROUP BY c_mktsegment
""",
)
def layout_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ — the other half of the lakehouse merge design
    space (the txn table's MERGE is copy-on-write): the base file set
    is IMMUTABLE, a small delta file carries upserts + delete markers
    (deletion-vector pattern), and the merge happens at READ time as a
    left join + tombstone filter. Writes are O(delta) with zero
    rewrite; reads pay the join until compaction folds the delta in —
    exactly the trade Iceberg v2 / Delta DVs make for streaming-write
    workloads, and the batch shape of the cdc_merge read-side sinks.

    Demo: base customer parquet + a delta parquet (updates +777 cents
    on keys = 0 mod 7, tombstones on 0 mod 13) written to temp files,
    merged at read, aggregated per segment, hash-checked against the
    one-shot SQL merge. At 100 TB: bucket base AND delta by key and
    the read-side join is exchange-free on the base (the delta
    broadcast-joins when small, which it is by construction); the
    compaction that retires the delta is txn_optimize_table's job.
    Pinned via localCheckpoint before the temp files are removed.
    """
    import os
    import shutil
    import tempfile
    import uuid

    c = load_table(spark, sf_dir, "customer")
    cents = cents_col(F.col("c_acctbal"))
    root = os.path.join(tempfile.gettempdir(), f"mor_{uuid.uuid4().hex[:8]}")
    try:
        base_path = os.path.join(root, "base")
        delta_path = os.path.join(root, "delta")
        c.select("c_custkey", "c_mktsegment", cents.alias("cents")).write.parquet(
            base_path
        )
        key = F.col("c_custkey")
        c.filter((key % 13 == 0) | (key % 7 == 0)).select(
            key.alias("key"),
            (key % 13 == 0).alias("is_delete"),
            (cents + F.lit(777)).alias("new_cents"),
        ).write.parquet(delta_path)

        base = spark.read.parquet(base_path)
        delta = spark.read.parquet(delta_path)
        merged = (
            base.join(
                F.broadcast(delta),
                base["c_custkey"] == delta["key"],
                "left",
            )
            .filter(~F.coalesce("is_delete", F.lit(False)))
            .select(
                "c_mktsegment",
                F.coalesce("new_cents", "cents").alias("cents"),
                (F.col("key").isNotNull() & ~F.col("is_delete")).alias(
                    "updated"
                ),
            )
        )
        out = merged.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.coalesce("updated", F.lit(False))).alias("n_updated"),
            F.sum("cents").alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "source_jsonl_roundtrip",
    oracle="""
SELECT lang, source,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_chars) AS BIGINT)  AS sum_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(sum(doc_id) AS BIGINT)   AS key_checksum
FROM documents GROUP BY lang, source
""",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines connector round-trip: land the documents corpus as
    .jsonl (THE interchange format LLM training corpora actually arrive
    in — one JSON object per line, splittable, append-friendly), read it
    back through the JSON reader with an EXPLICIT schema, and hash-check
    a per-(lang, source) aggregate against the ORIGINAL parquet rows —
    same value-preserving contract as source_orc_roundtrip, proved for
    the string/bigint columns a text corpus carries.

    Explicit schema on read is the production posture: schema inference
    re-scans the whole dataset (a second full pass at 100 TB) and can
    widen types under drift; pinning StructType makes ingestion one
    pass and deterministic. Write: repartition(4) so the .jsonl dataset
    is multi-file and the read-back scan splits line-parallel (JSONL is
    splittable by newline, unlike a single JSON array). Result pinned
    via localCheckpoint so the temp dataset is removed before returning
    (txn_optimize_table contract).
    """
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"jsonl_rt_{uuid.uuid4().hex[:8]}")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    try:
        d.repartition(4).write.json(path)
        back = spark.read.schema(schema).json(path)
        out = back.groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias(
                "sum_tokens"
            ),
            F.sum("doc_id").alias("key_checksum"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# Sort-key selection for compression (run-length audit)
# ---------------------------------------------------------------------------

# candidate sort keys for the lineitem table, projected to VARCHAR so one
# melted pass measures all of them uniformly
_RLE_CANDS = (
    ("l_returnflag", "CAST(l_returnflag AS STRING)", "CAST(l_returnflag AS VARCHAR)"),
    ("l_linestatus", "CAST(l_linestatus AS STRING)", "CAST(l_linestatus AS VARCHAR)"),
    ("l_suppkey", "CAST(l_suppkey AS STRING)", "CAST(l_suppkey AS VARCHAR)"),
    ("ship_month", "date_format(l_shipdate, 'yyyy-MM')",
     "strftime(l_shipdate, '%Y-%m')"),
)


def _rle_oracle() -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT l_orderkey, l_linenumber, '{name}' AS cand, {duck} AS val"
        " FROM lineitem"
        for name, _, duck in _RLE_CANDS
    )
    return f"""
WITH m AS ({legs}),
runs AS (
  SELECT cand,
         CASE WHEN val IS DISTINCT FROM
                   lag(val) OVER (PARTITION BY cand, l_orderkey
                                  ORDER BY l_linenumber, val)
              THEN 1 ELSE 0 END AS run_start
  FROM m
)
SELECT r.cand,
       CAST(count(*) AS BIGINT)        AS n_rows,
       CAST(sum(r.run_start) AS BIGINT) AS runs_natural,
       CAST(d.n_distinct AS BIGINT)     AS runs_sorted,
       CAST(d.n_distinct * 1000000 // sum(r.run_start) AS BIGINT)
         AS sorted_runs_ppm
FROM runs r
JOIN (SELECT cand, count(DISTINCT val) AS n_distinct FROM m GROUP BY cand) d
  USING (cand)
GROUP BY r.cand, d.n_distinct
"""


@register("layout_sort_compression_gain", oracle=_rle_oracle())
def layout_sort_compression_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-key selection audit for RLE/dictionary compression: for each
    candidate sort column of lineitem, how many value RUNS the column has
    in the table's natural clustering (within each order, line order)
    versus after sorting by that column (where runs collapse to the
    distinct-value count). ``sorted_runs_ppm`` = runs_sorted/runs_natural
    in ppm — the smaller, the more a sort by that key would shrink
    parquet pages (RLE run count is the first-order proxy for encoded
    size). This is the measurement behind choosing a table's sort/Z-order
    key (``layout_zorder`` demonstrates multi-key clustering; this
    operator picks WHICH key earns it): low-cardinality flags compress
    massively under sorting, while high-cardinality keys (l_suppkey) buy
    little — the audit quantifies that instead of guessing.

    Runs are counted within the natural clustering unit (per order, by
    line number, ties broken by the value itself — a tie between equal
    values cannot change the run count, so the tally is deterministic
    even though (orderkey, linenumber) is not unique) so the window is
    keyed and bounded — no global sort of
    the fact table is needed to MEASURE what a global sort would save;
    cross-order boundary runs are O(#orders) noise amortized identically
    across candidates.

    r12 plan: the run tally no longer melts the fact table 4x through
    one (cand, orderkey)-keyed window — the four candidates share ONE
    exchange on l_orderkey and each gets its own narrow in-partition
    sort (l_linenumber, its own val — the per-candidate tie-break is
    load-bearing: (orderkey, linenumber) is NOT unique, so each
    candidate's lag must run over ITS value order), so the shuffle
    carries |rows| x 4-value rows instead of 4|rows| melted rows and
    the four lags reduce in one keyless partial aggregate. The melted
    projection survives only for the distinct-value branch, where
    map-side combine collapses it to |cand| x |distinct| before the
    exchange. At 100 TB this audit costs one scan + one fact exchange,
    and acting on it (rewriting sorted) is the expensive step it
    justifies.
    """
    l = load_table(spark, sf_dir, "lineitem")
    m = l.selectExpr(
        "l_orderkey",
        "l_linenumber",
        *[f"{spark_e} AS v_{name}" for name, spark_e, _ in _RLE_CANDS],
    )
    run_cols = []
    for name, _, _ in _RLE_CANDS:
        w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", f"v_{name}")
        run_cols.append(
            F.when(
                ~F.col(f"v_{name}").eqNullSafe(F.lag(f"v_{name}").over(w)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias(f"r_{name}"),
        )
    runs = m.select(*run_cols)
    totals = runs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(f"r_{name}").alias(f"s_{name}") for name, _, _ in _RLE_CANDS],
    )
    agg = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("cand"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"s_{name}").alias("runs_natural"),
                    )
                    for name, _, _ in _RLE_CANDS
                ]
            )
        ).alias("t")
    ).select("t.cand", "t.n_rows", "t.runs_natural")
    stack_expr = "stack({n}, {args}) AS (cand, val)".format(
        n=len(_RLE_CANDS),
        args=", ".join(f"'{name}', {spark_e}" for name, spark_e, _ in _RLE_CANDS),
    )
    melted = l.selectExpr(stack_expr)
    dist = melted.groupBy("cand").agg(F.countDistinct("val").alias("n_distinct"))
    return agg.join(dist, "cand").select(
        "cand",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("runs_natural").cast("long").alias("runs_natural"),
        F.col("n_distinct").cast("long").alias("runs_sorted"),
        F.expr("CAST(n_distinct * 1000000 div runs_natural AS BIGINT)").alias(
            "sorted_runs_ppm"
        ),
    )
