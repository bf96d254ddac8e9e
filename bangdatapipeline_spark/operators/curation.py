"""Training-data curation operators: eval-set decontamination,
distribution-drift monitoring, CDC upsert/merge, and cohort analysis.

These are the governance ops a large-scale training-data pipeline runs
around the dedup/quality family (SURVEY.md §2.12): before a corpus
ships, eval n-gram collisions are flagged (decontamination), shard
distributions are compared against the reference snapshot (PSI drift),
and late-arriving corrections are merged keyed-latest-wins (CDC).

Scale notes (100 TB): decontamination joins on shingle keys only (at
scale a 64-bit xxhash64 of the shingle — the string form here keeps the
oracle exact); drift aggregates to a fixed bin spine (10 rows) before
any comparison; the CDC merge is one full-outer join keyed on the merge
key after a keyed-latest-wins compaction whose shuffle is the changelog,
not the base table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
from bangdatapipeline_spark.registry import REGISTRY, register
from bangdatapipeline_spark.tables import load_table, spread

# Every 17th document is "eval"; the rest are "train". Deterministic
# id-gate (same spirit as sampling.sample_hash_det).
EVAL_MOD = 17
NGRAM = 8
CONTAM_TAU = 0.05

PSI_BIN_WIDTH = 50_000.0
PSI_N_BINS = 10


@register(
    "decontaminate_ngram",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
  WHERE len(string_split(text, ' ')) >= {NGRAM}
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i:i + {NGRAM - 1}], ' ') AS shingle
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {NGRAM - 1})) AS i
        FROM tok)
),
eval_sh  AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
train_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
SELECT e.doc_id,
       CAST(count(*) AS BIGINT)                              AS n_shingles,
       CAST(count(t.shingle) AS BIGINT)                      AS n_hits,
       round(count(t.shingle) * 1.0 / count(*), 4)           AS contam_rate,
       count(t.shingle) * 1.0 / count(*) >= {CONTAM_TAU}     AS contaminated
FROM eval_sh e LEFT JOIN train_sh t ON e.shingle = t.shingle
GROUP BY e.doc_id
""",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag eval documents whose word 8-grams
    collide with any training document — the standard benchmark-leakage
    check run before a training corpus ships.

    Shingles are DISTINCT per side before the join, so the shuffle keys
    are unique (doc, shingle) pairs, never raw positions; the join is a
    plain equi-join on the shingle (at 100 TB: on ``xxhash64(shingle)``
    — 8 bytes/key instead of ~50, same collisions-don't-matter contract
    as MinHash). No document text ever crosses the wire — only shingle
    keys and doc_ids. The eval side is ~1/17 of the corpus, so Spark's
    planner can broadcast it against the big train side when it fits.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # r12: spread the projection (tokenize + 8-gram explode otherwise fuse
    # into the single-task documents scan stage — tables.spread), and pin
    # the distinct shingle table: the eval and train branches are two
    # subtrees, so unpinned the shingle pass ran twice per job
    base = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", toks.alias("toks")
    ).filter(F.size("toks") >= NGRAM)
    sh = (
        base.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (NGRAM - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, NGRAM)),
                )
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = sh.filter(is_eval)
    train_sh = sh.filter(~is_eval).select("shingle").distinct()
    hits = eval_sh.join(
        train_sh.withColumn("hit", F.lit(1)), "shingle", "left"
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("hit").alias("n_hits"),
        F.round(F.count("hit") / F.count(F.lit(1)), 4).alias("contam_rate"),
        (F.count("hit") / F.count(F.lit(1)) >= CONTAM_TAU).alias("contaminated"),
    )


@register(
    "dq_drift_psi",
    oracle=f"""
WITH binned AS (
  SELECT least(CAST(floor(o_totalprice / {PSI_BIN_WIDTH}) AS INT),
               {PSI_N_BINS - 1})     AS bin,
         o_orderkey % 2 = 0          AS in_a
  FROM orders
),
a AS (SELECT bin, count(*) AS cnt FROM binned WHERE in_a GROUP BY bin),
b AS (SELECT bin, count(*) AS cnt FROM binned WHERE NOT in_a GROUP BY bin),
tot AS (SELECT (SELECT sum(cnt) FROM a) AS ta, (SELECT sum(cnt) FROM b) AS tb),
j AS (
  SELECT coalesce(a.bin, b.bin)   AS bin,
         coalesce(a.cnt, 0)       AS cnt_a,
         coalesce(b.cnt, 0)       AS cnt_b
  FROM a FULL OUTER JOIN b ON a.bin = b.bin
)
SELECT bin, cnt_a, cnt_b,
       round((cnt_a + 0.5) / (ta + 0.5 * {PSI_N_BINS}), 6) AS share_a,
       round((cnt_b + 0.5) / (tb + 0.5 * {PSI_N_BINS}), 6) AS share_b,
       round(((cnt_a + 0.5) / (ta + 0.5 * {PSI_N_BINS})
            - (cnt_b + 0.5) / (tb + 0.5 * {PSI_N_BINS}))
            * ln(((cnt_a + 0.5) / (ta + 0.5 * {PSI_N_BINS}))
               / ((cnt_b + 0.5) / (tb + 0.5 * {PSI_N_BINS}))), 6) AS psi_term
FROM j, tot
""",
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order shards (even vs odd
    orderkey — a stand-in for yesterday's snapshot vs today's): bin
    o_totalprice on a fixed grid, compare Laplace-smoothed bin shares,
    emit the per-bin PSI contribution.

    Everything reduces to the {PSI_N_BINS}-row bin spine before any
    cross-shard math — the only shuffle is the binned count aggregate,
    and the bin-level join is trivially broadcast. Fixed bin edges (not
    data-dependent quantiles) keep the check deterministic and
    mergeable across partitions; smoothing (+0.5) keeps the log finite
    when a bin empties out on one side.
    """
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / PSI_BIN_WIDTH).cast("int"),
            F.lit(PSI_N_BINS - 1),
        ).alias("bin"),
        (F.col("o_orderkey") % 2 == 0).alias("in_a"),
    )
    a = binned.filter("in_a").groupBy("bin").agg(F.count(F.lit(1)).alias("cnt_a"))
    b = binned.filter("NOT in_a").groupBy("bin").agg(F.count(F.lit(1)).alias("cnt_b"))
    j = (
        a.join(b, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    tot = j.agg(
        F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb")
    )
    smooth = 0.5 * PSI_N_BINS
    pa = (F.col("cnt_a") + 0.5) / (F.col("ta") + smooth)
    pb = (F.col("cnt_b") + 0.5) / (F.col("tb") + smooth)
    return j.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.round(pa, 6).alias("share_a"),
        F.round(pb, 6).alias("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


# Changelog keys land in the upper custkey range so one query exercises
# update, insert, AND unchanged paths deterministically.
CDC_KEY_SHIFT = 1450


@register(
    "merge_cdc_with_deletes",
    tags=("stream_twin", "stream_test:test_cdc_merge_with_deletes_stream_equals_batch"),
    oracle=f"""
WITH latest AS (
  SELECT user_id + {CDC_KEY_SHIFT} AS key,
         value AS new_bal,
         event_type = 'error' AS is_delete
  FROM (SELECT user_id, value, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type IN ('purchase', 'error'))
  WHERE rn = 1
)
SELECT coalesce(c.c_custkey, l.key)               AS key,
       coalesce(c.c_name, 'cdc-insert')           AS name,
       round(CASE WHEN l.is_delete THEN c.c_acctbal
                  ELSE coalesce(l.new_bal, c.c_acctbal) END, 2) AS acctbal,
       CASE WHEN l.is_delete            THEN 'deleted'
            WHEN c.c_custkey IS NULL    THEN 'inserted'
            WHEN l.key IS NULL          THEN 'unchanged'
            ELSE 'updated' END                    AS merge_action
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.key
WHERE NOT (c.c_custkey IS NULL AND l.is_delete)
""",
)
def merge_cdc_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with DELETE semantics — the full CDC triple: the changelog
    carries upserts ('purchase' events) AND tombstones ('error' events),
    latest-wins per key decides which applies. The merge-audit output
    labels every surviving base/changelog row inserted / updated /
    unchanged / deleted (deleted rows keep their last base value for the
    audit trail); a tombstone for a key that never existed is a no-op
    and emits nothing — exactly `MERGE ... WHEN MATCHED AND is_delete
    THEN DELETE` of the table formats.

    Same scale shape as ``merge_cdc_upsert``: compaction shuffle sized
    by the changelog, one full-outer merge join on the key (shuffle-free
    with both sides bucketed). The tombstone leg adds no join — it is a
    flag on the compacted changelog row.
    """
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select("user_id", "value", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("user_id") + CDC_KEY_SHIFT).alias("key"),
            F.col("value").alias("new_bal"),
            (F.col("event_type") == "error").alias("is_delete"),
        )
    )
    merged = c.join(latest, c.c_custkey == latest.key, "full_outer")
    return merged.filter(
        ~(F.col("c_custkey").isNull() & F.coalesce("is_delete", F.lit(False)))
    ).select(
        F.coalesce("c_custkey", "key").alias("key"),
        F.coalesce("c_name", F.lit("cdc-insert")).alias("name"),
        F.round(
            F.when(F.col("is_delete"), F.col("c_acctbal")).otherwise(
                F.coalesce("new_bal", "c_acctbal")
            ),
            2,
        ).alias("acctbal"),
        F.when(F.col("is_delete"), "deleted")
        .when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("key").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "merge_cdc_upsert",
    tags=("stream_twin", "stream_test:test_cdc_merge_upsert_stream_equals_batch"),
    oracle=f"""
WITH latest AS (
  SELECT user_id + {CDC_KEY_SHIFT} AS key,
         value                     AS new_bal
  FROM (SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
)
SELECT coalesce(c.c_custkey, l.key)              AS key,
       coalesce(c.c_name, 'cdc-insert')          AS name,
       round(coalesce(l.new_bal, c.c_acctbal), 2) AS acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'inserted'
            WHEN l.key IS NULL       THEN 'unchanged'
            ELSE 'updated' END                   AS merge_action
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.key
""",
)
def merge_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) semantics without a table format: compact the
    changelog keyed-latest-wins (row_number over (ts, event_id) DESC),
    then one full-outer join applies matched-update / not-matched-insert
    / untouched-keep against the base snapshot.

    The compaction shuffle is sized by the changelog, not the base
    table; the merge join shuffles on the merge key — at 100 TB both
    sides pre-bucketed on the key make it shuffle-free, which is
    exactly what Delta/Iceberg MERGE does under the hood. Latest-wins is
    deterministic via the (ts, event_id) total order, never
    dropDuplicates.
    """
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("user_id") + CDC_KEY_SHIFT).alias("key"),
            F.col("value").alias("new_bal"),
        )
    )
    merged = c.join(latest, c.c_custkey == latest.key, "full_outer")
    return merged.select(
        F.coalesce("c_custkey", "key").alias("key"),
        F.coalesce("c_name", F.lit("cdc-insert")).alias("name"),
        F.round(F.coalesce("new_bal", "c_acctbal"), 2).alias("acctbal"),
        F.when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("key").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@register(
    "orders_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, o_totalprice,
         date_trunc('month', o_orderdate) AS order_month,
         min(date_trunc('month', o_orderdate))
           OVER (PARTITION BY o_custkey)  AS cohort_month
  FROM orders
)
SELECT cohort_month,
       CAST(date_diff('month', cohort_month, order_month) AS INT) AS month_offset,
       CAST(count(DISTINCT o_custkey) AS BIGINT)                  AS n_active,
       round(sum(o_totalprice), 2)                                AS revenue
FROM firsts
GROUP BY cohort_month, date_diff('month', cohort_month, order_month)
""",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue and active-customer counts per month offset — the
    standard retention/LTV triangle.

    One window (min month per customer) + one aggregate, both keyed so
    the window's user_id shuffle feeds the groupBy without a second
    exchange. Output is bounded by cohorts x offsets regardless of
    order volume.
    """
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    cohort = F.min(month).over(Window.partitionBy("o_custkey"))
    firsts = o.select(
        "o_custkey",
        "o_totalprice",
        month.alias("order_month"),
        cohort.alias("cohort_month"),
    )
    offset = (
        (F.year("order_month") - F.year("cohort_month")) * 12
        + (F.month("order_month") - F.month("cohort_month"))
    ).cast("int")
    return (
        firsts.withColumn("month_offset", offset)
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Z-order (Morton) layout clustering — multi-dimensional data skipping
# --------------------------------------------------------------------------

_Z_BITS = 8  # per-dimension resolution (16-bit z codes, 256 buckets)


def morton2(x, y, bits: int = _Z_BITS):
    """Interleave the low ``bits`` bits of two long Columns into one
    Morton (Z-order) code Column — pure per-row bit arithmetic, codegen'd.
    Shared by the ``layout_zorder`` analysis query and the
    ``Frame.to_parquet_zorder`` sink verb."""
    z = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = xb + yb if z is None else z + xb + yb
    return z


def _z_oracle() -> str:
    x = "(o_custkey % 256)"
    y = "(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 256)"
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return f"""
WITH coded AS (
  SELECT {x} AS x, {y} AS y, ({z}) AS z FROM orders
)
SELECT CAST(z >> 8 AS INT)            AS bucket,
       CAST(count(*) AS BIGINT)       AS n_rows,
       CAST(min(x) AS INT)            AS min_x,
       CAST(max(x) AS INT)            AS max_x,
       CAST(min(y) AS INT)            AS min_y,
       CAST(max(y) AS INT)            AS max_y,
       CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS INT) AS bbox_area
FROM coded
GROUP BY 1
"""


@register("layout_zorder", oracle=_z_oracle())
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering: interleave the bits of two
    bucketized sort dimensions (customer, order day) into one z code and
    report, per 256-code z range (= one target file at scale), the row
    count and the per-dimension min/max bounding box.

    This is the OPTIMIZE ZORDER primitive of lakehouse table formats:
    writing files in z order keeps BOTH dimensions' min/max footer stats
    tight per file (small bbox_area here = proof), so a predicate on
    EITHER column prunes most files — single-column sorting only prunes
    its own column. The z code is pure per-row bit arithmetic (narrow,
    codegen'd, no shuffle); the one shuffle is the per-bucket stats
    aggregate, and in a real write it is the range-partitioned sort the
    writer needs anyway.

    100 TB: compute z at ingest, ``repartitionByRange(z)`` +
    ``sortWithinPartitions(z)``, write; readers get multi-dim skipping
    from plain parquet min/max stats with no format extension.
    """
    o = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")) % 256).cast("long")
    coded = o.select(x.alias("x"), y.alias("y"), morton2(x, y).alias("z"))
    return coded.groupBy(F.shiftright(F.col("z"), 8).cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").cast("int").alias("min_x"),
        F.max("x").cast("int").alias("max_x"),
        F.min("y").cast("int").alias("min_y"),
        F.max("y").cast("int").alias("max_y"),
        ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1))
        .cast("int")
        .alias("bbox_area"),
    )


# --------------------------------------------------------------------------
# Semantic dedup via cluster-then-pair (SemDeDup-style)
# --------------------------------------------------------------------------

_SEM_K = 8       # clusters; production k scales ~ n/avg_cluster_size
_SEM_TAU = 0.3   # within-cluster cosine threshold (~top 2% of pair sims)


def _sem_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import _duck_dot

    return f"""
WITH c0 AS (
  SELECT CAST(vec_id AS INT) AS c_id, embedding AS c_emb,
         {_duck_dot('embedding', 'embedding')} AS csq
  FROM embeddings WHERE vec_id < {_SEM_K}
),
a1 AS (
  SELECT e.vec_id, c.c_id, e.embedding,
         1.0 + c.csq - 2 * {_duck_dot('e.embedding', 'c.c_emb')} AS d2
  FROM embeddings e CROSS JOIN c0 c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY d2 ASC, c.c_id ASC) = 1
),
pairs AS (
  SELECT a.c_id, a.vec_id AS id_a, b.vec_id AS id_b,
         {_duck_dot('a.embedding', 'b.embedding')} AS sim
  FROM a1 a JOIN a1 b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
)
SELECT id_b AS vec_id, CAST(c_id AS INT) AS cluster,
       CAST(min(id_a) AS BIGINT) AS dup_of,
       round(max(sim), 6) AS max_sim
FROM pairs WHERE sim >= {_SEM_TAU}
GROUP BY id_b, c_id
"""


@register("dedup_semantic_clustered", oracle=_sem_oracle())
def dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings, then compare pairs ONLY
    within each cluster — a vector is a semantic duplicate if some
    lower-id vector in its cluster has cosine >= tau. Output: one row
    per REMOVED vector with its cluster, its keeper (lowest-id dup
    partner), and its max within-cluster similarity.

    This is the scale answer to the all-pairs threshold join: k-means
    shrinks the pair space from n^2/2 to sum_c |cluster_c|^2/2 (with
    k ~ n/|c| that is a ~k-fold cut), and the within-cluster pair join
    is a plain equi-join on the cluster id. Plan: one streamed pass
    assigns clusters IN-ROW against the broadcast k-centroid array
    (zero shuffle, same fold as ``ml_kmeans_2iter``); the pair join
    shuffles the corpus once on c_id. Deterministic centroids (first k
    vectors, one assignment round) keep the op hash-checkable; at
    100 TB use more Lloyd rounds and k in the thousands so cluster
    keys are high-cardinality (skew: cap cluster size and spill the
    remainder to the banded-LSH path in ``dedup_near_embedding``).
    Distances d^2 = 1 + |c|^2 - 2x.c on the unit-norm corpus, dot by
    the shared left-to-right double fold — bit-identical across
    engines, so pair sims hash-check exactly at round-6.
    """
    pairs = _semantic_pairs(spark, sf_dir)
    return pairs.groupBy(
        F.col("id_b").alias("vec_id"), F.col("c_id").alias("cluster")
    ).agg(
        F.min("id_a").alias("dup_of"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )


def _semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster embedding pairs with cosine >= _SEM_TAU:
    (c_id, id_a < id_b, sim). Cluster assignment is the in-row argmin
    fold against the broadcast k-centroid array (zero shuffle); the
    pair pass is a per-cluster GEMM (one Arrow-grouped BLAS matmul per
    cluster — SemDeDup's own per-cluster numpy shape, and the same
    float64-matmul-vs-fold numeric contract ``gemm_pairs_tiled``
    hash-proves; the JVM fold-join form measured 4.2 s at sf0.1 vs
    ~1 s for this). One cluster must fit a task — production caps
    cluster size (split oversized clusters on a secondary hash) which
    also bounds the c_id-key skew of the single shuffle."""
    import numpy as np
    import pandas as pd

    from bangdatapipeline_spark.operators.similarity import dot_double

    e = load_table(spark, sf_dir, "embeddings")
    c0 = e.filter(F.col("vec_id") < _SEM_K).select(
        F.col("vec_id").cast("int").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        dot_double(F.col("embedding"), F.col("embedding")).alias("csq"),
    )
    cand = c0.agg(
        F.array_sort(F.collect_list(F.struct("c_id", "c_emb", "csq"))).alias("cands")
    )
    init = F.struct(
        F.lit(float("inf")).cast("double").alias("d2"),
        F.lit(-1).alias("c_id"),
    )

    def step(acc, c):
        d2 = F.lit(1.0) + c["csq"] - 2 * dot_double(F.col("embedding"), c["c_emb"])
        return F.when(
            d2 < acc["d2"], F.struct(d2.alias("d2"), c["c_id"].alias("c_id"))
        ).otherwise(acc)

    assigned = (
        e.crossJoin(F.broadcast(cand))
        .select(
            "vec_id",
            "embedding",
            F.aggregate(F.col("cands"), init, step)["c_id"].alias("c_id"),
        )
    )
    empty = {"c_id": [], "id_a": [], "id_b": [], "sim": []}

    def cluster_pairs(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame(empty)
        ids = pdf["vec_id"].to_numpy()
        m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        sims = m @ m.T  # one BLAS call per cluster
        mask = (sims >= _SEM_TAU) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(mask)
        return pd.DataFrame(
            {
                "c_id": np.full(len(r), key[0]),
                "id_a": ids[r],
                "id_b": ids[c],
                "sim": sims[r, c],
            }
        )

    return assigned.groupBy("c_id").applyInPandas(
        cluster_pairs, "c_id int, id_a long, id_b long, sim double"
    )


def _sem_recall_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import _duck_dot

    return f"""
WITH c0 AS (
  SELECT CAST(vec_id AS INT) AS c_id, embedding AS c_emb,
         {_duck_dot('embedding', 'embedding')} AS csq
  FROM embeddings WHERE vec_id < {_SEM_K}
),
a1 AS (
  SELECT e.vec_id, c.c_id, e.embedding,
         1.0 + c.csq - 2 * {_duck_dot('e.embedding', 'c.c_emb')} AS d2
  FROM embeddings e CROSS JOIN c0 c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY d2 ASC, c.c_id ASC) = 1
),
cap AS (
  SELECT count(*) AS n_capt
  FROM a1 a JOIN a1 b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  WHERE {_duck_dot('a.embedding', 'b.embedding')} >= {_SEM_TAU}
),
tru AS (
  SELECT count(*) AS n_truth
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_duck_dot('a.embedding', 'b.embedding')} >= {_SEM_TAU}
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_capt AS BIGINT)  AS n_capt,
       CASE WHEN n_truth = 0 THEN NULL
            ELSE floor(n_capt * 1.0 / n_truth * 10000 + 0.5) / 10000
       END AS recall_b
FROM tru, cap
"""


@register("eval_semantic_recall", oracle=_sem_recall_oracle())
def eval_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the clustered semantic dedup: what fraction
    of the EXACT tau-similar pair set does the within-cluster pass
    capture? Pairs are lost exactly when a similar pair's endpoints land
    in different clusters — the recall/cost dial of SemDeDup (more
    clusters = cheaper but lossier). Precision is 1.0 by construction
    (both sides use exact sims at the same tau), so only recall is
    reported. Same evaluator role as ``eval_dedup_recall`` (MinHash) and
    ``eval_rank_metrics`` (ANN); the truth side is the bounded exact
    all-pairs baseline those evaluators also pay — production grades a
    SAMPLE of the corpus instead.

    Metric arithmetic is two scalar counters crossJoined as lazy 1-row
    broadcasts; the ratio takes the IEEE floor-round (small denominator,
    docs/dialect_notes.md).
    """
    from bangdatapipeline_spark.operators.similarity import (
        gemm_pairs_tiled,
    )

    e = load_table(spark, sf_dir, "embeddings")
    truth = gemm_pairs_tiled(
        e.select("vec_id", "label", "embedding"), attr_col="label", tau=_SEM_TAU
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    n_capt = _semantic_pairs(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_capt")
    )
    # Zero-pair guard: div-by-zero semantics differ across engines (Spark
    # NULL, DuckDB inf/NaN) — an explicit NULL makes the empty-truth case
    # well-defined and identical on both sides.
    rec = F.col("n_capt") * 1.0 / F.col("n_truth")
    return n_truth.crossJoin(n_capt).select(
        "n_truth",
        "n_capt",
        F.when(
            F.col("n_truth") == 0, F.lit(None).cast("double")
        ).otherwise(F.floor(rec * 10000 + 0.5) / 10000).alias("recall_b"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling toward a target domain
# --------------------------------------------------------------------------

_DSIR_B = 64              # hashed-unigram feature buckets
_DSIR_TARGET_LANG = "en"  # stand-in target domain


def _dsir_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
bt AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(tok), 1, 13)) AS BIGINT) % {_DSIR_B} AS bucket
  FROM toks
),
spine AS (SELECT unnest(generate_series(0, {_DSIR_B} - 1)) AS bucket),
tcnt AS (SELECT bucket, count(*) AS c FROM bt
         WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
rcnt AS (SELECT bucket, count(*) AS c FROM bt GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM bt WHERE lang = '{_DSIR_TARGET_LANG}') AS tt,
               (SELECT count(*) FROM bt) AS tr),
model AS (
  SELECT s.bucket,
         CAST(floor(ln(CAST((coalesce(t.c, 0) + 1) * (tot.tr + {_DSIR_B}) AS DOUBLE)
                       / CAST((coalesce(r.c, 0) + 1) * (tot.tt + {_DSIR_B}) AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT) AS lr_n
  FROM spine s LEFT JOIN tcnt t USING (bucket) LEFT JOIN rcnt r USING (bucket), tot
)
SELECT b.doc_id, b.lang,
       CAST(count(*) AS BIGINT) AS n_toks,
       floor(sum(m.lr_n) / 1000.0 + 0.5) / 1000000.0 AS logw,
       sum(m.lr_n) > 0 AS selected
FROM bt b JOIN model m USING (bucket)
GROUP BY b.doc_id, b.lang
"""


@register("sample_importance_dsir", oracle=_dsir_oracle())
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by its importance weight toward a target
    domain under hashed-unigram bag-of-buckets language models —
    log w(doc) = sum over tokens of log(p_target(bucket)/p_raw(bucket))
    with Laplace smoothing — and flag the docs whose weight is positive
    (more target-like than raw-like) for resampling. Target here: the
    '{_DSIR_TARGET_LANG}' slice standing in for the curated domain.

    Cross-engine exactness: the smoothed ratio is formed from EXACT
    integer counts ((c_t+1)(T_r+B)) / ((c_r+1)(T_t+B)) so both engines
    divide identical doubles; the single ln() lands on a 1e-9 lattice
    (floor(x*1e9+0.5) as BIGINT) and per-doc scores then accumulate in
    exact integer arithmetic — order-independent, so the aggregate
    hash-checks despite float logs. `selected` is an integer-sign test.

    Scale: the model is {_DSIR_B} rows built from one token-bucket
    aggregation (map-side combined; shuffle cardinality = B) and
    BROADCAST into the scoring join; scoring shuffles only per-doc
    partial sums keyed on doc_id. 100 TB of raw text streams once —
    this is the 'cheap bag-of-hashed-ngrams proxy beats a neural
    scorer you cannot afford to run' argument of the paper. (The
    exact-int ratio products stay far under 2^53 here; at larger
    corpora compute the two log terms separately before the lattice.)
    """
    d = load_table(spark, sf_dir, "documents")
    # r12: spread the projection (tokenize + per-token md5 bucketing
    # otherwise fuse into the single-task documents scan — tables.spread)
    # and pin the bucketed token stream: FOUR subtrees read it (target
    # counts, raw counts, totals, and the scoring join), so unpinned the
    # hashing pass ran four times per job
    bt = spread(d.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 13), 16, 10).cast("long") % _DSIR_B
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    spine = spark.range(_DSIR_B).select(F.col("id").alias("bucket"))
    tcnt = (
        bt.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    rcnt = bt.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    tot = bt.agg(
        F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)).alias("tt"),
        F.count(F.lit(1)).alias("tr"),
    )
    model = (
        spine.join(tcnt, "bucket", "left")
        .join(rcnt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                F.log(
                    ((F.coalesce(F.col("c_t"), F.lit(0)) + 1) * (F.col("tr") + _DSIR_B)).cast("double")
                    / ((F.coalesce(F.col("c_r"), F.lit(0)) + 1) * (F.col("tt") + _DSIR_B)).cast("double")
                )
                * 1e9
                + 0.5
            )
            .cast("bigint")
            .alias("lr_n"),
        )
    )
    return (
        bt.join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (F.floor(F.sum("lr_n") / 1000.0 + 0.5) / 1000000.0).alias("logw"),
            (F.sum("lr_n") > 0).alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffle (training-shard layout)
# --------------------------------------------------------------------------

_EPOCHS = 2
_SHUF_SHARDS = 8


@register(
    "layout_epoch_shuffle",
    oracle=f"""
WITH ep AS (SELECT unnest(generate_series(0, {_EPOCHS} - 1)) AS epoch),
r AS (
  SELECT ep.epoch, d.doc_id,
         md5(CAST(ep.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS gate
  FROM documents d, ep
)
SELECT CAST(epoch AS INT) AS epoch,
       CAST(CAST(('0x' || substr(gate, 1, 13)) AS BIGINT) % {_SHUF_SHARDS} AS INT)
         AS shard,
       doc_id,
       CAST(row_number() OVER (
           PARTITION BY epoch,
                        CAST(('0x' || substr(gate, 1, 13)) AS BIGINT) % {_SHUF_SHARDS}
           ORDER BY gate, doc_id) AS INT) AS pos
FROM r
""",
)
def layout_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle for training shards: each
    (epoch, doc) gets a pseudo-random gate md5(epoch:doc_id); the gate's
    52-bit prefix picks the shard and ordering by gate within the shard
    gives the read position — a different, reproducible permutation per
    epoch with NO stored shuffle state (the data-loader contract of
    large-scale training: any worker can recompute its shard order from
    (epoch, shard) alone).

    Scale: the gate is a scan-stage projection (narrow, codegen'd —
    epochs via explode, no join) and the only wide op is the per-(epoch,
    shard) row_number window — shard count scales with the cluster, so
    each window partition is one task-sized run; nothing global is
    sorted. Same md5-determinism contract as the ``sample_*`` family:
    partition-count and arrival-order invariant, so the layout
    hash-checks exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    gate = F.md5(
        F.concat(
            F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
        )
    )
    r = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(_EPOCHS - 1))).alias("epoch"),
        "doc_id",
    ).select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        gate.alias("gate"),
    )
    shard = (
        F.conv(F.substring(F.col("gate"), 1, 13), 16, 10).cast("long") % _SHUF_SHARDS
    ).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy("gate", "doc_id")
    return (
        r.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select("epoch", "shard", "doc_id", "pos")
    )


# --------------------------------------------------------------------------
# Gopher-style document quality rules (deterministic, integer-exact)
# --------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 20, 90
# mean word length band [4.0, 4.9], tested as integer cross-products
_GOPHER_MWL_LO10, _GOPHER_MWL_HI10 = 40, 49
_GOPHER_MIN_STOP = 2
_GOPHER_REP_DEN = 8  # most frequent word must be <= 1/8 of tokens


def _gopher_oracle() -> str:
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(toks, w -> len(w)), (a, b) -> a + b)
              AS BIGINT) AS n_tok_chars,
         CAST(len(list_filter(toks, w -> w IN ({stops}))) AS BIGINT) AS n_stop
  FROM t
),
rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_n
  FROM (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w)
  GROUP BY doc_id
)
SELECT m.doc_id, m.lang, m.n_words, m.n_tok_chars, m.n_stop, r.top_n,
       m.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS r_words,
       {_GOPHER_MWL_LO10} * m.n_words <= 10 * m.n_tok_chars
         AND 10 * m.n_tok_chars <= {_GOPHER_MWL_HI10} * m.n_words    AS r_mwl,
       m.n_stop >= {_GOPHER_MIN_STOP}                                 AS r_stop,
       {_GOPHER_REP_DEN} * r.top_n <= m.n_words                       AS r_rep,
       (m.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
         AND {_GOPHER_MWL_LO10} * m.n_words <= 10 * m.n_tok_chars
         AND 10 * m.n_tok_chars <= {_GOPHER_MWL_HI10} * m.n_words
         AND m.n_stop >= {_GOPHER_MIN_STOP}
         AND {_GOPHER_REP_DEN} * r.top_n <= m.n_words                 AS passes
FROM m JOIN rep r USING (doc_id)
"""


@register("text_gopher_rules", oracle=_gopher_oracle())
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021,
    arXiv:2112.11446 Table A1, adapted to the synthetic corpus): per doc,
    word-count bounds, mean-word-length band, minimum stopword hits, and
    a max-repetition rule (most frequent word <= 1/{_GOPHER_REP_DEN} of
    tokens), plus the conjunction. Every counter and every rule is
    INTEGER arithmetic (mean word length tested by cross-multiplication,
    never divided), so the report is hash-exact by construction.

    Plan/scale: the whole op is ONE scan-stage projection — even the
    repetition counter stays in-row (sort the token array, fold a
    (prev, run, best) struct to the longest equal-run = max frequency;
    the oracle states it relationally, same counts). Zero shuffles,
    zero joins: exactly what a per-document filter must look like when
    100 TB of text streams through it (asserted in tests/test_plans.py).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("bigint")
    n_tok_chars = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stops, w))).cast(
        "bigint"
    )
    # in-row max word frequency: longest equal-run of the sorted tokens
    run_init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def run_step(acc, w):
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_n = F.aggregate(
        F.array_sort(toks), run_init, run_step, lambda acc: acc["best"]
    )
    m = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_tok_chars.alias("n_tok_chars"),
        n_stop.alias("n_stop"),
        top_n.alias("top_n"),
    )
    r_words = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_mwl = (_GOPHER_MWL_LO10 * F.col("n_words") <= 10 * F.col("n_tok_chars")) & (
        10 * F.col("n_tok_chars") <= _GOPHER_MWL_HI10 * F.col("n_words")
    )
    r_stop = F.col("n_stop") >= _GOPHER_MIN_STOP
    r_rep = _GOPHER_REP_DEN * F.col("top_n") <= F.col("n_words")
    return m.select(
        "doc_id",
        "lang",
        "n_words",
        "n_tok_chars",
        "n_stop",
        "top_n",
        r_words.alias("r_words"),
        r_mwl.alias("r_mwl"),
        r_stop.alias("r_stop"),
        r_rep.alias("r_rep"),
        (r_words & r_mwl & r_stop & r_rep).alias("passes"),
    )


# --------------------------------------------------------------------------
# Embedding-space eval decontamination
# --------------------------------------------------------------------------

_DECON_SEM_TAU = 0.3  # same tau family as the pair ops


def _decon_sem_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import _duck_dot

    return f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding AS ev_emb FROM embeddings
  WHERE vec_id % {EVAL_MOD} = 0
),
hits AS (
  SELECT t.vec_id, e.eval_id, {_duck_dot('t.embedding', 'e.ev_emb')} AS sim
  FROM embeddings t CROSS JOIN ev e
  WHERE t.vec_id % {EVAL_MOD} <> 0
),
flagged AS (SELECT * FROM hits WHERE sim >= {_DECON_SEM_TAU})
SELECT vec_id,
       CAST(count(*) AS BIGINT) AS n_eval_hits,
       CAST(min(eval_id) FILTER (WHERE (sim, -eval_id) = mx) AS BIGINT)
         AS closest_eval,
       round(max(sim), 6) AS max_sim
FROM (SELECT *, max((sim, -eval_id)) OVER (PARTITION BY vec_id) AS mx
      FROM flagged)
GROUP BY vec_id
"""


@register("decontaminate_semantic", oracle=_decon_sem_oracle())
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval decontamination — the semantic sibling of
    ``decontaminate_ngram``: a training vector is contaminated when its
    cosine to ANY eval-set vector (same deterministic id-gate, every
    {EVAL_MOD}th) reaches tau. Near-paraphrases of eval items slip past
    n-gram matching; this is the standard second net. Output per flagged
    train vector: hit count, the closest eval item (sim desc, eval_id
    asc tie-break via the (sim, -id) struct-max), max sim at round-6.

    Plan/scale: the EVAL side is bounded and broadcast (the knn
    query-side pattern) — 100 TB of train vectors stream through one
    narrow pass with zero corpus shuffle; only per-vector flagged rows
    (a tiny fraction) reach the aggregate. r12 (guide §4.1/§4.2): the
    pair pass runs on :func:`gemm_cross_broadcast` — one GEMM per Arrow
    batch against the broadcast eval matrix, exact fold re-score of the
    tau-margin candidates — instead of a BroadcastNestedLoopJoin that
    shipped every (train, eval) pair's two 64-dim arrays through the
    per-pair Arrow fold (|train| x |eval| x 128 doubles per run). Sims
    and the tau cut are bit-identical to the fold (kernel docstring).
    """
    from bangdatapipeline_spark.operators.similarity import gemm_cross_broadcast

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.filter(F.col("vec_id") % EVAL_MOD == 0)
    train = e.filter(F.col("vec_id") % EVAL_MOD != 0)
    hits = gemm_cross_broadcast(spark, train, ev, tau=_DECON_SEM_TAU).select(
        F.col("a_id").alias("vec_id"), F.col("b_id").alias("eval_id"), "sim"
    )
    best = F.max(F.struct(F.col("sim"), (-F.col("eval_id")).alias("neg_id")))
    return hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        (-best["neg_id"]).cast("bigint").alias("closest_eval"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )


@register("decontaminate_semantic_tiled", oracle=_decon_sem_oracle())
def decontaminate_semantic_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decontaminate_semantic`` through the cross-table tiled GEMM
    (``similarity.gemm_cross_tiled``) — the kernel for when the EVAL set
    itself outgrows a broadcast (org-wide benchmark suites at corpus
    scale): neither side is collected or broadcast; train and eval rows
    both stream through Arrow into (ia, ib) tiles, one BLAS matmul per
    tile, survivors only. Registered against the SAME oracle as the
    broadcast form — the hash-equality of the two plans is the proof the
    kernel swap preserves semantics (the knn_threshold_pairs /
    knn_threshold_gemm precedent).
    """
    from bangdatapipeline_spark.operators.similarity import gemm_cross_tiled

    e = load_table(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") % EVAL_MOD != 0)
    ev = e.filter(F.col("vec_id") % EVAL_MOD == 0)
    hits = gemm_cross_tiled(train, ev, tau=_DECON_SEM_TAU).select(
        F.col("a_id").alias("vec_id"),
        F.col("b_id").alias("eval_id"),
        "sim",
    )
    best = F.max(F.struct(F.col("sim"), (-F.col("eval_id")).alias("neg_id")))
    return hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        (-best["neg_id"]).cast("bigint").alias("closest_eval"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )


# --------------------------------------------------------------------------
# Record linkage / entity resolution: block -> score -> match
# --------------------------------------------------------------------------

_ER_CLONE_EVERY = 10
_ER_CLONE_OFFSET = 1_000_000_000
_ER_MAX_ED = 2


def _er_ctes() -> str:
    """base/dirty/matched-pairs CTE chain, shared by er_blocked_matching
    and er_golden_record (which differ only in what they emit)."""
    return f"""
WITH base AS (
  SELECT c_custkey AS rid, c_name AS name, c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
dirty AS (
  SELECT * FROM base
  UNION ALL
  SELECT rid + {_ER_CLONE_OFFSET},
         substr(name, 1, 3) || substr(name, 5),
         c_nationkey, c_mktsegment, cents
  FROM base WHERE rid % {_ER_CLONE_EVERY} = 0
),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b, a.c_nationkey, a.c_mktsegment,
         levenshtein(a.name, b.name) AS name_ed,
         a.cents = b.cents AS bal_eq
  FROM dirty a JOIN dirty b
    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
   AND a.rid < b.rid
)
"""


def _er_oracle() -> str:
    return (
        _er_ctes()
        + f"""
SELECT id_a, id_b, CAST(c_nationkey AS INT) AS nation,
       c_mktsegment AS segment, CAST(name_ed AS INT) AS name_ed
FROM pairs
WHERE bal_eq AND name_ed <= {_ER_MAX_ED}
"""
    )


def _er_golden_oracle() -> str:
    return (
        _er_ctes().replace("WITH base AS", "WITH RECURSIVE base AS")
        + f"""
, matched AS (
  SELECT id_a, id_b FROM pairs WHERE bal_eq AND name_ed <= {_ER_MAX_ED}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM matched
  UNION ALL
  SELECT id_b, id_a FROM matched
), nodes AS (
  SELECT DISTINCT a AS id FROM edges
), reach(node, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
), lab AS (
  SELECT node AS rid, min(r) AS entity_id FROM reach GROUP BY node
), members AS (
  SELECT l.entity_id, d.rid, d.name, d.c_nationkey, d.c_mktsegment, d.cents
  FROM lab l JOIN dirty d ON d.rid = l.rid
)
SELECT entity_id,
       CAST(count(*) AS BIGINT)                       AS n_records,
       min_by(name, rid)                              AS golden_name,
       CAST(any_value(c_nationkey) AS INT)            AS nation,
       any_value(c_mktsegment)                        AS segment,
       CAST(any_value(cents) AS BIGINT)               AS cents,
       string_agg(CAST(rid AS VARCHAR), ',' ORDER BY rid) AS member_ids
FROM members
GROUP BY entity_id
"""
    )


def _er_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirtied customer registry both ER operators run against."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("name"),
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    clones = base.filter(F.col("rid") % _ER_CLONE_EVERY == 0).select(
        (F.col("rid") + _ER_CLONE_OFFSET).alias("rid"),
        F.concat(
            F.substring("name", 1, 3), F.expr("substring(name, 5)")
        ).alias("name"),
        "c_nationkey",
        "c_mktsegment",
        "cents",
    )
    return base.unionByName(clones)


@register("er_blocked_matching", oracle=_er_oracle())
def er_blocked_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) in the canonical block ->
    score -> match shape: a dirtied customer registry (every
    {_ER_CLONE_EVERY}th record re-entered under a new id with a typo'd
    name) is blocked on stable attributes (nation, segment) so the
    quadratic pairwise scoring runs only WITHIN blocks; candidate pairs
    are scored with name edit distance plus an exact balance check and
    matched at ed <= {_ER_MAX_ED}.

    Blocking is the whole scale story: the pair space drops from n^2/2
    to sum_b |block_b|^2/2, and the one shuffle keys on the block
    attributes — exactly the SemDeDup argument with hand-chosen keys
    instead of learned clusters. At 100 TB, blocking keys are chosen
    (or salted with a secondary key) so block sizes stay task-bounded;
    oversized blocks sub-block rather than broadcast. Scoring is all
    JVM-side (`levenshtein` is a built-in on BOTH engines, integer
    result; balances compare as exact cents) — no UDF, no float
    hazard, hash-exact output.
    """
    dirty = _er_dirty(spark, sf_dir)
    a = dirty.select(
        F.col("rid").alias("id_a"),
        F.col("name").alias("name_a"),
        "c_nationkey",
        "c_mktsegment",
        F.col("cents").alias("cents_a"),
    )
    b = dirty.select(
        F.col("rid").alias("id_b"),
        F.col("name").alias("name_b"),
        "c_nationkey",
        "c_mktsegment",
        F.col("cents").alias("cents_b"),
    )
    return (
        a.join(b, ["c_nationkey", "c_mktsegment"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("cents_a") == F.col("cents_b"))
            & (F.levenshtein("name_a", "name_b") <= _ER_MAX_ED)
        )
        .select(
            "id_a",
            "id_b",
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.levenshtein("name_a", "name_b").cast("int").alias("name_ed"),
        )
    )


@register("er_golden_record", oracle=_er_golden_oracle())
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record construction) — the step AFTER entity
    matching: matched pairs become entities via connected components
    (min-label propagation, the shared graph_util kernel), then each
    entity merges into one golden record. Survivorship rules here:
    identity and name from the LOWEST record id (oldest source wins —
    deterministic), block attributes and balance carried as-is (equal
    within an entity by construction: blocking fixes nation/segment and
    the match predicate fixes cents along every edge, hence across the
    component), plus an audit trail of merged member ids.

    Only multi-record entities appear (singletons need no merge), so the
    output is bounded by match volume. Scale shape: CC rounds are
    equi-join + min-agg on the (small) matched-pair graph; the member
    join back to the registry is one equi-join on rid; the merge is one
    groupBy(entity_id) with min_by/first aggregates — nothing touches
    unmatched rows after the blocked match.

    cites SURVEY.md §2 (er_blocked_matching row) — this is its natural
    completion; same blocking scale argument.
    """
    from bangdatapipeline_spark.operators.graph_util import (
        min_label_components,
    )

    pairs = REGISTRY["er_blocked_matching"].fn(spark, sf_dir).select(
        "id_a", "id_b"
    )
    labels = min_label_components(pairs).select(
        F.col("node").alias("rid"), F.col("label").alias("entity_id")
    )
    members = labels.join(_er_dirty(spark, sf_dir), "rid")
    return members.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min_by("name", "rid").alias("golden_name"),
        F.first("c_nationkey").cast("int").alias("nation"),
        F.first("c_mktsegment").alias("segment"),
        F.first("cents").cast("long").alias("cents"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("rid")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("member_ids"),
    )


# --------------------------------------------------------------------------
# CDC MERGE through the transactional table format (ACID sink, hash-checked)
# --------------------------------------------------------------------------

# Keys straddle the base custkey range so update / insert / delete /
# unchanged all occur at every sf (user_id max ≈ custkey max / 10).
_TXN_SHIFT = 100


@register(
    "txn_cdc_merge_table",
    tags=("stream_twin", "stream_test:test_txn_table_stream_merge_equals_batch"),
    oracle=f"""
WITH ch AS (
  SELECT user_id + {_TXN_SHIFT}                  AS key,
         'cdc-' || CAST(user_id AS VARCHAR)      AS name,
         round(value, 2)                         AS bal,
         event_type = 'error'                    AS is_delete,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type IN ('purchase', 'error')
),
latest AS (SELECT key, name, bal, is_delete FROM ch WHERE rn = 1)
SELECT coalesce(l.key, c.c_custkey)   AS c_custkey,
       coalesce(l.name, c.c_name)     AS c_name,
       coalesce(l.bal, c.c_acctbal)   AS c_acctbal
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.key
WHERE NOT coalesce(l.is_delete, false)
""",
)
def txn_cdc_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE through the toy delta-log table format
    (``sources.txn_table``): CREATE the customer snapshot as a
    hash-bucketed transactional table, MERGE the events changelog
    (latest-wins upserts + 'error' tombstones) with file-level
    copy-on-write, and return the COMMITTED table's final state.

    Unlike ``merge_cdc_with_deletes`` (which returns the merge-audit
    DataFrame), the thing hash-checked here is what a reader of the
    table sees AFTER the transaction log commits — create, bucketed data
    files, manifest, merge commit, snapshot resolution all sit on the
    verified path. The oracle is the equivalent one-shot MERGE in SQL.

    The result is pinned via ``localCheckpoint`` (block storage, not the
    temp table files) so the on-disk demo table can be removed before
    returning — the returned plan reads materialized blocks, never the
    deleted directory. Scale shape: the merge rewrites only touched
    buckets (O(changed data)); the checkpoint stands in for the table
    living permanently on object storage.
    """
    import os
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.sources.txn_table import TxnTable

    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    path = os.path.join(tempfile.gettempdir(), f"txn_q_{uuid.uuid4().hex[:8]}")
    try:
        table = TxnTable.create(
            spark,
            path,
            c.select("c_custkey", "c_name", "c_acctbal"),
            key_col="c_custkey",
            n_buckets=8,
        )
        changelog = ev.filter(
            F.col("event_type").isin("purchase", "error")
        ).select(
            (F.col("user_id") + _TXN_SHIFT).alias("c_custkey"),
            F.concat(F.lit("cdc-"), F.col("user_id").cast("string")).alias("c_name"),
            F.round("value", 2).alias("c_acctbal"),
            (F.col("event_type") == "error").alias("is_delete"),
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
            "event_id",
        )
        table.merge_cdc(changelog, app_id="txn-q", version=1)
        return table.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "txn_time_travel",
    oracle=f"""
WITH base AS (
  SELECT c_custkey AS key,
         {cents_sql("c_acctbal")} AS bal_cents
  FROM customer
),
v1 AS (
  SELECT key,
         bal_cents + CASE WHEN key % 7 = 0 THEN 10000 ELSE 0 END AS bal_cents
  FROM base WHERE key % 11 <> 0
),
v2 AS (
  SELECT key,
         bal_cents + CASE WHEN key % 5 = 0 THEN 500 ELSE 0 END AS bal_cents
  FROM v1
  UNION ALL
  SELECT key + 1000000000 AS key, bal_cents FROM base WHERE key % 13 = 0
)
SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
       CAST(min(key) AS BIGINT) AS min_key, CAST(max(key) AS BIGINT) AS max_key
FROM base
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT), CAST(sum(bal_cents) AS BIGINT),
       CAST(min(key) AS BIGINT), CAST(max(key) AS BIGINT) FROM v1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT), CAST(sum(bal_cents) AS BIGINT),
       CAST(min(key) AS BIGINT), CAST(max(key) AS BIGINT) FROM v2
""",
)
def txn_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-pinned reads (``SELECT ... VERSION AS OF v``) through the
    transaction log: CREATE the customer snapshot (commit 0), apply two
    CDC merges (commit 1: balance bump on keys = 0 mod 7 plus tombstones
    on 0 mod 11; commit 2: +500 on surviving keys = 0 mod 5 plus inserts
    at key + 1e9 for 0 mod 13 — the scd2_apply_changes drift recipe), and
    hash-check the per-version row-count / balance-sum / key-range
    aggregate of ALL THREE historical snapshots read via
    ``read(at_version=v)``. The oracle reconstructs each version's row
    set independently in SQL, so a time-travel read that leaked a later
    commit's files (or dropped a carried-over bucket) fails the hash.

    Scale shape: a historical snapshot is just a shorter log-prefix
    replay — manifest bookkeeping on the driver, never row data; each
    versioned read scans only that version's live files. The
    vacuum-retention boundary (a reclaimed version raises with the
    retention story) is pinned in tests/test_txn_table.py.
    """
    import os
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.sources.txn_table import TxnTable

    c = load_table(spark, sf_dir, "customer")
    cents = cents_col(F.col("c_acctbal"))
    base = c.select(F.col("c_custkey").alias("key"), cents.alias("bal_cents"))
    key = F.col("key")
    path = os.path.join(tempfile.gettempdir(), f"txn_tt_{uuid.uuid4().hex[:8]}")
    try:
        table = TxnTable.create(spark, path, base, key_col="key", n_buckets=4)
        # commit 1: updates (keys = 0 mod 7, surviving) + deletes (0 mod 11)
        log1 = (
            base.filter((key % 7 == 0) & (key % 11 != 0))
            .select(
                "key",
                (F.col("bal_cents") + F.lit(10000)).alias("bal_cents"),
                F.lit(False).alias("is_delete"),
            )
            .unionAll(
                base.filter(key % 11 == 0).select(
                    "key", "bal_cents", F.lit(True).alias("is_delete")
                )
            )
            .withColumn("ts_us", F.lit(1).cast("long"))
            .withColumn("event_id", F.col("key"))
        )
        table.merge_cdc(log1, app_id="tt", version=1)
        # commit 2: +500 on surviving keys = 0 mod 5 (absolute new value
        # includes commit 1's bump) + inserts at key + 1e9 for 0 mod 13
        log2 = (
            base.filter((key % 5 == 0) & (key % 11 != 0))
            .select(
                "key",
                (
                    F.col("bal_cents")
                    + F.when(key % 7 == 0, 10000).otherwise(0)
                    + F.lit(500)
                ).alias("bal_cents"),
                F.lit(False).alias("is_delete"),
            )
            .unionAll(
                base.filter(key % 13 == 0).select(
                    (key + F.lit(1000000000)).alias("key"),
                    "bal_cents",
                    F.lit(False).alias("is_delete"),
                )
            )
            .withColumn("ts_us", F.lit(1).cast("long"))
            .withColumn("event_id", F.col("key"))
        )
        table.merge_cdc(log2, app_id="tt", version=2)
        versions = [
            table.read(at_version=v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("bal_cents").alias("sum_bal_cents"),
                F.min("key").alias("min_key"),
                F.max("key").alias("max_key"),
            )
            .select(
                F.lit(v).cast("long").alias("version"),
                "n_rows",
                "sum_bal_cents",
                "min_key",
                "max_key",
            )
            for v in (0, 1, 2)
        ]
        out = versions[0].unionAll(versions[1]).unionAll(versions[2])
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _er_eval_oracle() -> str:
    return (
        _er_ctes()
        + f"""
, matched AS (
  SELECT id_a, id_b FROM pairs WHERE bal_eq AND name_ed <= {_ER_MAX_ED}
), truth AS (
  SELECT c_custkey AS id_a, c_custkey + {_ER_CLONE_OFFSET} AS id_b
  FROM customer WHERE c_custkey % {_ER_CLONE_EVERY} = 0
), hit AS (
  SELECT m.id_a FROM matched m JOIN truth t
    ON t.id_a = m.id_a AND t.id_b = m.id_b
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth)   AS n_truth,
       (SELECT CAST(count(*) AS BIGINT) FROM matched) AS n_matched,
       (SELECT CAST(count(*) AS BIGINT) FROM hit)     AS n_hits,
       CAST(((SELECT count(*) FROM hit) * 1000000
             + (SELECT count(*) FROM matched) // 2)
            // (SELECT count(*) FROM matched) AS BIGINT) AS precision_ppm,
       CAST(((SELECT count(*) FROM hit) * 1000000
             + (SELECT count(*) FROM truth) // 2)
            // (SELECT count(*) FROM truth) AS BIGINT)   AS recall_ppm
"""
    )


@register("eval_er_quality", oracle=_er_eval_oracle())
def eval_er_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grades the blocked matcher against the KNOWN duplicate set: the
    dirty registry is constructed (every {_ER_CLONE_EVERY}th record
    cloned at rid + offset with a typo), so ground truth is exact and
    the matcher's precision/recall are real numbers, not proxies —
    false positives here are coincidental same-balance near-name pairs
    inside a block, exactly the failure mode a blocking+threshold
    design trades for its n^2 -> sum(block^2) cost win.

    Composes the REGISTERED matcher plan; metrics are three bounded
    counts joined into one row on the integer ppm lattice. The eval
    itself is O(matches) — the matcher owns the heavy lifting (same
    posture as eval_rerank_recall / eval_dedup_recall).
    """
    matched = er_blocked_matching(spark, sf_dir).select("id_a", "id_b")
    c = load_table(spark, sf_dir, "customer")
    truth = c.filter(F.col("c_custkey") % _ER_CLONE_EVERY == 0).select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + _ER_CLONE_OFFSET).alias("id_b"),
    )
    hits = matched.join(truth, ["id_a", "id_b"])
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_matched = matched.agg(F.count(F.lit(1)).alias("n_matched"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_truth.crossJoin(n_matched)
        .crossJoin(n_hits)
        .select(
            "n_truth",
            "n_matched",
            "n_hits",
            F.expr(
                "(n_hits * 1000000 + n_matched DIV 2) DIV n_matched"
            ).alias("precision_ppm"),
            F.expr(
                "(n_hits * 1000000 + n_truth DIV 2) DIV n_truth"
            ).alias("recall_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Per-source curation rollup (the corpus-release domain view)
# --------------------------------------------------------------------------


def _source_rollup_oracle() -> str:
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    return f"""
WITH canon AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS h
  FROM documents
),
dup AS (
  SELECT doc_id, source,
         doc_id <> min(doc_id) OVER (PARTITION BY h) AS is_dup
  FROM canon
),
t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(toks, w -> len(w)), (a, b) -> a + b)
              AS BIGINT) AS n_tok_chars,
         CAST(len(list_filter(toks, w -> w IN ({stops}))) AS BIGINT) AS n_stop
  FROM t
),
rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_n
  FROM (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w)
  GROUP BY doc_id
),
gq AS (
  SELECT m.doc_id,
         (m.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
           AND {_GOPHER_MWL_LO10} * m.n_words <= 10 * m.n_tok_chars
           AND 10 * m.n_tok_chars <= {_GOPHER_MWL_HI10} * m.n_words
           AND m.n_stop >= {_GOPHER_MIN_STOP}
           AND {_GOPHER_REP_DEN} * r.top_n <= m.n_words AS passes
  FROM m JOIN rep r USING (doc_id)
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT sum(c) AS n FROM cnt),
dt AS (SELECT doc_id, token, count(*) AS cd FROM tok GROUP BY doc_id, token),
xent AS (
  SELECT dt.doc_id,
         round(sum(dt.cd * -ln(cnt.c * 1.0 / tot.n)) / sum(dt.cd), 4) AS x
  FROM dt JOIN cnt ON dt.token = cnt.token, tot
  GROUP BY dt.doc_id
),
cuts AS (
  SELECT quantile_cont(x, 1.0/3) AS q33, quantile_cont(x, 2.0/3) AS q66
  FROM xent
),
bq AS (
  SELECT e.doc_id,
         CASE WHEN e.x <= c.q33 THEN 'head'
              WHEN e.x <= c.q66 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM xent e, cuts c
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       CAST((sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) * 1000000
             + count(*) // 2) // count(*) AS BIGINT) AS dup_ppm,
       CAST(sum(CASE WHEN g.passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST((sum(CASE WHEN g.passes THEN 1 ELSE 0 END) * 1000000
             + count(*) // 2) // count(*) AS BIGINT) AS pass_ppm,
       CAST(sum(CASE WHEN b.bucket = 'head' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_head,
       CAST(sum(CASE WHEN b.bucket = 'middle' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_middle,
       CAST(sum(CASE WHEN b.bucket = 'tail' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tail
FROM dup d JOIN gq g USING (doc_id) JOIN bq b USING (doc_id)
GROUP BY d.source
"""


@register("curation_source_rollup", oracle=_source_rollup_oracle())
def curation_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard — the domain-level view a corpus
    release publishes before mixing sources into a training set: for
    every ``source``, the canonical-dup rate (how much of the domain is
    redundant), the Gopher-rule pass rate (how much survives the quality
    gate), and the surprisal tercile mix (where the domain sits on the
    CCNet head/middle/tail quality spectrum). Composes THREE registered
    plans — dedup_exact_canonical's digest grouping, text_gopher_rules'
    integer-exact gate, text_surprisal_buckets' tercile labels — joined
    per doc_id and rolled up to |sources| rows on the integer ppm
    lattice.

    Scale shape: each leg keeps its own certified posture (digest-only
    shuffle; zero-shuffle scan projection; bounded-vocab unigram join);
    the composition adds two doc_id equi-joins (co-partitioned, key =
    primary key) and one bounded-key rollup with map-side combine. At
    100 TB the rollup is what decides per-domain sampling weights, so it
    must stream — nothing here holds more than |sources| rows past the
    joins.
    """
    from bangdatapipeline_spark.operators.llm_text import (
        text_surprisal_buckets,
    )

    d = load_table(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    # r12: the canon regex chain + md5 were fused into the single-task
    # scan stage (guide §2.5) — spread the 3-column projection first so
    # the per-row normalization parallelizes.
    per_doc = spread(d.select("doc_id", "source", "text"), "doc_id").select(
        "doc_id", "source", F.md5(F.encode(canon, "utf-8")).alias("h")
    ).withColumn(
        "is_dup", F.col("doc_id") != F.min("doc_id").over(Window.partitionBy("h"))
    )
    gopher = text_gopher_rules(spark, sf_dir).select("doc_id", "passes")
    buckets = text_surprisal_buckets(spark, sf_dir).select("doc_id", "bucket")
    j = per_doc.join(gopher, "doc_id").join(buckets, "doc_id")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dups"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(F.col("bucket") == "head", 1).otherwise(0))
        .cast("bigint")
        .alias("n_head"),
        F.sum(F.when(F.col("bucket") == "middle", 1).otherwise(0))
        .cast("bigint")
        .alias("n_middle"),
        F.sum(F.when(F.col("bucket") == "tail", 1).otherwise(0))
        .cast("bigint")
        .alias("n_tail"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_dups",
        F.expr("(n_dups * 1000000 + n_docs DIV 2) DIV n_docs").alias("dup_ppm"),
        "n_pass",
        F.expr("(n_pass * 1000000 + n_docs DIV 2) DIV n_docs").alias("pass_ppm"),
        "n_head",
        "n_middle",
        "n_tail",
    )


# --------------------------------------------------------------------------
# Curriculum ordering: quality-bucketed, shard-interleaved training order
# --------------------------------------------------------------------------

# Fixed quality cut points (ppm distinct-token ratio). Constants, not
# corpus quantiles, ON PURPOSE: bucket assignment stays a scan-local
# projection (no global sort / ntile pass), the curriculum is stable
# across corpus versions, and at 100 TB you tune the constants from a
# sampled profile (text_length_percentiles / profile_columns), not from
# an exact full-corpus rank.
_CURR_HI = 550_000  # >= : bucket 1 (cleanest — train first)
_CURR_MID = 400_000  # >= : bucket 2; below: bucket 3 (noisiest — last)
_CURR_SHARDS = 8


@register(
    "layout_curriculum_order",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         CAST(floor(len(list_distinct(string_split(text, ' '))) * 1000000.0
                    / len(string_split(text, ' '))) AS BIGINT) AS quality_ppm
  FROM documents
),
b AS (
  SELECT doc_id, source, quality_ppm,
         CASE WHEN quality_ppm >= {_CURR_HI} THEN 1
              WHEN quality_ppm >= {_CURR_MID} THEN 2
              ELSE 3 END AS bucket,
         CAST(doc_id % {_CURR_SHARDS} AS BIGINT) AS shard,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS gate
  FROM q
)
SELECT doc_id, source, quality_ppm,
       CAST(bucket AS INT) AS bucket,
       shard,
       CAST(row_number() OVER (PARTITION BY bucket, shard
                               ORDER BY gate, doc_id) AS BIGINT)
         AS rank_in_shard
FROM b
""",
)
def layout_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum training order: score each document's
    quality (distinct-token ratio, the cheap single-scan proxy), bucket
    into clean/mid/noisy tiers by FIXED ppm cut points, shard within
    each tier by key, and assign a reproducible shuffled rank inside
    every (tier, shard) by content hash. A training loader consumes
    tiers in order (clean first) reading shards round-robin — curriculum
    learning's data-side contract, produced without any RNG state (the
    md5 gate is the sample_hash_det idiom: same order on any engine,
    partitioning, or rerun).

    Scale (100 TB): quality + bucket + shard + gate are all scan-local
    projections; the ONLY shuffle is the (bucket, shard) repartition for
    the in-shard rank — 24 independent partitions whose windows never
    see more than corpus/24 rows, vs the single-partition sort an
    ntile/global-rank curriculum would need. Cut points are constants
    (tuned offline from a sampled profile) precisely so no full-corpus
    rank pass exists anywhere in the plan.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    q = d.select(
        "doc_id",
        "source",
        F.floor(
            F.size(F.array_distinct(toks)) * 1000000.0 / F.size(toks)
        )
        .cast("bigint")
        .alias("quality_ppm"),
    )
    b = q.select(
        "doc_id",
        "source",
        "quality_ppm",
        F.when(F.col("quality_ppm") >= _CURR_HI, 1)
        .when(F.col("quality_ppm") >= _CURR_MID, 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket"),
        (F.col("doc_id") % _CURR_SHARDS).cast("bigint").alias("shard"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("gate"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("gate", "doc_id")
    return b.select(
        "doc_id",
        "source",
        "quality_ppm",
        "bucket",
        "shard",
        F.row_number().over(w).cast("bigint").alias("rank_in_shard"),
    )
