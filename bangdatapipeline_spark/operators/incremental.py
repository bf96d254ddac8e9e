"""Incremental aggregation — materialized-view maintenance by partial-
state merge (the canonical technique for keeping a 100 TB rollup fresh).

A full nightly recompute of ``revenue by (month, priority)`` rescans the
entire fact table; the incremental form keeps the aggregate STATE
(sum / count / min / max per key) as a table and folds each new delta
batch in by merging states: ``sum += sum_delta``, ``count +=
count_delta``, ``min = least(min, min_delta)``, ``max = greatest(...)``.
Every Spark aggregate used here is decomposable (the same partial/final
split Catalyst itself performs inside HashAggregate), so merged state is
EXACTLY the state a full recompute would produce — that identity is the
registered oracle and a property test.

Scale notes (100 TB): the merge job touches only the delta batch (one
day of facts) and the state rows whose keys appear in the delta — with
the state table partitioned by month, the union+re-aggregate shuffles
state rows (bounded by key cardinality, thousands), never the base
facts (billions). Rewrites are per-partition overwrites of affected
months only. Derived columns (averages) are NEVER stored in state —
they are recomputed from merged sums at read time, which is what makes
the state mergeable in the first place.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

# Facts strictly before the split are the materialized base state; the
# rest is the incoming delta batch.
INCR_SPLIT = "1997-06-01"

_STATE_AGGS_SQL = """
       CAST(count(*) AS BIGINT)           AS n_orders,
       round(sum(o_totalprice), 2)        AS revenue,
       min(o_orderdate)                   AS first_order,
       max(o_orderdate)                   AS last_order
"""


@register(
    "incremental_agg_merge",
    tags=("stream_twin", "stream_test:test_incremental_state_merge_stream_equals_full_recompute"),
    oracle=f"""
WITH base AS (
  SELECT date_trunc('month', o_orderdate) AS state_month, o_orderpriority,
         {_STATE_AGGS_SQL}
  FROM orders WHERE o_orderdate < DATE '{INCR_SPLIT}'
  GROUP BY 1, 2
),
delta AS (
  SELECT date_trunc('month', o_orderdate) AS state_month, o_orderpriority,
         {_STATE_AGGS_SQL}
  FROM orders WHERE o_orderdate >= DATE '{INCR_SPLIT}'
  GROUP BY 1, 2
),
unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT state_month, o_orderpriority,
       CAST(sum(n_orders) AS BIGINT)              AS n_orders,
       round(sum(revenue), 2)                     AS revenue,
       min(first_order)                           AS first_order,
       max(last_order)                            AS last_order,
       round(round(sum(revenue), 2) / sum(n_orders), 6) AS avg_price,
       CAST(count(*) AS BIGINT)                   AS n_sources
FROM unioned
GROUP BY state_month, o_orderpriority
""",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge a delta batch of orders into a materialized monthly revenue
    state without rescanning the base facts.

    Both sides reduce to partial state FIRST (their own groupBy), then
    the union of state rows re-aggregates with the merge functions —
    the final shuffle moves only state rows, never facts. ``n_sources``
    (1 or 2) records how many partial states fed each key: months
    straddling the split date prove the merge actually combined two
    states into the same answer a full recompute gives. ``revenue`` is
    rounded to its own 2-dp value lattice at both levels (sums of 2-dp
    inputs are exact lattice points, see docs/dialect_notes.md), and
    ``avg_price`` divides the rounded sum so both engines divide
    bit-identical doubles.
    """
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(INCR_SPLIT).cast("date")

    def state(of: DataFrame) -> DataFrame:
        # date_trunc keeps TIMESTAMP on both engines (F.trunc's DATE
        # stringifies differently from DuckDB DATE in the comparator)
        return of.groupBy(
            F.date_trunc("month", "o_orderdate").alias("state_month"),
            "o_orderpriority",
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = state(orders.filter(F.col("o_orderdate") < split))
    delta = state(orders.filter(F.col("o_orderdate") >= split))
    merged = (
        base.unionByName(delta)
        .groupBy("state_month", "o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
            F.min("first_order").alias("first_order"),
            F.max("last_order").alias("last_order"),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )
    return merged.select(
        "state_month",
        "o_orderpriority",
        "n_orders",
        "revenue",
        "first_order",
        "last_order",
        F.round(F.col("revenue") / F.col("n_orders"), 6).alias("avg_price"),
        "n_sources",
    )


@register(
    "incremental_join_delta",
    tags=("stream_twin", "stream_test:test_incremental_join_view_stream_equals_batch_identity"),
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT)                                       AS n_rows,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT)                                                AS cents,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT)                   AS n_orders
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance — the delta algebra for a
    materialized join view: with base snapshots A0/B0 and delta batches
    dA/dB, the new view is

        (A0+dA) JOIN (B0+dB)
          = A0 JOIN B0  ∪  dA JOIN B0  ∪  A0 JOIN dB  ∪  dA JOIN dB

    (equality as a bag: every joined pair lands in exactly one term by
    which side of the split each row falls on). This query computes the
    four-term union and aggregates it; the ORACLE computes the one-shot
    full join and the same aggregate — a hash-exact proof of the
    identity, the companion of ``incremental_agg_merge``'s agg-state
    half. Orders split on orderdate, lineitem on shipdate, so the two
    deltas are genuinely independent. The revenue checksum accumulates
    in exact integer cents: the union sums the same products in a
    different ORDER than the oracle's single join, which float addition
    would turn into an ulp lottery.

    Scale posture (100 TB): in production only the three delta terms
    run (the base-join term IS the stored view); both delta joins probe
    a delta batch (days of rows) against a base table — with base
    tables bucketed on the join key the probes co-locate and shuffle
    only the delta, and dA JOIN dB is delta x delta (tiny). The full
    recompute this query also materializes exists here only to ground
    the identity.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
        "l_shipdate",
    )
    split = F.lit(INCR_SPLIT).cast("date")
    a0 = o.filter(F.col("o_orderdate") < split)
    da = o.filter(F.col("o_orderdate") >= split)
    b0 = li.filter(F.col("l_shipdate") < split)
    db = li.filter(F.col("l_shipdate") >= split)

    def term(a: DataFrame, b: DataFrame) -> DataFrame:
        return a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderpriority", "o_orderkey", "cents"
        )

    view = (
        term(a0, b0)
        .unionByName(term(da, b0))
        .unionByName(term(a0, db))
        .unionByName(term(da, db))
    )
    return view.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC extraction between two table versions)
# ---------------------------------------------------------------------------

# Deterministic synthetic drift between the two snapshots: version B
# corrects the totalprice of every key = 0 (mod 5) and loses every
# key = 0 (mod 17) — the update/delete traffic a reconciliation diff
# exists to catch on top of the natural appends.
_DIFF_CUT_A = "1997-01-01"
_DIFF_CUT_B = "1997-07-01"

@register(
    "cdc_snapshot_diff",
    tags=("stream_twin", "stream_test:test_snapshot_diff_stream_equals_batch"),
    oracle=f"""
WITH a AS (
  SELECT o_orderkey AS key,
         {cents_sql("o_totalprice")} AS cents
  FROM orders WHERE o_orderdate < DATE '{_DIFF_CUT_A}'
),
b AS (
  SELECT o_orderkey AS key,
         {cents_sql("o_totalprice")}
           + CASE WHEN o_orderkey % 5 = 0 THEN 250 ELSE 0 END AS cents
  FROM orders
  WHERE o_orderdate < DATE '{_DIFF_CUT_B}' AND o_orderkey % 17 <> 0
),
d AS (
  SELECT coalesce(a.key, b.key) AS key,
         CASE WHEN a.key IS NULL THEN 'added'
              WHEN b.key IS NULL THEN 'removed'
              WHEN a.cents <> b.cents THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         coalesce(b.cents, 0) - coalesce(a.cents, 0) AS delta_cents
  FROM a FULL OUTER JOIN b ON a.key = b.key
)
SELECT change_type,
       CAST(count(*) AS BIGINT)        AS n,
       CAST(sum(delta_cents) AS BIGINT) AS net_delta_cents,
       CAST(min(key) AS BIGINT)        AS min_key,
       CAST(max(key) AS BIGINT)        AS max_key
FROM d GROUP BY change_type
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — derive the change feed BETWEEN two table
    versions when the source system doesn't emit one (the standard
    bootstrap for CDC onto a warehouse that only takes periodic full
    dumps): full outer join version A to version B on the key, classify
    each key added / removed / changed / unchanged, and publish the
    per-class row counts and net value drift.

    Money compares on the exact integer cents lattice (per-row scalar
    rounding, no fold order). The join is a single key-partitioned
    shuffle of both snapshots — at 100 TB this is THE canonical
    co-partition case: store both snapshot versions bucketed by key and
    the exchange disappears entirely; the classification is a
    projection and the rollup a 4-row reduction. The synthetic drift
    (price corrections on keys = 0 mod 5, losses on 0 mod 17) is
    declared above so the oracle and any downstream test pin non-trivial
    traffic in every change class.
    """
    a, b = diff_snapshots(spark, sf_dir)
    return snapshot_diff_result(a, b)


def diff_snapshots(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The two synthetic snapshot versions ``cdc_snapshot_diff`` compares
    (shared with the streaming twin, which replays B as micro-batches)."""
    o = load_table(spark, sf_dir, "orders")
    cents = cents_col(F.col("o_totalprice"))
    a = o.filter(F.col("o_orderdate") < _DIFF_CUT_A).select(
        F.col("o_orderkey").alias("key"), cents.alias("cents_a")
    )
    b = (
        o.filter(
            (F.col("o_orderdate") < _DIFF_CUT_B)
            & (F.col("o_orderkey") % 17 != 0)
        )
        .select(
            F.col("o_orderkey").alias("key"),
            (
                cents
                + F.when(F.col("o_orderkey") % 5 == 0, 250).otherwise(0)
            ).alias("cents_b"),
        )
    )
    return a, b


def snapshot_diff_result(a: DataFrame, b: DataFrame) -> DataFrame:
    """The classify + rollup half of ``cdc_snapshot_diff``, shared with
    its streaming twin (the twin maintains the B snapshot as keyed state
    and calls this read-side): full-outer join ``a (key, cents_a)`` to
    ``b (key, cents_b)``, classify each key, publish per-class stats."""
    # Classification via VALUE nullness; the oracle classifies via KEY
    # nullness (a.key IS NULL). These agree iff cents is non-null
    # whenever the key is present — guaranteed here because cents
    # derives from TPC-H's NOT NULL o_totalprice. A nullable-value
    # changelog must add presence markers on both sides instead (the
    # scd2_apply_changes pattern).
    d = a.join(b, "key", "full_outer").select(
        "key",
        F.when(F.col("cents_a").isNull(), "added")
        .when(F.col("cents_b").isNull(), "removed")
        .when(F.col("cents_a") != F.col("cents_b"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("cents_b", F.lit(0)) - F.coalesce("cents_a", F.lit(0))
        ).alias("delta_cents"),
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delta_cents").alias("net_delta_cents"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# SCD2 apply-changes (dimension maintenance from a new snapshot)
# ---------------------------------------------------------------------------

@register(
    "scd2_apply_changes",
    tags=("stream_twin", "stream_test:test_scd2_apply_stream_equals_batch"),
    oracle=f"""
WITH dim AS (
  SELECT c_custkey AS key,
         {cents_sql("c_acctbal")} AS bal_cents,
         TRUE AS in_dim
  FROM customer
),
snap AS (
  SELECT c_custkey AS key,
         {cents_sql("c_acctbal")}
           + CASE WHEN c_custkey % 7 = 0 THEN 10000 ELSE 0 END AS bal_cents,
         TRUE AS in_snap
  FROM customer WHERE c_custkey % 11 <> 0
  UNION ALL
  SELECT c_custkey + 1000000000, {cents_sql("c_acctbal")}, TRUE
  FROM customer WHERE c_custkey % 13 = 0
),
j AS (
  -- presence MARKERS, not key IS NULL (ADVICE r11): mirrors the Spark
  -- side's _in_dim/_in_snap so a NULL key classifies identically on
  -- both engines (NULL keys never join-match, so key IS NULL would say
  -- 'insert' here while Spark's marker says 'delete' for a dim row)
  SELECT coalesce(d.key, s.key) AS key,
         d.bal_cents AS old_bal, s.bal_cents AS new_bal,
         CASE WHEN d.in_dim IS NULL THEN 'insert'
              WHEN s.in_snap IS NULL THEN 'delete'
              WHEN d.bal_cents IS DISTINCT FROM s.bal_cents THEN 'update'
              ELSE 'noop' END AS op
  FROM dim d FULL OUTER JOIN snap s ON d.key = s.key
)
SELECT key, CAST(old_bal AS BIGINT) AS bal_cents, 1 AS version, op,
       CASE WHEN op = 'noop' THEN TRUE ELSE FALSE END AS is_current
FROM j WHERE op IN ('noop', 'update', 'delete')
UNION ALL
SELECT key, CAST(new_bal AS BIGINT) AS bal_cents, 2 AS version, op,
       TRUE AS is_current
FROM j WHERE op IN ('insert', 'update')
""",
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension maintenance: apply a NEW full snapshot to the
    current dimension version — the merge scd2_ranges' history build
    runs every refresh. Updated keys close their v1 row (is_current
    false) and open a v2 row with the new value; deleted keys close v1
    with no successor; inserted keys open at v2; untouched keys keep
    their current v1. The synthetic snapshot drift (balance bump on
    keys = 0 mod 7, deletes on 0 mod 11, inserts offset +1e9 from
    keys = 0 mod 13) exercises all four paths deterministically.

    One full-outer join on the dimension key classifies every key, and
    the old/new version rows are two filtered projections of that ONE
    joined relation unioned back together — the join never runs twice
    (Spark unions reuse the exchange; at 100 TB bucket dim and snapshot
    by key and the merge is exchange-free, the same co-partition shape
    as the txn table format's MERGE). Balances live on the integer
    cents lattice end to end.
    """
    dim, snap = scd2_inputs(spark, sf_dir)
    return scd2_result(dim, snap)


def scd2_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The dimension and drifted-snapshot inputs ``scd2_apply_changes``
    merges (shared with the streaming twin, which replays the snapshot
    as micro-batches)."""
    c = load_table(spark, sf_dir, "customer")
    cents = cents_col(F.col("c_acctbal"))
    dim = c.select(F.col("c_custkey").alias("key"), cents.alias("old_bal"))
    snap = (
        c.filter(F.col("c_custkey") % 11 != 0)
        .select(
            F.col("c_custkey").alias("key"),
            (
                cents + F.when(F.col("c_custkey") % 7 == 0, 10000).otherwise(0)
            ).alias("new_bal"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 1000000000).alias("key"),
                cents.alias("new_bal"),
            )
        )
    )
    return dim, snap


def scd2_result(dim: DataFrame, snap: DataFrame) -> DataFrame:
    """The SCD2 classify + version-row build half of
    ``scd2_apply_changes``, shared with its streaming twin (the twin
    maintains the incoming snapshot as keyed state and calls this
    read-side): ``dim (key, old_bal)`` full-outer ``snap (key,
    new_bal)``, one joined relation projected twice."""
    # classify on KEY PRESENCE (r11 review), not value nullness: a
    # matched key carrying a NULL balance is not an insert — presence
    # markers survive the outer join where a nullable value cannot; the
    # value comparison is null-safe (IS DISTINCT FROM twin), so
    # NULL -> value and value -> NULL transitions classify as updates
    # on both engines.
    j = (
        dim.withColumn("_in_dim", F.lit(True))
        .join(snap.withColumn("_in_snap", F.lit(True)), "key", "full_outer")
        .select(
            "key",
            "old_bal",
            "new_bal",
            F.when(F.col("_in_dim").isNull(), "insert")
            .when(F.col("_in_snap").isNull(), "delete")
            .when(~F.col("old_bal").eqNullSafe(F.col("new_bal")), "update")
            .otherwise("noop")
            .alias("op"),
        )
    )
    closed_or_kept = j.filter(F.col("op").isin("noop", "update", "delete")).select(
        "key",
        F.col("old_bal").alias("bal_cents"),
        F.lit(1).alias("version"),
        "op",
        (F.col("op") == "noop").alias("is_current"),
    )
    opened = j.filter(F.col("op").isin("insert", "update")).select(
        "key",
        F.col("new_bal").alias("bal_cents"),
        F.lit(2).alias("version"),
        "op",
        F.lit(True).alias("is_current"),
    )
    return closed_or_kept.unionAll(opened)
