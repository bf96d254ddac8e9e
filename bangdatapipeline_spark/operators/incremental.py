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
