"""Window functions (SURVEY.md §2.5).

Reference capability: round-over-round survey deltas (pandas shift/rank
within groups). Spark windows execute as one sort per partition key; at
100 TB the partition key (user, customer) distributes evenly and state
stays bounded per key. Every window here has a total order (unique key
suffix) so results are deterministic under ties (SURVEY.md §4.4.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table


@register(
    "win_rank",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       rank()         OVER w                 AS rnk,
       dense_rank()   OVER w                 AS drnk,
       row_number()   OVER w                 AS rn,
       ntile(4)       OVER w                 AS quartile,
       round(percent_rank() OVER w, 6)       AS prank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number / ntile / percent_rank per partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@register(
    "win_analytic",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(lag(o_totalprice)  OVER w, 2)        AS prev_price,
       round(lead(o_totalprice) OVER w, 2)        AS next_price,
       round(first_value(o_totalprice) OVER wf, 2) AS first_price,
       round(last_value(o_totalprice)  OVER wf, 2) AS last_price
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value (order-over-order deltas — the
    reference's round-over-round survey-delta shape)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(wf), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wf), 2).alias("last_price"),
    )


@register(
    "win_frames",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)         AS mov_avg4,
       count(*) OVER (PARTITION BY user_id ORDER BY CAST(round(value, 0) AS BIGINT)
                      RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)                    AS n_close
FROM events
""",
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + moving average with explicit ROWS frames, plus a
    RANGE frame over an integer ordering column. Both engines accumulate
    the running sum over the identical total order, so the rounded values
    agree."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = wo.rowsBetween(-3, Window.currentRow)
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy(F.round(F.col("value"), 0).cast("bigint"))
        .rangeBetween(-5, 5)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w_run), 2).alias("run_sum"),
        F.round(F.avg("value").over(w_mov), 4).alias("mov_avg4"),
        F.count(F.lit(1)).over(w_rng).alias("n_close"),
    )


@register(
    "win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number <= k — the grouped top-k
    pattern (also the keep-latest dedup kernel). At scale Spark pushes a
    per-partition window-group-limit before the shuffle (WindowGroupLimit),
    so only k rows per key reach the exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


@register(
    "win_range_time",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT)   AS n_last_hour,
       round(sum(value) OVER w, 2)       AS val_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, rolling count/sum over the
    trailing hour at every event — the per-event sliding aggregate
    (rate-limiting, burst detection). The frame is defined on event TIME,
    not row offsets, so ties and gaps behave identically on both engines
    (RANGE includes peers). One shuffle on user_id; the frame scan is a
    single sorted pass per partition.
    """
    ev = load_table(spark, sf_dir, "events")
    # NTZ-safe epoch seconds (no session-timezone dependence, unlike a
    # cast through TIMESTAMP): integer ordering for the RANGE frame.
    secs = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy(secs).rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("val_last_hour"),
    )


_SCD2_ORACLE = """
SELECT o_custkey AS custkey,
       CAST(row_number() OVER w AS INT) AS version,
       o_orderkey AS orderkey,
       round(o_totalprice, 2) AS totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_ranges", oracle=_SCD2_ORACLE)
def scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: each customer's
    ordered change records become versioned rows with [valid_from,
    valid_to) effectivity ranges and an is_current flag — the standard
    warehouse pattern for temporal dimensions, as one window pass
    (row_number + lead share a single (custkey, date, key) sort). The
    deterministic o_orderkey tie-break keeps same-day changes stable.
    At 100 TB this is one shuffle on the dimension key; each entity's
    history is a partition-local sorted run.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("int").alias("version"),
        F.col("o_orderkey").alias("orderkey"),
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )
