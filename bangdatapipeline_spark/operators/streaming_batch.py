"""Streaming operators — batch twins (SURVEY.md §2.11).

The driver's oracle is batch DuckDB, so every streaming operator ships as
two artifacts: the HASH-CHECKED batch query here (identical semantics on
the same `events` table) and a Structured Streaming variant in
``bangdatapipeline_spark.streaming`` whose output is asserted equal to the
batch twin in tests/test_streaming.py (file-source replay of the same
rows).

Scale posture (100 TB): tumbling/sliding aggregations are keyed on
(window, event_type) — bounded cardinality, map-side partials absorb the
volume. Sessionization shuffles once on user_id; per-user state is a sort
within the partition (Spark's window exec), bounded by events-per-user.
The late-data diagnostic is the only globally-ordered window — it models
the stream's single logical watermark clock and is a diagnostic, not a
data-path operator (in the streaming engine the watermark is maintained by
the coordinator, not a shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

SESSION_GAP_MIN = 30
WATERMARK_DELAY = "1 hour"


def sessionize(ev: DataFrame) -> DataFrame:
    """The ONE lag-gap-flag-cumsum sessionization kernel: the input
    events plus (prev_ts, is_new, sess_id), where a session breaks
    after ``SESSION_GAP_MIN`` minutes of inactivity; partitioned by
    user_id, ordered by (ts, event_id) — the deterministic tie-break
    every consumer's correctness argument depends on. SQL twin:
    :func:`sessionize_cte`. One shuffle on user_id; every downstream
    consumer refines this same partitioning. Consumers:
    ``stream_session``, ``events_session_funnel``,
    windows.``win_session_bounces`` (r11: three hand-synchronized
    copies collapsed — a gap-boundary or tie-break change now edits
    exactly one kernel)."""
    wo = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(wo)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.col("ts") - F.col("prev_ts")
                > F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "sess_id",
        F.sum("is_new").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize_cte(cols: str) -> str:
    """SQL twin of :func:`sessionize`: a ``WITH`` prefix whose final CTE
    ``sess`` carries ``cols`` (must include user_id, ts, event_id) plus
    prev_ts/is_new/sess_id. Callers append their own CTEs with a
    leading comma, or the final SELECT directly."""
    return f"""
WITH o AS (
    SELECT {cols},
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                   THEN 1 ELSE 0 END AS is_new
    FROM o
), sess AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
)"""
# deterministic pseudo-shuffle of arrival order for the late-data demo
# (event_id itself is time-ordered, so "arrival = event_id" has no late rows)
ARRIVAL = "(event_id * 1103515245 + 12345) % 2147483647"


@register(
    "stream_tumbling",
    tags=("stream_twin", "stream_test:test_tumbling_stream_equals_batch"),
    oracle="""
SELECT date_trunc('day', ts) AS w_start, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregation — the batch twin of the
    watermarked streaming aggregate (streaming variant:
    streaming.tumbling_counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


@register(
    "stream_sliding",
    tags=("stream_twin", "stream_test:test_sliding_stream_equals_batch"),
    oracle="""
WITH expanded AS (
    SELECT make_timestamp((epoch_us(ts) // 21600000000 - k) * 21600000000) AS w_start,
           event_type, value
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks
)
SELECT w_start, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM expanded
GROUP BY 1, 2
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1-day length, 6-hour slide): every event lands in
    exactly 4 overlapping windows. The oracle expands the window set by
    hand (epoch arithmetic); Spark's window() generates the same starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


@register(
    "stream_session",
    tags=("stream_twin", "stream_test:test_session_stream_equals_batch"),
    oracle=f"""
{sessionize_cte("user_id, ts, event_id, value")}
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       min(ts) AS sess_start, max(ts) AS sess_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, sess_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the classic
    lag-gap-flag-cumsum kernel (:func:`sessionize`; one shuffle on
    user_id; state bounded per user). Streaming variant:
    streaming.session_aggregate uses F.session_window with the same
    gap."""
    sess = sessionize(load_table(spark, sf_dir, "events"))
    return sess.groupBy("user_id", F.col("sess_id").cast("bigint").alias("sess_id")).agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "stream_dedup",
    tags=("stream_twin", "stream_test:test_dedup_stream"),
    oracle="""
SELECT DISTINCT event_id, ts, user_id, event_type, round(value, 2) AS value
FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on event_id over a doubled input (simulating at-least-once
    delivery). Duplicate rows are bit-identical, so dropDuplicates'
    nondeterministic keeper is value-invisible here. Streaming variant:
    dropDuplicatesWithinWatermark in streaming.dedup_stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    return ev.unionByName(ev).dropDuplicates(["event_id"])


@register(
    "stream_static_join",
    tags=("stream_twin", "stream_test:test_static_join_stream"),
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events joined to the customer dimension
    (broadcast — the dim is KB-MB scale) then aggregated per (segment,
    event_type). The streaming variant joins the same static dim to the
    event stream micro-batch by micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "stream_late",
    tags=("stream_twin", "stream_test:test_watermark_drops_late_data"),
    oracle=f"""
WITH arr AS (
    SELECT event_id, ts, user_id,
           max(ts) OVER (ORDER BY {ARRIVAL}, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - INTERVAL '{WATERMARK_DELAY}' AS wm
    FROM events
)
SELECT event_id, ts, user_id, wm
FROM arr WHERE ts < wm
""",
)
def stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data diagnostic: which events would a '1 hour' watermark drop,
    given a (deterministic) pseudo-shuffled arrival order? wm = running
    max event-time over prior arrivals minus the delay; an event is late
    when its ts is below the watermark. Mirrors Structured Streaming's
    per-row policy (the engine advances the watermark per micro-batch, so
    the streaming run drops a subset of these; test_streaming asserts
    that containment)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy(F.expr(ARRIVAL), "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    arr = ev.select(
        "event_id",
        "ts",
        "user_id",
        (F.max("ts").over(w) - F.expr(f"INTERVAL {WATERMARK_DELAY}")).alias("wm"),
    )
    return arr.filter(F.col("ts") < F.col("wm"))


@register(
    "stream_stateful",
    tags=("stream_twin", "stream_test:test_stateful_counts_final_state"),
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_so_far,
       CAST(len(list_distinct(list(event_type) OVER w)) AS INT) AS n_types_so_far,
       round(sum(value) OVER w, 2) AS cum_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
""",
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user counters (count, distinct event types seen,
    cumulative value) — the batch twin of an arbitrary-stateful streaming
    op. Streaming variant: streaming.stateful_counts via
    applyInPandasWithState keeps the same counters in a state store."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_so_far"),
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("int")
        .alias("n_types_so_far"),
        F.round(F.sum("value").over(w), 2).alias("cum_value"),
    )


@register(
    "stream_stream_join",
    tags=("stream_twin", "stream_test:test_stream_stream_interval_join"),
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join of two event streams: (purchase, click) pairs by the
    same user with the click in the 30 minutes up to the purchase — the
    batch twin of a watermarked stream-stream join (attribution shape).

    The equi-conjunct (user_id) keeps it a hash join with the interval as
    a residual filter; in the streaming variant the same interval bounds
    the join state each side retains.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


@register(
    "stream_stream_left_join",
    tags=("stream_twin", "stream_test:test_stream_stream_left_outer_join"),
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
""",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval join: every purchase, with its attributing
    clicks where they exist and NULLs where none — the batch twin of a
    watermarked left-outer stream-stream join (unattributed-conversion
    shape).

    Streaming variant: streaming.interval_left_join_streams — the outer
    (NULL) rows are emitted only once the watermark passes the purchase's
    interval, which is exactly the state-expiry bound; join state stays
    O(watermark + interval) per side at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
        "left",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


@register(
    "stream_stream_full_join",
    tags=("stream_twin", "stream_test:test_stream_stream_full_outer_join"),
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       coalesce(p.user_id, c.user_id) AS user_id,
       p.ts AS purchase_ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
""",
)
def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer interval join: attributed (purchase, click) pairs PLUS
    unattributed purchases PLUS unattributing clicks, in one result — the
    batch twin of a watermarked full-outer stream-stream join (the
    "both-sides audit" shape: nothing from either stream is dropped).

    Streaming variant: streaming.interval_full_join_streams — each side's
    outer rows are emitted when ITS watermark closes the row's match
    window, so state stays bounded on both sides exactly as in the
    left-outer case.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
        "full",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce("user_id", "c_user_id").alias("user_id"),
        "purchase_ts",
        "click_ts",
    )


@register(
    "events_funnel",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts >= v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t_purch
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
    GROUP BY e.user_id
)
SELECT CAST(count(v.user_id) AS BIGINT)  AS n_view,
       CAST(count(c.user_id) AS BIGINT)  AS n_click,
       CAST(count(p.user_id) AS BIGINT)  AS n_purchase,
       round(avg(datediff('second', v.t_view, p.t_purch)), 2) AS avg_secs_to_convert
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view → first click at-or-after that view →
    first purchase at-or-after that click, counted per stage plus mean
    view→purchase latency for completers — the product-analytics staple.

    Each stage is a groupBy(user_id) min joined to the previous stage, so
    all three stages and the final join share ONE partitioning key; on a
    cluster the exchanges after the first are reused. Events with other
    types are filtered before any shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click").alias("e")
        .join(v, "user_id")
        .filter(F.col("e.ts") >= F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase").alias("e")
        .join(c, "user_id")
        .filter(F.col("e.ts") >= F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purch"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click"),
            F.count("t_purch").alias("n_purchase"),
            # truncate to seconds first: DuckDB's datediff('second',...)
            # counts boundary crossings, not floored exact differences
            F.round(
                F.avg(
                    F.expr(
                        "timestampdiff(SECOND, date_trunc('SECOND', t_view),"
                        " date_trunc('SECOND', t_purch))"
                    )
                ),
                2,
            ).alias("avg_secs_to_convert"),
        )
    )


@register(
    "events_retention",
    oracle="""
WITH firsts AS (
    SELECT user_id, min(date_trunc('day', ts)) AS cohort_date
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT f.cohort_date,
           CAST(datediff('day', f.cohort_date, date_trunc('day', e.ts)) AS INT) AS day_offset,
           e.user_id
    FROM events e JOIN firsts f ON f.user_id = e.user_id
), sized AS (
    SELECT cohort_date, day_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_date, day_offset
)
SELECT s.cohort_date, s.day_offset, s.n_active,
       round(CAST(s.n_active AS DOUBLE) / c.n_active, 6) AS retention
FROM sized s JOIN sized c
  ON c.cohort_date = s.cohort_date AND c.day_offset = 0
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort, day-offset) the distinct active users and the retention
    fraction against day 0.

    Shuffle shape: one agg on user_id (firsts), one join back on user_id
    (same key — exchange reuse), one distinct on (cohort, offset, user) —
    then the tiny per-cohort table self-joins broadcast-style for the
    day-0 denominator. No row explosion anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_date")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "cohort_date",
            F.datediff(F.date_trunc("day", F.col("ts")),
                       F.col("cohort_date")).cast("int").alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    sized = activity.groupBy("cohort_date", "day_offset").agg(
        F.count("*").alias("n_active")
    )
    day0 = (
        sized.filter(F.col("day_offset") == 0)
        .select("cohort_date", F.col("n_active").alias("n_day0"))
    )
    return sized.join(day0, "cohort_date").select(
        "cohort_date",
        "day_offset",
        "n_active",
        F.round(F.col("n_active").cast("double") / F.col("n_day0"), 6).alias("retention"),
    )


@register(
    "stream_topk",
    tags=("stream_twin", "stream_test:test_topk_leaderboard_foreach_batch"),
    oracle="""
WITH counts AS (
  SELECT date_trunc('day', ts) AS w_start, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT w_start, event_type, n,
       CAST(row_number() OVER (PARTITION BY w_start
                               ORDER BY n DESC, event_type ASC) AS INT) AS rn
FROM counts
QUALIFY rn <= 3
""",
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k leaderboard: the 3 most frequent event types per
    1-day tumbling window (deterministic tie-break on event_type) — the
    batch twin of the continuous-leaderboard pattern. Streaming twin:
    windowed counts maintain the (tiny, bounded) per-window state, and
    the rank runs OVER THE AGGREGATE per micro-batch in foreachBatch —
    rank is not an incremental operator, so the stream re-ranks the
    maintained counts, never the raw events (tests/test_streaming.py).
    Plan: counts agg + WindowGroupLimit-pruned rank, both keyed on the
    window start; at 100 TB the rank input is #windows x #types rows.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    win = Window.partitionBy("w").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(win).cast("int"))
        .filter(F.col("rn") <= 3)
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "rn")
    )


@register(
    "stream_cdc_latest",
    tags=("stream_twin", "stream_test:test_cdc_latest_matches_batch_compaction"),
    oracle="""
SELECT user_id, event_id, round(value, 2) AS latest_value
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase')
WHERE rn = 1
""",
)
def stream_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed latest-wins changelog compaction — the batch twin of the
    streaming CDC state op (streaming.cdc_latest): one record per key,
    picked by the (ts, event_id) total order, never dropDuplicates.
    This is the compaction stage of ``merge_cdc_upsert``, registered
    standalone so the streaming equivalence test has a hash-checked
    anchor. Scale: the WindowGroupLimit rewrite prunes each partition
    to its winner before the user-keyed shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.round("value", 2).alias("latest_value"))
    )


@register(
    "events_session_funnel",
    oracle=f"""
{sessionize_cte("user_id, ts, event_id, event_type")}, s1 AS (
    SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                OVER (PARTITION BY user_id, sess_id) AS t_view
    FROM sess
), s2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
                OVER (PARTITION BY user_id, sess_id) AS t_click
    FROM s1
), s3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
                OVER (PARTITION BY user_id, sess_id) AS t_purch
    FROM s2
), per_sess AS (
    SELECT user_id, sess_id, min(ts) AS sess_start,
           max(t_view) AS t_view, max(t_click) AS t_click,
           max(t_purch) AS t_purch
    FROM s3 GROUP BY 1, 2
)
SELECT strftime(CAST(sess_start AS DATE), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(t_view) AS BIGINT)  AS n_view,
       CAST(count(t_click) AS BIGINT) AS n_click,
       CAST(count(t_purch) AS BIGINT) AS n_converted,
       CAST((count(t_purch) * 1000000 + count(*) // 2) // count(*) AS BIGINT)
         AS conv_ppm
FROM per_sess GROUP BY 1
""",
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-scoped ordered funnel: within each 30-minute-gap session,
    view -> first click at-or-after that view -> first purchase
    at-or-after that click, rolled up to per-day session conversion —
    the per-visit complement of ``events_funnel``'s user-lifetime
    funnel (a user who viewed in January and purchased in March counts
    there but converts NO session here).

    The sessionize window, the three stage-min windows, and the
    per-session collapse all ride the SAME user_id partitioning (the
    stage windows only refine the partition key to (user, session) —
    no extra exchange); the day rollup then shuffles |sessions|
    pre-combined rows. Ordering inside a session is enforced by the
    min-ts chain, not event adjacency, exactly like the lifetime
    funnel. Conversion is integer ppm.
    """
    sess = sessionize(load_table(spark, sf_dir, "events"))
    ws = Window.partitionBy("user_id", "sess_id")
    staged = (
        sess.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(ws),
        )
        .withColumn(
            "t_purch",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(ws),
        )
    )
    per_sess = staged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("sess_start"),
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purch").alias("t_purch"),
    )
    agg = per_sess.groupBy(
        F.date_format("sess_start", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purch").alias("n_converted"),
    )
    return agg.select(
        "day",
        "n_sessions",
        "n_view",
        "n_click",
        "n_converted",
        F.expr(
            "(n_converted * 1000000 + n_sessions DIV 2) DIV n_sessions"
        ).alias("conv_ppm"),
    )


@register(
    "events_time_to_convert_hist",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts >= v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t_purch
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
    GROUP BY e.user_id
), lat AS (
    SELECT v.user_id,
           epoch(date_trunc('second', p.t_purch))
             - epoch(date_trunc('second', v.t_view)) AS secs
    FROM v JOIN p ON p.user_id = v.user_id
), b AS (
    -- floor(), not //: epoch() yields DOUBLE and DuckDB's // on doubles
    -- ROUNDS the quotient (34432.0 // 3600 = 10), it does not floor
    SELECT CAST(floor(secs / 3600) AS BIGINT) AS bucket_h,
           CAST(count(*) AS BIGINT)           AS n_users
    FROM lat GROUP BY 1
)
SELECT bucket_h, n_users,
       CAST(sum(n_users) OVER (ORDER BY bucket_h
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users,
       CAST(sum(n_users) OVER (ORDER BY bucket_h ROWS UNBOUNDED PRECEDING)
            * 1000000 // sum(n_users) OVER () AS BIGINT) AS cum_ppm
FROM b
""",
    tags=("stream_twin", "stream_test:test_funnel_state_stream_equals_batch"),
)
def events_time_to_convert_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert DISTRIBUTION for funnel completers: view→purchase
    latency bucketed by hour with cumulative user share in ppm — the
    curve behind "half our conversions land within N hours" that
    events_funnel's single mean cannot show (a long tail and a fast
    core average to the same number).

    Stages reuse the funnel's one-partitioning-key shape (groupBy min
    per stage, user_id joins throughout); the histogram then collapses
    to |buckets| rows, so the cumulative windows run over a bounded
    table (single tiny partition by construction — same posture as every
    daily-spine rollup). Latency is exact integer seconds on truncated
    timestamps (DuckDB's datediff counts boundary crossings, so both
    sides truncate first), bucket = floor-div 3600, share on the integer
    ppm lattice — hash-exact end to end.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click").alias("e")
        .join(v, "user_id")
        .filter(F.col("e.ts") >= F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase").alias("e")
        .join(c, "user_id")
        .filter(F.col("e.ts") >= F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purch"))
    )
    lat = v.join(p, "user_id").select(
        F.expr(
            "timestampdiff(SECOND, date_trunc('SECOND', t_view),"
            " date_trunc('SECOND', t_purch))"
        ).alias("secs")
    )
    return convert_hist_from_secs(lat)


def convert_hist_from_secs(lat: DataFrame) -> DataFrame:
    """The hour-bucket histogram + cumulative-ppm projection over a
    one-column ``secs`` latency relation — shared by the batch operator
    above and the streaming twin (where ``lat`` is derived from the
    per-user funnel STATE maintained by ``streaming.funnel_state`` and
    this runs read-side over completed users)."""
    b = lat.groupBy(
        F.floor(F.col("secs") / 3600).cast("bigint").alias("bucket_h")
    ).agg(F.count(F.lit(1)).alias("n_users"))
    wcum = Window.orderBy("bucket_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.sum("n_users").over(wcum)
    return b.select(
        "bucket_h",
        F.col("n_users").cast("bigint"),
        cum.cast("bigint").alias("cum_users"),
        F.floor(cum * 1000000 / F.sum("n_users").over(wall))
        .cast("bigint")
        .alias("cum_ppm"),
    )
