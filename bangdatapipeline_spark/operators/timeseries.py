"""Time-series resampling and sketch-rollup operators.

The reference's event-stream analyses (SURVEY.md §2.9) cover windowed
counts; production time-series work additionally needs bar resampling
(OHLC), gap repair (linear interpolation over a generated spine), and
mergeable per-day sketches that roll up to arbitrary windows without
re-reading raw data. All three are declarative DataFrame plans.

Scale notes (100 TB): each operator shuffles once on its natural key
((event_type, bucket) / user_id / (event_type, day)); the spine explode
is bounded by users x days, not by raw event count; the HLL rollup is
the canonical pre-aggregation pattern — daily sketch bytes are the only
state that crosses days, so a month/quarter/year re-window never touches
raw events again.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread



# The ONE per-row cents-lattice spelling now lives in lattice.py (r12,
# VERDICT r11 task 3) so every module interpolates the same function;
# see that module's docstring for the half-away-from-zero vs
# half-toward-+inf hazard and the sanctioned round() exceptions.
from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql

_CENTS_SQL = cents_sql("value")


def _floordiv_sql(expr: str, d: int | str) -> str:
    """FLOOR division as a Spark SQL expression — matches DuckDB's ``//``
    for NEGATIVE operands too (Spark's ``div`` truncates toward zero, so
    -1 div 86400 = 0 where -1 // 86400 = -1). pmod() is always
    non-negative, so (x - pmod(x, d)) is exactly divisible and the div
    is exact int64 arithmetic (r10 review: pre-origin timestamps or
    negative cent sums would silently land in the wrong bucket/day)."""
    return f"((({expr}) - pmod(({expr}), {d})) div {d})"


def _cents_spark(col: Column) -> Column:
    """``value`` -> exact integer cents; SQL twin is ``_CENTS_SQL``."""
    return cents_col(col)


@register(
    "ts_ohlc_resample",
    oracle="""
WITH w AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bucket,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id)           AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type,
       bucket,
       round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open_v,
       round(max(value), 2)                             AS high_v,
       round(min(value), 2)                             AS low_v,
       round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close_v,
       count(*)                                         AS n_obs,
       round(sum(value), 2)                             AS sum_value
FROM w
GROUP BY event_type, bucket
""",
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per (event_type, hour) emit open/high/low/
    close/volume, the classic time-series downsample.

    Open/close are ``min``/``max`` over the lexicographic struct
    (ts, event_id, value) — the unique (ts, event_id) prefix makes the
    pick deterministic, and the whole bar is ONE aggregate with
    map-side partials and a single shuffle on (event_type, hour).
    Struct-valued agg buffers aren't UnsafeRow-mutable, so Spark picks
    SortAggregate over HashAggregate here — still strictly better than
    the row_number-window formulation (one sort by the 2-col group key
    vs two full window sorts + rank state). DuckDB's arg_min can't
    take a composite key, so the oracle states the same pick as
    tie-broken row_number windows. At 100 TB the bar count is bounded
    by types x hours regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    ord_row = F.struct("ts", "event_id", "value")
    return (
        ev.select("event_type", bucket.alias("bucket"), "value", ord_row.alias("ord"))
        .groupBy("event_type", "bucket")
        .agg(
            F.round(F.min("ord").getField("value"), 2).alias("open_v"),
            F.round(F.max("value"), 2).alias("high_v"),
            F.round(F.min("value"), 2).alias("low_v"),
            F.round(F.max("ord").getField("value"), 2).alias("close_v"),
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "ts_interpolate_linear",
    oracle="""
WITH obs AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         floor(avg(value) * 10000 + 0.5) / 10000 AS v
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY user_id)
),
j AS (
  SELECT s.user_id, s.day, o.v
  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.day = o.day
),
f AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       floor(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * (date_diff('day', pd, day) * 1.0
                              / date_diff('day', pd, nd))
       END * 10000 + 0.5) / 10000 AS value_filled,
       CASE WHEN v IS NOT NULL THEN 'obs'
            WHEN pv IS NULL OR nv IS NULL THEN 'edge'
            ELSE 'interp' END AS src
FROM f
""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: per-user daily purchase series on a
    generated day spine; missing days get the straight line between the
    nearest observed neighbors (edges clamp to the nearest observation).

    The spine is ``sequence(min_day, max_day)`` exploded per user —
    bounded by users x days, never by raw event volume — and both window
    passes partition by user_id, so everything after the first aggregate
    is one shuffle on user_id. ``last/first(ignorenulls)`` is the
    O(n)-per-partition carry; no self-join, no as-of join needed.
    Both engines floor-round the observed daily mean onto the 4-dp
    lattice BEFORE interpolating so the line arithmetic starts from
    identical inputs (floor(x*1e4+0.5), not round(): a cents mean can
    sit exactly on a half, where native round() is engine-divergent).
    """
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            # floor lattice, not round(): avg of cent values is a
            # terminating rational that can sit on a 4-dp half where the
            # engines' round() disagree (docs/dialect_notes.md)
            (F.floor(F.avg("value") * 10000 + F.lit(0.5)) / 10000).alias("v")
        )
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    j = spine.join(obs, ["user_id", "day"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    f = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")) / F.datediff(F.col("nd"), F.col("pd"))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    src = (
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit("edge"))
        .otherwise(F.lit("interp"))
    )
    # NOT F.round: Spark rounds the shortest decimal repr (75.913749999…
    # reads as "75.91375" → HALF_UP → .9138) while DuckDB rounds the
    # actual double (→ .9137). floor(x*1e4 + 0.5)/1e4 is pure IEEE double
    # arithmetic, bit-identical on both engines (docs/dialect_notes.md).
    return f.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.floor(filled * 10000 + 0.5) / 10000).alias("value_filled"),
        src.alias("src"),
    )


@register(
    "ts_hll_daily_merge",
    # Like agg_approx_distinct: the sketch estimate itself is
    # engine-specific (DataSketches HLL vs DuckDB's), so the hash-checked
    # contract is the merge-accuracy verdict against the exact count.
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT)          AS exact_users,
       'ok'                                             AS merged_within_5pct
FROM events
GROUP BY event_type
""",
)
def ts_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality rollup: one DataSketches HLL sketch per
    (event_type, day), then ``hll_union_agg`` merges the daily sketches
    into a period-level distinct-user estimate.

    This is the pre-aggregation pattern that makes 100 TB re-windowing
    cheap: the daily sketch bytes (~KB each) are the ONLY thing the
    period rollup reads — raw events are scanned once ever, and any
    month/quarter window is a merge over its days. The exact
    countDistinct here exists only to hash-check the merged estimate
    within +/-5% (it would be dropped in production).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        F.when(
            F.col("est").cast("double").between(
                F.col("exact_users") * 0.95, F.col("exact_users") * 1.05
            ),
            F.lit("ok"),
        )
        .otherwise(F.lit("out_of_bounds"))
        .alias("merged_within_5pct"),
    )


@register(
    "ts_seasonality_hod",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS n
  FROM events GROUP BY event_type, hour(ts)
)
SELECT event_type, hod, n,
       floor(n * 1.0 / sum(n) OVER (PARTITION BY event_type) * 1000000 + 0.5)
         / 1000000 AS share,
       floor(n * 24.0 / sum(n) OVER (PARTITION BY event_type) * 10000 + 0.5)
         / 10000 AS seasonal_idx
FROM g
""",
)
def ts_seasonality_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: share of events
    per hour and the seasonal index (share x 24; 1.0 = flat).

    Aggregates to the types x 24 grid FIRST, so the window total runs
    over 24-row partitions — the raw-event shuffle is the one groupBy.
    Ratio outputs use the IEEE floor-round (n/total is a
    small-denominator rational — terminating-decimal halves split
    engines under native round(); docs/dialect_notes.md).
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.hour("ts").cast("int").alias("hod")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("event_type"))
    share = F.col("n") * 1.0 / tot
    return g.select(
        "event_type",
        "hod",
        "n",
        (F.floor(share * 1000000 + 0.5) / 1000000).alias("share"),
        # operand order matches the oracle exactly: (n*24.0)/tot, ONE
        # division before the lattice — (share*24) would round twice and
        # can land on the other side of the floor(+0.5) boundary
        (F.floor(F.col("n") * 24.0 / tot * 10000 + 0.5) / 10000).alias(
            "seasonal_idx"
        ),
    )


@register(
    "ts_yoy_growth",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         round(sum(o_totalprice), 2)      AS revenue,
         CAST(count(*) AS BIGINT)         AS n_orders
  FROM orders GROUP BY date_trunc('month', o_orderdate)
)
SELECT m.month, m.revenue, m.n_orders,
       p.revenue AS revenue_prev_year,
       floor((m.revenue / p.revenue - 1) * 100 * 100 + 0.5) / 100 AS yoy_pct
FROM monthly m
LEFT JOIN monthly p ON p.month = m.month - INTERVAL 12 MONTH
""",
)
def ts_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth. The prior-year lookup is a
    self-join on (month - 12 months) — NOT lag(12), which silently
    misaligns whenever a month is missing from the series.

    The monthly rollup is bounded (months, not orders), so the self-join
    is broadcast-trivial; the raw-order shuffle is the single rollup
    aggregate. Growth ratios of 2-dp revenues terminate in decimal —
    IEEE floor-round on both sides (docs/dialect_notes.md).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    prev = monthly.select(
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        F.col("revenue").alias("revenue_prev_year"),
    )
    yoy = (F.col("revenue") / F.col("revenue_prev_year") - 1) * 100
    return (
        monthly.join(prev, "month", "left")
        .select(
            "month",
            "revenue",
            "n_orders",
            "revenue_prev_year",
            (F.floor(yoy * 100 + 0.5) / 100).alias("yoy_pct"),
        )
    )


@register(
    "ts_wau_hll_sliding",
    # Sliding-window distinct via merged daily sketches; hash-checked
    # contract = n_days in window + exact count + accuracy verdict
    # (the estimate itself is engine-specific, as in ts_hll_daily_merge).
    oracle="""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
wau AS (
  SELECT d.day,
         CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau_exact,
         CAST(count(DISTINCT CAST(e.ts AS DATE)) AS BIGINT) AS n_days_in_window
  FROM days d
  JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_days_in_window, wau_exact,
       'ok' AS merged_within_5pct
FROM wau
""",
)
def ts_wau_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day from MERGED DAILY SKETCHES:
    the sliding-distinct pattern that makes WAU/MAU cheap at 100 TB.
    ``events_dau_wau`` re-scans raw events per window (exact); here each
    day's HLL sketch is built once and every 7-day window is a merge of
    <= 7 KB-sized sketches — re-windowing (7d -> 28d -> quarter) never
    touches raw data again.

    The day-spine x daily-sketch range join carries |days| x 7 sketch
    rows total; the exact countDistinct exists only to hash-check the
    merged estimate within +/-5% (dropped in production; at 100 TB it
    IS the expensive path this operator replaces).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    days = daily.select("day")
    in_win = daily.alias("s").join(
        F.broadcast(days.alias("d")),
        (F.col("s.day") >= F.date_sub(F.col("d.day"), 6))
        & (F.col("s.day") <= F.col("d.day")),
    )
    merged = in_win.groupBy(F.col("d.day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_days_in_window"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = (
        ev.select(F.to_date("ts").alias("eday"), "user_id")
        .join(
            F.broadcast(days.select(F.col("day").alias("wday"))),
            (F.col("eday") >= F.date_sub(F.col("wday"), 6))
            & (F.col("eday") <= F.col("wday")),
        )
        .groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau_exact"))
    )
    return merged.join(exact, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_days_in_window",
        "wau_exact",
        F.when(
            F.col("est").cast("double").between(
                F.col("wau_exact") * 0.95, F.col("wau_exact") * 1.05
            ),
            F.lit("ok"),
        )
        .otherwise(F.lit("out_of_bounds"))
        .alias("merged_within_5pct"),
    )


OPEN_DAYS = 30  # an order is "open" for 30 days after o_orderdate


@register(
    "ts_open_backlog",
    oracle=f"""
WITH deltas AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS opened, 0 AS closed FROM orders
  UNION ALL
  SELECT CAST(o_orderdate + INTERVAL {OPEN_DAYS} DAY AS DATE), 0, 1 FROM orders
),
daily AS (
  SELECT day,
         CAST(sum(opened) AS BIGINT) AS n_opened,
         CAST(sum(closed) AS BIGINT) AS n_closed
  FROM deltas GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_opened, n_closed,
       CAST(sum(n_opened - n_closed)
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM daily
""",
)
def ts_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval counting: how many orders are OPEN on each
    day (open = within {OPEN_DAYS} days of o_orderdate). Each interval
    becomes a +1 at its start and a -1 past its end; the running sum of
    the DAILY aggregate is the concurrent-interval count — the standard
    trick that turns interval-stabbing (a range join) into one
    aggregate + one bounded cumsum.

    The fact-sized work is the per-day delta aggregate (map-side
    partials); the unpartitioned cumsum window runs over |days| rows
    only — at 100 TB that is still thousands of rows, not billions
    (range-partition the running sum if the day grid ever grows past
    driver comfort).
    """
    o = load_table(spark, sf_dir, "orders")
    opens = o.select(
        F.to_date("o_orderdate").alias("day"),
        F.lit(1).alias("opened"),
        F.lit(0).alias("closed"),
    )
    closes = o.select(
        F.to_date(F.date_add(F.col("o_orderdate"), OPEN_DAYS)).alias("day"),
        F.lit(0).alias("opened"),
        F.lit(1).alias("closed"),
    )
    daily = (
        opens.unionAll(closes)
        .groupBy("day")
        .agg(F.sum("opened").alias("n_opened"), F.sum("closed").alias("n_closed"))
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(cum).alias("backlog"),
    )


CHURN_DAYS = 7


@register(
    "ts_churn_flags",
    oracle=f"""
WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
u AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         max(CAST(ts AS DATE))    AS last_day
  FROM events GROUP BY user_id
)
SELECT u.user_id, u.n_events,
       strftime(u.last_day, '%Y-%m-%d')                  AS last_day,
       CAST(date_diff('day', u.last_day, r.ref_day) AS INT) AS days_inactive,
       date_diff('day', u.last_day, r.ref_day) >= {CHURN_DAYS} AS churned
FROM u, ref r
""",
)
def ts_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity churn flags: days since each user's last event,
    measured against the corpus max day (the 'as-of' anchor), flagged
    churned at >= {CHURN_DAYS} days — the lifecycle segmentation every
    retention dashboard starts from.

    One per-user aggregate plus a lazy 1-row broadcast for the anchor
    (no eager job at plan time, same pattern as graph_basket_lift's
    n_orders). Nothing here scales past |users| rows after the first
    shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_day"))
    inactive = F.datediff(F.col("ref_day"), F.col("last_day"))
    return u.crossJoin(F.broadcast(ref)).select(
        "user_id",
        "n_events",
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        inactive.cast("int").alias("days_inactive"),
        (inactive >= CHURN_DAYS).alias("churned"),
    )


_BM_WORD = 64


@register(
    "ts_wau_bitmap_sliding",
    # EXACT sliding distinct — unlike the HLL twin this hash-checks the
    # actual counts, not an accuracy verdict.
    oracle=f"""
WITH words AS (
  SELECT CAST(ts AS DATE) AS day,
         user_id // {_BM_WORD} AS bucket,
         bit_or(CAST(1 AS UBIGINT) << CAST(user_id % {_BM_WORD} AS INT)) AS w
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM words),
merged AS (
  SELECT d.day, s.bucket, bit_or(s.w) AS w
  FROM days d
  JOIN words s ON s.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day, s.bucket
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(bit_count(w)) AS BIGINT) AS wau_exact
FROM merged GROUP BY day
""",
)
def ts_wau_bitmap_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day from OR-MERGED DAILY BITMAPS —
    the EXACT sliding-distinct path for dense id spaces, completing the
    cardinality-policy triangle: ``events_dau_wau`` re-scans raw events
    (exact, expensive), ``ts_wau_hll_sliding`` merges sketches (cheap,
    ±rsd), this merges bitmap words (cheap AND exact when ids are
    dense — the ClickHouse/Druid pattern).

    Daily (day, bucket)->word state is built once from raw events;
    every 7-day window is a bit_or over <=7 words per bucket and a
    bit_count sum — associative merges, map-side partials, no raw
    re-scan. At 10^9 users a day's bitmap is 125 MB spread over the
    bucket key space; re-windowing cost is independent of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    words = ev.groupBy(
        F.to_date("ts").alias("day"),
        # integer div, not double division: the 53-bit double mantissa
        # corrupts buckets for ids above 2^53 (same fix as _bitmap_words)
        F.expr(f"user_id div {_BM_WORD}").alias("bucket"),
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(1L, cast(user_id % {_BM_WORD} as int))")
        ).alias("w")
    )
    days = words.select("day").distinct()
    merged = (
        words.alias("s")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("s.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("s.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("s.bucket"))
        .agg(F.bit_or("s.w").alias("w"))
    )
    return merged.groupBy("day").agg(
        F.sum(F.bit_count("w")).alias("wau_exact")
    ).select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau_exact")


# --------------------------------------------------------------------------
# Sliding histogram quantiles: trailing-7d p50/p95 from merged daily bins
# --------------------------------------------------------------------------

_HQ_BIN_W = 10  # histogram bin width on events.value
_HQ_BINS = 50  # bins 0..49 cover the 0..490 value domain (clamped)


@register(
    "ts_hist_quantile_sliding",
    tags=("stream_twin", "stream_test:test_hist_quantile_stream_equals_batch"),
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(least(floor(value / {_HQ_BIN_W}), {_HQ_BINS - 1}) AS INT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT d.day, b.bin
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT unnest(generate_series(0, {_HQ_BINS - 1})) AS bin) b
),
dense AS (
  SELECT s.day, s.bin,
         CAST(date_diff('day', TIMESTAMP '2024-01-01', s.day) AS INT) AS day_num,
         coalesce(d.cnt, 0) AS cnt
  FROM spine s LEFT JOIN daily d ON d.day = s.day AND d.bin = s.bin
),
w7 AS (
  SELECT day, bin,
         sum(cnt) OVER (PARTITION BY bin ORDER BY day_num
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS c7
  FROM dense
),
cum AS (
  SELECT day, bin, c7,
         sum(c7) OVER (PARTITION BY day ORDER BY bin) AS cum7,
         sum(c7) OVER (PARTITION BY day) AS total7
  FROM w7
)
SELECT day,
       CAST(max(total7) AS BIGINT)                                   AS n_7d,
       CAST(min(CASE WHEN 2 * cum7 >= total7 THEN bin END)
            * {_HQ_BIN_W} AS INT)                                    AS p50_lo,
       CAST(min(CASE WHEN 20 * cum7 >= 19 * total7 THEN bin END)
            * {_HQ_BIN_W} AS INT)                                    AS p95_lo
FROM cum
GROUP BY day
""",
)
def ts_hist_quantile_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p50/p95 of event value per day, computed by MERGING
    DAILY HISTOGRAMS instead of re-scanning seven days of raw rows — the
    mergeable-sketch pattern for sliding quantiles (the quantile sibling
    of ``ts_wau_hll_sliding``'s sliding distinct). The scan collapses
    once to (day, bin) counts (30 x 50 rows here, bounded at any scale);
    the trailing window, cumulative bins, and the quantile pick all run
    on that fixed grid. Quantiles land on bin lower bounds — ±bin-width
    resolution, the explicit sketch trade — and every comparison is
    integer (2*cum >= total, 20*cum >= 19*total), so the whole
    approximate pipeline is hash-exact against the oracle.

    The RANGE frame over day_num (not ROWS) keeps the trailing window
    correct even when a (bin, day) run has gaps; the bin spine is
    generated dense per day so cumulative sums see every bin's trailing
    weight.

    100 TB: daily (day, bin) histograms are the stored rollup (a few KB
    per day regardless of event volume); any trailing window [k days] or
    any quantile is then a grid-only query — never a raw re-scan. Finer
    resolution = t-digest/KLL sketches per day with the same merge shape.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.least(F.floor(F.col("value") / _HQ_BIN_W), F.lit(_HQ_BINS - 1))
        .cast("int")
        .alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return hist_quantiles(daily)


def hist_quantiles(daily: DataFrame) -> DataFrame:
    """Quantile tail over a (day, bin, cnt) histogram grid — shared by the
    batch query above and the streaming variant (which maintains the grid
    as a streaming aggregate and applies this in foreachBatch)."""
    spark = daily.sparkSession
    days = daily.select("day").distinct()
    bins = spark.range(_HQ_BINS).select(F.col("id").cast("int").alias("bin"))
    spine = days.crossJoin(F.broadcast(bins))
    dense = (
        spine.join(daily, ["day", "bin"], "left")
        .select(
            "day",
            "bin",
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("timestamp"))
            .cast("int")
            .alias("day_num"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    w_trail = (
        Window.partitionBy("bin").orderBy("day_num").rangeBetween(-6, 0)
    )
    w7 = dense.select(
        "day", "bin", F.sum("cnt").over(w_trail).alias("c7")
    )
    w_cum = Window.partitionBy("day").orderBy("bin")
    w_day = Window.partitionBy("day")
    cum = w7.select(
        "day",
        "bin",
        "c7",
        F.sum("c7").over(w_cum).alias("cum7"),
        F.sum("c7").over(w_day).alias("total7"),
    )
    return cum.groupBy("day").agg(
        F.max("total7").cast("bigint").alias("n_7d"),
        (
            F.min(F.when(2 * F.col("cum7") >= F.col("total7"), F.col("bin")))
            * _HQ_BIN_W
        )
        .cast("int")
        .alias("p50_lo"),
        (
            F.min(F.when(20 * F.col("cum7") >= 19 * F.col("total7"), F.col("bin")))
            * _HQ_BIN_W
        )
        .cast("int")
        .alias("p95_lo"),
    )


@register(
    "ts_xcorr_leadlag",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({_CENTS_SQL}) AS HUGEINT) AS v
  FROM events GROUP BY 1, 2
),
lags AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
joined AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         a.v AS x, b.v AS y
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b
    ON b.event_type > a.event_type
   AND b.day = a.day + l.lag
),
s AS (
  SELECT type_a, type_b, lag,
         CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM joined GROUP BY 1, 2, 3
)
SELECT type_a, type_b, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS xcorr
FROM s
""",
)
def ts_xcorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation between event-type daily series — does
    signal A today predict signal B in k days? — for every ordered type
    pair at lags -2..+2. The classic product-metric question (clicks
    lead purchases?) answered as pure relational algebra: facts reduce
    to a bounded (type, day) daily table FIRST (map-side combined; at
    100 TB this is the only pass over raw events), and the lag joins,
    power sums, and Pearson formula all run on that tiny table.
    Integer-cent daily sums + wide-integer power sums (decimal38 /
    HUGEINT) leave ONE float division+sqrt of bit-identical operands —
    the moment-sketch determinism pattern of agg_ols_trend /
    agg_covariance_matrix.
    """
    dec = "decimal(38,0)"
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(_cents_spark(F.col("value")))
            .cast(dec)
            .alias("v")
        )
    )
    lags = spark.range(-2, 3).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(
        F.col("event_type").alias("type_a"), F.col("day").alias("day_a"), F.col("v").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), F.col("day").alias("day_b"), F.col("v").alias("y")
    )
    joined = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            (F.col("type_b") > F.col("type_a"))
            & (F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag"))),
        )
    )
    s = joined.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "type_a",
        "type_b",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_days"),
        (num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double"))).alias("xcorr"),
    )


@register(
    "ts_up_streaks",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({_CENTS_SQL}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
flagged AS (
  SELECT event_type, day, v,
         CASE WHEN v > lag(v) OVER w THEN 1 ELSE 0 END AS up
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
grouped AS (
  SELECT event_type, day, up,
         sum(CASE WHEN up = 1 THEN 0 ELSE 1 END)
           OVER (PARTITION BY event_type ORDER BY day) AS streak_id
  FROM flagged
),
streaks AS (
  SELECT event_type, streak_id,
         CAST(count(*) AS BIGINT) AS len_days,
         min(day) AS streak_start, max(day) AS streak_end
  FROM grouped WHERE up = 1
  GROUP BY 1, 2
)
SELECT event_type,
       len_days,
       strftime(streak_start, '%Y-%m-%d') AS streak_start,
       strftime(streak_end, '%Y-%m-%d')   AS streak_end
FROM streaks
QUALIFY row_number() OVER (
  PARTITION BY event_type ORDER BY len_days DESC, streak_start ASC
) = 1
""",
)
def ts_up_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive day-over-day increases per event type
    (monitoring/anomaly vocabulary: momentum streaks) via the
    gaps-and-islands RESET trick: a running count of non-increase days
    is constant exactly across one streak, so it IS the streak id — no
    iteration, two window passes over the bounded (type, day) daily
    table. Everything is integer cents and dates; the daily reduction
    is the only pass over raw facts (same 100 TB shape as
    ``ts_xcorr_leadlag``).
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(_cents_spark(F.col("value"))).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = daily.withColumn(
        "up", F.when(F.col("v") > F.lag("v").over(w), 1).otherwise(0)
    )
    grouped = flagged.withColumn(
        "streak_id",
        F.sum(F.when(F.col("up") == 1, 0).otherwise(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    streaks = (
        grouped.filter(F.col("up") == 1)
        .groupBy("event_type", "streak_id")
        .agg(
            F.count(F.lit(1)).alias("len_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("len_days").desc(), F.col("streak_start").asc()
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "len_days",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
        )
    )


_LTTB_K = 8  # output buckets per series
_LTTB_ORIGIN = "2024-01-01 00:00:00"  # epoch origin inside the data range


@register(
    "ts_lttb_downsample",
    oracle=f"""
WITH pts AS (
  SELECT user_id, ts, event_id, value,
         date_diff('microsecond', TIMESTAMP '{_LTTB_ORIGIN}', ts) AS x,
         {_CENTS_SQL}                                             AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*)    OVER (PARTITION BY user_id)   AS n
  FROM events
),
pb AS (SELECT *, ((rn - 1) * {_LTTB_K}) // n AS bucket FROM pts),
bk AS (
  SELECT user_id, bucket,
         CAST(sum(x) AS BIGINT) // count(*) AS xb,
         CAST(sum(y) AS BIGINT) // count(*) AS yb
  FROM pb GROUP BY user_id, bucket
),
bl AS (
  SELECT user_id, bucket,
         lag(xb)  OVER w AS xp, lag(yb)  OVER w AS yp,
         lead(xb) OVER w AS xn, lead(yb) OVER w AS yn
  FROM bk WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
),
a AS (
  SELECT p.user_id, p.bucket, p.ts, p.event_id, p.rn, p.value,
         CASE WHEN l.xp IS NULL THEN p.rn
              WHEN l.xn IS NULL THEN -p.rn
              ELSE -abs((l.xp - l.xn) * (p.y - l.yp)
                        - (l.xp - p.x) * (l.yn - l.yp)) END AS sel_key
  FROM pb p JOIN bl l ON p.user_id = l.user_id AND p.bucket = l.bucket
)
SELECT user_id, bucket, ts, round(value, 2) AS value_r
FROM a
QUALIFY row_number() OVER (PARTITION BY user_id, bucket
                           ORDER BY sel_key, ts, event_id) = 1
""",
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (largest-triangle-three-buckets) series downsampling, the
    bucket-average variant: each user's series splits into K=8 equal
    row-count buckets; within a bucket the kept point maximizes the
    triangle area spanned with the *previous and next bucket averages*
    (the standard parallelizable LTTB approximation — the sequential
    original anchors on the previously SELECTED point, an inherently
    serial chain). First/last buckets keep their first/last point, as
    LTTB always retains the endpoints.

    Exactness: x = microseconds from a fixed origin (bigint), y = value
    on the cents lattice (bigint), bucket averages are floor-divided
    sums — the doubled triangle area is then pure int64 arithmetic
    (|x-span| * |y-span| ~ 1e17 max here; at multi-year spans rescale x
    to ms), so the per-bucket argmax cannot flip between engines; ties
    break on (ts, event_id).

    Plan shape: two windows partitioned by user_id + one groupBy
    (user_id, bucket) + a co-keyed join — everything shuffles once on
    the series key and the result is K rows per series regardless of
    input length, which is the whole point of downsampling 100 TB of
    telemetry into a plottable table.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{_LTTB_ORIGIN}', ts)"
    )
    y = _cents_spark(F.col("value"))
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_n = Window.partitionBy("user_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        x.alias("x"),
        y.alias("y"),
        F.row_number().over(w_u).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).withColumn("bucket", F.expr(f"(rn - 1) * {_LTTB_K} div n"))
    bk = pts.groupBy("user_id", "bucket").agg(
        F.expr(_floordiv_sql("sum(x)", "count(1)")).alias("xb"),
        F.expr(_floordiv_sql("sum(y)", "count(1)")).alias("yb"),
    )
    w_b = Window.partitionBy("user_id").orderBy("bucket")
    bl = bk.select(
        "user_id",
        "bucket",
        F.lag("xb").over(w_b).alias("xp"),
        F.lag("yb").over(w_b).alias("yp"),
        F.lead("xb").over(w_b).alias("xn"),
        F.lead("yb").over(w_b).alias("yn"),
    )
    joined = pts.join(bl, ["user_id", "bucket"])
    sel_key = (
        F.when(F.col("xp").isNull(), F.col("rn"))
        .when(F.col("xn").isNull(), -F.col("rn"))
        .otherwise(
            -F.abs(
                (F.col("xp") - F.col("xn")) * (F.col("y") - F.col("yp"))
                - (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("yp"))
            )
        )
    )
    w_pick = Window.partitionBy("user_id", "bucket").orderBy(
        "sel_key", "ts", "event_id"
    )
    return (
        joined.withColumn("sel_key", sel_key)
        .withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "user_id", "bucket", "ts", F.round("value", 2).alias("value_r")
        )
    )


_CONC_GAP_MIN = 30  # session gap rule (same as events_session_paths)
_CONC_DAY_US = 86_400_000_000
_CONC_ORIGIN = "2024-01-01 00:00:00"


@register(
    "ts_concurrency_peak",
    oracle=f"""
WITH o AS (
  SELECT user_id,
         date_diff('microsecond', TIMESTAMP '{_CONC_ORIGIN}', ts) AS t,
         lag(date_diff('microsecond', TIMESTAMP '{_CONC_ORIGIN}', ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
  FROM events
),
flagged AS (
  SELECT user_id, t,
         CASE WHEN prev_t IS NULL
               OR t - prev_t > {_CONC_GAP_MIN} * 60000000
              THEN 1 ELSE 0 END AS is_new
  FROM o
),
sess AS (
  SELECT user_id, t,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
iv AS (
  SELECT user_id, sess_id, min(t) AS s, max(t) AS e
  FROM sess GROUP BY user_id, sess_id
),
seg AS (
  SELECT user_id, sess_id, d,
         CASE WHEN s > d * {_CONC_DAY_US} THEN s
              ELSE d * {_CONC_DAY_US} END AS s2,
         CASE WHEN e < (d + 1) * {_CONC_DAY_US} - 1 THEN e
              ELSE (d + 1) * {_CONC_DAY_US} - 1 END AS e2
  FROM iv, unnest(generate_series(s // {_CONC_DAY_US},
                                  e // {_CONC_DAY_US})) u(d)
),
bounds AS (
  SELECT d, s2 AS t, 1 AS delta FROM seg
  UNION ALL
  SELECT d, e2 + 1 AS t, -1 AS delta FROM seg
),
run AS (
  SELECT d, sum(delta) OVER (PARTITION BY d ORDER BY t, delta DESC
                             ROWS UNBOUNDED PRECEDING) AS active
  FROM bounds
)
SELECT strftime(DATE '2024-01-01' + to_days(CAST(d AS INT)), '%Y-%m-%d') AS day,
       CAST(max(active) AS BIGINT) AS peak_concurrent,
       CAST(count(*) / 2 AS BIGINT) AS n_active_sessions
FROM run
GROUP BY d
""",
)
def ts_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning staple:
    sessionize (30-min gap rule), clip each session interval at day
    boundaries, convert to +1/-1 boundary events, and take the max of
    the running sum per day. A session active over midnight counts in
    both days (clipped segments), matching how an ops dashboard reads
    "concurrent now".

    Determinism at ties: +1 sorts before -1 at an equal timestamp
    (inclusive-interval convention), and although the cumsum's
    row-level values at tied +1s depend on tie order, the per-day MAX
    is order-invariant — the multiset of prefix values after each +1 is
    fixed — so both engines agree exactly (pure integer microseconds).

    Scale shape: sessionization is the lag-gap-cumsum kernel partitioned
    by user; the boundary cumsum partitions by DAY, so no global-order
    window exists — every stage is keyed and the per-day event count is
    bounded by 2x sessions/day. At 100 TB the day key may widen to
    (day, shard) with a two-phase max if a single day's boundary count
    outgrows one partition.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{_CONC_ORIGIN}', ts)"
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", "ts", "event_id", us.alias("t")).withColumn(
        "prev_t", F.lag("t").over(w_u)
    )
    gap_us = _CONC_GAP_MIN * 60_000_000
    flagged = o.withColumn(
        "is_new",
        F.when(
            F.col("prev_t").isNull() | (F.col("t") - F.col("prev_t") > gap_us), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.withColumn("sess_id", F.sum("is_new").over(w_run))
    iv = sess.groupBy("user_id", "sess_id").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    seg = iv.select(
        "user_id",
        "sess_id",
        F.explode(
            F.sequence(
                F.expr(_floordiv_sql("s", _CONC_DAY_US)),
                F.expr(_floordiv_sql("e", _CONC_DAY_US)),
            )
        ).alias("d"),
        "s",
        "e",
    ).select(
        "d",
        F.greatest(F.col("s"), F.col("d") * _CONC_DAY_US).alias("s2"),
        F.least(F.col("e"), (F.col("d") + 1) * _CONC_DAY_US - 1).alias("e2"),
    )
    bounds = seg.select("d", F.col("s2").alias("t"), F.lit(1).alias("delta")).unionAll(
        seg.select("d", (F.col("e2") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    w_day = (
        Window.partitionBy("d")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = bounds.withColumn("active", F.sum("delta").over(w_day))
    return run.groupBy("d").agg(
        F.max("active").cast("long").alias("peak_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_active_sessions"),
    ).select(
        F.date_format(
            F.expr("date_add(DATE '2024-01-01', cast(d as int))"), "yyyy-MM-dd"
        ).alias("day"),
        "peak_concurrent",
        "n_active_sessions",
    )


# ---------------------------------------------------------------------------
# Feed-silence audit (max inter-event gap)
# ---------------------------------------------------------------------------

@register(
    "ts_max_silence",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT)                  AS n_events,
       CAST(max(gap_us) AS BIGINT)               AS max_gap_us,
       CAST(floor(max(gap_us) / 1000000) AS BIGINT) AS max_gap_s
FROM g GROUP BY event_type
""",
)
def ts_max_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest silent period per feed — the "did this source stall and
    recover without anyone noticing?" audit that complements
    dq_freshness (which only sees the CURRENT lag, not a healed outage).

    The oracle states the obvious one-window form (lag per type over the
    full stream); the Spark plan computes the SAME maximum two-level so
    no task ever sorts a whole feed: (1) per (type, day) — a fine-grained
    key — the max INTRA-bucket gap via a bucket-local lag, plus the
    bucket's min/max ts and count; (2) per type over the bounded
    (types x days) bucket summaries, the BOUNDARY gaps between
    consecutive present buckets via one more lag, then max(intra,
    boundary). Every gap is an exact integer microsecond difference.
    At 100 TB stage 1 partitions by (type, day) — thousands of balanced
    partitions per feed instead of one giant per-type sort — and stage 2
    touches summaries only.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    rows = ev.select(
        "event_type", F.to_date("ts").alias("day"), us.alias("us"), "event_id"
    )
    w_in = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    intra = rows.withColumn("gap", F.col("us") - F.lag("us").over(w_in))
    buckets = intra.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("gap").alias("max_intra"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    w_b = Window.partitionBy("event_type").orderBy("day")
    stitched = buckets.withColumn(
        "boundary", F.col("first_us") - F.lag("last_us").over(w_b)
    )
    return stitched.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.greatest(F.max("max_intra"), F.max("boundary")).alias("max_gap_us"),
        F.floor(
            F.greatest(F.max("max_intra"), F.max("boundary")) / 1000000
        )
        .cast("bigint")
        .alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast evaluation
# ---------------------------------------------------------------------------

@register(
    "ts_forecast_snaive_eval",
    tags=("stream_twin", "stream_test:test_snaive_backtest_stream_equals_batch"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({_CENTS_SQL}) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT a.event_type, a.day, a.cents,
         f.cents AS forecast_cents
  FROM daily a JOIN daily f
    ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
)
SELECT event_type,
       CAST(count(*) AS BIGINT)                          AS n_days,
       CAST(sum(abs(cents - forecast_cents)) AS BIGINT)  AS sum_abs_err_cents,
       CAST((sum(abs(cents - forecast_cents)) + count(*) // 2) // count(*)
            AS BIGINT)                                   AS mae_cents,
       CAST(sum(cents - forecast_cents) AS BIGINT)       AS bias_cents
FROM j GROUP BY event_type
""",
)
def ts_forecast_snaive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-feed
    total as the SAME WEEKDAY one week earlier and score MAE and signed
    bias per feed — the baseline every real forecasting model must beat,
    and the cheapest always-on sanity monitor for weekly-seasonal
    volume.

    Daily totals land on the exact cents lattice BEFORE differencing, so
    errors are exact BIGINT and MAE publishes on an integer rounding
    lattice (no float division). Plan: one map-side-combined daily
    rollup (bounded feeds x days keys), then a self-equi-join on
    (feed, day-7) over that tiny daily table, then a |feeds|-row
    reduction. At 100 TB only the first aggregate sees raw events; the
    backtest itself runs on kilobytes.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            _cents_spark(F.col("value"))
        ).alias("cents")
    )
    return snaive_backtest_from_daily(daily)


def snaive_backtest_from_daily(daily: DataFrame) -> DataFrame:
    """Shared read-side backtest over a (event_type, day, cents) daily
    table — used by the batch operator above and by the streaming twin,
    whose state IS this daily table (tests/test_streaming.py asserts the
    stream-fed result equals the batch one exactly)."""
    # the forecast side renames EVERY column before the self-join: the
    # projection mints fresh attribute ids, so the join condition is
    # unambiguous even when ``daily`` is a memory-sink view (Spark 4's
    # qualified-alias self-join resolution fails on those)
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.date_add("day", 7).alias("f_day"),
        F.col("cents").alias("forecast_cents"),
    )
    j = daily.join(
        f,
        (F.col("event_type") == F.col("f_type"))
        & (F.col("day") == F.col("f_day")),
    ).select("event_type", "cents", "forecast_cents")
    err = F.col("cents") - F.col("forecast_cents")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(err)).alias("sum_abs_err_cents"),
        F.expr(
            "(sum(abs(cents - forecast_cents)) + count(*) DIV 2) DIV count(*)"
        ).alias("mae_cents"),
        F.sum(err).alias("bias_cents"),
    )


# ---------------------------------------------------------------------------
# Interval-union coverage
# ---------------------------------------------------------------------------

_COV_INTERVAL_US = 300_000_000  # each event opens a 5-minute activity interval

@register(
    "ts_coverage_union",
    oracle=f"""
WITH iv AS (
  SELECT event_type, event_id,
         epoch_us(ts)                      AS s_us,
         epoch_us(ts) + {_COV_INTERVAL_US} AS e_us
  FROM events
),
m AS (
  SELECT event_type, event_id, s_us, e_us,
         max(e_us) OVER (PARTITION BY event_type ORDER BY s_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv
),
isl AS (
  SELECT event_type, s_us, e_us,
         sum(CASE WHEN prev_max_e IS NULL OR s_us > prev_max_e
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY s_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
),
per AS (
  SELECT event_type, island,
         CAST(count(*) AS BIGINT)            AS n_iv,
         CAST(max(e_us) - min(s_us) AS BIGINT) AS span_us
  FROM isl GROUP BY event_type, island
)
SELECT event_type,
       CAST(sum(n_iv) AS BIGINT)                       AS n_intervals,
       CAST(count(*) AS BIGINT)                        AS n_islands,
       CAST(sum(span_us) // 1000000 AS BIGINT)         AS covered_s,
       CAST(max(span_us) // 1000000 AS BIGINT)         AS max_island_s
FROM per GROUP BY event_type
""",
)
def ts_coverage_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per feed — the uptime/SLA computation:
    each event opens a 5-minute activity interval, overlapping intervals
    merge, and the answer is how much wall-clock each feed actually
    covered (plus island counts and the longest unbroken run). The dual
    of ts_max_silence (silence measures the gaps, coverage measures the
    union) and distinct from ts_concurrency_peak (max overlap DEPTH, not
    union LENGTH).

    Classic sweep: order intervals by start, carry the running max end
    with a 1-PRECEDING frame, start a new island when the next interval
    begins after everything seen so far ended, then two bounded-key
    aggregations. All arithmetic is exact integer microseconds. One
    shuffle on event_type; at 100 TB range-partition each feed by time
    and stitch boundary islands with per-bucket (min_start, max_end)
    summaries — the same two-level trick ts_max_silence ships, applied
    to islands instead of gaps.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    iv = ev.select(
        "event_type",
        "event_id",
        us.alias("s_us"),
        (us + F.lit(_COV_INTERVAL_US)).alias("e_us"),
    )
    wo = Window.partitionBy("event_type").orderBy("s_us", "event_id")
    prev_max = F.max("e_us").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(prev_max.isNull() | (F.col("s_us") > prev_max), 1).otherwise(0)
    isl = iv.withColumn(
        "island",
        F.sum(flag).over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per = isl.groupBy("event_type", "island").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("e_us") - F.min("s_us")).alias("span_us"),
    )
    return per.groupBy("event_type").agg(
        F.sum("n_iv").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.expr("sum(span_us) DIV 1000000").alias("covered_s"),
        F.expr("max(span_us) DIV 1000000").alias("max_island_s"),
    )


# --------------------------------------------------------------------------
# Local-peak detection on the daily series
# --------------------------------------------------------------------------


@register(
    "ts_peak_detection",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({_CENTS_SQL}) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
nbr AS (
  SELECT event_type, day, cents,
         lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev_cents,
         lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS next_cents
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cents,
       cents - prev_cents AS rise_cents,
       cents - next_cents AS fall_cents
FROM nbr
WHERE prev_cents IS NOT NULL AND next_cents IS NOT NULL
  AND cents > prev_cents AND cents > next_cents
""",
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily revenue series: a day is a
    peak when its exact-cents total strictly exceeds BOTH neighbors
    (series endpoints can never qualify — a one-sided comparison is not
    a peak). Emits each peak with its rise and fall magnitudes — the
    spike shortlist an anomaly triage queue starts from, complementing
    the deviation-based monitors (dq_volume_anomaly's MAD fence flags
    level shifts; this flags local extrema regardless of level).

    The event stream collapses to the bounded (event_type, day) daily
    table first — map-side combine absorbs raw volume — and the
    lag/lead pass rides one partition per event_type over a
    |days|-sized series: at 100 TB the windowed stage sees a few
    thousand rows no matter the input. Strict > on the integer cents
    lattice makes peak membership exact (no float tie ambiguity).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(_cents_spark(F.col("value")))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    nbr = daily.withColumn("prev_cents", F.lag("cents").over(w)).withColumn(
        "next_cents", F.lead("cents").over(w)
    )
    return (
        nbr.filter(
            F.col("prev_cents").isNotNull()
            & F.col("next_cents").isNotNull()
            & (F.col("cents") > F.col("prev_cents"))
            & (F.col("cents") > F.col("next_cents"))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            (F.col("cents") - F.col("prev_cents")).alias("rise_cents"),
            (F.col("cents") - F.col("next_cents")).alias("fall_cents"),
        )
    )


@register(
    "ts_cumulative_reach",
    tags=("stream_twin", "stream_test:test_cumulative_reach_stream_equals_batch"),
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
newc AS (SELECT d0 AS day, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY 1),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(coalesce(newc.n_new, 0) AS BIGINT) AS n_new,
       CAST(sum(coalesce(newc.n_new, 0)) OVER (ORDER BY days.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_reach
FROM days LEFT JOIN newc ON newc.day = days.day
""",
)
def ts_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-reach curve: distinct users ever seen up to each day —
    the growth metric next to the windowed DAU/WAU family
    (events_dau_wau counts a trailing window; this counts the
    all-time union). The trick that makes it exact AND scalable: a
    running COUNT(DISTINCT) never runs distinct per day — each user
    collapses to their FIRST-seen day once, and the reach curve is the
    running SUM of first-seen counts, which is algebraically the same
    number.

    Shapes: one groupBy(user_id) min (keyed on users), one bounded
    day-keyed count, then a cumulative window over the |days|-row spine
    (single tiny partition by construction — same posture as every daily
    rollup here). At 100 TB the user collapse is the only big shuffle
    and it is the minimal one possible for this statistic.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    return reach_from_first_seen(first_seen, days)


def reach_from_first_seen(first_seen: DataFrame, days: DataFrame) -> DataFrame:
    """The day-spine cumsum half of ``ts_cumulative_reach``, shared with
    its streaming twin (the twin maintains per-user min-day as streaming
    state and calls this read-side): ``first_seen (user_id, d0)`` +
    ``days (day)`` -> per-day new users and running reach."""
    newc = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    spine = days.join(newc, "day", "left").select(
        "day", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return spine.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new"),
        F.sum("n_new").over(w).cast("bigint").alias("cum_reach"),
    )


# --------------------------------------------------------------------------
# Classical seasonal decomposition (trend + weekly seasonal + residual)
# --------------------------------------------------------------------------

_SD_TREND = 7  # centered moving-average width (3 preceding + self + 3 following)


@register(
    "ts_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT event_type, day, n,
         CASE WHEN count(*) OVER w = 7
              THEN CAST(floor(sum(n) OVER w * 1000000.0 / 7) AS BIGINT)
         END AS trend_ppm
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dowed AS (SELECT *, dayofweek(day) AS dow FROM tr),
seas AS (
  SELECT event_type, dow,
         CAST(floor(avg(n * 1000000 - trend_ppm)) AS BIGINT) AS seasonal_ppm
  FROM dowed WHERE trend_ppm IS NOT NULL
  GROUP BY 1, 2
)
SELECT t.event_type,
       strftime(t.day, '%Y-%m-%d') AS day,
       t.n,
       t.trend_ppm,
       s.seasonal_ppm,
       CASE WHEN t.trend_ppm IS NOT NULL
            THEN t.n * 1000000 - t.trend_ppm - s.seasonal_ppm
       END AS resid_ppm
FROM dowed t LEFT JOIN seas s
  ON s.event_type = t.event_type AND s.dow = t.dow
""",
    tags=("stream_twin", "stream_test:test_seasonal_decompose_stream_equals_batch"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the per-feed daily
    volume series: trend = centered 7-day moving average (full windows
    only), seasonal = per day-of-week mean of the detrended series,
    residual = observed - trend - seasonal. The decomposition behind
    "is Monday always low, or is THIS Monday low?" — the volume-anomaly
    monitor's seasonal-aware sibling (dq_volume_anomaly flags against a
    trailing window; this separates the weekly shape out first).

    Exactness: everything lives on the integer ppm lattice — trend_ppm =
    floor(sum7 * 1e6 / 7) (exact-double product and one division, both
    IEEE-identical across engines), seasonal_ppm = floor of a mean of
    bigints, residual pure int64 arithmetic. Edge days (incomplete
    7-day window) carry NULL trend/residual rather than a biased
    partial-window estimate.

    Scale (100 TB): the one volume-bearing shuffle is the daily rollup
    keyed (event_type, day); the decomposition itself runs over the
    |feeds| x |days| state table — same state-plus-read-side split as
    the volume/freshness monitors, and the shared read-side projection
    is what the streaming twin replays over its tumbling-count state
    (tests/test_streaming.py::test_seasonal_decompose_stream_equals_batch).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return seasonal_decompose_from_daily(daily)


def seasonal_decompose_from_daily(daily: DataFrame) -> DataFrame:
    """trend/seasonal/residual projection over a (event_type, day, n)
    daily rollup — shared by the batch operator above and the streaming
    twin (where ``daily`` is the tumbling-count STATE maintained by
    ``streaming.daily_type_counts`` and this runs read-side)."""
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.when(
            F.count(F.lit(1)).over(w) == _SD_TREND,
            F.floor(F.sum("n").over(w) * 1000000.0 / _SD_TREND).cast("bigint"),
        ).alias("trend_ppm"),
    ).withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    # seas derives from tr, so the rejoin is a SELF-join: renaming the
    # grouped keys (fresh exprIds via alias-projection) disambiguates it
    # for any `daily` lineage — a parquet scan or a streaming state view
    # whose branches would otherwise share attribute ids.
    seas = (
        tr.where(F.col("trend_ppm").isNotNull())
        .groupBy(
            F.col("event_type").alias("s_event_type"),
            F.col("dow").alias("s_dow"),
        )
        .agg(
            F.floor(
                F.avg(F.col("n") * 1000000 - F.col("trend_ppm"))
            )
            .cast("bigint")
            .alias("seasonal_ppm")
        )
    )
    return tr.join(
        seas,
        (F.col("event_type") == F.col("s_event_type"))
        & (F.col("dow") == F.col("s_dow")),
        "left",
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "trend_ppm",
        "seasonal_ppm",
        F.when(
            F.col("trend_ppm").isNotNull(),
            F.col("n") * 1000000 - F.col("trend_ppm") - F.col("seasonal_ppm"),
        ).alias("resid_ppm"),
    )


_SA_K = 3  # flag when |resid - median(resid)| > K * MAD(resid)


def _seasonal_anomaly_oracle() -> str:
    from bangdatapipeline_spark.registry import REGISTRY

    base = REGISTRY["ts_seasonal_decompose"].oracle
    return f"""
WITH dec AS ({base}),
r AS (SELECT event_type, day, n, resid_ppm FROM dec WHERE resid_ppm IS NOT NULL),
m AS (
  SELECT event_type, list_sort(list(resid_ppm)) AS arr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM r GROUP BY event_type
),
m2 AS (
  SELECT event_type, cnt,
         arr[(cnt + 1) // 2] + arr[cnt // 2 + 1] AS med2
  FROM m
),
d AS (
  SELECT r.event_type, r.day, r.n, r.resid_ppm, m2.med2,
         abs(r.resid_ppm * 2 - m2.med2) AS dev2
  FROM r JOIN m2 USING (event_type)
),
dm AS (
  SELECT event_type, list_sort(list(dev2)) AS devarr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM d GROUP BY event_type
),
mad AS (
  SELECT event_type,
         devarr[(cnt + 1) // 2] + devarr[cnt // 2 + 1] AS mad4
  FROM dm
)
SELECT d.event_type, d.day, d.n, d.resid_ppm,
       CAST(d.med2 AS BIGINT) AS med2,
       CAST(mad.mad4 AS BIGINT) AS mad4,
       abs(d.resid_ppm * 4 - d.med2 * 2) > {_SA_K} * mad.mad4
         AS is_seasonal_anomaly
FROM d JOIN mad USING (event_type)
"""


@register("ts_seasonal_anomaly", oracle=_seasonal_anomaly_oracle())
def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly flags: median/MAD gate on the RESIDUALS of
    ts_seasonal_decompose — "is THIS Monday low, given that Mondays are
    low?". Complements dq_volume_anomaly (trailing-window raw counts):
    deseasonalizing first means a normal weekend dip never eats the MAD
    budget, so genuinely anomalous days flag at the same K.

    Exactness: residuals are already int64 ppm; medians use the doubled
    lattice exactly as the volume monitor (med2 = lo+hi of the sorted
    values, deviations x2, MAD x4, flag compares |r*4 - med2*2| with
    K*mad4) — pure integer arithmetic both engines, no float medians.

    Scale: composes the REGISTERED decompose (its daily rollup is the
    only volume-bearing shuffle); the median/MAD passes aggregate the
    |feeds| x |days| state table into |feeds|-row arrays (bounded by the
    day span, ~30 here) and broadcast-join back — the monitor costs the
    same at 100 TB once the daily rollup exists.
    """
    base = ts_seasonal_decompose(spark, sf_dir)
    r = base.where(F.col("resid_ppm").isNotNull()).select(
        "event_type", "day", "n", "resid_ppm"
    )

    def _med2(arr_col, cnt_col):
        lo = F.element_at(arr_col, F.floor((cnt_col + 1) / 2).cast("int"))
        hi = F.element_at(arr_col, (F.floor(cnt_col / 2) + 1).cast("int"))
        return lo + hi

    m = r.groupBy(F.col("event_type").alias("m_event_type")).agg(
        F.sort_array(F.collect_list("resid_ppm")).alias("arr"),
        F.count(F.lit(1)).alias("cnt"),
    )
    m2 = m.select(
        "m_event_type", _med2(F.col("arr"), F.col("cnt")).alias("med2")
    )
    d = r.join(
        F.broadcast(m2), F.col("event_type") == F.col("m_event_type")
    ).select(
        "event_type",
        "day",
        "n",
        "resid_ppm",
        "med2",
        F.abs(F.col("resid_ppm") * 2 - F.col("med2")).alias("dev2"),
    )
    mad = (
        d.groupBy(F.col("event_type").alias("d_event_type"))
        .agg(
            F.sort_array(F.collect_list("dev2")).alias("devarr"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "d_event_type", _med2(F.col("devarr"), F.col("cnt")).alias("mad4")
        )
    )
    return d.join(
        F.broadcast(mad), F.col("event_type") == F.col("d_event_type")
    ).select(
        "event_type",
        "day",
        "n",
        "resid_ppm",
        F.col("med2").cast("bigint").alias("med2"),
        F.col("mad4").cast("bigint").alias("mad4"),
        (
            F.abs(F.col("resid_ppm") * 4 - F.col("med2") * 2)
            > _SA_K * F.col("mad4")
        ).alias("is_seasonal_anomaly"),
    )


@register(
    "ts_ship_delay_cdf",
    oracle="""
WITH d AS (
  SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
         datediff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
c AS (
  SELECT month, delay_days, CAST(count(*) AS BIGINT) AS cnt
  FROM d GROUP BY month, delay_days
),
cdf AS (
  SELECT month, delay_days, cnt,
         sum(cnt) OVER (PARTITION BY month ORDER BY delay_days
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY month) AS n
  FROM c
)
SELECT month,
       CAST(max(n) AS BIGINT) AS n_lines,
       CAST(min(CASE WHEN cum * 100 >= 50 * n THEN delay_days END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN cum * 100 >= 90 * n THEN delay_days END) AS BIGINT) AS p90_days,
       CAST(min(CASE WHEN cum * 100 >= 99 * n THEN delay_days END) AS BIGINT) AS p99_days
FROM cdf GROUP BY month
""",
)
def ts_ship_delay_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per order month (p50/p90/p99 of
    days between o_orderdate and l_shipdate) — the logistics SLA report,
    computed EXACTLY via a count-CDF over the bounded delay domain: per
    (month, delay) counts, a cumulative window over <= ~130 distinct
    delays per month, and the discrete quantile picked as the smallest
    delay whose cumulative share reaches q (the pick rule is spelled
    identically in both engines — no reliance on either engine's
    quantile_disc position convention).

    Third exact-quantile pattern in the registry, for a different data
    shape: agg_median_exact / agg_quantiles_exact bisect an UNBOUNDED
    value domain (histogram pass + targeted re-scan); this one exploits
    a naturally SMALL integer domain (days, buckets, grades), where one
    counting aggregate IS the full distribution and percentiles are a
    projection over it. At 100 TB: the join shuffles on orderkey (or
    disappears under orderkey bucketing — layout_bucketed_join), the
    count collapses to |months| x |delays| rows, and the window runs on
    that tiny table; no re-scan, no sort of raw rows, any percentile of
    a bounded-domain metric is O(domain) after one pass.
    """
    # r12: the broadcast probe + month formatting + (month, delay) partial
    # agg all fuse into the single-task lineitem scan stage — spread the
    # 2-column projection first so they run on every core (tables.spread)
    li = spread(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate"),
        "l_orderkey",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    c = d.groupBy("month", "delay_days").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("month")
        .orderBy("delay_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("month")
    cdf = c.select(
        "month",
        "delay_days",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def pick(q: int):
        return F.min(
            F.when(
                F.col("cum") * 100 >= q * F.col("n"), F.col("delay_days")
            )
        ).cast("bigint")

    return cdf.groupBy("month").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        pick(50).alias("p50_days"),
        pick(90).alias("p90_days"),
        pick(99).alias("p99_days"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)
# ---------------------------------------------------------------------------

@register(
    "ts_twap",
    oracle=f"""
WITH seg AS (
  SELECT event_type,
         {_CENTS_SQL} AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT)   AS n_segments,
       CAST(sum(gap_us) AS BIGINT) AS span_us,
       CAST(sum(cents * gap_us) // sum(gap_us) AS BIGINT) AS twap_cents
FROM seg WHERE gap_us IS NOT NULL
GROUP BY event_type
""",
    tags=("stream_twin", "stream_test:test_twap_stream_equals_batch"),
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) per event type: treat each
    event's value as holding until the NEXT event of the same type, and
    average weighted by holding time — the metric that makes irregular
    samples comparable (a plain AVG over-weights bursts; TWAP weights by
    how long each observation was "in force"). The last observation per
    type has no successor and contributes no segment, the standard
    half-open convention.

    Exact integer lattice end to end: holding times are microsecond
    differences of epoch integers, values are cents, and the weighted
    mean is one int64 division — sum(cents x gap_us) stays under 2^63
    up to ~2 x 10^5 type-years of span at these magnitudes; coarsen the
    weight lattice to milliseconds (divide gaps by 1000 on both sides)
    for longer horizons.

    Scale shape: one window (lead) partitioned by event_type ordered by
    time, then one keyed aggregate — the same single-shuffle posture as
    ``ts_ohlc_resample``; for feeds too hot for a per-type sort, the
    two-level day-bucketed decomposition used by ``ts_max_silence``
    applies verbatim (intra-bucket leads + boundary stitching).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        _cents_spark(F.col("value")).alias("cents"),
        (F.lead(us).over(w) - us).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("gap_us").cast("bigint").alias("span_us"),
        F.expr("CAST(sum(cents * gap_us) div sum(gap_us) AS BIGINT)").alias(
            "twap_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

@register(
    "ts_theil_sen",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.d AS d1, b.d AS d2,
         CAST(floor((b.c - a.c) * 1000000.0
                    / date_diff('day', a.d, b.d) + 0.5) AS BIGINT) AS slope_u6
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
), ranked AS (
  SELECT event_type, slope_u6,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_u6, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
)
SELECT event_type,
       CAST(n_pairs AS BIGINT)  AS n_pairs,
       CAST(slope_u6 AS BIGINT) AS sen_slope_u6
FROM ranked WHERE rn = (n_pairs + 1) // 2
""",
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per feed: the MEDIAN of all pairwise
    day-over-day slopes of the daily count series — the estimator that
    shrugs off the outlier days that pull ``agg_ols_trend``'s
    least-squares line (up to ~29% contamination). Slopes live on an
    exact µ-units/day lattice (floor(Δc·1e6/Δdays + .5): one IEEE
    division of small integers, identically rounded in both engines),
    and the median is the exact lower order statistic rn = ⌈n/2⌉ with a
    (slope, d1, d2) tie-break — no interpolation, no float compare.

    Scale shape: the raw stream collapses to the bounded (feed × day)
    table FIRST (one keyed aggregate with map-side combine); the
    pairwise self-join runs on that bounded spine (30 days → 435 pairs
    per feed — an equi-join on feed with the date inequality as its
    post-filter, never a cartesian over events), and the median window
    sorts |pairs| rows per feed. At years of history the pair count
    grows quadratically in DAYS, not rows — cap it with a trailing
    window or Sen's subsampled variant when the spine outgrows ~10^4
    days.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("c").alias("c2"),
    )
    pairs = a.join(
        b, (a.event_type == b.et2) & (F.col("d1") < F.col("d2"))
    ).select(
        "event_type",
        "d1",
        "d2",
        F.floor(
            (F.col("c2") - F.col("c1"))
            * 1000000.0
            / F.datediff("d2", "d1")
            + 0.5
        )
        .cast("long")
        .alias("slope_u6"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("slope_u6", "d1", "d2")
    w_all = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope_u6",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_u6").cast("long").alias("sen_slope_u6"),
    )
