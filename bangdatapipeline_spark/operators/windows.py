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

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
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
    # NTZ-safe epoch MICROSECONDS (no session-timezone dependence, unlike
    # a cast through TIMESTAMP): integer ordering for the RANGE frame at
    # the data's full precision. Second-truncated ordering diverged from
    # the oracle's INTERVAL bound for events within 1 s of the exact
    # one-hour boundary — surfaced only at sf0.1 density (1/100k rows).
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy(us).rangeBetween(-3_600_000_000, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("val_last_hour"),
    )


# Demo-sized dimension slice shared by every SCD2 consumer.
SCD2_KEY_BOUND = 300

# The ONE SCD2 ranges spelling — scd2_ranges' full oracle, and embedded
# as the `ranges` CTE by joins.join_temporal_pit (r11: the two
# hand-synchronized copies of this window collapsed; a tie-break or
# half-open-convention change now edits exactly one string).
_SCD2_ORACLE = f"""
SELECT o_custkey AS custkey,
       CAST(row_number() OVER w AS INT) AS version,
       o_orderkey AS orderkey,
       round(o_totalprice, 2) AS totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WHERE o_custkey < {SCD2_KEY_BOUND}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def scd2_history(o: DataFrame) -> DataFrame:
    """The ONE SCD2 ranges kernel: a pre-filtered orders slice becomes
    versioned rows (custkey, version, orderkey, totalprice, valid_from,
    valid_to, is_current) with [valid_from, valid_to) half-open
    effectivity and a deterministic o_orderkey tie-break for same-day
    changes. SQL twin: ``_SCD2_ORACLE``. One shuffle on the dimension
    key; row_number + lead share a single (custkey, date, key) sort.
    Consumers: ``scd2_ranges`` and joins.``join_temporal_pit``."""
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


@register("scd2_ranges", oracle=_SCD2_ORACLE)
def scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: each customer's
    ordered change records become versioned rows with [valid_from,
    valid_to) effectivity ranges and an is_current flag — the standard
    warehouse pattern for temporal dimensions, as one window pass
    (see :func:`scd2_history`, the shared kernel). At 100 TB this is
    one shuffle on the dimension key; each entity's history is a
    partition-local sorted run.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < SCD2_KEY_BOUND
    )
    return scd2_history(o)


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY 1
),
mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
feat AS (
  SELECT b.custkey, b.n_orders, b.monetary, b.last_order,
         CAST(date_diff('day', b.last_order, mx.maxd) AS BIGINT) AS recency_days
  FROM base b, mx
),
scored AS (
  SELECT *,
    CAST(ntile(5) OVER (ORDER BY last_order ASC, custkey ASC) AS INT) AS r_score,
    CAST(ntile(5) OVER (ORDER BY n_orders ASC, custkey ASC) AS INT) AS f_score,
    CAST(ntile(5) OVER (ORDER BY monetary ASC, custkey ASC) AS INT) AS m_score
  FROM feat
)
SELECT custkey, recency_days, n_orders, monetary, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 THEN 'recent'
            WHEN f_score >= 4 THEN 'loyal'
            ELSE 'other' END AS segment
FROM scored
"""


@register("win_rfm_segments", oracle=_RFM_ORACLE)
def win_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order at
    corpus max date), frequency, monetary total; quintile scores via
    ntile with a custkey tie-break (ntile over ties is otherwise
    nondeterministic) and a rule-based segment label.

    Scale note: the three ntiles are GLOBAL windows over the per-customer
    aggregate — fine while |customers| fits one partition's sort (memory
    ~ rows x 40B). At 100 TB-with-100M-customers the quintile cuts come
    from approx_percentile (broadcast five cut points, score by CASE)
    — same output contract, no global sort; the per-customer aggregate
    (the expensive part) is identical either way.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    feat = base.crossJoin(F.broadcast(mx)).withColumn(
        "recency_days", F.datediff("maxd", "last_order").cast("bigint")
    )
    wr = Window.orderBy(F.col("last_order").asc(), F.col("custkey").asc())
    wf = Window.orderBy(F.col("n_orders").asc(), F.col("custkey").asc())
    wm = Window.orderBy(F.col("monetary").asc(), F.col("custkey").asc())
    scored = (
        feat.withColumn("r_score", F.ntile(5).over(wr).cast("int"))
        .withColumn("f_score", F.ntile(5).over(wf).cast("int"))
        .withColumn("m_score", F.ntile(5).over(wm).cast("int"))
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal")
        .otherwise("other")
    )
    return scored.select(
        "custkey", "recency_days", "n_orders", "monetary",
        "r_score", "f_score", "m_score", seg.alias("segment"),
    )


# --------------------------------------------------------------------------
# ABC / Pareto classification by cumulative revenue share
# --------------------------------------------------------------------------

_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, partkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
  FROM rev
),
tot AS (SELECT *, max(cum_rev) OVER () AS total_rev FROM ranked)
SELECT partkey, revenue,
       round(cum_rev / total_rev, 6) AS cum_share,
       CASE WHEN cum_rev / total_rev <= 0.5 THEN 'A'
            WHEN cum_rev / total_rev <= 0.8 THEN 'B'
            ELSE 'C' END AS abc
FROM tot
"""


@register("win_abc_pareto", oracle=_ABC_ORACLE)
def win_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts ranked by revenue, running
    cumulative share, A = first 50% of revenue, B = to 80%, C = tail —
    the inventory-analysis classic.

    Determinism: the running sum uses an ORDERED ROWS frame (sequential
    accumulation, bit-identical across engines given the same total
    order), and the grand total is taken as max(cum_rev) OVER () — the
    last value of that same deterministic running sum — instead of an
    unordered sum(revenue) OVER (), whose float accumulation order is
    engine-dependent. Scale note: one shuffle for the per-part agg; the
    global ordered window is |parts|-sized (dimension scale); with a
    fact-sized key, replace with range-partitioned prefix sums
    (two-pass: per-partition totals broadcast, then local cumsum).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # revenue is rounded on its DECIMAL LATTICE (price x discount
    # products have exactly 4 decimals): round(, 2) would sit exactly on
    # half-cent boundaries where engine ulp differences flip the cent —
    # the round-half hazard documented in docs/dialect_notes.md. At 4dp
    # the computed sums (+-1e-9 of the lattice point) always snap to the
    # same value in both engines.
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    wo = (
        Window.orderBy(F.col("revenue").desc(), F.col("partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.withColumn("cum_rev", F.sum("revenue").over(wo))
    tot = ranked.withColumn(
        "total_rev",
        F.max("cum_rev").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    share = F.col("cum_rev") / F.col("total_rev")
    return tot.select(
        "partkey",
        "revenue",
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias("abc"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection (per-user activity drift)
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2
),
m AS (SELECT user_id, avg(cnt) AS mu FROM daily GROUP BY 1),
c AS (
  SELECT d.user_id, d.day,
         sum(d.cnt - m.mu) OVER (PARTITION BY d.user_id ORDER BY d.day
                                 ROWS UNBOUNDED PRECEDING) AS cusum
  FROM daily d JOIN m USING (user_id)
),
r AS (
  SELECT *, round(abs(cusum), 6) AS mag,
         count(*) OVER (PARTITION BY user_id) AS n_days
  FROM c
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY mag DESC, day ASC) AS rn
  FROM r
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       round(mag, 4) AS max_cusum,
       strftime(day, '%Y-%m-%d') AS changepoint_day
FROM rk WHERE rn = 1
"""


@register("win_cusum_changepoint", oracle=_CUSUM_ORACLE)
def win_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per user: cumulative sum of daily
    activity deviations from the user's mean; the day of maximum |CUSUM|
    is the most-likely level-shift point (classic offline CUSUM argmax).

    Determinism care: the per-user mean is an unordered float avg (ulp
    differs across engines), so the ranking magnitude is ROUNDED to 6 dp
    BEFORE the argmax ordering — near-tied |CUSUM| days would otherwise
    rank by engine noise; ties after rounding break by earliest day.
    One user_id shuffle shared by the daily agg, the mean, the ordered
    cumsum window, and the argmax window — state per user is its day
    count.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("cnt"))
    m = daily.groupBy("user_id").agg(F.avg("cnt").alias("mu"))
    wc = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.join(m, "user_id").withColumn(
        "cusum", F.sum(F.col("cnt") - F.col("mu")).over(wc)
    )
    r = c.withColumn("mag", F.round(F.abs("cusum"), 6)).withColumn(
        "n_days", F.count("*").over(Window.partitionBy("user_id"))
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("mag").desc(), F.col("day").asc())
    return (
        r.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.round("mag", 4).alias("max_cusum"),
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
        )
    )


# --------------------------------------------------------------------------
# Trailing-window EWMA (time-series smoothing primitive)
# --------------------------------------------------------------------------

_EWMA_DECAY = 0.75  # 1 - alpha; 3/4 so every pow(0.75, d<=7) is an EXACT double
_EWMA_SPAN = 8  # trailing events in the normalized window


_EWMA_ORACLE = f"""
WITH arr AS (
  SELECT user_id,
         list(struct_pack(ts := ts, event_id := event_id, value := value)
              ORDER BY ts, event_id) AS a
  FROM events GROUP BY user_id
),
x AS (
  SELECT user_id,
         unnest(list_transform(generate_series(1, len(a)), i -> struct_pack(
            ts := a[i].ts, event_id := a[i].event_id, value := a[i].value,
            ewma := round(
              list_reduce(list_transform(generate_series(0, least(i - 1, {_EWMA_SPAN - 1})),
                          d -> a[i - d].value * pow({_EWMA_DECAY}, d)), (x, y) -> x + y)
              / list_reduce(list_transform(generate_series(0, least(i - 1, {_EWMA_SPAN - 1})),
                          d -> pow({_EWMA_DECAY}, d)), (x, y) -> x + y), 6)
         ))) AS s
  FROM arr
)
SELECT user_id, s.ts AS ts, s.event_id AS event_id, s.value AS value, s.ewma AS ewma
FROM x
"""


@register("win_ewma", oracle=_EWMA_ORACLE)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized trailing-window EWMA of event values per user (span
    ``_EWMA_SPAN``, decay ``_EWMA_DECAY``): ewma_i = Σ_d v_(i-d)·decay^d /
    Σ_d decay^d over the last ``_EWMA_SPAN`` events — pandas
    ``ewm(adjust=True)`` over a bounded window, the smoothing primitive
    for metric dashboards and anomaly baselines.

    Plain window frames cannot weight BY DISTANCE inside the frame, so
    the per-user history collects into ONE sorted array (deterministic
    total order (ts, event_id) — the text_bigrams in-row pattern) and a
    nested higher-order fold computes each position's weighted sum
    in-row; positions re-explode to rows. One user-keyed shuffle total.
    Decay 3/4 makes every pow(decay, d<=7) an exactly-representable
    double, so both engines' folds are bit-identical before the round.

    Scale: state per user is its event history (bounded per key like the
    sessionize ops); for monster keys switch to the two-pass recurrence
    (running numerator/denominator via exponent renormalization) — same
    output contract.
    """
    ev = load_table(spark, sf_dir, "events")
    arr = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("a")
    )

    def ewma_at(i):
        span = F.sequence(F.lit(0), F.least(i - 1, F.lit(_EWMA_SPAN - 1)))
        num = F.aggregate(
            span,
            F.lit(0.0),
            lambda acc, d: acc
            + F.element_at(F.col("a"), (i - d).cast("int"))["value"]
            * F.pow(F.lit(_EWMA_DECAY), d),
        )
        den = F.aggregate(
            span, F.lit(0.0), lambda acc, d: acc + F.pow(F.lit(_EWMA_DECAY), d)
        )
        return F.round(num / den, 6)

    rows = arr.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("a")),
                lambda i: F.struct(
                    F.element_at(F.col("a"), i.cast("int"))["ts"].alias("ts"),
                    F.element_at(F.col("a"), i.cast("int"))["event_id"].alias("event_id"),
                    F.element_at(F.col("a"), i.cast("int"))["value"].alias("value"),
                    ewma_at(i).alias("ewma"),
                ),
            )
        ).alias("s"),
    )
    return rows.select(
        "user_id",
        F.col("s.ts").alias("ts"),
        F.col("s.event_id").alias("event_id"),
        F.col("s.value").alias("value"),
        F.col("s.ewma").alias("ewma"),
    )


# --------------------------------------------------------------------------
# Statistical aggregates over window frames (rolling corr / mean / stddev)
# --------------------------------------------------------------------------

_ROLL_FRAME = 19  # trailing frame: current row + 19 preceding


@register(
    "win_rolling_stats",
    oracle=f"""
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v_prev
  FROM events
)
SELECT user_id, event_id,
       round(avg(value) OVER w, 6) AS roll_mean,
       round(stddev_samp(value) OVER w, 4) AS roll_sd,
       round(corr(value, v_prev) OVER w, 4) + 0 AS roll_corr
FROM lagged
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_ROLL_FRAME} PRECEDING AND CURRENT ROW)
""",
)
def win_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates over an explicit trailing ROWS frame:
    rolling mean, sample stddev, and lag-1 autocorrelation of event
    values per user (pandas ``rolling().corr()`` vocabulary) — the
    frame-window capability beyond plain running sums: multi-input
    aggregates (corr) and variance-family aggregates evaluated per
    frame.

    Determinism: the frame's membership is totally ordered by
    (ts, event_id); corr of a zero-variance frame is NaN in Spark but
    NULL in DuckDB, so the Spark side maps NaN -> NULL explicitly. The
    mean rounds at 6 dp, ON the value lattice (2-dp values / frame of
    20 => means are multiples of 5e-4, exactly the half-boundary of a
    4-dp round — the docs/dialect_notes.md aggregate-sum hazard);
    sd/corr are irrational-valued and safe at 4 dp; the corr adds
    + 0 after rounding so an IEEE negative zero (round(-1e-6, 4)) prints
    identically on both engines.
    Plan/scale: ONE user-keyed shuffle serves the lag and both frame
    windows (same partitioning + ordering); state per row is the
    (``_ROLL_FRAME`` + 1)-row frame — Spark evaluates bounded ROWS frames
    incrementally, never materializing per-row copies.
    """
    ev = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = w_lag.rowsBetween(-_ROLL_FRAME, Window.currentRow)

    def nan_null(c):
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)

    # r13 (VERDICT r12 task 6): the three frame aggregates (avg, stddev,
    # corr) each maintained a multi-accumulator state re-evaluated over
    # the 20-row frame per row (~11 double accumulator updates per frame
    # element). Values live on the 2-dp cents lattice, so the same frame
    # pass can instead maintain plain BIGINT sliding sums — exact
    # integers, one add each — and the three statistics derive per-row
    # from the closed-form moment identities. Measured: the frame-sum
    # pass alone 0.80 -> 0.42 s (same window, noop). Output equivalence:
    # the integer numerators are EXACT, so each derived double is the
    # correctly-rounded value of the same rational the old float
    # accumulators approximated — means land on their 5e-4 grid (6-dp
    # round is grid-exact), sd/corr are irrational with 4-dp boundary
    # distances >> 1e-12 (docs/dialect_notes.md), and the degenerate
    # frames (n=1, zero variance, no lag pairs) produce NaN through the
    # same 0/0 path nan_null already maps to NULL. Oracle hash-verified
    # at sf0.001/0.01/0.1.
    vc = F.round(F.col("value") * 100, 0).cast("bigint")
    base = ev.select("user_id", "event_id", "ts", vc.alias("vc"))
    lagged = base.withColumn("pc", F.lag("vc").over(w_lag))
    in_pair = F.col("pc").isNotNull()
    sums = lagged.select(
        "user_id",
        "event_id",
        F.count("vc").over(w).alias("n"),
        F.sum("vc").over(w).alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("s2"),
        # pairwise-deletion moments for corr: only rows with a lag pair
        F.count("pc").over(w).alias("n2"),
        F.sum("pc").over(w).alias("sp"),
        F.sum(F.col("pc") * F.col("pc")).over(w).alias("spp"),
        F.sum(F.col("vc") * F.col("pc")).over(w).alias("svp"),
        F.sum(F.when(in_pair, F.col("vc"))).over(w).alias("s1p"),
        F.sum(F.when(in_pair, F.col("vc") * F.col("vc"))).over(w).alias("s2p"),
    )
    # try_divide, not `/`: under ANSI (the vanilla-session default) a
    # zero divisor throws; try_divide yields NULL, which is exactly the
    # published value for the degenerate frames (n=1 -> sd NULL, no/
    # constant lag pairs -> corr NULL — the same rows the old NaN ->
    # NULL mapping nulled).
    mean = F.col("s1").cast("double") / (F.lit(100.0) * F.col("n"))
    var_num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    sd = F.sqrt(
        F.try_divide(var_num, F.col("n") * (F.col("n") - 1) * F.lit(10000.0))
    )
    corr_num = (F.col("n2") * F.col("svp") - F.col("sp") * F.col("s1p")).cast(
        "double"
    )
    corr_den = F.sqrt(
        (F.col("n2") * F.col("spp") - F.col("sp") * F.col("sp")).cast("double")
    ) * F.sqrt(
        (F.col("n2") * F.col("s2p") - F.col("s1p") * F.col("s1p")).cast("double")
    )
    return sums.select(
        "user_id",
        "event_id",
        F.round(mean, 6).alias("roll_mean"),
        F.round(nan_null(sd), 4).alias("roll_sd"),
        (F.round(nan_null(F.try_divide(corr_num, corr_den)), 4) + F.lit(0.0)).alias(
            "roll_corr"
        ),
    )


@register(
    "win_distribution",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       round(c_acctbal, 2) AS bal,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000 AS cume,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist /
    ntile(4) per market segment, the remaining rank-family trio.

    The window orders by the UNIQUE (acctbal, custkey) composite: with
    a tie-broken total order all three functions are deterministic
    (ntile bucket boundaries depend on row order, not just key order).
    One shuffle on c_mktsegment serves all three. percent_rank is
    (rank-1)/(n-1) — a small-denominator rational — so both engines
    IEEE-floor-round it to the shared 6-dp lattice
    (docs/dialect_notes.md).
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("bal"),
        (F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


_MED_FRAME = 9  # trailing frame: current row + 9 preceding


@register(
    "win_rolling_median",
    oracle=f"""
SELECT event_id, user_id,
       round(quantile_cont(value, 0.25) OVER w, 4) AS roll_p25,
       round(quantile_cont(value, 0.50) OVER w, 4) AS roll_med,
       round(quantile_cont(value, 0.75) OVER w, 4) AS roll_p75
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_MED_FRAME} PRECEDING AND CURRENT ROW)
""",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact quartiles (p25/median/p75) over a trailing
    (``_MED_FRAME`` + 1)-row frame per user — the robust-statistics
    companion to ``win_rolling_stats``' mean/stddev (medians shrug off
    the outliers that wreck a rolling mean).

    ``percentile`` runs as a true window aggregate over the bounded ROWS
    frame — one user-keyed shuffle + sort serves all three quartiles; no
    self-join, no explode. Interpolated quartiles of 2-dp values land on
    the 0.0025 lattice (f is always a multiple of 0.25), which is a
    subset of the 1e-4 rounding grid — round(4) can never sit at a
    rounding half, so it is hash-safe (contrast the interpolation note
    in docs/dialect_notes.md).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-_MED_FRAME, Window.currentRow)
    )
    # r12: ONE array-percentile window aggregate instead of three scalar
    # ones — each percentile aggregate maintains (and sorts) its own copy
    # of the frame buffer per row, so the three-call form paid the frame
    # sort three times. percentile(value, array(...)) shares one buffer
    # and one sort; element values are identical (same aggregate, same
    # interpolation — A/B verified exact-equal before shipping).
    pcts = F.percentile("value", F.expr("array(0.25D, 0.5D, 0.75D)")).over(w)
    return ev.select("event_id", "user_id", pcts.alias("p")).select(
        "event_id",
        "user_id",
        F.round(F.col("p")[0], 4).alias("roll_p25"),
        F.round(F.col("p")[1], 4).alias("roll_med"),
        F.round(F.col("p")[2], 4).alias("roll_p75"),
    )


@register(
    "win_gap_islands",
    oracle="""
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_all,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_type
  FROM events
)
SELECT user_id, event_type,
       min(ts)                    AS start_ts,
       max(ts)                    AS end_ts,
       CAST(count(*) AS BIGINT)   AS n_events,
       CAST(min(event_id) AS BIGINT) AS first_event_id
FROM r
GROUP BY user_id, event_type, rn_all - rn_type
""",
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    user (the classic streak/run-length primitive — login streaks, error
    bursts, state episodes).

    The two row_numbers share one user-keyed sort (the second partitions
    by a superset key with the same ordering), and their difference is
    constant exactly within a run — one grouped aggregate on the derived
    island key finishes it. No self-join, no recursive CTE; at any scale
    this is one shuffle + one sort per user partition.
    """
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    rn_all = F.row_number().over(Window.partitionBy("user_id").orderBy(*order))
    rn_type = F.row_number().over(
        Window.partitionBy("user_id", "event_type").orderBy(*order)
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            (rn_all - rn_type).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event_id"),
        )
        .drop("grp")
    )


# ---------------------------------------------------------------------------
# Maximum drawdown
# ---------------------------------------------------------------------------

@register(
    "win_drawdown",
    tags=("stream_twin", "stream_test:test_drawdown_stream_equals_batch"),
    oracle=f"""
WITH s AS (
  SELECT user_id, ts, event_id,
         {cents_sql("value")} AS cents
  FROM events WHERE event_type = 'purchase'
),
c1 AS (
  SELECT user_id, ts, event_id, cents,
         sum(cents) OVER w AS cum
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT user_id, ts, event_id, cents, cum,
         max(cum) OVER w AS peak
  FROM c1
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(count(*) AS BIGINT)          AS n_events,
       CAST(max(peak) AS BIGINT)         AS peak_cents,
       CAST(max(peak - cum) AS BIGINT)   AS max_drawdown_cents,
       CAST(sum(cents) AS BIGINT)        AS final_cents
FROM c GROUP BY user_id
""",
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the cumulative purchase-value
    curve — the classic risk window: largest peak-to-trough drop of the
    running total, plus the peak and final levels. The same shape
    monitors any cumulative KPI (balance, inventory, quota burn-down).

    Values move on the integer cents lattice BEFORE the running sum, so
    the cumulative curve is exact BIGINT arithmetic — no float fold
    order to diverge. Two stacked running windows share ONE sort:
    cum = running sum, peak = running max of cum, drawdown = peak - cum;
    the final per-user reduction is an ordinary groupBy (the closing
    level is just the exact total, no ordered pick needed). At 100 TB this is one
    shuffle on user_id and a single partition-local sorted pass per
    user — no self-join, no second sort (the oracle's nested
    window-over-window states the same single-sort plan).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        cents_col(F.col("value")).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = s.select(
        "user_id",
        "ts",
        "event_id",
        "cents",
        F.sum("cents").over(w).alias("cum"),
    ).withColumn("peak", F.max("cum").over(w))
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("peak").alias("peak_cents"),
        F.max(F.col("peak") - F.col("cum")).alias("max_drawdown_cents"),
        F.sum("cents").alias("final_cents"),
    )


# --------------------------------------------------------------------------
# Session bounce rate (sessionize -> daily rollup)
# --------------------------------------------------------------------------


def _bounce_oracle() -> str:
    from bangdatapipeline_spark.operators.streaming_batch import (
        sessionize_cte,
    )

    return f"""
{sessionize_cte("user_id, ts, event_id")}, s AS (
    SELECT user_id, sess_id, min(ts) AS sess_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY 1, 2
)
SELECT strftime(CAST(sess_start AS DATE), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
             + count(*) // 2) // count(*) AS BIGINT) AS bounce_ppm
FROM s GROUP BY 1
"""


@register("win_session_bounces", oracle=_bounce_oracle())
def win_session_bounces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — the fraction of sessions that contain exactly
    ONE event, keyed by the session's start day: the engagement metric
    every product dashboard pairs with sessionization. Composes the
    ``stream_session`` kernel (lag-gap-flag-cumsum, 30-minute gap; one
    shuffle on user_id) with a per-session collapse and a bounded
    day-keyed rollup on the integer ppm lattice.

    Scale shape: the sessionize window and the per-(user, sess_id)
    collapse share the SAME user_id partitioning (no extra exchange);
    the day rollup shuffles |sessions| pre-combined rows into |days|
    keys. Nothing after the first window carries event granularity — the
    daily table a year-long 100 TB event store produces here is a few
    hundred rows.
    """
    from bangdatapipeline_spark.operators.streaming_batch import sessionize

    sess = sessionize(load_table(spark, sf_dir, "events"))
    per_session = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("sess_start"),
        F.count(F.lit(1)).alias("n_events"),
    )
    agg = per_session.groupBy(
        F.date_format("sess_start", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
    )
    return agg.select(
        "day",
        "n_sessions",
        "n_bounces",
        F.expr(
            "(n_bounces * 1000000 + n_sessions DIV 2) DIV n_sessions"
        ).alias("bounce_ppm"),
    )


@register(
    "win_nth_value",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         row_number() OVER w AS rn,
         first_value(o_orderdate) OVER w AS first_date,
         nth_value(o_orderdate, 2) OVER w AS second_date,
         last_value(o_orderdate) OVER w AS last_date,
         count(*) OVER w AS n_orders
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey,
       CAST(n_orders AS BIGINT) AS n_orders,
       strftime(first_date, '%Y-%m-%d') AS first_date,
       strftime(second_date, '%Y-%m-%d') AS second_date,
       strftime(last_date, '%Y-%m-%d') AS last_date
FROM o WHERE rn = 1
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``first_value`` / ``nth_value(2)`` / ``last_value`` over a
    FULL-partition frame — the positional window family the analytic
    suite was missing (win_analytic covers lag/lead offsets; these are
    rank-positional): per customer, the first, second, and last order
    dates plus the order count, one row per customer. The frame is
    explicitly UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING: the default
    running frame silently turns last_value into current-row (the
    classic window bug) and nth_value(2) into null until row 2 — the
    full frame is the semantics both engines agree on. second_date is
    NULL for single-order customers (nth beyond the partition), and
    the (date, orderkey) composite order makes every position
    deterministic under ties.

    One shuffle on o_custkey; emitting via rn = 1 keeps one row per
    key without a second aggregate pass. At 100 TB the full-frame
    positional read is still a single per-partition scan — Spark
    buffers only the frame's positional targets, not the partition.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wf).alias("n_orders"),
            F.date_format(F.first("o_orderdate").over(wf), "yyyy-MM-dd").alias(
                "first_date"
            ),
            F.date_format(
                F.nth_value("o_orderdate", 2).over(wf), "yyyy-MM-dd"
            ).alias("second_date"),
            F.date_format(F.last("o_orderdate").over(wf), "yyyy-MM-dd").alias(
                "last_date"
            ),
        )
        .filter(F.col("rn") == 1)
        .select("o_custkey", "n_orders", "first_date", "second_date", "last_date")
    )
