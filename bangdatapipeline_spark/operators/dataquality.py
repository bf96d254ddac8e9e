"""Data-quality audit operators: referential integrity, hot-key skew
probes, and score-calibration bins.

These complement the dq_constraints / dq_drift_psi / profile_columns
family (operators/aggregates.py, curation.py) with the three audits a
pipeline team runs before pointing a 1000-executor job at a new 100 TB
drop: are the foreign keys closed (orphans break joins silently), which
join/groupBy keys are hot (skew kills the shuffle long before capacity
does), and is a model score actually calibrated against labels.

Scale notes (100 TB):
  * ``dq_referential_integrity`` reduces every child table to its
    DISTINCT key multiset *before* the anti-join — the shuffle is keyed
    on FK cardinality, not child row count, and each per-relation result
    is a single row. Parent sides project the key column only (column
    pruning reaches the scan); small dims broadcast automatically.
  * ``dq_hot_keys`` is groupBy-count + TakeOrdered top-N — map-side
    partial aggregation absorbs the skew being measured (the hot key's
    updates combine locally), and no global window/sort appears in the
    plan: top-5 is a limit-pushdown sort, then a 5-row window to stamp
    ranks.
  * ``eval_calibration_bins`` scores rows with an exact integer dot
    product (no float fold order to diverge), takes global min/max with
    a scalar aggregate broadcast back, and bins with integer division —
    two scans, one 10-row result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

# (label, child table, fk column, parent table, pk column)
_FK_RELATIONS = [
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle_one(label: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{label}' AS relation,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT CAST(count(DISTINCT {fk})
               + CASE WHEN count(*) > count({fk}) THEN 1 ELSE 0 END AS BIGINT)
        FROM {child}) AS n_keys,
       (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT)
        FROM (SELECT {fk} AS k, count(*) AS cnt FROM {child} GROUP BY {fk}) kk
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = kk.k))
         AS n_orphan_rows,
       (SELECT count(*)
        FROM (SELECT {fk} AS k FROM {child} GROUP BY {fk}) kk
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = kk.k))
         AS n_orphan_keys
"""


@register(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(_fk_oracle_one(*rel) for rel in _FK_RELATIONS),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key closure audit over the whole schema: for each of the
    7 FK relations, total child rows, distinct FK values (NULL counts as
    one key — it never joins, so it is an orphan class of its own), and
    orphan rows/keys via LEFT ANTI against the parent's key set.

    The anti-join runs on the *distinct-key* table (groupBy fk, count
    first), so at 100 TB the shuffled side is |keys|, not |rows| — the
    same pre-reduction a bloom-prefilter join does, stated structurally.
    Every relation reduces to ONE row; the union of 7 is the report.
    """
    out: DataFrame | None = None
    for label, child_t, fk, parent_t, pk in _FK_RELATIONS:
        child = load_table(spark, sf_dir, child_t)
        parent = load_table(spark, sf_dir, parent_t)
        keys = child.groupBy(F.col(fk).alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
        orph = keys.join(
            parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti"
        )
        tot = keys.agg(
            F.sum("cnt").alias("n_child"), F.count(F.lit(1)).alias("n_keys")
        )
        orph_agg = orph.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_orphan_rows"),
            F.count(F.lit(1)).alias("n_orphan_keys"),
        )
        row = (
            tot.crossJoin(F.broadcast(orph_agg))  # two 1-row aggregates
            .select(
                F.lit(label).alias("relation"),
                "n_child",
                "n_keys",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


# (label, table, key column) for the hot-key probe
_HOT_AUDITS = [
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
]
_HOT_TOPN = 5


def _hot_oracle_one(label: str, table: str, col: str) -> str:
    return f"""
SELECT '{label}' AS col_name,
       CAST(k AS VARCHAR) AS key_str,
       cnt,
       rnk,
       (cnt * 1000000) // n_total            AS share_ppm,
       (cnt * n_keys * 1000000) // n_total   AS hot_x_ppm
FROM (
  SELECT k, cnt,
         row_number() OVER (ORDER BY cnt DESC, k) AS rnk,
         (SELECT count(*) FROM {table})           AS n_total,
         (SELECT count(*) FROM
            (SELECT {col} FROM {table} GROUP BY {col}) dk) AS n_keys
  FROM (SELECT {col} AS k, count(*) AS cnt FROM {table} GROUP BY {col}) c
) r
WHERE rnk <= {_HOT_TOPN}
"""


@register(
    "dq_hot_keys",
    oracle="\nUNION ALL\n".join(_hot_oracle_one(*a) for a in _HOT_AUDITS),
)
def dq_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew probe: for each audited join/groupBy column, the
    top-5 heaviest keys with their absolute count, parts-per-million
    share of the table, and "hotness" = count / uniform-expectation in
    ppm (1,000,000 = exactly uniform). A key at 50x uniform is the one
    you salt before it strands an executor.

    Plan shape: groupBy-count (map-side combine absorbs the very skew
    being measured), TakeOrdered(5) by (count desc, key) — no global
    window over the full key set — then a 5-row window stamps ranks and
    two broadcast scalar aggregates supply the denominators.
    """
    out: DataFrame | None = None
    for label, table_t, col in _HOT_AUDITS:
        t = load_table(spark, sf_dir, table_t)
        counts = t.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
        denom = counts.agg(
            F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("n_keys")
        )
        top = counts.orderBy(F.col("cnt").desc(), F.col("k")).limit(_HOT_TOPN)
        w = Window.orderBy(F.col("cnt").desc(), F.col("k"))
        row = (
            top.crossJoin(F.broadcast(denom))  # 5 rows x 1-row aggregate
            .withColumn("rnk", F.row_number().over(w))
            .select(
                F.lit(label).alias("col_name"),
                F.col("k").cast("string").alias("key_str"),
                "cnt",
                "rnk",
                F.expr("cnt * 1000000 div n_total").alias("share_ppm"),
                F.expr("cnt * n_keys * 1000000 div n_total").alias("hot_x_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


_CAL_DIMS = 64
_CAL_SCALE = 1_000_000
_CAL_BINS = 10
# deterministic integer probe weights: wt(d) = (d * Knuth) mod 1000 - 500
_CAL_WTS = [(d * 2654435761) % 1000 - 500 for d in range(_CAL_DIMS)]


@register(
    "eval_calibration_bins",
    oracle=f"""
WITH w AS (
  SELECT d, (d * 2654435761) % 1000 - 500 AS wt
  FROM range({_CAL_DIMS}) t(d)
),
s AS (
  SELECT e.vec_id,
         e.label,
         CAST(sum(CAST(round(CAST(e.embedding[w.d + 1] AS DOUBLE)
                             * {_CAL_SCALE}) AS BIGINT) * w.wt) AS BIGINT)
           AS score
  FROM embeddings e CROSS JOIN w
  GROUP BY e.vec_id, e.label
),
mm AS (SELECT min(score) AS mn, max(score) AS mx FROM s),
b AS (
  SELECT ((s.score - mm.mn) * {_CAL_BINS}) // (mm.mx - mm.mn + 1) AS bin,
         s.score,
         CASE WHEN s.label <= 4 THEN 1 ELSE 0 END AS pos
  FROM s CROSS JOIN mm
)
SELECT bin,
       count(*)                                    AS n,
       CAST(sum(pos) AS BIGINT)                    AS n_pos,
       (CAST(sum(pos) AS BIGINT) * 1000000) // count(*) AS pos_ppm,
       CAST(sum(score) AS BIGINT) // count(*)      AS mean_score_int
FROM b
GROUP BY bin
""",
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration audit: score every embedding with a fixed
    deterministic linear probe (integer dot product on the 1e-6
    quantization lattice — exact, fold-order-free), split the observed
    score range into 10 equal-width bins with integer arithmetic, and
    report per-bin count, positive-label count and rate (ppm), and mean
    score. A calibrated scorer shows pos_ppm increasing with bin; this
    fixed probe is the harness, swappable for any learned linear head.

    Two scans total: one to score + min/max (scalar aggregate broadcast
    back), one to bin + aggregate to 10 rows. The dot product unrolls as
    a fixed 64-term integer expression — stays in whole-stage codegen,
    no explode shuffle, no Python.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = [
        F.round(F.col("embedding").getItem(d).cast("double") * _CAL_SCALE)
        .cast("long")
        .alias(f"q{d}")
        for d in range(_CAL_DIMS)
    ]
    terms = [F.col(f"q{d}") * F.lit(_CAL_WTS[d]) for d in range(_CAL_DIMS)]
    score = sum(terms[1:], terms[0]).alias("score")
    s = e.select("vec_id", "label", *q).select("vec_id", "label", score)
    mm = s.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    binned = s.crossJoin(F.broadcast(mm)).select(
        F.expr(f"(score - mn) * {_CAL_BINS} div (mx - mn + 1)").alias("bin"),
        "score",
        F.when(F.col("label") <= 4, 1).otherwise(0).alias("pos"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.expr("sum(pos) * 1000000 div count(1)").cast("long").alias("pos_ppm"),
        F.expr("sum(score) div count(1)").cast("long").alias("mean_score_int"),
    )


_FRESH_STALE_MIN = 120  # a feed lagging > 2h behind the freshest is stale


@register(
    "dq_freshness",
    tags=("stream_twin", "stream_test:test_freshness_stream_equals_batch"),
    oracle=f"""
WITH g AS (SELECT max(ts) AS global_max FROM events),
per AS (
  SELECT event_type,
         count(*)  AS n_events,
         max(ts)   AS last_ts
  FROM events GROUP BY event_type
)
SELECT p.event_type,
       CAST(p.n_events AS BIGINT) AS n_events,
       p.last_ts,
       CAST(date_diff('microsecond', p.last_ts, g.global_max)
            // 60000000 AS BIGINT) AS lag_minutes,
       date_diff('microsecond', p.last_ts, g.global_max)
         // 60000000 > {_FRESH_STALE_MIN} AS is_stale
FROM per p CROSS JOIN g
""",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness audit: per event_type, the event count, last-seen
    timestamp, and ingestion lag in whole minutes behind the freshest
    feed, with a staleness flag — the first dashboard an on-call checks
    when a 100 TB daily drop looks thin.

    One hash aggregation keyed on event_type plus a 1-row global-max
    scalar crossJoined back (broadcast); lag is exact integer
    microsecond arithmetic floor-divided to minutes, so the flag cannot
    flip between engines.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts")
    )
    g = ev.agg(F.max("ts").alias("global_max"))
    lag_us = F.expr("timestampdiff(MICROSECOND, last_ts, global_max)")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "last_ts",
        (lag_us / 60_000_000).cast("long").alias("lag_minutes"),
        ((lag_us / 60_000_000).cast("long") > _FRESH_STALE_MIN).alias("is_stale"),
    )


_VOL_TRAIL = 7  # trailing window (days) for the robust baseline
_VOL_K = 3  # flag when |n - median| > K * MAD


@register(
    "dq_volume_anomaly",
    tags=("stream_twin", "stream_test:test_volume_anomaly_stream_equals_batch"),
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, n,
         list_sort(list(n) OVER w) AS trail
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {{_VOL_TRAIL}} PRECEDING AND 1 PRECEDING)
),
m AS (
  SELECT event_type, day, n, trail,
         coalesce(len(trail), 0) AS n_trail,
         CASE WHEN coalesce(len(trail), 0) > 0
              THEN trail[(len(trail) + 1) // 2] + trail[len(trail) // 2 + 1]
         END AS med2
  FROM win
),
d AS (
  SELECT event_type, day, n, n_trail, med2,
         CASE WHEN n_trail > 0 THEN
           list_sort(list_transform(trail, x -> abs(x * 2 - med2)))
         END AS devs
  FROM m
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       n,
       CAST(med2 AS BIGINT)      AS med2,
       CAST(CASE WHEN n_trail > 0
            THEN devs[(n_trail + 1) // 2] + devs[n_trail // 2 + 1]
       END AS BIGINT)            AS mad4,
       n_trail >= {{_VOL_TRAIL}}
         AND abs(n * 4 - med2 * 2)
             > {{_VOL_K}} * (devs[(n_trail + 1) // 2] + devs[n_trail // 2 + 1])
                                 AS is_anomaly
FROM d
""".format(_VOL_TRAIL=_VOL_TRAIL, _VOL_K=_VOL_K),
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest-volume anomaly flags per feed: each day\'s event count
    against the trailing-7-day MEDIAN with a MAD band — the robust volume
    monitor that catches a half-empty drop or a double-ingest without
    being fooled by one earlier bad day (a mean/stddev band would be).
    Days with an incomplete trailing window never flag.

    Exactness: medians over integer windows live on the half-integer
    lattice, so the test runs doubled twice — med2 = lo+hi of the sorted
    trailing ROWS window (= 2x median for odd sizes, sum of the middle
    two for even), deviations are |n*2 - med2| (x2 units), mad4 = lo+hi
    of the sorted deviations (x4 units), and the flag compares
    |n*4 - med2*2| > K*mad4 — pure int64 on both engines, mirrored
    list-for-list (the oracle uses the same ROWS frame and the same
    sorted-array picks, not a calendar range). The trailing window is
    <= 7 elements, so the in-row sorts are O(1); the only shuffle keys
    on event_type and the table is |feeds| x |days| rows regardless of
    event volume — the monitor costs the same at 100 TB once the daily
    rollup exists.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return volume_anomaly_from_daily(daily)


def volume_anomaly_from_daily(daily: DataFrame) -> DataFrame:
    """The med2/mad4 anomaly projection over a (event_type, day, n)
    daily rollup — shared by the batch operator above and the streaming
    twin (where ``daily`` is the tumbling-count STATE and this runs
    read-side over |feeds| x |days| rows)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_VOL_TRAIL, -1)
    )

    def mid_sum(arr):
        sz = F.size(arr)
        lo = F.element_at(arr, F.floor((sz + 1) / 2).cast("int"))
        hi = F.element_at(arr, F.floor(sz / 2).cast("int") + 1)
        return F.when(sz > 0, lo + hi)

    stats = daily.select(
        "event_type",
        "day",
        "n",
        F.array_sort(F.collect_list("n").over(w)).alias("trail"),
    ).withColumn("n_trail", F.size("trail")).withColumn(
        "med2", mid_sum(F.col("trail"))
    )
    dev = stats.withColumn(
        "devs",
        F.when(
            F.col("n_trail") > 0,
            F.array_sort(
                F.transform(
                    F.col("trail"), lambda x: F.abs(x * 2 - F.col("med2"))
                )
            ),
        ),
    ).withColumn("mad4", mid_sum(F.col("devs")))
    return dev.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.col("med2").cast("long").alias("med2"),
        F.col("mad4").cast("long").alias("mad4"),
        (
            (F.col("n_trail") >= _VOL_TRAIL)
            & (F.abs(F.col("n") * 4 - F.col("med2") * 2) > _VOL_K * F.col("mad4"))
        ).alias("is_anomaly"),
    )
