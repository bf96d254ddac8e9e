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

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread

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
        # r12 measured-and-rejected: repartitioning the big children by
        # the FK before the groupBy (so the partial agg escapes the
        # single-task scan and the groupBy reuses the exchange) measured
        # a WASH at bench scale (med 1.21 -> 1.25 s over 5 runs — the 7
        # relation subtrees already back-fill the cores concurrently)
        # and is scale-WRONG: it trades the map-side-combined partial
        # rows (|keys|) for a raw-row shuffle (|rows|), inflating
        # shuffle bytes 4x on lineitem. The fused partial agg IS the
        # 100 TB shape once scans split into many row groups.
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
       CAST(least(floor(CAST(cnt AS DOUBLE) * n_keys * 1000000 / n_total),
                  9.2e18) AS BIGINT)         AS hot_x_ppm
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
                # hot_x through IEEE doubles, not int64 (r11 review):
                # cnt * n_keys * 1000000 overflows int64 at ~1e7 keys x
                # 1e6-event hot key — Spark wraps silently, DuckDB
                # raises. Both engines evaluate the SAME double ops in
                # the SAME left-assoc order, so the result is
                # bit-identical cross-engine; share_ppm keeps the exact
                # integer path (cnt*1e6 bounded until a single key
                # holds ~9.2e12 rows). The least(..., 9.2e18) clamp
                # (ADVICE r11) keeps the double under BIGINT range at
                # EXTREME key/count scale, where DuckDB's CAST would
                # raise while Spark's non-ANSI cast nulls — both engines
                # saturate identically instead of diverging; 9.2e18 is
                # exactly representable as a double and < 2^63-1.
                F.expr(
                    "CAST(least(floor(CAST(cnt AS DOUBLE) * n_keys"
                    " * 1000000 / n_total), 9.2e18) AS BIGINT)"
                ).alias("hot_x_ppm"),
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
    # r12: the 64-term quantize+dot expression fused into the single-task
    # embeddings scan (guide §2.5) AND fed two consumers (the min/max
    # scalar and the binning pass) — spread the 3-column projection so
    # the scoring parallelizes, and pin the |vecs|-row score table so it
    # computes once per run instead of twice.
    s = (
        spread(e.select("vec_id", "label", "embedding"), "vec_id")
        .select("vec_id", "label", *q)
        .select("vec_id", "label", score)
        .cache()
    )
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
    # exact integer floor-division to minutes (r11 review: the double
    # quotient `/ 6e7` cast to long can round up across an integer
    # boundary once the quotient's ulp exceeds 1, flipping is_stale vs
    # the oracle's integer `//`; lag is non-negative so div == floor)
    lag_min = F.expr(
        "timestampdiff(MICROSECOND, last_ts, global_max) div 60000000"
    )
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "last_ts",
        lag_min.alias("lag_minutes"),
        (lag_min > _FRESH_STALE_MIN).alias("is_stale"),
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


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

@register(
    "dq_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
)
SELECT digit,
       n,
       CAST((n * 1000000 + sum(n) OVER () // 2) // sum(n) OVER () AS BIGINT) AS obs_ppm,
       CAST(floor(log10(1.0 + 1.0 / CAST(digit AS BIGINT)) * 1000000 + 0.5) AS BIGINT) AS exp_ppm,
       CAST(abs(
         CAST((n * 1000000 + sum(n) OVER () // 2) // sum(n) OVER () AS BIGINT)
         - CAST(floor(log10(1.0 + 1.0 / CAST(digit AS BIGINT)) * 1000000 + 0.5) AS BIGINT)
       ) AS BIGINT) AS dev_ppm
FROM c
""",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    fabricated-data screen: natural multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); a synthetic or truncated feed shows up as a
    large per-digit deviation.

    One groupBy on a 9-value key (map-side partials absorb everything),
    then a 9-row window for the total — nothing after the first
    aggregate depends on input size. The observed share is published on
    an exact integer ppm lattice ((n * 1e6 + total/2) DIV total — pure
    BIGINT arithmetic, no float division to diverge between engines) and
    the Benford expectation is the only float op, rounded to the same
    lattice from identical log10 inputs. At 100 TB this is a single
    scan with a 9-row reduction.
    """
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    # exact integer lattice: (n*1e6 + total DIV 2) DIV total
    counts = counts.withColumn("total", total)
    obs_ppm = F.expr("(n * 1000000 + total DIV 2) DIV total")
    exp_ppm = F.floor(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("bigint")) * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    return counts.select(
        "digit",
        "n",
        obs_ppm.alias("obs_ppm"),
        exp_ppm.alias("exp_ppm"),
        F.abs(obs_ppm - exp_ppm).cast("bigint").alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# Key-sequence gap detection
# ---------------------------------------------------------------------------

@register(
    "dq_sequence_gaps",
    oracle="""
WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
b AS (SELECT min(k) AS kmin, max(k) AS kmax FROM k),
gs AS (
  SELECT k1.k + 1 AS gap_start
  FROM k k1 LEFT JOIN k k2 ON k2.k = k1.k + 1, b
  WHERE k2.k IS NULL AND k1.k < b.kmax
),
ge AS (
  SELECT k1.k - 1 AS gap_end
  FROM k k1 LEFT JOIN k k2 ON k2.k = k1.k - 1, b
  WHERE k2.k IS NULL AND k1.k > b.kmin
),
gsn AS (SELECT gap_start, row_number() OVER (ORDER BY gap_start) AS rn FROM gs),
gen AS (SELECT gap_end, row_number() OVER (ORDER BY gap_end) AS rn FROM ge)
SELECT gap_start, gap_end, CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len
FROM gsn JOIN gen USING (rn)
ORDER BY gap_len DESC, gap_start
LIMIT 1000
""",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-range detection in a key sequence (the audit behind "did
    the extract drop a chunk?"): over the F-status extract's order keys,
    emit the 1000 widest maximal runs of absent key values as
    (gap_start, gap_end, gap_len) — the ranges a backfill would fetch.

    NOT the single-partition lag() formulation — a global-order window
    over the key column would funnel 100 TB of keys through one task.
    Instead two self ANTI-joins find the boundary keys distributedly:
    a key with no successor ends an island (gap starts at k+1), a key
    with no predecessor starts one (the previous gap ended at k-1).
    Both joins shuffle on the key (AQE-splittable), and only the
    BOUNDARY lists — |islands| rows, orders of magnitude smaller than
    the key count — pass through the global row_number that pairs
    gap_start[i] with gap_end[i]. The two scalar extremes broadcast.
    """
    # cached: this one key projection feeds SEVEN consumers (the bounds
    # aggregate, both sides of each anti-join, and the bounds subplan
    # under each crossJoin) — uncached, each re-scanned parquet (r11
    # review). Narrow (one long column), so the cache is the cheapest
    # relation in the plan; session hygiene via caches.release.
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .cache()
    )
    bounds = o.agg(F.max("k").alias("kmax"), F.min("k").alias("kmin"))
    # keys whose successor is absent = island ends -> a gap starts at k+1
    ends = o.join(o.select((F.col("k") - 1).alias("k")), "k", "left_anti")
    gap_start = (
        ends.crossJoin(F.broadcast(bounds))
        .filter(F.col("k") < F.col("kmax"))
        .select((F.col("k") + 1).alias("gap_start"))
    )
    # keys whose predecessor is absent = island starts -> a gap ended at k-1
    starts = o.join(o.select((F.col("k") + 1).alias("k")), "k", "left_anti")
    gap_end = (
        starts.crossJoin(F.broadcast(bounds))
        .filter(F.col("k") > F.col("kmin"))
        .select((F.col("k") - 1).alias("gap_end"))
    )
    ws = Window.orderBy("gap_start")
    we = Window.orderBy("gap_end")
    gs = gap_start.withColumn("rn", F.row_number().over(ws))
    ge = gap_end.withColumn("rn", F.row_number().over(we))
    return (
        gs.join(ge, "rn")
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("bigint")
            .alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# Cross-table value reconciliation
# ---------------------------------------------------------------------------

@register(
    "dq_reconciliation",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         SUM({cents_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")})
           AS line_cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderpriority,
         {cents_sql("o.o_totalprice")} AS order_cents,
         coalesce(li.n_lines, 0)   AS n_lines,
         coalesce(li.line_cents, 0) AS line_cents
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
       CAST(sum(CASE WHEN n_lines > 0 AND line_cents = order_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN n_lines > 0
                     AND abs(line_cents - order_cents) * 100 <= order_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(coalesce(max(CASE WHEN n_lines > 0
                          THEN abs(line_cents - order_cents) END), 0)
            AS BIGINT) AS max_abs_diff_cents,
       CAST(sum(CASE WHEN n_lines > 0 THEN line_cents - order_cents
                ELSE 0 END) AS BIGINT) AS net_diff_cents
FROM j GROUP BY o_orderpriority
""",
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: does each order's stored total
    equal the sum of its line items (extendedprice x (1-disc) x (1+tax))?
    The audit every finance/billing pipeline runs after a load, reported
    per priority band: exact matches, within-1%, worst absolute break,
    and the signed net drift.

    All money moves on an exact integer CENTS lattice: each line amount
    is a per-row scalar double expression (identical IEEE ops in both
    engines, no fold-order dependence) rounded to cents BEFORE the sum,
    so the per-order sum is exact BIGINT addition. The lineitem side
    pre-aggregates to one row per order (map-side partials), the join
    shuffles on the order key, and the final rollup is a 5-row result.
    Orders with no lines are kept by the LEFT join and counted
    separately rather than vanishing. At 100 TB: one shuffle each side
    on l_orderkey/o_orderkey — co-partition or bucket both tables on the
    order key and the exchange disappears.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_cents = cents_col(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(line_cents).alias("line_cents"),
    )
    j = o.join(
        per_order, o["o_orderkey"] == per_order["l_orderkey"], "left"
    ).select(
        "o_orderpriority",
        cents_col(F.col("o_totalprice")).alias("order_cents"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("line_cents", F.lit(0)).alias("line_cents"),
    )
    has_lines = F.col("n_lines") > 0
    diff = F.col("line_cents") - F.col("order_cents")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(~has_lines, 1).otherwise(0)).alias("n_no_lines"),
        F.sum(F.when(has_lines & (diff == 0), 1).otherwise(0)).alias("n_exact"),
        F.sum(
            F.when(has_lines & (F.abs(diff) * 100 <= F.col("order_cents")), 1)
            .otherwise(0)
        ).alias("n_within_1pct"),
        F.coalesce(F.max(F.when(has_lines, F.abs(diff))), F.lit(0))
        .cast("bigint")
        .alias("max_abs_diff_cents"),
        F.sum(F.when(has_lines, diff).otherwise(0)).alias("net_diff_cents"),
    )


# --------------------------------------------------------------------------
# Schema drift (generation-over-generation column presence audit)
# --------------------------------------------------------------------------

_DRIFT_SPLIT = "1996-01-01"  # same generation cut as schema_evolution_union
_DRIFT_COLS = ("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


def _schema_drift_oracle() -> str:
    g1_counts = ", ".join(
        (
            "CAST(0 AS BIGINT)"
            if c == "o_orderpriority"
            else f"CAST(count({c}) AS BIGINT)"
        )
        + f" AS c_{c}"
        for c in _DRIFT_COLS
    )
    g2_counts = ", ".join(
        f"CAST(count({c}) AS BIGINT) AS c_{c}" for c in _DRIFT_COLS
    )
    legs = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, g1.n AS g1_rows, g1.c_{c} AS g1_nonnull,"
        f" g2.n AS g2_rows, g2.c_{c} AS g2_nonnull FROM g1, g2"
        for c in _DRIFT_COLS
    )
    return f"""
WITH g1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n, {g1_counts}
  FROM orders WHERE o_orderdate < DATE '{_DRIFT_SPLIT}'
),
g2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n, {g2_counts}
  FROM orders WHERE o_orderdate >= DATE '{_DRIFT_SPLIT}'
),
cols AS ({legs})
SELECT column_name, g1_rows, g1_nonnull, g2_rows, g2_nonnull,
       CASE WHEN g1_nonnull = 0 AND g2_nonnull > 0 THEN 'added'
            WHEN g1_nonnull > 0 AND g2_nonnull = 0 THEN 'removed'
            ELSE 'stable' END AS drift
FROM cols
"""


@register("dq_schema_drift", oracle=_schema_drift_oracle())
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-over-generation schema-drift audit on the
    ``schema_evolution_union`` inputs: per column of the EVOLVED schema,
    the observed non-null count in each generation, and the drift
    verdict ('added' when a column is entirely null-filled in the old
    generation but populated in the new — the data-plane signature of a
    column added between dumps; 'removed' for the reverse; 'stable'
    otherwise). This is the detector a lakehouse runs BEFORE
    unionByName-ing a new drop: positional union would misalign exactly
    the columns this report flags.

    The metadata half of drift (type changes) is a driver-side schema
    diff with no data plane; the data-plane half verified here is the
    presence audit, which catches the same corruption class from the
    rows themselves. Plan: one count-aggregate per generation (each a
    single scan with map-side combine to ONE row), a 4-row stack, and a
    4-row projection — at 100 TB the cost is two columnar scans that
    prune to the audited columns, nothing shuffles more than 8 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    split = F.lit(_DRIFT_SPLIT).cast("date")
    # generation 1 predates o_orderpriority: its dump never carried the
    # column, modeled as an all-null fill (same as schema_evolution_union)
    gens = []
    for gen, pred, drop_priority in (
        (1, F.col("o_orderdate") < split, True),
        (2, F.col("o_orderdate") >= split, False),
    ):
        g = o.filter(pred)
        counts = [F.count(F.lit(1)).alias("n_rows")]
        for c in _DRIFT_COLS:
            if drop_priority and c == "o_orderpriority":
                counts.append(F.lit(0).cast("bigint").alias(f"c_{c}"))
            else:
                counts.append(F.count(c).alias(f"c_{c}"))
        gens.append(g.agg(*counts).withColumn("generation", F.lit(gen)))
    wide = gens[0].unionByName(gens[1])
    stack_args = ", ".join(f"'{c}', c_{c}" for c in _DRIFT_COLS)
    long = wide.selectExpr(
        "generation",
        "n_rows",
        f"stack({len(_DRIFT_COLS)}, {stack_args}) AS (column_name, n_nonnull)",
    )
    g = F.col("generation")
    piv = long.groupBy("column_name").agg(
        F.max(F.when(g == 1, F.col("n_rows"))).alias("g1_rows"),
        F.max(F.when(g == 1, F.col("n_nonnull"))).alias("g1_nonnull"),
        F.max(F.when(g == 2, F.col("n_rows"))).alias("g2_rows"),
        F.max(F.when(g == 2, F.col("n_nonnull"))).alias("g2_nonnull"),
    )
    return piv.select(
        "column_name",
        "g1_rows",
        "g1_nonnull",
        "g2_rows",
        "g2_nonnull",
        F.when((F.col("g1_nonnull") == 0) & (F.col("g2_nonnull") > 0), "added")
        .when((F.col("g1_nonnull") > 0) & (F.col("g2_nonnull") == 0), "removed")
        .otherwise("stable")
        .alias("drift"),
    )


@register(
    "dq_join_fanout_histogram",
    oracle="""
WITH per_order AS (
  SELECT o.o_orderkey, CAST(count(l.l_orderkey) AS BIGINT) AS n_lines
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT n_lines,
       CAST(count(*) AS BIGINT)     AS n_orders,
       CAST(sum(n_lines) AS BIGINT) AS n_rows_out
FROM per_order GROUP BY n_lines
""",
)
def dq_join_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout histogram — the cardinality audit run BEFORE pointing
    a 1000-executor job at a fact-fact join: for the orders->lineitem
    key, how many children does each parent have (bucketed), how many
    parents sit in each bucket, and how many output rows each bucket
    contributes. A surprise heavy bucket here is tomorrow's exploded
    join; zero-line parents (n_lines = 0) quantify the LEFT-join null
    fringe. Complements dq_hot_keys (this is the full distribution, not
    the top-5) and dq_referential_integrity (orphans are the mirror
    audit).

    The child side pre-aggregates to one row per parent key BEFORE
    anything joins — the shuffle is keyed on parent cardinality, never
    child row count — and the histogram is a bounded second aggregate
    (|distinct fanouts| keys) with map-side combine. At 100 TB this is
    two cheap passes that can save a 10-hour exploded join.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_child = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    per_order = o.join(per_child, "o_orderkey", "left").select(
        F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines")
    )
    return per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_lines").cast("bigint").alias("n_rows_out"),
    )


_BOT_TOP = 20


@register(
    "dq_bot_rate_suspects",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         date_diff('microsecond', min(ts), max(ts)) AS span_us
  FROM events GROUP BY user_id
),
r AS (
  SELECT user_id, n_events, CAST(span_us AS BIGINT) AS span_us,
         CAST(n_events * 60000000 // greatest(span_us, 1) AS BIGINT)
           AS events_per_min
  FROM u WHERE n_events >= 2
)
SELECT user_id, n_events, span_us, events_per_min,
       CAST(row_number() OVER (ORDER BY events_per_min DESC, user_id ASC)
            AS INT) AS rk
FROM r QUALIFY rk <= {_BOT_TOP}
""",
)
def dq_bot_rate_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likelihood ranking by sustained event rate — the traffic-
    quality gate a training-data pipeline runs on behavioral logs before
    trusting them (bot/scraper sessions poison both analytics and
    training mixes; rate is the first-order tell). Per user: event
    count, active span, and events-per-minute on the exact integer
    lattice (count x 60e6 DIV span_us — no float rate to drift), ranked
    to the top {_BOT_TOP} suspects with a deterministic tie-break.
    Ranking rather than thresholding keeps the report non-empty on any
    corpus — the threshold is a policy knob the consumer applies.

    One groupBy(user_id) with min/max/count (map-side combine), a
    |users|-row projection, and a top-{_BOT_TOP} window — the global
    sort runs over pre-aggregated user rows, never events. Single-digit
    seconds at any event volume; the heavy lifting was already paid by
    the aggregate's combine.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    )
    r = (
        u.filter(F.col("n_events") >= 2)
        .withColumn(
            "span_us",
            F.expr("timestampdiff(MICROSECOND, t0, t1)").cast("bigint"),
        )
        .withColumn(
            "events_per_min",
            F.expr(
                "n_events * 60000000 DIV greatest(span_us, 1)"
            ).cast("bigint"),
        )
    )
    w = Window.orderBy(F.col("events_per_min").desc(), F.col("user_id").asc())
    return (
        r.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _BOT_TOP)
        .select("user_id", "n_events", "span_us", "events_per_min", "rk")
    )


_DEBOUNCE_MIN_RUN = 2  # alert only after this many consecutive flagged days


def _alert_debounce_oracle() -> str:
    from bangdatapipeline_spark.registry import REGISTRY

    base = REGISTRY["dq_volume_anomaly"].oracle
    return f"""
WITH mon AS ({base}),
r AS (
  SELECT event_type, day, n, is_anomaly,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM mon
),
flagged AS (
  SELECT event_type, day, n, rn,
         rn - row_number() OVER (PARTITION BY event_type ORDER BY day)
           AS island
  FROM r WHERE is_anomaly
)
SELECT event_type,
       min(day)                      AS alert_start,
       max(day)                      AS alert_end,
       CAST(count(*) AS BIGINT)      AS run_days,
       CAST(sum(n) AS BIGINT)        AS events_in_run
FROM flagged
GROUP BY event_type, island
HAVING count(*) >= {_DEBOUNCE_MIN_RUN}
"""


@register("dq_alert_debounce", oracle=_alert_debounce_oracle())
def dq_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced volume alerts: collapse the daily anomaly flags of
    ``dq_volume_anomaly`` into alert EPISODES and page only on runs of
    >= _DEBOUNCE_MIN_RUN (2) consecutive flagged days — the flap
    suppressor every
    monitoring pipeline puts between a detector and a pager (a single
    noisy day self-heals; two in a row is an incident). Emits one row
    per episode with its span and event volume.

    Gaps-islands on the row index (rn over the daily monitor table minus
    rn over its flagged subset is constant within a consecutive run),
    composed over the REGISTERED monitor plan: the detector's daily
    rollup is the only volume-bearing work, the debounce adds two
    windows and one aggregate over the |feeds| x |days| state table —
    free at any scale once the monitor runs.
    """
    mon = dq_volume_anomaly(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy("day")
    r = mon.select(
        "event_type", "day", "n", "is_anomaly",
        F.row_number().over(wr).alias("rn"),
    )
    flagged = r.where(F.col("is_anomaly")).withColumn(
        "island", F.col("rn") - F.row_number().over(wr)
    )
    return (
        flagged.groupBy("event_type", "island")
        .agg(
            F.min("day").alias("alert_start"),
            F.max("day").alias("alert_end"),
            F.count(F.lit(1)).cast("bigint").alias("run_days"),
            F.sum("n").cast("bigint").alias("events_in_run"),
        )
        .where(F.col("run_days") >= _DEBOUNCE_MIN_RUN)
        .drop("island")
    )


_DUP_PAY_WINDOW_DAYS = 7
# Same-amount matching runs on a band lattice: this synthetic corpus has
# continuous prices (EXACT-cents collisions are structurally absent, which
# would make the screen vacuous at every sf), so "same amount" = same
# $10k band. On real AP data set the band to 1 (exact cents).
_DUP_PAY_AMT_BAND = 1_000_000


@register(
    "dq_duplicate_payments",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(round(o_totalprice * 100) AS BIGINT) // {_DUP_PAY_AMT_BAND}
           AS amt_band
  FROM orders
), pairs AS (
  SELECT a.o_custkey,
         a.o_orderkey AS key_a, b.o_orderkey AS key_b,
         a.cents AS cents_a, b.cents AS cents_b,
         date_diff('day', a.o_orderdate, b.o_orderdate) AS gap_days
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.amt_band = b.amt_band
   AND a.o_orderkey < b.o_orderkey
  WHERE date_diff('day', a.o_orderdate, b.o_orderdate)
          BETWEEN -{_DUP_PAY_WINDOW_DAYS} AND {_DUP_PAY_WINDOW_DAYS}
)
SELECT o_custkey, key_a, key_b,
       CAST(cents_a AS BIGINT) AS cents_a,
       CAST(cents_b AS BIGINT) AS cents_b,
       CAST(abs(gap_days) AS BIGINT) AS gap_days
FROM pairs
""",
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen — the classic AP/fraud audit: pairs of
    orders from the SAME customer in the SAME amount band within 7
    days of each other (double-submits, double-charges, replayed
    invoices). Joins the other financial audits (``dq_benford_first_
    digit`` finds fabricated amounts, ``dq_reconciliation`` finds
    header/detail drift; this finds repeats).

    Plan shape: a self-equi-join on the (customer, exact-cents) pair —
    the amount band is part of the JOIN KEY, not a post-filter, so the
    pair space is only same-band collisions (near-zero density), with
    the ±7-day window as the cheap residual. On real AP data the band
    is 1 cent (exact amounts); this corpus's continuous synthetic
    prices never collide exactly, so the screen uses a $10k band to be
    non-vacuous at every scale factor. The
    orderkey inequality halves pairs and makes each undirected pair
    appear exactly once. At 100 TB this is one shuffle on a
    high-cardinality composite key; no window, no cartesian — the same
    candidates-only posture as the dedup family.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            f"CAST(round(o_totalprice * 100) AS BIGINT) div {_DUP_PAY_AMT_BAND}"
        ).alias("amt_band"),
    )
    a = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderdate").alias("d_a"),
        F.col("cents").alias("cents_a"),
        "amt_band",
    )
    b = o.select(
        F.col("o_custkey").alias("cust_b"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderdate").alias("d_b"),
        F.col("cents").alias("cents_b"),
        F.col("amt_band").alias("amt_band_b"),
    )
    gap = F.datediff("d_b", "d_a")
    return (
        a.join(
            b,
            (a.cust == b.cust_b)
            & (F.col("amt_band") == F.col("amt_band_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .filter(gap.between(-_DUP_PAY_WINDOW_DAYS, _DUP_PAY_WINDOW_DAYS))
        .select(
            F.col("cust").alias("o_custkey"),
            "key_a",
            "key_b",
            F.col("cents_a").cast("long").alias("cents_a"),
            F.col("cents_b").cast("long").alias("cents_b"),
            F.abs(gap).cast("long").alias("gap_days"),
        )
    )
