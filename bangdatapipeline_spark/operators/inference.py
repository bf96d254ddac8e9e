"""Statistical-inference operators: survival analysis, resampling CIs,
and quasi-experimental contrasts.

The reference's analysis surface (SURVEY.md §2.6/§2.9) covers descriptive
aggregation and the classical two-sample tests (Welch, Mann-Whitney, KS —
``aggregates.py``); production analytics additionally needs the
time-to-event and uncertainty-quantification toolkit:

  * Kaplan-Meier survival estimation (``surv_kaplan_meier``) — the
    censoring-aware "how long until a customer converts" curve that a
    naive AVG(duration) gets wrong whenever some subjects never convert;
  * bootstrap confidence intervals (``stats_bootstrap_ci``) — a
    DETERMINISTIC Poisson(1) resampling scheme: each (row, replicate)
    weight is a pure integer function of the row key and replicate id on
    a 2^20 hash lattice, so both engines materialize the identical
    resample without any RNG state;
  * difference-in-differences (``events_diff_in_diff``) — the 2x2
    pre/post x treat/control contrast on an exact cents lattice.

Cents-lattice convention (VERDICT r11 task 3): this file deliberately
uses the ``round(x*100)`` spelling, consistently on BOTH the Spark and
oracle side of every pairing, over non-negative domains where it agrees
with the repo-default ``floor(x*100+0.5)`` in
``operators/lattice.py``. Do not swap spellings on one side only, and
do not copy this file's spelling into files that interpolate
``lattice.cents_sql`` — see lattice.py's docstring for the
half-away-from-zero vs half-toward-+inf divergence on signed data.

Scale notes (100 TB):
  * Kaplan-Meier reduces the corpus to one row per subject (one keyed
    aggregate), then to one row per (group, duration) — the survival
    product is a window over that bounded table, never over raw rows.
  * The bootstrap's replicate explosion is scan-local (x(R+1) rows that
    never hit the shuffle as raw rows: partial aggregation collapses
    them to groups x replicates before the exchange). R=200 replicate
    means per group is the only shuffled state. Weighted sums stay in
    int64 for sum(w_i * cents_i) up to ~10^13 rows per group at these
    magnitudes; beyond that, coarsen cents to whole units.
  * Diff-in-differences is a single conditional aggregate per group —
    one shuffle on event_type, eight integer cells per group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread

# High-value order threshold (~p75 of o_totalprice): the "event" in the
# time-to-first-high-value-order survival analysis. Customers who never
# place one are right-censored at the corpus horizon.
_HV_PRICE = 375000.0

# Poisson(1) CDF thresholds on the 2^20 integer lattice:
# floor(P(X <= k) * 2^20) for k = 0..5; the tail lumps into k = 6.
# Fixed constants (not computed at runtime) so both engines CASE on the
# same integers and the resample is reproducible forever.
_POIS_T = (385749, 771499, 964373, 1028665, 1044738, 1047952)
_BOOT_R = 200  # replicates; CI picks order stats 5 (2.5%) and 195 (97.5%)
_LCG_A = 1103515245
_LAT = 1048576  # 2^20


@register(
    "surv_kaplan_meier",
    oracle=f"""
WITH per AS (
  SELECT o_custkey,
         min(o_orderdate) AS t0,
         min(CASE WHEN o_totalprice > {_HV_PRICE} THEN o_orderdate END) AS t_hv
  FROM orders GROUP BY o_custkey
), h AS (SELECT max(o_orderdate) AS hmax FROM orders),
base AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day', per.t0, coalesce(per.t_hv, h.hmax)) AS dur,
         (per.t_hv IS NOT NULL) AS is_event
  FROM per CROSS JOIN h
  JOIN customer c ON c.c_custkey = per.o_custkey
), counts AS (
  SELECT segment, dur,
         count(*)                        AS c,
         count(*) FILTER (WHERE is_event) AS d
  FROM base GROUP BY segment, dur
), k AS (
  SELECT segment, dur, d,
         sum(c) OVER (PARTITION BY segment ORDER BY dur DESC) AS n_risk
  FROM counts
)
SELECT segment,
       CAST(dur AS BIGINT)    AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT)      AS n_event,
       round(exp(sum(ln(greatest(1e-12, 1 - d * 1.0 / n_risk)))
                 OVER (PARTITION BY segment ORDER BY dur)), 6) AS surv
FROM k WHERE d > 0
""",
)
def surv_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve per market segment for time-to-first-
    high-value-order, with right-censoring at the corpus horizon.

    Subjects = customers; origin = their first order date; event = first
    order above the high-value threshold; customers who never convert
    are censored at max(o_orderdate). At each distinct event time t:
    n_risk = #{subjects with duration >= t} (a descending cumulative sum
    over the per-duration counts — censored subjects leave the risk set
    when their censor time passes), and S(t) multiplies (1 - d/n_risk)
    over event times <= t, stated as exp(cumsum(ln ...)) in both engines
    over the identical ascending order, rounded to 6 dp (the repo's
    standard float-lattice discipline; ``greatest(1e-12, .)`` guards the
    everyone-converts-at-t_max boundary where the factor is exactly 0).

    Scale shape: one keyed aggregate collapses orders to one row per
    customer; the segment join is a dim equi-join; everything after is
    windows over the bounded (segment x distinct-duration) table — at
    100 TB of orders the window input is still only thousands of rows.
    The horizon is a 1-row max crossJoin (declared scalar broadcast).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    per = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("t0"),
        F.min(
            F.when(F.col("o_totalprice") > _HV_PRICE, F.col("o_orderdate"))
        ).alias("t_hv"),
    )
    horizon = orders.agg(F.max("o_orderdate").alias("hmax"))
    base = (
        per.crossJoin(F.broadcast(horizon))
        .join(cust, per.o_custkey == cust.c_custkey)
        .select(
            "segment",
            F.datediff(F.coalesce("t_hv", "hmax"), F.col("t0")).alias("dur"),
            F.col("t_hv").isNotNull().alias("is_event"),
        )
    )
    counts = base.groupBy("segment", "dur").agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(F.col("is_event"), F.lit(1))).alias("d"),
    )
    w_desc = Window.partitionBy("segment").orderBy(F.col("dur").desc())
    k = counts.withColumn("n_risk", F.sum("c").over(w_desc)).filter(
        F.col("d") > 0
    )
    w_asc = Window.partitionBy("segment").orderBy("dur")
    factor = F.log(
        F.greatest(F.lit(1e-12), F.lit(1) - F.col("d") / F.col("n_risk"))
    )
    return k.select(
        "segment",
        F.col("dur").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_event"),
        F.round(F.exp(F.sum(factor).over(w_asc)), 6).alias("surv"),
    )


def _rep_hash_sql(key: str, rep: str) -> str:
    """Deterministic per-(row, replicate) hash on the 2^20 lattice, with
    the replicate id entering MULTIPLICATIVELY:
    h = (2*(k%L)+1) * M_r % L where M_r = (2r+1)*A % L. Distinct
    replicates use distinct odd multipliers, so replicate r+1 is a
    genuinely different permutation of replicate r — not a cyclic shift.
    (The earlier additive form h = k*A + r*C made every replicate a
    shift of one permutation: consecutive resamples differed in only
    ~8% of weights and total resample mass was near-constant,
    autocorrelating the bootstrap/permutation null distributions.)

    Both factors are ODD, which matters twice: (a) h sweeps the odd
    residues uniformly (each exactly twice per full key sweep), so the
    CDF thresholds keep their probabilities; (b) no key can zero the
    product — the earlier (k%L + 1) co-factor hit L at k%L = L-1,
    making h = 0 for EVERY replicate (rows deterministically excluded
    from all 200 resamples once keys exceed 2^20, e.g. the offset keys
    of the sf1 smoke). h_r(k) = h_s(k) requires odd * 2(r-s)A ≡ 0 mod
    2^20, i.e. r ≡ s mod 2^19 — never within 500 replicates, so no
    fixed points at all. Identical text works as a Spark expression and
    DuckDB SQL; intermediates stay < 2^41, safe in int64 on both engines.
    """
    return (
        f"((2 * (CAST(({key}) AS BIGINT) % {_LAT}) + 1)"
        f" * ((2 * CAST(({rep}) AS BIGINT) + 1) * {_LCG_A} % {_LAT})) % {_LAT}"
    )


def _boot_weight_sql(key: str, rep: str) -> str:
    """Poisson(1) weight as a CASE over the deterministic hash lattice —
    identical text works as a Spark expression and DuckDB SQL."""
    h = _rep_hash_sql(key, rep)
    branches = "".join(
        f" WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE{branches} ELSE 6 END"


@register(
    "stats_bootstrap_ci",
    oracle=f"""
WITH reps AS (SELECT unnest(range(0, {_BOOT_R + 1})) AS r),
w AS (
  SELECT o.o_orderpriority AS priority, reps.r,
         CASE WHEN reps.r = 0 THEN 1
              ELSE {_boot_weight_sql('o.o_orderkey', 'reps.r')} END AS wt,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o CROSS JOIN reps
), m AS (
  SELECT priority, r,
         sum(wt * cents) // sum(wt) AS mean_cents,
         sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS n0
  FROM w GROUP BY priority, r HAVING sum(wt) > 0
), ranked AS (
  SELECT priority, r, mean_cents, n0,
         row_number() OVER (PARTITION BY priority
                            ORDER BY mean_cents, r) AS rn
  FROM m WHERE r > 0
)
SELECT m.priority,
       CAST(m.n0 AS BIGINT)       AS n_orders,
       CAST(m.mean_cents AS BIGINT) AS point_mean_cents,
       CAST(max(CASE WHEN ranked.rn = 5   THEN ranked.mean_cents END) AS BIGINT) AS ci_lo_cents,
       CAST(max(CASE WHEN ranked.rn = 195 THEN ranked.mean_cents END) AS BIGINT) AS ci_hi_cents
FROM ranked JOIN m ON m.priority = ranked.priority AND m.r = 0
GROUP BY m.priority, m.n0, m.mean_cents
""",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean order value per priority class, via a
    DETERMINISTIC Poisson(1) bootstrap: for replicate r, row i gets
    weight ~ Poisson(1) read off a fixed CDF table over the integer hash
    lattice h(i, r) = ((2*(key % 2^20)+1) * ((2r+1)*1103515245 % 2^20))
    % 2^20 — the replicate id enters MULTIPLICATIVELY (distinct odd
    multiplier per replicate), so the 200 resamples are independent
    lattice permutations rather than cyclic shifts of one. This is
    the standard "Poisson bootstrap" used for resampling on
    shared-nothing engines (multinomial resampling needs global
    coordination; independent Poisson(1) weights approximate it with
    per-row independence, which is what makes it distributable at all).
    No RNG state: the resample is a pure integer function both engines
    compute identically. Replicate r=0 carries weight 1 everywhere — the
    point estimate — and the CI picks exact order statistics 5/195 of
    the 200 replicate means (means on the integer cents lattice, ties
    broken by replicate id, so the selection cannot flip).

    Scale shape: the x201 replicate explosion happens inside the scan
    stage and is collapsed by map-side partial aggregation to
    (priority x 201) partial sums before the one shuffle; the ranking
    window runs over 201 rows per group. int64 headroom: max weight 6 x
    max cents ~5e7 -> ~3e8 per exploded row, safe to ~3e10 rows per
    group; coarsen the money lattice to whole dollars beyond that.
    """
    orders = load_table(spark, sf_dir, "orders")
    # r12: materialize the lattice hash ONCE per exploded row and CASE over
    # the column. _boot_weight_sql textually inlines the hash into every
    # CDF branch (fine for the oracle — one string both engines parse),
    # but Spark's codegen evaluates conditional branches lazily and does
    # not common-subexpression-eliminate across WHEN arms, so the 30M-row
    # explode was computing the 6-op integer hash up to 6x per row.
    # CollapseProject keeps the alias materialized (the hash chain is not
    # "cheap" and is referenced by every branch). Same integers, same
    # weights — the oracle string is untouched.
    branches = "".join(
        f" WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    # r12: the driver's orders table is ONE parquet row group, so the scan
    # (and everything fused into its stage — here the x201 replicate
    # explode, the hottest work in this query) runs as a single task.
    # Repartitioning the 3-column projection BEFORE the explode costs one
    # narrow |orders|-row shuffle and spreads the 201x expansion over
    # every core (guide: "one huge unsplittable file -> repartition
    # immediately after the read"); the width tracks the session's
    # parallelism, not a constant.
    w = (
        spread(
            orders.select(
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderkey").alias("k"),
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            ),
            "k",
        )
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R))))
        .withColumn("h", F.expr(_rep_hash_sql("k", "r")))
        .withColumn(
            "wt",
            F.expr(f"CASE WHEN r = 0 THEN 1{branches} ELSE 6 END"),
        )
    )
    m = (
        w.groupBy("priority", "r")
        .agg(
            F.expr("sum(wt * cents) div sum(wt)").alias("mean_cents"),
            F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).alias("n0"),
            F.sum("wt").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .drop("sw")
    )
    # r12: ONE consumer of the replicate table. The previous point/ci
    # branches each re-executed the full x201 explode + aggregate (the
    # DataFrame API shares no subtrees), doubling the only expensive
    # stage. Instead the r=0 row is forced to sort LAST within its
    # priority (rank 201), which leaves the r>0 replicate ranks 1..200
    # exactly as the oracle's ranked CTE assigns them, and one
    # conditional aggregate reads the point estimate and both CI order
    # statistics off the same 1005-row windowed table.
    rk = Window.partitionBy("priority").orderBy(
        (F.col("r") == 0).cast("int"), "mean_cents", "r"
    )
    ranked = m.withColumn("rn", F.row_number().over(rk))
    return ranked.groupBy("priority").agg(
        F.max(F.when(F.col("r") == 0, F.col("n0")))
        .cast("long")
        .alias("n_orders"),
        F.max(F.when(F.col("r") == 0, F.col("mean_cents")))
        .cast("long")
        .alias("point_mean_cents"),
        F.max(F.when((F.col("r") > 0) & (F.col("rn") == 5), F.col("mean_cents")))
        .cast("long")
        .alias("ci_lo_cents"),
        F.max(F.when((F.col("r") > 0) & (F.col("rn") == 195), F.col("mean_cents")))
        .cast("long")
        .alias("ci_hi_cents"),
    )


@register(
    "events_diff_in_diff",
    oracle="""
WITH mid AS (
  SELECT min(epoch_us(ts)) + max(epoch_us(ts)) AS mm FROM events
), cells AS (
  SELECT e.event_type,
         (e.user_id % 2 = 1)            AS treat,
         (2 * epoch_us(e.ts) >= mid.mm) AS post,
         count(*)                                   AS n,
         sum(CAST(round(e.value * 100) AS BIGINT))  AS cents
  FROM events e CROSS JOIN mid
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(CASE WHEN treat AND post THEN cents ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN treat AND post THEN n ELSE 0 END), 0) / 100, 4)     AS mean_treat_post,
       round(sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN treat AND NOT post THEN n ELSE 0 END), 0) / 100, 4) AS mean_treat_pre,
       round(sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN NOT treat AND post THEN n ELSE 0 END), 0) / 100, 4) AS mean_ctrl_post,
       round(sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) * 1.0
             / nullif(sum(CASE WHEN NOT treat AND NOT post THEN n ELSE 0 END), 0) / 100, 4) AS mean_ctrl_pre,
       round((sum(CASE WHEN treat AND post THEN cents ELSE 0 END) * 1.0
              / nullif(sum(CASE WHEN treat AND post THEN n ELSE 0 END), 0)
            - sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) * 1.0
              / nullif(sum(CASE WHEN treat AND NOT post THEN n ELSE 0 END), 0)
            - sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) * 1.0
              / nullif(sum(CASE WHEN NOT treat AND post THEN n ELSE 0 END), 0)
            + sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) * 1.0
              / nullif(sum(CASE WHEN NOT treat AND NOT post THEN n ELSE 0 END), 0)) / 100, 4) AS did
FROM cells GROUP BY event_type
""",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate per event type: treatment =
    odd user_id (a deterministic hash split), post-period = second half
    of the observation window (midpoint of [min ts, max ts], computed
    as an integer-microsecond scalar so the boundary is exact), outcome
    = event value on the cents lattice. DiD = (treat_post - treat_pre)
    - (ctrl_post - ctrl_pre) of cell means — the standard parallel-trends
    contrast that removes both the group baseline and the secular trend.

    All four cell means are ratios of exact int64 sums; the single
    division per cell happens on identical integers in both engines and
    is rounded to 4 dp. Scale shape: ONE conditional aggregate per
    (event_type, treat, post) — map-side partials collapse everything
    before the shuffle; the 2x2 pivot runs over <= 4 rows per group.
    The midpoint is a 1-row scalar crossJoin (declared broadcast).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    mid = ev.agg((F.min(us) + F.max(us)).alias("mm"))
    cells = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            (F.col("user_id") % 2 == 1).alias("treat"),
            (us * 2 >= F.col("mm")).alias("post"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "treat", "post")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )

    def cell(tr: bool, po: bool):
        cond = (F.col("treat") == tr) & (F.col("post") == po)
        s = F.sum(F.when(cond, F.col("cents")).otherwise(0))
        n = F.sum(F.when(cond, F.col("n")).otherwise(0))
        # nullif guard: an empty (treat, post) cell must be NULL in BOTH
        # engines — Spark's non-ANSI 0/0 is NULL but DuckDB's float 0/0
        # is NaN, a latent hash-parity break without the guard.
        return s * 1.0 / F.nullif(n, F.lit(0))

    tp, tpre = cell(True, True), cell(True, False)
    cp, cpre = cell(False, True), cell(False, False)
    return cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.round(tp / 100, 4).alias("mean_treat_post"),
        F.round(tpre / 100, 4).alias("mean_treat_pre"),
        F.round(cp / 100, 4).alias("mean_ctrl_post"),
        F.round(cpre / 100, 4).alias("mean_ctrl_pre"),
        F.round((tp - tpre - cp + cpre) / 100, 4).alias("did"),
    )


_PERM_R = 500  # sign-flip replicates; p-value uses the add-one convention


@register(
    "stats_permutation_test",
    oracle=f"""
WITH mid AS (
  SELECT min(epoch_us(ts)) + max(epoch_us(ts)) AS mm FROM events
), per_user AS (
  SELECT e.user_id,
         sum(CASE WHEN 2 * epoch_us(e.ts) < mid.mm
                  THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS s_pre,
         sum(CASE WHEN 2 * epoch_us(e.ts) < mid.mm THEN 1 ELSE 0 END)  AS n_pre,
         sum(CASE WHEN 2 * epoch_us(e.ts) >= mid.mm
                  THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS s_post,
         sum(CASE WHEN 2 * epoch_us(e.ts) >= mid.mm THEN 1 ELSE 0 END) AS n_post
  FROM events e CROSS JOIN mid
  GROUP BY e.user_id
), d AS (
  SELECT user_id, s_post * n_pre - s_pre * n_post AS d_u
  FROM per_user WHERE n_pre > 0 AND n_post > 0
), obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(d_u) AS BIGINT) AS t_obs
  FROM d
), reps AS (
  SELECT r.r, sum(CASE WHEN {_rep_hash_sql('d.user_id', 'r.r')} < {_LAT // 2}
                       THEN d.d_u ELSE -d.d_u END) AS t_r
  FROM d CROSS JOIN (SELECT unnest(range(1, {_PERM_R + 1})) AS r) r
  GROUP BY r.r
)
SELECT obs.n_users, obs.t_obs,
       CAST(count(*) FILTER (WHERE abs(reps.t_r) >= abs(obs.t_obs))
            AS BIGINT) AS n_extreme,
       CAST({_PERM_R} AS BIGINT) AS n_replicates,
       CAST((1000000 * (count(*) FILTER (WHERE abs(reps.t_r) >= abs(obs.t_obs)) + 1))
            // ({_PERM_R} + 1) AS BIGINT) AS p_ppm
FROM reps CROSS JOIN obs
GROUP BY obs.n_users, obs.t_obs
""",
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired randomization (Fisher sign-flip) test: did per-user event
    value drift between the first and second half of the observation
    window? Each user contributes the integer paired contrast
    d_u = s_post·n_pre − s_pre·n_post (the post-minus-pre mean
    difference put over the common denominator n_pre·n_post, so it
    stays on the exact cents lattice); under H0 the sign of every d_u
    is exchangeable, so the null distribution is T_r = Σ ±d_u with
    signs flipped by the SAME deterministic 2^20 hash lattice the
    bootstrap uses. p = (#{|T_r| ≥ |T_obs|} + 1)/(R + 1), the add-one
    convention that keeps the test exact-level, reported in ppm — the
    whole pipeline is integer arithmetic end to end, no RNG state.

    Complements the two-sample family (Welch/Mann-Whitney/KS compare
    independent groups; this is the PAIRED design) and the bootstrap
    (CI vs hypothesis test). Scale shape: one keyed aggregate to
    per-user contrasts, one xR scan-local explode collapsed by
    map-side partials to R replicate sums, one bounded comparison
    against the 1-row observed statistic (declared scalar crossJoin).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    mid = ev.agg((F.min(us) + F.max(us)).alias("mm"))
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    post = us * 2 >= F.col("mm")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(~post, cents).otherwise(0)).alias("s_pre"),
            F.sum(F.when(~post, 1).otherwise(0)).alias("n_pre"),
            F.sum(F.when(post, cents).otherwise(0)).alias("s_post"),
            F.sum(F.when(post, 1).otherwise(0)).alias("n_post"),
        )
    )
    d = per_user.filter((F.col("n_pre") > 0) & (F.col("n_post") > 0)).select(
        "user_id",
        (
            F.col("s_post") * F.col("n_pre") - F.col("s_pre") * F.col("n_post")
        ).alias("d_u"),
    )
    obs = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("d_u").cast("long").alias("t_obs"),
    )
    sign_flip = F.expr(
        f"CASE WHEN {_rep_hash_sql('user_id', 'r')} < {_LAT // 2}"
        f" THEN d_u ELSE -d_u END"
    )
    reps = (
        d.withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(_PERM_R))))
        .groupBy("r")
        .agg(F.sum(sign_flip).alias("t_r"))
    )
    extreme = F.sum(
        F.when(F.abs(F.col("t_r")) >= F.abs(F.col("t_obs")), 1).otherwise(0)
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .groupBy("n_users", "t_obs")
        .agg(
            extreme.cast("long").alias("n_extreme"),
            F.lit(_PERM_R).cast("long").alias("n_replicates"),
            F.expr(
                f"CAST((1000000 * (sum(CASE WHEN abs(t_r) >= abs(t_obs)"
                f" THEN 1 ELSE 0 END) + 1)) div ({_PERM_R} + 1) AS BIGINT)"
            ).alias("p_ppm"),
        )
        .select("n_users", "t_obs", "n_extreme", "n_replicates", "p_ppm")
    )


_QTE_PCTS = (25, 50, 75, 90)


@register(
    "stats_quantile_treatment",
    oracle=f"""
WITH base AS (
  SELECT (user_id % 2 = 1) AS treat,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), vc AS (
  SELECT treat, cents, count(*) AS c FROM base GROUP BY treat, cents
), cdf AS (
  SELECT treat, cents,
         sum(c) OVER (PARTITION BY treat ORDER BY cents) AS cum,
         sum(c) OVER (PARTITION BY treat)                AS n
  FROM vc
), q AS (
  SELECT p.p, cdf.treat, min(cdf.cents) AS q_cents
  FROM cdf JOIN (SELECT unnest([{", ".join(str(p) for p in _QTE_PCTS)}]) AS p) p
    ON cdf.cum >= (cdf.n * p.p + 99) // 100
  GROUP BY p.p, cdf.treat
)
SELECT CAST(p AS BIGINT) AS pct,
       CAST(max(CASE WHEN treat THEN q_cents END) AS BIGINT)     AS q_treat_cents,
       CAST(max(CASE WHEN NOT treat THEN q_cents END) AS BIGINT) AS q_ctrl_cents,
       CAST(max(CASE WHEN treat THEN q_cents END)
            - max(CASE WHEN NOT treat THEN q_cents END) AS BIGINT) AS qte_cents
FROM q GROUP BY p
""",
)
def stats_quantile_treatment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: at p25/p50/p75/p90, the difference
    between the treated and control purchase-value distributions —
    the distributional view a mean contrast (``events_diff_in_diff``)
    hides (a treatment that moves only the tail shows a flat mean and
    a large p90 QTE). Quantiles are EXACT type-1 order statistics
    (smallest value whose cumulative count reaches ceil(p·n/100)) on
    the integer cents lattice, so both engines select the identical
    value — no interpolation, no approx sketch.

    Scale shape: the bounded-domain CDF idiom (``ts_ship_delay_cdf``):
    one aggregate collapses raw purchases to per-(arm, distinct-value)
    counts — the window then runs over the VALUE DOMAIN (≤ ~49k cents
    rows per arm), not the row count, so a 100 TB fact table feeds a
    kilobyte-scale cumulative sum. The 4-row percentile spine joins on
    a range predicate against that bounded table (declared pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2 == 1).alias("treat"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    vc = base.groupBy("treat", "cents").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("treat").orderBy("cents")
    w_all = Window.partitionBy("treat")
    cdf = vc.select(
        "treat",
        "cents",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _QTE_PCTS])).alias("p")
    )
    q = (
        cdf.join(
            F.broadcast(pcts),
            F.col("cum") >= F.expr("(n * p + 99) div 100"),
        )
        .groupBy("p", "treat")
        .agg(F.min("cents").alias("q_cents"))
    )
    t = F.max(F.when(F.col("treat"), F.col("q_cents")))
    c = F.max(F.when(~F.col("treat"), F.col("q_cents")))
    return q.groupBy("p").agg(
        t.cast("long").alias("q_treat_cents"),
        c.cast("long").alias("q_ctrl_cents"),
        (t - c).cast("long").alias("qte_cents"),
    ).select(
        F.col("p").cast("long").alias("pct"),
        "q_treat_cents",
        "q_ctrl_cents",
        "qte_cents",
    )
