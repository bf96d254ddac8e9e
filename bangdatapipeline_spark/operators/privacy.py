"""Privacy / anonymization audit operators: k-anonymity, l-diversity,
and generalize-then-suppress publication.

Before a table leaves the platform (vendor share, analytics export,
training-data release) the privacy review asks three questions this
module answers as ordinary DataFrame plans:

  * ``privacy_k_anonymity`` — how identifiable is each quasi-identifier
    combination? (group-size histogram + the below-k exposure share);
  * ``privacy_l_diversity`` — within each QI group, is the sensitive
    attribute actually diverse, or does k-anonymity hide a homogeneous
    group that leaks the value anyway?
  * ``privacy_generalize_suppress`` — the standard remediation:
    generalize the QI lattice one level (nation -> region, exact
    balance -> band) and suppress residual below-k cells, emitting the
    publishable rollup plus the suppression audit.

All three are exact-integer reports (counts, ppm shares) — no float
hazards — and every plan is one or two keyed aggregates over bounded
group domains: the QI group count is bounded by the attribute-domain
product, not the row count, so the audits cost one scan at any scale.
The PII-redaction projection for free text is ``text_redact_pii``
(llm_text.py); this module covers the structured-data side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

_K_ANON = 10  # publication threshold: groups smaller than this are exposed
_BAL_BAND = 200000  # cents band width for the generalized balance axis
# +100000 shifts the (possibly negative) balance non-negative BEFORE the
# integer division: Spark div truncates toward zero while DuckDB // floors,
# so a negative numerator would band differently per engine — and band -1
# must stay reserved as the suppression sentinel.


@register(
    "privacy_k_anonymity",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS s
  FROM customer GROUP BY 1, 2
), tot AS (SELECT sum(s) AS n_rows FROM g)
SELECT g.s AS group_size,
       CAST(count(*) AS BIGINT)  AS n_groups,
       CAST(sum(g.s) AS BIGINT)  AS n_rows,
       g.s < {_K_ANON}           AS below_k,
       CAST(sum(g.s) * 1000000 // tot.n_rows AS BIGINT) AS row_share_ppm
FROM g CROSS JOIN tot
GROUP BY g.s, tot.n_rows
""",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (nation, market segment) quasi-identifier
    over customers: the equivalence-class size histogram, each size's
    row share in ppm, and the below-k flag (k = {k}). A row in a group
    of size s is re-identifiable with probability 1/s given the QI —
    the histogram IS the disclosure-risk profile, and the below-k rows
    are what a publication must generalize or suppress.

    One keyed aggregate to QI group sizes (bounded by |nations| x
    |segments|), one bounded histogram roll-up, a 1-row total scalar
    (declared broadcast). Exact integers end to end.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("s")
    )
    tot = g.agg(F.sum("s").alias("n_rows_total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("s", "n_rows_total")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("s").alias("rows_in"),
        )
        .select(
            F.col("s").alias("group_size"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("rows_in").cast("long").alias("n_rows"),
            (F.col("s") < _K_ANON).alias("below_k"),
            F.expr(
                "CAST(rows_in * 1000000 div n_rows_total AS BIGINT)"
            ).alias("row_share_ppm"),
        )
    )


privacy_k_anonymity.__doc__ = privacy_k_anonymity.__doc__.format(k=_K_ANON)


@register(
    "privacy_l_diversity",
    oracle=f"""
WITH b AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // {_BAL_BAND} AS bal_band
  FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment,
         count(*)                 AS s,
         count(DISTINCT bal_band) AS l
  FROM b GROUP BY 1, 2
), tot AS (SELECT count(*) AS n_groups FROM g)
SELECT g.l AS l_distinct,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(g.s) AS BIGINT) AS min_group_size,
       g.l < 2                  AS homogeneous,
       CAST(count(*) * 1000000 // tot.n_groups AS BIGINT) AS group_share_ppm
FROM g CROSS JOIN tot
GROUP BY g.l, tot.n_groups
""",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: within each (nation, segment) QI group, how
    many DISTINCT values does the sensitive attribute (account-balance
    band) take? k-anonymity alone is defeated by a homogeneous group —
    if all 50 members share one balance band, the attacker learns the
    value without identifying the row. The histogram over l plus the
    l < 2 flag is the standard companion audit.

    Same bounded shape as the k-anonymity report: one distinct-agg per
    QI group (the distinct set is bounded by the band domain), one
    histogram roll-up, a 1-row group-count scalar (declared broadcast).
    """
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            f"(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div {_BAL_BAND}"
        ).alias("bal_band"),
    )
    g = b.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("s"),
        F.countDistinct("bal_band").alias("l"),
    )
    tot = g.agg(F.count(F.lit(1)).alias("n_groups_total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("l", "n_groups_total")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("s").alias("min_s"),
        )
        .select(
            F.col("l").alias("l_distinct"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("min_s").cast("long").alias("min_group_size"),
            (F.col("l") < 2).alias("homogeneous"),
            F.expr(
                "CAST(n_groups * 1000000 div n_groups_total AS BIGINT)"
            ).alias("group_share_ppm"),
        )
    )


@register(
    "privacy_generalize_suppress",
    oracle=f"""
WITH gen AS (
  SELECT n.n_regionkey AS region,
         c.c_mktsegment AS segment,
         (CAST(round(c.c_acctbal * 100) AS BIGINT) + 100000) // {_BAL_BAND} AS bal_band
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
), g AS (
  SELECT region, segment, bal_band, count(*) AS n
  FROM gen GROUP BY 1, 2, 3
)
SELECT region, segment,
       CASE WHEN n >= {_K_ANON} THEN bal_band ELSE -1 END AS bal_band,
       CAST(sum(n) AS BIGINT)   AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cells_merged,
       max(n < {_K_ANON})       AS suppressed
FROM g
GROUP BY region, segment, CASE WHEN n >= {_K_ANON} THEN bal_band ELSE -1 END
""",
)
def privacy_generalize_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalize-then-suppress publication: the QI lattice is coarsened
    one level (nation -> region via the dim join; exact balance -> band)
    and any residual cell still below k folds into its (region, segment)
    suppression bucket (bal_band = -1) rather than being published —
    the Mondrian-style remediation step after the two audits above. The
    output is the publishable rollup: every published cell has
    n >= k by construction, and the -1 rows record exactly how much
    data suppression cost (their n_cells_merged = how many sparse cells
    collapsed).

    Broadcast dim join (nation is tiny), one keyed aggregate to cells,
    one re-aggregate for the suppression fold — all bounded domains.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_regionkey").alias("region")
    )
    gen = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "region",
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            f"(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div {_BAL_BAND}"
        ).alias("bal_band"),
    )
    g = gen.groupBy("region", "segment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    pub_band = F.when(F.col("n") >= _K_ANON, F.col("bal_band")).otherwise(
        F.lit(-1)
    )
    return (
        g.select("region", "segment", pub_band.alias("bal_band"), "n")
        .groupBy("region", "segment", "bal_band")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_cells_merged"),
            F.max(F.col("n") < _K_ANON).alias("suppressed"),
        )
    )
