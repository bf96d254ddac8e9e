"""Projection / filter / predicate operators (SURVEY.md §2.2).

Reference capability: column selection/renaming/derived columns and row
filtering (excluding test users, date ranges) done eagerly in pandas.
Here each is a single declarative plan: Catalyst prunes columns down to
the parquet scan (ReadSchema) and pushes every sargable predicate into
the scan (PushedFilters) — at 100 TB these queries read only the row
groups and columns they touch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table


@register(
    "project_rename",
    oracle="""
SELECT
  c_custkey                       AS custkey,
  upper(c_name)                   AS name_upper,
  round(c_acctbal * 1.1, 3)     AS boosted_bal,
  c_mktsegment                    AS segment
FROM customer
""",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection, renaming, computed columns. Column pruning reaches
    the scan: only 4 of 5 customer columns are read."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.round(F.col("c_acctbal") * 1.1, 3).alias("boosted_bal"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'O')
  AND o_totalprice BETWEEN 50000 AND 450000
  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '%URGENT' OR o_orderpriority = '5-LOW')
  AND o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, IN-list, BETWEEN, LIKE, date
    range. All predicates are sargable built-ins -> pushed to parquet."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(50000, 450000)
        & (
            F.col("o_orderpriority").like("1%")
            | F.col("o_orderpriority").like("%URGENT")
            | (F.col("o_orderpriority") == "5-LOW")
        )
        & (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-06-01 00:00:00'"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_null_semantics",
    oracle="""
SELECT
  c_custkey,
  nullif(c_mktsegment, 'BUILDING')                            AS seg_nulled,
  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)')        AS seg_filled,
  (nullif(c_mktsegment, 'BUILDING') IS NULL)                  AS is_building
FROM customer
WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) > 1000
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: a NULL-producing CASE inside a predicate drops
    NULL rows (not just false ones); nullif/coalesce in the projection."""
    c = load_table(spark, sf_dir, "customer")
    seg_nulled = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.filter(
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")) > 1000
    ).select(
        "c_custkey",
        seg_nulled.alias("seg_nulled"),
        F.coalesce(seg_nulled, F.lit("(none)")).alias("seg_filled"),
        seg_nulled.isNull().alias("is_building"),
    )


_Q10_SQL = """
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o    ON o.o_custkey = c.c_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN nation n    ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


@register("sql_api_q10", oracle=_Q10_SQL)
def sql_api_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: the same ANSI text runs on spark.sql() and on
    the DuckDB oracle verbatim (returned-item revenue, TPC-H Q10 shape) —
    demonstrating that users can drive this engine with plain SQL over
    registered views, not just the DataFrame API. Catalyst plans it
    identically to the DataFrame form (broadcast dims, partial aggs,
    TakeOrderedAndProject for the top-20)."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q10_SQL)


_CORR_SUBQ_SQL = """
SELECT o.o_custkey,
       o.o_orderkey,
       round(o.o_totalprice, 2) AS totalprice
FROM orders o
WHERE o.o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                        FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)
"""


@register("subquery_correlated", oracle=_CORR_SUBQ_SQL)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 50% above their customer's own
    average — same ANSI text on spark.sql() and the oracle. Catalyst
    decorrelates it into an aggregate + self-join (no per-row re-execution),
    so the plan is two scans + one shuffle on o_custkey, scale-safe.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORR_SUBQ_SQL)
