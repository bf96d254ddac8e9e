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

from bangdatapipeline_spark.operators.lattice import cents_col, cents_sql
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
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
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


_Q17_SQL = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_qty
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#12', 'Brand#23')
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = p.p_partkey)
"""


@register("sql_api_q17", oracle=_Q17_SQL)
def sql_api_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    subquery over the FACT table, correlated through the dimension. At
    scale the decorrelated per-part average is a partial->final agg over
    lineitem re-joined on l_partkey — Catalyst plans exactly that (one
    extra fact shuffle, no per-row re-execution); the brand filter
    broadcasts from part to prune both fact scans.
    """
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


_Q18_SQL = """
SELECT c.c_name,
       o.o_custkey,
       o.o_orderkey,
       o.o_orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l2.l_orderkey
                       FROM lineitem l2
                       GROUP BY l2.l_orderkey
                       HAVING sum(l2.l_quantity) > 300)
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


@register("sql_api_q18", oracle=_Q18_SQL)
def sql_api_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    subquery on the fact table. Catalyst rewrites the IN to a left-semi
    join against the aggregated subquery; both lineitem passes shuffle on
    l_orderkey so AQE can reuse the exchange. Unique tie-break: o_orderkey.
    """
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q18_SQL)


_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("sql_api_q15", oracle=_Q15_SQL)
def sql_api_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a CTE referenced twice — once
    joined, once inside an uncorrelated scalar max() subquery. Catalyst
    evaluates the scalar subquery as a one-row broadcast; with AQE the
    grouped `revenue` exchange is computed once and reused for both
    consumers rather than rescanning lineitem.
    """
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q15_SQL)


_Q4_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


@register("sql_api_q4", oracle=_Q4_SQL)
def sql_api_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS with a
    non-equi conjunct. Catalyst rewrites it to a left-semi join on
    l_orderkey with the l_shipdate > o_orderdate residual — one fact
    shuffle each side, date filter pushed to the orders scan.
    """
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q4_SQL)


_Q22_SQL = """
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT)  AS n_cust,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal)
                     FROM customer c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
GROUP BY c.c_nationkey
"""


@register("sql_api_q22", oracle=_Q22_SQL)
def sql_api_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity, phone-prefix predicate
    replaced by the balance filter the testdata supports): above-average
    balance customers with no high-value order — an uncorrelated scalar
    subquery (one-row broadcast) plus NOT EXISTS → left-anti join against
    the filtered orders. The anti join probes on o_custkey only — column
    pruning cuts the orders scan to a single column.
    """
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SQL)


@register(
    "filter_scalar_subquery",
    oracle=f"""
WITH avg_cents AS (
  SELECT sum({cents_sql("o_totalprice")})
           // count(*) AS a
  FROM orders
)
SELECT o.o_orderkey,
       {cents_sql("o.o_totalprice")} AS price_cents
FROM orders o, avg_cents
WHERE {cents_sql("o.o_totalprice")} > avg_cents.a
""",
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter by an uncorrelated scalar subquery — ``WHERE price >
    (SELECT avg(price) ...)``, the above-average idiom. The threshold is
    computed on the exact integer cents lattice (sum DIV count), so
    membership at the boundary is deterministic: a float avg differs
    between engines in the last ulp, and a row sitting exactly on it
    would flip the hash.

    Plan shape: the 1-row aggregate broadcasts into the scan-side filter
    (Catalyst rewrites the scalar subquery to a broadcast exchange), so
    the fact table is read ONCE for the aggregate and once for the
    filtered projection — both scans prune to the two referenced
    columns. At 100 TB the aggregate pass is the cheap one (map-side
    combine to a single row) and the filter pass is where predicate
    evaluation must stay in the scan stage, which it does (asserted by
    the plan audit's no-BNLJ-unless-declared rule: the 1-row join IS
    the declared broadcast).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = cents_col(F.col("o_totalprice"))
    priced = o.select("o_orderkey", cents.alias("price_cents"))
    avg_cents = priced.agg(
        F.expr("sum(price_cents) DIV count(*)").alias("a")
    )
    return (
        priced.crossJoin(F.broadcast(avg_cents))
        .filter(F.col("price_cents") > F.col("a"))
        .select("o_orderkey", "price_cents")
    )
