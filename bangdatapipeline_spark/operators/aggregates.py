"""Aggregation operators (SURVEY.md §2.4).

The reference's core analysis step is eager pandas groupby over flattened
survey/chat frames; here every aggregate is a declarative Spark groupBy so
the engine gets map-side partial aggregation, whole-stage codegen, and AQE
post-shuffle coalescing automatically.

Scale notes: hash aggregation over a 100 TB fact table shuffles only the
(small) per-partition partial-aggregate state, keyed on the group-by
columns; low-cardinality keys like (l_returnflag, l_linestatus) reduce to
KBs of state per partition. No skew mitigation needed for these keys; for
high-cardinality skewed keys AQE skew handling + two-level (salted)
aggregation is the documented path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table

Q1_CUTOFF = "1999-09-02 00:00:00"


@register(
    "agg_groupby",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("flagship",),
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter + groupBy + 7 aggregates.

    The flagship `entry()` query. The shipdate filter is sargable and
    reaches the parquet scan (PushedFilters); partial aggregation happens
    map-side; the 6-group result is tiny regardless of input scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr(f"TIMESTAMP_NTZ '{Q1_CUTOFF}'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
