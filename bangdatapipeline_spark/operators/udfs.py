"""User-defined function surface (SURVEY.md §2.12) — the reference's
"processor" mechanism re-expressed on Spark.

The reference lets users register per-question Python callables that
recode survey answers column-wise; the Spark equivalents are:

  * scalar  → ``pandas_udf`` (Arrow-vectorized batches, 10-100× faster
    than row-at-a-time ``F.udf``; this is the only sanctioned way to put
    Python in a hot path),
  * grouped aggregation → ``groupBy().applyInPandas`` (one pandas frame
    per group, Arrow both ways),
  * table function → Python UDTF (Spark 4), one row in → many out,
    used via a SQL LATERAL join.

Each is hash-checked against a pure-SQL oracle re-expressing the same
logic, proving the UDF path computes exactly what the declarative path
would — the parity the reference's processors rely on.

Scale posture: pandas_udf/applyInPandas move Arrow batches across the
Python worker boundary (SURVEY.md §3.2 boundary 5); per-group state must
fit one executor (groups here are mktsegments — 5 groups — fine; at
100 TB key on something finer or pre-aggregate first).
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf, udtf

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table


# --- scalar: Likert-ish string -> int recode, vectorized over Arrow batches
# (pandas_udf construction is deferred into the query fn: the decorator needs
# an active SparkSession, and operator modules import before one exists)

def _prio_code_fn(s: pd.Series) -> pd.Series:
    # '1-URGENT' -> 1, '5-LOW' -> 5; the reference's per-question recode shape
    return s.str.slice(0, 1).astype("int32")


def _sentiment_score_fn(s: pd.Series) -> pd.Series:
    # toy lexicon scorer over free text: (+1 per 'e', -1 per 'z') / length —
    # deterministic, vectorized, SQL-re-expressible
    length = s.str.len().clip(lower=1)
    return ((s.str.count("e") - s.str.count("z")) / length).round(6)


@register(
    "udf_scalar",
    oracle="""
SELECT o_orderkey,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_code,
       round((length(o_orderstatus || o_orderpriority)
              - length(replace(o_orderstatus || o_orderpriority, 'e', ''))
              - (length(o_orderstatus || o_orderpriority)
                 - length(replace(o_orderstatus || o_orderpriority, 'z', ''))))
             / greatest(length(o_orderstatus || o_orderpriority), 1), 6) AS txt_score
FROM orders
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udfs: a priority recode and a toy text
    scorer, both re-expressed in SQL for the oracle."""
    o = load_table(spark, sf_dir, "orders")
    prio_code = pandas_udf(_prio_code_fn, "int")
    sentiment = pandas_udf(_sentiment_score_fn, "double")
    return o.select(
        "o_orderkey",
        prio_code("o_orderpriority").alias("prio_code"),
        sentiment(F.concat("o_orderstatus", "o_orderpriority")).alias("txt_score"),
    )


# --- grouped: custom per-group aggregate via applyInPandas

def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact order statistics (explicit indices), not interpolated quantiles:
    # pandas and DuckDB interpolate with different float formulas, which
    # flips the last rounded digit; (lo+hi)/2 and element picks are exact.
    bal = pdf["c_acctbal"].sort_values().reset_index(drop=True)
    n = len(bal)
    # median/iqr stay unrounded: lo/hi/q1/q3 are the same doubles in both
    # engines, so the derived values are bit-identical — while rounding a
    # half-cent boundary differs between Python (half-even) and SQL round.
    median = (float(bal.iloc[(n - 1) // 2]) + float(bal.iloc[n // 2])) / 2.0
    q1 = float(bal.iloc[(n - 1) // 4])
    q3 = float(bal.iloc[(3 * (n - 1)) // 4])
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n": [n],
            "median_bal": [median],
            "iqr_bal": [q3 - q1],
            "mean_bal": [round(float(bal.mean()), 2)],
        }
    )


@register(
    "udaf_grouped",
    oracle="""
WITH s AS (
    SELECT c_mktsegment, list_sort(list(c_acctbal)) AS bal, count(*) AS n,
           avg(c_acctbal) AS mean_raw
    FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n,
       (bal[CAST((n - 1) // 2 AS BIGINT) + 1]
        + bal[CAST(n // 2 AS BIGINT) + 1]) / 2.0 AS median_bal,
       bal[CAST((3 * (n - 1)) // 4 AS BIGINT) + 1]
         - bal[CAST((n - 1) // 4 AS BIGINT) + 1] AS iqr_bal,
       round(mean_raw, 2) AS mean_bal
FROM s
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation (median + IQR via exact order
    statistics) through applyInPandas — one Arrow-backed pandas frame per
    group, the reference's per-group custom-score shape."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        _segment_stats,
        schema="c_mktsegment string, n bigint, median_bal double, iqr_bal double, mean_bal double",
    )


# --- table function: one row -> many (Spark 4 Python UDTF)

class _TokenizeUDTF:
    """Yield (position, token) per whitespace token of the input text."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@register(
    "udtf_expand",
    oracle="""
SELECT doc_id,
       CAST(unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS INT) AS pos,
       unnest(string_split(text, ' ')) AS tok
FROM documents WHERE doc_id < 100
""",
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via SQL LATERAL join: one document row expands to one
    row per token (the explode/normalize shape, but through the
    user-extensible table-function path)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", udtf(_TokenizeUDTF, returnType="pos int, tok string"))
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 100
        """
    )


def _arrow_token_stats(batches):
    """mapInArrow body: per-batch token/char counts computed with
    pyarrow.compute kernels — columnar end to end, no pandas
    materialization (the zero-copy lane for wide binary/text batches)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        toks = pc.list_value_length(pc.split_pattern(text, " "))
        chars = pc.utf8_length(text)
        yield pa.RecordBatch.from_arrays(
            [batch.column("source"), toks.cast(pa.int64()), chars.cast(pa.int64())],
            names=["source", "n_tokens", "n_chars_obs"],
        )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM documents GROUP BY source
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Python-integration surface: ``mapInArrow`` — raw Arrow
    RecordBatches in and out, no pandas conversion at all. The body
    computes per-document token and character counts with
    pyarrow.compute kernels (split_pattern + list_value_length +
    utf8_length); the SQL oracle re-expresses the same counts, proving
    the Arrow lane computes exactly what the declarative path would
    (the same parity contract as udf_scalar/udaf_grouped/udtf_expand).

    When to pick this over pandas_udf: wide text/binary batches where
    the pandas conversion (object arrays, copies) dominates —
    mapInArrow hands the worker the Arrow buffers zero-copy, which is
    why the multimodal family's production decode path would sit here.
    Narrow transformation (no shuffle); the downstream rollup is a
    bounded |sources| aggregate with map-side combine.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    stats = d.mapInArrow(
        _arrow_token_stats, "source string, n_tokens long, n_chars_obs long"
    )
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("n_chars_obs").alias("sum_chars"),
    )


def _rolling_mean_cents_fn(v: pd.Series) -> float:
    # bounded-frame mean over exact cents integers: the float64 sum is
    # exact below 2^53, so the single division matches SQL avg() bit-wise
    return float(v.mean())


@register(
    "udf_window_agg",
    oracle="""
WITH s AS (SELECT * FROM orders WHERE o_orderkey % 50 = 0)
SELECT o_orderkey,
       o_custkey,
       round(avg(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100,
             4) AS rolling_avg
FROM s
""",
)
def udf_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth Python-integration surface: a pandas GROUPED_AGG UDF
    used as a WINDOW FUNCTION (``WindowInPandas``) — each customer's
    trailing-5-order mean value computed by a Python callable over the
    bounded frame, Arrow-batched per window partition. This is the
    surface a user reaches when the rolling statistic has no built-in
    (here it deliberately IS avg, so the SQL oracle proves the Python
    window lane computes exactly what the declarative frame would —
    the same parity contract as the other four UDF surfaces).

    Frame discipline: ROWS BETWEEN 4 PRECEDING AND CURRENT ROW over the
    unique (o_orderdate, o_orderkey) order; values enter as exact cents
    integers so the frame mean is one exact float64 division on both
    engines, rounded to 4 dp. Scale: WindowInPandas ships each bounded
    frame's column slice through Arrow — state per task is the frame
    (5 rows), not the partition; an UNBOUNDED pandas frame over a hot
    key would be the anti-pattern (use the built-in agg or a keyed
    pre-aggregate instead).
    """
    rolling_mean = pandas_udf(_rolling_mean_cents_fn, "double")
    # deterministic 2% key sample: WindowInPandas pays one Python frame
    # evaluation PER ROW for bounded frames (measured ~0.4 ms/row at sf0.1
    # — the per-row Arrow slice + Python call can't batch across rows), so
    # the parity demo runs on a hash-gated subset. The contract under test
    # is the surface's exactness, not volume throughput: this measured cost
    # IS the docstring's anti-pattern warning, quantified (the
    # volume-bearing Arrow lanes are doc_map_in_arrow and the GEMM kernels,
    # which batch thousands of rows per Python call)
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.expr("o_orderkey % 50 = 0"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(rolling_mean(F.col("cents")).over(w) / 100, 4).alias(
            "rolling_avg"
        ),
    )
