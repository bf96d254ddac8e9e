"""Reshaping operators (SURVEY.md §2.9) — the reference's bread and
butter: questions-as-rows -> one column per question (pivot), melts,
duplicate-submission cleanup, nested-JSON flattening.

Scale notes: pivot with an EXPLICIT value list is one hash aggregation
(no extra pass to discover values — at 100 TB value discovery is a full
scan); explode is a narrow transformation (no shuffle); exact dedup is a
hash aggregate keyed on content hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# Both the per-type FILTER columns and the total's IN-list interpolate
# EVENT_TYPES (ADVICE r11: the total carried the last hand-synchronized
# copy of the value list — adding a sixth type to EVENT_TYPES would have
# silently diverged the oracle's total from the pivoted columns).
_PIVOT_COLS_SQL = "\n".join(
    f"       count(*) FILTER (WHERE event_type = '{t}')"
    f"{' ' * (9 - len(t))}AS {t},"
    for t in EVENT_TYPES
)
_PIVOT_IN_SQL = ", ".join(f"'{t}'" for t in EVENT_TYPES)


@register(
    "pivot_wide",
    oracle=f"""
SELECT user_id,
{_PIVOT_COLS_SQL}
       count(*) FILTER (WHERE event_type IN
           ({_PIVOT_IN_SQL})) AS total
FROM events
GROUP BY user_id
""",
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with an explicit value list (single-pass hash agg;
    never let Spark scan for distinct pivot values at scale). ``total``
    is the total over the PIVOTED types, on both engines — an explicit
    value list excludes out-of-list types everywhere, so a bare oracle
    count(*) would silently diverge the day the fixture grows a sixth
    event_type (r11 review)."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    total = sum(F.coalesce(F.col(t), F.lit(0)) for t in EVENT_TYPES)
    return pivoted.select("user_id", *cols, total.alias("total"))


@register(
    "unpivot_long",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem WHERE l_orderkey < 500
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem WHERE l_orderkey < 500
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem WHERE l_orderkey < 500
""",
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (Spark 4 native unpivot). Raw column passthrough:
    values are bit-identical on both engines, no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_md5, min(doc_id) AS first_doc, count(*) AS n_copies
FROM documents
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: group on full text, keep-first by doc_id.
    Deterministic keeper (min doc_id), never dropDuplicates (its keeper is
    partition-order-dependent). At 100 TB group on md5/xxhash of content
    instead of raw text to shrink shuffle width — output keys by md5 here
    for exactly that reason."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("first_doc"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select(F.md5("text").alias("text_md5"), "first_doc", "n_copies")


@register(
    "explode_normalize",
    oracle="""
SELECT doc_id,
       CAST(unnest(generate_series(1, len(l))) - 1 AS INT) AS pos,
       unnest(l) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 50)
""",
)
def explode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-to-rows normalization: one document -> one row per token
    with its position (the json_normalize / explode shape). posexplode is
    a narrow op — no shuffle, scales linearly."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )


@register(
    "dedup_exact_canonical",
    oracle="""
WITH canon AS (
  SELECT doc_id,
         md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS h
  FROM documents
)
SELECT h,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(count(*) > 1 AS BOOLEAN) AS has_dups
FROM canon GROUP BY h
""",
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized exact dedup (the C4 recipe): lowercase, strip
    non-alphanumerics, collapse whitespace, THEN hash-group — catches
    trivially-reformatted duplicates that byte-exact dedup misses while
    staying a pure hash aggregate (no similarity join).

    The md5 projects each document to 32 bytes BEFORE the shuffle —
    text never leaves the scan stage, the aggregate keys on the digest
    (uniform, skew-free), and min(doc_id) is the deterministic keeper.
    Regexes stay in the Java∩RE2 subset (char class + ' +') so both
    engines canonicalize identically.
    """
    d = load_table(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        d.select("doc_id", F.md5(F.encode(canon, "utf-8")).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) > 1).alias("has_dups"),
        )
    )


@register(
    "explode_outer_nulls",
    # DuckDB unnest drops empty-list rows; the oracle reproduces OUTER
    # semantics by coalescing the empty list to [NULL] first.
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> len(t) > 9) AS longs
  FROM documents
)
SELECT doc_id,
       unnest(CASE WHEN len(longs) = 0 THEN [NULL] ELSE longs END) AS long_token,
       CAST(len(longs) AS INT) AS n_long
FROM toks
""",
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: documents whose filtered token array is EMPTY
    survive as a NULL row instead of vanishing — the outer-generator
    semantics every flatten step needs when downstream counts must
    still see the parent row (plain explode silently drops parents,
    the classic row-loss bug). Generator + filter run in-row; no
    shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    longs = F.filter(F.split("text", " "), lambda t: F.length(t) > 9)
    return d.select(
        "doc_id",
        F.explode_outer(longs).alias("long_token"),
        F.size(longs).cast("int").alias("n_long"),
    )


@register(
    "nested_roundtrip",
    # The oracle builds the SAME ordered document: list(... ORDER BY full
    # tuple) — the testdata contains duplicate l_linenumber values within
    # an order, so the sort key must be the whole item tuple or the first
    # element is a nondeterministic tie. Revenue folds over that ordered
    # list left-to-right on both sides (bit-identical doubles, §4.4.2) and
    # rounds at 4 dp — the px*(1-disc) value lattice (dialect_notes
    # "Round-half hazard, aggregate-sum form"); sum_qty is a plain sum
    # because quantities are integral (exact).
    oracle="""
WITH docs AS (
  SELECT l_orderkey AS order_key,
         list(struct_pack(ln := l_linenumber, qty := l_quantity,
                          px := l_extendedprice, disc := l_discount)
              ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount
         ) AS items
  FROM lineitem GROUP BY 1
)
SELECT order_key,
       CAST(len(items) AS INT)                              AS n_items,
       round(list_reduce(list_transform(items, s -> s.qty),
                         (x, y) -> x + y), 2)               AS sum_qty,
       round(list_reduce(list_transform(items, s -> s.px * (1 - s.disc)),
                         (x, y) -> x + y), 4)               AS revenue,
       round(items[1].qty, 2)                               AS first_line_qty
FROM docs
""",
)
def nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nest-then-flatten roundtrip (the reference's batch-document shape,
    §1.1): lineitem rows fold into ONE array-of-structs document per
    order (``collect_list(struct)``, made deterministic by ``array_sort``
    on the leading ``l_linenumber`` field), then ``inline`` explodes the
    document back to child rows and re-aggregates. The output equals a
    direct aggregation of the flat table — proving the nested document
    form is lossless and ordered, which is exactly what a batch-JSON
    cache write/read cycle (bang.py) relies on.

    Scale: one shuffle to build the documents (groupBy order key); the
    explode is narrow. Document size is bounded by lines-per-order (<=7
    in TPC-H shape), so no skew risk in collect_list.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (VERDICT r12 task 7, guide §2.3/§2.5): project to the five
    # consumed columns and repartition BY THE ORDER KEY before the
    # document build. The driver's single-row-group lineitem scan
    # otherwise fuses the partial collect_list — buffering every struct
    # of all 600k rows — into ONE scan task; keyed on l_orderkey the
    # aggregation's clustering requirement is already satisfied, so the
    # collect_list runs COMPLETE (one buffer pass, no partial/final
    # merge) across the session's cores after a single narrow exchange,
    # and the explode-side re-aggregate below inherits the same
    # partitioning (zero further exchanges).
    li5 = li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).repartition(max(8, spark.sparkContext.defaultParallelism), "l_orderkey")
    docs = li5.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
            )
        ).alias("items")
    )
    # revenue/sum_qty fold over the ORDERED document in-row (deterministic
    # summation order, matching the oracle bit-for-bit); the explode path
    # below re-derives n_items from actual child rows, proving the unnest
    # is lossless.
    rev = F.aggregate(
        F.col("items"),
        F.lit(0.0),
        lambda acc, s: acc + s["l_extendedprice"] * (1 - s["l_discount"]),
    )
    qty = F.aggregate(F.col("items"), F.lit(0.0), lambda acc, s: acc + s["l_quantity"])
    flat = docs.select(
        "order_key",
        F.round(qty, 2).alias("sum_qty"),
        F.round(rev, 4).alias("revenue"),
        F.round(F.element_at("items", 1)["l_quantity"], 2).alias("first_line_qty"),
        F.inline("items"),
    )
    return flat.groupBy("order_key").agg(
        F.count(F.lit(1)).cast("int").alias("n_items"),
        F.first("sum_qty").alias("sum_qty"),
        F.first("revenue").alias("revenue"),
        F.first("first_line_qty").alias("first_line_qty"),
    ).select("order_key", "n_items", "sum_qty", "revenue", "first_line_qty")


# --------------------------------------------------------------------------
# Schema-evolution union (old/new table generations)
# --------------------------------------------------------------------------

_EVO_SPLIT = "1996-01-01"


@register(
    "schema_evolution_union",
    oracle=f"""
WITH gen1 AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority,
         1 AS generation
  FROM orders WHERE o_orderdate < DATE '{_EVO_SPLIT}'
),
gen2 AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
         2 AS generation
  FROM orders WHERE o_orderdate >= DATE '{_EVO_SPLIT}'
),
unioned AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
SELECT CAST(generation AS INT) AS generation,
       coalesce(o_orderpriority, '<missing>') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
         AS revenue,
       CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority
FROM unioned
GROUP BY 1, 2
""",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — the everyday lakehouse situation where an
    old table generation lacks a column the new generation added (here:
    orders before ``_EVO_SPLIT`` simulate the pre-`o_orderpriority` era).
    ``unionByName(allowMissingColumns=True)`` aligns columns BY NAME and
    null-fills the missing one — positional ``union`` would silently
    misalign columns, the classic schema-drift corruption. The aggregate
    then proves the fill semantics: old-generation groups carry the
    '<missing>' bucket and n_with_priority = 0 (COUNT skips the fill
    nulls), new-generation groups count fully.

    Scale: the union is a zero-shuffle plan concatenation (each leg keeps
    its own scan partitions); only the final bounded-key aggregate
    shuffles. At 100 TB this is how N parquet generations with drifting
    schemas read as one logical table without a rewrite.
    """
    o = load_table(spark, sf_dir, "orders")
    gen1 = (
        o.filter(F.col("o_orderdate") < F.lit(_EVO_SPLIT).cast("date"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("generation", F.lit(1))
    )
    gen2 = (
        o.filter(F.col("o_orderdate") >= F.lit(_EVO_SPLIT).cast("date"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .withColumn("generation", F.lit(2))
    )
    unioned = gen1.unionByName(gen2, allowMissingColumns=True)
    return unioned.groupBy(
        F.col("generation").cast("int").alias("generation"),
        F.coalesce("o_orderpriority", F.lit("<missing>")).alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact-cents lattice: groups here are whole-table-sized (one per
        # generation×priority), where an order-dependent double sum can
        # flip the 2-dp boundary; integer cents sum exactly at any scale
        # (max |sum| << 2^53, so the final /100.0 is lossless).
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0, 2
        ).alias("revenue"),
        F.count("o_orderpriority").alias("n_with_priority"),
    )
