"""Scalar function families (SURVEY.md §2.8): string / date / math /
conditional / array / map / JSON / hash.

All built-in pyspark.sql.functions — JVM-side, inside whole-stage
codegen; no Python UDFs anywhere in these paths. Where Spark and DuckDB
spell a function differently (instr/strpos, weekday/isodow, log/ln) the
two sides are validated to agree value-for-value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread


@register(
    "str_funcs",
    oracle=r"""
SELECT p_partkey,
       lower(p_name)                                   AS name_lo,
       upper(p_brand)                                  AS brand_up,
       substring(p_type, 1, 6)                         AS type6,
       CAST(length(p_name) AS INT)                     AS name_len,
       replace(p_type, ' ', '_')                       AS type_us,
       regexp_extract(p_type, '^(\w+)', 1)             AS type_first,
       regexp_replace(p_name, '[aeiou]', '', 'g')      AS name_novowel,
       lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_pad,
       concat_ws('-', p_brand, p_type)                 AS brand_type,
       CAST(strpos(p_name, 'a') AS INT)                AS pos_a,
       trim(concat('  ', p_brand, ' '))                AS brand_trim
FROM part
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, replace, regexp extract /
    replace, pad, concat, position, trim. Note DuckDB regexp_replace needs
    the 'g' flag to match Spark's replace-all default."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lo"),
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_type", 1, 6).alias("type6"),
        F.length("p_name").cast("int").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.instr("p_name", "a").cast("int").alias("pos_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', o_orderdate)                               AS month_start,
       CAST(year(o_orderdate)    AS INT)                              AS yr,
       CAST(month(o_orderdate)   AS INT)                              AS mo,
       CAST(day(o_orderdate)     AS INT)                              AS dom,
       CAST(quarter(o_orderdate) AS INT)                              AS qtr,
       CAST(isodow(o_orderdate)  AS INT)                              AS dow_iso,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)  AS d_since,
       o_orderdate + INTERVAL 30 DAY                                  AS due_ts,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')      AS eom
FROM orders
WHERE o_orderkey < 5000
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, parts, ISO day-of-week (Spark weekday()+1
    == DuckDB isodow), day difference, interval arithmetic, last_day."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow_iso"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("d_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.date_format(F.last_day(F.to_date("o_orderdate")), "yyyy-MM-dd").alias("eom"),
    )


@register(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1)                    AS price_r1,
       CAST(floor(l_extendedprice) AS BIGINT)       AS price_floor,
       CAST(ceil(l_extendedprice)  AS BIGINT)       AS price_ceil,
       round(abs(l_discount - 0.05), 4)             AS disc_dev,
       round(pow(l_quantity, 2), 2)                 AS qty_sq,
       round(sqrt(l_quantity), 6)                   AS qty_sqrt,
       round(ln(l_extendedprice), 6)                AS price_ln,
       round(exp(l_discount), 6)                    AS disc_exp,
       l_orderkey % 7                               AS mod7,
       l_orderkey // 1000                           AS kdiv
FROM lineitem
WHERE l_orderkey < 2000
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/sqrt/ln/exp, modulo, integer
    division. floor/ceil are cast to BIGINT on both sides (Spark returns
    BIGINT natively, DuckDB DOUBLE)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.expr("l_orderkey div 1000").alias("kdiv"),
    )


@register(
    "cond_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END                                   AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'open')          AS status2,
       round(least(o_totalprice, 250000.0), 2)               AS capped,
       round(greatest(o_totalprice, 50000.0), 2)             AS floored
FROM orders
""",
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, least/greatest."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status2"
        ),
        F.round(F.least("o_totalprice", F.lit(250000.0)), 2).alias("capped"),
        F.round(F.greatest("o_totalprice", F.lit(50000.0)), 2).alias("floored"),
    )


@register(
    "array_funcs",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT)                      AS n_tokens,
       list_contains(string_split(text, ' '), 'data')                 AS has_data,
       array_to_string((string_split(text, ' '))[1:3], ',')           AS head3,
       array_to_string(list_sort((string_split(text, ' '))[1:5]), ',') AS head5_sorted,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT)       AS n_uniq
FROM documents
WHERE doc_id < 200
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family on tokenized text: size, contains, slice, sort,
    distinct-count. All narrow ops — no shuffle.

    Array-valued intermediates are projected to CSV strings (concat_ws /
    array_to_string) so the output schema is all-scalar: the external
    comparator canonicalizes via pandas sort_values, which cannot hash
    array cells."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.concat_ws(",", F.slice(toks, 1, 3)).alias("head3"),
        F.concat_ws(",", F.sort_array(F.slice(toks, 1, 5))).alias("head5_sorted"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_uniq"),
    )


@register(
    "array_higher_order",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT)                                    AS dim,
       round(list_inner_product(embedding, embedding), 4)             AS self_dot,
       round(list_aggregate(list_transform(embedding,
                            x -> CAST(x AS DOUBLE)), 'sum'), 4)       AS sum_e,
       round(list_aggregate(list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * 2), 'max'), 6)   AS max_2e
FROM embeddings
""",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column: transform,
    zip_with, aggregate (fold). This is the JVM-side dot-product kernel
    the kNN operators build on — no Python, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("embedding"),
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(dot_self, 4).alias("self_dot"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 4).alias("sum_e"),
        F.round(
            F.array_max(F.transform(F.col("embedding"), lambda x: x.cast("double") * 2)),
            6,
        ).alias("max_2e"),
    )


@register(
    "map_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT)            AS k_val,
       CAST(len(json_keys(props)) AS INT)                 AS n_keys,
       array_to_string(json_keys(props), ',')             AS keys_csv
FROM events
WHERE event_id < 2000
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> typed map, key/value access: from_json to map<string,int>,
    element access, cardinality, key listing."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "json_funcs",
    oracle="""
SELECT event_type,
       count(*)                                                  AS n,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 4)    AS avg_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction with typed cast, aggregated — the reference's
    nested-JSON-document access pattern."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@register(
    "hash_funcs",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
WHERE doc_id < 100
""",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 + sha256 (dedup keys). xxhash64 is the
    cheaper Spark-side key at scale but has no DuckDB twin, so the
    hash-checked query sticks to the portable pair."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.lower(F.sha2("text", 256)).alias("text_sha256"),
    )


@register(
    "map_higher_order",
    # DuckDB's map type lacks transform/filter lambdas, so the oracle
    # states the same RESULTS via the underlying scalar arithmetic —
    # the contract is value parity, not construct parity.
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT)                     AS k_val,
       CAST(json_extract(props, '$.k') AS INT) * 2                 AS k_doubled,
       CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS INT)   AS k_mod,
       CAST(json_extract(props, '$.k') AS INT) % 10 >= 5           AS k_high,
       2                                                           AS n_keys
FROM events
WHERE event_id < 2000
""",
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a map column from the JSON
    payload, then transform_values (x2), derive a second entry, filter
    entries by a predicate, and read sizes/lookups back out — the
    map-manipulation surface (`transform_values`, `map_filter`,
    `map_zip_with`-style derivations) exercised end-to-end with scalar
    outputs. All in-row codegen; no shuffle.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k").cast("int")
    m = F.create_map(F.lit("k"), k, F.lit("k_mod"), k % 10)
    doubled = F.transform_values(m, lambda _, v: v * 2)
    high = F.map_filter(m, lambda key, v: (key == "k_mod") & (v >= 5))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(doubled, "k").alias("k_doubled"),
        F.element_at(m, "k_mod").cast("int").alias("k_mod"),
        (F.size(high) > 0).alias("k_high"),
        F.size(m).alias("n_keys"),
    )


@register(
    "agg_bitwise",
    oracle="""
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS band,
       CAST(bit_or(user_id)  AS BIGINT) AS bor,
       CAST(bit_xor(user_id) AS BIGINT) AS bxor,
       CAST(bit_or(CAST(user_id << 8 AS BIGINT) | (user_id >> 2)) AS BIGINT)
                                         AS packed_or
FROM events
GROUP BY event_type
""",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) plus shift
    arithmetic in the projection — the primitives behind bitmap indexes
    and flag-field rollups (``agg_bitmap_distinct`` builds on exactly
    these). All three aggregates are associative-commutative, so
    map-side partials apply and partition order cannot change results.
    """
    ev = load_table(spark, sf_dir, "events")
    # Column `|` is logical OR in PySpark; the SQL `|` is bitwise
    packed = F.expr("CAST(shiftleft(user_id, 8) AS BIGINT) | shiftright(user_id, 2)")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
        F.bit_or(packed).alias("packed_or"),
    )


@register(
    "json_variant",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                                   AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT)  AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT)  AS max_k,
       CAST(count(*) FILTER (WHERE json_valid(props)) AS BIGINT)  AS n_valid
FROM events
GROUP BY event_type
""",
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` turns the raw ``props`` string into a binary-encoded,
    typed variant ONCE at scan, and every downstream field access is
    ``variant_get`` with a target type — no per-access string re-parse,
    which is the VARIANT value proposition over ``get_json_object`` at
    100 TB (parse cost paid once per row, shredded columnar storage when
    the sink supports it). ``try_parse_json`` supplies the validity
    check without an exception path. The oracle states the same
    semantics with DuckDB's string-side ``json_extract``/``json_valid``.
    """
    ev = load_table(spark, sf_dir, "events")
    # r12: the per-row parse_json/try_parse_json pair fused into the
    # single-task events scan (guide §2.5) — spread the projection so the
    # variant parse runs at session parallelism. r13 (ADVICE r12): keyed
    # on event_id, not the props payload — spread needs a high-cardinality
    # NON-NULL key, and xxhash64(NULL)/duplicate payloads would pile rows
    # into one partition (skew, not wrongness).
    v = spread(ev.select("event_id", "event_type", "props"), "event_id").select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
        F.try_parse_json("props").isNotNull().alias("valid"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        F.count(F.when(F.col("valid"), 1)).alias("n_valid"),
    )


@register(
    "bool_agg_funcs",
    oracle="""
SELECT c_mktsegment,
       bool_and(c_acctbal > 0)                        AS all_positive,
       bool_or(c_acctbal < 0)                         AS any_negative,
       CAST(count_if(c_acctbal > 5000) AS BIGINT)     AS n_high,
       CAST(count_if(c_nationkey % 2 = 0) AS BIGINT)  AS n_even_nation,
       CAST(count(*) AS BIGINT)                       AS n
FROM customer GROUP BY c_mktsegment
""",
)
def bool_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: ``bool_and`` / ``bool_or`` (SQL
    EVERY/ANY) and ``count_if`` per group — the predicate-rollup
    functions every data-quality dashboard leans on ("are ALL balances
    positive in this segment, does ANY go negative, how many exceed the
    threshold"). The engines must agree on three-valued logic here:
    these reduce predicates, not values, so a NULL-handling divergence
    shows up as a flipped boolean, not a drifted float.

    Pure map-side-combinable aggregates over a bounded key space — the
    cheapest possible shape at any scale (booleans fold to 1 bit of
    state, count_if to one counter).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
        F.bool_or(F.col("c_acctbal") < 0).alias("any_negative"),
        F.count_if(F.col("c_acctbal") > 5000).alias("n_high"),
        F.count_if(F.col("c_nationkey") % 2 == 0).alias("n_even_nation"),
        F.count(F.lit(1)).alias("n"),
    )
