"""Deterministic sampling operators (training-data-pipeline surface).

A 100-TB corpus pipeline needs *reproducible* sampling: the same subset
must come out on every engine, every partitioning, every rerun — for
held-out eval splits, ablation subsets, and per-stratum rebalancing.
Spark's ``df.sample``/``sampleBy`` are seeded per-partition and therefore
NOT stable across partitionings or engines, so the scale-correct recipe
is content-hash gating: ``md5(key) < threshold`` selects a uniform
pseudo-random fraction, identically everywhere, with zero shuffle — the
predicate is a per-row filter evaluated inside the scan's codegen stage.

Lowercase-hex md5 strings compare lexicographically in numeric order
('0'-'9' < 'a'-'f' in ASCII), so an 8-hex-digit prefix threshold IS the
sampling fraction in hex (e.g. '80000000' = 50%, '33333333' = 20%).
DuckDB and Spark both hash the UTF-8 bytes of the key string, so the
oracle is the very same predicate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread


def _hash_gate(key_col):
    """First 8 hex digits of md5(key) — a uniform draw in ['00000000','ffffffff']."""
    return F.substring(F.md5(F.encode(key_col.cast("string"), "utf-8")), 1, 8)


@register(
    "sample_hash_det",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '33333333'
""",
)
def sample_hash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform ~20% deterministic sample of orders by content hash.

    Same rows selected on any engine / partitioning / rerun. The gate is
    a scan-stage filter: no shuffle, no state, trivially scales — and the
    sample is *consistent* across tables keyed on the same column (e.g.
    gating lineitem on l_orderkey yields the matching child rows, the
    classic reproducible-join-sample trick).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(_hash_gate(F.col("o_orderkey")) < "33333333").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "sample_stratified",
    oracle="""
WITH gated AS (
    SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
           substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS gate,
           CASE c_mktsegment
               WHEN 'AUTOMOBILE' THEN '80000000'
               WHEN 'BUILDING'   THEN '40000000'
               ELSE                   '1a000000'
           END AS threshold
    FROM customer
)
SELECT segment,
       CAST(count(*) AS BIGINT)      AS n_sampled,
       CAST(sum(c_custkey) AS BIGINT) AS key_checksum,
       round(avg(c_acctbal), 3)      AS avg_bal
FROM gated
WHERE gate < threshold
GROUP BY segment
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (50% AUTOMOBILE,
    25% BUILDING, ~10% rest) via a CASE-selected hash threshold.

    This is `sampleBy` done reproducibly: the rate table is a tiny CASE
    expression (at 100 TB: a broadcast map), the gate stays in the scan
    stage, and only the post-sample aggregation shuffles — on data that is
    already down-sampled. ``key_checksum`` pins the exact membership of
    the sample, not just its size.
    """
    c = load_table(spark, sf_dir, "customer")
    threshold = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", "80000000")
        .when(F.col("c_mktsegment") == "BUILDING", "40000000")
        .otherwise("1a000000")
    )
    return (
        c.filter(_hash_gate(F.col("c_custkey")) < threshold)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("c_custkey").alias("key_checksum"),
            F.round(F.avg("c_acctbal"), 3).alias("avg_bal"),
        )
    )


@register(
    "sample_weighted",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       least(1.0, o_totalprice / 500000.0) AS incl_p,
       1.0 / least(1.0, o_totalprice / 500000.0) AS ht_weight
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
      / 4503599627370496.0
      < least(1.0, o_totalprice / 500000.0)
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (importance) Bernoulli sampling, fully deterministic:
    each order is kept with probability proportional to its value, and
    the emitted Horvitz-Thompson weight (1/p) makes any downstream sum
    an unbiased estimate of the population total — the standard recipe
    for value-weighted training-data subsampling at corpus scale.

    Determinism across engines with NO float hazard: the uniform draw is
    the first 13 hex digits of md5(key) read as a 52-bit integer divided
    by 2^52 (exact in double), and the inclusion probability is a single
    correctly-rounded division — both bit-identical on Spark and DuckDB,
    so `u < p` selects the same rows everywhere, like the uniform gate.
    Plan: still a pure scan-stage filter — no shuffle, no state.
    """
    o = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        / F.lit(4503599627370496.0)
    )
    p = F.least(F.lit(1.0), F.col("o_totalprice") / F.lit(500000.0))
    return o.filter(u < p).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        p.alias("incl_p"),
        (F.lit(1.0) / p).alias("ht_weight"),
    )


_SPLIT_ORACLE = """
WITH gated AS (
  SELECT lang,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
                THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n,
       count(*) / CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE)
         AS share
FROM gated GROUP BY 1, 2
"""


@register("sample_split", oracle=_SPLIT_ORACLE)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) — the split
    every training-data pipeline needs to be REPRODUCIBLE and stable
    under re-partitioning, re-runs, and engine changes. Same md5-gate
    recipe as the uniform sampler: the first 8 hex digits of
    md5(doc_id) are a uniform draw whose lowercase-hex ordering is
    numeric, so 'cccccccc' (= 0.8 * 2^32) and 'e6666666' (= 0.9 * 2^32)
    cut exact 80/90 points; a document's split NEVER depends on what
    partition it landed in. The gate is a scan-stage expression (no
    shuffle); the summary agg is on the tiny lang x split key space.
    `share` is one integer division — bit-identical, shipped unrounded.
    """
    d = load_table(spark, sf_dir, "documents")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    split = (
        F.when(gate < "cccccccc", "train")
        .when(gate < "e6666666", "val")
        .otherwise("test")
    )
    counts = d.groupBy("lang", split.alias("split")).agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    return counts.select(
        "lang", "split", "n",
        (F.col("n") / F.sum("n").over(w).cast("double")).alias("share"),
    )


# language -> training-mix weight. Integer part = guaranteed copies;
# fractional part = one extra copy behind the deterministic md5-gate.
MIX_WEIGHTS = {"en": 1.0, "de": 2.0, "fr": 1.5, "es": 0.5, "zh": 3.0}


@register(
    "sample_mixture_weights",
    oracle="""
WITH w AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 1
                   WHEN 'es' THEN 0 WHEN 'zh' THEN 3 END AS n_full,
         CASE WHEN lang IN ('fr', 'es')
              AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
              THEN 1 ELSE 0 END AS extra
  FROM documents
),
c AS (SELECT doc_id, lang, n_full + extra AS copies FROM w WHERE n_full + extra >= 1)
SELECT doc_id, lang,
       CAST(unnest(generate_series(1, copies)) AS INT) AS copy_idx,
       CAST(copies AS INT) AS copies
FROM c
""",
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix resampling by per-source weight: weight 3.0 repeats a
    document 3x (epoch upsampling), 1.5 gives one guaranteed copy plus a
    deterministic 50% chance of a second, 0.5 keeps half the rows — the
    standard way a pretraining mix hits its target source proportions in
    ONE pass over the corpus.

    The fractional copy rides the same md5-gate as ``sample_hash_det``
    (engine/partitioning/rerun-stable; no RNG state); the repeat is an
    in-row ``explode(sequence(...))`` — a generator, not a join. Weights
    live in one broadcastable CASE; at 100 TB this composes with
    ``pack_sequences`` downstream without an extra shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    n_full = (
        F.when(F.col("lang") == "en", 1)
        .when(F.col("lang") == "de", 2)
        .when(F.col("lang") == "fr", 1)
        .when(F.col("lang") == "es", 0)
        .when(F.col("lang") == "zh", 3)
    )
    extra = F.when(
        F.col("lang").isin("fr", "es")
        & (_hash_gate(F.col("doc_id")) < "80000000"),
        1,
    ).otherwise(0)
    copies = (n_full + extra).alias("copies")
    return (
        d.select("doc_id", "lang", copies)
        .filter(F.col("copies") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("copy_idx"),
            "copies",
        )
        .select(
            "doc_id",
            "lang",
            F.col("copy_idx").cast("int").alias("copy_idx"),
            F.col("copies").cast("int").alias("copies"),
        )
    )


@register(
    "sample_group_split",
    oracle="""
WITH assigned AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE
           WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
           WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
           ELSE 'test'
         END AS split
  FROM orders
)
SELECT split,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups,
       CAST(count(*) AS BIGINT)                  AS n_rows,
       CAST(sum(cents) AS BIGINT)                AS cents_checksum
FROM assigned GROUP BY split
""",
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-aware train/val/test split (80/10/10): the
    md5 gate hashes the *group* key (customer), not the row key, so
    every order of a customer lands in the same split — the correct
    recipe whenever rows within a group are correlated (same author,
    same user session, same source domain) and row-level splitting
    would leak train signal into eval. Contrast ``sample_split``,
    which assigns each document independently.

    The assignment is a scan-stage expression (zero shuffle, stable
    under any partitioning/engine/rerun); the only shuffle is the
    3-key summary agg. The distinct-group count uses exact
    countDistinct because the split audit is a bounded-key report; at
    100 TB swap in approx_count_distinct per the cardinality policy.
    All outputs are exact integers — nothing to lattice-round.
    """
    o = load_table(spark, sf_dir, "orders")
    gate = _hash_gate(F.col("o_custkey"))
    split = (
        F.when(gate < "cccccccc", "train")
        .when(gate < "e6666666", "val")
        .otherwise("test")
    )
    return (
        o.select(
            split.alias("split"),
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .groupBy("split")
        .agg(
            F.countDistinct("o_custkey").alias("n_groups"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("cents_checksum"),
        )
    )


@register(
    "sample_temporal_split",
    oracle="""
WITH assigned AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE
           WHEN o_orderdate <  DATE '1997-01-01' THEN 'train'
           WHEN o_orderdate <  DATE '1998-01-01' THEN 'val'
           ELSE 'test'
         END AS split,
         o_orderdate
  FROM orders
)
SELECT split,
       CAST(count(*) AS BIGINT)   AS n_rows,
       min(o_orderdate)           AS first_date,
       max(o_orderdate)           AS last_date,
       CAST(sum(cents) AS BIGINT) AS cents_checksum
FROM assigned GROUP BY split
""",
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/val/test split — the third member of the split
    family (random: ``sample_split``, group-aware: ``sample_group_split``):
    cut on event time so the model never trains on the future. The cut
    is a scan-stage date predicate (zero shuffle, partition-prunable
    when the table is date-partitioned — the 100 TB layout); the audit
    emits per-split row counts, date ranges (which must not overlap),
    and an exact integer checksum.
    """
    o = load_table(spark, sf_dir, "orders")
    split = (
        F.when(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"), "train")
        .when(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), "val")
        .otherwise("test")
    )
    return (
        o.select(
            split.alias("split"),
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            F.sum("cents").alias("cents_checksum"),
        )
    )


PER_GROUP_K = 5


@register(
    "sample_per_group_fixed",
    oracle=f"""
SELECT lang, doc_id, n_chars, rk
FROM (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS INT) AS rk
  FROM documents
) t
WHERE rk <= {PER_GROUP_K}
""",
)
def sample_per_group_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample (reservoir semantics, deterministic):
    exactly {PER_GROUP_K} documents per language, chosen by md5-rank —
    the hash order is a uniform shuffle that every engine / partitioning
    / rerun reproduces, unlike a seeded reservoir whose keep-set depends
    on encounter order. The eval-set builder's primitive: "give me K
    per stratum, stable across pipeline reruns".

    Plan: one window per stratum key; at 100 TB group counts are
    unbounded but WindowGroupLimit pushes the rank<=K filter into the
    sort, so per-partition state is K rows per group, not the group.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= PER_GROUP_K)
        .select("lang", "doc_id", "n_chars", "rk")
    )


@register(
    "sample_temperature_weights",
    oracle="""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
t AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c),
tot AS (SELECT sum(n_docs) AS n_total, sum(s) AS s_total FROM t)
SELECT lang, n_docs,
       CAST(floor(1000000.0 * n_docs / n_total + 0.5) AS BIGINT) AS base_ppm,
       CAST(floor(1000000.0 * s / s_total + 0.5) AS BIGINT)      AS temp_ppm,
       CAST(floor(1000.0 * (s / s_total) / (n_docs * 1.0 / n_total) + 0.5)
            AS BIGINT)                                           AS boost_x1000
FROM t, tot
""",
)
def sample_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights (the multilingual/multi-source
    rebalancing formula from XLM-R / mT5: p_i ∝ n_i^α with α = 0.5):
    DERIVES the per-language mix a temperature-sampled training run
    would use — natural share, temperature share, and the resulting
    boost factor per language — from the corpus itself. This is the
    weight table ``sample_mixture_weights`` consumes: low-resource
    languages upsample (boost > 1), high-resource downsample, with α
    interpolating between natural (α=1) and uniform (α=0).

    One bounded groupBy (|langs| keys, map-side combine absorbs the
    corpus) plus a 1-row total crossJoined back — the whole computation
    after the count is |langs| rows of arithmetic, at any corpus size.
    Float policy: shares are floor(x + 0.5) on the ppm lattice; the
    base ratio is a single exactly-rounded double division (identical
    in both engines by IEEE), and sqrt sums are irrational so their
    ratio never sits on a lattice boundary.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = c.select("lang", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("s"))
    tot = t.agg(
        F.sum("n_docs").alias("n_total"), F.sum("s").alias("s_total")
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.floor(1000000.0 * F.col("n_docs") / F.col("n_total") + 0.5)
        .cast("bigint")
        .alias("base_ppm"),
        F.floor(1000000.0 * F.col("s") / F.col("s_total") + 0.5)
        .cast("bigint")
        .alias("temp_ppm"),
        F.floor(
            1000.0
            * (F.col("s") / F.col("s_total"))
            / (F.col("n_docs") * 1.0 / F.col("n_total"))
            + 0.5
        )
        .cast("bigint")
        .alias("boost_x1000"),
    )


_BUDGET_TOKENS = 10_000_000  # per-epoch token budget to allocate


@register(
    "pipeline_token_budget_schedule",
    oracle=f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
t AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c),
tot AS (SELECT sum(s) AS s_total FROM t),
q AS (
  SELECT lang, n_docs,
         {_BUDGET_TOKENS} * s / s_total AS quota,
         CAST(floor({_BUDGET_TOKENS} * s / s_total) AS BIGINT) AS base
  FROM t, tot
),
r AS (
  SELECT lang, n_docs, base,
         quota - base AS frac,
         row_number() OVER (ORDER BY quota - base DESC, lang ASC) AS rk,
         sum(base) OVER () AS base_total
  FROM q
)
SELECT lang, n_docs,
       CAST(rk AS INT) AS remainder_rank,
       rk <= {_BUDGET_TOKENS} - base_total AS got_extra,
       CAST(base + CASE WHEN rk <= {_BUDGET_TOKENS} - base_total
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
FROM r
""",
)
def pipeline_token_budget_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch token-budget allocation across languages by temperature
    weight (α = 0.5, the sample_temperature_weights mix) with
    LARGEST-REMAINDER rounding, so the integer allocations sum EXACTLY
    to the budget — the schedule a training-data loader actually
    consumes (a ppm weight table leaves the off-by-a-few-tokens
    reconciliation to the reader; this settles it deterministically:
    floor every quota, hand the leftover tokens to the largest
    fractional remainders, lang as the tie-break).

    Float policy: quotas are sqrt-weighted doubles (identical IEEE
    expression both engines); floor/fraction/comparison all operate on
    those bit-identical doubles, and the allocation itself is pure
    integers, so the sum-to-budget invariant is exact, not approximate.
    Plan: one bounded groupBy (|langs| keys), a 1-row total broadcast,
    and windows over the |langs|-row table — free at any corpus size
    once the count exists.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = c.select(
        "lang", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("s")
    )
    tot = t.agg(F.sum("s").alias("s_total"))
    q = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.lit(_BUDGET_TOKENS) * F.col("s") / F.col("s_total")).alias("quota"),
        F.floor(F.lit(_BUDGET_TOKENS) * F.col("s") / F.col("s_total"))
        .cast("bigint")
        .alias("base"),
    )
    wrk = Window.orderBy((F.col("quota") - F.col("base")).desc(), F.col("lang").asc())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = q.select(
        "lang",
        "n_docs",
        "base",
        F.row_number().over(wrk).alias("rk"),
        F.sum("base").over(wall).alias("base_total"),
    )
    leftover = F.lit(_BUDGET_TOKENS) - F.col("base_total")
    return r.select(
        "lang",
        "n_docs",
        F.col("rk").cast("int").alias("remainder_rank"),
        (F.col("rk") <= leftover).alias("got_extra"),
        (
            F.col("base")
            + F.when(F.col("rk") <= leftover, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )


@register(
    "sample_balanced_classes",
    oracle="""
WITH e AS (SELECT vec_id, label FROM embeddings),
c AS (SELECT label, count(*) AS n FROM e GROUP BY label),
k AS (SELECT min(n) AS k_min FROM c),
ranked AS (
  SELECT label, vec_id,
         row_number() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rk
  FROM e
)
SELECT r.label,
       CAST(c.n AS BIGINT)         AS n_class,
       CAST(k.k_min AS BIGINT)     AS n_kept,
       CAST(sum(r.vec_id) AS BIGINT) AS key_checksum
FROM ranked r CROSS JOIN k
JOIN c ON c.label = r.label
WHERE r.rk <= k.k_min
GROUP BY r.label, c.n, k.k_min
""",
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample: every label keeps exactly n_min rows
    (the minority-class count, derived from the data), chosen by
    md5-rank — the deterministic undersampling step before training a
    classifier on skewed labels (``label_purity``'s table). Differs
    from ``sample_per_group_fixed`` in that K is DATA-DERIVED (the
    1-row min-class scalar, declared broadcast), so the output is
    balanced by construction even as the distribution drifts;
    per-class md5 order makes the keep-set reproducible on any
    engine/partitioning and stable under corpus append (only the
    marginal rank moves).

    Output is the per-class audit (original size, kept size, kept-key
    checksum) rather than the row set — bounded at |labels| rows. Plan:
    one bounded count, one per-label rank window, one filtered
    aggregate. Scale caveat stated honestly: WindowGroupLimit cannot
    apply (K is data-derived), so each label is one sort partition —
    fine at |labels| x moderate rows, but at 100 TB with few labels the
    right plan is the registry's two-phase selection
    (``exact_median2`` / ``agg_quantiles_exact``): a bounded histogram
    over md5-prefix buckets locates each class's k-th hash threshold,
    a scan-stage filter keeps rows below it, and only the boundary
    bucket needs an exact rank — same keep-set, no per-label sort.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    k = c.agg(F.min("n").alias("k_min"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = e.withColumn("rk", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("rk") <= F.col("k_min"))
        .join(F.broadcast(c), "label")
        .groupBy("label", "n", "k_min")
        .agg(F.sum("vec_id").cast("long").alias("key_checksum"))
        .select(
            "label",
            F.col("n").cast("long").alias("n_class"),
            F.col("k_min").cast("long").alias("n_kept"),
            "key_checksum",
        )
    )
