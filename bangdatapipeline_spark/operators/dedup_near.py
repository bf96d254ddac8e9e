"""Near-duplicate detection on ``documents.text`` (SURVEY.md §2.10).

Three detectors, one per classic technique family:

  * ``dedup_near_jaccard``  — exact 3-word-shingle Jaccard, all pairs on a
    bounded subset (the correctness baseline; quadratic by definition).
  * ``dedup_near_minhash``  — MinHash signatures + banded LSH candidate
    join + exact-Jaccard verification (the scale path: no all-pairs join;
    candidates only where a band bucket collides).
  * ``dedup_near_simhash``  — 16-bit SimHash fingerprint per document +
    duplicate-cluster size.

All three are HASH-CHECKED against DuckDB: every hash function is explicit
integer arithmetic (a char-level polynomial rolling hash + LCG-derived
universal hashes), bit-identical across engines — unlike
``ml.feature.MinHashLSH`` whose JVM seeding is not reproducible in SQL.

Scale posture (100 TB): shingling/hashing is a pure per-row projection
(codegen, no shuffle). MinHash bands shuffle on (band, bucket) — uniform by
construction; near-dup clusters concentrate per bucket, exactly the skew
AQE's skew-join split handles. The exact-verify join touches only candidate
pairs (≪ n²). SimHash groups on the 16-bit fingerprint (bounded keyspace —
at 100 TB widen to 64-bit and band it like MinHash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.operators.graph_util import min_label_components
from bangdatapipeline_spark.registry import REGISTRY, register
from bangdatapipeline_spark.tables import load_table, spread

P = 2147483647  # 2^31 - 1 (Mersenne prime) — modulus for all hashes
MINHASH_K = 16  # signature length
BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4
ROWS_PER_BAND = MINHASH_K // BANDS
JACCARD_TAU = 0.7
EXACT_BOUND = 250  # doc_id bound for the all-pairs exact baseline


def _lcg(n: int) -> int:
    return (1103515245 * n + 12345) % P


# Universal-hash coefficients for the K minhash functions (a odd).
MH_A = [_lcg(2 * j) | 1 for j in range(MINHASH_K)]
MH_B = [_lcg(2 * j + 1) for j in range(MINHASH_K)]


# --- shared SQL fragments (Spark arrays are 0-based, DuckDB 1-based; the
# shingle windows below are aligned so both produce the identical string set).

SPARK_SHINGLES = (
    "array_distinct(transform(sequence(1, size(ws) - 2), "
    "i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))"
)
DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(ws) - 2), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
)

# char-level polynomial rolling hash (same recipe as text_fingerprint)
SPARK_STRHASH = (
    "aggregate(sequence(1, length({s})), CAST(0 AS BIGINT), "
    f"(acc, i) -> (acc * 31 + ascii(substring({{s}}, i, 1))) % {P})"
)


def _hash_words_np(flat):
    """Vectorized twin of SPARK_STRHASH / DUCK_STRHASH over a flat word
    list — the SAME integer fold ((acc*31 + codepoint) % P), stepped over
    char positions with numpy, so results are bit-identical BY
    CONSTRUCTION (pure int64 arithmetic: max intermediate P*31 + 0x10FFFF
    << 2^63). The per-character Catalyst fold this replaces was the
    hottest expression in the repo (~50 s of interpreted substring/ascii
    calls on the sf0.1 shingle pass).

    Precondition (r10 review): words must not contain EMBEDDED NUL
    characters — numpy's fixed-width U dtype uses codepoint 0 as right
    padding, so an interior NUL position is skipped here while the SQL
    fold on both engines would include its 0 contribution. Tokens come
    from split-on-space over text columns, where NUL does not survive
    ingestion; a corpus that can carry NULs must strip them upstream."""
    if len(flat) == 0:
        return np.zeros(0, dtype=np.int64)
    u = np.asarray(flat, dtype="U")  # NUL-padded fixed-width codepoints
    width = u.dtype.itemsize // 4
    codes = u.view(np.uint32).reshape(len(u), width)
    h = np.zeros(len(u), dtype=np.int64)
    for i in range(width):  # position-major: each step is one vector op
        c = codes[:, i].astype(np.int64)
        m = c != 0  # words are left-aligned; 0 == padding
        if not m.any():
            break
        h[m] = (h[m] * 31 + c[m]) % P
    return h


_WORDHASH_UDF = None


def wordhash(col):
    """string -> bigint word hash (Arrow-batched scalar twin)."""
    global _WORDHASH_UDF
    if _WORDHASH_UDF is None:

        @F.pandas_udf("bigint")
        def _one(tok: pd.Series) -> pd.Series:
            return pd.Series(_hash_words_np(tok.to_numpy()))

        _WORDHASH_UDF = _one
    return _WORDHASH_UDF(col)


_HSHINGLE_UDF = None


def hashed_shingles_arr(col):
    """array<string> words -> array<bigint> DISTINCT hashed 3-shingles —
    the vectorized twin of the per-word hash + shingle combine in one
    Arrow pass. Same integer lattice: word hashes from _hash_words_np, mixed
    ((h0*SH_MIX + h1) % P * SH_MIX + h2) % P (max intermediate ≈ P·SH_MIX
    ≈ 2.1e15 << 2^63 — exact). Downstream consumers treat the shingle
    set as a SET (explode+distinct, min-fold signatures, array_intersect
    verify), so np.unique's sorted order is equivalent to array_distinct's
    first-occurrence order."""
    global _HSHINGLE_UDF
    if _HSHINGLE_UDF is None:

        @F.pandas_udf("array<bigint>")
        def _sh(ws: pd.Series) -> pd.Series:
            lists = ws.tolist()
            flat = [w for lst in lists for w in lst]
            h = _hash_words_np(flat)
            out, pos = [], 0
            for lst in lists:
                n = len(lst)
                wh = h[pos : pos + n]
                pos += n
                if n < 3:
                    out.append([])
                    continue
                hs = ((wh[:-2] * SH_MIX + wh[1:-1]) % P * SH_MIX + wh[2:]) % P
                out.append(np.unique(hs).tolist())
            return pd.Series(out, dtype=object)

        _HSHINGLE_UDF = _sh
    return _HSHINGLE_UDF(col)
DUCK_STRHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length({s})), "
    "i -> CAST(ascii(substring({s}, i, 1)) AS BIGINT))), "
    f"(acc, c) -> (acc * 31 + c) % {P})"
)


def _shingled(spark: SparkSession, sf_dir: str, bound: int | None = None) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    if bound is not None:
        d = d.filter(F.col("doc_id") < bound)
    return (
        d.withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 3)
        .withColumn("s", F.expr(SPARK_SHINGLES))
        .select("doc_id", "s")
    )


# --- hashed-shingle pipeline (the MinHash scale path) ------------------------
#
# Words are char-fold-hashed ONCE each, then a shingle's hash is integer
# arithmetic over its three word hashes — ~3x fewer interpreted char-fold
# evaluations than hashing every 3-word string, and the downstream exact
# verification runs on int sets instead of string sets. The combine keeps
# every intermediate < 2^51 (word hash < 2^31, multiplier 2^20-ish), exact
# in BIGINT on both engines.

SH_MIX = 1000003  # shingle-combine multiplier (> max word count, prime)

# Spark side computes the same combine inside hashed_shingles_arr (one
# Arrow pass over the words); DuckDB spells it out:
DUCK_HSHINGLES = (
    f"list_distinct(list_transform(generate_series(1, len(ws) - 2), "
    f"i -> ((wh[i] * {SH_MIX} + wh[i+1]) % {P} * {SH_MIX} + wh[i+2]) % {P}))"
)


def _hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("ws", F.split("text", " "))
        .filter(F.size("ws") >= 3)
        .withColumn("hs", hashed_shingles_arr(F.col("ws")))
        .select("doc_id", "hs")
    )


# DuckDB spelling of the same doc_id -> hs relation.
DUCK_HASHED_CTE = f"""
    SELECT doc_id, {DUCK_HSHINGLES} AS hs
    FROM (SELECT doc_id, string_split(text, ' ') AS ws,
                 list_transform(string_split(text, ' '),
                                w -> {DUCK_STRHASH.format(s='w')}) AS wh
          FROM documents) t
    WHERE len(ws) >= 3
"""


_JACCARD_SPARK = (
    "CAST(size(array_intersect(sa, sb)) AS DOUBLE) / size(array_distinct(concat(sa, sb)))"
)
_JACCARD_DUCK = (
    "CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(sa || sb))"
)


@register(
    "dedup_near_jaccard",
    oracle=f"""
WITH sh AS (
    SELECT doc_id, {DUCK_SHINGLES} AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE doc_id < {EXACT_BOUND}) t
    WHERE len(ws) >= 3
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       floor(({_JACCARD_DUCK}) * 1000000 + 0.5) / 1000000 AS jaccard
FROM p WHERE {_JACCARD_DUCK} >= {JACCARD_TAU}
""",
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard near-dup pairs on a bounded
    subset — the ground-truth baseline the approximate detectors are judged
    against. All-pairs; bounded because quadratic."""
    sh = _shingled(spark, sf_dir, bound=EXACT_BOUND)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_raw", F.expr(_JACCARD_SPARK))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select(
            "id_a",
            "id_b",
            # floor lattice, not round(): a rational like 449/640 has a
            # binary-terminating shape where Spark's shortest-decimal
            # HALF_UP and DuckDB's binary-value round disagree
            # (docs/dialect_notes.md; r10 review)
            (F.floor(F.col("jaccard_raw") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "jaccard"
            ),
        )
    )


def _minhash_sig_expr() -> str:
    """Spark SQL array of K minhash values over the shingle-hash array."""
    mins = ", ".join(
        f"array_min(transform(hs, h -> (CAST({MH_A[j]} AS BIGINT) * h + {MH_B[j]}) % {P}))"
        for j in range(MINHASH_K)
    )
    return f"array({mins})"


def _duck_minhash_sig() -> str:
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> (CAST({MH_A[j]} AS BIGINT) * h + {MH_B[j]}) % {P}))"
        for j in range(MINHASH_K)
    )
    return f"[{mins}]"


@register(
    "dedup_near_minhash",
    oracle=f"""
WITH hashed AS (
{DUCK_HASHED_CTE}
), sig AS (
    SELECT doc_id, hs, {_duck_minhash_sig()} AS sig FROM hashed
), bexp AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(0, {BANDS - 1}),
               g -> g || ':' || array_to_string(
                   list_slice(sig, g * {ROWS_PER_BAND} + 1, g * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ','))) AS key
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bexp a JOIN bexp b ON a.key = b.key AND a.doc_id < b.doc_id
), pairs AS (
    SELECT c.id_a, c.id_b, ha.hs AS sa, hb.hs AS sb
    FROM cand c
    JOIN hashed ha ON ha.doc_id = c.id_a
    JOIN hashed hb ON hb.doc_id = c.id_b
)
SELECT id_a, id_b,
       floor(({_JACCARD_DUCK}) * 1000000 + 0.5) / 1000000 AS jaccard
FROM pairs WHERE {_JACCARD_DUCK} >= {JACCARD_TAU}
""",
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection, exact-verified on the
    hashed shingle sets: word-hash → arithmetic 3-shingle hash → K=16
    universal-hash minima → 4 bands of 4 → equi-join on band buckets →
    exact Jaccard ≥ τ on the candidates only.

    This is the operator a 100-TB dedup actually runs: the only join is an
    equi-join on band keys (no n² pass), and every emitted pair is
    exact-verified so precision is 1.0 w.r.t. hashed-shingle Jaccard;
    recall is the standard LSH S-curve (≈0.996 at j=0.8 with these
    parameters). Verification runs on the int shingle-hash sets rather
    than the 3-word strings: with P=2^31-1 and ~200 shingles/doc the
    within-pair collision odds are ~4e-5 — and a collision perturbs both
    engines identically (the hashes are engine-portable arithmetic), so
    the check stays exact. Hashing cost is one char-fold per WORD (each
    word is reused by 3 shingles), not per shingle — the dominant
    interpreted-lambda count drops ~3x (higher-order folds don't enter
    whole-stage codegen).

    Shuffle discipline: the band join moves (key, doc_id) pairs ONLY — the
    shingle-hash arrays (the heavy payload) never enter the ×BANDS-
    amplified band shuffle; they rejoin once, per candidate id.

    The hashed-shingle table is .cache()d: it feeds THREE consumers (the
    signature path and both verification rejoins), and the word-fold
    hashing is the dominant cost — caching computes it once per session
    instead of per consumer (measured 2.9 s -> 1.4 s at sf0.1; Spark's
    CacheManager dedupes repeated calls by canonicalized plan). At
    100 TB the same holds with a disk-backed storage level, or
    checkpoint the hashed table to parquet once.
    """
    hashed = _hashed_shingles(spark, sf_dir).cache()
    sig = hashed.withColumn("sig", F.expr(_minhash_sig_expr()))
    bexp = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {BANDS - 1}), g -> concat(g, ':', "
                f"concat_ws(',', slice(sig, g * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}))))"
            )
        ).alias("key"),
        # r12: bexp feeds BOTH self-join sides — unpinned, the minhash
        # signature expression (the dominant per-row cost after the
        # cached word-fold) evaluated twice per run. .cache(), NOT
        # localCheckpoint: a checkpoint's per-call RDD id would make the
        # plans of downstream cached consumers (eval_dedup_recall's
        # sys_p) unique per run and defeat their plan-identity reuse.
        # r13 measured-and-rejected: repartition(defaultParallelism, key)
        # before this cache (guide §2.4 co-partitioning) — ABBA cold
        # 1.41 -> 1.84 s, warm 0.56 -> 0.90 s. The self-join sides are
        # BROADCAST hash joins (the pinned band table is small), so the
        # added string-key exchange buys nothing and is pure cost.
    ).cache()
    a = bexp.select(F.col("key"), F.col("doc_id").alias("id_a"))
    b = bexp.select(F.col("key"), F.col("doc_id").alias("id_b"))
    cand_ids = (
        a.join(b, "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    cand = cand_ids.join(
        hashed.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("sa")), "id_a"
    ).join(hashed.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("sb")), "id_b")
    return (
        cand.withColumn("jaccard_raw", F.expr(_JACCARD_SPARK))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select(
            "id_a",
            "id_b",
            # floor lattice, not round(): a rational like 449/640 has a
            # binary-terminating shape where Spark's shortest-decimal
            # HALF_UP and DuckDB's binary-value round disagree
            # (docs/dialect_notes.md; r10 review)
            (F.floor(F.col("jaccard_raw") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "jaccard"
            ),
        )
    )


@register(
    "dedup_near_simhash",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
    FROM documents
), th AS (
    SELECT doc_id, {DUCK_STRHASH.format(s='tok')} AS h FROM toks
), bits AS (
    SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
    FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bb
    GROUP BY doc_id, b
), fp AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash16
    FROM bits GROUP BY doc_id
)
SELECT doc_id, simhash16,
       CAST(count(*) OVER (PARTITION BY simhash16) AS BIGINT) AS dup_count
FROM fp
""",
)
def dedup_near_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup fingerprinting: each distinct token hashes to 16
    bits; each bit position accumulates ±1 votes across tokens; the sign
    vector is the document fingerprint. Near-identical token sets collapse
    to the same fingerprint; dup_count is the cluster size.

    Per-doc work is a projection + ONE doc_id aggregation carrying 16
    per-bit vote sums — no joins, no row amplification.
    At 100 TB the fingerprint would widen to 64 bits, with Hamming-distance
    banding (split into 4×16-bit bands, join per band) for distance<=k
    pairing — same shape as the MinHash band join above.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    th = toks.select("doc_id", wordhash(F.col("tok")).alias("h"))
    # ONE aggregate with 16 per-bit vote-sum columns (r10 review: the
    # earlier 16-row crossJoin amplified the token-hash relation 16x and
    # shuffled it twice); votes combine map-side, the single shuffle
    # moves 1x rows, and the fingerprint is a pure post-projection —
    # bit-identical output.
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"2 * ((shiftright(h, {b})) & 1) - 1")).alias(f"s{b}")
            for b in range(16)
        ]
    )
    sim = F.lit(0)
    for b in range(16):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    fp = votes.select("doc_id", sim.cast("bigint").alias("simhash16"))
    return fp.withColumn(
        "dup_count", F.count("*").over(Window.partitionBy("simhash16")).cast("bigint")
    )


# shared CTE chain: minhash candidates -> exact-verified pairs -> recursive
# connected components -> `lab(doc_id, cluster_id)`. Used by dedup_clusters
# and dedup_keep_best_quality, which differ only in the final projection.
_CLUSTER_CTES = f"""
WITH RECURSIVE hashed AS (
{DUCK_HASHED_CTE}
), sig AS (
    SELECT doc_id, hs, {_duck_minhash_sig()} AS sig FROM hashed
), bexp AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(0, {BANDS - 1}),
               g -> g || ':' || array_to_string(
                   list_slice(sig, g * {ROWS_PER_BAND} + 1, g * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ','))) AS key
    FROM sig
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bexp a JOIN bexp b ON a.key = b.key AND a.doc_id < b.doc_id
), vpairs AS (
    SELECT c.id_a, c.id_b, ha.hs AS sa, hb.hs AS sb
    FROM cand c
    JOIN hashed ha ON ha.doc_id = c.id_a
    JOIN hashed hb ON hb.doc_id = c.id_b
), pairs AS (
    SELECT id_a, id_b FROM vpairs WHERE {_JACCARD_DUCK} >= {JACCARD_TAU}
), edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
), nodes AS (
    SELECT DISTINCT a AS id FROM edges
), reach(node, r) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.node
), lab AS (
    SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
)"""

_CLUSTER_ORACLE = (
    _CLUSTER_CTES
    + """
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""
)


@register("dedup_clusters", oracle=_CLUSTER_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-verified
    MinHash pair graph, by iterative min-label propagation — the step a
    real dedup runs after pair detection (keep min doc_id per component,
    drop the rest).

    Each round is one equi-join + partial-min aggregation; labels only
    ever decrease, so convergence is checked by the (monotone) label sum
    and takes O(component diameter) rounds — near-dup components are
    near-cliques, so 2-3 rounds in practice. At 100 TB the same loop runs
    with the large-star/small-star optimization (alternate join
    directions) to bound round count on pathological chains — implemented
    for real in ``graph_analytics.graph_cc_alternating``;
    ``localCheckpoint`` caps lineage growth per round.
    """
    pairs = REGISTRY["dedup_near_minhash"].fn(spark, sf_dir).select("id_a", "id_b")
    labels = min_label_components(pairs)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


@register(
    "dedup_keep_best_quality",
    oracle=_CLUSTER_CTES
    + """
, q AS (
  SELECT doc_id,
         (len(list_distinct(string_split(text, ' '))) * 1000000)
           // len(string_split(text, ' ')) AS q_ppm
  FROM documents
),
scored AS (
  SELECT l.cluster_id, l.doc_id, q.q_ppm,
         count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
  FROM lab l JOIN q ON q.doc_id = l.doc_id
)
SELECT cluster_id,
       CAST(cluster_size AS BIGINT)     AS cluster_size,
       doc_id                           AS kept_doc,
       CAST(q_ppm AS BIGINT)            AS kept_q_ppm,
       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM scored
QUALIFY row_number() OVER (PARTITION BY cluster_id
                           ORDER BY q_ppm DESC, doc_id) = 1
""",
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    (MinHash pairs -> connected components, the ``dedup_clusters``
    machinery), KEEP the highest-quality document instead of the naive
    min-id — the policy real pretraining dedup uses, because near-dup
    groups often pair a clean original with truncated/boilerplated
    copies and min-id keeps an arbitrary one.

    Quality here is lexical diversity on an exact integer lattice
    (distinct-token ppm of token count — the ``uniq_ratio`` signal from
    ``text_quality`` made order-free), ties broken by doc_id, so the
    per-cluster argmax cannot flip between engines.

    Scale shape: cluster labels are |clustered docs| rows; the quality
    feature is computed AFTER the doc_id equi-join, so token splitting
    touches only clustered documents, not the corpus; the final pick is
    one window over cluster_id — every stage is keyed, nothing
    quadratic beyond the already-banded pair detection.
    """
    labels = REGISTRY["dedup_clusters"].fn(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = labels.join(d, "doc_id").withColumn(
        "q_ppm",
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' '))"
        ),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q_ppm").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("doc_id").alias("kept_doc"),
            F.col("q_ppm").cast("long").alias("kept_q_ppm"),
            (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
        )
    )


def _deletion_variants(name_col: str):
    """D1 deletion neighborhood of a string column: {s} + {s minus one
    char} — the ONE definition shared by the production
    ``fuzzy_match_names`` join and ``eval_fuzzy_blocking`` (r10 review:
    the eval carried a verbatim copy of the expression it exists to
    measure; silent drift would defeat its completeness certificate)."""
    return F.array_union(
        F.array(F.col(name_col)),
        F.expr(
            f"transform(sequence(1, length({name_col})),"
            f" i -> concat(substring({name_col}, 1, i - 1),"
            f"             substring({name_col}, i + 1, length({name_col}))))"
        ),
    )


@register(
    "fuzzy_match_names",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: customer-name pairs within edit distance 1,
    found via a DELETION-NEIGHBORHOOD equi-join rather than a per-block
    quadratic (r8 rewrite; was nation-blocked all-pairs at 14 s/sf0.1 —
    now ~1 s and linear in rows): two strings at Levenshtein distance
    <= 1 always share a member of D1(s) = {s} ∪ {s minus one char}
    (substitution: delete the differing position from both; indel: the
    shorter string IS a deletion of the longer), so exploding each name
    into its |name|+1 deletion variants and hash-joining on
    (nation, variant) generates every true pair as a candidate — an
    O(n·len) equi-join, no block quadratic. D1 overlap can also admit
    distance-2 pairs (e.g. transposed adjacent chars), so candidates are
    verified with one levenshtein per DISTINCT pair — the banded-join +
    verify-candidates-only posture every near-dup family here uses.

    At 100 TB: variant explosion is scan-local (×(len+1) keys), the one
    shuffle is the variant hash join, and verification touches only
    candidate pairs. The old blocking form degrades with block size;
    this one is insensitive to it (a 10× nation keeps the same per-key
    collision profile).
    """
    c = load_table(spark, sf_dir, "customer")
    variants = _deletion_variants("c_name")
    # r12: spread the projection (the x(len+1) deletion-variant explode
    # otherwise fuses into the single-task customer scan — tables.spread)
    # and pin the variant table: BOTH self-join sides read it, so
    # unpinned the explode ran twice per job
    v = spread(
        c.select("c_custkey", "c_name", "c_nationkey"), "c_custkey"
    ).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
        F.explode(variants).alias("vkey"),
    ).localCheckpoint(eager=False)
    a = v.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "nk", "vkey"
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "nk", "vkey"
    )
    cand = (
        a.join(b, ["nk", "vkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "name_a", "name_b", F.col("dist").cast("int"))
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup dedup (the fourth mandated detector family)
# --------------------------------------------------------------------------

def _emb_dedup_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import PAIR_TAU, _duck_dot

    return f"""
WITH dups AS (
    SELECT DISTINCT b.vec_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_duck_dot('a.embedding', 'b.embedding')} >= {PAIR_TAU}
)
SELECT d.doc_id, d.lang, e.label
FROM embeddings e
JOIN documents d ON e.vec_id = d.doc_id
WHERE e.vec_id NOT IN (SELECT vec_id FROM dups)
"""


@register("dedup_near_embedding", oracle=_emb_dedup_oracle())
def dedup_near_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate dedup: keep each document whose
    embedding has NO earlier (smaller-id) neighbor with cosine >= tau.

    Deterministic "leader by id" rule: any vector with an earlier
    tau-neighbor is dropped. This is order-independent and
    SQL-expressible (NOT EXISTS), unlike greedy streaming dedup whose
    keep-set depends on scan order; full transitive clustering is
    ``dedup_clusters``. Candidate pairs come from the DISTRIBUTED tiled
    block-GEMM kernel (``knn_threshold_gemm`` ->
    ``similarity.gemm_pairs_tiled``): no driver collect, no cartesian
    product — blocks meet in tiles, one BLAS matmul each, then a
    distinct + anti-join on the dup ids.

    Scale posture (100 TB): the tile kernel is exact and distributed
    (raise B so a block fits a task); the LSH bucket join
    (``knn_ann_lsh``) would cut candidates below n^2 but is approximate
    (~0.5 pair recall at this tau with 8x6-bit tables), so it cannot
    reproduce the exact oracle — it's the documented recall-traded
    alternative, not the default. The distinct/anti-join tail shuffles
    only dup ids (<= n rows), never embeddings.
    """
    from bangdatapipeline_spark.operators.similarity import knn_threshold_gemm

    pairs = knn_threshold_gemm(spark, sf_dir)
    dups = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    return (
        e.join(dups, "vec_id", "left_anti")
        .join(d, F.col("vec_id") == F.col("doc_id"))
        .select("doc_id", "lang", "label")
    )


# --- containment (asymmetric Jaccard) ---------------------------------------

CONTAIN_TAU = 0.5  # emit pairs where either direction's containment >= tau
CONTAIN_DF_CAP = 50  # "stop shingles": drop shingles present in > cap docs


@register(
    "dedup_containment",
    oracle=f"""
WITH hs AS ({DUCK_HASHED_CTE}),
x AS (SELECT DISTINCT doc_id, unnest(hs) AS h FROM hs),
keep AS (SELECT h FROM x GROUP BY h HAVING count(*) <= {CONTAIN_DF_CAP}),
xk AS (SELECT x.doc_id, x.h FROM x JOIN keep USING (h)),
sz AS (SELECT doc_id, count(*) AS n FROM xk GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM xk a JOIN xk b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id_a, p.id_b, p.inter,
       floor(p.inter * 1.0 / sa.n * 10000 + 0.5) / 10000 AS contain_a,
       floor(p.inter * 1.0 / sb.n * 10000 + 0.5) / 10000 AS contain_b
FROM pairs p
JOIN sz sa ON p.id_a = sa.doc_id
JOIN sz sb ON p.id_b = sb.doc_id
WHERE p.inter * 1.0 / sa.n >= {CONTAIN_TAU}
   OR p.inter * 1.0 / sb.n >= {CONTAIN_TAU}
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (asymmetric Jaccard) detection: |A∩B| / |A| per
    direction — catches quote-expansion near-dups where a short document
    is embedded in a longer one, which symmetric Jaccard under-scores
    (the union in the denominator is dominated by the longer side).

    Candidates come from the hashed-shingle equi-join, never all pairs,
    with a document-frequency cap first: shingles present in more than
    {CONTAIN_DF_CAP} documents are dropped before the self-join (the
    standard "stop shingle" guard — a boilerplate shingle shared by k
    docs would otherwise generate k^2 join rows). At 100 TB the DF cap
    is what keeps the candidate join linear-ish; the int shingle keys
    (8 bytes) are the only thing shuffled.
    """
    x = (
        _hashed_shingles(spark, sf_dir)
        .select("doc_id", F.explode("hs").alias("h"))
        # r13 measured-and-rejected: repartition(defaultParallelism, h)
        # before the distinct (§2.4 co-partitioning) — ABBA a wash
        # (cold 2.98 -> 3.11, warm 1.74 -> 1.68): every downstream join
        # here is a broadcast hash join, so the pre-partitioning buys
        # nothing; the distinct's own exchange already parallelizes the
        # explode.
        .distinct()
        # r12: x feeds TWO subtrees (the DF-cap build and the xk join
        # probe) — unpinned, the explode + distinct shuffle ran twice
        # per run on top of the cached shingle table. Same .cache()
        # posture as xk below.
        .cache()
    )
    keep = x.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= CONTAIN_DF_CAP
    )
    # df-capped (doc, shingle) pairs feed THREE consumers (sizes + both
    # join sides) — pinned so the explode/distinct/cap lineage runs once
    # (same posture as the cached MinHash shingle table it derives from)
    xk = x.join(keep.select("h"), "h").cache()
    sz = xk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = xk.select(F.col("doc_id").alias("id_a"), "h")
    b = xk.select(F.col("doc_id").alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    ca = F.col("inter") / F.col("na")
    cb = F.col("inter") / F.col("nb")
    # per-doc size table is n rows — let AQE pick broadcast vs shuffle
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter((ca >= CONTAIN_TAU) | (cb >= CONTAIN_TAU))
        # floor(x*1e4+0.5)/1e4, not F.round: small-denominator ratios
        # (1/160 = 0.00625) land on decimal halves whose nearest double
        # sits below — see docs/dialect_notes.md "shortest decimal repr"
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.floor(ca * 10000 + 0.5) / 10000).alias("contain_a"),
            (F.floor(cb * 10000 + 0.5) / 10000).alias("contain_b"),
        )
    )


def _dedup_recall_oracle() -> str:
    """Composes the two registered component oracles (both are defined
    above in this module, so REGISTRY already holds them)."""
    truth = REGISTRY["dedup_near_jaccard"].oracle
    sys_o = REGISTRY["dedup_near_minhash"].oracle
    return f"""
WITH truth AS ({truth}),
sys_all AS ({sys_o}),
sys AS (SELECT id_a, id_b FROM sys_all WHERE id_b < {EXACT_BOUND}),
tp AS (
  SELECT count(*) AS n
  FROM truth t JOIN sys s ON t.id_a = s.id_a AND t.id_b = s.id_b
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth)  AS n_truth,
       (SELECT CAST(count(*) AS BIGINT) FROM sys)    AS n_sys,
       (SELECT CAST(n AS BIGINT) FROM tp)            AS n_tp,
       floor((SELECT n FROM tp) * 1.0
             / nullif((SELECT count(*) FROM sys), 0) * 10000 + 0.5) / 10000
                                                      AS precision_b,
       floor((SELECT n FROM tp) * 1.0
             / nullif((SELECT count(*) FROM truth), 0) * 10000 + 0.5) / 10000
                                                      AS recall_b
"""


@register("eval_dedup_recall", oracle=_dedup_recall_oracle())
def eval_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-detector evaluation: precision/recall of the MinHash+LSH
    pair detector against the bounded exact-Jaccard ground truth — the
    acceptance gate before an approximate dedup replaces an exact one
    (the same role ``eval_rank_metrics`` plays for ANN retrieval).

    Composes the two REGISTERED plans; the system side restricts to the
    ground truth's id bound so the two pair sets are comparable. All
    metric arithmetic happens on three scalar counters crossJoined as
    lazy 1-row broadcasts; ratios take the IEEE floor-round (small
    denominators, docs/dialect_notes.md).
    """
    # Both pair tables are tiny (hundreds of rows) but their lineages are
    # the full quadratic baseline / LSH pipeline; each feeds TWO
    # consumers (the tp join and its own counter) — pinned so each heavy
    # lineage computes once (the eval_rank_metrics pattern).
    truth = dedup_near_jaccard(spark, sf_dir).select("id_a", "id_b").cache()
    sys_p = (
        dedup_near_minhash(spark, sf_dir)
        .select("id_a", "id_b")
        .filter(F.col("id_b") < EXACT_BOUND)
        .cache()
    )
    tp = truth.join(sys_p, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_tp"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_sys = sys_p.agg(F.count(F.lit(1)).alias("n_sys"))
    j = n_truth.crossJoin(n_sys).crossJoin(tp)
    prec = F.col("n_tp") * 1.0 / F.nullif(F.col("n_sys"), F.lit(0))
    rec = F.col("n_tp") * 1.0 / F.nullif(F.col("n_truth"), F.lit(0))
    return j.select(
        "n_truth",
        "n_sys",
        "n_tp",
        (F.floor(prec * 10000 + 0.5) / 10000).alias("precision_b"),
        (F.floor(rec * 10000 + 0.5) / 10000).alias("recall_b"),
    )


@register(
    "dedup_incremental_minhash",
    oracle=f"""
WITH hashed AS (
{DUCK_HASHED_CTE}
), sig AS (
    SELECT doc_id, hs, {_duck_minhash_sig()} AS sig FROM hashed
), bexp AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(0, {BANDS - 1}),
               g -> g || ':' || array_to_string(
                   list_slice(sig, g * {ROWS_PER_BAND} + 1, g * {ROWS_PER_BAND} + {ROWS_PER_BAND}), ','))) AS key
    FROM sig
), cand AS (
    SELECT DISTINCT d.doc_id AS id_new, b.doc_id AS id_base
    FROM bexp d JOIN bexp b ON b.key = d.key
    WHERE d.doc_id % 4 = 0 AND b.doc_id % 4 <> 0
), verified AS (
    SELECT c.id_new
    FROM cand c
    JOIN hashed ha ON ha.doc_id = c.id_new
    JOIN hashed hb ON hb.doc_id = c.id_base
    WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
          / len(list_distinct(ha.hs || hb.hs)) >= {JACCARD_TAU}
), counts AS (
    SELECT id_new, CAST(count(*) AS BIGINT) AS n_dups FROM verified GROUP BY 1
)
SELECT h.doc_id, coalesce(c.n_dups, 0) AS n_dups, c.id_new IS NULL AS kept
FROM hashed h LEFT JOIN counts c ON c.id_new = h.doc_id
WHERE h.doc_id % 4 = 0
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup: screen a DELTA batch of documents
    (doc_id % 4 == 0) against the already-curated BASE corpus — the
    production shape for a continuously-fed training corpus, where
    re-pairing the base with itself on every drop would be quadratic
    in corpus age. Only delta band keys probe the base band table, so
    the candidate join is |delta| x collision-rate — base x base pairs
    never form. Candidates are exact-verified (same hashed-shingle
    Jaccard >= tau as ``dedup_near_minhash``); output is the per-delta-doc
    audit: verified base-duplicate count and the keep decision.

    At 100 TB the base band table is a bucketed, persisted artifact
    (written once per epoch by the batch dedup); each delta batch
    shuffles only its own (key, id) pairs into the probe — the dedup
    sibling of ``incremental_agg_merge``'s state-not-facts rule.
    """
    hashed = _hashed_shingles(spark, sf_dir).cache()
    sig = hashed.withColumn("sig", F.expr(_minhash_sig_expr()))
    bexp = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {BANDS - 1}), g -> concat(g, ':', "
                f"concat_ws(',', slice(sig, g * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}))))"
            )
        ).alias("key"),
        # r12: bexp feeds BOTH probe sides (delta + base) — pinned for
        # the same reason as dedup_near_minhash's band table above
        # (.cache() for plan-identity friendliness, same note).
        # r13 measured-and-rejected: band-key repartition before this
        # cache — same result as dedup_near_minhash above (ABBA cold
        # 1.45 -> 1.91 s; the probe joins broadcast, so the exchange is
        # pure cost).
    ).cache()
    delta_b = bexp.filter(F.col("doc_id") % 4 == 0).select(
        "key", F.col("doc_id").alias("id_new")
    )
    base_b = bexp.filter(F.col("doc_id") % 4 != 0).select(
        "key", F.col("doc_id").alias("id_base")
    )
    cand = delta_b.join(base_b, "key").select("id_new", "id_base").distinct()
    verified = (
        cand.join(
            hashed.select(F.col("doc_id").alias("id_new"), F.col("hs").alias("sa")),
            "id_new",
        )
        .join(
            hashed.select(F.col("doc_id").alias("id_base"), F.col("hs").alias("sb")),
            "id_base",
        )
        .filter(F.expr(_JACCARD_SPARK) >= JACCARD_TAU)
        .groupBy("id_new")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )
    delta_docs = hashed.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    return delta_docs.join(
        verified.withColumnRenamed("id_new", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
        F.col("n_dups").isNull().alias("kept"),
    )


# --------------------------------------------------------------------------
# Cross-document exact shared spans (substring-level dedup)
# --------------------------------------------------------------------------

SPAN_N = 8          # n-gram width for positional shingles
SPAN_DF_CAP = 10    # stop-shingles: drop n-grams in more than this many docs
SPAN_MIN_TOKENS = 12  # report pairs sharing a verbatim run of >= this many tokens

_NGRAM_POS_UDF = None


def ngram_hashes_positional(col):
    """array<string> words -> array<bigint> POSITIONAL n-gram hashes
    (index i = hash of words[i..i+SPAN_N-1]; NOT distinct — order and
    position carry the signal). Same integer lattice as the 3-shingle
    kernel, folded over SPAN_N words: h = fold((h*SH_MIX + wh) % P).
    Max intermediate = (P-1)*SH_MIX + (P-1) ≈ 2.1e15 << 2^63 — exact."""
    global _NGRAM_POS_UDF
    if _NGRAM_POS_UDF is None:

        @F.pandas_udf("array<bigint>")
        def _ng(ws: pd.Series) -> pd.Series:
            lists = ws.tolist()
            flat = [w for lst in lists for w in lst]
            h = _hash_words_np(flat)
            out, pos = [], 0
            for lst in lists:
                n = len(lst)
                wh = h[pos : pos + n]
                pos += n
                if n < SPAN_N:
                    out.append([])
                    continue
                acc = wh[: n - SPAN_N + 1].copy()
                for k in range(1, SPAN_N):
                    acc = (acc * SH_MIX + wh[k : n - SPAN_N + 1 + k]) % P
                out.append(acc.tolist())
            return pd.Series(out, dtype=object)

        _NGRAM_POS_UDF = _ng
    return _NGRAM_POS_UDF(col)


def _duck_ngram_fold() -> str:
    """DuckDB spelling of the positional SPAN_N-gram hash at index i
    (1-based): the same left fold over SPAN_N word hashes."""
    expr = "wh[i]"
    for k in range(1, SPAN_N):
        expr = f"(({expr}) * {SH_MIX} + wh[i+{k}]) % {P}"
    return expr


def _shared_spans_oracle() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, list_transform(string_split(text, ' '),
                                w -> {DUCK_STRHASH.format(s='w')}) AS wh
  FROM documents WHERE len(string_split(text, ' ')) >= {SPAN_N}
),
g AS (
  SELECT doc_id, i AS pos, {_duck_ngram_fold()} AS h
  FROM base, unnest(generate_series(1, len(wh) - {SPAN_N - 1})) AS t(i)
),
keep AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) <= {SPAN_DF_CAP}),
gk AS (SELECT g.* FROM g JOIN keep USING (h)),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos AS pos_a, a.pos - b.pos AS diag
  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, diag,
         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                    ORDER BY pos_a) AS grp,
         pos_a
  FROM pr
),
spans AS (
  SELECT doc_a, doc_b, CAST(count(*) + {SPAN_N - 1} AS BIGINT) AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b,
       CAST(max(span_tokens) AS BIGINT) AS longest_span,
       CAST(count(*) AS BIGINT)         AS n_runs
FROM spans
GROUP BY doc_a, doc_b
HAVING max(span_tokens) >= {SPAN_MIN_TOKENS}
"""


@register("dedup_shared_spans", oracle=_shared_spans_oracle())
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT shared spans — substring-level duplication
    (the train-set analogue of Lee et al.'s exact-substring dedup): for
    every document pair, the longest run of verbatim-identical tokens of
    length >= {SPAN_MIN_TOKENS}, plus how many such maximal runs exist.
    Doc-level detectors (MinHash, containment) miss a long quote inside
    two otherwise-different documents; this catches exactly that.

    Mechanics: positional {SPAN_N}-gram hashes (one Arrow kernel pass,
    integer lattice — no text leaves the scan); a df-capped equi-join on
    the hash yields match coordinates (pos_a, pos_b); matches on one
    DIAGONAL (pos_a - pos_b constant) that are consecutive in pos_a form
    a shared run, recovered with the gap-islands trick (pos_a minus its
    rank along the diagonal is constant within a run) — no per-pair
    alignment ever materializes, just a groupBy over match coordinates.

    Scale: the only quadratic hazard is a shingle shared by many docs —
    capped at df <= {SPAN_DF_CAP} (the standard stop-shingle guard; a
    boilerplate header in k docs would otherwise join k^2). Everything
    shuffled is (hash, doc, pos) ints; runs aggregate with map-side
    combine on (pair, diag, grp) keys.
    """
    d = load_table(spark, sf_dir, "documents")
    # r12: spread the projection — tokenize + the positional-hash Arrow
    # kernel + posexplode otherwise fuse into the single-task documents
    # scan stage (tables.spread); the pinned cache below then holds a
    # parallel layout too
    ws = spread(d.select("doc_id", "text"), "doc_id").withColumn(
        "ws", F.split("text", " ")
    ).filter(F.size("ws") >= SPAN_N)
    # r13 (guide §2.4): the pin is hash-partitioned by h BEFORE caching —
    # every consumer below is keyed on h (the df-cap groupBy, the keep
    # join, BOTH self-join sides), so with the cache already laid out on
    # h they all run partition-local: three |g|-row exchanges per run
    # collapse into the one build-time exchange the cache pays once.
    n_h = max(8, spark.sparkContext.defaultParallelism)
    g = (
        ws.select(
            "doc_id",
            F.posexplode(ngram_hashes_positional(F.col("ws"))).alias("pos0", "h"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
        .repartition(n_h, "h")
        .cache()
    )
    # ^ pinned: g feeds the df-cap aggregate and BOTH self-join sides —
    # uncached, the positional n-gram Arrow kernel over the full corpus
    # runs at least twice per job (r10 review; dedup_containment pins the
    # same shape with xk.cache())
    keep = g.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    ).filter(F.col("df") <= SPAN_DF_CAP).select("h")
    gk = g.join(keep, "h")
    a = gk.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h")
    b = gk.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "h")
    pr = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = pr.withColumn("grp", F.col("pos_a") - F.row_number().over(wd))
    spans = runs.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        (F.count(F.lit(1)) + (SPAN_N - 1)).cast("bigint").alias("span_tokens")
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_tokens").cast("bigint").alias("longest_span"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        )
        .filter(F.col("longest_span") >= SPAN_MIN_TOKENS)
    )


@register(
    "text_shingle_novelty",
    oracle=f"""
WITH hashed AS (
{DUCK_HASHED_CTE}
), ex AS (
    SELECT doc_id, unnest(hs) AS h FROM hashed
), firsts AS (
    SELECT h, min(doc_id) AS first_doc FROM ex GROUP BY h
)
SELECT e.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE f.first_doc = e.doc_id) AS BIGINT)
         AS n_novel,
       (count(*) FILTER (WHERE f.first_doc = e.doc_id) * 1000000)
         // count(*) AS novelty_ppm
FROM ex e JOIN firsts f ON f.h = e.h
GROUP BY e.doc_id
""",
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus-novelty contribution: a shingle is NOVEL in
    the document with the smallest doc_id that contains it (ingest
    order); novelty_ppm = novel-shingle share of the doc's distinct
    shingles. The curation signal behind "what does this document add":
    near-dups and boilerplate score ~0, first occurrences score high —
    the incremental counterpart of pairwise dedup, and the greedy
    approximation of a doc's marginal n-gram coverage.

    Reuses the cached hashed-shingle table (same Arrow word-hash kernel
    as the MinHash family); the plan is explode -> groupBy(shingle) min
    -> rejoin on shingle -> groupBy(doc). Both shuffles key on the
    shingle hash (uniform by construction) and doc_id; nothing pairwise
    ever forms, so this scales exactly like exact dedup does. Integer
    ppm, no float hazard.
    """
    # .cache(): `ex` feeds the firsts aggregate AND the rejoin probe —
    # without the pin the Arrow word-hash kernel (the dominant cost) runs
    # twice in one job (r10 review; the same pin its siblings carry). The
    # plan-equal cache entry is shared with dedup_near_minhash's when both
    # run in one session.
    hashed = _hashed_shingles(spark, sf_dir).cache()
    ex = hashed.select("doc_id", F.explode("hs").alias("h"))
    firsts = ex.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
            F.expr(
                "sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            ).alias("novelty_ppm"),
        )
    )


_FUZZY_EVAL_BOUND = 2000  # custkey bound for the exact all-pairs ground truth


@register(
    "eval_fuzzy_blocking",
    oracle=f"""
WITH c AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk
  FROM customer WHERE c_custkey < {_FUZZY_EVAL_BOUND}
),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM c a JOIN c b ON a.nk = b.nk AND a.id < b.id
  WHERE levenshtein(a.name, b.name) <= 1
),
v AS (
  SELECT id, nk, unnest(list_distinct(list_append(
           [name[1:i-1] || name[i+1:] FOR i IN range(1, length(name) + 1)],
           name))) AS vkey
  FROM c
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.nk = b.nk AND a.vkey = b.vkey AND a.id < b.id
),
hit AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM cand)  AS BIGINT) AS n_cand,
       CAST((SELECT count(*) FROM hit)   AS BIGINT) AS n_hit,
       CAST((SELECT count(*) FROM hit) * 1000000
            // (SELECT count(*) FROM truth) AS BIGINT)  AS recall_ppm,
       CAST((SELECT count(*) FROM hit) * 1000000
            // (SELECT count(*) FROM cand) AS BIGINT)   AS precision_ppm
""",
)
def eval_fuzzy_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation quality of the deletion-neighborhood join
    behind ``fuzzy_match_names``, measured against bounded exact ground
    truth (all nation-blocked pairs at Levenshtein <= 1, custkey <
    _FUZZY_EVAL_BOUND = 2000): recall MUST be 1,000,000 ppm — D1 overlap is a complete
    certificate for distance <= 1, so a single missed pair is a bug,
    not a tuning knob — while precision quantifies how many candidates
    the verify step pays for (D1 overlap admits some distance-2 pairs,
    e.g. adjacent transpositions). Same measured-not-asserted posture
    as eval_dedup_recall: the detector's completeness claim ships with
    the number that proves it.

    Plan: ground truth is the bounded quadratic (the eval's cost cap);
    the candidate side is the production equi-join restricted to the
    same bound; metrics are three counts + two exact integer ratios.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < _FUZZY_EVAL_BOUND
    ).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    a = c.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"), "nk")
    b = c.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"), "nk")
    truth = (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("id_a", "id_b")
        .cache()  # feeds intersect AND n_true — quadratic lineage, once
    )
    variants = _deletion_variants("name")
    v = c.select("id", "nk", F.explode(variants).alias("vkey"))
    va = v.select(F.col("id").alias("id_a"), "nk", "vkey")
    vb = v.select(F.col("id").alias("id_b"), "nk", "vkey")
    cand = (
        va.join(vb, ["nk", "vkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .cache()  # feeds intersect AND n_cand (r10 review)
    )
    hit = cand.intersect(truth)
    n_true = truth.count()
    n_cand = cand.count()
    n_hit = hit.count()
    rows = [
        (
            n_true,
            n_cand,
            n_hit,
            n_hit * 1000000 // n_true if n_true else None,
            n_hit * 1000000 // n_cand if n_cand else None,
        )
    ]
    return spark.createDataFrame(
        rows, "n_true bigint, n_cand bigint, n_hit bigint,"
        " recall_ppm bigint, precision_ppm bigint"
    )
