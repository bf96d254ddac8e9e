"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §2.10).

The reference is a pandas ETL client for experiment text (chat logs, free-text
survey answers); these operators generalize its text handling to the scale a
training-data pipeline needs: per-corpus stats, term frequencies, token
counting, quality scoring, language ID, and content fingerprinting — all on
the `documents` table.

Scale posture (100 TB): every operator is a pure DataFrame pipeline —
tokenize with built-in `split`/`explode` (JVM-side, whole-stage codegen),
aggregate with map-side partial aggregation, never collect. The only
shuffles are the groupBys on (lang) / (lang, token) / (doc pair); token is a
high-cardinality well-distributed key, so no salting is needed. Language-ID
profiles are tiny (|langs| × |vocab|) and broadcast automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bangdatapipeline_spark.registry import register
from bangdatapipeline_spark.tables import load_table, spread

# BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
# non-alnum-non-space symbols (the GPT-2 pre-tokenizer family, simplified).
TOKEN_RE = r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a")


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.split("text", " "))


@register(
    "text_stats",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT)                                  AS n_docs,
       CAST(sum(n_chars) AS BIGINT)                              AS total_chars,
       floor(avg(n_chars) * 10000 + 0.5) / 10000                 AS avg_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT)         AS total_words,
       floor(avg(len(string_split(text, ' '))) * 10000 + 0.5)
         / 10000                                                 AS avg_words
FROM documents
GROUP BY lang
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc counts, char and word totals/averages."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    return (
        d.withColumn("n_words", F.size("toks"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            # floor-lattice, not round(): avg(int)/n terminating
            # rationals can sit on a half where the engines' round()
            # disagree (docs/dialect_notes.md)
            (F.floor(F.avg("n_chars") * 10000 + F.lit(0.5)) / 10000).alias(
                "avg_chars"
            ),
            F.sum("n_words").cast("bigint").alias("total_words"),
            (F.floor(F.avg("n_words") * 10000 + F.lit(0.5)) / 10000).alias(
                "avg_words"
            ),
        )
    )


@register(
    "text_tf",
    oracle="""
WITH tf AS (
    SELECT lang, unnest(string_split(text, ' ')) AS token
    FROM documents
), counted AS (
    SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
    FROM tf GROUP BY lang, token
)
SELECT lang, token, cnt,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS INT) AS rk
FROM counted
QUALIFY rk <= 10
""",
)
def text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency: top-10 tokens per language (count desc, token asc
    tie-break so the top-k set is deterministic)."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    counted = (
        d.select("lang", F.explode("toks").alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 10)
    )


@register(
    "text_tokens",
    oracle=rf"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT)                  AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INT)   AS re_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT)   AS uniq_tokens,
       round((n_chars - len(string_split(text, ' ')) + 1.0)
             / len(string_split(text, ' ')), 6)                   AS avg_tok_len
FROM documents
""",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split and a BPE-ish regex
    pre-tokenizer — plus distinct-token count and mean token length."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    n_words = F.size("toks")
    return d.select(
        "doc_id",
        n_words.cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0)))
        .cast("int")
        .alias("re_tokens"),
        F.size(F.array_distinct("toks")).cast("int").alias("uniq_tokens"),
        F.round((F.col("n_chars") - n_words + F.lit(1.0)) / n_words, 6).alias(
            "avg_tok_len"
        ),
    )


@register(
    "text_quality",
    oracle=f"""
WITH feats AS (
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' '))                          AS n_words,
           len(list_distinct(string_split(text, ' ')))           AS n_uniq,
           len(list_filter(string_split(text, ' '),
                           t -> t IN {STOPWORDS!r}))             AS n_stop
    FROM documents
)
SELECT doc_id, lang,
       CAST(n_words AS INT)                                      AS n_words,
       round(CAST(n_uniq AS DOUBLE) / n_words, 6)                AS uniq_ratio,
       round(CAST(n_stop AS DOUBLE) / n_words, 6)                AS stop_ratio,
       round((n_chars - n_words + 1.0) / n_words, 6)             AS avg_word_len,
       CASE WHEN n_words BETWEEN 20 AND 90
             AND CAST(n_uniq AS DOUBLE) / n_words >= 0.3
            THEN 'keep' ELSE 'drop' END                          AS quality
FROM feats
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length band, lexical diversity, stopword
    ratio → keep/drop verdict (the filter stage of a pretraining pipeline)."""
    d = _tokens(load_table(spark, sf_dir, "documents"))
    n_words = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(toks, t -> t IN ({stop_list}))"))
    return d.select(
        "doc_id",
        "lang",
        n_words.cast("int").alias("n_words"),
        F.round(n_uniq.cast("double") / n_words, 6).alias("uniq_ratio"),
        F.round(n_stop.cast("double") / n_words, 6).alias("stop_ratio"),
        F.round((F.col("n_chars") - n_words + F.lit(1.0)) / n_words, 6).alias(
            "avg_word_len"
        ),
        F.when(
            n_words.between(20, 90) & (n_uniq.cast("double") / n_words >= 0.3),
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("quality"),
    )


@register(
    "text_langid",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
    SELECT DISTINCT tok FROM toks
), langs AS (
    SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs FROM documents GROUP BY lang
), grid AS (
    SELECT l.lang, v.tok, l.n_docs FROM langs l CROSS JOIN vocab v
), cnts AS (
    SELECT lang, tok, CAST(count(*) AS DOUBLE) AS cnt FROM toks GROUP BY lang, tok
), profile AS (
    SELECT g.lang, g.tok,
           coalesce(c.cnt, 0) + 1.0 AS smoothed
    FROM grid g LEFT JOIN cnts c ON g.lang = c.lang AND g.tok = c.tok
), totals AS (
    SELECT lang, sum(smoothed) AS tot FROM profile GROUP BY lang
), scored AS (
    SELECT t.doc_id, p.lang,
           sum(ln(p.smoothed / tt.tot)) + any_value(ln(l.n_docs)) AS score
    FROM toks t
    JOIN profile p ON t.tok = p.tok
    JOIN totals tt ON p.lang = tt.lang
    JOIN langs l ON p.lang = l.lang
    GROUP BY t.doc_id, p.lang
)
SELECT doc_id, lang AS pred_lang, round(score, 6) AS score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY round(score, 6) DESC, lang ASC) = 1
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by corpus-learned token profiles: a naive-Bayes unigram
    classifier (Laplace-smoothed token likelihood per language + log prior),
    argmax per document with a deterministic language tie-break.

    Scale: the profile table is |langs| x |vocab| — VOCABULARY-sized,
    not constant-sized — so the scoring join is left UNHINTED and AQE
    broadcasts it only while its runtime stats fit (r10 review: a forced
    broadcast hint would collect a multi-million-token-vocab profile to
    the driver at 100 TB instead of degrading to a shuffle join — the
    same posture text_surprisal documents). The only big shuffle is the
    per-(doc, lang) aggregation, keyed on doc_id (dense, unskewed).
    """
    d = load_table(spark, sf_dir, "documents")
    # r12 measured-and-rejected, twice: (1) PINNING the token stream
    # (three subtrees read it) made warm runs 1.51 -> 2.52 s med — the
    # text_surprisal trap: the redundant tokenize branches execute
    # CONCURRENTLY on otherwise-idle cores, while a pin serializes the
    # chain through a materialization on the critical path. (2) The
    # spread-only variant measured a wash-to-regression in an ABBA probe
    # (1.54 -> 1.97 s med adjacent sessions) — a plain explode over 5k
    # docs is below the exchange-amortization threshold (the
    # ml_naive_bayes rejection note). Left as the plain fused explode.
    toks = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.select("tok").distinct()
    langs = d.groupBy("lang").agg(F.count("*").cast("double").alias("n_docs"))
    grid = langs.crossJoin(vocab)
    cnts = toks.groupBy("lang", "tok").agg(F.count("*").cast("double").alias("cnt"))
    profile = grid.join(cnts, ["lang", "tok"], "left").select(
        "lang", "tok", "n_docs", (F.coalesce("cnt", F.lit(0.0)) + 1.0).alias("smoothed")
    )
    totals = profile.groupBy("lang").agg(F.sum("smoothed").alias("tot"))
    profile = profile.join(totals, "lang")
    scored = (
        toks.drop("lang")
        .join(profile, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum(F.log(F.col("smoothed") / F.col("tot")))
                + F.any_value(F.log("n_docs"))
            ).alias("score")
        )
    )
    # PRE-ROUNDED ranking key (the text_bm25 discipline, r9 review): the
    # raw score is a shuffle-order-dependent float sum of logs, so the
    # argmax must compare on the same 6-dp lattice both engines emit —
    # a raw-float ORDER BY can flip pred_lang on near-tied languages.
    scored = scored.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )


# Portable rolling hash (both engines fold left-to-right over int64, so the
# results are bit-identical): acc = (acc*31 + ascii(char)) mod (2^31 - 1).
_HASH_MOD = 2147483647


@register(
    "text_fingerprint",
    oracle=f"""
WITH fp AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, length(text)),
                                  i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % {_HASH_MOD}) AS fp
    FROM documents
)
SELECT doc_id, fp,
       CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS dup_count
FROM fp
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: a polynomial rolling hash over the full text
    (portable across engines — pure int64 arithmetic), plus the count of
    documents sharing each fingerprint (exact-duplicate cluster size; sf0.1
    contains 8 exact duplicate texts).

    Scale: the hash is a per-row projection (no shuffle); the dup_count
    window shuffles on fp, which is uniform by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.expr(
            "aggregate(sequence(1, length(text)), CAST(0 AS BIGINT), "
            f"(acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % {_HASH_MOD})"
        ).alias("fp"),
    )
    return fp.withColumn(
        "dup_count", F.count("*").over(Window.partitionBy("fp")).cast("bigint")
    )


@register(
    "text_tfidf",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), n AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf,
           tf.tf * ln(n.n_docs / df.df) AS tfidf
    FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, round(tfidf, 6) AS tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY round(tfidf, 6) DESC, tok ASC) AS INT) AS rk
FROM scored
WHERE doc_id < 50
QUALIFY rk <= 5
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-5 terms per document (bounded to doc_id < 50 for
    the materialized output; the scoring pipeline itself is corpus-wide).

    Scale: tf shuffles on (doc_id, tok); the document-frequency table and
    the 1-row corpus count broadcast back into the scoring join — the
    classic two-aggregation + broadcast-enrich shape.
    """
    d = load_table(spark, sf_dir, "documents")
    # r12 measured-and-rejected: spreading the tokenize projection made
    # warm runs 0.69-0.97 -> 1.57-1.89 s med in an ABBA probe — a plain
    # explode below the exchange-amortization threshold (ml_naive_bayes
    # rejection note); the (doc_id, tok) groupBy right after shuffles
    # anyway, so the spread exchange is a pure extra hop.
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    ndocs = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "tok",
            "tf",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf_raw"),
        )
    )
    # PRE-ROUNDED ranking key (r9 review): equal-in-exact-math scores
    # from different (tf, df) pairs — e.g. 2*ln(10) vs ln(100) — land a
    # ulp apart in engine-specific directions; ranking on the emitted
    # 6-dp lattice keeps the top-5 cut identical on both engines.
    scored = scored.withColumn("tfidf", F.round("tfidf_raw", 6))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.filter(F.col("doc_id") < 50)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "tok", "tf", "tfidf", "rk")
    )


@register(
    "pipeline_e2e",
    oracle="""
WITH feats AS (
    SELECT doc_id, lang, n_chars, text,
           len(string_split(text, ' '))                AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_uniq
    FROM documents
), kept AS (
    SELECT * FROM feats
    WHERE n_words BETWEEN 20 AND 90
      AND CAST(n_uniq AS DOUBLE) / n_words >= 0.3
), uniq AS (
    SELECT * FROM kept
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
)
SELECT lang,
       CAST(count(*) AS BIGINT)                         AS n_docs,
       CAST(sum(n_words) AS BIGINT)                     AS total_tokens,
       floor(avg(n_chars) * 100 + 0.5) / 100            AS avg_chars,
       floor(avg(CAST(n_uniq AS DOUBLE) / n_words) * 1000000 + 0.5)
         / 1000000                                      AS avg_uniq_ratio
FROM uniq GROUP BY lang
""",
)
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end to end: quality filter (length band +
    lexical diversity) → exact content dedup (md5, keep-lowest-doc_id) →
    per-language corpus stats. One composed plan: the filter prunes before
    the dedup shuffle (the only shuffle on raw content hashes), and the
    final agg is partial→final on `lang`.

    This is the composition story for the §2.10 operators — at 100 TB the
    near-dup stage (``dedup_near_minhash``) slots in after the exact stage
    with the same keep-lowest convention.
    """
    d = _tokens(load_table(spark, sf_dir, "documents"))
    n_words = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    kept = (
        d.withColumn("n_words", n_words)
        .withColumn("n_uniq", n_uniq)
        .filter(
            F.col("n_words").between(20, 90)
            & (F.col("n_uniq").cast("double") / F.col("n_words") >= 0.3)
        )
        # slim before the content-keyed window: the token array is spent
        # (n_words/n_uniq are materialized ints) and would otherwise ride
        # the md5 dedup exchange, ~doubling its payload (r10 review)
        .drop("toks")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = kept.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return uniq.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        # floor-lattice, not round(): avg(int)/n is a terminating
        # rational that can sit exactly on a .xx5 half — where Spark
        # (decimal HALF_UP) and DuckDB (binary value) disagree
        # (docs/dialect_notes.md); floor(x*10^k + 0.5) is the same IEEE
        # op chain on both engines
        (F.floor(F.avg("n_chars") * 100 + F.lit(0.5)) / 100).alias("avg_chars"),
        (
            F.floor(
                F.avg(F.col("n_uniq").cast("double") / F.col("n_words")) * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("avg_uniq_ratio"),
    )


@register(
    "pack_sequences",
    oracle="""
WITH t AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks
    FROM documents
), c AS (
    SELECT doc_id, lang, n_toks,
           coalesce(sum(n_toks) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
    FROM t
)
SELECT lang,
       CAST(floor(prev / 256) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT)          AS n_docs,
       CAST(sum(n_toks) AS BIGINT)       AS n_tokens,
       CAST(min(doc_id) AS BIGINT)       AS first_doc
FROM c GROUP BY lang, bin
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to contiguous ~256-token training bins
    per language via an exclusive prefix sum over token counts — the
    shuffle-once, state-free form of greedy packing (a doc may straddle a
    boundary; bins average the budget, which is what a packer that splits
    straddlers achieves exactly).

    At 100 TB: one window shuffle per partition key (lang), then the agg
    reuses the same partitioning — no second exchange. The iterative
    "never overflow" greedy is inherently sequential; this prefix-sum
    contract is the one that scales, and the oracle pins it.
    """
    d = _tokens(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = d.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_toks"),
    ).withColumn("prev", F.coalesce(F.sum("n_toks").over(w), F.lit(0)))
    return c.groupBy(
        "lang", F.floor(F.col("prev") / 256).alias("bin")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "text_chunk_sliding",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
    SELECT doc_id, toks,
           unnest(generate_series(0,
               greatest(0, CAST(ceil((len(toks) - 32) / 16.0) AS INT)))) AS ci
    FROM t
)
SELECT doc_id,
       CAST(ci AS INT)                                            AS chunk_idx,
       CAST(len(list_slice(toks, ci*16 + 1, ci*16 + 32)) AS INT)  AS n_chunk_toks,
       md5(array_to_string(list_slice(toks, ci*16 + 1, ci*16 + 32), ' ')) AS chunk_md5
FROM s
""",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each doc into 32-token windows with
    stride 16 (50% overlap) — the standard pretraining/RAG chunker. Pure
    narrow ops: tokenize, generate window starts, slice — no shuffle at
    all; output is verified by per-chunk content hash.
    """
    d = _tokens(load_table(spark, sf_dir, "documents"))
    n_chunks = F.expr("greatest(0, cast(ceil((size(toks) - 32) / 16.0) as int))")
    return (
        d.select("doc_id", "toks", F.sequence(F.lit(0), n_chunks).alias("cis"))
        .select("doc_id", "toks", F.explode("cis").alias("ci"))
        .select(
            "doc_id",
            F.col("ci").cast("int").alias("chunk_idx"),
            F.expr("size(slice(toks, ci*16 + 1, 32))").cast("int").alias("n_chunk_toks"),
            F.md5(
                F.encode(F.expr("concat_ws(' ', slice(toks, ci*16 + 1, 32))"), "utf-8")
            ).alias("chunk_md5"),
        )
    )


@register(
    "text_rep_ngram",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(1, len(toks) - 2)),
                          i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS grams
    FROM t
)
SELECT doc_id,
       CAST(len(grams) AS INT)                AS n_grams,
       CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6) AS rep_ratio
FROM g
""",
)
def text_rep_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram repetition scoring (Gopher-style quality signal): fraction of
    duplicated 3-grams per document. High rep_ratio = boilerplate/spam
    candidate for the quality filter. Per-row array expressions only — the
    whole query is one codegen stage over the scan, embarrassingly
    parallel at any scale.
    """
    d = _tokens(load_table(spark, sf_dir, "documents"))
    grams = F.expr(
        "transform(sequence(1, greatest(1, size(toks) - 2)),"
        " i -> concat_ws(' ', slice(toks, i, 3)))"
    )
    g = d.select("doc_id", grams.alias("grams"))
    return g.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.size(F.array_distinct("grams")).alias("n_distinct"),
        F.round(
            1.0 - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"), 6
        ).alias("rep_ratio"),
    )


_PII_EMAIL = "[a-z0-9.]+@[a-z.]+[a-z]"
_PII_PHONE = "555-[0-9]{4}"

_REDACT_ORACLE = f"""
WITH raw AS (
  SELECT c_custkey,
         'contact ' || lower(c_name) || ' at user' || c_custkey
           || '@example.com or 555-'
           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS text
  FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                      '{_PII_PHONE}', '[PHONE]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
            + len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
         AS n_pii
FROM raw
"""


@register("text_redact_pii", oracle=_REDACT_ORACLE)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — regex redaction of emails and phone numbers, the
    compliance pass every training corpus goes through before tokenizing.
    The document corpus is synthetic words, so the query materializes a
    deterministic contact string per customer (same construction on both
    engines) and redacts THAT — the machinery under test is the regex
    rewrite, not the data. Patterns are kept in the Java-regex ∩ RE2
    common subset (character classes + bounded repetition — no
    backreferences/lookaround, which RE2 lacks); DuckDB needs the 'g'
    flag for global replace, Spark's regexp_replace is global by
    default (docs/dialect_notes.md). Pure scan-stage expressions: no
    shuffle, whole-stage codegen, linear scaling.
    """
    c = load_table(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("contact "), F.lower("c_name"),
        F.lit(" at user"), F.col("c_custkey").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    raw = c.select("c_custkey", text.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"), _PII_PHONE, "[PHONE]"
    )
    n_pii = F.regexp_count("text", F.lit(_PII_EMAIL)) + F.regexp_count(
        "text", F.lit(_PII_PHONE)
    )
    return raw.select(
        "c_custkey", redacted.alias("redacted"), n_pii.cast("long").alias("n_pii")
    )


# --------------------------------------------------------------------------
# Vocabulary construction + OOV coverage (tokenizer-training statistics)
# --------------------------------------------------------------------------

VOCAB_V = 500  # top-V adjacent pairs kept (916 distinct exist at sf0.01)

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, lang, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM toks
),
bg AS (
  SELECT a.lang, a.tok || ' ' || b.tok AS pair
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY pair
),
vocab AS (
  SELECT pair, CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS INT) AS token_id
  FROM counted
  QUALIFY token_id <= {VOCAB_V}
)
SELECT b.lang,
       CAST(count(*) AS BIGINT) AS total_pairs,
       CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_pairs,
       floor(CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000 AS oov_rate,
       CAST(count(DISTINCT b.pair) AS BIGINT) AS distinct_pairs,
       CAST(count(DISTINCT v.token_id) AS BIGINT) AS distinct_in_vocab
FROM bg b LEFT JOIN vocab v ON b.pair = v.pair
GROUP BY b.lang
"""


@register("text_vocab", oracle=_VOCAB_ORACLE)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction over adjacent-token pairs (the BPE merge
    statistic) + per-language OOV coverage against the learned vocab.

    Pipeline: in-row pair forming via `zip_with` of the token array and
    its shift (no positional self-join), one map-side-combined count
    keyed on pair, global top-V via orderBy+limit — Spark plans this as
    TakeOrderedAndProject (per-partition partial top-V, no full sort) —
    then ids from a row_number over only the V surviving rows, and the
    V-row vocab BROADCASTS back into the coverage join, so the second
    pass over the corpus is shuffle-free up to the bounded per-lang agg.

    Scale posture (100 TB): this is literally how tokenizer-training
    collects first-merge pair stats. Both corpus passes are scan+project;
    the only wide exchanges are the pair-count shuffle (uniform key
    space) and a |langs|-key final agg. Vocab size V is constant, so the
    broadcast never grows with the data.
    """
    d = load_table(spark, sf_dir, "documents")
    # project the tokenizer ONCE below the pair generator: inlining the
    # bare split() into the zip_with/slice/size expressions re-tokenizes
    # every document ~4x (higher-order lambdas are interpreted) — the
    # measured anti-pattern text_ngram_topk documents (r10 review).
    # r12: spread the 2-column projection first — tokenize + pair-form +
    # explode otherwise all fuse into the single-task scan stage of the
    # driver's one-row-group documents file (tables.spread), and BOTH
    # corpus passes (pair counts, coverage) inherit the parallel layout.
    # r13 (ADVICE r12): keyed on doc_id, not the text payload — spread
    # needs a high-cardinality non-null key; duplicate/null texts would
    # collapse onto one partition.
    t = spread(d.select("doc_id", "lang", F.col("text")), "doc_id").select(
        "lang", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = t.select("lang", F.explode(pairs).alias("pair"))
    counted = bg.groupBy("pair").agg(F.count("*").alias("cnt"))
    topv = counted.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(VOCAB_V)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    vocab = (
        topv.withColumn("token_id", F.row_number().over(w).cast("int"))
        .select("pair", "token_id")
    )
    oov = F.when(F.col("token_id").isNull(), 1).otherwise(0)
    return (
        bg.join(F.broadcast(vocab), "pair", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_pairs"),
            F.sum(oov).cast("bigint").alias("oov_pairs"),
            (
                F.floor(
                    F.sum(oov).cast("double") / F.count("*") * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("oov_rate"),
            F.countDistinct("pair").alias("distinct_pairs"),
            F.countDistinct("token_id").alias("distinct_in_vocab"),
        )
    )


# --------------------------------------------------------------------------
# Full training-data prep pipeline (quality -> exact dedup -> semantic
# dedup -> packing), reported as a per-language funnel
# --------------------------------------------------------------------------

_PREP_LO, _PREP_HI = 200, 2000
_PREP_BIN = 256


def _train_prep_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import PAIR_TAU, _duck_dot

    return f"""
WITH raw AS (SELECT doc_id, lang, text, n_chars FROM documents),
q AS (SELECT * FROM raw WHERE n_chars BETWEEN {_PREP_LO} AND {_PREP_HI}),
ex AS (
  SELECT doc_id, lang, text FROM (
    SELECT q.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q) WHERE rn = 1
),
joined AS (
  SELECT e.doc_id, e.lang, e.text, emb.embedding
  FROM ex e JOIN embeddings emb ON emb.vec_id = e.doc_id
),
dups AS (
  SELECT DISTINCT j2.doc_id
  FROM joined j1 JOIN joined j2 ON j1.doc_id < j2.doc_id
  WHERE {_duck_dot('j1.embedding', 'j2.embedding')} >= {PAIR_TAU}
),
near AS (
  SELECT doc_id, lang, text FROM joined
  WHERE doc_id NOT IN (SELECT doc_id FROM dups)
),
t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks FROM near),
c AS (
  SELECT lang, n_toks,
         coalesce(sum(n_toks) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
),
s0 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_raw FROM raw GROUP BY 1),
s1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_quality FROM q GROUP BY 1),
s2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1),
s3 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_dedup FROM near GROUP BY 1),
s4 AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS total_tokens,
              CAST(count(DISTINCT floor(prev / {_PREP_BIN})) AS BIGINT) AS n_bins
       FROM c GROUP BY 1)
SELECT s0.lang, s0.n_raw,
       coalesce(s1.n_quality, 0) AS n_quality,
       coalesce(s2.n_exact, 0) AS n_exact,
       coalesce(s3.n_dedup, 0) AS n_dedup,
       coalesce(s4.total_tokens, 0) AS total_tokens,
       coalesce(s4.n_bins, 0) AS n_bins
FROM s0
LEFT JOIN s1 USING (lang) LEFT JOIN s2 USING (lang)
LEFT JOIN s3 USING (lang) LEFT JOIN s4 USING (lang)
"""


@register("pipeline_train_prep", oracle=_train_prep_oracle())
def pipeline_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LLM training-data prep pipeline as ONE lazy Catalyst plan,
    reported as a per-language funnel: raw -> length-band quality gate ->
    exact dedup (md5 keep-first) -> semantic dedup (embedding leader
    rule, inner-joined to the embedding table) -> token counting ->
    256-token bin packing (prefix-sum form). Columns: doc counts
    surviving each stage + packed token/bin totals.

    Scale posture (100 TB): the gate is a pushed-down scan filter; exact
    dedup shuffles once on the md5 key; semantic dedup's pair stage runs
    through the DISTRIBUTED tiled block-GEMM kernel
    (``similarity.gemm_pairs_tiled`` — one BLAS matmul per block-pair
    tile, nothing collected to the driver); packing reuses the per-lang
    window partitioning for its aggregate. The whole funnel is ONE lazy
    Catalyst plan — each stage's count is a side aggregate off the
    shared lineage, and no stage materializes eagerly at construction.
    """
    from bangdatapipeline_spark.operators.similarity import gemm_pairs_tiled

    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    q = raw.filter(F.col("n_chars").between(_PREP_LO, _PREP_HI))
    wmd5 = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # ex and near are each consumed by TWO branches of the funnel (the
    # stage count + the next stage's lineage); pinned so the md5 window
    # and the tiled-GEMM dedup each execute once per run instead of
    # once per downstream branch (r12 dual-consumer rule; .cache() is
    # lazy, so plan construction stays action-free).
    ex = (
        q.withColumn("rn", F.row_number().over(wmd5))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
        .cache()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    joined = ex.join(emb, ex.doc_id == emb.vec_id).select(
        "doc_id", "lang", "text", "embedding"
    )
    # semantic-dedup: every >= tau pair's LATER id is a dup to drop.
    # Pairs come from the tiled GEMM self-join — lazy, distributed,
    # ~25x faster than the expression-fold crossJoin at sf0.1 (the fold
    # form remains the hash-checked baseline in dedup_near_embedding's
    # oracle).
    dups = (
        gemm_pairs_tiled(joined.select("doc_id", "embedding"), id_col="doc_id")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    near = (
        joined.join(dups, "doc_id", "left_anti")
        .select("doc_id", "lang", "text")
        .cache()
    )
    t = near.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_toks")
    )
    wpack = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = t.withColumn("prev", F.coalesce(F.sum("n_toks").over(wpack), F.lit(0)))

    s0 = raw.groupBy("lang").agg(F.count("*").alias("n_raw"))
    s1 = q.groupBy("lang").agg(F.count("*").alias("n_quality"))
    s2 = ex.groupBy("lang").agg(F.count("*").alias("n_exact"))
    s3 = near.groupBy("lang").agg(F.count("*").alias("n_dedup"))
    s4 = c.groupBy("lang").agg(
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.countDistinct(F.floor(F.col("prev") / _PREP_BIN)).alias("n_bins"),
    )
    out = (
        s0.join(s1, "lang", "left")
        .join(s2, "lang", "left")
        .join(s3, "lang", "left")
        .join(s4, "lang", "left")
    )
    return out.select(
        "lang",
        "n_raw",
        F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
        F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
        F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
        F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
        F.coalesce("n_bins", F.lit(0)).alias("n_bins"),
    )


# --------------------------------------------------------------------------
# Cross-document repeated n-gram spans (exact-substring dedup statistic)
# --------------------------------------------------------------------------

_SPAN_N = 5  # words per span
_SPAN_TOP = 20


@register(
    "text_repeated_spans",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {_SPAN_N - 1}),
                               i -> array_to_string(t[i:i+{_SPAN_N - 1}], ' '))) AS span
  FROM t WHERE len(t) >= {_SPAN_N}
),
agg AS (
  SELECT span,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM g GROUP BY 1
)
SELECT span, n_docs, n_occ FROM agg
WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occ DESC, span ASC
LIMIT {_SPAN_TOP}
""",
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated word-5-gram spans: the detection statistic
    behind exact-substring deduplication (spans shared verbatim by >= 2
    documents are memorization/boilerplate candidates to cut or down-
    weight). Top spans by (distinct docs, occurrences, span).

    Plan: spans form IN-ROW (transform over the token array + slice — no
    positional self-join), one explode feeds a map-side-combined count
    keyed on span, and the top-k is TakeOrderedAndProject. At 100 TB the
    span key space is huge but uniform (suffix-hash it to 64-bit to
    shrink shuffle payload; collisions only merge counts, and candidates
    are re-verified downstream exactly like the MinHash verify pass).
    """
    # r12: spread first — tokenize, span transform and explode otherwise
    # fuse into the single-task documents scan stage (tables.spread)
    d = _tokens(
        spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    ).filter(F.size("toks") >= _SPAN_N)
    spans = F.expr(
        f"transform(sequence(1, size(toks) - {_SPAN_N - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {_SPAN_N})))"
    )
    g = d.select("doc_id", F.explode(spans).alias("span"))
    agg = (
        g.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return agg.orderBy(
        F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("span").asc()
    ).limit(_SPAN_TOP)


# --------------------------------------------------------------------------
# Zipf rank-frequency fit (corpus health statistic)
# --------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT token, CAST(count(*) AS DOUBLE) AS cnt FROM toks GROUP BY 1
),
ranked AS (
  SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS DOUBLE) AS rk
  FROM counted
)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       round(regr_slope(ln(cnt), ln(rk)), 4) AS zipf_slope,
       round(regr_intercept(ln(cnt), ln(rk)), 4) AS zipf_intercept,
       round(regr_r2(ln(cnt), ln(rk)), 4) AS r2
FROM ranked
"""


@register("text_zipf_fit", oracle=_ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: log-log OLS slope of token frequency vs
    rank (natural text ~ -1; a badly skewed or synthetic corpus shows
    up immediately) — a one-number corpus-health statistic computed with
    the SQL regression aggregates (regr_slope/intercept/r2), which
    partial-aggregate like any sum (the sufficient statistics are five
    running sums). One token-count shuffle + a |types|-row global rank
    window (vocabulary-sized, not corpus-sized).
    """
    d = load_table(spark, sf_dir, "documents")
    counted = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    ranked = counted.withColumn("rk", F.row_number().over(w).cast("double"))
    lc, lr = F.log(F.col("cnt")), F.log(F.col("rk"))
    return ranked.agg(
        F.count("*").alias("n_types"),
        F.round(F.regr_slope(lc, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 4).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 4).alias("r2"),
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (the lexical IR primitive next to the vector kNN)
# --------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 10

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents
),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
),
dft AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / st.avgdl))
            ) AS s
  FROM tf JOIN dft USING (t) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1
)
SELECT doc_id, round(s, 6) AS bm25
FROM sc
ORDER BY round(s, 6) DESC, doc_id ASC
LIMIT {_BM25_TOP}
"""


def _bm25_doc_scores(spark: SparkSession, sf_dir: str, alias: str) -> DataFrame:
    """Per-document BM25 score over the fixed _BM25_TERMS query, rounded
    onto the 6-dp ranking lattice — ONE definition of the lexical kernel
    (r9 review: text_bm25 and retrieval_rrf_hybrid restated the whole
    dl/st/tf/dft/idf pipeline verbatim). Posting shuffle is bounded by
    query-term matches; corpus stats and the 3-row idf table broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    dl = d.select("doc_id", F.size(toks).cast("double").alias("dl"))
    st = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("t"))
        .filter(F.col("t").isin(*_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = idf * F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dft), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias(alias))
    )


@register("text_bm25", oracle=_BM25_ORACLE)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed term set (_BM25_TERMS): the
    lexical relevance kernel (Robertson/Lucene form, k1=_BM25_K1,
    b=_BM25_B) — the sparse-retrieval half of a retrieval pipeline
    whose dense half is the kNN family.

    Plan: term postings (tf) come from one explode+filter+groupBy keyed
    on (doc, term) — the IN-list prunes the token stream before the
    shuffle; document lengths are a narrow projection joined back; the
    3-row idf table and the 1-row corpus stats broadcast. Scores are
    rounded to 6 dp BEFORE the top-k ordering (pre-rounded ranking keys
    — ln/division ulp skew across engines must not flip ranks) with
    doc_id as the unique tie-break; TakeOrderedAndProject handles the
    global top-_BM25_TOP. At 100 TB the posting shuffle is bounded by
    matches (query terms prune at the scan), the classic term-at-a-time
    sharded-postings shape.
    """
    sc = _bm25_doc_scores(spark, sf_dir, "bm25")
    return sc.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(_BM25_TOP)


# --------------------------------------------------------------------------
# Paragraph-hash dedup (CCNet-style shared-chunk removal statistic)
# --------------------------------------------------------------------------

_PARA_TOKENS = 10  # non-overlapping chunk length


_PARA_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
paras AS (
  SELECT doc_id,
         i - 1 AS pos,
         md5(array_to_string(toks[(i - 1) * {_PARA_TOKENS} + 1 : i * {_PARA_TOKENS}], ' ')) AS h
  FROM t, unnest(generate_series(1, CAST(ceil(len(toks) / {_PARA_TOKENS}.0) AS INT))) AS g(i)
),
flagged AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM paras
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         AS dup_frac
FROM flagged
GROUP BY doc_id
"""


@register("dedup_paragraph_hash", oracle=_PARA_ORACLE)
def dedup_paragraph_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular dedup statistic (CCNet-style): documents split
    into non-overlapping _PARA_TOKENS-token chunks; a chunk is a
    duplicate if the same md5 appeared at a lexicographically earlier
    (doc_id, pos) — keep-first, fully deterministic. Per document:
    chunk count, duplicated-chunk count, duplicated fraction (the score
    CCNet thresholds to drop boilerplate-heavy documents).

    Plan: chunks form IN-ROW (transform over the token array — no
    positional self-join), one explode feeds a window keyed on the
    16-byte hash (uniform keys, no skew) and a per-doc re-aggregation
    that reuses nothing wider than (doc_id, pos, rn). At 100 TB this is
    the exact shape of cross-shard paragraph dedup: hash-partition the
    chunk stream, keep-first inside each hash partition, aggregate back
    by document.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / float(_PARA_TOKENS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("toks"), (i - 1) * _PARA_TOKENS + 1, _PARA_TOKENS)
        ),
    )
    paras = t.select("doc_id", F.posexplode(chunks).alias("pos", "para")).select(
        "doc_id", "pos", F.md5("para").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    flagged = paras.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_paras"),
        F.round(
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("dup_frac"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion of BM25 (sparse) + cosine (dense)
# --------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant
_RRF_TOP = 10
_RRF_QVEC = 0  # dense query = embedding of vec_id 0


def _rrf_oracle() -> str:
    from bangdatapipeline_spark.operators.similarity import _duck_dot

    return f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents
),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE t IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
),
dft AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sparse AS (
  SELECT tf.doc_id,
         round(sum(ln((st.n - dft.df + 0.5) / (dft.df + 0.5) + 1)
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / st.avgdl))
            ), 6) AS s
  FROM tf JOIN dft USING (t) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1
),
sparse_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
  FROM sparse
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_RRF_QVEC}),
dense AS (
  SELECT e.vec_id AS doc_id,
         round({_duck_dot('q.q_emb', 'e.embedding')}, 6) AS s
  FROM embeddings e CROSS JOIN q
),
dense_rank_ AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
  FROM dense
),
fused AS (
  SELECT coalesce(sp.doc_id, de.doc_id) AS doc_id,
         round(coalesce(1.0 / ({_RRF_K} + sp.r), 0)
               + coalesce(1.0 / ({_RRF_K} + de.r), 0), 6) AS rrf,
         sp.r AS sparse_rank, de.r AS dense_rank
  FROM sparse_rank sp FULL OUTER JOIN dense_rank_ de USING (doc_id)
)
SELECT doc_id, rrf,
       CAST(sparse_rank AS INT) AS sparse_rank,
       CAST(dense_rank AS INT) AS dense_rank
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {_RRF_TOP}
"""


@register("retrieval_rrf_hybrid", oracle=_rrf_oracle())
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: Reciprocal Rank Fusion (k=_RRF_K) of the BM25
    lexical ranking (terms _BM25_TERMS) and the dense cosine ranking
    (query = embedding _RRF_QVEC) — rrf = Σ 1/(k + rank) over the two
    lists, the standard zero-tuning fusion for sparse+dense retrieval
    stacks. Completes the IR family: postings (text_bm25) + vector kNN +
    fusion.

    Determinism: both component rankings order by PRE-ROUNDED scores
    with doc_id tie-breaks, so the integer ranks agree across engines;
    the fused score is a two-term sum of exact reciprocals of identical
    operands, rounded before the final top-k.

    Plan/scale: the sparse side is the BM25 posting pipeline (bounded by
    term matches); the dense side broadcasts the 1-row query vector over
    the streamed embeddings (no corpus shuffle); each ranking is one
    window over its score table (docs-with-matches / corpus-sized), the
    fusion is a full outer join on doc_id, and the output is a
    TakeOrderedAndProject top-_RRF_TOP. At scale the dense ranking
    swaps in any ANN family member as its candidate generator.
    """
    from bangdatapipeline_spark.operators.similarity import dot_double_vec

    sparse = _bm25_doc_scores(spark, sf_dir, "s")
    w_sp = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    sparse_rank = sparse.select("doc_id", F.row_number().over(w_sp).alias("sparse_rank"))

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("embedding").alias("q_emb")
    )
    dense = e.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(dot_double_vec(F.col("q_emb"), F.col("embedding")), 6).alias("s"),
    )
    w_de = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    dense_rank = dense.select("doc_id", F.row_number().over(w_de).alias("dense_rank"))

    fused = sparse_rank.join(dense_rank, "doc_id", "full").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("sparse_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("dense_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("sparse_rank").cast("int").alias("sparse_rank"),
        F.col("dense_rank").cast("int").alias("dense_rank"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(_RRF_TOP)


@register(
    "text_surprisal",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT sum(c) AS n FROM cnt),
dt AS (SELECT doc_id, token, count(*) AS cd FROM tok GROUP BY doc_id, token)
SELECT dt.doc_id,
       CAST(sum(dt.cd) AS BIGINT)                              AS n_tokens,
       round(sum(dt.cd * -ln(cnt.c * 1.0 / tot.n)) / sum(dt.cd), 4) AS xent_nats
FROM dt JOIN cnt ON dt.token = cnt.token, tot
GROUP BY dt.doc_id
""",
)
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy (mean token surprisal in nats) per
    document against the corpus unigram distribution — the KenLM-style
    quality/outlier signal: boilerplate scores low, gibberish high.

    The corpus unigram table aggregates to |vocab| rows (broadcastable;
    at 100 TB still ~millions of rows — AQE decides), the per-doc side
    is pre-aggregated to (doc, token, count) so the join never carries
    raw positions, and the corpus total joins in as a lazy 1-row
    broadcast. ln() of a data-derived ratio is irrational — its shortest
    decimal repr never terminates at a rounding half, so plain round(4)
    is hash-safe here (contrast docs/dialect_notes.md on terminating
    ratios).
    """
    # r12 measured-and-rejected: deriving cnt from a pinned dt
    # (c(token) = Σ_doc cd — one explode pass instead of two) is the
    # right 100 TB rewrite on shuffle volume, but measured SLOWER at
    # bench scale with both pin flavors (med 0.61-0.81 s -> 1.06-1.37 s):
    # the two redundant branches below share one job DAG and execute
    # CONCURRENTLY on otherwise-idle cores, while the pin serializes the
    # chain through a materialization on the critical path. Keeping the
    # two-branch form; the derivation note stays here for the cluster
    # port, where duplicate shuffles are never free.
    d = _tokens(load_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode("toks").alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    dt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cd"))
    j = dt.join(cnt, "token").crossJoin(F.broadcast(tot))
    surpr = F.col("cd") * -F.log(F.col("c") * 1.0 / F.col("n"))
    return j.groupBy("doc_id").agg(
        F.sum("cd").cast("bigint").alias("n_tokens"),
        F.round(F.sum(surpr) / F.sum("cd"), 4).alias("xent_nats"),
    )


@register(
    "text_surprisal_buckets",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT sum(c) AS n FROM cnt),
dt AS (SELECT doc_id, token, count(*) AS cd FROM tok GROUP BY doc_id, token),
xent AS (
  SELECT dt.doc_id,
         round(sum(dt.cd * -ln(cnt.c * 1.0 / tot.n)) / sum(dt.cd), 4) AS x
  FROM dt JOIN cnt ON dt.token = cnt.token, tot
  GROUP BY dt.doc_id
),
cuts AS (
  SELECT quantile_cont(x, 1.0/3) AS q33, quantile_cont(x, 2.0/3) AS q66
  FROM xent
)
SELECT e.doc_id, e.x AS xent_nats,
       CASE WHEN e.x <= c.q33 THEN 'head'
            WHEN e.x <= c.q66 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM xent e, cuts c
""",
)
def text_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus partitioning: bucket documents into
    head/middle/tail by unigram-LM cross-entropy terciles — the standard
    quality-tiering step before sampling a training mix.

    Builds on ``text_surprisal`` (same registered plan); the tercile
    cutpoints are ONE exact-percentile aggregate crossJoined back as a
    lazy 1-row broadcast. Cutoffs interpolate the already-4dp-rounded
    xent values on both engines, so bucket-edge membership is
    deterministic (agg_quantiles proves the interpolation formulas
    match). At 100 TB swap the exact percentile for approx_percentile —
    tercile edges don't need exactness (documented trade, same as the
    profiler's cardinality policy).
    """
    # r12: the full surprisal plan feeds TWO consumers (the cutpoint
    # aggregate and the final bucket projection) — unpinned it executed
    # twice per run (plan showed 2x the surprisal exchange set).
    # .cache() pins the |docs|-row score table (measured 0.68 -> 0.42 s
    # steady-state noop med; a localCheckpoint pin measured no better
    # and would break downstream plan-identity cache reuse).
    x = (
        text_surprisal(spark, sf_dir)
        .select("doc_id", F.col("xent_nats"))
        .cache()
    )
    cuts = x.agg(
        F.percentile("xent_nats", 1.0 / 3).alias("q33"),
        F.percentile("xent_nats", 2.0 / 3).alias("q66"),
    )
    return x.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "xent_nats",
        F.when(F.col("xent_nats") <= F.col("q33"), "head")
        .when(F.col("xent_nats") <= F.col("q66"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@register(
    "text_surprisal_bigram",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM toks
),
pairs AS (
  SELECT a.doc_id, a.tok AS prev, b.tok AS cur
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bg AS (SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY prev, cur),
ctx AS (SELECT prev, sum(c2) AS c1 FROM bg GROUP BY prev),
v AS (SELECT count(DISTINCT tok) AS vocab FROM pos),
dp AS (SELECT doc_id, prev, cur, count(*) AS cd FROM pairs GROUP BY doc_id, prev, cur)
SELECT dp.doc_id,
       CAST(sum(dp.cd) AS BIGINT) AS n_bigrams,
       round(sum(dp.cd * -ln((bg.c2 + 0.5) / (ctx.c1 + 0.5 * v.vocab)))
             / sum(dp.cd), 4) AS xent2_nats
FROM dp
JOIN bg  ON bg.prev = dp.prev AND bg.cur = dp.cur
JOIN ctx ON ctx.prev = dp.prev, v
GROUP BY dp.doc_id
""",
)
def text_surprisal_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM conditional cross-entropy per document (add-0.5
    smoothing over the vocabulary): the sharper companion to
    ``text_surprisal`` — repeated boilerplate scores LOW under the
    conditional model even when its unigrams are rare, which is exactly
    the signal repetition-heavy junk filtering needs.

    Bigrams form IN-ROW (zip_with over the token array and its shift,
    the ``text_bigrams`` trick — the oracle spells a positional
    self-join because DuckDB lacks shift-zip, but Spark never pays it);
    the model tables reduce to |bigram-vocab| / |vocab| rows, and the
    per-doc side pre-aggregates (doc, prev, cur, count) so the scoring
    join carries counts, not positions. ln() of the smoothed ratio is
    irrational — round(4) is hash-safe.
    """
    # r12: spread the projection (tokenize + zip_with + explode otherwise
    # fuse into the single-task documents scan), and pin the exploded
    # pair stream — THREE subtrees read it (dp, bg, and ctx via bg), so
    # unpinned it re-tokenized the corpus three times per run
    d = _tokens(
        spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    )
    toks = F.col("toks")
    pair = F.explode(
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        )
    )
    # Cluster caveat (VERDICT r12): localCheckpoint blocks live on
    # executors without lineage — an executor loss mid-job is fatal on a
    # cluster; port with reliable .checkpoint() (replicated dir) or a
    # written intermediate. Local mode is single-process, so the cheap
    # form is strictly better here.
    # r13: checkpoint the per-doc TOKEN ARRAYS, not the exploded pair
    # stream — the vocabulary count (a FOURTH consumer) previously hung
    # off the raw projection, so every run re-tokenized the corpus just
    # to count ~31 distinct tokens (measured 0.6 s of the ~1.1 s warm).
    # From the token checkpoint, bg/dp re-derive the pair stream with an
    # in-row zip_with+explode (cheap: no regex, no scan) and v explodes
    # the same blocks — ONE tokenizer pass per run, four consumers.
    dck = d.select("doc_id", "toks").localCheckpoint(eager=False)
    pairs = dck.select("doc_id", pair.alias("p")).select(
        "doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    bg = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = bg.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = (
        dck.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    dp = pairs.groupBy("doc_id", "prev", "cur").agg(F.count(F.lit(1)).alias("cd"))
    j = (
        dp.join(bg, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(v))
    )
    surpr = F.col("cd") * -F.log(
        (F.col("c2") + 0.5) / (F.col("c1") + 0.5 * F.col("vocab"))
    )
    return j.groupBy("doc_id").agg(
        F.sum("cd").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(surpr) / F.sum("cd"), 4).alias("xent2_nats"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_toks,
         md5(text) AS h
  FROM documents
),
dups AS (
  SELECT sum(c - 1) AS n_dup_docs
  FROM (SELECT count(*) AS c FROM base GROUP BY h)
)
SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM base
UNION ALL
SELECT 'n_tokens', CAST(sum(n_toks) AS DOUBLE) FROM base
UNION ALL
SELECT 'avg_doc_tokens', floor(avg(n_toks) * 10000 + 0.5) / 10000 FROM base
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM base
UNION ALL
SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM base
UNION ALL
SELECT 'share_en',
       floor(count(CASE WHEN lang = 'en' THEN 1 END) * 1.0
             / count(*) * 10000 + 0.5) / 10000 FROM base
UNION ALL
SELECT 'exact_dup_rate',
       floor((SELECT n_dup_docs FROM dups) * 1.0
             / (SELECT count(*) FROM base) * 10000 + 0.5) / 10000
""",
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary: the one-query corpus datasheet (doc/token
    counts, language and source coverage, English share, exact-duplicate
    rate) a training-data release ships with — every metric from ONE
    pass over (doc_id, lang, source, token-count, md5) projections.

    The heavy columns reduce in the scan-stage projection (token count,
    32-byte digest); each card row is a scalar aggregate over that
    slim base, and the dup-rate reuses the digest-group trick from
    ``dedup_exact_canonical``. Small-denominator shares take the IEEE
    floor-round. At 100 TB this is one scan + KB-sized aggregates —
    cheap enough to run on every corpus build.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("n_toks"),
        F.md5(F.encode("text", "utf-8")).alias("h"),
    )
    dup_docs = (
        base.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") - 1).alias("n_dup_docs"))
    )
    share_en = (
        F.count(F.when(F.col("lang") == "en", 1)) * 1.0 / F.count(F.lit(1))
    )
    # ONE aggregate produces all six scalar metrics (the earlier
    # per-metric unionAll form ran ~7 independent aggregates — Spark
    # does not share scans across union branches, so n_tokens and
    # avg_doc_tokens each re-tokenized the corpus; r9 review); the
    # digest-grouped dup count is the only second pass, then stack()
    # unpivots the 1-row card into (metric, value) rows.
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_toks").cast("double").alias("n_tokens"),
        (F.floor(F.avg("n_toks") * 10000 + F.lit(0.5)) / 10000)
        .cast("double")
        .alias("avg_doc_tokens"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        (F.floor(share_en * 10000 + 0.5) / 10000)
        .cast("double")
        .alias("share_en"),
    )
    card = stats.crossJoin(F.broadcast(dup_docs)).withColumn(
        "exact_dup_rate",
        (
            F.floor(F.col("n_dup_docs") * 1.0 / F.col("n_docs") * 10000 + 0.5)
            / 10000
        ).cast("double"),
    )
    return card.selectExpr(
        "stack(7,"
        " 'n_docs', n_docs,"
        " 'n_tokens', n_tokens,"
        " 'avg_doc_tokens', avg_doc_tokens,"
        " 'n_langs', n_langs,"
        " 'n_sources', n_sources,"
        " 'share_en', share_en,"
        " 'exact_dup_rate', exact_dup_rate) AS (metric, value)"
    )


@register(
    "ml_naive_bayes",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
train_tok AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
test_tok  AS (SELECT * FROM tok WHERE doc_id % 5 = 0),
lt AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n_lt
  FROM train_tok GROUP BY 1, 2
),
l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l FROM train_tok GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab FROM train_tok),
dl AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS d_l
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
),
dd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents WHERE doc_id % 5 <> 0),
scored AS (
  SELECT t.doc_id,
         max(t.lang)  AS lang,
         l.lang       AS cand_lang,
         ln(max(dl.d_l) * 1.0 / max(dd.n_docs))
           + sum(ln(coalesce(lt.n_lt, 0) + 1.0))
           - count(*) * ln(max(l.n_l) + max(v.vocab) * 1.0) AS score
  FROM test_tok t
  CROSS JOIN l
  CROSS JOIN v
  CROSS JOIN dd
  JOIN dl ON dl.lang = l.lang
  LEFT JOIN lt ON lt.lang = l.lang AND lt.token = t.token
  GROUP BY t.doc_id, l.lang
),
ranked AS (
  SELECT doc_id, lang, cand_lang,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY floor(score * 1e6 + 0.5) DESC, cand_lang ASC
         ) AS rk
  FROM scored
)
SELECT doc_id, lang, cand_lang AS pred_lang, (cand_lang = lang) AS correct
FROM ranked WHERE rk = 1
""",
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and scored in
    one declarative plan — the canonical "ML as aggregation" pattern:
    training is nothing but two groupBys (per-(lang,token) counts and
    per-lang totals), and scoring is a join + sum, so the whole model
    fits Spark's shuffle machinery with no iteration and no driver math.

    Split: docs with ``doc_id % 5 == 0`` are held out (the md5-gate
    samplers are the production recipe; the modulus keeps this oracle
    simple). Laplace-smoothed log-likelihood: ``ln(prior_L) + sum_t
    ln(n_{L,t}+1) - T*ln(n_L+V)``. The argmax is taken per doc via
    row_number on the 1e-6-lattice-floored score (dialect rule for
    float ranking keys; see docs/dialect_notes.md) with lang as the
    tie-break, and only the prediction is emitted — the float score
    never reaches the output, so the hash depends on argmax margins
    (orders of magnitude above ulp noise), not on accumulation order.

    Scale posture (100 TB): the model tables are data-bounded
    (langs x vocab); the test-token x candidate-lang join is an equi-join
    on token that AQE can broadcast while the model fits, and degrades
    to a plain shuffle join when it doesn't. Per-doc state is one
    partial-aggregated (doc, lang) row per candidate — never the tokens.
    """
    d = load_table(spark, sf_dir, "documents")
    # r12 measured-and-rejected: spreading the tokenize projection (the
    # §2.5 treatment) made warm runs 1.04-1.30 -> 1.71-2.01 s med in an
    # ABBA probe — the plain explode over 5k docs is ~10 ms of per-task
    # work, far below the exchange + 32-task scheduling cost, and the
    # four redundant branches already overlap on idle cores. Spread pays
    # off only when the scan-stage expression work is heavy (n-gram /
    # shingle fan-outs, GEMM folds); this one is not.
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    train_tok = tok.filter(F.col("doc_id") % 5 != 0)
    test_tok = tok.filter(F.col("doc_id") % 5 == 0)

    lt = train_tok.groupBy("lang", "token").agg(F.count("*").alias("n_lt"))
    l_tot = train_tok.groupBy("lang").agg(F.count("*").alias("n_l"))
    vocab = train_tok.agg(F.countDistinct("token").alias("vocab"))
    d_train = d.filter(F.col("doc_id") % 5 != 0)
    dl = d_train.groupBy("lang").agg(F.count("*").alias("d_l"))
    dd = d_train.agg(F.count("*").alias("n_docs"))

    model = (
        l_tot.join(dl, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(dd))
        .select(
            F.col("lang").alias("cand_lang"), "n_l", "d_l", "vocab", "n_docs"
        )
    )
    cand = (
        test_tok.crossJoin(F.broadcast(model))
        .join(
            lt.withColumnRenamed("lang", "cand_lang"),
            ["cand_lang", "token"],
            "left",
        )
        .groupBy("doc_id", "cand_lang")
        .agg(
            F.max("lang").alias("lang"),
            (
                F.log(F.max("d_l") * F.lit(1.0) / F.max("n_docs"))
                + F.sum(F.log(F.coalesce(F.col("n_lt"), F.lit(0)) + 1.0))
                - F.count(F.lit(1))
                * F.log(F.max("n_l") + F.max("vocab") * F.lit(1.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.floor(F.col("score") * 1e6 + 0.5).desc(), F.col("cand_lang").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand_lang").alias("pred_lang"),
            (F.col("cand_lang") == F.col("lang")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------

@register(
    "text_cdc_chunks",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT t.doc_id, u.i AS pos, t.toks[u.i] AS word
  FROM t, unnest(generate_series(1, len(t.toks))) AS u(i)
),
c AS (
  SELECT doc_id, pos,
         coalesce(sum(CASE WHEN substr(md5(word), 1, 1) = '0'
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM w
),
g AS (
  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS chunk_words
  FROM c GROUP BY doc_id, chunk_id
)
SELECT doc_id,
       CAST(count(*) AS BIGINT)          AS n_chunks,
       CAST(sum(chunk_words) AS BIGINT)  AS n_words,
       CAST(max(chunk_words) AS BIGINT)  AS max_chunk_words,
       CAST((sum(chunk_words) * 1000000 + count(*) // 2) // count(*) AS BIGINT)
         AS avg_chunk_words_ppm
FROM g GROUP BY doc_id
""",
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rolling-hash split behind rsync /
    LBFS / dedup-friendly blob stores, in token space): a chunk boundary
    falls AFTER every word whose md5 starts with '0' — a content-derived
    1/16 gate, so an insertion early in a document shifts only the chunk
    it lands in, never the downstream boundaries (the property fixed-width
    chunking lacks, and the reason CDC chunks dedup across near-identical
    documents). Emits per-doc chunk statistics: count, max and mean width
    (exact ppm lattice).

    The gate reuses the repo's md5-gate convention (deterministic,
    partition-invariant, identical string in both engines). Spark plan:
    posexplode -> per-doc running sum of gate flags with a 1-PRECEDING
    frame (word at position p belongs to chunk "#gates strictly before
    p") -> two bounded-key aggregations. Everything after the explode
    partitions by doc_id, so the 100 TB shape is one shuffle on doc_id
    and per-doc linear work; the alternative in-row formulation (array
    fold building segment lengths) pins the whole doc in one expression —
    the window form streams it.
    """
    # r12 measured-and-rejected: spreading the tokenize projection made
    # warm runs 0.60 -> 0.82 s med — the posexplode + md5 gate over 5k
    # docs is below the exchange-amortization threshold (see the
    # ml_naive_bayes rejection note), and the doc_id window right after
    # re-shuffles anyway.
    d = _tokens(load_table(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.posexplode("toks").alias("pos", "word"))
    gate = F.when(
        F.substring(F.md5(F.encode(F.col("word"), "utf-8")), 1, 1) == "0", 1
    ).otherwise(0)
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = w.select(
        "doc_id",
        F.coalesce(F.sum(gate).over(frame), F.lit(0)).alias("chunk_id"),
    )
    g = c.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("chunk_words")
    )
    return g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_words").alias("n_words"),
        F.max("chunk_words").alias("max_chunk_words"),
        F.expr(
            "(sum(chunk_words) * 1000000 + count(*) DIV 2) DIV count(*)"
        ).alias("avg_chunk_words_ppm"),
    )


# --------------------------------------------------------------------------
# BPE pair statistics (tokenizer-training step 0)
# --------------------------------------------------------------------------

_BPE_TOP = 50


@register(
    "text_bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
p AS (
  SELECT substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM words WHERE len(w) >= 2)
),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair)
SELECT pair, n,
       CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INT) AS rk
FROM c
QUALIFY rk <= {_BPE_TOP}
""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, step 0: corpus-wide adjacent-symbol pair
    counts within word boundaries (Sennrich et al. 2016) — the statistic
    every merge round of byte-pair encoding argmaxes over. Emits the top
    _BPE_TOP character bigrams with a total-order tie-break (count
    desc, pair asc), i.e. the first merge candidate list.

    The pair stream is generated IN-ROW (filter words >= 2 chars, then a
    nested transform over substring positions — no join, no UDF), so the
    only shuffle is the pair-count aggregate, whose key space is bounded
    by the symbol-bigram alphabet (|Σ|² — a few thousand keys at most):
    map-side combine collapses the billions of pair occurrences a 100 TB
    corpus generates to |Σ|² rows per task before anything moves. The
    top-_BPE_TOP window runs over that bounded table (single tiny
    partition by construction — the iterative merge loop re-aggregates
    pairs per round; each round is this same bounded-key shape).
    """
    # r12: the nested char-pair transform fuses into the single-task
    # documents scan (guide §2.5) — spread the narrow projection first.
    # r13 (ADVICE r12): keyed on doc_id (unique, non-null) instead of the
    # text payload; the 8-byte id riding the exchange is noise next to
    # the text column.
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    pairs = d.selectExpr(
        "explode(flatten(transform("
        "  filter(split(text, ' '), w -> length(w) >= 2),"
        "  w -> transform(sequence(1, length(w) - 1),"
        "                 i -> substring(w, i, 2))"
        "))) AS pair"
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _BPE_TOP)
    )


_NGRAM_TOP = 30


@register(
    "text_ngram_topk",
    oracle=f"""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
),
c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY bigram)
SELECT bigram, n,
       CAST(row_number() OVER (ORDER BY n DESC, bigram ASC) AS INT) AS rk
FROM c
QUALIFY rk <= {_NGRAM_TOP}
""",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top word bigrams — the collocation/boilerplate report
    (repeated bigrams at the head of this list are the fixed phrases a
    dedup or quality pass should know about; it also feeds stop-phrase
    lists and bigram-LM vocabularies). Word-level sibling of
    ``text_bpe_pair_counts``' character pairs, same shape one level up.

    Bigrams are generated IN-ROW (position transform over the token
    array, no self-join on position — the posexplode-and-join
    formulation would shuffle every token twice); the count aggregate
    is the only exchange and map-side combine compresses it to the
    distinct-bigram domain per task. Unlike char pairs that domain is
    data-sized (vocab²-bounded but long-tailed), so the top-_NGRAM_TOP
    window runs AFTER the count table — at 100 TB that table is the
    thing you'd additionally count-min-sketch if it outgrew memory
    (agg_cms_heavy_hitters is the registered sketch path).
    """
    # r12 measured-and-rejected: spread() on the text projection (the
    # bpe-pair treatment) made this op SLOWER (0.29 -> 0.39 s med) — the
    # word-bigram generator is light enough that the extra round-robin
    # exchange of full text rows costs more than the serial scan stage.
    d = load_table(spark, sf_dir, "documents")
    # Guard IN-ROW (CASE inside the generator), not via a post-explode
    # where clause: sequence(1, 0) is the DESCENDING [1, 0] in Spark, so a
    # single-token doc would index element_at(tokens, 0) and raise unless
    # the optimizer happened to push the predicate below the Generate —
    # same in-row posture as text_bpe_pair_counts (ADVICE r7). The split
    # is projected ONCE below the generator (inlined it would re-evaluate
    # 4x per row: size, sequence bound, 2x element_at — measured 4x slower
    # on text_postings' identical generator).
    bg = d.selectExpr("split(text, ' ') AS toks").selectExpr(
        "explode(CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        " ELSE array() END) AS bigram"
    )
    counted = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _NGRAM_TOP)
    )


def _langid_confusion_oracle() -> str:
    from bangdatapipeline_spark.registry import REGISTRY

    base = REGISTRY["text_langid"].oracle
    return f"""
WITH pred AS ({base}),
truth AS (SELECT doc_id, lang AS true_lang FROM documents),
tot AS (SELECT lang AS true_lang, CAST(count(*) AS BIGINT) AS n_true
        FROM documents GROUP BY 1)
SELECT t.true_lang, p.pred_lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST((count(*) * 1000000 + tot.n_true // 2) // tot.n_true AS BIGINT)
         AS row_ppm
FROM pred p JOIN truth t USING (doc_id) JOIN tot USING (true_lang)
GROUP BY t.true_lang, p.pred_lang, tot.n_true
"""


@register("text_langid_confusion", oracle=_langid_confusion_oracle())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID classifier against the labeled
    ``lang`` column — the eval that turns text_langid from a score into
    a shippable gate (per true language: where do its documents go, and
    what share of them; diagonal cells are per-language recall in ppm).
    Same eval posture as eval_er_quality / eval_dedup_recall: the
    synthetic corpus carries ground truth, so the metric is real, not a
    proxy.

    Composes the REGISTERED classifier plan (its |langs| x |vocab|
    profile broadcast and doc-keyed scoring shuffle are the cost); the
    eval adds one doc_id equi-join to the labels and a bounded
    |langs|² rollup on the integer ppm lattice — O(docs) on top of the
    classifier, nothing new at scale.
    """
    pred = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    d = load_table(spark, sf_dir, "documents")
    truth = d.select("doc_id", F.col("lang").alias("true_lang"))
    tot = d.groupBy(F.col("lang").alias("true_lang")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    return (
        pred.join(truth, "doc_id")
        .join(F.broadcast(tot), "true_lang")
        .groupBy("true_lang", "pred_lang", "n_true")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.expr("(n * 1000000 + n_true DIV 2) DIV n_true").alias(
                "row_ppm"
            ),
        )
    )


@register(
    "text_length_percentiles",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75,
       round(quantile_cont(n_chars, 0.95), 6) AS p95,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source
""",
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per source — the first histogram a
    corpus intake reads (length percentiles decide chunking windows,
    truncation budgets, and which sources need length-outlier
    filtering). Exact interpolated percentiles (the agg_quantiles
    formula identity: Spark ``percentile`` == DuckDB ``quantile_cont``),
    rounded per the repo float policy.

    One groupBy(source): percentile is a sort-based aggregate WITHIN
    each bounded group. At 100 TB swap to approx_percentile per the
    profiler's documented cardinality policy — length tails don't need
    exactness; the exact form here is the oracle-checkable baseline
    that certifies the swap.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", 0.25), 6).alias("p25"),
        F.round(F.percentile("n_chars", 0.50), 6).alias("p50"),
        F.round(F.percentile("n_chars", 0.75), 6).alias("p75"),
        F.round(F.percentile("n_chars", 0.95), 6).alias("p95"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "text_vocab_coverage",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
),
r AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk,
         sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER () AS total
  FROM c
)
SELECT CAST(min(total) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT)   AS vocab_size,
       CAST(min(CASE WHEN cum * 100 >= 50 * total THEN rk END) AS BIGINT)
         AS vocab_for_50pct,
       CAST(min(CASE WHEN cum * 100 >= 90 * total THEN rk END) AS BIGINT)
         AS vocab_for_90pct,
       CAST(min(CASE WHEN cum * 100 >= 99 * total THEN rk END) AS BIGINT)
         AS vocab_for_99pct
FROM r
""",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: how many of the most frequent types
    cover 50/90/99% of all corpus tokens — the sizing statistic a
    tokenizer budget decision reads (if 32k types cover 99.5%, the 96k
    vocab buys almost nothing), and the Zipf companion to text_zipf_fit
    (that fits the slope; this reads the integral).

    Same bounded-domain count-CDF pattern as ts_ship_delay_cdf, one
    level up: token counts collapse to |vocab| rows (the only shuffle
    with corpus-sized input has map-side combine onto vocab keys), the
    rank/cumulative windows run over that bounded table, and the three
    coverage picks are conditional mins — spelled identically in both
    engines. Output is one row of corpus constants, all exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    c = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    order = [F.col("cnt").desc(), F.col("token").asc()]
    wrk = Window.orderBy(*order)
    wcum = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = c.select(
        F.row_number().over(wrk).alias("rk"),
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )

    def pick(q: int):
        return F.min(
            F.when(F.col("cum") * 100 >= q * F.col("total"), F.col("rk"))
        ).cast("bigint")

    return r.agg(
        F.min("total").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        pick(50).alias("vocab_for_50pct"),
        pick(90).alias("vocab_for_90pct"),
        pick(99).alias("vocab_for_99pct"),
    )


# ---------------------------------------------------------------------------
# Inverted index (posting lists)
# ---------------------------------------------------------------------------

_POSTINGS_CAP = 20     # ids materialized per posting list
# df band, relative to corpus size: terms in fewer than max(5, 1%) of
# documents are noise, terms in more than 10% are head terms whose posting
# lists are unselective (you'd store them as bitmaps, not id lists).
# ONE spelling of the in-row bigram generator (r9 review: text_postings,
# retrieval_boolean_index, and the streaming postings sink each restated
# it verbatim; the stream-equals-batch invariant requires byte-identical
# tokenization). Input column must be `toks` (split once, see callers).
_BIGRAM_GEN_EXPR = (
    "explode(array_distinct(CASE WHEN size(toks) >= 2 THEN"
    " transform(sequence(1, size(toks) - 1),"
    " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    " ELSE array() END)) AS term"
)
_POSTINGS_LO = "greatest(5, {n} // 100)"
_POSTINGS_HI = "{n} // 10"


@register(
    "text_postings",
    oracle=f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS term
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
), p AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM bg
), g AS (
  SELECT term,
         count(*) AS df,
         string_agg(CASE WHEN rn <= {_POSTINGS_CAP}
                         THEN CAST(doc_id AS VARCHAR) END,
                    ',' ORDER BY doc_id) AS postings
  FROM p GROUP BY term
)
SELECT g.term, CAST(g.df AS BIGINT) AS df, g.postings
FROM g CROSS JOIN nd
WHERE g.df BETWEEN {_POSTINGS_LO.format(n='nd.n')}
               AND {_POSTINGS_HI.format(n='nd.n')}
""",
    tags=("stream_twin", "stream_test:test_postings_stream_equals_batch"),
)
def text_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction over word bigrams: for every mid-df
    term (document frequency between max(5, 1%) and 10% of the corpus —
    the selectivity band where id-list postings beat bitmaps and the
    term is still discriminative), the sorted posting list of the first
    20 doc_ids plus the true df. This is the build step behind every
    lexical retrieval operator here (``text_bm25``/``text_tfidf`` score
    at query time; a real search system materializes postings once and
    intersects them at query time). Terms are bigrams because this
    corpus's unigram vocabulary is saturated (every word appears in
    ~every document — df bands are only meaningful one n-gram level up).

    Determinism: posting ids are rank-capped by a row_number over
    (term ORDER BY doc_id) and string-joined in doc_id order — never
    collect-order-dependent (the ``agg_string_agg`` discipline). The
    df band is RELATIVE (computed from a 1-row corpus-count scalar,
    declared broadcast), so the operator is meaningful at every scale
    factor instead of pinning absolute df constants.

    Scale shape: bigrams generate in-row (no positional self-join),
    doc-distinct in-row too; ONE exchange on term feeds both the
    rank window and the aggregate (same key, sort reused), and the
    conditional collect keeps per-term aggregate state <= 20 ids no
    matter how hot the term — the unbounded-listagg anti-pattern never
    appears. At 100 TB the posting store is range-partitioned by term
    with doc-sorted runs, which is exactly what this plan's per-term
    sorted partitions are.
    """
    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(F.count(F.lit(1)).alias("n"))
    # tokenize ONCE below the generator (a bare split inside the transform
    # would be re-evaluated 4x per row: size, sequence bound, 2x element_at).
    # r12: spread first — tokenize + bigram explode otherwise fuse into
    # the single-task documents scan stage (tables.spread)
    toks = spread(d.select("doc_id", "text"), "doc_id").selectExpr(
        "doc_id", "split(text, ' ') AS toks"
    )
    bg = toks.selectExpr("doc_id", _BIGRAM_GEN_EXPR)
    w = Window.partitionBy("term").orderBy("doc_id")
    p = bg.withColumn("rn", F.row_number().over(w))
    g = p.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") <= _POSTINGS_CAP, F.col("doc_id"))
                )
            ).cast("array<string>"),
            ",",
        ).alias("postings"),
    )
    lo = F.expr(_POSTINGS_LO.format(n="n").replace("//", "div"))
    hi = F.expr(_POSTINGS_HI.format(n="n").replace("//", "div"))
    return (
        g.crossJoin(F.broadcast(nd))
        .filter(F.col("df").between(lo, hi))
        .select("term", F.col("df").cast("long").alias("df"), "postings")
    )


# ---------------------------------------------------------------------------
# Collocation mining (pointwise mutual information)
# ---------------------------------------------------------------------------

_PMI_MIN_N = 5
_PMI_TOP = 30


@register(
    "text_collocation_pmi",
    oracle=f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (
  SELECT u.tok, count(*) AS n
  FROM t, unnest(t.toks) AS u(tok) GROUP BY u.tok
),
ut AS (SELECT sum(n) AS tt FROM uni),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
),
bc AS (SELECT w1, w2, count(*) AS nab FROM bg GROUP BY w1, w2),
bt AS (SELECT sum(nab) AS bb FROM bc),
scored AS (
  SELECT bc.w1 || ' ' || bc.w2 AS bigram,
         CAST(bc.nab AS BIGINT) AS n_ab,
         round(ln(CAST(bc.nab AS DOUBLE)) + 2 * ln(CAST(ut.tt AS DOUBLE))
               - ln(CAST(bt.bb AS DOUBLE)) - ln(CAST(a.n AS DOUBLE))
               - ln(CAST(b.n AS DOUBLE)), 4) AS pmi
  FROM bc
  JOIN uni a ON a.tok = bc.w1
  JOIN uni b ON b.tok = bc.w2
  CROSS JOIN ut CROSS JOIN bt
  WHERE bc.nab >= {_PMI_MIN_N}
)
SELECT bigram, n_ab, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS INT) AS rk
FROM scored
QUALIFY rk <= {_PMI_TOP}
""",
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: for frequent
    bigrams (n >= 5), PMI = ln(p(ab) / (p(a)·p(b))) — the association
    score that separates genuine collocations ("machine learning") from
    merely-frequent pairs of common words, which raw counts
    (``text_ngram_topk``) cannot. Top-30 by PMI with a bigram
    tie-break.

    Float discipline: every ln argument is an exact integer count, the
    score is the SUM of five ln terms in a fixed order (never ln of a
    product, whose integer product could exceed 2^53 at corpus scale),
    rounded to 4 dp before ranking. Scale shape: unigram and bigram
    counts are map-side-combined aggregates over scan-local generators
    (the shared pre-split `toks` projection); the scoring join
    broadcasts the vocabulary-bounded unigram table twice plus two
    1-row totals; the top-30 is a rank-filter window
    (InferWindowGroupLimit caps the sort).
    """
    d = load_table(spark, sf_dir, "documents")
    # r12 measured-and-rejected: spreading the split projection made
    # warm runs 0.79 -> 1.21 s med — the three redundant passes already
    # overlap concurrently and each is below the exchange-amortization
    # threshold (the ml_naive_bayes rejection note).
    toks = d.selectExpr("split(text, ' ') AS toks")
    uni = toks.selectExpr("explode(toks) AS tok").groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    ut = uni.agg(F.sum("n").alias("tt"))
    bg = toks.selectExpr(
        "explode(CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        " i -> struct(element_at(toks, i) AS w1,"
        "             element_at(toks, i + 1) AS w2))"
        " ELSE array() END) AS p"
    ).select("p.w1", "p.w2")
    bc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= _PMI_MIN_N)
    )
    # total bigram mass = row count of bg — a partial-aggregated count
    # with no wide key (the earlier groupBy-then-sum form re-ran the
    # long-tailed (w1, w2) shuffle a second time for one scalar)
    bt_tot = bg.agg(F.count(F.lit(1)).alias("bb"))
    a = uni.select(F.col("tok").alias("w1"), F.col("n").alias("na"))
    b = uni.select(F.col("tok").alias("w2"), F.col("n").alias("nb"))
    pmi = F.round(
        F.log(F.col("nab").cast("double"))
        + 2 * F.log(F.col("tt").cast("double"))
        - F.log(F.col("bb").cast("double"))
        - F.log(F.col("na").cast("double"))
        - F.log(F.col("nb").cast("double")),
        4,
    )
    scored = (
        bc.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(ut))
        .crossJoin(F.broadcast(bt_tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("nab").cast("long").alias("n_ab"),
            pmi.alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _PMI_TOP)
    )


@register(
    "retrieval_boolean_index",
    oracle=f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
td AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS term
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
), g AS (
  SELECT term, count(*) AS df FROM td GROUP BY term
), banded AS (
  SELECT g.term, g.df FROM g CROSS JOIN nd
  WHERE g.df BETWEEN {_POSTINGS_LO.format(n='nd.n')} AND {_POSTINGS_HI.format(n='nd.n')}
), pick AS (
  SELECT term, df, row_number() OVER (ORDER BY term) AS rn
  FROM banded QUALIFY rn <= 2
), hits AS (
  SELECT td.doc_id,
         max(CASE WHEN p.rn = 1 THEN 1 ELSE 0 END) AS h1,
         max(CASE WHEN p.rn = 2 THEN 1 ELSE 0 END) AS h2
  FROM td JOIN pick p USING (term)
  GROUP BY td.doc_id
), agg AS (
  SELECT CAST(sum(h1 * h2) AS BIGINT)     AS n_and,
         CAST(count(*) AS BIGINT)         AS n_or
  FROM hits
)
SELECT (SELECT term FROM pick WHERE rn = 1)            AS term_a,
       (SELECT term FROM pick WHERE rn = 2)            AS term_b,
       CAST((SELECT df FROM pick WHERE rn = 1) AS BIGINT) AS df_a,
       CAST((SELECT df FROM pick WHERE rn = 2) AS BIGINT) AS df_b,
       agg.n_and, agg.n_or,
       CAST(agg.n_and * 1000000 // agg.n_or AS BIGINT) AS jaccard_ppm
FROM agg
""",
)
def retrieval_boolean_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval THROUGH the inverted index: take the two
    lexicographically-first banded terms (a deterministic stand-in for
    a user query) and intersect/union their posting sets — AND count,
    OR count, and the posting-set Jaccard. This is the query-time half
    of ``text_postings``' build-time half: posting intersection is how
    every boolean/conjunctive retrieval engine answers AND queries, and
    the hit counts are the selectivity statistics a query planner keeps
    per term pair. Completes the registered IR stack: build
    (text_postings) -> score (text_bm25/tfidf) -> fuse
    (retrieval_rrf_hybrid) -> boolean (this).

    Plan: the banded term table is bounded (vocabulary², df-banded), so
    the 2-term pick is a rank-filter over it; postings probe via one
    equi-join of the (doc, term) pairs against the 2-row pick
    (broadcast), one doc-keyed aggregate, one 1-row roll-up — at 100 TB
    the intersection joins posting LISTS, never documents.
    """
    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(F.count(F.lit(1)).alias("n"))
    # r12: tokenize + bigram explode on a spread projection (guide §2.5)
    # and PIN the (doc, term) pair stream — TWO subtrees read it (the
    # df-band build and the postings probe), so unpinned the corpus
    # re-tokenized twice per run.
    td = (
        spread(d.select("doc_id", "text"), "doc_id")
        .selectExpr("doc_id", "split(text, ' ') AS toks")
        .selectExpr("doc_id", _BIGRAM_GEN_EXPR)
        .cache()
    )
    g = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    banded = (
        g.crossJoin(F.broadcast(nd))
        .filter(
            F.col("df").between(
                F.expr(_POSTINGS_LO.format(n="n").replace("//", "div")),
                F.expr(_POSTINGS_HI.format(n="n").replace("//", "div")),
            )
        )
        .select("term", "df")
    )
    w = Window.orderBy("term")
    pick = banded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    names = pick.groupBy().agg(
        F.max(F.when(F.col("rn") == 1, F.col("term"))).alias("term_a"),
        F.max(F.when(F.col("rn") == 2, F.col("term"))).alias("term_b"),
        F.max(F.when(F.col("rn") == 1, F.col("df"))).cast("long").alias("df_a"),
        F.max(F.when(F.col("rn") == 2, F.col("df"))).cast("long").alias("df_b"),
    )
    hits = (
        td.join(F.broadcast(pick), "term")
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("h1"),
            F.max(F.when(F.col("rn") == 2, 1).otherwise(0)).alias("h2"),
        )
    )
    agg = hits.agg(
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("n_and"),
        F.count(F.lit(1)).cast("long").alias("n_or"),
    )
    return (
        agg.crossJoin(F.broadcast(names))
        .select(
            "term_a",
            "term_b",
            "df_a",
            "df_b",
            "n_and",
            "n_or",
            F.expr("CAST(n_and * 1000000 div n_or AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )
