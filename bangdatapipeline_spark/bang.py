"""Bang experiment-batch analytics — the reference's own domain, Spark-first.

The reference (SURVEY.md §1.1, §3.1) is the analysis companion of the Bang
experiment platform: it fetches one nested JSON document per experiment
*batch* (batch -> rounds -> teams -> users, with per-round surveys and chat
logs nested inside), flattens the subtrees it needs with
``pandas.json_normalize``, applies user-registered per-question "processor"
callables, merges user/team metadata, and pivots to a wide (user, round)
analysis frame. This module is that exact workflow on Spark:

  * an EXPLICIT batch schema (``batch_schema()``) — schema-on-read, never
    inference, so a 100 TB cache dir is read in one pass with stable types;
  * ``load_batches`` — ``spark.read.json`` over the cache dir (one document
    per file or per line; the REST fetch that fills the cache is out of
    scope offline, exactly as in SURVEY §2.1);
  * normalizers (``surveys``, ``chats``, ``team_members``) — each one
    explode chain = one narrow Catalyst plan, no shuffle until the caller
    aggregates;
  * ``surveys_wide`` — the questions-as-columns pivot with an EXPLICIT
    question list (SURVEY §2.9: never let pivot scan for values);
  * ``apply_processors`` — per-question recodes as Column->Column
    functions, i.e. JVM-side expressions, not row-at-a-time Python
    (``likert5`` ships as the canonical example);
  * ``chat_stats`` — per (batch, round, team, user) message counts/lengths,
    the reference's chat aggregation.

Everything is lazy: load -> normalize -> recode -> pivot -> merge compiles
to ONE Catalyst plan per output frame. At 100 TB the cache dir is
hive-partitioned by batch date; the explode chains are narrow (parallelism
= input splits) and the only shuffles are the final pivot/merge keyed on
(batch_id, round, user_id) — co-partitioned, so the merge reuses the
pivot's exchange.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def batch_schema() -> StructType:
    """Explicit schema of one Bang batch document (the nested shape the
    reference's fetch step caches — SURVEY §1.1 table, 'Batch result')."""
    chat_msg = StructType(
        [
            StructField("user_id", StringType()),
            StructField("time", StringType()),  # ISO-8601; parsed in chats()
            StructField("message", StringType()),
        ]
    )
    survey_item = StructType(
        [
            StructField("user_id", StringType()),
            # question id -> raw answer string (Likert labels, free text,
            # numeric strings) — the processors recode these.
            StructField("answers", ArrayType(
                StructType(
                    [
                        StructField("q", StringType()),
                        StructField("answer", StringType()),
                    ]
                )
            )),
        ]
    )
    team = StructType(
        [
            StructField("team_id", StringType()),
            StructField("users", ArrayType(StringType())),
            StructField("chat", ArrayType(chat_msg)),
        ]
    )
    rnd = StructType(
        [
            StructField("index", IntegerType()),
            StructField("start_time", StringType()),
            StructField("end_time", StringType()),
            StructField("teams", ArrayType(team)),
            StructField("mid_surveys", ArrayType(survey_item)),
            StructField("post_surveys", ArrayType(survey_item)),
        ]
    )
    user = StructType(
        [
            StructField("user_id", StringType()),
            StructField("nickname", StringType()),
            StructField("payment", DoubleType()),
        ]
    )
    return StructType(
        [
            StructField("batch_id", StringType()),
            StructField("template", StringType()),
            StructField("team_size", IntegerType()),
            StructField("users", ArrayType(user)),
            StructField("rounds", ArrayType(rnd)),
        ]
    )


def load_batches(spark: SparkSession, cache_dir: str) -> DataFrame:
    """Read a cache dir of batch JSON documents with the explicit schema.

    ``multiLine`` handles pretty-printed one-document-per-file caches (the
    reference's cache layout); single-line JSONL works with the same call.
    """
    return spark.read.schema(batch_schema()).option("multiLine", True).json(cache_dir)


def users(raw: DataFrame) -> DataFrame:
    """Batch-level user dimension: one row per (batch_id, user_id)."""
    return raw.select(
        "batch_id", F.explode("users").alias("u")
    ).select("batch_id", "u.user_id", "u.nickname", "u.payment")


def team_members(raw: DataFrame) -> DataFrame:
    """(batch_id, round, team_id, user_id) membership — the join key that
    attaches team context to surveys and chat."""
    return (
        raw.select("batch_id", F.explode("rounds").alias("r"))
        .select("batch_id", F.col("r.index").alias("round"), F.explode("r.teams").alias("t"))
        .select("batch_id", "round", F.col("t.team_id").alias("team_id"),
                F.explode("t.users").alias("user_id"))
    )


def surveys(raw: DataFrame, kind: str = "mid") -> DataFrame:
    """Long survey frame: one row per (batch_id, round, user_id, q, answer).

    ``kind`` picks the mid-round or post-round survey subtree. This is the
    reference's json_normalize of the survey subtree — two explodes, both
    narrow."""
    if kind not in ("mid", "post"):
        raise ValueError(f"kind must be 'mid' or 'post', got {kind!r}")
    col = f"r.{kind}_surveys"
    return (
        raw.select("batch_id", F.explode("rounds").alias("r"))
        .select("batch_id", F.col("r.index").alias("round"), F.explode(col).alias("s"))
        .select("batch_id", "round", F.col("s.user_id").alias("user_id"),
                F.explode("s.answers").alias("a"))
        .select("batch_id", "round", "user_id",
                F.col("a.q").alias("q"), F.col("a.answer").alias("answer"))
    )


def surveys_wide(
    long: DataFrame,
    questions: list[str],
    processors: Mapping[str, Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Questions-as-columns pivot to the (batch_id, round, user_id) grain.

    ``questions`` is the EXPLICIT pivot value list (stable output schema; a
    pivot without one scans the data twice and its column set drifts with
    the input). ``processors`` recodes named question columns after the
    pivot — each is a Column->Column expression (JVM-side); unprocessed
    questions stay raw strings. One answer per (grain, q) is assumed, as in
    the reference; duplicates would surface as a count>1 under first().
    """
    wide = (
        long.groupBy("batch_id", "round", "user_id")
        .pivot("q", questions)
        .agg(F.first("answer"))
    )
    if processors:
        unknown = set(processors) - set(questions)
        if unknown:
            raise ValueError(f"processors for unknown questions: {sorted(unknown)}")
        for q, proc in processors.items():
            wide = wide.withColumn(q, proc(F.col(q)))
    return wide


def apply_processors(
    df: DataFrame, processors: Mapping[str, Callable[[Column], Column]]
) -> DataFrame:
    """Recode named columns in place (the reference's processor registry,
    applied column-wise). Pure projection — no shuffle, stays in codegen."""
    for name, proc in processors.items():
        df = df.withColumn(name, proc(F.col(name)))
    return df


def likert5(col: Column) -> Column:
    """Canonical 5-point Likert processor: label -> 1..5 int (NULL for
    unrecognized labels, the reference's NaN)."""
    mapping = {
        "strongly disagree": 1,
        "disagree": 2,
        "neutral": 3,
        "agree": 4,
        "strongly agree": 5,
    }
    canon = F.lower(F.trim(col))
    out = F.lit(None).cast("int")
    for label, score in reversed(mapping.items()):
        out = F.when(canon == label, F.lit(score)).otherwise(out)
    return out


def chats(raw: DataFrame) -> DataFrame:
    """Message-level chat frame: (batch_id, round, team_id, user_id, ts,
    message) — SURVEY §1.1's 'chat log' fact table."""
    return (
        raw.select("batch_id", F.explode("rounds").alias("r"))
        .select("batch_id", F.col("r.index").alias("round"), F.explode("r.teams").alias("t"))
        .select("batch_id", "round", F.col("t.team_id").alias("team_id"),
                F.explode("t.chat").alias("m"))
        .select("batch_id", "round", "team_id",
                F.col("m.user_id").alias("user_id"),
                F.to_timestamp("m.time").alias("ts"),
                F.col("m.message").alias("message"))
    )


def chat_stats(msgs: DataFrame) -> DataFrame:
    """Per (batch_id, round, team_id, user_id): message count, total/mean
    chars, first/last message time — the reference's chat aggregation.
    One shuffle on the full analysis grain."""
    return msgs.groupBy("batch_id", "round", "team_id", "user_id").agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.length("message")).alias("total_chars"),
        F.round(F.avg(F.length("message")), 2).alias("mean_chars"),
        F.min("ts").alias("first_msg"),
        F.max("ts").alias("last_msg"),
    )


def analysis_frame(
    raw: DataFrame,
    questions: list[str],
    processors: Mapping[str, Callable[[Column], Column]] | None = None,
    kind: str = "mid",
) -> DataFrame:
    """The reference's end deliverable: wide per-(user, round) survey frame
    merged with team membership and chat stats. Survey pivot, membership,
    and chat aggregation all key on (batch_id, round[, team], user_id), so
    the merges are co-partitioned with the pivot's shuffle."""
    wide = surveys_wide(surveys(raw, kind), questions, processors)
    members = team_members(raw)
    stats = chat_stats(chats(raw))
    return (
        wide.join(members, ["batch_id", "round", "user_id"], "left")
        .join(stats, ["batch_id", "round", "team_id", "user_id"], "left")
    )


def team_viability(
    raw: DataFrame, items: list[str] | None = None, kind: str = "mid"
) -> DataFrame:
    """Team-viability score — the headline metric of the Bang research
    line (Whiting et al., CSCW): each member's mean over the viability
    Likert items (recoded 1-5 via ``likert5``; unrecognized labels are
    NULL and drop out, the reference's NaN semantics), averaged across
    the team's respondents per (batch, round, team). ``n_resp`` counts
    members whose responses produced at least one recognized item.

    Plan: survey explode -> item filter -> two keyed aggregates on the
    analysis grain, co-partitioned with every other (batch, round,
    team) merge in ``analysis_frame``.
    """
    items = items or ["viable"]
    s = surveys(raw, kind).filter(F.col("q").isin(items))
    per_user = (
        s.select(
            "batch_id",
            "round",
            "user_id",
            likert5(F.col("answer")).alias("score"),
        )
        .groupBy("batch_id", "round", "user_id")
        .agg(F.avg("score").alias("user_mean"))
        .filter(F.col("user_mean").isNotNull())
    )
    members = team_members(raw)
    return (
        per_user.join(members, ["batch_id", "round", "user_id"])
        .groupBy("batch_id", "round", "team_id")
        .agg(
            F.count(F.lit(1)).alias("n_resp"),
            F.round(F.avg("user_mean"), 3).alias("viability"),
        )
    )


def turn_taking(msgs: DataFrame) -> DataFrame:
    """Turn-taking balance per (batch, round, team): message count,
    active-speaker count, the dominant speaker's share (ppm, exact
    integer), and the speaker-distribution entropy in nats (round 4) —
    0 = one voice, ln(team_size) = perfectly balanced. The
    conversational-equality signal the team-fracture analyses read off
    the chat log.

    Two keyed aggregates (per-speaker counts, then per-team roll-up);
    the entropy sum folds <= |members| terms per team.
    """
    per_user = msgs.groupBy("batch_id", "round", "team_id", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_team = per_user.groupBy("batch_id", "round", "team_id").agg(
        F.sum("c").cast("long").alias("n_msgs"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.expr("CAST(max(c) * 1000000 div sum(c) AS BIGINT)").alias(
            "top_share_ppm"
        ),
        # counts sorted in-row so the bounded fold order is deterministic
        F.array_sort(F.collect_list("c")).alias("cs"),
    )
    entropy = F.expr(
        "aggregate(cs, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc - (x / n_msgs) * ln(x / n_msgs))"
    )
    return per_team.select(
        "batch_id",
        "round",
        "team_id",
        "n_msgs",
        "n_active",
        "top_share_ppm",
        F.round(entropy, 4).alias("entropy_nats"),
    )


def response_latency(msgs: DataFrame) -> DataFrame:
    """Chat responsiveness per (batch, round, team): the number of
    inter-message gaps and their exact lower-median in seconds — the
    silence/latency signal (a viable team answers fast; a fractured one
    leaves long gaps). Messages are totally ordered by (ts, user_id,
    message) so equal timestamps cannot flip the gap sequence; teams
    with fewer than two messages have no gaps and emit no row.
    """
    w = Window.partitionBy("batch_id", "round", "team_id").orderBy(
        "ts", "user_id", "message"
    )
    gaps = (
        msgs.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "batch_id",
            "round",
            "team_id",
            "ts",
            "user_id",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
            ).alias("gap_s"),
        )
    )
    w_rank = Window.partitionBy("batch_id", "round", "team_id").orderBy(
        "gap_s", "ts", "user_id"
    )
    w_all = Window.partitionBy("batch_id", "round", "team_id")
    ranked = gaps.select(
        "batch_id",
        "round",
        "team_id",
        "gap_s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_gaps"),
    )
    return ranked.filter(F.col("rn") == F.expr("(n_gaps + 1) div 2")).select(
        "batch_id",
        "round",
        "team_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("gap_s").cast("long").alias("median_gap_s"),
    )
