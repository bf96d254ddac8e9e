"""Structured Streaming variants of the §2.11 operators.

Batch twins in ``operators.streaming_batch`` carry the hash-checked
semantics; this package runs the same logic as real streams via
file-source replay (``replay.py``) so tests can assert stream == batch.

Design notes for the cluster path:
  * Sources: at 100 TB the file source is swapped for Kafka (
    ``spark.readStream.format("kafka")``) — every query below only
    assumes a DataFrame with (event_id, ts, user_id, event_type, value),
    so the source is pluggable.
  * Watermarks bound state: each windowed aggregation holds only windows
    newer than (max event time - delay); session windows hold open
    sessions per user.
  * Output modes: append for watermarked aggs (finalized windows only),
    update for stateful counters.
  * Checkpointing: every query takes a checkpoint dir (RocksDB state
    store in production; local dir here).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bangdatapipeline_spark.operators.lattice import cents_col
from bangdatapipeline_spark.operators.streaming_batch import (
    SESSION_GAP_MIN,
    WATERMARK_DELAY,
)


def _event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ); the session tz is UTC so the
    cast is value-preserving."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_tumbling`` (append mode after watermark)."""
    return (
        _event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_sliding``."""
    return (
        _event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


def session_aggregate(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_session`` via native session windows.

    ``F.session_window(ts, gap)`` merges events whose gaps are < gap into
    one window per user — the same grouping the batch lag-gap kernel
    produces (gap-boundary ties: both treat gap == exactly 30 min as a
    new session, verified in tests).
    """
    return (
        _event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("user_id", "sess_start", "sess_end", "n_events", "sum_value")
    )


def dedup_stream(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_dedup``: exactly-once output from
    at-least-once input, state bounded by the watermark."""
    return _event_time(events).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def static_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Streaming twin of ``stream_static_join`` (stream-static join then
    windowless running aggregate; complete mode)."""
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cum", DoubleType())]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cum_value", DoubleType()),
        StructField("n_batches", IntegerType()),
    ]
)


def _count_state(key, pdf_iter, state: GroupState):
    """Per-user running counters kept in the state store."""
    n, cum = state.get if state.exists else (0, 0.0)
    batches = 0
    for pdf in pdf_iter:
        n += len(pdf)
        cum += float(pdf["value"].sum())
        batches += 1
    state.update((n, cum))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "cum_value": [round(cum, 2)],
            "n_batches": [batches],
        }
    )


def stateful_counts(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op: per-user counters via applyInPandasWithState
    (update mode). The final state equals the batch groupBy totals —
    asserted in tests."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _count_state,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _CounterProcessor(StatefulProcessor):
    """Spark 4 stateful processor: per-user running counters in a
    ValueState handle — the ``transformWithState`` twin of
    ``_count_state`` above. The handle-based API adds what
    applyInPandasWithState can't express: multiple named state variables,
    timers, and TTL per state (RocksDB-backed in production)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("counts", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, cum = self._state.get() if self._state.exists() else (0, 0.0)
        batches = 0
        for pdf in rows:
            n += len(pdf)
            cum += float(pdf["value"].sum())
            batches += 1
        self._state.update((n, cum))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cum_value": [round(cum, 2)],
                "n_batches": [batches],
            }
        )


def tws_available() -> bool:
    """True iff ``transformWithStateInPandas`` can run here: its state-
    server wire protocol needs ``protobuf`` in the Python env. When
    False, ``stateful_counts`` (applyInPandasWithState) is the documented
    same-semantics fallback — identical output schema and final state."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user counters via Spark 4 ``transformWithStateInPandas``
    (update mode, processing-time). Requires the RocksDB state store
    provider — set by the caller/test via
    ``spark.sql.streaming.stateStore.providerClass`` — and ``protobuf``
    in the Python env (``tws_available``); without it, use the
    ``stateful_counts`` twin."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_CounterProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def interval_join_streams(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_stream_join``: two watermarked streams
    (purchases, clicks) joined on user_id + a 30-minute interval. The
    interval condition lets the engine expire join state: each side holds
    only rows within (watermark - interval)."""
    ev = _event_time(events)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


def interval_left_join_streams(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_stream_left_join``: watermarked
    left-outer interval join. The engine holds a purchase in state until
    the watermark passes ``purchase_ts`` (its match window has closed),
    then emits it with NULL click columns if nothing matched — so outer
    results are late by exactly the watermark delay, and state per side
    is bounded by watermark + interval."""
    ev = _event_time(events)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
        "leftOuter",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


def interval_full_join_streams(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming twin of ``stream_stream_full_join``: watermarked
    full-outer interval join. Purchases are held until the purchase-side
    watermark closes their window (then emitted with NULL click columns
    if unmatched); clicks symmetrically on their side. Both states are
    bounded by watermark + interval — the full-outer case costs no more
    state than left-outer, it just expires BOTH sides with emission."""
    ev = _event_time(events)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.click_ts <= p.purchase_ts),
        "fullOuter",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce("user_id", "c_user_id").alias("user_id"),
        "purchase_ts",
        "click_ts",
    )


_CDC_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("val", DoubleType()),
    ]
)
_CDC_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("latest_value", DoubleType()),
    ]
)


def _cdc_latest_state(key, pdf_iter, state: GroupState):
    """Keyed latest-wins changelog compaction: keep the (ts, event_id)-max
    record per key in the state store, emit the current winner each
    update. The (ts_us, event_id) composite is the same total order the
    batch twin's row_number uses — no arrival-order dependence."""
    best = state.get if state.exists else (-1, -1, 0.0)
    for pdf in pdf_iter:
        for ts_us, eid, val in zip(
            pdf["ts"].astype("int64"), pdf["event_id"], pdf["value"]
        ):
            cand = (int(ts_us), int(eid), float(val))
            if cand[:2] > best[:2]:
                best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts_us": [best[0]],
            "event_id": [best[1]],
            "latest_value": [round(best[2], 2)],
        }
    )


def cdc_latest(events: DataFrame) -> DataFrame:
    """Streaming CDC compaction: per-user latest purchase maintained in
    the state store (update mode) — the streaming twin of the batch
    ``stream_cdc_latest`` compaction that feeds ``merge_cdc_upsert``.
    Each micro-batch emits the keys it touched with their current
    winner; a downstream foreachBatch MERGE applies them to the base
    table incrementally."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cdc_latest_state,
            outputStructType=_CDC_OUT_SCHEMA,
            stateStructType=_CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def daily_value_histogram(events: DataFrame) -> DataFrame:
    """Streaming twin of ``ts_hist_quantile_sliding``'s grid stage: the
    (day, bin) count grid maintained as a streaming aggregate. The grid is
    the STATE (30 x 50 rows regardless of event volume), which is why the
    sliding-quantile query streams cheaply: each micro-batch updates a few
    grid cells; the quantile tail re-runs over the tiny grid in
    foreachBatch (``operators.timeseries.hist_quantiles``), exactly like
    the top-k leaderboard re-rank."""
    from bangdatapipeline_spark.operators.timeseries import _HQ_BIN_W, _HQ_BINS

    return (
        _event_time(events)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.least(F.floor(F.col("value") / _HQ_BIN_W), F.lit(_HQ_BINS - 1))
            .cast("int")
            .alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("day"), "bin", "cnt")
    )


def freshness_state(events: DataFrame) -> DataFrame:
    """Streaming feed-freshness STATE: per event_type running count and
    max(ts) — the state behind ``dq_freshness``. The state is |feeds|
    rows regardless of event volume; the lag-vs-freshest derivation
    (global max, minutes, staleness flag) runs read-side over that tiny
    state (the stream_topk re-rank pattern), because folding the global
    max INTO the aggregate would make every per-feed update a global
    one. At 100 TB this is the canonical always-on ops monitor: one
    streaming max per feed, dashboard derives the rest."""
    return (
        _event_time(events)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ts"))
    )


def daily_type_counts(events: DataFrame) -> DataFrame:
    """Streaming daily-volume STATE: per (event_type, day) running event
    count — the tumbling rollup behind ``dq_volume_anomaly``. State is
    |feeds| x |days| rows regardless of volume; the trailing-median/MAD
    anomaly projection runs read-side over that state
    (``dataquality.volume_anomaly_from_daily``), because the robust
    band needs each feed's trailing days TOGETHER, which is a window
    over the tiny state, not over the stream."""
    return (
        _event_time(events)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type", F.to_date(F.col("w.start")).alias("day"), "n"
        )
    )


_DD_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cum", LongType()),
        StructField("peak", LongType()),
        StructField("maxdd", LongType()),
    ]
)
_DD_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("peak_cents", LongType()),
        StructField("max_drawdown_cents", LongType()),
        StructField("final_cents", LongType()),
    ]
)


def _drawdown_state(key, pdf_iter, state: GroupState):
    """Per-user running drawdown fold: (n, cum, peak, maxdd) integer cents
    carried in the state store. Rows are sorted by (ts, event_id) WITHIN
    each micro-batch before folding — combined with in-order batch
    replay this walks the same total order as the batch window, and all
    arithmetic is exact BIGINT, so the final state is bit-equal to
    ``win_drawdown``'s per-user row."""
    import math

    n, cum, peak, maxdd = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        for val in pdf["value"]:
            cents = int(math.floor(val * 100 + 0.5))
            n += 1
            cum += cents
            if cum > peak:
                peak = cum
            dd = peak - cum
            if dd > maxdd:
                maxdd = dd
    state.update((n, cum, peak, maxdd))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "peak_cents": [peak],
            "max_drawdown_cents": [maxdd],
            "final_cents": [cum],
        }
    )


def drawdown_levels(events: DataFrame) -> DataFrame:
    """Streaming twin of ``win_drawdown``: the cumulative purchase curve,
    its running peak and the max drawdown maintained per user in the
    state store (update mode) — the always-on risk monitor version of
    the batch window. State is 4 BIGINTs per user regardless of event
    volume; every micro-batch emits the current levels for the users it
    touched."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _drawdown_state,
            outputStructType=_DD_OUT_SCHEMA,
            stateStructType=_DD_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TWAP_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_cents", LongType()),
        StructField("n_seg", LongType()),
        StructField("span", LongType()),
        StructField("wsum", LongType()),
    ]
)
_TWAP_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_segments", LongType()),
        StructField("span_us", LongType()),
        StructField("wsum_cents_us", LongType()),
    ]
)


def _twap_state(key, pdf_iter, state: GroupState):
    """Per-feed TWAP fold: carry (last event's epoch-µs and cents, plus
    the running Σ cents·gap_µs and Σ gap_µs) in the state store. Rows
    are sorted by (ts, event_id) within each micro-batch; with in-order
    replay the fold closes exactly the segments the batch ``ts_twap``
    window's lead() defines, in exact BIGINT arithmetic — the open
    segment (last event, no successor yet) is correctly NOT counted,
    which is the batch operator's half-open convention."""
    import math

    last_us, last_cents, n_seg, span, wsum = (
        state.get if state.exists else (-1, 0, 0, 0, 0)
    )
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        us_arr = pdf["ts"].astype("datetime64[us]").astype("int64")
        for us, val in zip(us_arr, pdf["value"]):
            cents = int(math.floor(val * 100 + 0.5))
            if last_us >= 0:
                gap = int(us) - last_us
                n_seg += 1
                span += gap
                wsum += last_cents * gap
            last_us, last_cents = int(us), cents
    state.update((last_us, last_cents, n_seg, span, wsum))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_segments": [n_seg],
            "span_us": [span],
            "wsum_cents_us": [wsum],
        }
    )


def twap_levels(events: DataFrame) -> DataFrame:
    """Streaming twin of ``ts_twap``: the time-weighted-average
    accumulators maintained per event_type in the state store (update
    mode) — the always-on market-data version of the batch window.
    State is 5 BIGINTs per feed regardless of volume; each micro-batch
    emits the running (n_segments, span_us, Σcents·µs) for the feeds it
    touched, and twap_cents = wsum div span is a read-side projection
    over |feeds| rows."""
    return (
        events.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _twap_state,
            outputStructType=_TWAP_OUT_SCHEMA,
            stateStructType=_TWAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def daily_cents(events: DataFrame) -> DataFrame:
    """Streaming daily-revenue STATE: per (event_type, day) running exact
    cents total — the tumbling rollup behind ``ts_forecast_snaive_eval``.
    State is |feeds| x |days| rows regardless of volume; the
    seasonal-naive backtest (day-7 self-join, MAE/bias) runs read-side
    over that tiny state (``timeseries.snaive_backtest_from_daily``) —
    the same state-plus-read-side split as the volume-anomaly monitor,
    because the backtest needs each feed's day pairs TOGETHER."""
    return (
        _event_time(events)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.sum(cents_col(F.col("value"))).alias("cents"))
        .select(
            "event_type", F.to_date(F.col("w.start")).alias("day"), "cents"
        )
    )


_SCD2_STATE_SCHEMA = StructType(
    [StructField("ord", LongType()), StructField("new_bal", LongType())]
)
_SCD2_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("ord", LongType()),
        StructField("new_bal", LongType()),
    ]
)


def _scd2_latest(key, pdf_iter, state: GroupState):
    """Keyed latest-version state: keep the (ord, new_bal) with the
    highest (ord, new_bal) seen for this dimension key, emitting the
    current winner on every update — lexicographic argmax over BOTH
    columns (ADVICE r7: an ord-only argmax with idxmax keeps the first
    row in arrival order on ties, so two revisions sharing an _ord
    would make the outcome arrival-dependent; the new_bal tie-break
    makes it a pure function of the row multiset)."""
    best_ord, best_bal = state.get if state.exists else (-1, 0)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        for o, b in zip(pdf["_ord"], pdf["new_bal"]):
            if (int(o), int(b)) > (best_ord, best_bal):
                best_ord, best_bal = int(o), int(b)
    state.update((best_ord, best_bal))
    yield pd.DataFrame(
        {"key": [key[0]], "ord": [best_ord], "new_bal": [best_bal]}
    )


def first_seen_state(events: DataFrame) -> DataFrame:
    """Streaming twin of ``ts_cumulative_reach``'s state half: per-user
    FIRST-seen day maintained as a streaming min aggregate (complete
    mode — the state is |users| rows of one date each, the minimal
    state any reach metric can carry). The day-spine cumsum runs
    read-side over it (``timeseries.reach_from_first_seen``), because
    the curve needs all users' first days together — the same
    state-plus-read-side split as the volume/freshness monitors."""
    return (
        _event_time(events)
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d0"))
    )


def scd2_snapshot_state(snapshot_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``scd2_apply_changes``' state half: the incoming
    dimension snapshot arrives as keyed version rows ``(key, new_bal,
    _ord)`` (a CDC feed of snapshot revisions); per-key state keeps the
    LATEST version (argmax ord). The SCD2 classify + version-row build
    is read-side over that state via
    ``operators.incremental.scd2_result(dim, state)`` — the same
    state-plus-read-side split as the CDC merge sinks, because the merge
    needs each key's final snapshot value, not its arrival history.
    State is 2 BIGINTs per dimension key regardless of revision volume
    (RocksDB-backed on a cluster); replay equality is pinned in
    tests/test_streaming.py::test_scd2_apply_stream_equals_batch."""
    return snapshot_stream.groupBy("key").applyInPandasWithState(
        _scd2_latest,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Twin registry: batch registry key -> streaming twin entry point
# ---------------------------------------------------------------------------
# Every registry key tagged ``stream_twin`` maps here to the Structured
# Streaming construction that replays to the same final result as the
# hash-checked batch operator. Enumerated (not derived) so the audit test
# in tests/test_streaming.py fails loudly when a new stateful batch twin
# is registered without its streaming counterpart — the list IS the claim
# that a replay-equivalence test exists for each entry.
def _stream_twins():
    from bangdatapipeline_spark.streaming import sinks

    return {
        "stream_tumbling": tumbling_counts,
        "stream_sliding": sliding_counts,
        "stream_session": session_aggregate,
        "stream_dedup": dedup_stream,
        "stream_static_join": static_enrich,
        # the late-data batch diagnostic replays through the watermarked
        # tumbling aggregate (the watermark IS the operator under test)
        "stream_late": tumbling_counts,
        "stream_stateful": stateful_counts,
        "stream_stream_join": interval_join_streams,
        "stream_stream_left_join": interval_left_join_streams,
        "stream_stream_full_join": interval_full_join_streams,
        # complete-mode aggregate + foreachBatch re-rank (leaderboard)
        "stream_topk": tumbling_counts,
        "stream_cdc_latest": cdc_latest,
        "ts_hist_quantile_sliding": daily_value_histogram,
        "incremental_agg_merge": sinks.incremental_state_merge_sink,
        "incremental_join_delta": sinks.incremental_join_view_sink,
        "merge_cdc_with_deletes": sinks.cdc_merge_sink,
        # upsert-only CDC runs through the same sink; the changelog just
        # carries no tombstones (is_delete = false for every row)
        "merge_cdc_upsert": sinks.cdc_merge_sink,
        # CDC merge landing in the transactional table format: the
        # (app_id, version=batch_id) txn stamp gives exactly-once
        "txn_cdc_merge_table": sinks.txn_table_merge_sink,
        # freshness monitor: streaming per-feed (count, max ts) state;
        # the lag/staleness projection is read-side over |feeds| rows
        "dq_freshness": freshness_state,
        # volume monitor: tumbling daily counts are the state; the
        # trailing-median/MAD projection runs read-side over it
        "dq_volume_anomaly": daily_type_counts,
        # running drawdown levels: 4-BIGINT per-user state, exact-cents
        # fold in (ts, event_id) order
        "win_drawdown": drawdown_levels,
        # running TWAP accumulators: 5-BIGINT per-feed state, exact
        # cents·µs fold in (ts, event_id) order; twap = wsum div span
        # is a read-side projection
        "ts_twap": twap_levels,
        # seasonal-naive backtest: tumbling daily cents are the state;
        # the day-7 MAE/bias projection runs read-side over it
        "ts_forecast_snaive_eval": daily_cents,
        # SCD2 apply: keyed latest-version snapshot state; the classify +
        # version-row merge runs read-side (scd2_result) over it
        "scd2_apply_changes": scd2_snapshot_state,
        # snapshot diff: the B dump arrives in slices; foreachBatch
        # accumulates it against the previous batch's state table, the
        # A-vs-B classify runs read-side (snapshot_diff_result)
        "cdc_snapshot_diff": sinks.snapshot_accumulate_sink,
        # cumulative reach: per-user first-seen day is the state; the
        # day-spine cumsum runs read-side (reach_from_first_seen)
        "ts_cumulative_reach": first_seen_state,
        # seasonal decomposition: tumbling daily counts are the state
        # (same state as the volume monitor); the trend/seasonal/residual
        # projection runs read-side (seasonal_decompose_from_daily)
        "ts_seasonal_decompose": daily_type_counts,
        # funnel position: per-user (view, click, purchase) stage
        # timestamps as 3-BIGINT state; the latency histogram runs
        # read-side over completers (convert_hist_from_secs)
        "events_time_to_convert_hist": funnel_state,
        # two-sample tests: per-value class counts are the state
        # (order-insensitive); rank/CDF statistics run read-side
        "agg_mann_whitney": value_class_counts,
        "agg_ks_test": value_class_counts,
        # incremental inverted-index maintenance: per-term (df, min-20
        # ids) is a monoid, merged per batch in foreachBatch; the
        # corpus-relative df band runs read-side (postings_result)
        "text_postings": sinks.postings_index_sink,
    }


# (evaluated at end of module so every twin entry point is defined)


_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),
        StructField("t_purch", LongType()),
    ]
)
_FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_us", LongType()),
        StructField("click_us", LongType()),
        StructField("purch_us", LongType()),
    ]
)


def _funnel_state(key, pdf_iter, state: GroupState):
    """Per-user funnel state machine: first view, first click at-or-after
    it, first purchase at-or-after that — three epoch-microsecond
    BIGINTs (-1 = stage not reached). Rows are sorted by (ts, event_id)
    within each micro-batch; combined with in-order replay the walk sees
    events in the batch window's total order, under which each stage
    timestamp is set exactly once and equals the batch min (a later
    event can never lower an earlier stage's min when time only moves
    forward), so the final state is bit-equal to the batch funnel."""
    t_view, t_click, t_purch = state.get if state.exists else (-1, -1, -1)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
        for et, us in zip(pdf["event_type"], ts_us):
            us = int(us)
            if et == "view" and t_view < 0:
                t_view = us
            elif et == "click" and t_view >= 0 and t_click < 0 and us >= t_view:
                t_click = us
            elif (
                et == "purchase"
                and t_click >= 0
                and t_purch < 0
                and us >= t_click
            ):
                t_purch = us
    state.update((t_view, t_click, t_purch))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "view_us": [t_view],
            "click_us": [t_click],
            "purch_us": [t_purch],
        }
    )


def funnel_state(events: DataFrame) -> DataFrame:
    """Streaming twin STATE of ``events_time_to_convert_hist`` (and the
    stage-count half of ``events_funnel``): the per-user funnel position
    as three BIGINTs in the state store, regardless of event volume.
    The latency histogram runs read-side over completed users
    (``streaming_batch.convert_hist_from_secs``), because bucket shares
    need all completers together — the usual state-plus-read-side
    split."""
    return (
        events.filter(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_state,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )



def value_class_counts(events: DataFrame) -> DataFrame:
    """Streaming per-value class-count STATE shared by the two-sample
    test twins (Mann-Whitney, KS): per cents value, how many click (A)
    vs view (B) events — a plain streaming aggregate in complete mode,
    state bounded by the distinct-value lattice regardless of volume.
    Counts are order-insensitive, so these twins need no ordered
    replay; the rank/CDF statistics run read-side over the state
    (``aggregates.mann_whitney_from_counts`` / ``ks_from_counts``)
    because they need the whole support together."""
    x = events.where(
        F.col("event_type").isin("click", "view")
    ).select(
        cents_col(F.col("value")).alias("cents"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
    )
    return x.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("bigint").alias("n_b"),
    )


STREAM_TWINS = _stream_twins()
