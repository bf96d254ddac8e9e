#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology mirrors BASELINE.md: one shared SparkSession for the whole run
(amortizes the ~1-2 s local[*] job overhead), timing includes full
materialization, 1 warm-up run then median of 3 timed runs per query.
Budgets: <=2x the DuckDB-oracle numbers in BASELINE.md.

Timing protocol: each timed run builds a FRESH DataFrame (fresh RDD
lineage, so every shuffle genuinely re-executes — re-collecting one
DataFrame would silently reuse completed shuffle stages). Three costs
are separated per run and published per query:

  * ``setup_sec`` — the registry callable itself (plan construction plus
    any eager side work a demo key does, e.g. the layout family writing
    its demo tables). Kept out of both planning and execution so a demo
    key's table write cannot masquerade as either.
  * ``plan_sec`` — Catalyst analysis/optimization/physical planning,
    forced via ``executedPlan()`` before the execution stopwatch starts.
    A fixed per-submission cost (~0.05-1 s per plan shape) that is noise
    against hours of execution at the 100 TB design point.
  * the execution median — ``toPandas()`` materialization only.

Cold vs steady state: queries that ``.cache()`` a shared intermediate
stage (knn_mmr_diversify, eval_rank_metrics, eval_ivf_nprobe_curve, the
minhash shingle family) keep that materialization in the session's
CacheManager, so their timed runs read the stage computed during
warm-up — analogous to DuckDB's warm buffer cache in the baseline. Both
costs are now columns: ``cold_sec`` (the warm-up run, fresh lineage +
first materialization) and the steady-state execution median, for EVERY
query, in BENCH_FULL.json.

Noise floor: local-mode job submission has a fixed overhead
(~0.1-0.15 s scheduling + stage launch + Arrow collect) that dominates
sub-0.2 s queries, and the shared driver host's load varies between
rounds. A fixed-cost calibration job (1M-row range agg through one
16-key shuffle) is timed at bench START, MIDDLE and END:
``floor_sec`` = median of all sentinel samples — subtract it before
comparing a small query against its DuckDB budget (rule in
BASELINE.md); ``noise_ratio`` = max/min of the three checkpoint
medians — when it is far from 1.0, the host was noisy DURING the run
and cross-round deltas of that magnitude are not plan regressions.

Noisy-host self-defense: when the main sweep's ``noise_ratio`` exceeds
``RETRY_NOISE_THRESHOLD`` (1.8 — r6's driver capture ran at 2.56 and
every cross-round delta that round was host noise), the headline rows
are re-timed ONCE after the main sweep under their own three-checkpoint
sentinel. Whichever pass has the lower noise ratio is the published
headline sample (timings/plan/setup/cold and the matching floor), and
the map is tagged ``retried: true`` with BOTH ratios
(``noise_ratio_initial`` / ``noise_ratio_retry``) plus
``retry_published`` so a reader can always tell which sample they are
looking at. Rule stated in BASELINE.md; fields pinned by
tests/test_bench_contract.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The 12 BASELINE.md headline metrics — the only per-query entries in the
# FINAL compact JSON line (the driver's tail capture is bounded; round 2's
# single 125-query line overflowed it and parsed as null). The full map goes
# to BENCH_FULL.json and an earlier stdout line.
HEADLINE_METRICS = {
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_rank_orders",
    "setops_segments",
    "events_tumbling_1d",
    "events_sessionize_30m",
    "events_json_extract",
    "doc_token_stats",
    "doc_exact_dedup",
    "emb_knn_top5",
    "asof_last_event_before_order",
    # canonical-layout twins (BASELINE.md round-2/3 notes): same queries over
    # engine-ingested multi-row-group table copies, so the scans split.
    "q1_pricing_summary_canonical",
    "events_json_extract_canonical",
}

# BASELINE.md metric name -> registry key (same query shape at the same sf).
# Keys not yet registered are skipped, so the bench degrades gracefully while
# coverage is still widening.
BENCH_QUERIES: list[tuple[str, str]] = [
    ("q1_pricing_summary", "agg_groupby"),
    ("q3_shipping_priority", "topk_limit"),
    ("q5_region_revenue", "join_multiway"),
    ("window_rank_orders", "win_rank"),
    ("setops_segments", "setop_intersect_except"),
    ("events_tumbling_1d", "stream_tumbling"),
    ("events_sessionize_30m", "stream_session"),
    ("events_json_extract", "json_funcs"),
    ("doc_token_stats", "text_stats"),
    ("doc_exact_dedup", "dedup_exact"),
    # top-k kNN is benched through its production kernel (block GEMM via
    # mapInPandas) — the expression-fold form stays registered for the
    # correctness gate and is tracked below as emb_knn_fold; both are
    # hash-checked to identical results (same precedent as the threshold
    # self-join).
    ("emb_knn_top5", "knn_gemm_topk"),
    ("asof_last_event_before_order", "join_asof"),
    # beyond-BASELINE headliners (no DuckDB budget line; recorded for trend)
    ("doc_minhash_dedup", "dedup_near_minhash"),
    ("doc_tfidf_top5", "text_tfidf"),
    ("doc_langid", "text_langid"),
    ("events_time_rollup", "agg_time_rollup"),
    ("emb_label_purity", "label_purity"),
    ("emb_knn_fold", "knn_cosine_topk"),
    # threshold self-join is benched through its production kernel (GEMM);
    # the expression-fold form knn_threshold_pairs stays registered for the
    # correctness gate but is ~25x slower and not the recommended path.
    ("emb_threshold_gemm", "knn_threshold_gemm"),
    ("events_salted_agg", "agg_salted_skew"),
    ("events_funnel", "events_funnel"),
    ("events_retention", "events_retention"),
    ("doc_pack_sequences", "pack_sequences"),
    ("doc_chunk_sliding", "text_chunk_sliding"),
    ("events_markov_transitions", "events_transitions"),
    ("graph_pagerank_3iter", "graph_pagerank"),
    ("ml_kmeans_2iter", "ml_kmeans_2iter"),
    ("events_attribution", "events_attribution"),
    ("emb_dedup_survivors", "dedup_near_embedding"),
    ("doc_vocab_oov", "text_vocab"),
    ("events_cms_heavy_hitters", "agg_cms_heavy_hitters"),
    ("orders_profile_columns", "profile_columns"),
    ("events_salted_join", "join_salted_skew"),
    ("graph_triangles", "graph_triangles"),
    ("doc_train_prep_funnel", "pipeline_train_prep"),
    ("orders_pit_join", "join_temporal_pit"),
    ("doc_repeated_spans", "text_repeated_spans"),
    ("emb_knn_quantized", "knn_quantized_topk"),
    ("orders_rfm_segments", "win_rfm_segments"),
    ("events_session_paths", "events_session_paths"),
    ("parts_abc_pareto", "win_abc_pareto"),
    ("events_dau_wau", "events_dau_wau"),
    ("parts_basket_lift", "graph_basket_lift"),
    ("events_user_entropy", "events_entropy"),
    ("events_welch_ttest", "agg_welch_ttest"),
    ("events_cusum_changepoint", "win_cusum_changepoint"),
    ("customers_gini", "agg_gini"),
    ("events_cuped", "events_cuped"),
    ("doc_bm25_top10", "text_bm25"),
    ("doc_paragraph_dedup", "dedup_paragraph_hash"),
    ("graph_kcore", "graph_kcore"),
    ("emb_knn_pq", "knn_pq_topk"),
    ("events_bitmap_distinct", "agg_bitmap_distinct"),
    ("events_ewma", "win_ewma"),
    ("doc_rrf_hybrid", "retrieval_rrf_hybrid"),
    ("orders_dq_constraints", "dq_constraints"),
    ("orders_decimal_rollup", "agg_decimal_exact"),
    ("events_rolling_stats", "win_rolling_stats"),
    ("events_ohlc_hourly", "ts_ohlc_resample"),
    ("events_interpolate_daily", "ts_interpolate_linear"),
    ("events_hll_rollup", "ts_hll_daily_merge"),
    ("doc_decontaminate", "decontaminate_ngram"),
    ("orders_drift_psi", "dq_drift_psi"),
    ("customers_cdc_merge", "merge_cdc_upsert"),
    ("orders_cohort_ltv", "orders_cohort_ltv"),
    ("parts_skyline", "skyline_pareto"),
    ("doc_containment_dedup", "dedup_containment"),
    ("doc_surprisal", "text_surprisal"),
    ("events_seasonality_hod", "ts_seasonality_hod"),
    ("orders_yoy_growth", "ts_yoy_growth"),
    ("parts_neighbor_jaccard", "graph_neighbor_jaccard"),
    ("emb_centroid_drift", "emb_centroid_drift"),
    ("customers_distribution_rank", "win_distribution"),
    ("doc_canonical_dedup", "dedup_exact_canonical"),
    ("assets_byte_dedup", "multimodal_dedup_bytes"),
    ("doc_surprisal_buckets", "text_surprisal_buckets"),
    ("events_cdc_compaction", "stream_cdc_latest"),
    ("events_rolling_median", "win_rolling_median"),
    ("events_wau_hll_sliding", "ts_wau_hll_sliding"),
    ("events_gap_islands", "win_gap_islands"),
    ("orders_open_backlog", "ts_open_backlog"),
    ("events_churn_flags", "ts_churn_flags"),
    ("emb_rank_eval", "eval_rank_metrics"),
    ("emb_pca_power", "emb_pca_power"),
    ("emb_mmr_diversify", "knn_mmr_diversify"),
    ("customers_null_safe_join", "join_null_safe"),
    ("events_map_hof", "map_higher_order"),
    ("events_bitwise_agg", "agg_bitwise"),
    ("doc_explode_outer", "explode_outer_nulls"),
    ("doc_mixture_resample", "sample_mixture_weights"),
    ("events_srm_guardrail", "events_srm_check"),
    ("events_wau_bitmap", "ts_wau_bitmap_sliding"),
    ("doc_surprisal_bigram", "text_surprisal_bigram"),
    ("doc_dedup_recall_eval", "eval_dedup_recall"),
    ("events_range_windows", "join_range_bucketed"),
    ("lineitem_grouping_levels", "agg_grouping_id"),
    ("assets_shard_plan", "multimodal_shard_plan"),
    ("doc_dataset_card", "pipeline_dataset_card"),
    ("orders_nested_roundtrip", "nested_roundtrip"),
    ("emb_knn_matryoshka", "knn_matryoshka_topk"),
    ("orders_zorder_layout", "layout_zorder"),
    ("graph_lpa_communities", "graph_label_propagation"),
    ("events_audience_overlap", "audience_overlap_bitmap"),
    ("graph_bfs_reach", "graph_bfs_levels"),
    ("events_p95_hist_sliding", "ts_hist_quantile_sliding"),
    ("events_audience_hll", "audience_overlap_hll"),
    ("events_json_variant", "json_variant"),
    ("orders_incremental_merge", "incremental_agg_merge"),
    ("orders_bloom_prefilter", "join_bloom_prefilter"),
    ("graph_cc_components", "graph_cc_alternating"),
    ("orders_ols_trend", "agg_ols_trend"),
    ("doc_naive_bayes", "ml_naive_bayes"),
    ("orders_median_exact", "agg_median_exact"),
    ("orders_group_split", "sample_group_split"),
    ("orders_join_ivm", "incremental_join_delta"),
    ("orders_quantiles_exact", "agg_quantiles_exact"),
    ("graph_modularity_lpa", "graph_modularity"),
    ("emb_knn_outliers", "emb_knn_outlier"),
    ("lineitem_cov_matrix", "agg_covariance_matrix"),
    ("events_mad_outliers", "agg_mad_outliers"),
    ("events_xcorr_leadlag", "ts_xcorr_leadlag"),
    ("events_up_streaks", "ts_up_streaks"),
    ("graph_det_walks", "graph_walks_det"),
    ("doc_per_lang_sample", "sample_per_group_fixed"),
    ("doc_incremental_dedup", "dedup_incremental_minhash"),
    ("doc_shared_spans", "dedup_shared_spans"),
    ("emb_semantic_dedup", "dedup_semantic_clustered"),
    ("doc_dsir_select", "sample_importance_dsir"),
    ("doc_epoch_shuffle", "layout_epoch_shuffle"),
    ("doc_gopher_rules", "text_gopher_rules"),
    ("emb_decontaminate", "decontaminate_semantic"),
    ("emb_decontaminate_tiled", "decontaminate_semantic_tiled"),
    ("customers_er_matching", "er_blocked_matching"),
    ("orders_schema_evolution", "schema_evolution_union"),
    ("customers_cdc_deletes", "merge_cdc_with_deletes"),
    ("doc_compaction_plan", "layout_compaction_plan"),
    ("orders_zonemap_skip", "layout_zonemap_skip"),
    ("doc_txn_optimize", "txn_optimize_table"),
    ("tpch_fk_integrity", "dq_referential_integrity"),
    ("events_hot_keys", "dq_hot_keys"),
    ("emb_calibration_bins", "eval_calibration_bins"),
    ("events_lttb_downsample", "ts_lttb_downsample"),
    ("orders_file_bloom", "layout_file_bloom"),
    ("doc_dedup_keep_best", "dedup_keep_best_quality"),
    ("emb_knn_hamming", "knn_hamming_topk"),
    ("events_concurrency_peak", "ts_concurrency_peak"),
    ("events_freshness", "dq_freshness"),
    ("events_partition_prune", "layout_partition_prune"),
    ("customers_golden_record", "er_golden_record"),
    ("orders_bucketed_join", "layout_bucketed_join"),
    ("emb_hard_negatives", "sample_hard_negatives"),
    ("doc_shingle_novelty", "text_shingle_novelty"),
    ("events_volume_anomaly", "dq_volume_anomaly"),
    ("asof_tolerance_attribution", "join_asof_tolerance"),
    ("emb_ivf_nprobe_curve", "eval_ivf_nprobe_curve"),
    ("orders_benford_audit", "dq_benford_first_digit"),
    ("orders_sequence_gaps", "dq_sequence_gaps"),
    ("orders_reconciliation", "dq_reconciliation"),
    ("parts_degree_assortativity", "graph_degree_assortativity"),
    ("emb_quantize_error", "emb_quantize_error"),
    ("doc_cdc_chunks", "text_cdc_chunks"),
    ("orders_snapshot_diff", "cdc_snapshot_diff"),
    ("cust_scd2_apply", "scd2_apply_changes"),
    ("events_drawdown", "win_drawdown"),
    ("emb_rerank_two_stage", "knn_rerank_two_stage"),
    ("emb_rerank_recall", "eval_rerank_recall"),
    ("parts_hits_counts", "graph_hits_counts"),
    ("events_max_silence", "ts_max_silence"),
    ("events_snaive_backtest", "ts_forecast_snaive_eval"),
    ("cust_er_quality", "eval_er_quality"),
    ("events_coverage_union", "ts_coverage_union"),
    ("cust_txn_time_travel", "txn_time_travel"),
    ("orders_schema_drift", "dq_schema_drift"),
    ("emb_whitening", "emb_whitening"),
    ("doc_source_rollup", "curation_source_rollup"),
    ("graph_closeness", "graph_closeness_sample"),
    ("doc_bpe_pair_counts", "text_bpe_pair_counts"),
    ("orders_priority_mode", "agg_mode_exact"),
    ("asof_next_event_forward", "join_asof_forward"),
    ("events_session_bounces", "win_session_bounces"),
    ("doc_temperature_mix", "sample_temperature_weights"),
    ("events_peak_days", "ts_peak_detection"),
    ("emb_sim_histogram", "emb_sim_histogram"),
    ("assets_resolution_buckets", "multimodal_resolution_buckets"),
    ("events_session_funnel", "events_session_funnel"),
    ("orders_above_avg", "filter_scalar_subquery"),
    ("nations_segment_listagg", "agg_string_agg"),
    ("orders_chi_square", "agg_chi_square"),
    ("events_cumulative_reach", "ts_cumulative_reach"),
    ("doc_bigram_topk", "text_ngram_topk"),
    ("doc_langid_confusion", "text_langid_confusion"),
    ("doc_length_percentiles", "text_length_percentiles"),
    ("doc_map_in_arrow", "udf_map_in_arrow"),
    ("orders_nth_value", "win_nth_value"),
    ("customers_bool_aggs", "bool_agg_funcs"),
    ("events_orc_roundtrip", "source_orc_roundtrip"),
    ("customers_merge_on_read", "layout_merge_on_read"),
    ("orders_join_fanout", "dq_join_fanout_histogram"),
    ("events_bot_suspects", "dq_bot_rate_suspects"),
]

RUNS = 3
SENTINEL_RUNS = 3
# Main-sweep noise_ratio above this triggers one headline re-time pass
# (r6 driver capture: 2.56; quiet-host runs sit at 1.0-1.3).
RETRY_NOISE_THRESHOLD = 1.8


def _floor_sentinel(spark) -> float:
    """Median seconds for one fixed-cost calibration job: a 1M-row range
    aggregated through a single 16-key shuffle, materialized via Arrow.
    The work term is negligible (~ms of JVM-side sum), so the measured
    time IS the local-mode fixed job overhead — scheduling, stage
    launch, shuffle setup, Arrow collect — plus whatever contention the
    shared host is under right now. Same session, same result path as
    every benched query."""
    import pyspark.sql.functions as F

    samples = []
    for _ in range(SENTINEL_RUNS):
        t0 = time.perf_counter()
        (
            spark.range(1_000_000)
            .groupBy((F.col("id") % 16).alias("g"))
            .agg(F.sum("id").alias("s"))
            .toPandas()
        )
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def _time_query(spark, fn, sf_dir: str) -> tuple[float, float, float, float]:
    """(exec median, plan median, setup median, cold sec) for one query;
    1 cold run (timed: this IS the fresh-lineage first-materialization
    cost, and the warm-up for JIT/codegen/footer caches) + RUNS timed."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).toPandas()
    cold = time.perf_counter() - t0
    samples, plan_samples, setup_samples = [], [], []
    for _ in range(RUNS):
        # setup: the registry callable — plan construction + any eager
        # demo side work (layout keys write their demo tables here)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        setup_samples.append(time.perf_counter() - t0)
        # plan: force analysis/optimization/physical planning
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan_samples.append(time.perf_counter() - t0)
        # exec: full materialization to Python via Arrow batches (the
        # idiomatic PySpark result path; DuckDB's fetchall() baseline
        # also materializes).
        t0 = time.perf_counter()
        df.toPandas()
        samples.append(time.perf_counter() - t0)
    return (
        statistics.median(samples),
        statistics.median(plan_samples),
        statistics.median(setup_samples),
        cold,
    )


def _canonical_dir(spark, tables: list[str]) -> str:
    """Re-ingest selected tables through the engine's canonical layout
    (8 files / 4 MB row groups) into a per-run unique temp sf-dir.

    BASELINE.md (round 2) root-caused q1's residual gap to the driver's
    single-600k-row-row-group lineitem file: Spark cannot split a scan
    below one row group, so the scan runs serial regardless of
    ``files.maxPartitionBytes`` — and the same applies to ``events``.
    The canonical ingest is how the engine itself would lay the tables
    out; the `*_canonical` metrics time the SAME queries over that
    layout. The uuid suffix keeps concurrent bench runs from clobbering
    each other's layout mid-timing; the caller removes the dir after use.
    """
    import tempfile
    import uuid

    out = os.path.join(
        tempfile.gettempdir(), f"bdp_bench_canonical_{uuid.uuid4().hex[:12]}"
    )
    from bangdatapipeline_spark.tables import load_table

    for name in tables:
        (
            load_table(spark, SF_DIR, name)
            .repartition(8)
            .write.mode("overwrite")
            .option("parquet.block.size", 4 * 1024 * 1024)
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
    return out


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    registry = load_all()
    spark = get_spark("bench")

    # Global JVM warm-up: the first executed query pays one-time JIT /
    # codegen-compiler costs that would otherwise be misattributed to it
    # (BASELINE.md's DuckDB numbers are warm-cache medians too).
    registry[BENCH_QUERIES[0][1]].fn(spark, SF_DIR).toPandas()

    floor_checkpoints = [_floor_sentinel(spark)]  # START

    timings: dict[str, float] = {}
    plan_secs: dict[str, float] = {}
    setup_secs: dict[str, float] = {}
    cold_secs: dict[str, float] = {}

    def _run_one(metric: str, fn, sf_dir: str) -> None:
        exec_s, plan_s, setup_s, cold_s = _time_query(spark, fn, sf_dir)
        timings[metric] = round(exec_s, 4)
        plan_secs[metric] = round(plan_s, 4)
        setup_secs[metric] = round(setup_s, 4)
        cold_secs[metric] = round(cold_s, 4)

    benchable = [(m, k) for m, k in BENCH_QUERIES if k in registry]
    midpoint = len(benchable) // 2
    for i, (metric, key) in enumerate(benchable):
        if i == midpoint:
            floor_checkpoints.append(_floor_sentinel(spark))  # MIDDLE
        _run_one(metric, registry[key].fn, SF_DIR)

    # q1 + events JSON extraction over the engine's canonical multi-row-group
    # layout (splittable scans); removed after the (possible) headline retry
    # so runs stay independent.
    import shutil

    _CANONICAL_ROWS = (
        ("q1_pricing_summary_canonical", "agg_groupby"),
        ("events_json_extract_canonical", "json_funcs"),
    )
    canon_dir = _canonical_dir(spark, ["lineitem", "events"])
    try:
        for metric, key in _CANONICAL_ROWS:
            _run_one(metric, registry[key].fn, canon_dir)

        floor_checkpoints.append(_floor_sentinel(spark))  # END

        noise_ratio_initial = round(
            max(floor_checkpoints) / min(floor_checkpoints), 3
        )
        floor_sec_initial = round(statistics.median(floor_checkpoints), 4)

        # Noisy-host self-defense (BASELINE.md rule): re-time the headline
        # rows once under their own sentinel and publish the lower-noise
        # sample. Non-headline rows keep the main-sweep sample (they have
        # no BASELINE budget line, so the floor rule never applies to them).
        retried = noise_ratio_initial > RETRY_NOISE_THRESHOLD
        retry_published = False
        noise_ratio_retry = None
        floor_sec = floor_sec_initial
        noise_ratio = noise_ratio_initial
        if retried:
            r_tim: dict[str, float] = {}
            r_plan: dict[str, float] = {}
            r_setup: dict[str, float] = {}
            r_cold: dict[str, float] = {}
            headline_rows = [
                (m, k, SF_DIR) for m, k in benchable if m in HEADLINE_METRICS
            ] + [(m, k, canon_dir) for m, k in _CANONICAL_ROWS]
            retry_checkpoints = [_floor_sentinel(spark)]  # retry START
            for i, (metric, key, d) in enumerate(headline_rows):
                if i == len(headline_rows) // 2:
                    retry_checkpoints.append(_floor_sentinel(spark))  # MID
                exec_s, plan_s, setup_s, cold_s = _time_query(
                    spark, registry[key].fn, d
                )
                r_tim[metric] = round(exec_s, 4)
                r_plan[metric] = round(plan_s, 4)
                r_setup[metric] = round(setup_s, 4)
                r_cold[metric] = round(cold_s, 4)
            retry_checkpoints.append(_floor_sentinel(spark))  # retry END
            noise_ratio_retry = round(
                max(retry_checkpoints) / min(retry_checkpoints), 3
            )
            if noise_ratio_retry < noise_ratio_initial:
                retry_published = True
                timings.update(r_tim)
                plan_secs.update(r_plan)
                setup_secs.update(r_setup)
                cold_secs.update(r_cold)
                floor_sec = round(statistics.median(retry_checkpoints), 4)
                noise_ratio = noise_ratio_retry
    finally:
        shutil.rmtree(canon_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    plan_total = round(sum(plan_secs.values()), 4)
    setup_total = round(sum(setup_secs.values()), 4)

    # Full per-query map: side file + an EARLY stdout line (anything long
    # must not be the final line — the driver's tail capture is bounded).
    full = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "plan_sec": plan_secs,
        "setup_sec": setup_secs,
        "cold_sec": cold_secs,
        "plan_sec_total": plan_total,
        "setup_sec_total": setup_total,
        "floor_sec": floor_sec,
        "floor_checkpoints": [round(s, 4) for s in floor_checkpoints],
        "noise_ratio": noise_ratio,
        "retried": retried,
        "retry_published": retry_published,
        "noise_ratio_initial": noise_ratio_initial,
        "noise_ratio_retry": noise_ratio_retry,
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps(full))

    # FINAL line: compact, driver-parseable — headline queries only.
    headline = {m: s for m, s in timings.items() if m in HEADLINE_METRICS}
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "plan_sec_total": plan_total,
                "setup_sec_total": setup_total,
                "floor_sec": floor_sec,
                "noise_ratio": noise_ratio,
                "retried": retried,
                "retry_published": retry_published,
                "noise_ratio_initial": noise_ratio_initial,
                "noise_ratio_retry": noise_ratio_retry,
                "n_queries_total": len(timings),
                "full_map": "BENCH_FULL.json",
                "sf": sf,
            }
        )
    )


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


if __name__ == "__main__":
    main()
