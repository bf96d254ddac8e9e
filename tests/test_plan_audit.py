"""Registry-wide physical-plan audit.

tests/test_plans.py asserts precise plan shapes for showcase queries; this
module sweeps EVERY registered query's physical plan (no execution) and
enforces the engine-wide anti-pattern bans from SURVEY.md §4 / VERDICT r1:

  * no row-at-a-time Python UDFs anywhere (``BatchEvalPython``) — Python
    must enter plans only Arrow-batched (``ArrowEvalPython`` /
    ``MapInPandas`` / ``FlatMapGroupsInPandas`` / UDTF);
  * cartesian products only where a bounded all-pairs form IS the operator
    (exact ground-truth baselines, scalar-broadcast crossJoins) — each one
    allowlisted by key with the reason in REGISTRY docstrings;
  * every query must plan (analysis errors can't hide until the driver).

Planning ~200 queries is pure Catalyst work (~0.1 s each, no jobs), so the
sweep stays cheap while guaranteeing the bans hold for every FUTURE
operator too — a new query that sneaks in a row UDF or an unbounded
crossJoin fails here, not in round review.
"""

from __future__ import annotations

import pytest

from bangdatapipeline_spark.registry import load_all

# Full-registry sweep: deselectable for the fast iteration path
# (pytest -m "not sweep"); the default run still includes it.
pytestmark = pytest.mark.sweep

# Keys whose plan legitimately contains a cartesian product: either the
# all-pairs form IS the declared semantics (bounded exact baselines the
# approximate paths are graded against), or the crossJoin attaches a
# 1-row/handful-row scalar aggregate (broadcast, no data blowup).
CARTESIAN_OK = {
    "join_cross",  # the cartesian operator itself (small x small)
    "knn_cosine_topk",  # exact brute-force baseline (broadcast query side)
    "knn_threshold_pairs",  # exact all-pairs baseline (vec_id-bounded)
    # knn_matryoshka_topk runs the same declared pair pass, but its plan
    # truncates at a localCheckpoint LogicalRDD (round 9: pin the pair
    # table without CacheManager leakage), so the BNLJ is not visible to
    # this audit — the pair-pass shape is asserted by
    # test_similarity.py instead.
    "knn_hamming_topk",  # broadcast packed query side (knn pattern)
    "eval_ivf_nprobe_curve",  # 3-row nprobe config spine, range-joined (min_cr <= n)
    "knn_mmr_diversify",  # candidate re-rank over the exact pair set
    "dedup_near_jaccard",  # bounded exact ground truth (EXACT_BOUND)
    "eval_dedup_recall",  # grades detectors against exact ground truth
    "emb_pca_power",  # 1-row eigvec estimate crossJoined into projections
    "ml_kmeans_2iter",  # k-centroid array broadcast as a 1-row crossJoin
    "graph_triangles",  # 1-row |V|/|E| scalars crossJoined into the output
    "graph_pagerank",  # 1-row |V| scalar (lazy n_nodes agg) crossJoined per round
    "graph_basket_lift",  # 1-row n_orders scalar crossJoined
    "events_cuped",  # 1-row theta/covariance scalars crossJoined
    "ts_churn_flags",  # corpus as-of anchor (1-row max ts) crossJoined
    "ts_hist_quantile_sliding",  # day spine x 50-bin broadcast grid
    "pipeline_dataset_card",  # datasheet: few-row section scalars combined
    "dq_drift_psi",  # fixed 10-bin spine crossJoined to shard stats
    "text_surprisal_buckets",  # 1-row tercile cut points crossJoined
    "text_bm25",  # 1-row corpus avgdl/N scalars crossJoined
    "retrieval_rrf_hybrid",  # same BM25 scalars inside the lexical leg
    "text_surprisal",  # 1-row vocab-size/total-token scalars
    "text_surprisal_bigram",  # 1-row smoothing scalars
    "join_bloom_prefilter",  # 1-row bloom bit-set broadcast onto the fact scan
    "ml_naive_bayes",  # per-lang model rows (bounded by |langs|) broadcast
    "graph_modularity",  # 1-row edge-count scalar crossJoined into terms
    "graph_closeness_sample",  # ~|seeds|-row bit spine broadcast onto node masks
    # (bit-test join decodes the bit-parallel BFS; bounded by the seed sample)
    "ts_xcorr_leadlag",  # 5-row lag spine crossJoined onto the bounded daily table
    "text_langid",  # language-profile constant table broadcast
    "text_langid_confusion",  # composes text_langid: inherits its constant
    # language-profile broadcast (same declared pattern, composed plan)
    "text_tfidf",  # 1-row corpus-size scalar for the IDF term
    "win_rfm_segments",  # 1-row quintile cut points crossJoined
    "dedup_semantic_clustered",  # k-centroid array broadcast as a 1-row crossJoin
    "eval_semantic_recall",  # centroid-array + 2 scalar-counter 1-row crossJoins
    "sample_importance_dsir",  # 1-row corpus-total scalars crossJoined into the model
    "events_dau_wau",  # ~30-row day spine, trailing-7d range predicate
    "ts_wau_bitmap_sliding",  # same day-spine range join (bitmap path)
    "ts_wau_hll_sliding",  # same day-spine range join (HLL path)
    "dq_referential_integrity",  # two 1-row aggregates combined per FK relation
    "dq_hot_keys",  # 1-row denominator aggregate crossJoined onto top-5 rows
    "eval_calibration_bins",  # 1-row min/max scalar crossJoined for the bin cut
    "dq_freshness",  # 1-row global-max scalar crossJoined onto per-type rows
    "layout_file_bloom",  # #files x 21-row broadcast probe grid (declared)
    "dq_sequence_gaps",  # 1-row key-extremes scalar crossJoined onto boundary keys
    "graph_degree_assortativity",  # 1-row co-moment + count scalars combined
    "eval_er_quality",  # three 1-row metric counters combined into one row
    "curation_source_rollup",  # composes text_surprisal_buckets' 1-row cuts
    "sample_temperature_weights",  # 1-row corpus-total scalars crossJoined
    "pipeline_token_budget_schedule",  # same 1-row sqrt-total scalar crossJoin
    "filter_scalar_subquery",  # 1-row avg threshold broadcast into the filter
    "agg_chi_square",  # 1-row total + dof scalar crossJoins
    "surv_kaplan_meier",  # 1-row censoring-horizon scalar (max orderdate) crossJoined
    "events_diff_in_diff",  # 1-row window-midpoint scalar crossJoined
    "text_postings",  # 1-row corpus-count scalar for the relative df band
    "stats_permutation_test",  # 1-row observed-statistic + midpoint scalars
    "stats_quantile_treatment",  # 4-row percentile spine range-joined to the CDF
    "sample_balanced_classes",  # 1-row min-class-count scalar crossJoined
    "eval_kmeans_quality",  # composes ml_kmeans_2iter's k-centroid broadcast
    # + its own 1-row total scalar
    "agg_aging_buckets",  # 1-row horizon scalar (max orderdate) crossJoined
    "privacy_k_anonymity",  # 1-row row-total scalar crossJoined
    "privacy_l_diversity",  # 1-row group-count scalar crossJoined
    "eval_markov_next",  # 1-row window-midpoint scalar crossJoined
    "text_collocation_pmi",  # two 1-row corpus-total scalars crossJoined
    "retrieval_boolean_index",  # 1-row corpus-count + 1-row query pivot scalars
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for key, q in load_all().items():
        df = q.fn(spark, "/root/testdata/sf0.001")
        out[key] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_every_query_plans(plans):
    assert len(plans) >= 208


def test_no_row_at_a_time_python_udfs(plans):
    bad = [k for k, p in plans.items() if "BatchEvalPython" in p]
    assert bad == [], f"row-at-a-time Python UDF in: {bad}"


def test_cartesian_products_only_where_declared(plans):
    found = {k for k, p in plans.items()
             if "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p}
    undeclared = sorted(found - CARTESIAN_OK)
    assert undeclared == [], f"undeclared cartesian/BNLJ in: {undeclared}"
    stale = sorted(CARTESIAN_OK - found)
    assert stale == [], (
        f"allowlist entries no longer needed (tighten the list): {stale}"
    )
