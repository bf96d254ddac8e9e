#!/usr/bin/env python
"""Regenerate docs/PLANS.md — formatted physical plans for the headline
queries, the artifact behind the 100 TB design claims: broadcast joins
where a side is small, PushedFilters/ReadSchema at the scans, Exchange
counts matching the documented shuffle budgets, WholeStageCodegen spans
over the hot paths.

Run from the repo root:  python scripts/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (key, why this plan is worth reading)
SHOWCASE: list[tuple[str, str]] = [
    ("agg_groupby", "flagship Q1 shape: partial→final agg, filters+pruning at the scan"),
    ("join_multiway", "6-table snowflake: every dim broadcast, one fact exchange"),
    ("win_topk_per_group", "WindowGroupLimit prunes to k rows per group before the sort"),
    ("topk_limit", "global top-k as TakeOrderedAndProject (no full sort)"),
    ("knn_threshold_gemm", "tiled GEMM self-join: grouped-map kernel per block-pair tile, no driver collect"),
    ("dedup_near_minhash", "LSH band join moves (key, id) only; payload rejoined per candidate"),
    ("graph_pagerank", "3 Pregel rounds: broadcast ranks onto cached edges, no SMJ"),
    ("ml_kmeans_2iter", "in-row candidate-fold assignment (zero-shuffle rounds); k×dims update shuffle"),
    ("sample_split", "md5-gate in the scan stage; agg on lang×split keys"),
    ("events_gapfill", "grid generated at the executor; two windows reuse one partitioning"),
    ("graph_triangles", "degree-oriented adjacency intersection: triangles close in-row, no wedge shuffle"),
    ("pipeline_train_prep", "4-stage prep funnel in one lazy plan; GEMM dedup stage"),
    ("join_temporal_pit", "broadcast SCD2 history, range residual on the hash join"),
    ("text_repeated_spans", "in-row span forming; map-side combine; TakeOrdered top-k"),
    ("agg_cms_heavy_hitters", "256-cell sketch agg; broadcast estimate lookup"),
    ("ts_ohlc_resample", "whole bar from one aggregate: struct min/max picks, single exchange"),
    ("decontaminate_ngram", "distinct shingle-key equi-join; no document pairing"),
    ("emb_pca_power", "matrix-free power iteration: in-row projections, 64-key update shuffle"),
    ("skyline_pareto", "aggregated sort-sweep + broadcast rejoin (never the O(n²) NOT EXISTS)"),
    ("merge_cdc_upsert", "changelog-sized compaction window, then one full-outer merge join"),
    ("audience_overlap_bitmap", "events collapse to bitmap words once; pair overlap is a word-aligned AND join"),
    ("layout_zorder", "Morton code is narrow bit arithmetic; one bounded per-bucket stats exchange"),
    ("ts_hist_quantile_sliding", "sliding quantiles on a (day, bin) grid; RANGE frames over the spine"),
    ("graph_label_propagation", "2 LPA supersteps: per-round node-keyed join + bounded (node,label) agg"),
    ("knn_matryoshka_topk", "prefix + full sims in ONE broadcast pair pass; per-row norms precomputed"),
    ("join_bloom_prefilter", "bloom bit-set broadcast onto the fact scan; only the 7-row rollup shuffles"),
    ("incremental_agg_merge", "both sides partial-agg before the union; final shuffle moves state rows only"),
    ("agg_ols_trend", "regression via power sums: two-level agg, facts reduce map-side to (group,month)"),
    ("agg_median_exact", "exact median, no global sort: histogram pass + broadcast-gated bucket re-scan"),
    ("ml_naive_bayes", "NB train+score in one plan: model tables broadcast, per-(doc,lang) partial aggs"),
    ("ts_xcorr_leadlag", "facts reduce once to (type,day); lag joins + power sums on the tiny daily table"),
    ("graph_walks_det", "hash-argmin walk steps: frontier equi-joins + per-walk windows, no PRNG state"),
    ("dedup_semantic_clustered", "SemDeDup: in-row centroid assignment, per-cluster Arrow GEMM pair pass"),
    ("sample_importance_dsir", "DSIR: 64-row hashed-unigram model broadcast onto the token stream"),
    ("text_gopher_rules", "quality gate as ONE scan-stage projection: zero Exchange, zero Join"),
    ("layout_epoch_shuffle", "per-epoch md5 permutation: narrow gate, per-(epoch,shard) window only"),
    ("decontaminate_semantic_tiled", "cross-table tiled GEMM: both relations stream into (ia,ib) tiles"),
    ("er_blocked_matching", "record linkage: one shuffle on the block keys; edit-distance scoring in the join"),
    ("knn_rerank_two_stage", "two-stage serving: int8 GEMM pool, exact rerank joins only queries×pool rows"),
    ("dq_sequence_gaps", "gap detection without a global-order window: anti-join boundaries, row_number on islands only"),
    ("graph_hits_counts", "4 HITS supersteps: |V|-row score tables broadcast, edge list never shuffled"),
    ("dq_reconciliation", "detail side pre-aggregates to one row per order before the header join"),
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _evidence import source_tree_hash

    registry = load_all()
    spark = get_spark("plans")
    # Content-addressed freshness stamp (VERDICT r10 task 3): PLANS.md
    # certifies the plans of a specific operator tree; the gate in
    # tests/test_plans.py fails the round close if the live tree's hash
    # differs (same mechanism as the SWEEP source-hash gate).
    out = ["# Physical plans — headline queries (generated by scripts/dump_plans.py)",
           "",
           f"<!-- source_hash: {source_tree_hash()} -->",
           "",
           f"Scale factor dir: `{SF_DIR}`; session config: bangdatapipeline_spark/session.py.",
           "Regenerate after plan-affecting changes: `python scripts/dump_plans.py`.",
           ""]
    for key, why in SHOWCASE:
        df = registry[key].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {key}", "", f"_{why}_", "", "```", buf.getvalue().rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
