"""Bench output contract.

Round 2 shipped with NO driver-side bench evidence because the single
JSON line grew past the driver's bounded tail capture and parsed as
null. These tests pin the protocol that fixed it: the FINAL line stays
compact (headline queries only), and every metric the bench promises
actually resolves to a registered query (a typo'd key is silently
skipped by the runner, which would silently drop a metric).
"""

from __future__ import annotations

import json

import bench
from bangdatapipeline_spark.registry import load_all


def test_every_bench_key_is_registered():
    registry = load_all()
    missing = [key for _, key in bench.BENCH_QUERIES if key not in registry]
    assert missing == [], f"bench references unregistered keys: {missing}"


def test_no_duplicate_bench_metrics_or_keys():
    metrics = [m for m, _ in bench.BENCH_QUERIES]
    assert len(metrics) == len(set(metrics)), "duplicate metric names"


def test_headline_metrics_resolve():
    """Every headline metric must be produced by the run: either a
    BENCH_QUERIES entry or a canonical-layout twin the runner adds."""
    produced = {m for m, _ in bench.BENCH_QUERIES} | {
        "q1_pricing_summary_canonical",
        "events_json_extract_canonical",
    }
    dangling = bench.HEADLINE_METRICS - produced
    assert dangling == set(), f"headline metrics never produced: {dangling}"


def test_final_line_stays_under_tail_capture_budget():
    """Worst-case render of the FINAL compact line must stay far below a
    conservative tail-capture bound (the r2 full line was >4 KB and
    parsed as null; headline-only stays ~0.7 KB)."""
    worst = {
        "metric": "bench_total_sec",
        "value": 99999.9999,
        "unit": "sec",
        "queries": {m: 99999.9999 for m in sorted(bench.HEADLINE_METRICS)},
        "plan_sec_total": 99999.9999,
        "n_queries_total": len(bench.BENCH_QUERIES) + 1,
        "full_map": "BENCH_FULL.json",
        "sf": 0.1,
    }
    line = json.dumps(worst)
    assert len(line) < 1500, f"final bench line too long ({len(line)} chars)"
