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


def test_registry_benched_or_exempt():
    """Every registry key is either benched or exempt-with-reason — a new
    operator cannot silently join an un-benched tail where a perf
    regression would be invisible to BENCH_FULL cross-round diffs
    (VERDICT r7 task 7). Exemption reasons must name the benched row
    covering the shape (or declare the key a non-perf path)."""
    registry = load_all()
    benched = {k for _, k in bench.BENCH_QUERIES}
    exempt = set(bench.BENCH_EXEMPT)
    assert not benched & exempt, sorted(benched & exempt)
    missing = set(registry) - benched - exempt
    assert missing == set(), f"keys neither benched nor exempt: {sorted(missing)}"
    stale = exempt - set(registry)
    assert stale == set(), f"exemptions for unregistered keys: {sorted(stale)}"
    for key, reason in bench.BENCH_EXEMPT.items():
        assert len(reason) >= 10, f"exemption reason too thin: {key}"


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
        "setup_sec_total": 99999.9999,
        "cold_sec_total": 99999.9999,
        "floor_sec": 99999.9999,
        "noise_ratio": 99999.999,
        "retried": True,
        "retry_published": False,
        "headline_min_published": True,
        "nonheadline_min_published": True,
        "n_nonheadline_retried": bench.NONHEADLINE_RETRY_COUNT,
        "noise_ratio_initial": 99999.999,
        "noise_ratio_retry": 99999.999,
        "n_queries_total": len(bench.BENCH_QUERIES) + 1,
        "full_map": "BENCH_FULL.json",
        "sf": 0.1,
    }
    line = json.dumps(worst)
    assert len(line) < 1500, f"final bench line too long ({len(line)} chars)"


def test_bench_full_has_breakout_and_plan_budget():
    """BENCH_FULL.json (committed artifact of the last full run) must carry
    the setup/plan/cold breakout and the floor sentinel, and pure Catalyst
    planning must stay within budget: at >=157 queries, plan_sec_total
    <= 30 s (~0.2 s/plan). Demo-key side work lives in setup_sec, so a
    layout key writing tables can no longer hide in the planning total."""
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_FULL.json")
    full = json.load(open(path))
    for field in (
        "plan_sec",
        "setup_sec",
        "cold_sec",
        "plan_sec_total",
        "setup_sec_total",
        "floor_sec",
        "noise_ratio",
        "floor_checkpoints",
        "floor_checkpoints_initial",
        "floor_checkpoints_retry",
        "floor_sec_initial",
        "floor_sec_retry",
        "retried",
        "retry_published",
        "headline_min_published",
        "nonheadline_min_published",
        "noise_ratio_initial",
        "noise_ratio_retry",
        "headline_initial",
        "headline_retry",
        "nonheadline_initial",
        "nonheadline_retry",
        "cold_sec_retry",
        "cold_recheck",
    ):
        assert field in full, f"BENCH_FULL.json missing {field}"
    # Noisy-host self-defense invariants (r8 rule): a retry fires iff the
    # main sweep was noisy; a quiet retry publishes wholesale; two noisy
    # passes publish per-query min. Exactly one publication mode holds.
    assert full["retried"] == (
        full["noise_ratio_initial"] > bench.RETRY_NOISE_THRESHOLD
    )
    assert not (full["retry_published"] and full["headline_min_published"])
    if full["retry_published"]:
        assert full["retried"]
        assert full["noise_ratio"] == full["noise_ratio_retry"]
        assert full["noise_ratio_retry"] <= bench.RETRY_NOISE_THRESHOLD
        # published floor must be recomputable from published checkpoints
        assert full["floor_checkpoints"] == full["floor_checkpoints_retry"]
    elif full["headline_min_published"]:
        assert full["retried"]
        assert full["noise_ratio_retry"] > bench.RETRY_NOISE_THRESHOLD
        assert full["noise_ratio"] == min(
            full["noise_ratio_initial"], full["noise_ratio_retry"]
        )
        # every published headline value is the per-query min of the two
        # raw passes, and both raw maps are present to recompute it
        for m, v in full["headline_initial"].items():
            assert full["queries"][m] == min(v, full["headline_retry"][m])
        assert full["floor_sec"] == min(
            full["floor_sec_initial"], full["floor_sec_retry"]
        )
    else:
        assert full["noise_ratio"] == full["noise_ratio_initial"]
        assert full["floor_checkpoints"] == full["floor_checkpoints_initial"]
    if full["retried"]:
        # cold_sec stays the main sweep's genuinely-cold sample; the
        # retry's warm re-runs are recorded separately
        assert set(full["cold_sec_retry"]) == set(full["headline_retry"]) | set(
            full["nonheadline_retry"]
        )
    # r11 rule: retried non-headline rows always publish per-query min,
    # and both raw passes are present to recompute each published value
    assert full["nonheadline_min_published"] == (
        full["retried"] and len(full["nonheadline_retry"]) > 0
    )
    assert set(full["nonheadline_initial"]) == set(full["nonheadline_retry"])
    assert set(full["nonheadline_retry"]).isdisjoint(bench.HEADLINE_METRICS)
    assert len(full["nonheadline_retry"]) <= bench.NONHEADLINE_RETRY_COUNT
    for m, v in full["nonheadline_initial"].items():
        settled = min(v, full["nonheadline_retry"][m])
        if m in full["budget_retried"]:
            # the budget-drift retry (below) may lower it once more
            settled = min(settled, full["budget_retried"][m][1])
        assert full["queries"][m] == settled
    # r11 drift gate: every budgeted non-headline row must publish within
    # BENCH_DRIFT_RATIO x its hand-set quiet-host reference — a committed
    # artifact with alerts means an unadjudicated regression shipped.
    assert full["over_budget"] == {}, full["over_budget"]
    budgets = json.load(
        open(os.path.join(os.path.dirname(bench.__file__), "scripts",
                          "bench_budgets.json"))
    )
    for m, ref in budgets.items():
        assert m in full["queries"], f"budgeted row {m} not benched"
        assert full["queries"][m] <= bench.BENCH_DRIFT_RATIO * ref, (
            m, full["queries"][m], ref,
        )
    # r12 budget-drift retry (ADVICE r11): a budgeted row spiking past
    # its reference under a QUIET sentinel gets one warm re-time with
    # min-publication, independent of the global noise retry. Every
    # adjudication is recorded: published == min(initial, retry), only
    # budgeted rows appear, and the initial sample really was over.
    for m, (initial, retry) in full["budget_retried"].items():
        assert m in budgets, f"budget_retried row {m} has no budget line"
        assert initial > bench.BENCH_DRIFT_RATIO * budgets[m]
        assert full["queries"][m] == min(initial, retry), (
            m, initial, retry, full["queries"][m],
        )
    # every cold outlier got a recheck row (transient-vs-intrinsic audit)
    for m, cold in full["cold_sec"].items():
        bar = bench.COLD_OUTLIER_RATIO * max(
            full["queries"][m], full["floor_sec"]
        )
        if cold > bar:
            assert m in full["cold_recheck"], f"cold outlier unexplained: {m}"
    n = len(full["queries"])
    assert set(full["plan_sec"]) == set(full["queries"])
    assert set(full["cold_sec"]) == set(full["queries"])
    # r13 (VERDICT r12 task 2a): once the round's final bench lands, the
    # artifact must carry cold_sec_total, recomputable from the per-key
    # cold map. Conditional until then: the committed artifact may still
    # be the pre-r13 one mid-round.
    if "cold_sec_total" in full:
        assert full["cold_sec_total"] == round(
            sum(full["cold_sec"].values()), 4
        )
    assert len(full["floor_checkpoints"]) == 3
    if n >= 157:
        assert full["plan_sec_total"] <= 30.0, (
            f"pure planning took {full['plan_sec_total']} s over {n} queries"
        )
        # cold runs must never be cheaper than steady-state by more than
        # jitter on aggregate — sanity that the columns aren't swapped
        assert sum(full["cold_sec"].values()) >= 0.5 * sum(
            full["queries"].values()
        )
