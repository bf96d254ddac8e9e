#!/usr/bin/env python
"""sf1 scale smoke: run EVERY registry key at ~10x the bench scale.

The driver ships sf0.001/0.01/0.1 only, but two whole bug classes found
by review (int64 lattice wrap, key-offset collision once c_custkey
passes 150k) are exactly the kind only a bigger scale exposes — so this
script synthesizes an sf1-shaped dataset by replicating sf0.1 tenfold
with disjoint key offsets and executes every registered query against
it, rows-only (no oracle: DuckDB comparison at this scale is a
correctness statement sf0.01 already makes; the smoke asserts the plans
EXECUTE — no overflow, no OOM, no key collision, no runtime exception).

Synthesis contract (VERDICT r7 task 8):
  * dims (region, nation) stay as-is — scale factors don't grow them;
  * fact/entity tables get 10 copies, copy i offsetting every entity key
    by i * KEY_OFFSET so referential integrity is preserved WITHIN a
    copy and keys never collide ACROSS copies (KEY_OFFSET = 10^8 clears
    the engine's own internal key-shift constants, which use 10^9-range
    shifts on purpose — see operators/incremental.py);
  * supplier/part/customer replicate with the same offsets their fact
    FKs use, so join fan-outs stay sf-realistic (10x rows, same per-key
    cardinality);
  * payload columns (text, embedding, props) replicate verbatim: a 10x
    corpus with 10 exact copies of every document is a HARDER dedup
    input than organic growth (every band bucket is 10-dense), which is
    the point of a scale smoke.

Usage:
    python scripts/sf1_smoke.py [--keep] [--only key1,key2,...] [--ledger]

``--ledger`` (VERDICT r8 task 7 — the round-loop mode): instead of the
full registry, run the 20 slowest keys (by BENCH_FULL.json steady-state
timing — the ones most likely to degrade super-linearly) plus the 20
newest keys (registry insertion-order tail plus any key never benched —
the ones with no scale evidence at all), then APPEND one JSON line to
SCALE_LEDGER.jsonl at the repo root: round inferred from CORRECTNESS
files, HEAD sha, per-key failures. The two bug classes scale review
ever caught (int64 lattice wrap, key-offset collision) only appear
above sf0.1, so every round gets a bounded (~5 min) sf1 execution pass
on the riskiest slice.

Writes the synthesized tables to $SPARK_GRAFT_SF1_DIR (default
/tmp/bdp_sf1, reused if already present), runs the sweep, prints one
JSON line per failure and a final summary line, exit 0 iff all keys ran.
Results are recorded in docs/SCALE.md ("sf1 smoke" section).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bangdatapipeline_spark.registry import load_all  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402
from bangdatapipeline_spark.tables import load_table  # noqa: E402

SRC_DIR = "/root/testdata/sf0.1"
OUT_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/bdp_sf1")
COPIES = 10
KEY_OFFSET = 10**8

# Keys whose 0-row result at sf1 is documented scale-dependent SEMANTICS,
# not a vacuous execution (BASELINE.md "sf1 scale smoke", docs/SCALE.md):
# without this exemption a --ledger slice containing one of them (e.g.
# after a rewrite puts it in the `rewritten` set) would append a
# failed-forever entry no re-run could clean.
SF1_ZERO_OK = {
    "sql_api_q11": "TPC-H Q11 HAVING cut is a fixed FRACTION of total "
                   "revenue; at 10x no part keeps a >0.06% share",
    "dedup_near_jaccard": "bounded exact ground truth (doc_id < "
                          "EXACT_BOUND); its synthetic near-dup pairs "
                          "exist at the sf0.01 correctness scale only",
}

# per-table: columns that carry entity keys and must shift per copy
_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIMS = ["region", "nation"]


def synthesize(spark) -> None:
    for name in _DIMS:
        dst = os.path.join(OUT_DIR, f"{name}.parquet")
        if not os.path.exists(dst):
            load_table(spark, SRC_DIR, name).write.mode("overwrite").parquet(dst)
    for name, key_cols in _KEY_COLS.items():
        dst = os.path.join(OUT_DIR, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        base = load_table(spark, SRC_DIR, name)
        copies = []
        for i in range(COPIES):
            c = base
            for col in key_cols:
                c = c.withColumn(
                    col, (F.col(col).cast("bigint") + F.lit(i * KEY_OFFSET))
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # canonical multi-file layout so scans split (BASELINE.md round 2)
        out.repartition(32).write.mode("overwrite").option(
            "parquet.block.size", 8 * 1024 * 1024
        ).parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"synthesized {name}: {n} rows", file=sys.stderr)


_LEDGER_CAP = 60  # hard cap on the --ledger slice (VERDICT r10 task 5)


def _ledger_keys(registry) -> tuple[list[str], dict]:
    """The round-loop slice: 20 slowest benched keys (most likely to go
    super-linear) + 20 newest keys (insertion-order tail, never-benched
    keys first — no scale evidence yet) + every key rewritten since the
    last round's closing commit (green_hashes.json fingerprint differs —
    their old sf1 evidence describes code that no longer exists).

    The slice is CAPPED at ``_LEDGER_CAP`` keys (r10's 66-rewrite round
    pushed it to 92 keys / 347 s; two such rounds would put the
    round-close loop past 10 minutes). When the rewrite set overflows
    the cap, rewrites are SAMPLED round-robin across operator families
    (the ``<prefix>_`` before the first underscore) so coverage spreads
    as evenly across touched families as the remaining room allows —
    when the rewrite set spans more families than there is room,
    alphabetically-later families are the ones dropped (room can be as
    low as cap - |slowest ∪ newest| ≈ 20 slots). The cap and the
    sampled/total counts are recorded in the ledger entry so a capped
    round is visibly capped, never silently thinner."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(root, "BENCH_FULL.json")) as f:
            metric_timings = json.load(f).get("queries", {})
    except (OSError, ValueError):
        metric_timings = {}
    # BENCH_FULL's query map is keyed by BASELINE METRIC names; translate
    # to registry keys through bench.BENCH_QUERIES (a metric can only bench
    # one registry key, so the inverted map is well-defined).
    import bench

    timings = {
        key: metric_timings[metric]
        for metric, key in bench.BENCH_QUERIES
        if metric in metric_timings and key in registry
    }
    slowest = sorted(timings, key=timings.get, reverse=True)[:20]
    # newest = the INSERTION-ORDER TAIL (most recently registered), with
    # never-benched-and-unexempt keys first — they have no scale evidence
    benched_or_exempt = set(timings) | set(getattr(bench, "BENCH_EXEMPT", {}))
    tail = list(registry)[::-1]
    unbenched = [k for k in tail if k not in benched_or_exempt]
    newest = (unbenched + [k for k in tail if k in benched_or_exempt])[:20]
    from _evidence import load_green_hashes

    from bangdatapipeline_spark.registry import query_hash

    recorded = load_green_hashes()
    rewritten = [
        k for k in registry
        if k in recorded and recorded[k] != query_hash(registry[k])
    ]
    base = set(slowest) | set(newest)
    room = max(0, _LEDGER_CAP - len(base))
    extra = sorted(set(rewritten) - base)

    # Never-sf1-run burn-down (VERDICT r11 task 6): keys with NO entry in
    # any SCALE_LEDGER timings map have zero sf1 scale evidence. Reserve
    # up to half the remaining room for them (rewrites keep the other
    # half — their old sf1 evidence describes code that no longer
    # exists), ordered family-round-robin with families that have NO
    # covered representative first, so every family gets sf1-timed
    # representatives within a couple of rounds. The running coverage
    # tally and the split land in the ledger entry.
    covered: set[str] = set()
    try:
        with open(os.path.join(root, "SCALE_LEDGER.jsonl")) as f:
            for line in f:
                try:
                    covered.update(json.loads(line).get("timings", {}))
                except ValueError:
                    continue
    except OSError:
        pass
    never = [k for k in registry if k not in covered and k not in base]
    rw_room = min(len(extra), room - min(len(never), room // 2))
    rw_sampled = _family_sample(extra, rw_room)
    fam_covered = {k.split("_", 1)[0] for k in covered}
    never.sort(key=lambda k: (k.split("_", 1)[0] in fam_covered, k))
    nv_sampled = _family_sample(never, room - len(rw_sampled))
    sampled = rw_sampled + nv_sampled
    meta = {
        "cap": _LEDGER_CAP,
        "rewritten_total": len(extra),
        "rewritten_sampled": len(rw_sampled),
        "never_run_total": len(never),
        "never_run_added": len(nv_sampled),
        "sf1_covered_before": len(covered & set(registry)),
        "selection_note": (
            "slowest+newest base, then rewrites and never-sf1-run keys "
            "split the remaining room (never-run reserved up to half; "
            "uncovered families first, family round-robin)"
        ),
    }
    return sorted(base | set(sampled)), meta


def _family_sample(keys: list[str], room: int) -> list[str]:
    """Round-robin up to ``room`` keys across operator families (the
    ``<prefix>_`` before the first underscore), preserving the incoming
    order within each family — coverage spreads as evenly across
    families as the room allows; when there are more families than
    room, the families of later-ordered keys are the ones dropped."""
    if len(keys) <= room:
        return list(keys)
    fams: dict[str, list[str]] = {}
    for k in keys:
        fams.setdefault(k.split("_", 1)[0], []).append(k)
    order = list(fams)
    sampled: list[str] = []
    i = 0
    while len(sampled) < room:
        fam = fams[order[i % len(order)]]
        if fam:
            sampled.append(fam.pop(0))
        elif all(not fams[f] for f in order):
            break
        i += 1
    return sampled


_BUDGETS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sf1_budgets.json"
)
_DEFAULT_BUDGET_SEC = 30.0
_DRIFT_RATIO = 1.5


def _budget_check(
    timings: dict[str, float], finalize: bool = True
) -> dict[str, list[float]]:
    """Per-key sf1 runtime budgets (VERDICT r9 task 4): each ledger key
    has a budget in scripts/sf1_budgets.json; a key exceeding
    _DRIFT_RATIO x its budget is an ALERT (recorded in the ledger entry
    as ``over_budget``, which the contract test requires empty in the
    latest entry) — one more triangle-heavy addition can no longer
    double the round-loop cost silently. Keys not yet budgeted: a first
    observation AT or UNDER the 30 s default self-seeds a budget at
    max(5 s, 1.2x observed); a first observation OVER the default is an
    immediate alert and is NOT seeded, so it keeps alerting every run
    until a human sets its budget by hand (r11 review, twice: the
    uncapped seed auto-baselined regressions, and a min()-capped seed
    still silently passed keys in the 30-45 s band). Existing budgets
    only change by hand, with the rationale in the commit that changes
    them.

    ``finalize=False`` runs detect-only (no stderr alerts, no seeding)
    — the pre-retry probe; the post-retry call prints, seeds from the
    settled timings, and is what the ledger records."""
    if os.path.exists(_BUDGETS_PATH):
        # a corrupt budgets file must CRASH, not silently count as empty:
        # empty would re-seed every key at 1.2x its CURRENT time, erasing
        # hand-maintained budgets and re-baselining any regression
        with open(_BUDGETS_PATH) as f:
            budgets = json.load(f)
    else:
        budgets = {}
    over = {}
    for k, t in timings.items():
        if k in budgets:
            if t > _DRIFT_RATIO * budgets[k]:
                over[k] = [t, budgets[k]]
        elif t > _DEFAULT_BUDGET_SEC:
            # unbudgeted AND over the default: no drift grace — a new
            # heavy key needs a deliberate hand-set budget
            over[k] = [t, _DEFAULT_BUDGET_SEC]
    if not finalize:
        return over
    for k, t in over.items():
        print(f"OVER BUDGET {k}: {t[0]}s > budget {t[1]}s", file=sys.stderr)
    new = {
        k: max(5.0, round(1.2 * t, 1))
        for k, t in timings.items()
        if k not in budgets and t <= _DEFAULT_BUDGET_SEC
    }
    if new:
        with open(_BUDGETS_PATH, "w") as f:
            json.dump(dict(sorted({**budgets, **new}.items())), f, indent=1)
    return over


def _append_ledger(summary: dict) -> None:
    from _evidence import REPO_ROOT, current_round, head_sha

    entry = {
        "round": current_round(),
        "head_sha": head_sha(),
        **{
            k: summary[k]
            for k in (
                "keys", "failed", "slowest_sec", "total_sec",
                "timings", "over_budget", "budget_retried",
                # slice-cap bookkeeping (r11): present on --ledger runs
                "cap", "rewritten_total", "rewritten_sampled",
                # never-run burn-down bookkeeping (r12, VERDICT r11 task 6)
                "never_run_total", "never_run_added",
                "sf1_covered_before", "selection_note",
            )
            if k in summary
        },
    }
    with open(os.path.join(REPO_ROOT, "SCALE_LEDGER.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")


def main() -> int:
    keep = "--keep" in sys.argv
    ledger = "--ledger" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("sf1_smoke")
    synthesize(spark)

    registry = load_all()
    failures: dict[str, str] = {}
    timings: dict[str, float] = {}
    keys = [k for k in sorted(registry) if only is None or k in only]
    slice_meta: dict = {}
    if ledger and only is None:
        keys, slice_meta = _ledger_keys(registry)
    # Cache hygiene (VERDICT r9 task 4): pressure-triggered release with
    # a fixed-stride backstop — the same discipline driver_sim uses —
    # instead of a bare clearCache() after EVERY key. clearCache alone
    # left the engine's memo dicts pointing at now-uncached plans, so
    # each graph-family key re-enumerated the shared triangle relation
    # from scratch (graph_adamic_adar evaluates it 3x via unionAll:
    # 62-77 s/key dominated the ledger budget). Sorted key order keeps
    # the graph_* family consecutive, so the memos amortize across it;
    # release_if_pressured still bounds heap between families.
    from bangdatapipeline_spark import caches

    for i, key in enumerate(keys):
        caches.maybe_release(spark, i)
        t0 = time.perf_counter()
        try:
            n = registry[key].fn(spark, OUT_DIR).count()
            dt = time.perf_counter() - t0
            timings[key] = round(dt, 2)
            print(f"[{i + 1}/{len(keys)}] {key}: {n} rows ({dt:.1f}s)", file=sys.stderr)
            if n == 0 and key not in SF1_ZERO_OK:
                failures[key] = "0 rows at sf1 (vacuous execution)"
        except Exception as exc:  # noqa: BLE001 — smoke: record and continue
            failures[key] = f"{type(exc).__name__}: {exc}"[:400]
            print(json.dumps({"key": key, "error": failures[key]}))
    # Budget-alert retry (r11): per-key timings inside a shared-memo
    # family are context-dependent — `caches.maybe_release` is
    # PRESSURE-triggered, so an eviction can land mid-family and
    # re-attribute a shared relation's rebuild to whichever key runs
    # next (observed: graph_hits_counts 7.15->14.6 s and
    # graph_closeness_sample 5.43->11.65 s across back-to-back
    # identical-slice runs, code unchanged). Re-time each over-budget
    # key ONCE at end-of-slice (memos warm, the stable context) and
    # keep the min — a key still over budget on its warm retry is a
    # real regression, not attribution noise.
    budget_retried: dict[str, float] = {}
    for k in sorted(_budget_check(timings, finalize=False)):  # detect-only probe
        if k in failures:
            continue
        t0 = time.perf_counter()
        try:
            registry[k].fn(spark, OUT_DIR).count()
            retry_t = round(time.perf_counter() - t0, 2)
        except Exception:  # noqa: BLE001 — keep the first observation
            continue
        budget_retried[k] = retry_t
        timings[k] = min(timings[k], retry_t)
    summary = {
        "metric": "sf1_smoke",
        "keys": len(keys),
        "failed": sorted(failures),
        "slowest": sorted(timings, key=timings.get, reverse=True)[:10],
        "slowest_sec": {
            k: timings[k]
            for k in sorted(timings, key=timings.get, reverse=True)[:10]
        },
        "total_sec": round(sum(timings.values()), 1),
        "timings": dict(sorted(timings.items())),
        "over_budget": _budget_check(timings),
        "budget_retried": budget_retried,
        "out_dir": OUT_DIR,
        **slice_meta,
    }
    print(json.dumps(summary))
    if ledger and only is None:
        _append_ledger(summary)
    if not keep and not failures:
        pass  # leave the synthesized dir for re-runs; it's /tmp, host-reaped
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
