#!/usr/bin/env python
"""Interleaved A/B cold-probe driver for noisy shared hosts.

Runs scripts/probe_cold.py alternately from two source trees (A = a git
worktree of the baseline commit, B = the working tree), several rounds
in ABBA order, and reports per-key medians per tree. Sequential A-then-B
comparisons are worthless when ambient load drifts 2-3x between windows
(r12's measured hazard); interleaving samples both trees under the same
drift.

Usage:
    python scripts/abba_cold.py --a-dir /tmp/wt_a --b-dir /root/repo \
        --rounds 3 --runs 1 KEY [KEY...]
"""

from __future__ import annotations

import argparse
import re
import statistics
import subprocess
import sys

LINE = re.compile(
    r"^(\S+): cold_med=([0-9.]+) cold_min=([0-9.]+) warm=([0-9.]+)"
)


def probe(tree: str, keys: list[str], runs: int) -> dict[str, tuple[float, float]]:
    out = subprocess.run(
        [sys.executable, "scripts/probe_cold.py", *keys, "--runs", str(runs)],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    res = {}
    for line in out.stdout.splitlines():
        m = LINE.match(line.strip())
        if m:
            res[m.group(1)] = (float(m.group(3)), float(m.group(4)))  # (cold_min, warm)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--a-dir", required=True)
    ap.add_argument("--b-dir", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    cold: dict[tuple[str, str], list[float]] = {}
    warm: dict[tuple[str, str], list[float]] = {}
    # ABBA per round pair: A B | B A | A B ...
    order = []
    for r in range(args.rounds):
        order += ["AB" if r % 2 == 0 else "BA"]
    for pair in order:
        for side in pair:
            tree = args.a_dir if side == "A" else args.b_dir
            res = probe(tree, args.keys, args.runs)
            for k, (c, w) in res.items():
                cold.setdefault((side, k), []).append(c)
                warm.setdefault((side, k), []).append(w)
            print(
                f"[{side}] "
                + " ".join(f"{k}={res.get(k, ('?', '?'))[0]}" for k in args.keys),
                flush=True,
            )
    print("\n== medians (cold_min / warm) ==")
    for k in args.keys:
        ca = cold.get(("A", k), [])
        cb = cold.get(("B", k), [])
        wa = warm.get(("A", k), [])
        wb = warm.get(("B", k), [])
        if not (ca and cb):
            print(f"{k}: missing data A={ca} B={cb}")
            continue
        print(
            f"{k}: A cold={statistics.median(ca):.3f} {sorted(ca)} "
            f"warm={statistics.median(wa):.3f} | "
            f"B cold={statistics.median(cb):.3f} {sorted(cb)} "
            f"warm={statistics.median(wb):.3f}"
        )


if __name__ == "__main__":
    main()
