#!/usr/bin/env python
"""Refresh scripts/green_hashes.json from a given commit (VERDICT r8 task 1).

The file maps every registry key to its evidence fingerprint
(md5 of the Spark function's source + its oracle SQL — the same formula
as ``bangdatapipeline_spark.registry.query_hash``, pinned identical by
tests/test_entry_rotation.py) AS OF THE COMMIT THE DRIVER LAST GRADED.
``__spark_entry__`` demotes any green key whose CURRENT fingerprint
differs into the re-verify tier, so the driver's next CORRECTNESS
window re-checks in-round rewrites instead of shipping them on stale
evidence.

Protocol: run this at ROUND START against the PREVIOUS round's closing
commit (the code its CORRECTNESS_r{N}.json graded)::

    python scripts/refresh_green_hashes.py <prev-round-closing-sha>

Never run it against a mid-round HEAD — that would stamp unreviewed
rewrites as already-evidenced and erase the staleness signal (the exact
failure mode this file exists to close). The sweep harness
(driver_sim.py) records its own full-registry result in SWEEP_r{N}.json
but deliberately leaves this file alone.

Implementation: checks the target commit out into a temporary git
worktree and computes the hashes in a SUBPROCESS rooted there, so the
fingerprints reflect that commit's source even when the current tree
has diverged. The subprocess loads the CURRENT tree's
``registry.query_hash`` (via importlib, under a private module name)
and applies it to the worktree's registry — so the fingerprints are
"the evidence commit's source under today's formula". That keeps a
formula change (like r10's helper-transitive widening) from spuriously
demoting every key: only keys whose SOURCE actually changed since the
evidence commit differ. tests/test_entry_rotation.py pins the
snippet-vs-live parity by running this snippet against HEAD.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Applies the LIVE registry.query_hash to the worktree's registered
# queries (tests/test_entry_rotation.py pins this parity).
_SNIPPET = """
import importlib.util, json, sys
sys.path.insert(0, {root!r})
spec = importlib.util.spec_from_file_location("_cur_registry", {cur_registry!r})
cur = importlib.util.module_from_spec(spec)
sys.modules[spec.name] = cur  # dataclass resolves cls.__module__ here
spec.loader.exec_module(cur)
from bangdatapipeline_spark.registry import load_all
out = {{k: cur.query_hash(q) for k, q in load_all().items()}}
print(json.dumps(out))
"""


def main() -> int:
    sha = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    sha = subprocess.run(
        ["git", "-C", _ROOT, "rev-parse", sha],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    with tempfile.TemporaryDirectory(prefix="ghash_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "-C", _ROOT, "worktree", "add", "--detach", wt, sha],
            check=True, capture_output=True,
        )
        try:
            cur_registry = os.path.join(
                _ROOT, "bangdatapipeline_spark", "registry.py"
            )
            proc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    _SNIPPET.format(root=wt, cur_registry=cur_registry),
                ],
                capture_output=True, text=True, timeout=300,
            )
            if proc.returncode != 0:
                print(proc.stderr, file=sys.stderr)
                return 1
            hashes = json.loads(proc.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "-C", _ROOT, "worktree", "remove", "--force", wt],
                capture_output=True,
            )
    path = os.path.join(_ROOT, "scripts", "green_hashes.json")
    with open(path, "w") as f:
        json.dump(
            {"evidence_sha": sha, "hashes": dict(sorted(hashes.items()))},
            f,
            indent=1,
        )
    print(f"wrote {len(hashes)} hashes at {sha[:12]} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
