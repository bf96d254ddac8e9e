#!/bin/sh -e
# Full pre-submission gate: unit/plan/property/streaming tests, the
# driver-faithful correctness sweep at TWO scale factors (sf0.001 catches
# scale-dependent bugs the sf0.01 gate misses — empty groups, round-half
# percentile boundaries), then the bench line.
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python scripts/driver_sim.py /root/testdata/sf0.001
python scripts/driver_sim.py
python bench.py
