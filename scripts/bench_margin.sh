#!/bin/bash
# Headline margin protocol (VERDICT r3 #9 / r4 #7): three independent
# cross-process `python bench.py` runs at HEAD — each its own process, so
# program-cache warmth can't flatter the number (the persistent XLA disk
# cache still skips recompiles, matching how a user re-runs the bench).
# Record the three JSON lines + the worst case in benchmarks/NOTES.md;
# gate: worst case >= 1.55x.
set -euo pipefail
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  echo "[bench_margin] run $i/3" >&2
  scripts/tpu_run.sh python bench.py
done
