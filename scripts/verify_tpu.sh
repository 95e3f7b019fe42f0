#!/bin/bash
# Real-hardware smoke gate — the documented LAST step before any snapshot and
# after ANY change to models/, kernels/, or the default binding.
#
# Why this exists (VERDICT r4): the CPU test suite runs Pallas in interpret
# mode and tests/test_tpu_lowering.py catches Mosaic lowering errors via
# cross-platform export, but only a run on the actual chip proves the default
# path compiles AND executes AND still hits its numbers. Round 4 shipped a
# default that crashed on TPU because this 3-minute script did not exist.
#
# Steps (each gated on the previous):
#   1. entry() compile smoke   — the driver's single-chip check, for real
#   2. BENCH_STEPS=4 bench.py  — headline program end-to-end, quick steps
#   3. deviation check         — full-UNet MSE of the default binding vs
#                                stock XLA on-chip (skip: ST_VERIFY_FAST=1)
#
# Uses scripts/tpu_run.sh to wait out tunnel recovery. NEVER run two TPU
# processes at once (CLAUDE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[verify_tpu] 1/3 entry() compile smoke" >&2
scripts/tpu_run.sh python __graft_entry__.py

echo "[verify_tpu] 2/3 quick headline bench (BENCH_STEPS=4)" >&2
BENCH_STEPS="${BENCH_STEPS:-4}" scripts/tpu_run.sh python bench.py

if [ "${ST_VERIFY_FAST:-0}" != "1" ]; then
  echo "[verify_tpu] 3/3 on-chip deviation check (default binding vs XLA)" >&2
  scripts/tpu_run.sh python scripts/deviation_check.py pallas
else
  echo "[verify_tpu] 3/3 skipped (ST_VERIFY_FAST=1)" >&2
fi
echo "[verify_tpu] OK" >&2
