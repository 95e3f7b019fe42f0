#!/bin/bash
# Per-op binding sweep of the full-UNet bench. Writes sweep_results.txt.
cd /root/repo
: > sweep_results.txt
for B in "ops:attention" "ops:attention,group_norm" "ops:attention,geglu" "ops:attention,layer_norm" "ops:attention,time_embed"; do
  echo "== $B" >> sweep_results.txt
  BENCH_SOLO="$B" BENCH_STEPS=16 timeout 2400 python -u bench.py >> sweep_results.txt 2>&1
done
echo DONE >> sweep_results.txt
