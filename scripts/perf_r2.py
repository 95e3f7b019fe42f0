"""Round-2 perf batch: run everything in ONE TPU process, print incrementally.

Order: headline bench (reference + pallas), turbo_int8 solo, GN one-pass A/B,
per-kernel attention A/B. Each section prints as it lands so a killed run
still yields data. Remote compiles are slow (1-3 min each) — expect ~30-45 min.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import importlib

bench = importlib.import_module("bench")


def section(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    lat = int(os.environ.get("BENCH_LATENT", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "12"))

    section("headline: reference vs pallas")
    t_ref = bench._measure("reference", lat, steps)
    print(json.dumps({"binding": "reference", "it_s": round(1 / t_ref, 4)}), flush=True)
    t_pal = bench._measure("pallas", lat, steps)
    print(json.dumps({"binding": "pallas", "it_s": round(1 / t_pal, 4),
                      "vs_baseline": round(t_ref / t_pal, 4)}), flush=True)

    section("turbo int8 (separately reported)")
    t_turbo = bench._measure("turbo_int8", lat, steps)
    print(json.dumps({"binding": "turbo_int8", "it_s": round(1 / t_turbo, 4),
                      "vs_baseline": round(t_ref / t_turbo, 4)}), flush=True)
    t_turbo2 = bench._measure("turbo_int8_conv", lat, steps)
    print(json.dumps({"binding": "turbo_int8_conv", "it_s": round(1 / t_turbo2, 4),
                      "vs_baseline": round(t_ref / t_turbo2, 4)}), flush=True)

    section("group_norm one-pass A/B (attention + GN variants)")
    t_gn1 = bench._measure("ops:attention,group_norm=onepass", lat, steps)
    print(json.dumps({"binding": "attn+gn_onepass", "it_s": round(1 / t_gn1, 4),
                      "vs_baseline": round(t_ref / t_gn1, 4)}), flush=True)

    section("attention kernel A/B")
    kb = importlib.import_module("benchmarks.kernel_bench")
    kb.main("attention")


if __name__ == "__main__":
    main()
