"""Round-2b perf batch: fused-operand attention + tuned table, one process.

Sections print incrementally: headline reference vs pallas (tuned + fused
attention ops), pallas with the fused/packed routing disabled (split
fallbacks only), turbo int8 re-measure, then the int8 MXU microbench.
"""

import importlib
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

bench = importlib.import_module("bench")


def section(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    lat = int(os.environ.get("BENCH_LATENT", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "12"))

    section("headline: reference vs pallas (tuned table + fused attn ops)")
    t_ref = bench._measure("reference", lat, steps)
    print(json.dumps({"binding": "reference", "it_s": round(1 / t_ref, 4)}),
          flush=True)
    t_pal = bench._measure("pallas", lat, steps)
    print(json.dumps({"binding": "pallas", "it_s": round(1 / t_pal, 4),
                      "vs_baseline": round(t_ref / t_pal, 4)}), flush=True)

    section("pallas, fused-direct/packed disabled (ST_NO_PACKED_ATTN=1)")
    os.environ["ST_NO_PACKED_ATTN"] = "1"
    # env flags are read at trace time; the inner jitted entry points cache
    # by shapes+statics, so a same-process flag flip needs a cache clear
    from stabletriton_tpu.kernels import flash_attention as fa

    fa.flash_attention._clear_cache()
    fa.flash_attention_qkv._clear_cache()
    fa.flash_attention_kv._clear_cache()
    t_np = bench._measure("pallas", lat, steps)
    del os.environ["ST_NO_PACKED_ATTN"]
    fa.flash_attention._clear_cache()
    fa.flash_attention_qkv._clear_cache()
    fa.flash_attention_kv._clear_cache()
    print(json.dumps({"binding": "pallas_nopack", "it_s": round(1 / t_np, 4),
                      "vs_baseline": round(t_ref / t_np, 4)}), flush=True)

    section("turbo int8 linears (separately reported)")
    t_turbo = bench._measure("turbo_int8", lat, steps)
    print(json.dumps({"binding": "turbo_int8", "it_s": round(1 / t_turbo, 4),
                      "vs_baseline": round(t_ref / t_turbo, 4)}), flush=True)

    section("int8 MXU microbench")
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    importlib.import_module("int8_check").main()


if __name__ == "__main__":
    main()
