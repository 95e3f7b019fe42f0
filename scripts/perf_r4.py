"""Round-4 step-level A/B in ONE process (remote compiles are slow; batch
measurements). Prints incrementally.

Legs (comma-separated argv[1], default below): the round-3 default vs the
bf16-score-pipeline attention (ST_BF16_SCORES) and its combination with the
MXU softmax denominator (ST_MXU_LSUM). The flags are read at trace time
inside the kernels, so each leg clears the flash-attention jit caches before
building. BENCH-identical methodology (bench_fn min-over-reps chained slope).
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

LEGS = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "pallas", "pallas@bf16s", "pallas@bf16s+lsum", "pallas",
]


def measure(leg: str) -> float:
    """leg = "<binding>[@flags]"; flags "+"-joined from {bf16s, lsum, maxsub,
    nokv}."""
    import bench
    from stabletriton_tpu.kernels import flash_attention as fa

    binding, _, mods = leg.partition("@")
    flags = set(mods.split("+")) if mods else set()
    os.environ["ST_BF16_SCORES"] = "1" if "bf16s" in flags else "0"
    os.environ["ST_MXU_LSUM"] = "1" if "lsum" in flags else "0"
    os.environ["ST_SOFTMAX_MAXSUB"] = "1" if "maxsub" in flags else "0"
    os.environ["BENCH_NO_KVCACHE"] = "1" if "nokv" in flags else "0"
    # trace-time flags: force retraces
    fa.flash_attention._clear_cache()
    fa.flash_attention_qkv._clear_cache()
    fa.flash_attention_kv._clear_cache()
    return bench._measure(binding,
                          int(os.environ.get("BENCH_LATENT", "128")),
                          int(os.environ.get("BENCH_STEPS", "12")))


for leg in LEGS:
    s = measure(leg)
    print(f"{leg}: {s*1e3:.2f} ms/step = {1.0/s:.3f} it/s", flush=True)
