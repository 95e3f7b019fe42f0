"""Round-3 step-level A/B in ONE process (remote compiles are slow; batch
measurements). Prints incrementally.

Legs: pallas+kvcache (new default), pallas no-kvcache (round-2 state),
stock reference baseline. BENCH-identical methodology (bench_fn min-over-reps
chained slope)."""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

LEGS = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "pallas", "pallas_tc", "pallas_nokv", "reference",
]


def measure(leg: str) -> float:
    """leg = "<binding>[@mod]" where binding is anything bench._build accepts
    ("pallas", "reference", "pallas:layer_norm=bf16apply", ...) and mod is
    "nokv" (disable the cross-KV cache; round-2 state) or "tc" (add the
    opt-in time-cond hoist). Back-compat: "pallas_nokv"/"pallas_tc" spellings.
    """
    import bench

    binding, _, mod = leg.partition("@")
    if not mod and leg in ("pallas_nokv", "pallas_tc"):
        binding, _, mod = leg.partition("_")
    os.environ["BENCH_NO_KVCACHE"] = "1" if mod == "nokv" else "0"
    os.environ["BENCH_TCACHE"] = "1" if mod == "tc" else "0"
    s = bench._measure(binding, int(os.environ.get("BENCH_LATENT", "128")),
                       int(os.environ.get("BENCH_STEPS", "12")))
    return s


for leg in LEGS:
    s = measure(leg)
    print(f"{leg}: {s*1e3:.2f} ms/step = {1.0/s:.3f} it/s", flush=True)
