"""Full-UNet numerics deviation of a binding vs the stock-XLA reference leg.

Usage: python scripts/deviation_check.py [binding ...]

Each binding is anything bench._build accepts ("pallas",
"pallas:layer_norm=bf16apply", ...). Prints MSE / max-abs of the full
2.57B-param SDXL UNet step output vs the reference binding on identical
params/inputs — the evidence the MSE<1e-3 fidelity gate asks for when a
draft-style variant (bf16-apply norms) is promoted into the default binding
(benchmarks/NOTES.md "bf16-apply GN evidence").
"""
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BINDINGS = sys.argv[1:] or ["pallas", "pallas:layer_norm=bf16apply"]

os.environ.setdefault("BENCH_NO_KVCACHE", "0")
import bench  # noqa: E402

lat = int(os.environ.get("BENCH_LATENT", "128"))
fn_ref, params_ref, args = bench._build("reference", lat)
ref = np.asarray(fn_ref(params_ref, *args), np.float32)
print(f"reference output: shape {ref.shape}, std {ref.std():.4f}", flush=True)

for binding in BINDINGS:
    fn, params, args_b = bench._build(binding, lat)
    out = np.asarray(fn(params, *args_b), np.float32)
    d = out - ref
    print(f"{binding}: MSE {np.mean(d * d):.3e}  max {np.abs(d).max():.4f}",
          flush=True)
