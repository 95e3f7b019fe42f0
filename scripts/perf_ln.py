"""Same-process step-level A/B: default binding vs + bf16-apply LayerNorm.

Methodology per benchmarks/NOTES.md: all legs in one process (cross-process
runs on the tunneled chip swing +-5%), chained-slope timing via bench_fn.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    from stabletriton_tpu.compile import (
        CompileConfig,
        compile_unet,
        fuse_attention_projections,
    )
    from stabletriton_tpu.models.unet import init_unet_params, sdxl_base_unet_config
    from stabletriton_tpu.runtime.profiling import bench_fn

    cfg = sdxl_base_unet_config()
    params = fuse_attention_projections(init_unet_params(cfg, 0, dtype=jnp.bfloat16))
    rng = np.random.default_rng(0)
    b, lat = 2, 128
    args = (
        jnp.asarray(rng.standard_normal((b, lat, lat, 4), dtype=np.float32), jnp.bfloat16),
        jnp.full((b,), 500.0, jnp.float32),
        jnp.asarray(rng.standard_normal((b, 77, 2048), dtype=np.float32), jnp.bfloat16),
        jnp.asarray(rng.standard_normal((b, 1280), dtype=np.float32), jnp.bfloat16),
        jnp.asarray(np.tile([1024, 1024, 0, 0, 1024, 1024], (b, 1)).astype(np.float32)),
    )

    legs = [
        ("default", CompileConfig(backend="pallas", dtype="bfloat16")),
        ("default+lnbf16", CompileConfig(
            backend="pallas", dtype="bfloat16",
            overrides=(("layer_norm", "bf16apply"),))),
        ("default(repeat)", CompileConfig(backend="pallas", dtype="bfloat16")),
    ]
    for name, ccfg in legs:
        fn = compile_unet(cfg, ccfg)
        s = bench_fn(lambda smp: fn(params, smp, *args[1:]), args[0],
                     chain_arg=0, n_short=3, n_long=12, reps=3)
        print(f"{name:18s} {1.0/s:6.2f} it/s  ({s*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
