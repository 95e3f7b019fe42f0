"""Batch-8 plateau decomposition (VERDICT round-3 #7).

Batch >= 4 plateaus at ~3.45 s/image 1024^2 30-step while batch 8 adds
nothing (NOTES.md capacity table). This measures WHERE batch-8 time goes:

  1. slope/intercept: txt2img wall time at steps in {2, 30} for batch 4 and
     batch 8 -> per-step scan cost vs fixed tail (CLIP + VAE decode + misc);
  2. a 3-step batch-8 generation under the profiler -> per-source attribution
     (scripts/analyze_trace.py on the dumped trace) separating the UNet scan
     units from the per-image lax.map VAE decode tail.

Run: bash scripts/tpu_run.sh python -u scripts/trace_b8.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stabletriton_tpu.compile import CompileConfig
    from stabletriton_tpu.models import clip as clip_mod
    from stabletriton_tpu.models import vae as vae_mod
    from stabletriton_tpu.models.unet import init_unet_params, sdxl_base_unet_config
    from stabletriton_tpu.runtime.pipeline import SDXLPipeline

    c1 = clip_mod.sdxl_text_encoder_config()
    c2 = clip_mod.sdxl_text_encoder_2_config()
    print("initializing full SDXL-scale params (random)...", flush=True)
    pipe = SDXLPipeline(
        unet_config=sdxl_base_unet_config(),
        clip_config=c1,
        clip2_config=c2,
        vae_config=vae_mod.sdxl_vae_config(),
        params={
            "unet": init_unet_params(sdxl_base_unet_config(), 0, dtype=jnp.bfloat16),
            "text_encoder": clip_mod.init_clip_params(c1, 1),
            "text_encoder_2": clip_mod.init_clip_params(c2, 2),
            "vae": vae_mod.init_vae_params(vae_mod.sdxl_vae_config(), 3),
        },
        compile_config=CompileConfig(backend="pallas", dtype="bfloat16"),
    )

    def ids(batch):
        a = np.full((batch, 77), 320, np.int32)
        a[:, 0], a[:, -1] = 49406, 49407
        return jnp.asarray(a), jnp.asarray(a)

    def gen(batch, steps, seed):
        i1, i2 = ids(batch)
        t0 = time.perf_counter()
        img = pipe.txt2img(i1, i2, height=1024, width=1024, steps=steps,
                           seed=seed)
        np.asarray(img.astype(jnp.float32))
        return time.perf_counter() - t0

    for batch in (4, 8):
        legs = {}
        for steps in (2, 30):
            t_first = gen(batch, steps, 0)
            print(f"b{batch} s{steps}: first (compile+run) {t_first:.1f}s",
                  flush=True)
            legs[steps] = min(gen(batch, steps, s) for s in (1, 2, 3))
            print(f"b{batch} s{steps}: steady {legs[steps]:.2f}s", flush=True)
        slope = (legs[30] - legs[2]) / 28.0
        fixed = legs[2] - 2 * slope
        print(f"b{batch}: per-step scan {slope*1e3:.0f} ms "
              f"({slope*1e3/batch:.0f} ms/image-step), fixed tail "
              f"{fixed:.2f}s ({fixed/batch*1e3:.0f} ms/image) -> 30-step "
              f"{(fixed + 30*slope)/batch:.2f} s/image", flush=True)

    # phase 2: profiler trace of a short batch-8 generation (scan + decode)
    i1, i2 = ids(8)
    out_dir = "/tmp/st_trace_b8"
    jax.profiler.start_trace(out_dir, create_perfetto_trace=True)
    img = pipe.txt2img(i1, i2, height=1024, width=1024, steps=3, seed=9)
    np.asarray(img.astype(jnp.float32))
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir} — analyze with "
          f"python scripts/analyze_trace.py {out_dir}", flush=True)


if __name__ == "__main__":
    main()
