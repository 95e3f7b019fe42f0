"""Whole-pipeline A/B of the guidance-interval draft knob on the real TPU.

Legs (one process, same random SDXL-scale bf16 weights):
  1. default          — classic CFG every step (the exact path)
  2. gi=(0.28, 5.42)  — CFG only inside the sigma window ("Applying Guidance
                        in a Limited Interval", Kynkaanniemi et al. 2024);
                        outside it the cond-only batch-1 UNet runs (~2x
                        cheaper per skipped step)

Reports steady-state seconds/image for 30-step 1024² txt2img (CLIP + scan +
VAE included), plus how many of the 30 sigmas fall inside the window.
Draft-mode semantics: reported separately from the headline, like turbo.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp

    from stabletriton_tpu.compile import CompileConfig
    from stabletriton_tpu.models import clip as clip_mod
    from stabletriton_tpu.models import vae as vae_mod
    from stabletriton_tpu.models.unet import init_unet_params, sdxl_base_unet_config
    from stabletriton_tpu.runtime import scheduler as sched
    from stabletriton_tpu.runtime.pipeline import SDXLPipeline

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    gi = (0.28, 5.42)

    schedule = sched.make_schedule(sched.SchedulerConfig(), steps)
    inside = int(np.sum((schedule.sigmas[:-1] >= gi[0])
                        & (schedule.sigmas[:-1] <= gi[1])))
    print(f"sigma window {gi}: {inside}/{steps} steps guided, "
          f"{steps - inside} cond-only", flush=True)

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
    ids = np.full((1, 77), 320, np.int32)
    ids[:, 0], ids[:, -1] = 49406, 49407
    ids1 = jnp.asarray(ids)
    ids2 = jnp.asarray(ids)

    def leg(name, **kw):
        # whole-generation wall clock, min over 3 steady repeats: the
        # np.asarray readback is a hard data dependency (a true fence, unlike
        # block_until_ready on this platform), and at ~2-4 s per call the
        # fixed dispatch+readback overhead the chained-slope method
        # (runtime/profiling.bench_fn) cancels for ~100 ms steps is <2% here;
        # min-of-3 absorbs the one-sided tunnel jitter. Step-level numbers
        # still come exclusively from bench_fn (bench.py).
        t0 = time.perf_counter()
        img = pipe.txt2img(ids1, ids2, height=1024, width=1024, steps=steps,
                           seed=0, **kw)
        np.asarray(img.astype(jnp.float32))
        print(f"{name}: first (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            img = pipe.txt2img(ids1, ids2, height=1024, width=1024,
                               steps=steps, seed=s, **kw)
            arr = np.asarray(img.astype(jnp.float32))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name}: steady {dt:.2f}s/image (min of {len(times)}), "
              f"finite={bool(np.isfinite(arr).all())}", flush=True)
        return dt

    t_base = leg("default-cfg")
    t_gi = leg("guidance-interval", guidance_interval=gi)
    print(f"speedup from interval guidance: {t_base / t_gi:.3f}x "
          f"({t_base:.2f} -> {t_gi:.2f} s/image)", flush=True)


if __name__ == "__main__":
    main()
