"""Whole-pipeline measurement of the composed deep_cache x guidance_interval
draft knobs on the real TPU (round 4: the two quality-preserving drafts were
mutually exclusive through round 3; runtime/denoise.py now nests the two
step-level branches).

Legs (one process, same random SDXL-scale bf16 weights, 30-step 1024^2
txt2img, CLIP + scan + VAE included, min-of-3 steady generations):
  1. default            — classic CFG every step (the exact path)
  2. gi=(0.28, 5.42)    — CFG only inside the sigma window
  3. deep_cache=3       — full UNet every 3rd step
  4. deep_cache=3 + gi  — the composition (4-way branch per step)

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
        # whole-generation wall clock, min over 3 steady repeats (see
        # scripts/perf_gi.py for why this metric, not bench_fn, here)
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
    t_gi = leg("gi", guidance_interval=gi)
    t_dc = leg("dc3", deep_cache=3)
    t_both = leg("dc3+gi", deep_cache=3, guidance_interval=gi)
    print(f"gi {t_base/t_gi:.2f}x | dc3 {t_base/t_dc:.2f}x | "
          f"dc3+gi {t_base/t_both:.2f}x "
          f"({t_base:.2f} -> {t_both:.2f} s/image)", flush=True)


if __name__ == "__main__":
    main()
