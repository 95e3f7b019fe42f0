"""Re-measure the turbo int8-FF draft legs on the round-5 direct-conv
default (VERDICT r4 #6: the 9.66 it/s step number and the 1.12 s/image
stacked number were measured on the round-3 XLA-conv default and never
re-run after conv2d="direct" was promoted).

Legs (one process, same random SDXL-scale bf16 weights, 30-step 1024^2
txt2img, CLIP + scan + VAE included, min-of-3 steady generations — the
scripts/perf_dcgi.py protocol):
  1. exact default        — in-process reference point for the ratios
  2. turbo int8_ff        — W8A8 GEGLU up-projections only
  3. turbo + deep_cache=3 — full UNet every 3rd step
  4. turbo + dc3 + no-CFG — guidance_scale=1 single-branch batch

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
    from stabletriton_tpu.runtime.pipeline import SDXLPipeline

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    c1 = clip_mod.sdxl_text_encoder_config()
    c2 = clip_mod.sdxl_text_encoder_2_config()
    print("initializing full SDXL-scale params (random)...", flush=True)
    params = {
        "unet": init_unet_params(sdxl_base_unet_config(), 0, dtype=jnp.bfloat16),
        "text_encoder": clip_mod.init_clip_params(c1, 1),
        "text_encoder_2": clip_mod.init_clip_params(c2, 2),
        "vae": vae_mod.init_vae_params(vae_mod.sdxl_vae_config(), 3),
    }
    ids = np.full((1, 77), 320, np.int32)
    ids[:, 0], ids[:, -1] = 49406, 49407
    ids1 = jnp.asarray(ids)
    ids2 = jnp.asarray(ids)

    def build(quantize):
        return SDXLPipeline(
            unet_config=sdxl_base_unet_config(),
            clip_config=c1,
            clip2_config=c2,
            vae_config=vae_mod.sdxl_vae_config(),
            params=dict(params),
            compile_config=CompileConfig(backend="pallas", dtype="bfloat16",
                                         quantize=quantize),
        )

    def leg(pipe, name, **kw):
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

    exact = build(None)
    t_base = leg(exact, "exact-default")
    del exact
    turbo = build("int8_ff")
    t_turbo = leg(turbo, "turbo")
    t_dc = leg(turbo, "turbo+dc3", deep_cache=3)
    t_stack = leg(turbo, "turbo+dc3+nocfg", deep_cache=3, guidance_scale=1.0)
    print(f"turbo {t_base/t_turbo:.2f}x | turbo+dc3 {t_base/t_dc:.2f}x | "
          f"turbo+dc3+nocfg {t_base/t_stack:.2f}x "
          f"({t_base:.2f} -> {t_stack:.2f} s/image)", flush=True)


if __name__ == "__main__":
    main()
