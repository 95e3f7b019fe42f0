"""End-to-end 1024x1024 txt2img on the real TPU with random-init SDXL weights.

Exercises the whole product surface: dual CLIP encode, 30-step Euler scan,
VAE decode, PNG write. Random weights produce noise images, but this verifies
the full-scale program compiles, runs, and reports honest steady-state
timing (the driver-visible wall-clock protocol).
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
    from stabletriton_tpu.native import save_png
    from stabletriton_tpu.runtime.pipeline import SDXLPipeline

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
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

    t0 = time.perf_counter()
    img = pipe.txt2img(ids1, ids2, height=1024, width=1024, steps=steps, seed=0)
    img_np = np.asarray(img.astype(jnp.float32))
    print(f"first generation (compile + run): {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    img = pipe.txt2img(ids1, ids2, height=1024, width=1024, steps=steps, seed=1)
    img_np = np.asarray(img.astype(jnp.float32))
    dt = time.perf_counter() - t0
    print(f"steady-state generation: {dt:.2f}s -> {steps / dt:.2f} it/s "
          f"(whole pipeline incl. CLIP+VAE)", flush=True)
    print(f"image: shape {img_np.shape}, finite={bool(np.isfinite(img_np).all())}, "
          f"range [{img_np.min():.3f}, {img_np.max():.3f}]", flush=True)
    save_png(img_np[0], "/tmp/e2e_txt2img.png")
    print("wrote /tmp/e2e_txt2img.png", flush=True)


if __name__ == "__main__":
    main()
