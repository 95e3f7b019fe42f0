"""The whole-loop replay runtime: jitted ``lax.scan`` denoising.

This is the TPU-native replacement for the reference's CUDA-graphs layer
(reference ``src/stabletriton/optimizers/cuda/graphs.py`` — capture the whole
forward once, replay per step; plus the host-side ~50-step scheduler loop,
SURVEY.md §3.3-3.4). Design mapping:

  CUDA graph capture          -> one jit trace of scan(step) (XLA executable)
  graph.replay() per step     -> zero: all steps live inside one dispatch
  static input/output buffers -> donated latents (donate_argnums)
  hash_arg signature cache    -> shape-keyed memo over (res, steps, batch, cfg)
                                 on top of jax's own jit cache (runtime/cache.py)

Classifier-free guidance runs as batch-2 *inside* the step (uncond/cond
stacked), so the UNet always sees one static batch shape.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from stabletriton_tpu.runtime import scheduler as sched


def make_denoise_loop(
    unet_step: Callable,
    schedule: sched.Schedule,
    *,
    guidance_scale: float = 5.0,
    solver: str = "euler",
    unroll: int = 1,
):
    """Build fn(params, latents, ctx, text_embeds, time_ids) -> final latents.

    ``unet_step(params, sample2, t, ctx, text_embeds, time_ids)`` is the
    (already backend-bound) UNet forward; ``sample2`` is the CFG-doubled batch.
    ``latents``: (B, H, W, C) *already scaled* by init_noise_sigma.
    ``ctx``/``text_embeds``/``time_ids``: CFG-doubled (2B, ...) conditioning,
    uncond first.

    Returned fn is pure; wrap in jit (pipeline.py does, with donation).
    """
    sigmas = jnp.asarray(schedule.sigmas)      # (steps+1,)
    timesteps = jnp.asarray(schedule.timesteps)  # (steps,)
    num_steps = len(schedule.timesteps)
    g = float(guidance_scale)

    def cfg_eps(params, lat, t, ctx, text_embeds, time_ids, sigma, extra):
        inp = sched.scale_model_input(lat, sigma)
        if extra is not None:
            # inpainting-style conditioning channels (mask + masked-image
            # latents), concatenated *unscaled*, already CFG-doubled
            inp2 = jnp.concatenate([inp, inp], axis=0)
            inp2 = jnp.concatenate([inp2, extra.astype(inp2.dtype)], axis=-1)
        else:
            inp2 = jnp.concatenate([inp, inp], axis=0)
        t2 = jnp.broadcast_to(t, (inp2.shape[0],))
        eps = unet_step(params, inp2, t2, ctx, text_embeds, time_ids)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + g * (eps_c - eps_u)

    if solver == "euler":

        def loop(params, latents, ctx, text_embeds, time_ids, extra=None):
            def step(lat, xs):
                sigma, sigma_next, t = xs
                eps = cfg_eps(params, lat, t, ctx, text_embeds, time_ids, sigma, extra)
                return sched.euler_step(lat, eps, sigma, sigma_next), None

            xs = (sigmas[:-1], sigmas[1:], timesteps)
            final, _ = jax.lax.scan(step, latents, xs, unroll=unroll)
            return final

    elif solver == "heun":

        def loop(params, latents, ctx, text_embeds, time_ids, extra=None):
            # timestep for the correction eval at sigma_next (last entry is a
            # dummy — that step's trapezoid is masked out at sigma_next == 0)
            t_nexts = jnp.concatenate([timesteps[1:], timesteps[-1:]])

            def step(lat, xs):
                sigma, sigma_next, t, t_next = xs
                eps = cfg_eps(params, lat, t, ctx, text_embeds, time_ids, sigma, extra)
                proposal = sched.euler_step(lat, eps, sigma, sigma_next)
                eps2 = cfg_eps(params, proposal, t_next, ctx, text_embeds,
                               time_ids, sigma_next, extra)
                return sched.heun_step(lat, eps, eps2, sigma, sigma_next), None

            xs = (sigmas[:-1], sigmas[1:], timesteps, t_nexts)
            final, _ = jax.lax.scan(step, latents, xs, unroll=unroll)
            return final

    elif solver == "dpmpp_2m":

        def loop(params, latents, ctx, text_embeds, time_ids, extra=None):
            # sigma_prev[i] = sigmas[i-1] (self for i=0; h_prev=0 is unused then)
            sigma_prevs = jnp.concatenate([sigmas[:1], sigmas[:-2]])

            def step(carry, xs):
                lat, prev_x0, have_prev = carry
                sigma, sigma_next, sigma_prev, t = xs
                eps = cfg_eps(params, lat, t, ctx, text_embeds, time_ids, sigma, extra)
                lat, x0 = sched.dpmpp_2m_step(
                    lat, eps, sigma, sigma_next, prev_x0, have_prev, sigma_prev
                )
                return (lat, x0, jnp.bool_(True)), None

            xs = (sigmas[:-1], sigmas[1:], sigma_prevs, timesteps)
            init = (
                latents,
                jnp.zeros_like(latents, jnp.float32),
                jnp.bool_(False),
            )
            (final, _, _), _ = jax.lax.scan(step, init, xs, unroll=unroll)
            return final

    else:
        raise ValueError(f"unknown solver {solver!r}")

    loop.num_steps = num_steps
    return loop
