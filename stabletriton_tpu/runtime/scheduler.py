"""Diffusion noise schedulers (Euler, Euler-Ancestral, Heun, DPM-Solver++ 2M),
on-device.

The reference ran its scheduler as a ~50-step *host* Python loop around the
CUDA-graph replay (reference ``implementations/Diffusers/load_sdxl_pipeline.py:39``,
SURVEY.md §3.4) — scheduler math, CFG combine and the loop itself all outside
the optimization envelope. Here the schedule is precomputed as static arrays
and the step function is pure jax, so the whole denoising loop compiles into
one ``lax.scan`` with zero host round-trips (see runtime/pipeline.py).

Semantics match diffusers' EulerDiscreteScheduler / DPMSolverMultistepScheduler
as SDXL configures them (scaled-linear betas 0.00085->0.012 over 1000 train
steps, "leading" timestep spacing, steps_offset 1, epsilon prediction).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    timestep_spacing: str = "leading"
    steps_offset: int = 1
    use_karras_sigmas: bool = False


@dataclass(frozen=True)
class Schedule:
    """Static per-(config, num_steps) arrays; everything a jitted loop needs."""

    timesteps: np.ndarray  # (steps,) float32, descending
    sigmas: np.ndarray     # (steps + 1,) float32, final entry 0.0
    init_noise_sigma: float


def _training_sigmas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(f"unknown beta_schedule {cfg.beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


def make_schedule(cfg: SchedulerConfig, num_steps: int) -> Schedule:
    train_sigmas = _training_sigmas(cfg)
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        ratio = n // num_steps
        timesteps = (np.arange(num_steps) * ratio).round()[::-1].astype(np.float64)
        timesteps += cfg.steps_offset
    elif cfg.timestep_spacing == "linspace":
        timesteps = np.linspace(0, n - 1, num_steps, dtype=np.float64)[::-1]
    elif cfg.timestep_spacing == "trailing":
        ratio = n / num_steps
        timesteps = (np.arange(n, 0, -ratio)).round().astype(np.float64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {cfg.timestep_spacing!r}")

    sigmas = np.interp(timesteps, np.arange(n), train_sigmas)
    if cfg.use_karras_sigmas:
        rho = 7.0
        smin, smax = sigmas[-1], sigmas[0]
        ramp = np.linspace(0, 1, num_steps)
        sigmas = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        # The UNet must be conditioned on the timestep that *corresponds* to
        # each Karras sigma, not the original spacing's timesteps (diffusers
        # recomputes via _sigma_to_t: interpolate log(sigma) on the training
        # log-sigma table).
        timesteps = np.interp(
            np.log(sigmas), np.log(train_sigmas), np.arange(n, dtype=np.float64)
        )
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    init_noise_sigma = float(np.sqrt(sigmas.max() ** 2 + 1))
    return Schedule(
        timesteps=timesteps.astype(np.float32),
        sigmas=sigmas,
        init_noise_sigma=init_noise_sigma,
    )


def scale_model_input(sample: jnp.ndarray, sigma) -> jnp.ndarray:
    """Euler pre-scaling: sample / sqrt(sigma^2 + 1)."""
    return (sample / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def euler_step(sample, eps, sigma, sigma_next):
    """One Euler step under epsilon prediction.

    pred_x0 = sample - sigma*eps; derivative = (sample - pred_x0)/sigma = eps;
    sample' = sample + eps * (sigma_next - sigma).
    """
    return (sample + eps.astype(jnp.float32) * (sigma_next - sigma)).astype(sample.dtype)


def ancestral_sigmas(sigma, sigma_next):
    """(sigma_down, sigma_up) for an ancestral step (k-diffusion
    ``get_ancestral_step``, eta=1): the deterministic part steps to
    sigma_down and fresh noise at sigma_up restores the marginal at
    sigma_next (sigma_down^2 + sigma_up^2 == sigma_next^2)."""
    var_up = sigma_next**2 * (sigma**2 - sigma_next**2) / jnp.maximum(sigma**2, 1e-20)
    sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def euler_ancestral_step(sample, eps, sigma, sigma_next, noise):
    """One Euler-Ancestral step (epsilon prediction, eta=1).

    diffusers EulerAncestralDiscreteScheduler / k-diffusion
    ``sample_euler_ancestral``: Euler step to sigma_down, then add fresh
    gaussian ``noise`` scaled by sigma_up. At sigma_next == 0 both collapse
    to pred_x0 (sigma_down == sigma_up == 0), so the final step is
    deterministic and noise-free.
    """
    sigma_down, sigma_up = ancestral_sigmas(sigma, sigma_next)
    x = sample.astype(jnp.float32) + eps.astype(jnp.float32) * (sigma_down - sigma)
    x = x + noise.astype(jnp.float32) * sigma_up
    return x.astype(sample.dtype)


def heun_step(sample, eps, eps_next, sigma, sigma_next):
    """One Heun (improved-Euler, 2nd order) step under epsilon prediction.

    eps is the derivative at sigma; eps_next the derivative evaluated at the
    Euler proposal point at sigma_next (k-diffusion ``sample_heun``,
    deterministic). At sigma_next == 0 the trapezoid is skipped and the step
    collapses to the Euler step (== pred_x0). 2 model evaluations per step.
    """
    x = sample.astype(jnp.float32)
    e1 = eps.astype(jnp.float32)
    e2 = eps_next.astype(jnp.float32)
    euler = x + e1 * (sigma_next - sigma)
    trap = x + 0.5 * (e1 + e2) * (sigma_next - sigma)
    return jnp.where(sigma_next == 0.0, euler, trap).astype(sample.dtype)


def dpmpp_2m_step(sample, eps, sigma, sigma_next, prev_x0, have_prev, sigma_prev):
    """One DPM-Solver++(2M) step (epsilon prediction, deterministic).

    The sample lives in Karras sigma-space (x = x0 + sigma*eps — exactly what
    the pipeline produces: init noise ~ sigma_max, pred_x0 = x - sigma*eps),
    so this is the k-diffusion ``sample_dpmpp_2m`` update with
    lambda(s) = -log(s), h = lambda' - lambda:

        x' = (s_next / s_cur) * x - expm1(-h) * D

    where D is the data prediction — pred_x0 on the first step, and the
    standard 2M extrapolation of the current and previous pred_x0 after.
    This update is *exact* for a constant data prediction (D independent of
    sigma): x' = x0 + s_next * c whenever x = x0 + s_cur * c.
    At sigma_next == 0 it collapses exactly to x' = pred_x0.
    Returns (new_sample, pred_x0) so the scan can carry the multistep state.
    """
    eps = eps.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    x0 = x - sigma * eps

    eps_floor = 1e-10
    s_cur = jnp.maximum(sigma, eps_floor)
    s_next = jnp.maximum(sigma_next, eps_floor)
    s_prev = jnp.maximum(sigma_prev, eps_floor)

    lam = lambda s: -jnp.log(s)
    h = lam(s_next) - lam(s_cur)
    h_prev = lam(s_cur) - lam(s_prev)
    r0 = h_prev / jnp.maximum(h, eps_floor)

    d2 = (1.0 + 1.0 / (2.0 * jnp.maximum(r0, eps_floor))) * x0 - (
        1.0 / (2.0 * jnp.maximum(r0, eps_floor))
    ) * prev_x0
    d = jnp.where(have_prev, d2, x0)

    new_sample = (s_next / s_cur) * x - jnp.expm1(-h) * d
    new_sample = jnp.where(sigma_next == 0.0, x0, new_sample)
    return new_sample.astype(sample.dtype), x0
