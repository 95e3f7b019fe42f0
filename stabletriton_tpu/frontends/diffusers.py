"""Diffusers drop-in frontend: ``compile(pipe.unet)`` -> replacement UNet.

The reference's working integration (reference
``implementations/Diffusers/load_sdxl_pipeline.py:16-35``): build a traceable
UNet, load the pipeline's weights, ``optimize_model`` it, splice it back with
``pipe.unet = unet_new``. The TPU equivalent here gives torch users the same
one-call splice: ``pipe.unet = stabletriton_tpu.frontends.diffusers.compile(pipe.unet)``
returns a callable that ingests the torch module's config+weights once, runs
every forward on TPU through the jitted pallas-bound UNet, and speaks the
diffusers calling convention (NCHW sample, ``encoder_hidden_states``,
``added_cond_kwargs={"text_embeds", "time_ids"}``, ``.config`` attribute,
``return_dict`` result shim).

For peak throughput use the native pipeline (runtime/pipeline.py) instead —
this wrapper pays one host<->device round trip per UNet call, exactly like the
reference paid one graph-replay dispatch per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from stabletriton_tpu.compile import (
    CompileConfig,
    compile_unet,
    compile_unet_deepcache,
)
from stabletriton_tpu.io.torch_ingest import state_dict_to_params, unet_config_from_diffusers


@dataclass
class _Output:
    """Duck-types diffusers' UNet2DConditionOutput."""

    sample: Any

    def __getitem__(self, i):
        return (self.sample,)[i]


class CompiledUNet:
    """Drop-in replacement for a diffusers SDXL UNet, executing on TPU."""

    def __init__(self, torch_unet, compile_config: CompileConfig | None = None,
                 deep_cache: int | None = None):
        import jax.numpy as jnp

        self._jnp = jnp
        self.config = torch_unet.config  # diffusers pipeline reads this
        self.unet_config = unet_config_from_diffusers(torch_unet.config)
        # per-step calls make a fresh device array from the torch sample every
        # time, so donating it is always safe here — the static-buffer analog
        # of the reference's CUDA-graph pools (SURVEY §2.4), relevant exactly
        # on this step-at-a-time path (the native pipeline jits the whole loop)
        self.compile_config = compile_config or CompileConfig(donate_sample=True)
        np_params = state_dict_to_params(torch_unet, dtype=np.float32)
        dtype = self.compile_config.jnp_dtype
        self.params = {k: jnp.asarray(v, dtype) for k, v in np_params.items()}
        self._fn = compile_unet(self.unet_config, self.compile_config)
        # DeepCache (Ma et al. 2023) for the step-at-a-time surface: the
        # frontend owns the step loop, so the deep-feature cache lives here
        # as host-side state instead of a scan carry. Draft semantics
        # (outside the exactness gate), like the native pipeline's knob.
        self.deep_cache = None if deep_cache is None else int(deep_cache)
        if self.deep_cache is not None:
            self._dc_full, self._dc_shallow = compile_unet_deepcache(
                self.unet_config, self.compile_config
            )
        self._dc_state = None  # (step_idx, cache, last_t)

    def reset_deep_cache(self):
        """Forget the carried cache (call between generations; auto-detected
        when the timestep jumps back up — schedules are descending)."""
        self._dc_state = None

    @property
    def dtype(self):
        import torch

        return torch.float32

    @property
    def device(self):
        import torch

        return torch.device("cpu")

    def __call__(
        self,
        sample,
        timestep,
        encoder_hidden_states,
        *,
        added_cond_kwargs: dict | None = None,
        return_dict: bool = True,
        **_: Any,
    ):
        import torch

        jnp = self._jnp
        b = sample.shape[0]
        # NCHW torch -> NHWC jax
        s = jnp.asarray(
            sample.detach().to(torch.float32).cpu().numpy().transpose(0, 2, 3, 1)
        )
        if not hasattr(timestep, "shape") or getattr(timestep, "ndim", 0) == 0:
            t = jnp.full((b,), float(timestep), jnp.float32)
        else:
            t = jnp.asarray(
                timestep.detach().to(torch.float32).cpu().numpy()
            ).reshape(-1)
            if t.shape[0] == 1:
                t = jnp.broadcast_to(t, (b,))
        ehs = jnp.asarray(encoder_hidden_states.detach().to(torch.float32).cpu().numpy())
        acs = added_cond_kwargs or {}
        if "y" in acs and "text_embeds" not in acs:
            # SGM/ComfyUI convention: y = concat(pooled, fourier(time_ids)),
            # already projected to the add_embedding input width
            te = jnp.asarray(acs["y"].detach().to(torch.float32).cpu().numpy())
            ti = jnp.zeros((b, 0), jnp.float32)
        elif "text_embeds" in acs:
            te = jnp.asarray(acs["text_embeds"].detach().to(torch.float32).cpu().numpy())
            ti = jnp.asarray(acs["time_ids"].detach().to(torch.float32).cpu().numpy())
        else:
            # SD1.x/2.x: no added conditioning
            te = jnp.zeros((b, 0), jnp.float32)
            ti = jnp.zeros((b, 0), jnp.float32)

        if self.deep_cache is None:
            out = self._fn(self.params, s, t, ehs, te, ti)
        else:
            t_now = float(np.asarray(t)[0])
            if self._dc_state is not None and t_now > self._dc_state[2]:
                # timestep jumped back up: a new generation started
                self._dc_state = None
            if self._dc_state is None or self._dc_state[0] % self.deep_cache == 0:
                out, cache = self._dc_full(self.params, s, t, ehs, te, ti)
            else:
                cache = self._dc_state[1]
                out = self._dc_shallow(self.params, s, t, ehs, te, ti, cache)
            idx = 0 if self._dc_state is None else self._dc_state[0]
            self._dc_state = (idx + 1, cache, t_now)
        out_t = torch.from_numpy(
            np.asarray(out.astype(jnp.float32)).transpose(0, 3, 1, 2).copy()
        ).to(sample.dtype)
        if return_dict:
            return _Output(sample=out_t)
        return (out_t,)


def compile(torch_unet, compile_config: CompileConfig | None = None,
            deep_cache: int | None = None) -> CompiledUNet:
    """The one-call API promised by the reference README (`model = compile(model)`).

    ``deep_cache=N`` (draft knob — DeepCache, Ma et al. 2023): full UNet
    every N-th step, only the outermost level (splicing the carried
    deep-feature cache) in between; generation boundaries are auto-detected
    from the descending timestep schedule (or call ``reset_deep_cache()``)."""
    return CompiledUNet(torch_unet, compile_config, deep_cache=deep_cache)
