"""Fused sinusoidal timestep-embedding Pallas TPU kernel.

Capability analog of the reference's inductor-generated Triton pointwise kernel
(reference ``src/stabletriton/kernels/timestep.py:14-48`` — sin/cos of
``t · exp(−ln(10000)·i/half)`` with two outputs). TPU design: one program,
2D broadcasted iota for the frequency index, sin+cos emitted as a single
(B, 2·half) block in the flip_sin_to_cos order SDXL uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from stabletriton_tpu.kernels.common import interpret_mode
from stabletriton_tpu.ops.registry import register


def _time_embed_kernel(t_ref, o_ref, *, half, max_period, shift, flip):
    b = t_ref.shape[0]
    # Mosaic requires integer iota; cast after (fp32 exact up to 2^24)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, half), 1).astype(jnp.float32)
    freqs = jnp.exp(col * (-np.log(max_period) / (half - shift)))
    args = t_ref[...].astype(jnp.float32).reshape(b, 1) * freqs
    first, second = (jnp.cos(args), jnp.sin(args)) if flip else (jnp.sin(args), jnp.cos(args))
    o_ref[:, :half] = first
    o_ref[:, half:] = second


@functools.partial(
    jax.jit,
    static_argnames=("dim", "max_period", "flip_sin_to_cos", "downscale_freq_shift", "interpret"),
)
def time_embed(
    t: jax.Array,
    *,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    interpret: bool | None = None,
):
    """(B,) timesteps -> (B, dim) fp32 embedding (dim must be even)."""
    if interpret is None:
        interpret = interpret_mode()
    (b,) = t.shape
    half = dim // 2
    return pl.pallas_call(
        functools.partial(
            _time_embed_kernel,
            half=half,
            max_period=float(max_period),
            shift=float(downscale_freq_shift),
            flip=flip_sin_to_cos,
        ),
        out_shape=jax.ShapeDtypeStruct((b, dim), jnp.float32),
        interpret=interpret,
    )(t.astype(jnp.float32))


@register("time_embed", "pallas")
def time_embed_op(t, *, dim, max_period=10000.0, flip_sin_to_cos=True, downscale_freq_shift=0.0):
    return time_embed(
        t, dim=dim, max_period=max_period, flip_sin_to_cos=flip_sin_to_cos,
        downscale_freq_shift=downscale_freq_shift,
    )
