"""Fused LayerNorm Pallas TPU kernel.

Capability analog of the reference's Triton layernorm (reference
``src/stabletriton/kernels/layer_norm.py`` — Welford single-pass, one program
per row). TPU design: one program per *tile of rows*; the whole feature axis
(SDXL: 640/1280 ≤ 10 KB/row) sits in lanes, so mean/var are plain lane
reductions and the normalize+affine happens in-register — one HBM read, one
write, fp32 moments regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from stabletriton_tpu.kernels.common import interpret_mode, round_up, rows_for_budget
from stabletriton_tpu.ops.registry import register


def _layer_norm_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, eps,
                       rmsnorm=False):
    """Dual-mode row norm — the reference kernel's IS_RMSNORM switch
    (reference src/stabletriton/kernels/layer_norm.py:75,129): RMSNorm is
    the same kernel with the mean subtraction skipped."""
    x = x_ref[...].astype(jnp.float32)  # (rows, C)
    if rmsnorm:
        xc = x
        var = jnp.mean(x * x, axis=-1, keepdims=True)
    else:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps)
    out = out * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret", "rmsnorm")
)
def layer_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-5,
    block_rows: int | None = None,
    interpret: bool | None = None,
    rmsnorm: bool = False,
):
    """x: (..., C); normalizes the last axis (``rmsnorm=True`` skips the
    mean subtraction — RMSNorm)."""
    if interpret is None:
        interpret = interpret_mode()
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    xf = x.reshape(rows, c)

    if block_rows is None:
        block_rows = rows_for_budget(c, x.dtype.itemsize, n_buffers=2)
    block_rows = min(block_rows, round_up(rows, 8))
    rows_p = round_up(rows, block_rows)
    if rows_p != rows:
        xf = jnp.pad(xf, ((0, rows_p - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_layer_norm_kernel, eps=eps, rmsnorm=rmsnorm),
        grid=(rows_p // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), x.dtype),
        interpret=interpret,
    )(xf, gamma, beta)

    if rows_p != rows:
        out = out[:rows]
    return out.reshape(orig_shape)


@register("layer_norm", "pallas")
def layer_norm_op(x, gamma, beta, *, eps=1e-5):
    if gamma is None:
        gamma = jnp.ones((x.shape[-1],), jnp.float32)
    if beta is None:
        beta = jnp.zeros((x.shape[-1],), jnp.float32)
    return layer_norm(x, gamma, beta, eps=float(eps))


@register("rms_norm", "pallas")
def rms_norm_op(x, gamma, beta=None, *, eps=1e-5):
    if gamma is None:
        gamma = jnp.ones((x.shape[-1],), jnp.float32)
    if beta is None:
        beta = jnp.zeros((x.shape[-1],), jnp.float32)
    return layer_norm(x, gamma, beta, eps=float(eps), rmsnorm=True)
