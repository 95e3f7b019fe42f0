"""Fused GroupNorm (+ optional SiLU) Pallas TPU kernels.

Capability analog of the reference's Triton groupnorm (reference
``src/stabletriton/kernels/groupnorm.py``: one program per (batch, group),
whole group loaded as a single block). That design cannot work on TPU at SDXL
sizes — a 1024² level-0 group is (128·128 spatial × 10 ch) per group but lives
channel-last, and VMEM is ~16 MB — so the TPU design is a two-kernel pipeline
over NHWC spatial tiles (SURVEY.md §7 "hard parts" #1):

  1. ``_stats_kernel``: grid (N, row_tiles) over x reshaped (N, H·W, C);
     accumulates per-channel sum / sum-of-squares in fp32 VMEM scratch across
     the sequential tile dimension, emitting (N, C) moments in one read of x.
  2. group-reduce (C → G) and the affine fold happen on (N, C)-sized arrays in
     plain XLA (microscopic), producing per-channel scale/shift:
     ``out = x * (rstd·gamma) + (beta − mean·rstd·gamma)``.
  3. ``_apply_kernel``: elementwise scale/shift + optional fused SiLU in one
     further read and one write of x.

Total HBM traffic: 2 reads + 1 write of x — the same lower bound any
non-approximate groupnorm has when x exceeds VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletriton_tpu.kernels.common import interpret_mode, round_up, rows_for_budget
from stabletriton_tpu.ops.registry import register


def _stats_kernel(x_ref, sum_ref, sq_ref, acc_sum, acc_sq):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_sum[...] = jnp.zeros_like(acc_sum)
        acc_sq[...] = jnp.zeros_like(acc_sq)

    x = x_ref[0].astype(jnp.float32)  # (rows, C); zero padding is stat-neutral
    acc_sum[...] += jnp.sum(x, axis=0, keepdims=True)
    acc_sq[...] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(t == pl.num_programs(1) - 1)
    def _emit():
        sum_ref[0] = acc_sum[...]
        sq_ref[0] = acc_sq[...]


def _apply_kernel(x_ref, scale_ref, shift_ref, o_ref, *, act):
    x = x_ref[0].astype(jnp.float32)
    out = x * scale_ref[0] + shift_ref[0]
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "block_rows", "interpret")
)
def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
):
    """x: (N, H, W, C) NHWC -> same shape, optional fused SiLU."""
    if interpret is None:
        interpret = interpret_mode()
    n, h, w, c = x.shape
    assert c % num_groups == 0
    rows = h * w
    xf = x.reshape(n, rows, c)

    if block_rows is None:
        block_rows = rows_for_budget(c, x.dtype.itemsize, n_buffers=2, max_rows=2048)
    block_rows = min(block_rows, round_up(rows, 8))
    rows_p = round_up(rows, block_rows)
    if rows_p != rows:
        xf = jnp.pad(xf, ((0, 0), (0, rows_p - rows), (0, 0)))
    grid = (n, rows_p // block_rows)

    # (n, 1, c) output layout: TPU block shapes must have their last two dims
    # divisible by (8, 128) or equal to the array dims — (1, 1, c) qualifies.
    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf)

    # group-level moments + affine fold: (N, C)-sized math, XLA territory
    sums, sqs = sums[:, 0], sqs[:, 0]
    cnt = rows * (c // num_groups)
    gsum = jnp.sum(sums.reshape(n, num_groups, -1), axis=-1, keepdims=True)
    gsq = jnp.sum(sqs.reshape(n, num_groups, -1), axis=-1, keepdims=True)
    mean = gsum / cnt
    var = gsq / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.broadcast_to(mean, (n, num_groups, c // num_groups)).reshape(n, c)
    rstd = jnp.broadcast_to(rstd, (n, num_groups, c // num_groups)).reshape(n, c)
    scale = rstd * gamma.astype(jnp.float32)[None, :]
    shift = beta.astype(jnp.float32)[None, :] - mean * scale

    scale = scale[:, None]  # (n, 1, c) for the same block-shape rule
    shift = shift[:, None]
    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rows_p, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xf, scale, shift)

    if rows_p != rows:
        out = out[:, :rows, :]
    return out.reshape(n, h, w, c)


@register("group_norm", "pallas")
def group_norm_op(x, gamma, beta, *, num_groups=32, eps=1e-5, act=None):
    return group_norm(x, gamma, beta, num_groups=num_groups, eps=float(eps), act=act)
