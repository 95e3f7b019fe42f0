"""Seeded dropout Pallas TPU kernel.

Capability analog of the reference's seeded-dropout Triton demo (reference
``src/stabletriton/kernels/dropout.py`` — ``tl.rand(seed, offsets)`` based,
*not wired* into its inference pipeline; inference removes dropout instead,
and so does this framework's model code). Kept as a first-class kernel for
API completeness and as the pattern for stateless on-chip randomness: the
TPU-native version seeds the per-core PRNG from (seed, program_id) so every
grid tile draws an independent, reproducible stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletriton_tpu.kernels.common import interpret_mode, round_up, rows_for_budget
from stabletriton_tpu.ops.registry import register


def _dropout_kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    # uniform [0,1) from the top 24 bits (exact float32 representation)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = u >= rate
    scale = 1.0 / (1.0 - rate)
    o_ref[...] = jnp.where(keep, x_ref[...] * scale, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def seeded_dropout(
    x: jax.Array,
    seed: jax.Array | int,
    *,
    rate: float = 0.1,
    interpret: bool | None = None,
):
    """Deterministic dropout: same (x, seed, rate) -> same mask."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1), got {rate}")
    if rate == 0.0:
        return x
    if interpret is None:
        interpret = interpret_mode()
    if interpret:
        # interpreter mode has no TPU PRNG; use jax.random (different stream,
        # same contract: deterministic in (x, seed, rate))
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        keep = jax.random.uniform(key, x.shape) >= rate
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)

    orig_shape = x.shape
    c = orig_shape[-1] if x.ndim > 1 else x.size
    rows = x.size // c
    xf = x.reshape(rows, c)
    block_rows = min(rows_for_budget(c, x.dtype.itemsize, n_buffers=2),
                     round_up(rows, 8))
    rows_p = round_up(rows, block_rows)
    if rows_p != rows:
        xf = jnp.pad(xf, ((0, rows_p - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dropout_kernel, rate=float(rate)),
        grid=(rows_p // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), x.dtype),
    )(jnp.asarray(seed, jnp.int32).reshape(1), xf)

    if rows_p != rows:
        out = out[:rows]
    return out.reshape(orig_shape)


@register("dropout", "pallas")
def dropout_op(x, seed, *, rate=0.1):
    return seeded_dropout(x, seed, rate=rate)


@register("dropout", "reference")
def dropout_reference(x, seed, *, rate=0.1):
    if rate == 0.0:
        return x
    key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
    keep = jax.random.uniform(key, x.shape) >= rate
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
