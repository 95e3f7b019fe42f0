"""Fused GEGLU Pallas TPU kernel: state * gelu(gate) in one pass.

Capability analog of the reference's Triton GEGLU (reference
``src/stabletriton/kernels/geglu.py:11-35`` — erf-based gelu, 1024-wide
blocks). TPU design: 2D row-tile grid over the flattened operands; exact
(erf) gelu in fp32 on the VPU, two reads one write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from stabletriton_tpu.kernels.common import erf_approx, interpret_mode, round_up, rows_for_budget
from stabletriton_tpu.ops.registry import register


def _geglu_kernel(state_ref, gate_ref, o_ref):
    gate = gate_ref[...].astype(jnp.float32)
    # erf-based (exact) gelu, like the reference kernel: 0.5*g*(1+erf(g/sqrt2))
    act = 0.5 * gate * (1.0 + erf_approx(gate * (2.0**-0.5)))
    o_ref[...] = (state_ref[...].astype(jnp.float32) * act).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def geglu(
    state: jax.Array,
    gate: jax.Array,
    *,
    block_rows: int | None = None,
    interpret: bool | None = None,
):
    if interpret is None:
        interpret = interpret_mode()
    assert state.shape == gate.shape
    orig_shape = state.shape
    c = orig_shape[-1]
    rows = state.size // c
    sf = state.reshape(rows, c)
    gf = gate.reshape(rows, c)

    if block_rows is None:
        block_rows = rows_for_budget(c, state.dtype.itemsize, n_buffers=3)
    block_rows = min(block_rows, round_up(rows, 8))
    rows_p = round_up(rows, block_rows)
    if rows_p != rows:
        sf = jnp.pad(sf, ((0, rows_p - rows), (0, 0)))
        gf = jnp.pad(gf, ((0, rows_p - rows), (0, 0)))

    out = pl.pallas_call(
        _geglu_kernel,
        grid=(rows_p // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), state.dtype),
        interpret=interpret,
    )(sf, gf)

    if rows_p != rows:
        out = out[:rows]
    return out.reshape(orig_shape)


@register("geglu", "pallas")
def geglu_op(state, gate):
    return geglu(state, gate)
