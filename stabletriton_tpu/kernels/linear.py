"""Fused Linear (matmul + bias + activation) Pallas TPU kernel.

Capability analog of the reference's autotuned Triton GEMM with fused bias +
SiLU (reference ``src/stabletriton/kernels/linear.py`` — ~58-config autotune,
L2-aware program reordering). Like the reference's plain-linear pass — which
*regressed* end-to-end and was disabled (``optimization.py:18-19``) — this
kernel is registered but NOT in the default binding: XLA's dot already runs
SDXL's matmuls at ~145 TF/s on the MXU (perfetto-measured), so the kernel
exists for A/B experiments and as the building block for future epilogue
fusions, not as a default win.

Design: classic (M, N, K) tiling; K innermost with "arbitrary" semantics and
an f32 VMEM accumulator; bias add + activation fused into the final-K store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletriton_tpu.kernels.common import erf_approx, interpret_mode, round_up
from stabletriton_tpu.ops.registry import register


def _linear_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, act, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        out = acc_ref[...] + b_ref[...].astype(jnp.float32)
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        elif act == "gelu":
            # exact (erf) gelu to match the reference op's semantics
            out = 0.5 * out * (1.0 + erf_approx(out * (2.0**-0.5)))
        o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "block_m", "block_n", "block_k", "interpret")
)
def fused_linear(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    act: str | None = None,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """x: (..., K) @ w: (K, N) + b, optional fused activation."""
    if interpret is None:
        interpret = interpret_mode()
    orig_shape = x.shape
    k_dim = orig_shape[-1]
    n = w.shape[1]
    m = x.size // k_dim
    xf = x.reshape(m, k_dim)
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    block_m = min(block_m, round_up(m, 8))
    block_n = min(block_n, round_up(n, 128))
    block_k = min(block_k, round_up(k_dim, 128))
    m_p, n_p, k_p = (round_up(m, block_m), round_up(n, block_n),
                     round_up(k_dim, block_k))
    if (m_p, k_p) != (m, k_dim):
        xf = jnp.pad(xf, ((0, m_p - m), (0, k_p - k_dim)))
    wf = jnp.pad(w, ((0, k_p - k_dim), (0, n_p - n))) if (k_p, n_p) != w.shape else w
    bf = jnp.pad(b, (0, n_p - n)) if n_p != n else b
    bf = bf.reshape(1, n_p)

    n_k = k_p // block_k
    out = pl.pallas_call(
        functools.partial(_linear_kernel, act=act, n_k=n_k),
        grid=(m_p // block_m, n_p // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf, wf, bf)

    if (m_p, n_p) != (m, n):
        out = out[:m, :n]
    return out.reshape(*orig_shape[:-1], n)


@register("linear", "pallas")
def linear_op(x, w, b=None, *, act=None):
    return fused_linear(x, w, b, act=act)
