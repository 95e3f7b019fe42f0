"""Fused flash attention (non-causal) Pallas TPU kernel.

The capability analog of the reference's attention path: StableTriton matched
the 8-node unfused SDPA subgraph and spliced in xformers memory-efficient
attention (reference ``src/stabletriton/optimizers/replace_attention.py:60-92``;
its own Triton FA2 kernel at ``src/stabletriton/kernels/attention_fa2.py`` has
the same online-softmax structure this kernel uses, but went unused at runtime).

TPU design (not a translation):
  * grid = (batch*heads, q_blocks, kv_blocks) with the kv dimension innermost
    and "arbitrary" semantics — Pallas double-buffers the K/V block DMAs while
    the MXU works, so HBM traffic is streamed, never materializing the (Sq, Sk)
    score matrix XLA's naive softmax-attention would write to HBM;
  * online softmax with running max/denominator kept fully lane-broadcast
    ((block_q, 128) f32 scratch) so every rescale is a plain VPU op;
  * fp32 accumulation for both dots (``preferred_element_type``), bf16 inputs;
  * SDXL's cross-attention KV length (77) is zero-padded to the lane width and
    masked with a large negative logit, so softmax mass on padding is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletriton_tpu.kernels.common import NEG_INF, interpret_mode, round_up
from stabletriton_tpu.ops.registry import register

LANES = 128


def _flash_kernel(
    q_ref, k_ref, v_ref,  # (1, block_q, D), (1, block_k, D), (1, block_k, D)
    o_ref,                # (1, block_q, D)
    m_ref, l_ref, acc_ref,  # scratch: (block_q, LANES), (block_q, LANES), (block_q, D)
    *,
    scale: float,
    kv_len: int,
    block_k: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    s = s * scale

    # mask zero-padded keys (static branch: only emitted when padding exists;
    # for non-final kv blocks the compare is all-true and folds to a no-op)
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[...]          # (block_q, LANES), lane-broadcast
    m_cur = jnp.max(s, axis=1, keepdims=True)          # (block_q, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    alpha = jnp.exp(m_prev - m_next)                   # rescale factor
    p = jnp.exp(s - m_next[:, :1])                     # (block_q, block_k)

    l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    m_ref[...] = m_next

    acc = acc_ref[...] * alpha[:, :1]  # lane-broadcast (works for any head_dim)
    acc_ref[...] = acc + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[..., :1].clip(1e-30)).astype(o_ref.dtype)


def _single_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    """Fast path when all of K/V fits one block (SDXL cross-attention, 77->128):
    plain softmax in-register, no running-max/denominator scratch."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len != k_ref.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """q: (B, H, Sq, D); k, v: (B, H, Sk, D) -> (B, H, Sq, D). Non-causal."""
    if interpret is None:
        interpret = interpret_mode()
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    block_q = min(block_q, round_up(sq, 8))
    block_k = min(block_k, round_up(sk, LANES))

    # pad seq lens to block multiples (static shapes; XLA folds the pads)
    sq_p = round_up(sq, block_q)
    sk_p = round_up(sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v

    qf = qp.reshape(b * h, sq_p, d)
    kf = kp.reshape(b * h, sk_p, d)
    vf = vp.reshape(b * h, sk_p, d)

    if sk_p == block_k:
        out = pl.pallas_call(
            functools.partial(_single_kv_kernel, scale=float(scale), kv_len=sk),
            grid=(b * h, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qf, kf, vf)
        out = out.reshape(b, h, sq_p, d)
        return out[:, :, :sq, :] if sq_p != sq else out

    grid = (b * h, sq_p // block_q, sk_p // block_k)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=float(scale), kv_len=sk, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, sq_p, d)
    if sq_p != sq:
        out = out[:, :, :sq, :]
    return out


@register("attention", "pallas")
def attention(q, k, v, *, scale=None):
    return flash_attention(q, k, v, scale=scale)
