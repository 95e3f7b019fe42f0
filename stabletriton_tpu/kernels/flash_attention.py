"""Fused flash attention (non-causal) Pallas TPU kernel.

The capability analog of the reference's attention path: StableTriton matched
the 8-node unfused SDPA subgraph and spliced in xformers memory-efficient
attention (reference ``src/stabletriton/optimizers/replace_attention.py:60-92``;
its own Triton FA2 kernel at ``src/stabletriton/kernels/attention_fa2.py`` has
the same online-softmax structure this kernel uses, but went unused at runtime).

TPU design (not a translation):
  * operands stay in the model's natural (B, S, H*D) layout — heads are
    addressed by the BlockSpec index map (block (1, block_q, D) at channel
    offset h*D), so the (B,S,H,D)<->(B,H,S,D) transposes that cost ~11 ms/step
    in the XLA path simply do not exist;
  * grid = (B, H, q_blocks, kv_blocks), kv innermost with "arbitrary"
    semantics — Pallas double-buffers K/V block DMAs against the MXU, never
    materializing the (Sq, Sk) score matrix (the XLA softmax-attention writes
    ~26 GB/step of scores to HBM at SDXL shapes);
  * online softmax with lane-broadcast running max/denominator f32 scratch;
  * a single-KV-block fast path (plain in-register softmax, no scratch) for
    SDXL cross-attention (KV 77 -> one 128 block) and short self-attention;
  * fp32 accumulation for both dots; zero-padded keys masked to -1e30;
  * block sizes tuned on v5e (scripts/tune_attention.py): 4.1x over the XLA
    attention at the 4096-token self-attention shape, 2.4x at cross shapes.
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
    m_ref, l_ref, acc_ref,  # scratch: (block_q, LANES) x2, (block_q, D) f32
    *,
    scale: float,
    kv_len: int,
    block_k: int,
):
    kv_idx = pl.program_id(3)

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

    @pl.when(kv_idx == pl.num_programs(3) - 1)
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


def _pick_blocks(sq: int, sk: int, d: int) -> tuple[int, int]:
    """Per-shape block choice, tuned on v5e (scripts/tune_attention.py):

      self S=4096 D=64 : (512, 1024)  -> 4.1x over XLA naive
      cross KV<=128    : (whole-q, 128) single-KV fast path -> 2.4x
      VAE S=16k  D=512 : (512, 1024)  -> 1.5x
    """
    if sk <= LANES:
        return min(sq, 4096), LANES
    if sk <= 1024:
        return 512, 1024  # single-KV path
    return 512, 1024


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int = 1,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """Multi-head attention over channel-packed operands.

    q: (B, Sq, H*D); k, v: (B, Sk, H*D) -> (B, Sq, H*D). Non-causal. Heads are
    sliced out of the channel axis by the grid's index map — no transposes.
    """
    if interpret is None:
        interpret = interpret_mode()
    b, sq, c = q.shape
    sk = k.shape[1]
    assert c % num_heads == 0, (c, num_heads)
    d = c // num_heads
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    auto_q, auto_k = _pick_blocks(sq, sk, d)
    block_q = min(block_q or auto_q, round_up(sq, 8))
    block_k = min(block_k or auto_k, round_up(sk, LANES))

    # pad seq lens to block multiples (static shapes; XLA folds the pads)
    sq_p = round_up(sq, block_q)
    sk_p = round_up(sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
    kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v

    h = num_heads
    if sk_p == block_k:
        out = pl.pallas_call(
            functools.partial(_single_kv_kernel, scale=float(scale), kv_len=sk),
            grid=(b, h, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, hh, j: (i, j, hh)),
                pl.BlockSpec((1, block_k, d), lambda i, hh, j: (i, 0, hh)),
                pl.BlockSpec((1, block_k, d), lambda i, hh, j: (i, 0, hh)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, hh, j: (i, j, hh)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kp, vp)
    else:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, scale=float(scale), kv_len=sk, block_k=block_k
            ),
            grid=(b, h, sq_p // block_q, sk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, hh, j, kk: (i, j, hh)),
                pl.BlockSpec((1, block_k, d), lambda i, hh, j, kk: (i, kk, hh)),
                pl.BlockSpec((1, block_k, d), lambda i, hh, j, kk: (i, kk, hh)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, hh, j, kk: (i, j, hh)),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kp, vp)

    if sq_p != sq:
        out = out[:, :sq, :]
    return out


@register("attention", "pallas")
def attention(q, k, v, *, num_heads=1, scale=None):
    return flash_attention(q, k, v, num_heads=num_heads, scale=scale)
