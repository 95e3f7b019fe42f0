"""Fused flash attention (non-causal) Pallas TPU kernel.

The capability analog of the reference's attention path: StableTriton matched
the 8-node unfused SDPA subgraph and spliced in xformers memory-efficient
attention (reference ``src/stabletriton/optimizers/replace_attention.py:60-92``;
its own Triton FA2 kernel at ``src/stabletriton/kernels/attention_fa2.py`` has
the same online-softmax structure this kernel uses, but went unused at runtime).

TPU design (not a translation) — three kernels routed per shape, all taking
the model's natural channel-packed (B, S, H*D) operands:

  * tiny-KV (SDXL cross-attention, KV 77 -> one 128 block): an *all-heads*
    kernel on the free (B, S, H, D) view — blocks span every head (trailing
    dims equal the array's, satisfying Mosaic's (8,128) tiling rule for any
    head_dim), heads loop in-kernel, outputs emit per-head (Mosaic cannot
    unsqueeze 2D stores into 4D slots) and lane-concat back. Zero transposes;
    2.4-7.7x over the XLA attention at SDXL cross shapes;
  * self-attention with d | 128 and the head count divisible by the pack
    factor (every SD/SDXL shape: d=64, h in {5,10,20}): *head-packed*
    channel-packed kernels — blocks are (block_q, 128) lane tiles covering
    128/d heads taken straight from the (B, S, H*D) layout, so the
    (B,S,HD)->(BH,S,D) transposes of a head-major design never happen (at
    SDXL shapes those transposes cost ~3 GB of HBM round-trips per step).
    Single-KV variant (KV fits one block) and online-softmax variant (grid
    kv-innermost "arbitrary"; the (Sq, Sk) score matrix never touches HBM;
    running max/denominator per packed head in lane-chunked (block_q, 128)
    f32 scratch);
  * fallback BH-major kernels (single-KV + online softmax) for layouts the
    packed path can't take (d not a divisor of 128, odd head counts).

Softmax runs in base 2: the q-prescale folds scale*log2(e) into q once, and
the kernels use exp2 (softmax is base-invariant when logits are pre-scaled
by log2 e; exp2 is the cheaper VPU transcendental).

fp32 accumulation for both dots everywhere; zero-padded keys masked to -1e30;
block sizes come from the per-shape tuned table (kernels/autotune.py) when an
entry exists, else a static v5e heuristic, auto-shrunk against an explicit
VMEM byte model (~16MB scoped limit).
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
VMEM_BUDGET = 10 << 20  # leave headroom under the ~16MB scoped limit
LOG2E = 1.4426950408889634  # softmax in base 2: fold log2(e) into q-prescale
# Shift-free softmax: softmax is shift-invariant, so the row-max subtraction
# only exists to keep exp in range. In f32 base-2 that guard is an upper clip
# at 80 (2^80 per term, <=2^93 summed over 8K keys — far below f32 overflow;
# any real attention row with a base-2 logit above 80 is already degenerate).
# Dropping the max deletes a whole VPU read-pass over the (block_q, block_k)
# score matrix per program — the measured bottleneck of the single-KV kernels
# (125us/call at SDXL S=1024 vs a ~30us compute floor). The -1e30 padding
# mask still maps to exp2(-1e30) == 0 exactly. ST_SOFTMAX_MAXSUB=1 restores
# the max-subtracting form (A/B / paranoia escape hatch).
SOFTMAX_CLIP = 80.0


def _maxsub() -> bool:
    import os

    return os.environ.get("ST_SOFTMAX_MAXSUB", "") not in ("", "0")


def _bf16_scores() -> bool:
    """Trace-time A/B flag (ST_BF16_SCORES): run the whole score/softmax
    pipeline in bf16 — the QK dot still accumulates f32 on the MXU but emits
    bf16, and the mask/min/exp2 chain runs on bf16 elements. The packed
    kernels are VPU/VMEM-bound on exactly those (block_q, block_k) score
    temps (round-3 trace: ~7 ms/step above the MXU floor), and bf16 halves
    both the VPU element traffic (packed 2x-rate ops) and the temps' VMEM
    bytes. Only new rounding: the logits quantize to 8 mantissa bits before
    exp2 (the numerator was already cast to bf16 for the PV dot; the
    denominator still accumulates in f32), i.e. softmax weights pick up a
    ~0.4% relative wiggle — same order as the bf16 activations themselves.
    Ignored under ST_SOFTMAX_MAXSUB (the paranoia path stays full f32)."""
    import os

    return os.environ.get("ST_BF16_SCORES", "") not in ("", "0")


def _score_dt():
    """Element type the QK dot emits / the softmax chain runs in."""
    if _bf16_scores() and not _maxsub():
        return jnp.bfloat16
    return jnp.float32


def _mxu_lsum() -> bool:
    """Experimental (A/B, trace-time): compute the softmax denominator as a
    dot with ones on the MXU instead of a VPU row-sum. The packed kernels
    are VPU-bound (min+exp2+sum+cast per score element vs two MXU dots that
    finish early); moving the sum to the under-used MXU trades ~1 VPU
    op/element for one extra PV-sized bf16 dot. Numerics: the denominator
    then sums the SAME bf16-cast p the numerator multiplies — the
    quantization is common-mode and partially cancels under the o/l divide
    (the f32-sum form normalizes bf16 weights by an f32 denominator)."""
    import os

    return os.environ.get("ST_MXU_LSUM", "") not in ("", "0")


def _plain_softmax_num(s):
    """exp2 numerator of the shift-free (or max-subtracting) softmax."""
    if _maxsub():
        return jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
    return jnp.exp2(jnp.minimum(s, SOFTMAX_CLIP))


def _flash_kernel(
    q_ref, k_ref, v_ref,    # (1, block_q, D), (1, block_k, D) x2  [BH-major]
    o_ref,                  # (1, block_q, D)
    *scratch,               # maxsub: m, l (block_q, LANES), acc (block_q, D)
                            # shift-free: l, acc (no running max needed)
    kv_len: int,
    block_k: int,
    mask_kv: bool,
):
    if _maxsub():
        m_ref, l_ref, acc_ref = scratch
    else:
        l_ref, acc_ref = scratch
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        if _maxsub():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=_score_dt()
    )
    if mask_kv:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    if _maxsub():
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])

        l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), m_prev.shape
        )
        m_ref[...] = m_next
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # shift-free: the clip makes the accumulators range-safe (<= 2^93
        # over 8K keys), so the entire running-max/rescale machinery of
        # "online" softmax disappears — plain sums across kv blocks
        p = jnp.exp2(jnp.minimum(s, SOFTMAX_CLIP))
        l_ref[...] = l_ref[...] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32), l_ref.shape
        )
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[..., :1].clip(1e-30)).astype(o_ref.dtype)


def _single_kv_kernel(q_ref, k_ref, v_ref, *o_refs, kv_len):
    """Fast path when all of K/V fits one block (SDXL cross-attention, 77->128,
    and short self-attention): plain softmax in-register, no scratch."""
    h = q_ref.shape[2]
    block_k = k_ref.shape[1]
    sdt = _score_dt()
    if kv_len != block_k:
        col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], block_k), 1)
    for i in range(h):
        q = q_ref[0, :, i, :]
        k = k_ref[0, :, i, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=sdt
        )
        if kv_len != block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)
        p = _plain_softmax_num(s)
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, i, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_refs[i][0] = (o / l.clip(1e-30)).astype(o_refs[i].dtype)


def _single_kv_kernel_bh(q_ref, k_ref, v_ref, o_ref, *, kv_len):
    """BH-major single-KV-block kernel (one head per program, no scratch)."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=_score_dt()
    )
    if kv_len != k_ref.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = _plain_softmax_num(s)
    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l.clip(1e-30)).astype(o_ref.dtype)


def _packed_single_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, head_dim,
                             q_scale=None):
    """Head-packed single-KV kernel on the channel-packed (B, S, H*D) layout:
    each 128-lane block carries 128//head_dim heads; every sub-head runs its
    own in-register softmax chain on a static lane slice. No transposes ever
    touch HBM. ``q_scale`` applies the softmax-scale*log2(e) prescale in-VMEM
    (used when q comes straight from a fused projection array and the caller
    could not fold the scale into the producing matmul)."""
    q = q_ref[0]            # (block_q, LANES)
    if q_scale is not None:
        q = q * jnp.asarray(q_scale, q.dtype)
    k = k_ref[0]            # (block_k, LANES)
    v = v_ref[0]
    block_k = k_ref.shape[1]
    pack = q.shape[1] // head_dim
    sdt = _score_dt()
    if kv_len != block_k:
        col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1)
    mxu_lsum = _mxu_lsum()
    outs = []
    for i in range(pack):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=sdt,
        )
        if kv_len != block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)
        p = _plain_softmax_num(s)
        p16 = p.astype(v.dtype)
        if mxu_lsum:
            # denominator on the MXU (see _mxu_lsum): dot with ones gives
            # (bq, d) — already broadcast for the elementwise divide
            l = jax.lax.dot_general(
                p16, jnp.ones((p16.shape[1], head_dim), p16.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        o = jax.lax.dot_general(
            p16, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l.clip(1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _packed_flash_kernel(
    q_ref, k_ref, v_ref,    # (1, block_q, LANES), (1, block_k, LANES) x2
    o_ref,                  # (1, block_q, LANES)
    *scratch,               # (block_q, LANES) f32 each, lane-chunked:
                            # maxsub m, l, acc; shift-free l, acc only
    kv_len: int,
    block_k: int,
    head_dim: int,
    mask_kv: bool = True,
    q_scale=None,
):
    """Head-packed online-softmax kernel (channel-packed layout, kv-innermost
    grid). Scratch is lane-chunked: lanes [i*d:(i+1)*d] of m/l/acc belong to
    sub-head i (m/l hold the per-row running max/denominator broadcast over
    the sub-head's lanes), so the finalize divide is a plain elementwise op.
    The shift-free default needs no running max — it gets 2 scratch buffers,
    not 3 (one more (block_q, 128) f32 of VMEM headroom for bigger blocks)."""
    if _maxsub():
        m_ref, l_ref, acc_ref = scratch
    else:
        l_ref, acc_ref = scratch
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        if _maxsub():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    if q_scale is not None:
        q = q * jnp.asarray(q_scale, q.dtype)
    k = k_ref[0]
    v = v_ref[0]
    pack = q.shape[1] // head_dim
    if mask_kv:
        col = (jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1)
               + kv_idx * block_k)

    maxsub = _maxsub()
    mxu_lsum = not maxsub and _mxu_lsum()
    sdt = _score_dt()
    m_prev = m_ref[...] if maxsub else None
    alphas, m_news, p_sums, os = [], [], [], []
    for i in range(pack):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=sdt,
        )
        if mask_kv:
            s = jnp.where(col < kv_len, s, NEG_INF)
        if maxsub:
            m_p = m_prev[:, sl]                           # (bq, d) broadcast
            m_c = jnp.max(s, axis=1, keepdims=True)       # (bq, 1)
            m_n = jnp.maximum(m_p, jnp.broadcast_to(m_c, m_p.shape))
            p = jnp.exp2(s - m_n[:, :1])
            alphas.append(jnp.exp2(m_p - m_n))
            m_news.append(m_n)
        else:
            # shift-free (see SOFTMAX_CLIP): no running max, no rescales
            p = jnp.exp2(jnp.minimum(s, SOFTMAX_CLIP))
        p16 = p.astype(v.dtype)
        if mxu_lsum:
            # denominator on the MXU (see _mxu_lsum)
            p_sums.append(jax.lax.dot_general(
                p16, jnp.ones((p16.shape[1], head_dim), p16.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        else:
            p_sums.append(jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32),
                (q.shape[0], head_dim)
            ))
        os.append(jax.lax.dot_general(
            p16, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    if maxsub:
        alpha = jnp.concatenate(alphas, axis=1)           # (bq, LANES)
        m_ref[...] = jnp.concatenate(m_news, axis=1)
        l_ref[...] = l_ref[...] * alpha + jnp.concatenate(p_sums, axis=1)
        acc_ref[...] = acc_ref[...] * alpha + jnp.concatenate(os, axis=1)
    else:
        l_ref[...] = l_ref[...] + jnp.concatenate(p_sums, axis=1)
        acc_ref[...] = acc_ref[...] + jnp.concatenate(os, axis=1)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...].clip(1e-30)).astype(o_ref.dtype)


def pack_factor(h: int, d: int) -> int:
    """Whole heads per 128-lane block for the head-packed kernels; 1 means
    the layout can't pack (d does not divide 128, or the head count is not
    a multiple of the pack). THE single source of packing eligibility —
    routing, the fused entry points, and the autotuner all consult it."""
    pack = LANES // d if (d <= LANES and LANES % d == 0) else 1
    return pack if pack > 1 and h % pack == 0 else 1


def _attn_layout(sk: int, h: int, d: int,
                 variant: str | None = None) -> tuple[str, int]:
    """Kernel routing: ('allheads', h) for tiny-KV cross-attention;
    ('packed', 128//d) — whole heads tiling the 128-lane dim straight off the
    channel-packed layout — or ('bh', 1) head-major for longer KV.

    ``variant`` pins the choice ('packed' | 'bh' | 'allheads'); it comes from
    the per-shape tuned table (kernels/autotune.py) or the caller. With no
    pin the static defaults are 'allheads' for tiny KV and 'bh' otherwise:
    step-level A/B on v5e measured the packed path *slower* end-to-end
    (7.30 vs 7.80 it/s — XLA already folds the head transposes into
    neighboring ops, and the packed kernels pay 2x softmax VPU temps), so
    packing must win a measurement to be routed. ST_NO_PACKED_ATTN=1 forces
    the defaults regardless (escape hatch)."""
    import os

    pack = pack_factor(h, d)
    if os.environ.get("ST_NO_PACKED_ATTN", "") not in ("", "0"):
        variant = None
    if variant == "packed" and pack > 1:
        return "packed", pack
    if sk <= LANES:
        return "allheads", h
    return "bh", 1


def _pick_blocks(sq: int, sk: int, h: int, d: int, itemsize: int,
                 variant: str | None = None):
    """Static block heuristic (v5e), shrunk to the VMEM budget. The per-shape
    tuned table (kernels/autotune.py) overrides this when an entry exists."""
    if sk <= LANES:
        bq, bk = min(sq, 4096), LANES
    elif sk <= 1024:
        # single-KV path: bigger q blocks halve the program count
        bq, bk = 1024, 1024
    else:
        bq, bk = 512, 1024

    single_kv = bk >= sk
    mode, pack = _attn_layout(sk, h, d, variant)
    return _shrink_to_vmem(bq, bk, sk, h, d, itemsize, mode, pack)


def _shrink_to_vmem(bq, bk, sk, h, d, itemsize, mode, pack):
    """Halve blocks until the kernel's VMEM byte model fits the budget."""
    single_kv = bk >= sk
    # lanes a block spans: every head (tiny-KV), a 128-lane head pack, or one
    # BH-major head
    eff_lanes = {"allheads": h * d, "packed": pack * d}.get(mode, d)
    # live f32 softmax temps per program: the all-heads kernel keeps ~4x
    # bq*bk in flight; packed keeps one (bq, bk) chain per sub-head; BH 2x
    temps_factor = {"allheads": 4, "packed": 2 * pack}.get(mode, 2)

    def vmem_bytes(bq, bk):
        qo = 2 * bq * eff_lanes * itemsize * 2    # q + o blocks (double-buffered)
        # k + v blocks; double-buffered unless the index map is constant
        kv = 2 * bk * eff_lanes * itemsize * (1 if single_kv else 2)
        # online-path scratch: m, l, acc under maxsub; the shift-free
        # default drops the running max — one fewer f32 buffer
        scratch = 0 if single_kv else bq * (3 if _maxsub() else 2) * LANES * 4
        temps = temps_factor * bq * bk * 4
        return qo + kv + scratch + temps

    # shrink the kv block first (it dominates via double buffering), then q
    while vmem_bytes(bq, bk) > VMEM_BUDGET and (bq > 128 or bk > LANES):
        if bk > 512 and not single_kv:
            bk //= 2
        elif bq > 128:
            bq //= 2
        elif bk > LANES and not single_kv:
            bk //= 2
        else:
            break
    return bq, bk


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "block_q", "block_k", "variant", "span",
        "interpret"
    ),
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
    variant: str | None = None,
    span: int | None = None,
    interpret: bool | None = None,
):
    """Multi-head attention over channel-packed operands.

    q: (B, Sq, H*D); k, v: (B, Sk, H*D) -> (B, Sq, H*D). Non-causal. Heads are
    sliced inside the kernel — the layout never transposes. ``variant`` pins
    the self-attention kernel family ('packed' | 'bh'); default comes from
    the tuned table, else the static routing (see _attn_layout). ``span``
    widens packed blocks to span x 128 lanes (see _norm_span).
    """
    if interpret is None:
        interpret = interpret_mode()
    b, sq, c = q.shape
    sk = k.shape[1]
    assert c % num_heads == 0, (c, num_heads)
    h = num_heads
    d = c // h
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    if block_q is None and block_k is None and variant is None:
        # per-shape tuned table (kernels/autotune.py) beats the heuristic when
        # an entry exists for this exact shape on this platform
        from stabletriton_tpu.kernels import autotune

        tuned = autotune.lookup(autotune.attention_key(b, sq, sk, h, d, q.dtype))
        if tuned is not None:
            block_q = int(tuned["block_q"])
            block_k = int(tuned["block_k"])
            variant = tuned.get("variant")
            if span is None:
                span = tuned.get("span")
    auto_q, auto_k = _pick_blocks(sq, sk, h, d, q.dtype.itemsize, variant)
    block_q = min(block_q or auto_q, round_up(sq, 8))
    block_k = min(block_k or auto_k, round_up(sk, LANES))
    if sk <= LANES:
        # tiny-KV path requires the whole (padded) KV in one block
        block_k = round_up(sk, LANES)

    # fold the softmax scale *and* log2(e) into q once — XLA fuses it into the
    # producing matmul; the kernels then run base-2 softmax (exp2 is the
    # cheaper VPU transcendental and softmax is base-invariant under this
    # logit pre-scaling)
    q = q * jnp.asarray(scale * LOG2E, q.dtype)

    # pad seq lens to block multiples (static shapes; XLA folds the pads)
    sq_p = round_up(sq, block_q)
    sk_p = round_up(sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
    kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v

    mode, pack = _attn_layout(sk, h, d, variant)
    if sk_p <= LANES and mode == "allheads":
        # tiny-KV (cross-attention) fast path: transpose-free all-heads kernel
        # on the 4D view; one output per head (2D stores), lane-concat back —
        # 7.7x over the XLA attention at SDXL cross shapes
        qp = qp.reshape(b, sq_p, h, d)
        kp = kp.reshape(b, sk_p, h, d)
        vp = vp.reshape(b, sk_p, h, d)
        out_shape = [jax.ShapeDtypeStruct((b, sq_p, d), q.dtype) for _ in range(h)]
        out_spec = [pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0))
                    for _ in range(h)]
        outs = pl.pallas_call(
            functools.partial(_single_kv_kernel, kv_len=sk),
            grid=(b, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, h, d), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, block_k, h, d), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, block_k, h, d), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kp, vp)
        out = jnp.concatenate(outs, axis=-1) if h > 1 else outs[0]
        if sq_p != sq:
            out = out[:, :sq, :]
        return out

    if mode == "packed":
        # head-packed channel-packed kernels: zero transposes, 128-lane blocks
        # carrying 128/d heads straight from the (B, S, H*D) layout
        groups = h // pack
        spn = _norm_span(span, groups)
        g2 = groups // spn
        lanes = spn * LANES
        if sk_p == block_k:
            out = pl.pallas_call(
                functools.partial(
                    _packed_single_kv_kernel, kv_len=sk, head_dim=d
                ),
                grid=(b * g2, sq_p // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, lanes),
                                 lambda i, j: (i // g2, j, i % g2)),
                    pl.BlockSpec((1, block_k, lanes),
                                 lambda i, j: (i // g2, 0, i % g2)),
                    pl.BlockSpec((1, block_k, lanes),
                                 lambda i, j: (i // g2, 0, i % g2)),
                ],
                out_specs=pl.BlockSpec(
                    (1, block_q, lanes),
                    lambda i, j: (i // g2, j, i % g2),
                ),
                out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
                interpret=interpret,
            )(qp, kp, vp)
        else:
            out = pl.pallas_call(
                functools.partial(
                    _packed_flash_kernel, kv_len=sk, block_k=block_k,
                    head_dim=d, mask_kv=sk_p != sk,
                ),
                grid=(b * g2, sq_p // block_q, sk_p // block_k),
                in_specs=[
                    pl.BlockSpec((1, block_q, lanes),
                                 lambda i, j, kk: (i // g2, j, i % g2)),
                    pl.BlockSpec((1, block_k, lanes),
                                 lambda i, j, kk: (i // g2, kk, i % g2)),
                    pl.BlockSpec((1, block_k, lanes),
                                 lambda i, j, kk: (i // g2, kk, i % g2)),
                ],
                out_specs=pl.BlockSpec(
                    (1, block_q, lanes),
                    lambda i, j, kk: (i // g2, j, i % g2),
                ),
                out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
                scratch_shapes=[
                    pltpu.VMEM((block_q, lanes), jnp.float32)
                    for _ in range(3 if _maxsub() else 2)
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
                interpret=interpret,
            )(qp, kp, vp)
        if sq_p != sq:
            out = out[:, :sq, :]
        return out

    # fallback: head-major kernels — larger blocks fit VMEM because each
    # program holds one head; for h == 1 the reshape is free, for h > 1 it
    # costs transposes through HBM (the packed path above avoids them for
    # every SD/SDXL shape)
    def to_bh(x, s):
        x = x.reshape(b, s, h, d)
        return x.swapaxes(1, 2).reshape(b * h, s, d) if h > 1 else x.reshape(b, s, d)

    qf, kf, vf = to_bh(qp, sq_p), to_bh(kp, sk_p), to_bh(vp, sk_p)
    if sk_p == block_k:
        out = pl.pallas_call(
            functools.partial(_single_kv_kernel_bh, kv_len=sk),
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
    else:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, kv_len=sk, block_k=block_k, mask_kv=sk_p != sk
            ),
            grid=(b * h, sq_p // block_q, sk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
                pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            scratch_shapes=(
                [pltpu.VMEM((block_q, LANES), jnp.float32)]
                * (2 if _maxsub() else 1)
                + [pltpu.VMEM((block_q, d), jnp.float32)]
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qf, kf, vf)

    out = out.reshape(b, h, sq_p, d).swapaxes(1, 2).reshape(b, sq_p, c) \
        if h > 1 else out.reshape(b, sq_p, c)
    if sq_p != sq:
        out = out[:, :sq, :]
    return out


# ---------------------------------------------------------------------------
# Mesh-aware dispatch: GSPMD must treat a pallas_call as an opaque replicated
# custom call, so under a jit-over-Mesh it would all-gather the (B, S, H*D)
# activations onto every chip before each kernel — silently defeating both
# data and tensor parallelism. When the runtime activates a mesh
# (runtime/mesh.use_mesh — the pipeline does this around its program bodies),
# the bindings below wrap the kernel in jax.shard_map instead: batch over
# "data", whole heads over "model" (attention is embarrassingly parallel
# across heads, so the local kernel needs no collectives at all). The fused
# qkv/kv entries shard batch only — a contiguous "model" split of their
# [q|k|v] channel concat is not head-aligned — which is why tensor-parallel
# pipelines keep the projections unfused (runtime/pipeline.__post_init__).
# ---------------------------------------------------------------------------


def _mesh_axes():
    """(mesh, batch-axis name, data size, model-axis name, model size), or
    None when no mesh is active / the mesh is trivial."""
    from stabletriton_tpu.runtime import mesh as mesh_mod

    m = mesh_mod.active_mesh()
    if m is None:
        return None
    dsz = int(m.shape.get(mesh_mod.DATA_AXIS, 1))
    msz = int(m.shape.get(mesh_mod.MODEL_AXIS, 1))
    if dsz == 1 and msz == 1:
        return None
    return m, mesh_mod.DATA_AXIS, dsz, mesh_mod.MODEL_AXIS, msz


@register("attention", "pallas")
def attention(q, k, v, *, num_heads=1, scale=None):
    axes = _mesh_axes()
    if axes is not None:
        m, data, dsz, model, msz = axes
        b, _, c = q.shape
        d = c // num_heads
        batch_ax = data if (dsz > 1 and b % dsz == 0) else None
        head_ax = model if (msz > 1 and num_heads % msz == 0) else None
        if batch_ax is not None or head_ax is not None:
            local_heads = num_heads // (msz if head_ax is not None else 1)
            s = float(scale) if scale is not None else 1.0 / float(np.sqrt(d))
            spec = jax.sharding.PartitionSpec(batch_ax, None, head_ax)
            local = functools.partial(
                flash_attention, num_heads=local_heads, scale=s
            )
            # check_vma=False: pallas_call out_shapes carry no vma
            # annotation, and the local kernel uses no collectives anyway
            return jax.shard_map(
                local, mesh=m, in_specs=(spec, spec, spec), out_specs=spec,
                check_vma=False,
            )(q, k, v)
    return flash_attention(q, k, v, num_heads=num_heads, scale=scale)


def _fused_tuned(kind, b, sq, sk, h, d, dtype):
    """Tuned entry for a fused-operand shape (kernels/autotune.py
    tune_attention_fused): {'impl': 'fused', block_q, block_k} or
    {'impl': 'split'} or None."""
    from stabletriton_tpu.kernels import autotune

    return autotune.lookup(
        autotune.fused_attention_key(kind, b, sq, sk, h, d, dtype)
    )


def _can_pack(c: int, h: int, d: int) -> bool:
    import os

    if os.environ.get("ST_NO_PACKED_ATTN", "") not in ("", "0"):
        return False
    return c % LANES == 0 and pack_factor(h, d) > 1


def _compat_blocks(bq: int, bk: int) -> tuple[int, int]:
    """q and kv rows share ONE padded seq in the fused entry points, so the
    pad is a common multiple of both blocks. Force one block to divide the
    other (shrinking bq to the largest power of two dividing bk if needed):
    otherwise the lcm pad explodes — e.g. clamped bq=576 with bk=512 pads
    the sequence 8x and every fused candidate loses by default."""
    lo, hi = min(bq, bk), max(bq, bk)
    if hi % lo == 0:
        return bq, bk
    p = 1
    while p * 2 <= bq and bk % (p * 2) == 0:
        p *= 2
    return p, bk


def _norm_span(span: int | None, groups: int) -> int:
    """Head-groups per program. The packed kernels are lane-width-generic
    (``pack = q.shape[1] // head_dim``), so a block can span several 128-lane
    head chunks at once: the grid's (B x group) dim shrinks by ``span`` and
    each program amortizes its dispatch latency over span x pack sub-head
    softmax chains. This is THE lever for the latency-bound 32^2 self shape
    (S=1024: 40 programs of 152us vs a ~30us floor — round-4/5 verdict item);
    spans come from the tuned table per shape. 1 = classic one-group blocks."""
    span = int(span or 1)
    return span if span > 1 and groups % span == 0 else 1


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "block_k", "span",
                     "interpret"),
)
def flash_attention_qkv(
    qkv: jax.Array,
    *,
    num_heads: int = 1,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    span: int | None = None,
    interpret: bool | None = None,
):
    """Self-attention reading the fused QKV projection output directly.

    qkv: (B, S, 3*H*D) -> (B, S, H*D). The head-packed kernels take their
    q/k/v blocks as 128-lane chunks of the SAME fused array (three BlockSpecs
    into one buffer), so the three (B, S, H*D) slice copies that materialized
    Pallas inputs would force — plus every transpose of a head-major layout —
    never touch HBM. The softmax scale*log2(e) prescale runs in-VMEM on the
    q block (there is no producing matmul to fold it into from here).
    ``span`` > 1 widens blocks to span x 128 lanes (see _norm_span).
    Falls back to slice + flash_attention when whole heads don't tile the
    128-lane dim (SD1.x d=40, VAE h=1) or ST_NO_PACKED_ATTN=1."""
    if interpret is None:
        interpret = interpret_mode()
    b, s, c3 = qkv.shape
    c = c3 // 3
    h = num_heads
    assert c % h == 0, (c, h)
    d = c // h
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    tuned = (None if block_q or block_k
             else _fused_tuned("qkv", b, s, s, h, d, qkv.dtype))
    if not _can_pack(c, h, d) or (tuned or {}).get("impl") == "split":
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return flash_attention(q, k, v, num_heads=h, scale=scale,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)

    if tuned is not None:
        block_q, block_k = int(tuned["block_q"]), int(tuned["block_k"])
        if span is None:
            span = tuned.get("span")
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(s, s, h, d, qkv.dtype.itemsize,
                                      "packed")
        block_q, block_k = block_q or auto_q, block_k or auto_k
    block_q = min(block_q, round_up(s, 8))
    block_k = min(block_k, round_up(s, LANES))
    block_q, block_k = _compat_blocks(block_q, block_k)
    # q and kv rows come from the same (padded) seq dim: pad once to a
    # common multiple of both block sizes (= the max, after _compat_blocks)
    lcm = int(np.lcm(block_q, block_k))
    s_p = round_up(s, lcm)
    x = jnp.pad(qkv, ((0, 0), (0, s_p - s), (0, 0))) if s_p != s else qkv

    groups = c // LANES  # == h // pack
    span = _norm_span(span, groups)
    g2 = groups // span  # grid groups; lane indices count span*LANES units
    lanes = span * LANES
    q_scale = float(scale) * LOG2E
    if s_p == block_k:
        out = pl.pallas_call(
            functools.partial(_packed_single_kv_kernel, kv_len=s,
                              head_dim=d, q_scale=q_scale),
            grid=(b * g2, s_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, lanes),
                             lambda i, j: (i // g2, j, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j: (i // g2, 0, g2 + i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j: (i // g2, 0, 2 * g2 + i % g2)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, lanes), lambda i, j: (i // g2, j, i % g2)
            ),
            out_shape=jax.ShapeDtypeStruct((b, s_p, c), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(x, x, x)
    else:
        out = pl.pallas_call(
            functools.partial(_packed_flash_kernel, kv_len=s, block_k=block_k,
                              head_dim=d, mask_kv=s_p != s, q_scale=q_scale),
            grid=(b * g2, s_p // block_q, s_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, lanes),
                             lambda i, j, kk: (i // g2, j, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j, kk: (i // g2, kk, g2 + i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j, kk: (i // g2, kk, 2 * g2 + i % g2)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, lanes),
                lambda i, j, kk: (i // g2, j, i % g2),
            ),
            out_shape=jax.ShapeDtypeStruct((b, s_p, c), qkv.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, lanes), jnp.float32)
                for _ in range(3 if _maxsub() else 2)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(x, x, x)
    return out[:, :s, :] if s_p != s else out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "block_q", "block_k", "span",
                     "interpret"),
)
def flash_attention_kv(
    q: jax.Array,
    kv: jax.Array,
    *,
    num_heads: int = 1,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    span: int | None = None,
    interpret: bool | None = None,
):
    """Cross-attention reading the fused KV projection output directly.

    q: (B, Sq, H*D); kv: (B, Sk, 2*H*D) -> (B, Sq, H*D). Same head-packed
    lane-chunk scheme as flash_attention_qkv (incl. ``span``) — and unlike
    the all-heads tiny-KV kernel it emits one (B, Sq, C) array instead of H
    per-head outputs that XLA must lane-concat afterwards."""
    if interpret is None:
        interpret = interpret_mode()
    b, sq, c = q.shape
    sk = kv.shape[1]
    h = num_heads
    assert c % h == 0 and kv.shape[2] == 2 * c, (q.shape, kv.shape, h)
    d = c // h
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    tuned = (None if block_q or block_k
             else _fused_tuned("kv", b, sq, sk, h, d, q.dtype))
    if not _can_pack(c, h, d) or (tuned or {}).get("impl") == "split":
        k, v = jnp.split(kv, 2, axis=-1)
        return flash_attention(q, k, v, num_heads=h, scale=scale,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)

    if tuned is not None:
        block_q, block_k = int(tuned["block_q"]), int(tuned["block_k"])
        if span is None:
            span = tuned.get("span")
    if block_q is None or block_k is None:
        auto_q, auto_k = _pick_blocks(sq, sk, h, d, q.dtype.itemsize,
                                      "packed")
        block_q, block_k = block_q or auto_q, block_k or auto_k
    block_q = min(block_q, round_up(sq, 8))
    block_k = min(block_k, round_up(sk, LANES))
    sq_p = round_up(sq, block_q)
    sk_p = round_up(sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
    kvp = (jnp.pad(kv, ((0, 0), (0, sk_p - sk), (0, 0)))
           if sk_p != sk else kv)

    groups = c // LANES
    span = _norm_span(span, groups)
    g2 = groups // span
    lanes = span * LANES
    q_scale = float(scale) * LOG2E
    if sk_p == block_k:
        out = pl.pallas_call(
            functools.partial(_packed_single_kv_kernel, kv_len=sk,
                              head_dim=d, q_scale=q_scale),
            grid=(b * g2, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, lanes),
                             lambda i, j: (i // g2, j, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j: (i // g2, 0, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j: (i // g2, 0, g2 + i % g2)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, lanes), lambda i, j: (i // g2, j, i % g2)
            ),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kvp, kvp)
    else:
        out = pl.pallas_call(
            functools.partial(_packed_flash_kernel, kv_len=sk, block_k=block_k,
                              head_dim=d, mask_kv=sk_p != sk, q_scale=q_scale),
            grid=(b * g2, sq_p // block_q, sk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, lanes),
                             lambda i, j, kk: (i // g2, j, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j, kk: (i // g2, kk, i % g2)),
                pl.BlockSpec((1, block_k, lanes),
                             lambda i, j, kk: (i // g2, kk, g2 + i % g2)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, lanes),
                lambda i, j, kk: (i // g2, j, i % g2),
            ),
            out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, lanes), jnp.float32)
                for _ in range(3 if _maxsub() else 2)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kvp, kvp)
    return out[:, :sq, :] if sq_p != sq else out


@register("attention_qkv", "pallas")
def attention_qkv(qkv, *, num_heads=1, scale=None):
    axes = _mesh_axes()
    if axes is not None:
        m, data, dsz, _, _ = axes
        if dsz > 1 and qkv.shape[0] % dsz == 0:
            # batch over "data" only: the fused channel concat is not
            # head-aligned under a contiguous "model" split (see above)
            spec = jax.sharding.PartitionSpec(data, None, None)
            local = functools.partial(
                flash_attention_qkv, num_heads=num_heads, scale=scale
            )
            return jax.shard_map(
                local, mesh=m, in_specs=(spec,), out_specs=spec,
                check_vma=False,
            )(qkv)
    return flash_attention_qkv(qkv, num_heads=num_heads, scale=scale)


@register("attention_kv", "pallas")
def attention_kv(q, kv, *, num_heads=1, scale=None):
    axes = _mesh_axes()
    if axes is not None:
        m, data, dsz, _, _ = axes
        if dsz > 1 and q.shape[0] % dsz == 0 and kv.shape[0] == q.shape[0]:
            spec = jax.sharding.PartitionSpec(data, None, None)
            local = functools.partial(
                flash_attention_kv, num_heads=num_heads, scale=scale
            )
            return jax.shard_map(
                local, mesh=m, in_specs=(spec, spec), out_specs=spec,
                check_vma=False,
            )(q, kv)
    return flash_attention_kv(q, kv, num_heads=num_heads, scale=scale)
