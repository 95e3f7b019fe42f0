"""Pallas kernel parity tests vs the jnp reference ops (interpret mode on CPU).

The 1e-3 elementwise gate mirrors the reference repo's Triton-vs-eager asserts
(e.g. reference kernels/geglu.py:37-43, groupnorm.py:163-169) — here run as a
real pytest suite on the CPU mesh, which the reference could not do at all.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stabletriton_tpu import ops
from stabletriton_tpu.kernels.flash_attention import (
    flash_attention,
    flash_attention_kv,
    flash_attention_qkv,
)
from stabletriton_tpu.kernels.geglu import geglu as geglu_k
from stabletriton_tpu.kernels.group_norm import group_norm as group_norm_k
from stabletriton_tpu.kernels.layer_norm import layer_norm as layer_norm_k
from stabletriton_tpu.kernels.time_embed import time_embed as time_embed_k


@pytest.mark.parametrize(
    "b,h,sq,sk,d,block_q,block_k,variant",
    [
        (1, 2, 64, 64, 16, 32, 32, None),        # multi-block self
        (2, 3, 100, 100, 32, 64, 64, None),      # non-mult seq (pad+mask both)
        (1, 2, 64, 77, 64, 32, 128, None),       # SDXL cross kv=77 (pad+mask)
        (1, 1, 16, 16, 64, 512, 512, None),      # blocks clamp to seq
        (1, 4, 96, 300, 32, 32, 128, "packed"),  # packed (pack=4), padded kv
        (1, 2, 256, 256, 64, 128, 128, "packed"),  # packed online softmax
        (2, 2, 256, 256, 64, 128, 256, "packed"),  # packed single-KV block
        (2, 2, 160, 200, 64, 64, 128, "packed"),   # packed, both seqs padded
        (2, 2, 100, 77, 64, 64, 128, "packed"),  # packed tiny-KV (cross)
        (1, 2, 256, 256, 64, 128, 128, "bh"),    # BH-major online (default)
        (2, 2, 256, 256, 64, 128, 256, "bh"),    # BH-major single-KV
        (1, 3, 256, 256, 64, 128, 128, None),    # odd head count -> BH
        (1, 2, 192, 192, 80, 64, 128, None),     # d !| 128 -> BH
    ],
)
def test_flash_attention_parity(b, h, sq, sk, d, block_q, block_k, variant):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, sq, h * d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, sk, h * d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, sk, h * d), dtype=np.float32))
    out = flash_attention(q, k, v, num_heads=h, block_q=block_q,
                          block_k=block_k, variant=variant)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_flash_attention_bf16():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 64, 128), dtype=np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 77, 128), dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 77, 128), dtype=np.float32)).astype(jnp.bfloat16)
    out = flash_attention(q, k, v, num_heads=2, block_q=32, block_k=128)
    assert out.dtype == jnp.bfloat16
    ref = ops.attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), num_heads=2)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=2e-2
    )


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 16), 4), ((1, 9, 7, 24), 8)])
def test_group_norm_parity(shape, groups, act):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(shape[-1], dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(shape[-1], dtype=np.float32))
    out = group_norm_k(x, gamma, beta, num_groups=groups, act=act, block_rows=16)
    ref = ops.group_norm(x, gamma, beta, num_groups=groups, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("shape", [(6, 32), (3, 11, 48)])
def test_layer_norm_parity(shape):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(shape[-1], dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(shape[-1], dtype=np.float32))
    out = layer_norm_k(x, gamma, beta, block_rows=8)
    ref = ops.layer_norm(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("shape", [(6, 32), (3, 11, 48)])
def test_rms_norm_parity(shape):
    """Pallas RMSNorm (the dual-mode row-norm kernel's rmsnorm switch —
    reference layer_norm.py IS_RMSNORM) vs the jnp reference op, and the
    reference op vs torch's F.rms_norm semantics (x/sqrt(mean(x^2)+eps))."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 3 + 1.5)
    gamma = jnp.asarray(rng.standard_normal(shape[-1], dtype=np.float32))
    out = layer_norm_k(x, gamma, jnp.zeros((shape[-1],), jnp.float32),
                       block_rows=8, rmsnorm=True)
    ref = ops.rms_norm(x, gamma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    want = np.asarray(x, np.float64)
    want = want / np.sqrt((want**2).mean(-1, keepdims=True) + 1e-5)
    want = want * np.asarray(gamma, np.float64)
    np.testing.assert_allclose(np.asarray(ref), want, atol=1e-4)
    # the dispatch surface routes the pallas binding too
    with ops.use_backends({"rms_norm": "pallas"}):
        outp = ops.rms_norm(x, gamma)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(ref), atol=1e-3)


def test_geglu_parity():
    rng = np.random.default_rng(4)
    state = jnp.asarray(rng.standard_normal((5, 13, 32), dtype=np.float32))
    gate = jnp.asarray(rng.standard_normal((5, 13, 32), dtype=np.float32))
    out = geglu_k(state, gate, block_rows=16)
    ref = ops.geglu(state, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("dim,flip", [(16, True), (320, True), (256, False)])
def test_time_embed_parity(dim, flip):
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0], dtype=jnp.float32)
    out = time_embed_k(t, dim=dim, flip_sin_to_cos=flip)
    ref = ops.time_embed(t, dim=dim, flip_sin_to_cos=flip)
    # 1e-4: the kernel folds -ln(max_period)/half into the iota product, which
    # reassociates the fp32 multiply vs the reference's arange/half ordering
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_backends_registered():
    import stabletriton_tpu.kernels  # noqa: F401

    reg = ops.registered_ops()
    for op in ["attention", "group_norm", "layer_norm", "geglu", "time_embed"]:
        assert "pallas" in reg[op], op


def test_unet_pallas_binding_parity():
    """Whole tiny UNet: pallas binding vs reference binding, 1e-3 gate.

    This is the analog of the reference's integration test tracing the full
    UNet through every rewrite pass (replace_groupnorm.py:63-81 etc.)."""
    from stabletriton_tpu.compile import CompileConfig, compile_unet
    from stabletriton_tpu.models.unet import init_unet_params, tiny_unet_config

    cfg = tiny_unet_config()
    params = init_unet_params(cfg, 0)
    rng = np.random.default_rng(5)
    inputs = (
        jnp.asarray(rng.standard_normal((2, 16, 16, 4), dtype=np.float32)),
        jnp.full((2,), 500.0, jnp.float32),
        jnp.asarray(rng.standard_normal((2, 7, cfg.cross_attention_dim), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((2, 16), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((2, 6), dtype=np.float32)),
    )
    ref_fn = compile_unet(cfg, CompileConfig(backend="reference", dtype="float32"))
    pal_fn = compile_unet(cfg, CompileConfig(backend="pallas", dtype="float32"))
    ref = ref_fn(params, *inputs)
    pal = pal_fn(params, *inputs)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("act", [None, "silu", "gelu"])
@pytest.mark.parametrize("shape", [((6, 40), (40, 24)), ((2, 9, 130), (130, 250))])
def test_linear_kernel_parity(shape, act):
    from stabletriton_tpu.kernels.linear import fused_linear

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(shape[0], dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(shape[1], dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(shape[1][1], dtype=np.float32))
    out = fused_linear(x, w, b, act=act, block_m=8, block_n=128, block_k=128)
    ref = ops.linear(x, w, b, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_attention_routing_at_sdxl_shapes():
    """Routing contract: cross-attention takes the all-heads tiny-KV kernel;
    self-attention defaults to BH-major (the step-level v5e winner) and only
    packs when a measurement pinned variant='packed'; impossible pack shapes
    ignore the pin."""
    from stabletriton_tpu.kernels.flash_attention import _attn_layout

    assert _attn_layout(4096, 10, 64) == ("bh", 1)       # 64² level self
    assert _attn_layout(1024, 20, 64) == ("bh", 1)       # 32² level self
    assert _attn_layout(77, 10, 64)[0] == "allheads"     # cross-attention
    assert _attn_layout(4096, 1, 512) == ("bh", 1)       # VAE mid-block
    # a tuned-table pin turns packing on where it's layout-possible...
    assert _attn_layout(4096, 10, 64, "packed") == ("packed", 2)
    assert _attn_layout(256, 4, 32, "packed") == ("packed", 4)
    # ...and is ignored where it isn't
    assert _attn_layout(256, 8, 40, "packed")[0] == "bh"   # d !| 128
    assert _attn_layout(256, 3, 64, "packed")[0] == "bh"   # odd head count


@pytest.mark.parametrize(
    "b,h,s,d,block_q,block_k",
    [
        (1, 2, 256, 64, 128, 256),   # packed single-KV (whole KV one block)
        (1, 2, 256, 64, 128, 128),   # packed online softmax
        (2, 4, 100, 32, 64, 128),    # padded seq (pad once, mask kv)
        (1, 3, 64, 64, 32, 64),      # odd head count -> split fallback
        (2, 2, 96, 40, 32, 128),     # d !| 128 -> split fallback
    ],
)
def test_flash_attention_qkv_parity(b, h, s, d, block_q, block_k):
    """Fused-QKV entry point must match reference attention on the split
    operands (in-kernel lane-chunk reads + in-VMEM q-prescale)."""
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d), dtype=np.float32))
    out = flash_attention_qkv(qkv, num_heads=h, block_q=block_q,
                              block_k=block_k)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,block_q,block_k",
    [
        (2, 2, 128, 77, 64, 64, 128),   # SDXL-style cross, packed single-KV
        (1, 4, 96, 300, 32, 32, 128),   # packed online, padded kv
        (1, 1, 64, 77, 64, 32, 128),    # h=1 -> split fallback
    ],
)
def test_flash_attention_kv_parity(b, h, sq, sk, d, block_q, block_k):
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((b, sq, h * d), dtype=np.float32))
    kv = jnp.asarray(rng.standard_normal((b, sk, 2 * h * d), dtype=np.float32))
    out = flash_attention_kv(q, kv, num_heads=h, block_q=block_q,
                             block_k=block_k)
    k, v = jnp.split(kv, 2, axis=-1)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,block_q,block_k,variant,span",
    [
        # span widens packed blocks to span x 128 lanes: one program runs
        # span x pack sub-head chains (the grid-amortization lever for the
        # latency-bound S=1024 single-KV shape)
        (1, 8, 256, 256, 64, 128, 256, "packed", 2),   # single-KV, span 2
        (1, 8, 256, 256, 64, 128, 256, "packed", 4),   # single-KV, all groups
        (2, 8, 160, 160, 64, 64, 256, "packed", 2),    # padded seq + span
        (1, 8, 256, 256, 64, 128, 128, "packed", 2),   # online softmax + span
        (1, 8, 256, 256, 64, 128, 256, "packed", 3),   # !| groups -> span 1
    ],
)
def test_flash_attention_span_parity(b, h, sq, sk, d, block_q, block_k,
                                     variant, span):
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, sq, h * d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, sk, h * d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, sk, h * d), dtype=np.float32))
    out = flash_attention(q, k, v, num_heads=h, block_q=block_q,
                          block_k=block_k, variant=variant, span=span)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize(
    "b,h,s,d,block_q,block_k,span",
    [
        (1, 8, 256, 64, 128, 256, 2),   # fused qkv single-KV, span 2
        (1, 8, 256, 64, 128, 256, 4),   # fused qkv single-KV, all groups
        (2, 8, 100, 64, 32, 128, 2),    # fused qkv padded seq (online) + span
    ],
)
def test_flash_attention_qkv_span_parity(b, h, s, d, block_q, block_k, span):
    """The fused-QKV lane-chunk index maps must land on the right q/k/v
    channel windows when blocks span multiple head-groups."""
    rng = np.random.default_rng(12)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d), dtype=np.float32))
    out = flash_attention_qkv(qkv, num_heads=h, block_q=block_q,
                              block_k=block_k, span=span)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize(
    "b,h,sq,sk,d,block_q,block_k,span",
    [
        (2, 8, 128, 77, 64, 64, 128, 2),   # fused kv cross, span 2
        (1, 8, 64, 77, 64, 32, 128, 4),    # fused kv cross, all groups
    ],
)
def test_flash_attention_kv_span_parity(b, h, sq, sk, d, block_q, block_k,
                                        span):
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((b, sq, h * d), dtype=np.float32))
    kv = jnp.asarray(rng.standard_normal((b, sk, 2 * h * d), dtype=np.float32))
    out = flash_attention_kv(q, kv, num_heads=h, block_q=block_q,
                             block_k=block_k, span=span)
    k, v = jnp.split(kv, 2, axis=-1)
    ref = ops.attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_fused_qkv_lcm_pad_masks_kv():
    """Regression: when block_q > block_k pads the shared seq beyond a
    block_k multiple (s=1536, bq=1024, bk=512 -> s_p=2048), the padded KV
    block must be masked even though s %% block_k == 0 — the old
    kv_len %% block_k condition skipped it and corrupted every softmax
    denominator by a full block of exp2(0)=1 terms (max err 0.034)."""
    rng = np.random.default_rng(31)
    s = 1536
    qkv = jnp.asarray(rng.standard_normal((1, s, 3 * 2 * 64), dtype=np.float32))
    out = flash_attention_qkv(qkv, num_heads=2, block_q=1024, block_k=512)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = ops.attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_fused_qkv_compat_blocks_keep_pad_small():
    """Non-dividing block pairs (clamped bq=576 with bk=512) must not
    explode the shared pad by lcm; _compat_blocks shrinks bq so one block
    divides the other."""
    from stabletriton_tpu.kernels.flash_attention import _compat_blocks

    assert _compat_blocks(576, 512) == (512, 512)
    assert _compat_blocks(1024, 2304) == (256, 2304)
    assert _compat_blocks(256, 1024) == (256, 1024)   # already dividing
    assert _compat_blocks(1024, 512) == (1024, 512)   # already dividing


def test_fused_attention_ops_dispatch():
    """ops.attention_qkv/_kv under the pallas binding match the reference
    binding (the compile-level contract the UNet relies on)."""
    rng = np.random.default_rng(9)
    qkv = jnp.asarray(rng.standard_normal((1, 64, 3 * 128), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((1, 64, 128), dtype=np.float32))
    kv = jnp.asarray(rng.standard_normal((1, 77, 256), dtype=np.float32))
    with ops.use_backends({"attention_qkv": "pallas", "attention_kv": "pallas"}):
        o1 = ops.attention_qkv(qkv, num_heads=2)
        o2 = ops.attention_kv(q, kv, num_heads=2)
    r1 = ops.attention_qkv(qkv, num_heads=2)
    r2 = ops.attention_kv(q, kv, num_heads=2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(r1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2), atol=1e-3)


def test_mxu_lsum_parity(monkeypatch):
    """ST_MXU_LSUM=1 (softmax denominator as a dot-with-ones on the MXU)
    must stay inside the 1e-3 gate vs the jnp reference AND close to the
    default VPU-sum form — the denominator then sums the same bf16 p the
    numerator uses. Single-KV and online packed paths, incl. padded keys."""
    rng = np.random.default_rng(33)
    for sq, sk, bq, bk in [(128, 200, 64, 256), (128, 300, 64, 128)]:
        q = jnp.asarray(rng.standard_normal((1, sq, 128), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        monkeypatch.delenv("ST_MXU_LSUM", raising=False)
        base = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant="packed")
        monkeypatch.setenv("ST_MXU_LSUM", "1")
        flash_attention._clear_cache()  # env read at trace time
        lsum = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant="packed")
        flash_attention._clear_cache()
        monkeypatch.delenv("ST_MXU_LSUM", raising=False)
        want = ops.attention(q, k, v, num_heads=2)
        np.testing.assert_allclose(np.asarray(lsum), np.asarray(want),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(lsum), np.asarray(base),
                                   atol=5e-3)


def test_bf16_scores_parity(monkeypatch):
    """ST_BF16_SCORES=1 (QK dot emits bf16, mask/min/exp2 chain in bf16,
    denominator still f32) must stay near the f32 softmax: only new rounding
    is the 8-mantissa-bit logit quantization before exp2. Single-KV and
    online packed paths (incl. padded keys) + the tiny-KV all-heads path."""
    rng = np.random.default_rng(41)
    cases = [
        (128, 200, 64, 256, "packed"),   # packed single-KV, padded keys
        (128, 300, 64, 128, "packed"),   # packed online softmax, padded keys
        (128, 77, None, None, None),     # tiny-KV all-heads cross path
    ]
    for sq, sk, bq, bk, variant in cases:
        q = jnp.asarray(rng.standard_normal((1, sq, 128), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        monkeypatch.delenv("ST_BF16_SCORES", raising=False)
        base = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant=variant)
        monkeypatch.setenv("ST_BF16_SCORES", "1")
        flash_attention._clear_cache()  # env read at trace time
        fast = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant=variant)
        flash_attention._clear_cache()
        monkeypatch.delenv("ST_BF16_SCORES", raising=False)
        want = ops.attention(q, k, v, num_heads=2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(want),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                                   atol=2e-2)


def test_bf16_scores_fused_entry_points(monkeypatch):
    """The fused-operand entry points honor ST_BF16_SCORES too."""
    from stabletriton_tpu.kernels.flash_attention import (
        flash_attention_kv, flash_attention_qkv)

    rng = np.random.default_rng(43)
    qkv = jnp.asarray(rng.standard_normal((1, 64, 3 * 128), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((1, 64, 128), dtype=np.float32))
    kv = jnp.asarray(rng.standard_normal((1, 77, 256), dtype=np.float32))
    monkeypatch.setenv("ST_BF16_SCORES", "1")
    flash_attention_qkv._clear_cache()
    flash_attention_kv._clear_cache()
    o1 = flash_attention_qkv(qkv, num_heads=2)
    o2 = flash_attention_kv(q, kv, num_heads=2)
    flash_attention_qkv._clear_cache()
    flash_attention_kv._clear_cache()
    monkeypatch.delenv("ST_BF16_SCORES", raising=False)
    r1 = ops.attention_qkv(qkv, num_heads=2)
    r2 = ops.attention_kv(q, kv, num_heads=2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(r1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2), atol=2e-2)


def test_shift_free_softmax_matches_maxsub(monkeypatch):
    """The default shift-free softmax must match the max-subtracting escape
    hatch (ST_SOFTMAX_MAXSUB=1) — softmax is shift-invariant, the clip at 80
    base-2 logits never fires at sane scales. Exercised on both the
    single-KV and online paths, including padded keys."""
    rng = np.random.default_rng(21)
    for sq, sk, bq, bk in [(128, 200, 64, 256), (128, 300, 64, 128)]:
        q = jnp.asarray(rng.standard_normal((1, sq, 128), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((1, sk, 128), dtype=np.float32))
        monkeypatch.delenv("ST_SOFTMAX_MAXSUB", raising=False)
        fast = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant="packed")
        monkeypatch.setenv("ST_SOFTMAX_MAXSUB", "1")
        # new jit signature (env read at trace time): clear to force retrace
        flash_attention._clear_cache()
        slow = flash_attention(q, k, v, num_heads=2, block_q=bq, block_k=bk,
                               variant="packed")
        flash_attention._clear_cache()
        monkeypatch.delenv("ST_SOFTMAX_MAXSUB", raising=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5)


def test_attention_tuned_variant_pin(monkeypatch):
    """A tuned-table entry with variant='packed' must route the packed kernel
    for its exact shape (numerics must stay at parity either way)."""
    from stabletriton_tpu.kernels import autotune

    # distinctive seq len so no earlier test populated the jit cache for this
    # exact (shape, static-args) signature with a different lookup result
    key = autotune.attention_key(1, 320, 320, 2, 64, jnp.float32)
    monkeypatch.setattr(
        autotune, "lookup",
        lambda k, platform=None: (
            {"block_q": 128, "block_k": 128, "variant": "packed"}
            if k == key else None
        ),
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 320, 128), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 320, 128), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 320, 128), dtype=np.float32))
    out = flash_attention(q, k, v, num_heads=2)
    ref = ops.attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


@pytest.mark.parametrize("act,res", [(None, False), ("silu", True)])
def test_conv3x3_direct_parity(act, res):
    """Experimental direct Pallas conv (nine shifted MXU GEMMs, fused
    epilogue) vs the XLA reference conv — the SURVEY §7 stretch-goal
    experiment's correctness gate. Odd H exercises the row-pad tail."""
    from stabletriton_tpu.kernels.conv_direct import conv3x3_direct

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 11, 8, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    residual = (jnp.asarray(rng.standard_normal((2, 11, 8, 32),
                                                dtype=np.float32))
                if res else None)
    out = conv3x3_direct(x, w, b, residual=residual, act=act, block_rows=4)
    ref = ops.conv2d(x, w, b, residual=residual, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # the registered op routes the hot shape and falls back elsewhere
    with ops.use_backends({"conv2d": "direct"}):
        out2 = ops.conv2d(x, w, b, residual=residual, act=act)
        fb = ops.conv2d(x, w, b, stride=2, padding=((0, 1), (0, 1)))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-4)
    want_fb = ops.conv2d(x, w, b, stride=2, padding=((0, 1), (0, 1)))
    np.testing.assert_allclose(np.asarray(fb), np.asarray(want_fb), atol=1e-6)


@pytest.mark.parametrize("cin,cout", [(16, 32), (32, 16), (32, 32)])
def test_conv3x3_direct_split_parity(monkeypatch, cin, cout):
    """The op-level weight split (kernels/conv_direct.py): when the
    (3,3,Cin,Cout) weight exceeds the VMEM residency cap, Cout halves become
    independent kernels and Cin halves chain f32 partial sums through the
    residual operand. Forced here by shrinking the cap so every split path
    (cout-only, cin-only via recursion, both) runs at test size — numerics
    must match the unsplit kernel's single f32 accumulation."""
    from stabletriton_tpu.kernels import conv_direct

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, cin), dtype=np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    residual = jnp.asarray(
        rng.standard_normal((1, 6, 8, cout), dtype=np.float32))
    ref = conv_direct.conv3x3_direct(x, w, b, residual=residual, act="silu")
    # cap below one quarter weight: forces recursive cout AND cin splits
    monkeypatch.setattr(conv_direct, "W_RESIDENT_MAX",
                        9 * (cin // 2) * (cout // 2) * 4)
    out = conv_direct.conv3x3_direct(x, w, b, residual=residual, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    xref = ops.conv2d(x, w, b, residual=residual, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(xref), atol=1e-4)


def test_conv3x3_direct_wide_row_guard(monkeypatch):
    """Wide-spatial shapes where even block_rows=1 exceeds the VMEM model
    (the VAE decode's 1024-wide maps) must either cin-split once or fall back
    to the XLA conv — never emit an unfittable pallas_call."""
    from stabletriton_tpu.kernels import conv_direct

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 32), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    ref = ops.conv2d(x, w, b, act="silu")
    # budget below one-row cost for 32 channels but above it for 16: forces
    # exactly one cin split
    one_row_16 = conv_direct._vmem_model(1, 16, 16, 32, 4, 4, False)
    one_row_32 = conv_direct._vmem_model(1, 16, 32, 32, 4, 4, False)
    assert one_row_16 < one_row_32
    monkeypatch.setattr(conv_direct, "VMEM_BUDGET", one_row_16)
    out = conv_direct.conv3x3_direct(x, w, b, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # budget below even the half-cin row cost: falls back to the XLA conv
    monkeypatch.setattr(conv_direct, "VMEM_BUDGET", 1)
    out_fb = conv_direct.conv3x3_direct(x, w, b, act="silu")
    np.testing.assert_allclose(np.asarray(out_fb), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("halo", ["element", "views"])
def test_conv3x3_direct_halo_modes(monkeypatch, halo):
    """Both halo strategies (ST_CONV_HALO): the overlapping Element-window
    default and the three-shifted-views escape hatch must agree with the XLA
    conv."""
    from stabletriton_tpu.kernels import conv_direct

    monkeypatch.setenv("ST_CONV_HALO", halo)
    # the halo mode is read at trace time: force a retrace so the second
    # parametrization doesn't silently reuse the first's executable
    conv_direct._conv3x3_call._clear_cache()
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((2, 9, 8, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((2, 9, 8, 16), dtype=np.float32))
    out = conv_direct.conv3x3_direct(x, w, b, residual=res, act="silu",
                                     block_rows=3)
    ref = ops.conv2d(x, w, b, residual=res, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("res,rows", [(False, None), (True, None), (True, 4)])
def test_gn_conv2d_fused_parity(res, rows):
    """GN-apply-fused direct conv (kernels/conv_direct.gn_conv2d_fused): the
    kernel normalizes its input window in-register (f32 scale/shift + SiLU +
    zero-mask of the SAME-padding border) before the nine MXU dots. Must
    match the unfused reference compose. rows=4 with H=9 forces a bottom
    row-pad tail, exercising the row mask past H."""
    from stabletriton_tpu.kernels import conv_direct
    from stabletriton_tpu.ops import reference

    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.standard_normal((2, 9, 8, 32), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 16), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    residual = (jnp.asarray(rng.standard_normal((2, 9, 8, 16),
                                                dtype=np.float32))
                if res else None)
    ref = reference.conv2d(
        reference.group_norm(x, gamma, beta, num_groups=8, act="silu"),
        w, b, stride=1, padding=1, residual=residual)
    if rows is None:
        out = conv_direct.gn_conv2d_fused(x, gamma, beta, w, b, num_groups=8,
                                          residual=residual)
    else:
        scale, shift = conv_direct._gn_fold(x, gamma, beta, 8, 1e-5)
        out = conv_direct.conv3x3_direct(x, w, b, residual=residual,
                                         gn_scale=scale, gn_shift=shift,
                                         gn_act="silu", block_rows=rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # the op surface dispatches the same way
    with ops.use_backends({"gn_conv2d": "fused"}):
        out2 = ops.gn_conv2d(x, gamma, beta, w, b, num_groups=8,
                             residual=residual)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-4)


def test_gn_conv2d_fused_split_parity(monkeypatch):
    """Fused-GN scale/shift must slice with the op-level Cin split and ride
    along the Cout split (kernels/conv_direct._direct_or_split)."""
    from stabletriton_tpu.kernels import conv_direct
    from stabletriton_tpu.ops import reference

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 32), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(32, dtype=np.float32))
    residual = jnp.asarray(rng.standard_normal((1, 6, 8, 32), dtype=np.float32))
    ref = reference.conv2d(
        reference.group_norm(x, gamma, beta, num_groups=8, act="silu"),
        w, b, stride=1, padding=1, residual=residual)
    monkeypatch.setattr(conv_direct, "W_RESIDENT_MAX", 9 * 16 * 16 * 4)
    out = conv_direct.gn_conv2d_fused(x, gamma, beta, w, b, num_groups=8,
                                      residual=residual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gn_conv2d_fused_ineligible_falls_back():
    """Non-3x3 / strided / quantized weights route through the unfused
    dispatch pair (active group_norm + conv2d bindings) with identical
    semantics."""
    from stabletriton_tpu.kernels import conv_direct
    from stabletriton_tpu.ops import reference

    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 16), dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((1, 1, 16, 16), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    ref = reference.conv2d(
        reference.group_norm(x, gamma, beta, num_groups=4, act="silu"),
        w1, b, stride=1, padding=0)
    out = conv_direct.gn_conv2d_fused(x, gamma, beta, w1, b, num_groups=4,
                                      padding=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv2d_per_batch_bias_parity():
    """(B, Cout) bias — the resnet time-embedding folded into conv1's
    epilogue — must agree between the reference conv and the direct kernel
    (and differ across batch rows, proving it is applied per batch)."""
    from stabletriton_tpu.kernels import conv_direct

    rng = np.random.default_rng(47)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16), dtype=np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((2, 16), dtype=np.float32))
    ref = ops.conv2d(x, w, b2)
    out = conv_direct.conv3x3_direct(x, w, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # per-batch: swapping the bias rows changes the outputs accordingly
    ref_sw = ops.conv2d(x, w, b2[::-1])
    assert not np.allclose(np.asarray(ref), np.asarray(ref_sw))
