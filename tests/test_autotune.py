"""Autotune-table tests (CPU): key derivation, persistence, kernel lookup."""

import json

import jax.numpy as jnp
import numpy as np

from stabletriton_tpu.kernels import autotune
from stabletriton_tpu.models.unet import sdxl_base_unet_config, tiny_unet_config


def test_attention_key_stable():
    k = autotune.attention_key(2, 4096, 4096, 10, 64, jnp.bfloat16)
    assert k == "attention:b2:sq4096:sk4096:h10:d64:bfloat16"


def test_record_and_lookup_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("ST_TPU_AUTOTUNE_CACHE", str(tmp_path / "cache.json"))
    autotune._TABLES.clear()
    key = autotune.attention_key(2, 64, 64, 2, 16, jnp.float32)
    assert autotune.lookup(key) is None
    autotune.record(key, {"block_q": 64, "block_k": 128, "t_us": 1.0})
    assert autotune.lookup(key)["block_q"] == 64
    # persisted: a fresh table load (new process analog) still sees it
    autotune._TABLES.clear()
    assert autotune.lookup(key)["block_k"] == 128
    data = json.loads((tmp_path / "cache.json").read_text())
    assert key in data


def test_flash_attention_consults_table(tmp_path, monkeypatch):
    """A tuned entry must reach the kernel: plant a config and check the
    output still matches the reference math (any valid block split must)."""
    from stabletriton_tpu.kernels.flash_attention import flash_attention
    from stabletriton_tpu.ops.reference import attention as ref_attention

    monkeypatch.setenv("ST_TPU_AUTOTUNE_CACHE", str(tmp_path / "cache.json"))
    autotune._TABLES.clear()
    b, s, h, d = 1, 256, 2, 32
    key = autotune.attention_key(b, s, s, h, d, jnp.float32)
    autotune.record(key, {"block_q": 64, "block_k": 128, "t_us": 1.0})

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h * d), dtype=np.float32))
    got = flash_attention(q, k, v, num_heads=h, interpret=True)
    want = ref_attention(q, k, v, num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    autotune._TABLES.clear()


def test_fused_key_stable():
    k = autotune.fused_attention_key("qkv", 2, 4096, 4096, 10, 64, jnp.bfloat16)
    assert k == "attention_qkv:b2:sq4096:sk4096:h10:d64:bfloat16"
    k = autotune.fused_attention_key("kv", 2, 1024, 77, 20, 64, jnp.bfloat16)
    assert k == "attention_kv:b2:sq1024:sk77:h20:d64:bfloat16"


def test_fused_entry_honors_impl_split(tmp_path, monkeypatch):
    """A tuned {'impl': 'split'} entry must route flash_attention_qkv through
    the split fallback; a fused entry must use its blocks. Both at parity."""
    from stabletriton_tpu.kernels.flash_attention import flash_attention_qkv
    from stabletriton_tpu.ops.reference import attention_qkv as ref_qkv

    monkeypatch.setenv("ST_TPU_AUTOTUNE_CACHE", str(tmp_path / "cache.json"))
    autotune._TABLES.clear()
    b, s, h, d = 1, 192, 2, 64
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d), dtype=np.float32))
    want = ref_qkv(qkv, num_heads=h)

    key = autotune.fused_attention_key("qkv", b, s, s, h, d, jnp.float32)
    autotune.record(key, {"impl": "split", "t_us": 1.0})
    got = flash_attention_qkv(qkv, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    autotune.record(key, {"impl": "fused", "block_q": 64, "block_k": 128,
                          "t_us": 1.0})
    # new jit signature not needed: lookup happens at trace time, but the jit
    # cache keys only on shapes/statics — clear it so the new entry is read
    flash_attention_qkv._clear_cache()
    got = flash_attention_qkv(qkv, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    autotune._TABLES.clear()


def test_attention_shapes_for_sdxl():
    cfg = sdxl_base_unet_config()
    shapes = autotune.attention_shapes_for_unet(cfg, 128, 128, 1)
    # SDXL 1024²: self+cross at 64² (10 heads) and 32² (20 heads)
    assert (2, 4096, 4096, 10, 64) in shapes
    assert (2, 4096, 77, 10, 64) in shapes
    assert (2, 1024, 1024, 20, 64) in shapes
    assert (2, 1024, 77, 20, 64) in shapes
    assert len(shapes) == 4  # up path + mid dedupe onto the same four


def test_attention_candidates_sane():
    cands = autotune.attention_candidates(4096, 4096, 10, 64, 2)
    assert all(bq >= 128 and bk >= 128 for bq, bk in cands)
    assert len(cands) > 3
    # tiny-KV shapes lock block_k to the padded KV length
    cands = autotune.attention_candidates(4096, 77, 10, 64, 2)
    assert all(bk == 128 for _, bk in cands)


def test_tiny_unet_shapes_enumerate():
    cfg = tiny_unet_config()
    shapes = autotune.attention_shapes_for_unet(cfg, 8, 8, 2, ctx_len=7)
    assert shapes  # enumerates without error on the tiny config
    for b, sq, sk, h, d in shapes:
        assert b == 4 and sq >= 1 and h >= 1 and d >= 1


def test_conv_shapes_for_sdxl_cover_transitions():
    """The shape-probe enumeration must see the transition / skip-concat /
    conv_in/out shapes the hand-tuned round-4 table missed (VERDICT r4 #5)."""
    cfg = sdxl_base_unet_config()
    shapes = autotune.conv_shapes_for_unet(cfg, 128, 128, 1, cfg_factor=2)
    got = {s[:5] for s in shapes}
    assert (2, 128, 128, 4, 320) in got        # conv_in
    assert (2, 128, 128, 320, 4) in got        # conv_out
    assert (2, 64, 64, 320, 640) in got        # down transition
    assert (2, 64, 64, 960, 640) in got        # up skip-concat
    assert (2, 32, 32, 2560, 1280) in got      # widest up concat
    assert (2, 64, 64, 1280, 1280) in got      # upsampler
    # square resnet shapes (the round-4 table) are still in the set
    assert (2, 128, 128, 320, 320) in got
    # cond-only branch halves the batch
    n1 = {s[:5] for s in autotune.conv_shapes_for_unet(cfg, 128, 128, 1,
                                                       cfg_factor=1)}
    assert (1, 128, 128, 320, 320) in n1


def test_conv_direct_honors_impl_xla(tmp_path, monkeypatch):
    """A tuned {'impl': 'xla'} entry must route the shape back to the XLA
    conv (same numerics — the direct kernel and the reference op agree)."""
    import jax.numpy as jnp

    from stabletriton_tpu.kernels.conv_direct import conv3x3_direct

    monkeypatch.setenv("ST_TPU_AUTOTUNE_CACHE", str(tmp_path / "t.json"))
    autotune._TABLES.clear()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16), np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16), np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((16,), np.float32))
    want = np.asarray(conv3x3_direct(x, w, b, act="silu"))

    key = autotune.conv_key(2, 8, 8, 16, 16, x.dtype, False, "silu")
    autotune.record(key, {"impl": "xla", "t_us": 1.0})
    conv3x3_direct_got = np.asarray(conv3x3_direct(x, w, b, act="silu"))
    np.testing.assert_allclose(conv3x3_direct_got, want, atol=2e-5)
    autotune._TABLES.clear()


def test_tune_conv_chains_channel_changing_shapes():
    """tune_conv must handle cin != cout with no residual (transition convs)
    via the slice/tile chain adapter instead of raising."""
    best = autotune.tune_conv(1, 8, 8, 16, 8, has_res=False, act=None,
                              persist=False, verbose=False)
    assert "t_us" in best
