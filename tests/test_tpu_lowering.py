"""TPU Mosaic lowering gate — catches on-hardware lowering breaks on CPU.

The round-4 regression class this guards against: the CPU suite runs Pallas
in interpret mode, where Mosaic's block-spec checks never fire, so 250 green
tests coexisted with a default path that crashed on the real chip (a
(B, Cout) per-batch bias under a (1, Cout) Blocked spec — illegal at B=2;
VERDICT r4 headline, BENCH_r04 rc=1). ``jax.export`` with
``platforms=['tpu']`` runs the full StableHLO + Mosaic kernel lowering on
the CPU host — no TPU needed — which catches exactly that class of bug.

These tests force ``STABLETRITON_INTERPRET=0`` so every kernel takes its
real ``pallas_call`` path, then export the default-binding programs at the
shapes the bench actually runs. Slow-ish (~1 min total: full-UNet traces);
they are the price of never shipping a lowering break again.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export

from stabletriton_tpu.kernels import common


@pytest.fixture()
def real_lowering(monkeypatch):
    """Force interpret_mode() False so pallas_calls lower for real."""
    monkeypatch.setenv("STABLETRITON_INTERPRET", "0")
    common.interpret_mode.cache_clear()
    yield
    common.interpret_mode.cache_clear()


def _unet_export(latent, *, overrides=(), batch=2):
    from stabletriton_tpu.compile import CompileConfig, compile_unet
    from stabletriton_tpu.models.unet import (
        init_unet_params,
        sdxl_base_unet_config,
    )

    cfg = sdxl_base_unet_config()
    ccfg = CompileConfig(backend="pallas", dtype="bfloat16",
                         overrides=tuple(overrides))
    fn = compile_unet(cfg, ccfg)
    params = jax.eval_shape(
        lambda: init_unet_params(cfg, 0, dtype=jnp.bfloat16))
    S = jax.ShapeDtypeStruct
    args = (
        params,
        S((batch, latent, latent, 4), jnp.bfloat16),
        S((batch,), jnp.float32),
        S((batch, 77, cfg.cross_attention_dim), jnp.bfloat16),
        S((batch, 1280), jnp.bfloat16),
        S((batch, 6), jnp.float32),
    )
    return export.export(fn, platforms=["tpu"])(*args)


def test_default_unet_step_lowers_for_tpu(real_lowering):
    """The headline-bench program (SDXL-base, CFG batch 2, 1024² latents)
    must pass Mosaic lowering — this is the exact program BENCH runs."""
    exp = _unet_export(128)
    assert exp.out_avals[0].shape == (2, 128, 128, 4)


def test_entry_shape_unet_step_lowers_for_tpu(real_lowering):
    """The driver's entry() compile-check shape (512², 64×64 latents)."""
    exp = _unet_export(64)
    assert exp.out_avals[0].shape == (2, 64, 64, 4)


def test_gn_conv2d_fused_lowers_for_tpu(real_lowering):
    """The fused GN+conv binding (per-batch gn_scale/gn_shift operands) at a
    resnet hot shape — the other (B, N)-operand path VERDICT r4 flagged."""
    from stabletriton_tpu import ops
    from stabletriton_tpu.kernels.conv_direct import gn_conv2d_fused

    B, H, C = 2, 64, 640

    def f(x, gamma, beta, w, b, temb):
        return gn_conv2d_fused(x, gamma, beta, w, b + temb, act=None)

    S = jax.ShapeDtypeStruct
    exp = export.export(jax.jit(f), platforms=["tpu"])(
        S((B, H, H, C), jnp.bfloat16),
        S((C,), jnp.bfloat16),
        S((C,), jnp.bfloat16),
        S((3, 3, C, C), jnp.bfloat16),
        S((C,), jnp.bfloat16),
        S((B, C), jnp.bfloat16),  # folded time-emb -> per-batch bias
    )
    assert exp.out_avals[0].shape == (B, H, H, C)


@pytest.mark.parametrize("span,block_k", [(2, 1024), (5, 1024), (10, 1024),
                                          (5, 512)])
def test_attention_span_lowers_for_tpu(real_lowering, span, block_k):
    """Span blocks (span x 128 lanes, multi-head-group programs) must pass
    Mosaic lowering at the S=1024 32^2 self shape before any TPU tuning run
    spends compiles on them — both the single-KV (bk=1024) and the
    online-softmax (bk=512, span-wide scratch) kernels."""
    from stabletriton_tpu.kernels.flash_attention import flash_attention_qkv

    b, s, h, d = 2, 1024, 20, 64

    def f(qkv):
        return flash_attention_qkv(qkv, num_heads=h, block_q=512,
                                   block_k=block_k, span=span,
                                   interpret=False)

    S = jax.ShapeDtypeStruct
    exp = export.export(jax.jit(f), platforms=["tpu"])(
        S((b, s, 3 * h * d), jnp.bfloat16))
    assert exp.out_avals[0].shape == (b, s, h * d)


def test_conv_per_batch_bias_lowers_for_tpu(real_lowering):
    """Minimal repro of the round-4 break: direct conv, (B, Cout) bias."""
    from stabletriton_tpu.kernels.conv_direct import conv3x3_direct

    def f(x, w, b):
        return conv3x3_direct(x, w, b, act="silu", interpret=False)

    S = jax.ShapeDtypeStruct
    exp = export.export(jax.jit(f), platforms=["tpu"])(
        S((2, 32, 32, 320), jnp.bfloat16),
        S((3, 3, 320, 320), jnp.bfloat16),
        S((2, 320), jnp.bfloat16),
    )
    assert exp.out_avals[0].shape == (2, 32, 32, 320)
