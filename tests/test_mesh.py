"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabletriton_tpu.models.unet import init_unet_params, tiny_unet_config, unet_apply
from stabletriton_tpu.runtime import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return mesh_mod.make_mesh(data=4, model=2, devices=jax.devices()[:8])


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_param_sharding_rules(mesh8):
    ps = mesh_mod.param_sharding(
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        (64, 64), mesh8,
    )
    assert ps.spec == jax.sharding.PartitionSpec(None, "model")
    ps = mesh_mod.param_sharding(
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
        (64, 64), mesh8,
    )
    assert ps.spec == jax.sharding.PartitionSpec("model", None)
    # conv weights replicate
    ps = mesh_mod.param_sharding("conv_in.weight", (3, 3, 4, 32), mesh8)
    assert ps.spec == jax.sharding.PartitionSpec()
    # odd shapes replicate rather than shard unevenly
    ps = mesh_mod.param_sharding("x.ff.net.0.proj.weight", (32, 51), mesh8)
    assert ps.spec == jax.sharding.PartitionSpec()


def test_param_sharding_covers_fused_projections(mesh8):
    """The shipped pipeline folds projections into .to_qkv./.to_kv.; those keys
    MUST be column-parallel or TP is silently dead (round-1 bug)."""
    ps = mesh_mod.param_sharding(
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_qkv.weight",
        (64, 192), mesh8,
    )
    assert ps.spec == jax.sharding.PartitionSpec(None, "model")
    ps = mesh_mod.param_sharding(
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_kv.weight",
        (32, 128), mesh8,
    )
    assert ps.spec == jax.sharding.PartitionSpec(None, "model")


def test_sharded_fused_pipeline_matches_unsharded(mesh8):
    """SDXLPipeline with a mesh (fused qkv/kv params tensor-parallel, token
    batch over "data") == the same pipeline unsharded."""
    import numpy as np
    from stabletriton_tpu.compile import CompileConfig
    from stabletriton_tpu.runtime.pipeline import make_tiny_pipeline

    ccfg = CompileConfig(backend="pallas", dtype="float32")
    ref = make_tiny_pipeline(ccfg)
    shp = make_tiny_pipeline(ccfg, mesh=mesh8)
    fused = [k for k in shp.params["unet"] if ".to_qkv." in k or ".to_kv." in k]
    assert fused
    for k in fused:
        assert tuple(shp.params["unet"][k].sharding.spec) == (None, "model"), k

    mp = ref.clip_config.max_position_embeddings
    ids = np.full((4, mp), 5, np.int32)  # batch == data axis size
    ids[:, -1] = 99
    ids = jnp.asarray(ids)
    a = ref.txt2img(ids, ids, height=32, width=32, steps=2, seed=0)
    b = shp.txt2img(ids, ids, height=32, width=32, steps=2, seed=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_unet_matches_unsharded(mesh8):
    """dp x tp sharded forward == single-device forward (XLA collectives are
    numerically transparent here)."""
    cfg = tiny_unet_config()
    params = init_unet_params(cfg, 0)
    rng = np.random.default_rng(0)
    b = 4  # data axis size
    sample = jnp.asarray(rng.standard_normal((b, 16, 16, 4), dtype=np.float32))
    t = jnp.full((b,), 500.0)
    ehs = jnp.asarray(rng.standard_normal((b, 7, cfg.cross_attention_dim), dtype=np.float32))
    te = jnp.asarray(rng.standard_normal((b, 16), dtype=np.float32))
    ti = jnp.zeros((b, 6))

    expected = unet_apply(cfg, params, sample, t, ehs, te, ti)

    sp = mesh_mod.shard_params(params, mesh8)
    bs = mesh_mod.batch_sharding(mesh8)
    args = [jax.device_put(x, bs) for x in (sample, t, ehs, te, ti)]
    got = jax.jit(lambda p, *a: unet_apply(cfg, p, *a))(sp, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
