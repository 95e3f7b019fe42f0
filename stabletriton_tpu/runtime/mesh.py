"""Device-mesh / sharding module.

The reference is strictly single-process single-GPU (SURVEY.md §2.7 — no
distributed code at all); its latency tech is CUDA graphs. The TPU analog is
designed multi-chip from day one: an explicit ``jax.sharding.Mesh`` with a
("data", "model") axis pair, where

  * "data"  shards the CFG/multi-prompt batch across ICI (batched serving —
    the reference's planned multi-prompt config, BASELINE.json config #5);
  * "model" shards attention heads / MLP width tensor-parallel.

On one chip both axes are size 1 and everything below is a no-op; scaling out
is a mesh-shape change, not a rewrite. XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Mesh over all (or given) devices: data-parallel x tensor-parallel."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for activations."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(name: str, shape: tuple[int, ...], mesh: Mesh) -> NamedSharding:
    """Tensor-parallel layout for a UNet/CLIP/VAE param by state-dict name.

    Column-parallel (shard output features) for qkv/up projections, and
    row-parallel (shard input features) for the matching down projections, so
    the pair needs a single psum on the row-parallel output — the standard
    Megatron-style split, expressed purely as shardings for XLA to solve.
    Everything else (convs, norms, embeddings) is replicated: conv FLOPs are
    batch-sharded over "data" instead.
    """
    model = mesh.shape[MODEL_AXIS]
    if model == 1 or len(shape) != 2:
        return replicated(mesh)

    # .to_qkv./.to_kv. are the fused projections the shipped pipeline uses
    # (compile.fuse_attention_projections) — without them TP silently
    # replicates every attention projection (round-1 bug).
    col = (".to_q.", ".to_k.", ".to_v.", ".to_qkv.", ".to_kv.",
           ".ff.net.0.proj.", ".proj_in.")
    row = (".to_out.0.", ".ff.net.2.", ".proj_out.")
    if name.endswith(".weight"):
        if any(m in name for m in col) and shape[1] % model == 0:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if any(m in name for m in row) and shape[0] % model == 0:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
    return replicated(mesh)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Device-put a flat param dict with tensor-parallel shardings.

    Quantized (w_int8, scale) pairs (compile.quantize_linear_weights) shard
    the int8 weight by the usual name rules; the per-out-channel scale
    follows the weight's output-dim sharding."""
    out = {}
    for k, v in params.items():
        if isinstance(v, tuple):
            wq, scale = v
            ws = param_sharding(k, wq.shape, mesh)
            sspec = P(ws.spec[1]) if len(ws.spec) == 2 else P()
            out[k] = (
                jax.device_put(wq, ws),
                jax.device_put(scale, NamedSharding(mesh, sspec)),
            )
        else:
            out[k] = jax.device_put(v, param_sharding(k, v.shape, mesh))
    return out
