"""The one-call compile API — analog of the reference's ``optimize_model``.

Reference flow (``src/stabletriton/optimization.py:27-38``): symbolic-trace the
torch UNet, run the rewrite-pass pipeline, wrap the forward in a cached CUDA
graph. TPU-native flow here: pick an op->backend *binding* (the pass list),
trace the functional UNet once under ``jax.jit`` with that binding active, and
let XLA produce the replayable executable (XLA's compile cache plays the role
of the CUDA-graph cache keyed by input signature, reference
``optimizers/cuda/graphs.py:193-209``).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from stabletriton_tpu import ops
from stabletriton_tpu.models.unet import (
    UNetConfig,
    precompute_cross_kv,
    precompute_time_cond,
    unet_apply,
    unet_apply_shallow,
)

# The default fused-op set is *measured*, not aspirational — exactly how the
# reference curated its pass list (it disabled replace_linear after measuring
# a regression, optimization.py:18-19). On-chip A/B of the full SDXL UNet
# (BENCH_SOLO sweeps, 2026-08-16, v5e):
#   attention only          : 1.07x vs stock XLA
#   + group_norm/layer_norm/geglu/time_embed : 0.87x  (they break XLA's
#     elementwise fusion into neighboring ops and add HBM round-trips)
# so attention is the default; everything else stays available via overrides
# for per-op experimentation (CompileConfig.overrides).
PALLAS_OPS = ("attention", "attention_qkv", "attention_kv")

# Fused kernels that exist but are opt-in (bind via overrides):
OPTIONAL_PALLAS_OPS = ("geglu", "group_norm", "layer_norm", "linear", "time_embed", "dropout")


@dataclass(frozen=True)
class CompileConfig:
    """Options for compile_unet (frozen → usable as a jit static arg)."""

    backend: str = "pallas"  # "pallas" (fused kernels) or "reference" (plain XLA)
    # per-op overrides, e.g. (("attention", "reference"),) to A/B one op
    overrides: tuple[tuple[str, str], ...] = ()
    dtype: str = "bfloat16"
    donate_sample: bool = False
    # opt-in "turbo" quantization: "int8" pre-quantizes eligible linear
    # weights (quantize_linear_weights) and binds linear->int8. Breaks the
    # 1e-3 fidelity gate by design; report its numbers separately.
    quantize: str | None = None
    quantize_min_dim: int = 256  # smallest weight dim worth quantizing
    # hoist the cross-attention K/V projections out of the denoise loop
    # (precompute_cross_kv): numerically identical, saves ~680 MB/step of
    # loop-invariant weight traffic. Off => recompute per step (A/B).
    cache_cross_kv: bool = True
    # batch the per-step time-conditioning projections over all steps before
    # the loop (precompute_time_cond): same numbers, ~50 MB/step of weight
    # re-reads + ~27 tiny GEMM dispatches hoisted. Measured step-level A/B
    # (benchmarks/NOTES.md round-3 log): kv-only 8.822 it/s vs kv+tc 8.795 —
    # the hoist does NOT pay at the step level (the tiny GEMMs overlap fine;
    # the (T,B,C) scan-xs slices add their own traffic), so it stays opt-in.
    cache_time_cond: bool = False

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


_cache_enabled: str | None = None


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Persist XLA executables to disk so recompiles are warm across processes.

    The reference pays its (re)capture/autotune cost once per *process*
    (CUDA-graph cache + Triton autotune cache are in-memory,
    ``optimizers/cuda/graphs.py:193-209``); XLA's persistent compilation
    cache carries the compiled program across processes too — the second
    process with the same (topology, program) signature deserializes instead
    of recompiling, which on a tunneled TPU turns minutes of compile into
    sub-second loads. Safe to call repeatedly; honors ``ST_TPU_CACHE_DIR``
    when ``path`` is None (default ``~/.cache/stabletriton_tpu/xla``).

    Returns the cache directory in use.
    """
    global _cache_enabled
    import os

    if path is None:
        if _cache_enabled is not None:
            # a cache dir is already active (possibly set explicitly by the
            # user) — a default-path call must not silently repoint it
            return _cache_enabled
        path = os.environ.get(
            "ST_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "stabletriton_tpu", "xla"),
        )
    if _cache_enabled == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took XLA real work; tiny programs stay uncached
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _cache_enabled = path
    return path


def resolve_binding(config: CompileConfig) -> dict[str, str]:
    """Build the op->backend binding, keeping only backends that exist."""
    if config.backend == "pallas":
        # import registers the pallas backends
        import stabletriton_tpu.kernels  # noqa: F401

        # capability check — the analog of the reference's CUDA + SM>=8.0
        # asserts (optimization.py:29-33), but degrading instead of refusing:
        # off-TPU the kernels run interpreted (correct, slow), so warn once.
        if jax.default_backend() != "tpu":
            import logging

            logging.getLogger("stabletriton_tpu").warning(
                "pallas binding requested on %r backend: kernels will run in "
                "interpreter mode (correct but slow); use backend='reference' "
                "for plain XLA speed off-TPU",
                jax.default_backend(),
            )

    binding: dict[str, str] = {}
    registered = ops.registered_ops()
    if config.backend == "pallas":
        for op in PALLAS_OPS:
            if "pallas" in registered.get(op, []):
                binding[op] = "pallas"
        # measured default variants (see benchmarks/NOTES.md): bf16-apply GN
        # is +0.28 it/s at the step level; its full-UNet deviation vs the
        # stock binding (MSE 1.1e-4, max 0.047) sits at the default path's
        # own bf16 noise floor (7.6e-5 / 0.043) — far inside the MSE<1e-3
        # fidelity gate. Override (("group_norm", "reference"),) restores
        # the f32-apply form. Round-3: bf16-apply LN joins on the same
        # evidence (step 8.865 vs 8.831; full-UNet MSE 1.14e-4 / max 0.057
        # vs the default's own 1.09e-4 / 0.047 floor).
        binding["group_norm"] = "bf16apply"
        binding["layer_norm"] = "bf16apply"
        # Round-4: the direct Pallas 3x3 conv (kernels/conv_direct.py —
        # nine shifted MXU GEMMs, resident weights, op-level VMEM splits)
        # beats the XLA conv at every SDXL resnet hot shape (1.17-1.26x
        # kernel-level; step-level 8.85 -> 9.52 it/s = +7.6%). Full-UNet
        # deviation MSE 1.16e-4 / max 0.049 — the default path's own bf16
        # floor. Non-3x3/strided/odd shapes fall back to the XLA conv
        # inside the binding. Override (("conv2d", "reference"),) restores
        # the plain XLA conv. Closes the SURVEY §7 stretch goal (the
        # reference's own custom convs were ~40x SLOWER, Conv_Kernels/
        # README.md:2).
        binding["conv2d"] = "direct"
    if config.quantize in ("int8", "int8_ff"):
        binding["linear"] = "int8"
    elif config.quantize == "int8_conv":
        binding["linear"] = "int8"
        binding["conv2d"] = "int8"
    elif config.quantize is not None:
        raise ValueError(f"unknown quantize mode {config.quantize!r}")
    for op, backend in config.overrides:
        if backend != "reference" and backend not in registered.get(op, []):
            raise ValueError(f"override {op}->{backend}: backend not registered")
        binding[op] = backend
    return binding


def compile_unet(
    unet_config: UNetConfig,
    config: CompileConfig = CompileConfig(),
):
    """Return a jitted UNet step: fn(params, sample, t, ehs, text_embeds, time_ids).

    The binding is applied at trace time, so the returned executable has the
    fused kernels baked in — re-compiling with a different binding is the analog
    of re-running the reference's pass pipeline with passes toggled.
    """
    binding = resolve_binding(config)
    dtype = config.jnp_dtype

    def step(params, sample, timesteps, encoder_hidden_states, text_embeds, time_ids):
        with ops.use_backends(binding):
            return unet_apply(
                unet_config, params, sample.astype(dtype), timesteps,
                encoder_hidden_states, text_embeds, time_ids,
            )

    donate = (1,) if config.donate_sample else ()
    return jax.jit(step, donate_argnums=donate)


def compile_unet_kv(
    unet_config: UNetConfig,
    config: CompileConfig = CompileConfig(),
):
    """compile_unet with the hoisted-conditioning caches split out.

    Returns ``(precompute, precompute_time, step)``:

      precompute(params, encoder_hidden_states) -> cross_kv
      precompute_time(params, timesteps, text_embeds, time_ids) -> time_cond
          (leaves are (T, B, C); slice step i before calling step)
      step(params, sample, t, cross_kv, text_embeds, time_ids,
           time_cond=None) -> eps

    The text conditioning is constant across every denoise step, so its K/V
    projections are loop-invariant, and the time-conditioning projections
    batch over all T steps at once; ``precompute*`` run once per generation
    and ``step`` consumes the caches instead of re-reading ~730 MB of
    projection weights per step (SDXL-base). Numerically identical to
    ``compile_unet`` — the same ops on the same dtype-cast inputs, just
    hoisted. The pipeline's scan loop and the headline bench both use this
    form; ``compile_unet`` remains the single-call drop-in surface.
    """
    binding = resolve_binding(config)
    dtype = config.jnp_dtype

    def precompute(params, encoder_hidden_states):
        with ops.use_backends(binding):
            return precompute_cross_kv(
                unet_config, params, encoder_hidden_states.astype(dtype)
            )

    def precompute_time(params, timesteps, text_embeds, time_ids):
        with ops.use_backends(binding):
            return precompute_time_cond(
                unet_config, params, timesteps, text_embeds, time_ids,
                dtype=dtype,
            )

    def step(params, sample, timesteps, cross_kv, text_embeds, time_ids,
             time_cond=None):
        with ops.use_backends(binding):
            return unet_apply(
                unet_config, params, sample.astype(dtype), timesteps,
                None, text_embeds, time_ids, cross_kv=cross_kv,
                time_cond=time_cond,
            )

    donate = (1,) if config.donate_sample else ()
    return (jax.jit(precompute), jax.jit(precompute_time),
            jax.jit(step, donate_argnums=donate))


def compile_unet_deepcache(
    unet_config: UNetConfig,
    config: CompileConfig = CompileConfig(),
):
    """The DeepCache pair for step-at-a-time callers (the torch drop-in
    frontend): ``(full, shallow)`` where

      full(params, sample, t, ehs, text_embeds, time_ids) -> (eps, cache)
      shallow(params, sample, t, ehs, text_embeds, time_ids, cache) -> eps

    ``cache`` is the deep-feature tensor entering the last up block
    (models/unet.unet_apply ``return_cache`` / ``unet_apply_shallow``). The
    native pipeline keeps the cache inside its scan carry instead
    (runtime/denoise.make_denoise_loop ``deep_cache``); this form is for
    frontends that own the step loop, like the reference's per-step
    CUDA-graph replay surface."""
    binding = resolve_binding(config)
    dtype = config.jnp_dtype

    def full(params, sample, timesteps, encoder_hidden_states, text_embeds,
             time_ids):
        with ops.use_backends(binding):
            return unet_apply(
                unet_config, params, sample.astype(dtype), timesteps,
                encoder_hidden_states, text_embeds, time_ids,
                return_cache=True,
            )

    def shallow(params, sample, timesteps, encoder_hidden_states, text_embeds,
                time_ids, cache):
        with ops.use_backends(binding):
            return unet_apply_shallow(
                unet_config, params, sample.astype(dtype), timesteps,
                encoder_hidden_states, text_embeds, time_ids, cache,
            )

    donate = (1,) if config.donate_sample else ()
    return (jax.jit(full, donate_argnums=donate),
            jax.jit(shallow, donate_argnums=donate))


def cast_params(params, config: CompileConfig):
    """Pre-cast a param pytree to the compile dtype (done once, not per step)."""
    dtype = config.jnp_dtype
    return jax.tree.map(lambda a: a.astype(dtype), params)


def quantize_linear_weights(params: dict, *, min_dim: int = 256,
                            conv: bool = False, ff_only: bool = False) -> dict:
    """Pre-quantize eligible weights to (int8, per-out-channel f32 scale)
    pairs for the int8 turbo bindings.

    Eligible: 2D ``*.weight`` with both dims >= min_dim — the transformer
    projections and MLPs where the FLOPs are — and, when ``conv=True``, 4D
    HWIO conv weights whose in/out channels both reach min_dim (conv_in /
    conv_out stay exact via their 4-channel side). Conditioning-critical
    small stacks (time/add embeddings) and everything else stay exact; the
    int8 backends pass un-quantized arrays through to the exact path. Run
    AFTER fuse_attention_projections so fused qkv/kv weights quantize as one
    tensor. Returns a new dict; originals are not mutated.

    ``ff_only`` restricts to the GEGLU up-projections (``.net.0.proj``):
    v5e microbench (scripts/int8_check.py) shows the int8 MXU rate only
    engages on wide-N GEMMs — 1.86-1.98x on the (640->5120)/(1280->10240)
    FF projections vs 0.92x on square attention projections, where the
    dynamic activation-quant overhead wins instead. Quantizing just the FF
    ups keeps most of the turbo win AND a smaller numerics deviation.
    """
    out = {}
    for key, w in params.items():
        ndim = getattr(w, "ndim", 0)
        eligible = (
            key.endswith(".weight")
            and "time_embedding" not in key
            and "add_embedding" not in key
            and (not ff_only or ".net.0.proj." in key)
            and (
                (ndim == 2 and min(w.shape) >= min_dim)
                or (conv and ndim == 4 and min(w.shape[2], w.shape[3]) >= min_dim)
            )
        )
        if eligible:
            wf = jnp.asarray(w, jnp.float32)
            red = tuple(range(ndim - 1))  # all but the output-channel axis
            scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=red), 1e-12) / 127.0
            wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
            out[key] = (wq, scale)
        else:
            out[key] = w
    return out


def fuse_attention_projections(params: dict) -> dict:
    """Fold each attention's separate projections into one wide matmul.

    Self-attention q/k/v (same input) concatenate to ``to_qkv.weight``
    (in, 3C); cross-attention k/v (same context input) to ``to_kv.weight``.
    The model detects the fused keys (models/unet._attention_layer). This is
    the working version of the reference's *planned* QKV fusion (its
    ``kernels/attention_proj.py`` existed but was never wired —
    SURVEY.md §2.5): on-chip traces show the narrow per-projection dots run
    at ~114 TF/s while wide dots reach ~177, so one (in, 3C) dot beats three
    (in, C) dots. Returns a new dict; originals are not mutated.
    """
    out = dict(params)
    for key in list(params):
        if key.endswith(".attn1.to_q.weight"):
            base = key[: -len(".to_q.weight")]
            names = [f"{base}.to_{x}.weight" for x in ("q", "k", "v")]
            if all(n in out for n in names):
                out[f"{base}.to_qkv.weight"] = jnp.concatenate(
                    [out.pop(n) for n in names], axis=1
                )
        elif key.endswith(".attn2.to_k.weight"):
            base = key[: -len(".to_k.weight")]
            names = [f"{base}.to_{x}.weight" for x in ("k", "v")]
            if all(n in out for n in names):
                out[f"{base}.to_kv.weight"] = jnp.concatenate(
                    [out.pop(n) for n in names], axis=1
                )
    return out
