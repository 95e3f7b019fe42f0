"""Trace one UNet step (binding from argv[1]) and dump perfetto trace path."""
import sys, glob, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import stabletriton_tpu.kernels  # noqa
from stabletriton_tpu.compile import CompileConfig, compile_unet
from stabletriton_tpu.models.unet import init_unet_params, sdxl_base_unet_config

backend = sys.argv[1] if len(sys.argv) > 1 else "reference"
# "<binding>_kv" traces the shipped cached-cross-KV step (the cache is
# computed outside the traced region, like the pipeline's once-per-generation
# precompute)
binding, _, mode = backend.partition("_")
cfg = sdxl_base_unet_config()
ccfg = CompileConfig(backend=binding, dtype="bfloat16")
params = init_unet_params(cfg, 0, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
b, lat = 2, 128
args = (
    jnp.asarray(rng.standard_normal((b,lat,lat,4),dtype=np.float32), jnp.bfloat16),
    jnp.full((b,), 500.0, jnp.float32),
    jnp.asarray(rng.standard_normal((b,77,2048),dtype=np.float32), jnp.bfloat16),
    jnp.asarray(rng.standard_normal((b,1280),dtype=np.float32), jnp.bfloat16),
    jnp.asarray(np.tile([1024,1024,0,0,1024,1024],(b,1)).astype(np.float32)),
)
if mode == "kv":
    from stabletriton_tpu.compile import compile_unet_kv, fuse_attention_projections

    params = fuse_attention_projections(params)
    pre, _pre_t, step = compile_unet_kv(cfg, ccfg)
    kv = jax.tree.map(lambda a: a.block_until_ready(), pre(params, args[2]))

    def fn(p, sample, t, ehs, te, tid):
        return step(p, sample, t, kv, te, tid)
else:
    fn = compile_unet(cfg, ccfg)
out = fn(params, *args); _ = np.asarray(out[0,0,0]); print("warm", flush=True)
jax.profiler.start_trace(f"/tmp/st_trace_{backend}", create_perfetto_trace=True)
o = out
for _ in range(3):
    o = fn(params, o, *args[1:])
_ = np.asarray(o[0,0,0])
jax.profiler.stop_trace()
print("traced", flush=True)
for f in glob.glob(f"/tmp/st_trace_{backend}/**/*", recursive=True):
    print(f, flush=True)
