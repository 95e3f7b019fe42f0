"""Full-scale SD1.5 UNet step on TPU (pallas binding): compile + throughput."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax.numpy as jnp, numpy as np
from stabletriton_tpu.compile import CompileConfig, compile_unet, fuse_attention_projections
from stabletriton_tpu.models.unet import init_unet_params, sd15_unet_config

cfg = sd15_unet_config()
fn = compile_unet(cfg, CompileConfig(backend="pallas", dtype="bfloat16"))
params = fuse_attention_projections(init_unet_params(cfg, 0, dtype=jnp.bfloat16))
rng = np.random.default_rng(0)
b, lat = 2, 64  # 512x512 images
args = (
    jnp.asarray(rng.standard_normal((b,lat,lat,4),dtype=np.float32), jnp.bfloat16),
    jnp.full((b,), 500.0, jnp.float32),
    jnp.asarray(rng.standard_normal((b,77,768),dtype=np.float32), jnp.bfloat16),
    jnp.zeros((b, 0), jnp.bfloat16),
    jnp.zeros((b, 0), jnp.float32),
)
out = fn(params, *args); _ = np.asarray(out[0,0,0])
print("SD1.5 512x512 step compiled and ran:", out.shape, out.dtype, flush=True)
def chain(n):
    o = out; t0 = time.perf_counter()
    for _ in range(n): o = fn(params, o, *args[1:])
    _ = np.asarray(o[0,0,0]); return time.perf_counter() - t0
t1, t2 = chain(4), chain(20)
per = (t2 - t1) / 16
print(f"steady-state: {per*1e3:.1f} ms/step -> {1/per:.1f} it/s", flush=True)
