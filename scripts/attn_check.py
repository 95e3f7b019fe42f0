import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from stabletriton_tpu.kernels.flash_attention import flash_attention
from stabletriton_tpu import ops

def slope(fn, q, k, v, n1=8, n2=40):
    o = fn(q, k, v); _ = np.asarray(o[0,0,0])
    def chain(n):
        x = o; t0 = time.perf_counter()
        for _ in range(n): x = fn(x, k, v)
        _ = np.asarray(x[0,0,0]); return time.perf_counter() - t0
    t1, t2 = chain(n1), chain(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)

rng = np.random.default_rng(0)
for (b,h,s,kv,d) in [(2,10,4096,4096,64),(2,20,1024,1024,64),(2,10,4096,77,64),(1,1,16384,16384,512)]:
    q = jnp.asarray(rng.standard_normal((b,s,h*d),dtype=np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b,kv,h*d),dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b,kv,h*d),dtype=np.float32)).astype(jnp.bfloat16)
    ref = jax.jit(lambda q,k,v,h=h: ops.attention(q,k,v,num_heads=h))
    pal = jax.jit(lambda q,k,v,h=h: flash_attention(q,k,v,num_heads=h))
    op = pal(q,k,v); orf = ref(q,k,v)
    err = float(jnp.max(jnp.abs(op.astype(jnp.float32)-orf.astype(jnp.float32))))
    tr, tp = slope(ref,q,k,v), slope(pal,q,k,v)
    print(f"B{b} H{h} S{s} KV{kv} D{d}: ref {tr*1e3:7.3f}ms pallas {tp*1e3:7.3f}ms ({tr/tp:5.2f}x) maxerr {err:.2e}", flush=True)
