"""Tune flash-attention block sizes per SDXL shape (one process, slope timing)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from stabletriton_tpu.kernels.flash_attention import flash_attention
from stabletriton_tpu import ops

def slope(fn, q, k, v, n1=8, n2=40):
    o = fn(q, k, v); _ = np.asarray(o[0,0,0,0])
    def chain(n):
        x = o; t0 = time.perf_counter()
        for _ in range(n): x = fn(x, k, v)
        _ = np.asarray(x[0,0,0,0]); return time.perf_counter() - t0
    t1 = chain(n1); t2 = chain(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)

rng = np.random.default_rng(0)
ref = jax.jit(lambda q,k,v: ops.attention(q,k,v))
shapes = [(2,20,1024,1024,64), (2,10,4096,4096,64), (2,10,4096,77,64), (2,20,1024,77,64), (1,1,16384,16384,512)]
for (b,h,s,kv,d) in shapes:
    q = jnp.asarray(rng.standard_normal((b,h,s,d),dtype=np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b,h,kv,d),dtype=np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b,h,kv,d),dtype=np.float32)).astype(jnp.bfloat16)
    t_ref = slope(ref, q, k, v)
    print(f"--- B{b} H{h} S{s} KV{kv} D{d}: ref {t_ref*1e3:.3f}ms", flush=True)
    combos = [(512,512),(512,1024),(1024,1024),(1024,2048),(2048,2048),(256,2048),(512,2048),(2048,512),(1024,512)]
    if kv <= 128: combos = [(512,128),(1024,128),(2048,128),(4096,128)]
    if d == 512: combos = [(512,512),(1024,1024),(512,1024),(256,512)]
    for bq, bk in combos:
        if bq > s: continue
        try:
            f = jax.jit(lambda q,k,v,bq=bq,bk=bk: flash_attention(q,k,v,block_q=bq,block_k=bk))
            t = slope(f, q, k, v)
            print(f"  bq={bq:5d} bk={bk:5d}: {t*1e3:8.3f}ms  ({t_ref/t:5.2f}x)", flush=True)
        except Exception as e:
            print(f"  bq={bq:5d} bk={bk:5d}: FAIL {str(e)[:80]}", flush=True)
