"""Does XLA engage the v5e int8 MXU rate? Microbench bf16 vs int8 dots.

The turbo int8 binding only bought ~3% at the step level where matmuls are
~47% of the time — if int8xint8->int32 ran at the MXU's 2x int8 rate the
win should be ~20%+. This isolates round-trip GEMM pairs (x@w1)@w2 at the
SDXL transformer shapes (closed loop so bench_fn can chain through x),
plus the full dynamic-quant linear (ops "int8" backend) against the exact
bf16 linear.

    bash scripts/tpu_run.sh python scripts/int8_check.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from stabletriton_tpu.runtime.profiling import bench_fn


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (8192, 640, 640),     # 64^2-level attention proj (CFG batch 2)
        (8192, 640, 5120),    # 64^2-level geglu up-proj
        (2048, 1280, 1280),   # 32^2-level attention proj
        (2048, 1280, 10240),  # 32^2-level geglu up-proj
    ]
    print("== raw GEMM pair (x@w1)@w2, flops = 4*M*K*N ==", flush=True)
    for m, k_, n in shapes:
        xf = rng.standard_normal((m, k_), dtype=np.float32) * 0.05
        w1f = rng.standard_normal((k_, n), dtype=np.float32) * 0.05
        w2f = rng.standard_normal((n, k_), dtype=np.float32) * 0.05
        x16, w116, w216 = (jnp.asarray(a, jnp.bfloat16) for a in (xf, w1f, w2f))
        x8 = jnp.asarray(np.clip(np.round(xf * 100), -127, 127), jnp.int8)
        w18 = jnp.asarray(np.clip(np.round(w1f * 100), -127, 127), jnp.int8)
        w28 = jnp.asarray(np.clip(np.round(w2f * 100), -127, 127), jnp.int8)

        @jax.jit
        def pair16(a, b1=w116, b2=w216):
            h = jax.lax.dot_general(a, b1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(h.astype(jnp.bfloat16), b2,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return o.astype(jnp.bfloat16)

        @jax.jit
        def pair8(a, b1=w18, b2=w28):
            h = jax.lax.dot_general(a, b1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            h8 = jnp.clip(h >> 7, -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(h8, b2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(o >> 7, -127, 127).astype(jnp.int8)

        flops = 4 * m * k_ * n
        t16 = bench_fn(pair16, x16, chain_arg=0)
        t8 = bench_fn(pair8, x8, chain_arg=0)
        print(f"M{m} K{k_} N{n}: bf16 {t16*1e6:8.1f}us {flops/t16/1e12:6.1f} TF/s"
              f" | int8 {t8*1e6:8.1f}us {flops/t8/1e12:6.1f} TOP/s"
              f" | int8 speedup {t16/t8:.2f}x", flush=True)

    print("== full linear op (dynamic act quant, W8A8) ==", flush=True)
    import stabletriton_tpu.kernels  # noqa: F401
    from stabletriton_tpu import ops
    from stabletriton_tpu.compile import quantize_linear_weights

    for m, k_, n in shapes:
        if n != k_:
            continue  # closed loop needs out width == in width
        x = jnp.asarray(rng.standard_normal((2, m // 2, k_), dtype=np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k_, n), dtype=np.float32) * 0.02,
                        jnp.bfloat16)
        b = jnp.zeros((n,), jnp.bfloat16)
        qparams = quantize_linear_weights({"lin.weight": w, "lin.bias": b})
        wq = qparams["lin.weight"]

        lin_ref = ops.resolve("linear")  # active binding = reference
        with ops.use_backends({"linear": "int8"}):
            lin_int8 = ops.resolve("linear")

        f_ref = jax.jit(lambda xx: lin_ref(xx, w, b))
        f_q = jax.jit(lambda xx: lin_int8(xx, wq, b))
        t_ref = bench_fn(f_ref, x, chain_arg=0)
        t_q = bench_fn(f_q, x, chain_arg=0)
        print(f"linear M{m} K{k_} N{n}: bf16 {t_ref*1e6:8.1f}us | "
              f"int8(dyn) {t_q*1e6:8.1f}us | speedup {t_ref/t_q:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
