"""Per-kernel A/B microbenchmarks at SDXL shapes: XLA reference vs Pallas.

The dev-tool analog of the reference's per-kernel ``triton.testing.do_bench``
``__main__`` blocks (SURVEY.md §5). Run on a real TPU:

    python benchmarks/kernel_bench.py [attention|group_norm|layer_norm|geglu]

Prints one line per (op, shape): latency of both backends + speedup. Uses the
chained-slope methodology from runtime/profiling (dispatch overhead removed).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(which: str | None = None):
    import jax
    import jax.numpy as jnp

    import stabletriton_tpu.kernels  # registers pallas backends  # noqa: F401
    from stabletriton_tpu import ops
    from stabletriton_tpu.runtime.profiling import bench_fn

    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32)
        ).astype(jnp.bfloat16)

    def ab(op_name, label, fn_args, kwargs=None, chain_arg=0):
        kwargs = kwargs or {}
        results = {}
        for backend in ("reference", "pallas"):
            with ops.use_backends({op_name: backend}):
                f = jax.jit(lambda *a: ops.dispatch(op_name, *a, **kwargs))
                results[backend] = bench_fn(f, *fn_args, chain_arg=chain_arg)
        r, p = results["reference"], results["pallas"]
        print(f"{op_name:11s} {label:34s} ref {r*1e3:8.3f}ms  pallas {p*1e3:8.3f}ms  "
              f"speedup {r/p:5.2f}x", flush=True)

    # SDXL shapes: batch 2 (CFG), head_dim 64; levels 64x64 (640ch) & 32x32
    # (1280ch); KV=77 covers the cross-attention tiny-KV path. Channel-packed
    # (B, S, H*D) operands — the op contract (ops/reference.py:53).
    if which in (None, "attention"):
        for b, h, s, kv in [(2, 10, 4096, 4096), (2, 20, 1024, 1024),
                            (2, 10, 4096, 77), (2, 20, 1024, 77),
                            # unseen-signature shapes (768², batch 4)
                            (2, 10, 2304, 2304), (8, 10, 4096, 4096)]:
            q, k, v = arr(b, s, h * 64), arr(b, kv, h * 64), arr(b, kv, h * 64)
            ab("attention", f"B{b} H{h} S{s} KV{kv} D64", (q, k, v),
               {"num_heads": h})

    if which in (None, "group_norm"):
        for n, hw, c in [(2, 128, 320), (2, 64, 640), (2, 32, 1280)]:
            x = arr(n, hw, hw, c)
            g = jnp.ones(c, jnp.float32)
            bta = jnp.zeros(c, jnp.float32)
            ab("group_norm", f"N{n} {hw}x{hw} C{c} +silu", (x, g, bta),
               {"num_groups": 32, "act": "silu"})

    if which in (None, "layer_norm"):
        for b, s, c in [(2, 4096, 640), (2, 1024, 1280)]:
            x = arr(b, s, c)
            ab("layer_norm", f"B{b} S{s} C{c}",
               (x, jnp.ones(c, jnp.float32), jnp.zeros(c, jnp.float32)))

    if which in (None, "geglu"):
        for b, s, c in [(2, 4096, 2560), (2, 1024, 5120)]:
            ab("geglu", f"B{b} S{s} C{c}", (arr(b, s, c), arr(b, s, c)))

    if which in (None, "conv"):
        # SDXL resnet hot shapes: 3x3 s1 SAME + bias + residual + silu.
        # A/B the XLA conv (fused epilogue, ~155 TF/s) vs the experimental
        # direct Pallas conv (kernels/conv_direct.py) — SURVEY §7 stretch goal
        def conv_ab(n, hw, cin, cout):
            x = arr(n, hw, hw, cin)
            w = arr(3, 3, cin, cout)
            b = jnp.zeros((cout,), jnp.float32)
            res = arr(n, hw, hw, cout)
            results = {}
            for backend in ("reference", "direct"):
                with ops.use_backends({"conv2d": backend}):
                    f = jax.jit(lambda *a: ops.dispatch(
                        "conv2d", *a, stride=1, padding=1,
                        residual=res, act="silu"))
                    results[backend] = bench_fn(f, x, w, b, chain_arg=0)
            r, p = results["reference"], results["direct"]
            flops = 2 * n * hw * hw * 9 * cin * cout
            print(f"conv2d      N{n} {hw}x{hw} {cin}->{cout} +bias+res+silu "
                  f"ref {r*1e3:8.3f}ms ({flops/r/1e12:5.1f} TF/s)  "
                  f"direct {p*1e3:8.3f}ms ({flops/p/1e12:5.1f} TF/s)  "
                  f"speedup {r/p:5.2f}x", flush=True)

        for n, hw, cin, cout in [(2, 128, 320, 320), (2, 64, 640, 640),
                                 (2, 32, 1280, 1280), (2, 128, 640, 640)]:
            conv_ab(n, hw, cin, cout)

    if which in (None, "gn_conv"):
        # GN+SiLU -> 3x3 conv+bias+res, the resnet hot PAIR: unfused (default
        # bf16apply GN + direct conv — two HBM round-trips at the boundary)
        # vs gn_conv2d="fused" (GN apply absorbed into the conv kernel's
        # input read, stats one XLA pass)
        def gnconv_ab(n, hw, cin, cout):
            x = arr(n, hw, hw, cin)
            g = jnp.ones(cin, jnp.float32)
            bta = jnp.zeros(cin, jnp.float32)
            w = arr(3, 3, cin, cout)
            b = jnp.zeros((cout,), jnp.float32)
            res = arr(n, hw, hw, cout)
            results = {}
            for backend in ("reference", "fused"):
                with ops.use_backends({"gn_conv2d": backend,
                                       "group_norm": "bf16apply",
                                       "conv2d": "direct"}):
                    f = jax.jit(lambda *a: ops.dispatch(
                        "gn_conv2d", *a, num_groups=32, gn_act="silu",
                        residual=res))
                    results[backend] = bench_fn(f, x, g, bta, w, b,
                                                chain_arg=0)
            r, p = results["reference"], results["fused"]
            flops = 2 * n * hw * hw * 9 * cin * cout
            print(f"gn_conv2d   N{n} {hw}x{hw} {cin}->{cout} gn+silu+bias+res "
                  f"unfused {r*1e3:8.3f}ms ({flops/r/1e12:5.1f} TF/s)  "
                  f"fused {p*1e3:8.3f}ms ({flops/p/1e12:5.1f} TF/s)  "
                  f"speedup {r/p:5.2f}x", flush=True)

        for n, hw, cin, cout in [(2, 128, 320, 320), (2, 64, 640, 640),
                                 (2, 32, 1280, 1280), (2, 128, 640, 640)]:
            gnconv_ab(n, hw, cin, cout)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
