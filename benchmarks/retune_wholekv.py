"""Measure the new whole-KV (bk = padded sk) configs for long self-attention
and merge any winners into the packaged tuned table.

Whole-KV blocks route the single-KV kernels: plain one-pass softmax, no
online rescale (alpha/m/l updates) at all. The full sweep already covers
bk <= 2048; this targets only the added bk == sk_cap configs, comparing
against the stored winners' t_us (same bench_fn methodology), so it runs in
minutes instead of re-sweeping everything.

    bash scripts/tpu_run.sh python -u benchmarks/retune_wholekv.py
"""

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


SELF_SHAPES = [
    # (b, s, h, d) long self-attention shapes with 2048 < sk_cap <= 4096
    (2, 4096, 10, 64), (4, 4096, 10, 64), (8, 4096, 10, 64),
    (2, 2304, 10, 64), (4, 2304, 10, 64), (8, 2304, 10, 64),
    (4, 4096, 8, 40),   # SD1.5 512^2 64^2-level (bh only: d !| 128)
]
BQS = (128, 256, 512)


def main():
    import jax
    import jax.numpy as jnp

    from stabletriton_tpu.kernels import autotune
    from stabletriton_tpu.kernels import flash_attention as fa
    from stabletriton_tpu.runtime.profiling import bench_fn

    rng = np.random.default_rng(0)
    updates = {}

    for b, s, h, d in SELF_SHAPES:
        sk_cap = fa.round_up(s, fa.LANES)
        x = jnp.asarray(
            rng.standard_normal((b, s, h * d), dtype=np.float32)
        ).astype(jnp.bfloat16)

        # --- split interface ---
        key = autotune.attention_key(b, s, s, h, d, jnp.bfloat16)
        cur = autotune.lookup(key) or {"t_us": float("inf")}
        best = dict(cur)
        for variant in autotune.attention_variants(s, s, h, d):
            for bq in BQS:
                try:
                    f = functools.partial(fa.flash_attention, num_heads=h,
                                          block_q=bq, block_k=sk_cap,
                                          variant=variant)
                    t = bench_fn(f, x, x, x, chain_arg=0) * 1e6
                except Exception:
                    continue
                print(f"  {key} {variant} bq={bq} bk={sk_cap}: {t:.1f}us "
                      f"(cur {cur['t_us']})", flush=True)
                if t < best["t_us"]:
                    best = {"block_q": bq, "block_k": sk_cap,
                            "t_us": round(t, 2), "variant": variant}
        if best != cur:
            updates[key] = best
            autotune.record(key, best, persist=False)
            print(f"  -> UPDATE {key}: {best}", flush=True)

        # --- fused qkv interface (same concat wrapper as the tuner) ---
        if not fa._can_pack(h * d, h, d):
            continue
        qkey = autotune.fused_attention_key("qkv", b, s, s, h, d, jnp.bfloat16)
        curq = autotune.lookup(qkey) or {"t_us": float("inf")}
        bestq = dict(curq)
        x3 = jnp.asarray(
            rng.standard_normal((b, s, 3 * h * d), dtype=np.float32)
        ).astype(jnp.bfloat16)
        for bq in BQS:
            core = functools.partial(fa.flash_attention_qkv, num_heads=h,
                                     block_q=bq, block_k=sk_cap)

            @jax.jit
            def g(a, core=core):
                o = core(a)
                return jnp.concatenate([o, o, o], axis=-1)

            try:
                t = bench_fn(g, x3, chain_arg=0) * 1e6
            except Exception:
                continue
            print(f"  {qkey} fused bq={bq} bk={sk_cap}: {t:.1f}us "
                  f"(cur {curq['t_us']})", flush=True)
            if t < bestq["t_us"]:
                bestq = {"impl": "fused", "block_q": bq, "block_k": sk_cap,
                         "t_us": round(t, 2)}
        if bestq != curq:
            updates[qkey] = bestq
            autotune.record(qkey, bestq, persist=False)
            print(f"  -> UPDATE {qkey}: {bestq}", flush=True)

    out = autotune._PACKAGED_DIR / f"{autotune.platform_tag()}.json"
    try:
        existing = json.loads(out.read_text())
    except (OSError, ValueError):
        existing = {}
    existing.update(updates)
    out.write_text(json.dumps(existing, indent=1, sort_keys=True))
    print(f"merged {len(updates)} updates into {out}", flush=True)


if __name__ == "__main__":
    main()
