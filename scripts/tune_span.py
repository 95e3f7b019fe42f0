"""Targeted span re-tune for the fused attention entries the SDXL UNet
dispatches (kernels/flash_attention._norm_span): for each shape, bench the
CURRENT tuned winner as the baseline plus its span variants (blocks spanning
several 128-lane head-groups per program — the grid-amortization lever for
the latency-bound S=1024 single-KV shape: 40 programs of 152us vs a ~30us
floor, round-4 verdict item #4). Entries can only improve: the incumbent
config is always a candidate, and the split fallback is re-benched only when
it currently holds the entry.

For shapes whose winner is the online-softmax path (block_k < padded sk),
whole-KV span variants (block_k = sk_cap) also compete — span only pays on
the single-KV kernels.

    bash scripts/tpu_run.sh python -u scripts/tune_span.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax.numpy as jnp

    from stabletriton_tpu.kernels import autotune
    from stabletriton_tpu.kernels import flash_attention as fa

    # (kind, b, sq, sk, h, d): every fused dispatch of the SDXL UNet at
    # 1024^2 with attention levels 64^2 (h=10) and 32^2 (h=20), both the
    # CFG-doubled (b=2) and cond-only (b=1) branches
    shapes = [
        ("qkv", 2, 1024, 1024, 20, 64),
        ("qkv", 1, 1024, 1024, 20, 64),
        ("qkv", 2, 4096, 4096, 10, 64),
        ("qkv", 1, 4096, 4096, 10, 64),
        ("kv", 2, 1024, 77, 20, 64),
        ("kv", 1, 1024, 77, 20, 64),
        ("kv", 2, 4096, 77, 10, 64),
        ("kv", 1, 4096, 77, 10, 64),
    ]
    for kind, b, sq, sk, h, d in shapes:
        key = autotune.fused_attention_key(kind, b, sq, sk, h, d,
                                           jnp.bfloat16)
        tuned = autotune.lookup(key) or {}
        sk_cap = fa.round_up(sk, fa.LANES)
        if tuned.get("impl") == "fused":
            bq, bk = int(tuned["block_q"]), int(tuned["block_k"])
        else:
            bq, bk = autotune.attention_candidates(
                sq, sk, h, d, 2)[0]
        cands = {(bq, bk, 1)}
        for span in autotune.attention_spans(sk, bk, h, d):
            cands.add((bq, bk, span))
        if bk < sk_cap and sk_cap <= 4096:
            # online winner: whole-KV span variants compete too
            for span in autotune.attention_spans(sk, sk_cap, h, d):
                cands.add((bq, sk_cap, span))
        print(f"--- {key} (incumbent {tuned or 'none'})", flush=True)
        best = autotune.tune_attention_fused(
            b, sq, sk, h, d, jnp.bfloat16, candidates=sorted(cands),
            include_split=tuned.get("impl") == "split" or not tuned,
        )
        print(f"{key}: {best}", flush=True)


if __name__ == "__main__":
    main()
