"""Follow-up probe for the span lever (scripts/tune_span.py found span wins
at the incumbent block_q only): does a LARGER block_q stack with span at the
S=1024 32^2 self shape? Every candidate list INCLUDES the plain span=1
incumbent so the entry can only improve — the first version of this probe
omitted it and regressed the b2 entry to a losing span=2 config (fixed by
the heads-up lists below).

    bash scripts/tpu_run.sh python -u scripts/probe_span_bq.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax.numpy as jnp

    from stabletriton_tpu.kernels import autotune

    probes = [
        # (b, cands): plain incumbent first, then the span/bq variants that
        # won or placed in earlier processes
        (2, [(512, 1024, 1), (512, 1024, 2), (1024, 1024, 1),
             (512, 1024, 5)]),
        (1, [(256, 1024, 1), (256, 1024, 5), (512, 1024, 5),
             (512, 1024, 1)]),
    ]
    for b, cands in probes:
        key = autotune.fused_attention_key("qkv", b, 1024, 1024, 20, 64,
                                           jnp.bfloat16)
        print(f"--- {key} (incumbent {autotune.lookup(key)})", flush=True)
        best = autotune.tune_attention_fused(
            b, 1024, 1024, 20, 64, jnp.bfloat16, candidates=cands,
            include_split=False,
        )
        print(f"{key}: {best}", flush=True)


if __name__ == "__main__":
    main()
