"""Tune direct-conv block_rows for the SDXL UNet hot shapes and merge the
winners into the user cache (kernels/autotune.py tune_conv; promote to the
packaged table by copying entries into kernels/tuned/<platform>.json).

The UNet's convs run with act=None (GN+SiLU precedes them) and residual only
on each resnet's conv2, so both variants are tuned per shape. Usage:

    bash scripts/tpu_run.sh python -u benchmarks/tune_conv.py [probe]

"probe" tunes only the three dominant square shapes (quick payoff check);
"gn" additionally tunes the GN-apply-fused variant (``:gn`` keys) for every
shape — the resnet pair dispatches those when gn_conv2d binds to "fused".
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


# (n, h, w, cin, cout) at 1024^2, CFG batch 2; the N1 rows cover the
# cond-only branches (no-CFG / guidance-interval) that dispatch at batch 1
SQUARE = [
    (2, 128, 128, 320, 320),
    (2, 64, 64, 640, 640),
    (2, 32, 32, 1280, 1280),
    (1, 128, 128, 320, 320),
    (1, 64, 64, 640, 640),
    (1, 32, 32, 1280, 1280),
]
TRANSITIONS = [
    (2, 64, 64, 320, 640),     # down level-1 resnet conv1
    (2, 32, 32, 640, 1280),    # down level-2 resnet conv1
    (2, 32, 32, 2560, 1280),   # up level-2 concat resnet conv1
    (2, 32, 32, 1920, 1280),
    (2, 64, 64, 1920, 640),
    (2, 64, 64, 1280, 640),
    (2, 64, 64, 960, 640),
    (2, 128, 128, 960, 320),
    (2, 128, 128, 640, 320),
    (2, 64, 64, 1280, 1280),   # upsample conv (64^2 after resize)
    (2, 128, 128, 640, 640),   # upsample conv (128^2 after resize)
]


def main(probe: bool, gn: bool = False):
    from stabletriton_tpu.kernels import autotune

    shapes = SQUARE if probe else SQUARE + TRANSITIONS
    for n, h, w, cin, cout in shapes:
        for has_res in ((False, True) if cin == cout else (True,)):
            # non-square convs chain through the residual (bench_fn needs a
            # same-shaped operand); UNet conv1s are non-residual but the
            # block_rows winner is residual-insensitive (same tiles + one
            # extra input stream), so the res=True entry stands in
            for gn_flag in ((False, True) if gn else (False,)):
                try:
                    best = autotune.tune_conv(n, h, w, cin, cout,
                                              has_res=has_res, act=None,
                                              gn=gn_flag)
                except Exception as e:  # noqa: BLE001
                    print(f"  tune_conv {n}x{h}x{w} {cin}->{cout} "
                          f"res={has_res} gn={gn_flag} FAILED: {e}",
                          flush=True)
                    continue
                print(f"{n}x{h}x{w} {cin}->{cout} res={has_res} "
                      f"gn={gn_flag}: {best}", flush=True)
                if cin != cout:
                    # the UNet dispatches non-square conv1s WITHOUT residual;
                    # mirror the winner under the res=False key it will look
                    # up
                    import jax.numpy as jnp

                    autotune.record(
                        autotune.conv_key(n, h, w, cin, cout, jnp.bfloat16,
                                          False, None, gn_flag), best)


if __name__ == "__main__":
    main(probe="probe" in sys.argv[1:], gn="gn" in sys.argv[1:])
