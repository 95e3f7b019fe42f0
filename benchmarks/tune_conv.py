"""Tune the direct-conv dispatch table for every 3x3 conv the SDXL UNet
actually runs — shapes come from the ``conv_shapes_for_unet`` probe (an
abstract ``jax.eval_shape`` trace of the real model), not a hand-walked
list, so transition convs, skip-concat up-block inputs, conv_in/out and
upsamplers cannot be missed (VERDICT r4 #5). Winners (including the XLA
conv as a candidate — ``{"impl": "xla"}`` routes a losing shape back to the
reference conv) persist to the user cache per shape, so the sweep is
resumable; promote with ``python scripts/merge_tuned.py``.

Usage:
    bash scripts/tpu_run.sh python -u benchmarks/tune_conv.py \
        [gn] [force] [quick] [batch=1[,4]] [lat=128] [factors=2[,1]] [n=2]

``gn`` tunes the GN-apply-fused variant (``:gn`` keys) over the gn_conv2d
pair shapes instead of the plain conv shapes. ``force`` re-tunes shapes that
already have an entry. ``factors=2,1`` covers the CFG-doubled batch and the
cond-only (no-CFG / guidance-interval) branch. ``n=2`` restricts to shapes
with that leading batch dim (e.g. the CFG-doubled headline rows). ``quick``
(gn only) seeds the block_rows ladder from the plain winner instead of the
full power-of-two sweep — about half the compiles per shape.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    import jax.numpy as jnp

    from stabletriton_tpu.kernels import autotune
    from stabletriton_tpu.models.unet import sdxl_base_unet_config

    gn = "gn" in argv
    force = "force" in argv
    quick = "quick" in argv
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    batches = [int(b) for b in kv.get("batch", "1").split(",")]
    lat = int(kv.get("lat", "128"))
    factors = [int(f) for f in kv.get("factors", "2,1").split(",")]
    only_n = {int(x) for x in kv["n"].split(",")} if "n" in kv else None

    cfg = sdxl_base_unet_config()
    shapes = sorted({
        s
        for batch in batches
        for f in factors
        for s in autotune.conv_shapes_for_unet(cfg, lat, lat, batch,
                                               cfg_factor=f, gn_pairs=gn)
    })
    print(f"{len(shapes)} {'gn-pair' if gn else 'conv'} shapes at "
          f"lat={lat} batches={batches} factors={factors}", flush=True)

    done = skipped = failed = 0
    for n, h, w, cin, cout, has_res, act in shapes:
        if only_n is not None and n not in only_n:
            skipped += 1
            continue
        key = autotune.conv_key(n, h, w, cin, cout, jnp.bfloat16, has_res,
                                act, gn=gn)
        if not force and autotune.lookup(key) is not None:
            skipped += 1
            continue
        brs = None
        if quick and gn:
            # seed the gn ladder from the plain winner: the fused variant
            # shifts the optimum by at most one step (its f32 window temp
            # shrinks the fitting block), so {heuristic, winner, winner/2,
            # winner*2} covers it at half the compiles of the full ladder
            plain = autotune.lookup(autotune.conv_key(
                n, h, w, cin, cout, jnp.bfloat16, has_res, act))
            if plain and plain.get("halo") == "element":
                pb = plain.get("block_rows")
                brs = [None]
                if pb:
                    brs += [max(1, pb // 2), pb, min(h, pb * 2)]
                brs = list(dict.fromkeys(brs))
        try:
            best = autotune.tune_conv(n, h, w, cin, cout, has_res=has_res,
                                      act=act, gn=gn,
                                      block_rows_candidates=brs)
        except Exception as e:  # noqa: BLE001 — keep sweeping on a bad shape
            print(f"  FAILED {key}: {e}", flush=True)
            failed += 1
            continue
        done += 1
        print(f"{n}x{h}x{w} {cin}->{cout} res={has_res} act={act} "
              f"gn={gn}: {best}", flush=True)
    print(f"tuned {done}, skipped {skipped} (already tabled), "
          f"failed {failed}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
