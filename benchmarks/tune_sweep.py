"""Produce the packaged per-shape attention block table on real hardware.

Sweeps the candidate block configs for every attention shape of the standard
benchmark signatures (SDXL 1024²/768² batch 1-4, SD1.5 512²) plus any extra
shapes given on the command line, then writes the winners into the packaged
table ``stabletriton_tpu/kernels/tuned/<platform>.json`` (commit it).

    python benchmarks/tune_sweep.py                  # standard shapes
    python benchmarks/tune_sweep.py 2,4096,4096,10,64  # extra b,sq,sk,h,d
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(extra_shapes):
    from stabletriton_tpu.kernels import autotune
    from stabletriton_tpu.models.unet import (
        sd15_unet_config,
        sd21_unet_config,
        sdxl_base_unet_config,
        sdxl_refiner_unet_config,
    )

    platform = autotune.platform_tag()
    shapes = set()
    sdxl = sdxl_base_unet_config()
    for batch in (1, 2, 4):
        shapes.update(autotune.attention_shapes_for_unet(sdxl, 128, 128, batch))
        shapes.update(autotune.attention_shapes_for_unet(sdxl, 96, 96, batch))
    shapes.update(autotune.attention_shapes_for_unet(sd15_unet_config(), 64, 64, 2))
    shapes.update(autotune.attention_shapes_for_unet(sd21_unet_config(), 96, 96, 2))
    shapes.update(
        autotune.attention_shapes_for_unet(sdxl_refiner_unet_config(), 128, 128, 1))
    shapes.update(extra_shapes)

    import os

    force = os.environ.get("ST_TUNE_FORCE", "")  # substring match re-tunes
    results = {}
    for b, sq, sk, h, d in sorted(shapes):
        key = autotune.attention_key(b, sq, sk, h, d, "bfloat16")
        if autotune.lookup(key) is not None and not (force and force in key):
            print(f"skip (tuned) {key}", flush=True)
            continue
        print(f"tuning {key} ...", flush=True)
        best = autotune.tune_attention(b, sq, sk, h, d, persist=False)
        results[key] = best
        # make the entry visible to the fused sweep's split candidate below
        autotune.record(key, best, persist=False)
        print(f"  -> {best}", flush=True)

    # fused-operand entry points (what the UNet actually dispatches)
    for b, sq, sk, h, d in sorted(shapes):
        kind = "qkv" if sq == sk else "kv"
        key = autotune.fused_attention_key(kind, b, sq, sk, h, d, "bfloat16")
        if autotune.lookup(key) is not None and not (force and force in key):
            print(f"skip (tuned) {key}", flush=True)
            continue
        print(f"tuning {key} ...", flush=True)
        best = autotune.tune_attention_fused(b, sq, sk, h, d, persist=False)
        results[key] = best
        autotune.record(key, best, persist=False)
        print(f"  -> {best}", flush=True)

    out = autotune._PACKAGED_DIR / f"{platform}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        existing = json.loads(out.read_text())
    except (OSError, ValueError):
        existing = {}
    existing.update(results)
    out.write_text(json.dumps(existing, indent=1, sort_keys=True))
    print(f"wrote {len(results)} entries to {out}")


if __name__ == "__main__":
    extra = []
    for arg in sys.argv[1:]:
        extra.append(tuple(int(x) for x in arg.split(",")))
    main(extra)
