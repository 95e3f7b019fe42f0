"""Round-4 GN-fusion step-level A/B in ONE process (remote compiles are
slow; batch measurements, print incrementally).

Legs: the round-4 default (direct conv, unfused GN) vs gn_conv2d="fused"
(GN apply + time-emb bias absorbed into the conv kernel — the unfused pair
pays HBM round-trips at the pallas boundary). BENCH-identical methodology
(bench_fn min-over-reps chained slope). Then the kernel-level gn_conv A/B
and the full-UNet deviation of the fused binding vs stock XLA.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

LEGS = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "pallas", "pallas:gn_conv2d=fused", "pallas",
]


def main():
    import bench

    lat = int(os.environ.get("BENCH_LATENT", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "12"))
    for leg in LEGS:
        s = bench._measure(leg, lat, steps)
        print(f"{leg}: {s*1e3:.2f} ms/step = {1.0/s:.3f} it/s", flush=True)

    if "--kernel" in sys.argv:
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                               / "benchmarks"))
        import kernel_bench

        kernel_bench.main("gn_conv")


if __name__ == "__main__":
    main()
