"""Per-shape kernel autotuning with a persistent cache.

The reference autotunes its Triton GEMM over ~58 configs at kernel-launch time
(reference ``src/stabletriton/kernels/linear.py:38-63``) and ships tuned
warp/block tables for attention (``attention_fa2.py:113-127``). The TPU analog
can't measure *inside* a jit trace, so tuning is split:

  * **lookup at trace time** — ``flash_attention`` consults the table for its
    exact (b, sq, sk, h, d, dtype) before falling back to the static v5e
    heuristic (``_pick_blocks``);
  * **measure ahead of trace** — ``tune_attention`` benchmarks the candidate
    block configs standalone (chained-slope timing, runtime/profiling) and
    records the winner; ``ensure_attention_tuned`` enumerates every attention
    shape a (UNet config, resolution, batch) will dispatch and tunes the
    missing ones. Set ``ST_TPU_AUTOTUNE=1`` to let the pipeline do this
    automatically before compiling a new signature.

Two-layer store: a packaged table checked into the repo
(``kernels/tuned/<platform>.json``, produced on real hardware by
``benchmarks/tune_sweep.py``) plus a writable user cache
(``$ST_TPU_AUTOTUNE_CACHE`` or ``~/.cache/stabletriton_tpu/<platform>.json``).
User entries override packaged ones.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import threading

_LOCK = threading.Lock()
_TABLES: dict[str, dict] = {}  # platform -> {op_key: config}
_PACKAGED_DIR = pathlib.Path(__file__).parent / "tuned"


def platform_tag() -> str:
    """Stable identifier for the tuned table, e.g. 'tpu_v5_lite' / 'cpu'."""
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return "cpu"
    return str(kind).lower().replace(" ", "_").replace("-", "_")


def _user_cache_path(platform: str) -> pathlib.Path:
    env = os.environ.get("ST_TPU_AUTOTUNE_CACHE")
    if env:
        return pathlib.Path(env)
    return pathlib.Path.home() / ".cache" / "stabletriton_tpu" / f"{platform}.json"


def _load_table(platform: str) -> dict:
    with _LOCK:
        tbl = _TABLES.get(platform)
        if tbl is not None:
            return tbl
        tbl = {}
        packaged = _PACKAGED_DIR / f"{platform}.json"
        for path in (packaged, _user_cache_path(platform)):
            try:
                tbl.update(json.loads(path.read_text()))
            except (OSError, ValueError):
                pass
        _TABLES[platform] = tbl
        return tbl


def attention_key(b: int, sq: int, sk: int, h: int, d: int, dtype) -> str:
    import jax.numpy as jnp

    return f"attention:b{b}:sq{sq}:sk{sk}:h{h}:d{d}:{jnp.dtype(dtype).name}"


def lookup(key: str, platform: str | None = None) -> dict | None:
    return _load_table(platform or platform_tag()).get(key)


def record(key: str, config: dict, platform: str | None = None,
           persist: bool = True) -> None:
    platform = platform or platform_tag()
    tbl = _load_table(platform)
    with _LOCK:
        tbl[key] = config
        if persist:
            path = _user_cache_path(platform)
            path.parent.mkdir(parents=True, exist_ok=True)
            # merge-with-existing so concurrent tuners don't clobber each other
            try:
                existing = json.loads(path.read_text())
            except (OSError, ValueError):
                existing = {}
            existing[key] = config
            path.write_text(json.dumps(existing, indent=1, sort_keys=True))


def attention_candidates(sq: int, sk: int, h: int, d: int,
                         itemsize: int) -> list[tuple[int, int]]:
    """Block configs worth measuring for a shape: the static heuristic's pick
    plus a clamped power-of-two neighborhood (the kernel re-validates VMEM
    fit itself; configs that fail to compile are skipped by the tuner)."""
    from stabletriton_tpu.kernels import flash_attention as fa

    sq_cap = fa.round_up(sq, 8)
    sk_cap = fa.round_up(sk, fa.LANES)
    cands = {fa._pick_blocks(sq, sk, h, d, itemsize)}
    for bq in (128, 256, 512, 1024, 2048, 4096):
        for bk in (128, 256, 512, 1024, 2048):
            cands.add((min(bq, sq_cap), min(bk, sk_cap)))
    # tiny-KV path needs the whole (padded) KV in one block
    return sorted((bq, bk) for bq, bk in cands
                  if not (sk <= fa.LANES and bk != sk_cap))


def attention_variants(sq: int, sk: int, h: int, d: int) -> list[str | None]:
    """Kernel families worth measuring for a shape: the BH-major default plus
    head-packed when whole heads tile the 128-lane dim (tiny-KV shapes take
    the all-heads path regardless — no variant choice there)."""
    from stabletriton_tpu.kernels import flash_attention as fa

    if sk <= fa.LANES:
        return [None]
    pack = fa.LANES // d if (d <= fa.LANES and fa.LANES % d == 0) else 1
    if pack > 1 and h % pack == 0:
        return ["bh", "packed"]
    return ["bh"]


def tune_attention(b: int, sq: int, sk: int, h: int, d: int, dtype=None,
                   persist: bool = True, verbose: bool = True) -> dict:
    """Measure candidates for one attention shape on the current device and
    record the winner. Returns the winning config."""
    import jax.numpy as jnp
    import numpy as np

    from stabletriton_tpu.kernels.flash_attention import flash_attention
    from stabletriton_tpu.runtime.profiling import bench_fn

    dtype = jnp.bfloat16 if dtype is None else dtype
    key = attention_key(b, sq, sk, h, d, dtype)
    rng = np.random.default_rng(0)

    def mk(s):
        return jnp.asarray(
            rng.standard_normal((b, s, h * d), dtype=np.float32)
        ).astype(dtype)

    q, k, v = mk(sq), mk(sk), mk(sk)
    best = None
    for variant in attention_variants(sq, sk, h, d):
        for bq, bk in attention_candidates(sq, sk, h, d,
                                           jnp.dtype(dtype).itemsize):
            try:
                f = functools.partial(
                    flash_attention, num_heads=h, block_q=bq, block_k=bk,
                    variant=variant,
                )
                t = bench_fn(f, q, k, v, chain_arg=0)
            except Exception:  # config doesn't compile/fit — skip
                continue
            if verbose:
                print(f"  [autotune] {key} {variant or '-'} bq={bq} bk={bk}: "
                      f"{t*1e6:.1f}us", flush=True)
            if best is None or t < best["t_us"] * 1e-6:
                best = {"block_q": bq, "block_k": bk,
                        "t_us": round(t * 1e6, 2)}
                if variant is not None:
                    best["variant"] = variant
    if best is None:
        raise RuntimeError(f"no attention config compiled for {key}")
    record(key, best, persist=persist)
    return best


def attention_shapes_for_unet(cfg, lat_h: int, lat_w: int, batch: int,
                              ctx_len: int = 77) -> list[tuple[int, int, int, int, int]]:
    """Every (b, sq, sk, h, d) the UNet dispatches at this signature: one
    self + one cross shape per attention level (CFG doubles the batch)."""
    shapes = set()
    b = 2 * batch
    h_, w_ = lat_h, lat_w
    for i, btype in enumerate(cfg.down_block_types):
        ch = cfg.block_out_channels[i]
        if btype == "CrossAttnDownBlock2D":
            heads = cfg.num_heads(ch)
            d = ch // heads
            s = h_ * w_
            shapes.add((b, s, s, heads, d))
            shapes.add((b, s, ctx_len, heads, d))
        if i < len(cfg.block_out_channels) - 1:
            h_, w_ = h_ // 2, w_ // 2
    # mid block (always has one attention stack) runs at the innermost
    # resolution with the last channel width; the up path mirrors the down
    # shapes so the set above already covers it
    ch = cfg.block_out_channels[-1]
    heads = cfg.num_heads(ch)
    d = ch // heads
    s = h_ * w_
    shapes.add((b, s, s, heads, d))
    shapes.add((b, s, ctx_len, heads, d))
    return sorted(shapes)


def ensure_attention_tuned(cfg, lat_h: int, lat_w: int, batch: int,
                           dtype=None, ctx_len: int = 77) -> None:
    """Tune any attention shape of this signature that has no table entry."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype is None else dtype
    for b, sq, sk, h, d in attention_shapes_for_unet(cfg, lat_h, lat_w, batch,
                                                     ctx_len):
        if lookup(attention_key(b, sq, sk, h, d, dtype)) is None:
            tune_attention(b, sq, sk, h, d, dtype)


def autotune_enabled() -> bool:
    return os.environ.get("ST_TPU_AUTOTUNE", "") not in ("", "0")
