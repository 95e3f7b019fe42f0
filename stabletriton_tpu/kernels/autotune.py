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


def fused_attention_key(kind: str, b: int, sq: int, sk: int, h: int, d: int,
                        dtype) -> str:
    """Key for the fused-operand entry points (kind: 'qkv' | 'kv'). Tuned
    separately from the split interface: the winning config here is either
    the head-packed fused-direct kernel with specific blocks ({'impl':
    'fused', block_q, block_k}) or falling back to slice + flash_attention
    ({'impl': 'split'}, which then reads the attention: table)."""
    import jax.numpy as jnp

    return (f"attention_{kind}:b{b}:sq{sq}:sk{sk}:h{h}:d{d}:"
            f"{jnp.dtype(dtype).name}")


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
    if sk <= fa.LANES:
        # tiny-KV path needs the whole (padded) KV in one block
        bqs, bks = (128, 256, 512, 1024, 2048, 4096), (sk_cap,)
    else:
        # bk <= 256 measured uniformly 3-6x off the winner on v5e — not
        # worth the compiles; the heuristic pick above stays regardless.
        # Whole-KV (bk = padded sk) switches to the single-KV kernels: no
        # online-softmax rescale work at all — worth trying up to S=4096.
        bqs, bks = (256, 512, 1024, 2048, 4096), (512, 1024, 2048)
        if 2048 < sk_cap <= 4096:
            bks = bks + (sk_cap,)
    for bq in bqs:
        for bk in bks:
            cands.add((min(bq, sq_cap), min(bk, sk_cap)))
    return sorted((bq, bk) for bq, bk in cands
                  if not (sk <= fa.LANES and bk != sk_cap))


def attention_spans(sk: int, block_k: int, h: int, d: int) -> list[int]:
    """Span values worth measuring for a packed single-KV shape (1 = the
    classic one-head-group block). Spans widen blocks to span x 128 lanes so
    one program runs span x pack sub-head chains — the amortization lever for
    latency-bound small-grid shapes (S=1024: 40 cells of 152us vs ~30us
    floor). Only the single-KV kernels qualify (the online path's scratch
    and rescale state scale with span and measured nothing but VMEM
    pressure); candidates are the divisors of the head-group count, thinned
    to {2, groups//2, groups}."""
    from stabletriton_tpu.kernels import flash_attention as fa

    pack = fa.pack_factor(h, d)
    if pack <= 1 or block_k < fa.round_up(sk, fa.LANES):
        return [1]
    groups = h // pack
    cands = {1, 2, groups // 2, groups}
    return sorted(s for s in cands if s >= 1 and groups % s == 0)


def attention_variants(sq: int, sk: int, h: int, d: int) -> list[str | None]:
    """Kernel families worth measuring for a shape: the static default
    ('allheads' for tiny KV, 'bh' otherwise) plus head-packed when whole
    heads tile the 128-lane dim — for tiny KV the packed single-KV kernel
    competes with the all-heads kernel (full 128-lane tiles vs the 4D
    head-loop layout whose d-wide slices waste half the lanes)."""
    from stabletriton_tpu.kernels import flash_attention as fa

    can_pack = fa.pack_factor(h, d) > 1
    if sk <= fa.LANES:
        return ["allheads", "packed"] if can_pack else ["allheads"]
    return ["bh", "packed"] if can_pack else ["bh"]


def tune_attention(b: int, sq: int, sk: int, h: int, d: int, dtype=None,
                   persist: bool = True, verbose: bool = True) -> dict:
    """Measure candidates for one attention shape on the current device and
    record the winner. Returns the winning config."""
    import jax
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
            spans = (attention_spans(sk, bk, h, d)
                     if variant == "packed" else [1])
            for span in spans:
                try:
                    # jit: the kernel wrapper's Python-level reshapes would
                    # otherwise dispatch eagerly per call (see tune_conv note)
                    f = jax.jit(functools.partial(
                        flash_attention, num_heads=h, block_q=bq, block_k=bk,
                        variant=variant, span=span,
                    ))
                    t = bench_fn(f, q, k, v, chain_arg=0)
                except Exception:  # config doesn't compile/fit — skip
                    continue
                if verbose:
                    print(f"  [autotune] {key} {variant or '-'} bq={bq} "
                          f"bk={bk} span={span}: {t*1e6:.1f}us", flush=True)
                if best is None or t < best["t_us"] * 1e-6:
                    best = {"block_q": bq, "block_k": bk,
                            "t_us": round(t * 1e6, 2)}
                    if variant is not None:
                        best["variant"] = variant
                    if span > 1:
                        best["span"] = span
    if best is None:
        raise RuntimeError(f"no attention config compiled for {key}")
    record(key, best, persist=persist)
    return best


def tune_attention_fused(b: int, sq: int, sk: int, h: int, d: int, dtype=None,
                         persist: bool = True, verbose: bool = True,
                         candidates: list | None = None,
                         include_split: bool = True) -> dict:
    """Tune one fused-operand attention shape: the head-packed fused-direct
    kernel across block configs vs the split fallback (slice +
    flash_attention, which itself uses the attention: table). Records the
    winner under fused_attention_key. Measures EXACTLY what the UNet
    dispatches — the split-interface table can't see the slice-copy and
    concat glue that differs between the two. ``candidates`` overrides the
    full (block_q, block_k, span) enumeration with an explicit list (targeted
    re-tunes: seed with the current winner so the entry can only improve);
    ``include_split=False`` skips the split-fallback baseline compile."""
    import jax.numpy as jnp
    import numpy as np

    from stabletriton_tpu.kernels import flash_attention as fa
    from stabletriton_tpu.runtime.profiling import bench_fn

    dtype = jnp.bfloat16 if dtype is None else dtype
    kind = "qkv" if sq == sk else "kv"
    key = fused_attention_key(kind, b, sq, sk, h, d, dtype)
    rng = np.random.default_rng(0)

    def mk(s, mult):
        return jnp.asarray(
            rng.standard_normal((b, s, mult * h * d), dtype=np.float32)
        ).astype(dtype)

    if kind == "qkv":
        ops_args = (mk(sq, 3),)
        entry = fa.flash_attention_qkv

        # bench_fn chains output back into arg 0, so the benched callable
        # must be shape-preserving: (B,S,3C)->(B,S,C) is not. Wrap every
        # candidate (fused AND split) in the same out->3C concat — a
        # constant additive cost, so the ranking is untouched.
        def wrap(core):
            import jax

            @jax.jit
            def g(x3):
                o = core(x3)
                return jnp.concatenate([o, o, o], axis=-1)

            return g
    else:
        ops_args = (mk(sq, 1), mk(sk, 2))
        entry = fa.flash_attention_kv

        def wrap(core):
            return core  # chains through q: (B,Sq,C)->(B,Sq,C)

    best = None
    if fa.pack_factor(h, d) > 1:
        cand_iter = (candidates if candidates is not None else
                     [(bq, bk, span)
                      for bq, bk in attention_candidates(
                          sq, sk, h, d, jnp.dtype(dtype).itemsize)
                      for span in attention_spans(sk, bk, h, d)])
        for bq, bk, span in cand_iter:
            try:
                f = wrap(functools.partial(entry, num_heads=h,
                                           block_q=bq, block_k=bk,
                                           span=span))
                t = bench_fn(f, *ops_args, chain_arg=0)
            except Exception:
                continue
            if verbose:
                print(f"  [autotune] {key} fused bq={bq} bk={bk} "
                      f"span={span}: {t*1e6:.1f}us", flush=True)
            if best is None or t < best["t_us"] * 1e-6:
                best = {"impl": "fused", "block_q": bq, "block_k": bk,
                        "t_us": round(t * 1e6, 2)}
                if span > 1:
                    best["span"] = span

    # the split fallback competes as one candidate (blocks/variant come from
    # the attention: table inside flash_attention)
    def split_call(*a):
        if kind == "qkv":
            q, k, v = jnp.split(a[0], 3, axis=-1)
        else:
            q = a[0]
            k, v = jnp.split(a[1], 2, axis=-1)
        return fa.flash_attention(q, k, v, num_heads=h)

    if include_split or best is None:
        t = bench_fn(wrap(split_call), *ops_args, chain_arg=0)
        if verbose:
            print(f"  [autotune] {key} split: {t*1e6:.1f}us", flush=True)
        if best is None or t < best["t_us"] * 1e-6:
            best = {"impl": "split", "t_us": round(t * 1e6, 2)}
    record(key, best, persist=persist)
    return best


def attention_shapes_for_unet(cfg, lat_h: int, lat_w: int, batch: int,
                              ctx_len: int = 77, cfg_factor: int = 2,
                              ) -> list[tuple[int, int, int, int, int]]:
    """Every (b, sq, sk, h, d) the UNet dispatches at this signature: one
    self + one cross shape per attention level. ``cfg_factor=2`` is the
    classic CFG-doubled batch; the no-CFG / guidance-interval cond-only
    branches dispatch at ``cfg_factor=1``."""
    shapes = set()
    b = cfg_factor * batch
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


def conv_key(n: int, h: int, w: int, cin: int, cout: int, dtype,
             has_res: bool, act, gn: bool = False) -> str:
    """``gn=True`` keys the GN-apply-fused variant separately (its in-kernel
    f32 window temp shifts the block_rows optimum); the suffix is appended
    only when set, so pre-existing non-gn table entries stay valid."""
    import jax.numpy as jnp

    base = (f"conv3x3:n{n}:h{h}:w{w}:ci{cin}:co{cout}:"
            f"{jnp.dtype(dtype).name}:res{int(bool(has_res))}:{act or '-'}")
    return base + ":gn" if gn else base


def conv_block_rows_candidates(h: int) -> list[int | None]:
    """block_rows values worth measuring for a direct-conv shape: the VMEM
    heuristic (None — usually the largest fitting block) plus a power-of-two
    ladder capped at 32 (the 1024^2 probe showed >=32 explicit rows always
    losing to the ladder minimum; values that fail to compile are skipped)."""
    cands: list[int | None] = [None]
    br = 1
    while br <= min(h, 32):
        cands.append(br)
        br *= 2
    return cands


def conv_shapes_for_unet(cfg, lat_h: int, lat_w: int, batch: int,
                         cfg_factor: int = 2, gn_pairs: bool = False,
                         ) -> list[tuple[int, int, int, int, int, bool, object]]:
    """Every 3x3 stride-1 SAME conv shape the UNet dispatches at this
    signature, as (n, h, w, cin, cout, has_res, act) tuples — recorded by
    tracing ``unet_apply`` abstractly (jax.eval_shape costs no FLOPs and no
    real params) under a shape-probe conv binding, so transition convs,
    skip-concat up-block inputs, conv_in/out and upsamplers can never be
    missed by hand-walked topology math. ``cfg_factor=2`` is the classic
    CFG-doubled batch; 1 covers no-CFG / guidance-interval cond-only rows.
    ``gn_pairs=True`` records only the convs dispatched through the
    ``gn_conv2d`` pair op (the shapes the fused-GN ``:gn`` table keys need)."""
    import jax
    import jax.numpy as jnp

    from stabletriton_tpu import ops
    from stabletriton_tpu.models import unet as unet_mod
    from stabletriton_tpu.ops import reference
    from stabletriton_tpu.ops.registry import _REGISTRY

    shapes: set = set()

    def probe(x, w, b=None, *, stride=1, padding=1, residual=None, act=None):
        if (not isinstance(w, tuple) and getattr(w, "ndim", 0) == 4
                and w.shape[:2] == (3, 3) and stride == 1 and padding == 1):
            shapes.add((int(x.shape[0]), int(x.shape[1]), int(x.shape[2]),
                        int(w.shape[2]), int(w.shape[3]),
                        residual is not None, act))
        return reference.conv2d(x, w, b, stride=stride, padding=padding,
                                residual=residual, act=act)

    def gn_probe(x, gamma, beta, w, b=None, *, num_groups=32, eps=1e-5,
                 gn_act="silu", stride=1, padding=1, residual=None, act=None):
        probe(x, w, b, stride=stride, padding=padding, residual=residual,
              act=act)
        return reference.gn_conv2d(x, gamma, beta, w, b,
                                   num_groups=num_groups, eps=eps,
                                   gn_act=gn_act, stride=stride,
                                   padding=padding, residual=residual,
                                   act=act)

    if gn_pairs:
        _REGISTRY.setdefault("gn_conv2d", {})["_shape_probe"] = gn_probe
        binding = {"conv2d": "reference", "gn_conv2d": "_shape_probe"}
    else:
        _REGISTRY.setdefault("conv2d", {})["_shape_probe"] = probe
        # gn_conv2d composes through the conv2d binding, so the probe
        # sees the resnet pairs' convs exactly as dispatched
        binding = {"conv2d": "_shape_probe", "gn_conv2d": "reference"}
    try:
        b = cfg_factor * batch
        params = jax.eval_shape(
            lambda: unet_mod.init_unet_params(cfg, 0, dtype=jnp.bfloat16))
        S = jax.ShapeDtypeStruct

        def run(p, sample, t, ctx, te, ti):
            with ops.use_backends(binding):
                return unet_mod.unet_apply(cfg, p, sample, t, ctx, te, ti)

        jax.eval_shape(
            run, params,
            S((b, lat_h, lat_w, cfg.in_channels), jnp.bfloat16),
            S((b,), jnp.float32),
            S((b, 77, cfg.cross_attention_dim), jnp.bfloat16),
            S((b, 1280), jnp.bfloat16),
            S((b, 6), jnp.float32),
        )
    finally:
        _REGISTRY["gn_conv2d" if gn_pairs else "conv2d"].pop(
            "_shape_probe", None)
    return sorted(shapes, key=lambda s: (s[:5], s[5], str(s[6])))


def ensure_conv_tuned(cfg, lat_h: int, lat_w: int, batch: int, dtype=None,
                      cfg_factors: tuple[int, ...] = (2,)) -> None:
    """Tune any direct-conv shape of this signature with no table entry —
    the conv twin of ``ensure_attention_tuned``, called from the pipeline's
    measure-before-trace hook (runtime/pipeline._build)."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype is None else dtype
    shapes = sorted({
        s for f in cfg_factors
        for s in conv_shapes_for_unet(cfg, lat_h, lat_w, batch, cfg_factor=f)
    })
    for n, h, w, cin, cout, has_res, act in shapes:
        if lookup(conv_key(n, h, w, cin, cout, dtype, has_res, act)) is None:
            tune_conv(n, h, w, cin, cout, dtype, has_res=has_res, act=act)


def tune_conv(n: int, h: int, w: int, cin: int, cout: int, dtype=None,
              has_res: bool = True, act: str | None = "silu",
              gn: bool = False, persist: bool = True,
              verbose: bool = True,
              block_rows_candidates: list | None = None) -> dict:
    """Measure block_rows candidates for one direct-conv shape
    (kernels/conv_direct.py) and record the winner. The measured callable is
    the whole conv3x3_direct (op-level splits included — block_rows
    propagates to every leaf pallas_call). ``gn=True`` tunes the
    GN-apply-fused variant (element halo only) under its own ``:gn`` key;
    the fixed stats pass is excluded — only the kernel depends on
    block_rows."""
    import functools as _ft

    import jax.numpy as jnp
    import numpy as np

    from stabletriton_tpu.kernels.conv_direct import _gn_fold, conv3x3_direct
    from stabletriton_tpu.runtime.profiling import bench_fn

    dtype = jnp.bfloat16 if dtype is None else dtype
    key = conv_key(n, h, w, cin, cout, dtype, has_res, act, gn)
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32)).astype(dtype)

    x = arr(n, h, w, cin)
    wt = arr(3, 3, cin, cout)
    b = jnp.zeros((cout,), jnp.float32)
    res = arr(n, h, w, cout) if has_res else None
    gn_kw = {}
    if gn:
        # the hot pair is GN+SiLU -> conv (epilogue act rides ``act``)
        gs, gsh = _gn_fold(x, jnp.ones(cin, jnp.float32),
                           jnp.zeros(cin, jnp.float32), 32, 1e-5)
        gn_kw = {"gn_scale": gs, "gn_shift": gsh, "gn_act": "silu"}
    best = None
    # element gets the full block_rows ladder; views (the 3-shifted-copies
    # escape hatch, ~3x input HBM) competes only at its VMEM-heuristic block
    # — the probe sweeps showed its ladder never beating its own heuristic
    # by more than noise while tripling the tuning wall-clock
    halo_plans = (("element", block_rows_candidates
                   if block_rows_candidates is not None
                   else conv_block_rows_candidates(h)),)
    if not gn:  # views cannot host the fused GN apply
        halo_plans += (("views", [None]),)
    import jax as _jax

    def _chained(core):
        """Make the measured callable shape-preserving so bench_fn can chain
        its output back into arg 0 (x when square, the residual when the
        shapes allow, else a channel slice/tile adapter whose constant cost
        is identical across candidates — the ranking is untouched)."""
        if cin == cout:
            return _jax.jit(lambda xx: core(xx, res)), (x,)
        if has_res:
            return _jax.jit(lambda rr: core(x, rr)), (res,)

        def adapted(xx):
            o = core(xx, None)
            if cout >= cin:
                return o[..., :cin]
            reps = -(-cin // cout)
            return jnp.tile(o, (1, 1, 1, reps))[..., :cin]

        return _jax.jit(adapted), (x,)

    for halo, brs in halo_plans:
        for br in brs:
            # jit the candidate: the op-split plans (32x32x1280 etc.) are a
            # Python composition of several pallas_calls + slices whose
            # per-call EAGER dispatch over the tunnel dwarfs the kernel
            # (measured 6-12 ms vs the jitted 0.4 ms) and scales with chain
            # length, so the slope does NOT cancel it
            core = _ft.partial(
                lambda xx, rr, _br, _ha: conv3x3_direct(
                    xx, wt, b, residual=rr, act=act, block_rows=_br,
                    halo=_ha, **gn_kw),
                _br=br, _ha=halo)
            f, chain_args = _chained(core)
            try:
                t = bench_fn(f, *chain_args, chain_arg=0)
            except Exception:  # config doesn't compile/fit — skip
                continue
            if verbose:
                print(f"  [autotune] {key} halo={halo} block_rows={br}: "
                      f"{t*1e6:.1f}us", flush=True)
            if best is None or t < best["t_us"] * 1e-6:
                best = {"t_us": round(t * 1e6, 2), "halo": halo}
                if br is not None:
                    best["block_rows"] = br

    # the XLA conv competes as one candidate: shapes the direct kernel cannot
    # win (cin=4 conv_in, N1 cond-only rows, wide VAE maps) record
    # {"impl": "xla"} and conv3x3_direct routes them back to the XLA path.
    # For gn=True the comparable program includes the GN apply the fused
    # kernel absorbs (the unfused pair's real cost).
    from stabletriton_tpu.ops import reference as _ref

    def xla_core(xx, rr):
        if gn:
            gs, gsh = gn_kw["gn_scale"], gn_kw["gn_shift"]
            xn = xx.astype(jnp.float32) * gs[:, None, None, :] \
                + gsh[:, None, None, :]
            xn = (xn * _jax.nn.sigmoid(xn)).astype(xx.dtype)  # silu
            xx = xn
        return _ref.conv2d(xx, wt, b, stride=1, padding=1,
                           residual=rr, act=act)

    f, chain_args = _chained(xla_core)
    try:
        t = bench_fn(f, *chain_args, chain_arg=0)
        if verbose:
            print(f"  [autotune] {key} xla: {t*1e6:.1f}us", flush=True)
        if best is None or t < best["t_us"] * 1e-6:
            best = {"impl": "xla", "t_us": round(t * 1e6, 2)}
    except Exception:
        pass
    if best is None:
        raise RuntimeError(f"no conv config compiled for {key}")
    record(key, best, persist=persist)
    return best


def ensure_attention_tuned(cfg, lat_h: int, lat_w: int, batch: int,
                           dtype=None, ctx_len: int = 77,
                           cfg_factors: tuple[int, ...] = (2,)) -> None:
    """Tune any attention shape of this signature that has no table entry.

    Tunes the split interface first (the fused tuner's split candidate and
    every fallback path read that table), then the fused-operand entry
    points the UNet actually dispatches. ``cfg_factors``: which UNet batch
    multiples the program traces — (2,) for classic CFG, (1,) for no-CFG,
    (1, 2) when a guidance interval makes both branches live."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype is None else dtype
    shapes = sorted({
        s for f in cfg_factors
        for s in attention_shapes_for_unet(cfg, lat_h, lat_w, batch,
                                           ctx_len, cfg_factor=f)
    })
    for b, sq, sk, h, d in shapes:
        if lookup(attention_key(b, sq, sk, h, d, dtype)) is None:
            tune_attention(b, sq, sk, h, d, dtype)
    for b, sq, sk, h, d in shapes:
        kind = "qkv" if sq == sk else "kv"
        if lookup(fused_attention_key(kind, b, sq, sk, h, d, dtype)) is None:
            tune_attention_fused(b, sq, sk, h, d, dtype)


def autotune_enabled() -> bool:
    return os.environ.get("ST_TPU_AUTOTUNE", "") not in ("", "0")
