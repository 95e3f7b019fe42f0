"""Direct 3x3 Pallas conv with fused bias+residual+activation.

The SURVEY §7 stretch goal, done the honest keep-or-kill way: the reference
tried three custom convs and recorded the failure (reference
``src/stabletriton/kernels/Conv_Kernels/conv_implicit_gemm.py``,
``Conv_Kernels/README.md`` — "~40x slower"); this repo's baseline conv path is
XLA's TPU conv with the bias+residual+act epilogue fused by XLA
(ops/reference.conv2d). Measured on the v5e (benchmarks/kernel_bench.py conv):
this kernel BEATS that baseline at the SDXL resnet hot shapes — 1.23x at
128^2 x320, 1.38x at 64^2 x640 — see NOTES.md for the keep-or-kill record and
the default-binding decision. It is deliberately narrow: 3x3, stride 1, SAME
padding, NHWC/HWIO — the SDXL resnet hot shape; everything else falls back to
the XLA path.

Design (TPU-native, not im2col): a 3x3 s1 conv is nine shifted GEMMs.
The grid tiles (batch, row-blocks); each program holds THREE row-shifted
views of the width-padded input (one per kernel row, passed as three
BlockSpecs over pre-shifted copies — Pallas blocks cannot overlap, so the
ky halo is materialized by XLA as three row-offset views), slices the kx
shift off the padded width in-register, and accumulates nine
(rows*W, Cin) x (Cin, Cout) MXU dots in f32 before applying the
bias+residual+act epilogue in-kernel — output touches HBM exactly once,
epilogue included.

The whole (3,3,Cin,Cout) weight rides a constant-index BlockSpec, so Mosaic
keeps it RESIDENT in VMEM across the grid (fetched once — the key to beating
XLA's weight-streaming conv). That residency caps Cin*Cout: at SDXL's
1280x1280 level the weight alone is 29.5 MB. Rather than tile the weight in
the kernel (which forfeits residency and streams 29.5 MB per row-block),
``conv3x3_direct`` splits the CONV at the op level — halving Cout (two
independent kernels writing disjoint channel slices) and Cin (two kernels
whose f32 partial sums chain through the residual operand) until each piece's
weight is resident-sized. Partials stay f32 end-to-end (out_dtype=f32, the
epilogue runs only on the last cin piece), so the split is numerically the
one 9-dot f32 accumulation the unsplit kernel performs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from stabletriton_tpu.kernels.common import interpret_mode, round_up
from stabletriton_tpu.ops.registry import register


def _silu(x):
    return x * jax.nn.sigmoid(x)


_ACTS = {None: lambda x: x, "silu": _silu}

VMEM_BUDGET = 11 << 20   # stay under the ~16MB scoped limit with headroom
W_RESIDENT_MAX = 8 << 20  # max resident weight block before the op splits


def _conv3x3_kernel_elem(x_ref, w_ref, b_ref, res_ref, gs_ref, gsh_ref,
                         o_ref, *, width: int, block_rows: int, act,
                         has_res: bool, gn_act=None, valid_rows: int = 0):
    """Overlapping-window variant: x_ref is (1, block_rows+2, width+2, Cin)
    — an `pl.Element` row window starting at j*block_rows, so the ky halo
    needs no shifted input copies; ky and kx both slice in-register.

    ``gs_ref``/``gsh_ref`` (optional, (1, 1, Cin) f32): per-(batch, channel)
    GroupNorm scale/shift applied to the input window in-register (norm +
    ``gn_act`` + zero-mask of the SAME-padding border — raw x is padded with
    zeros, and normalize(0) != 0) — fusing the GN apply pass into the conv's
    one read of x. ``valid_rows`` is the unpadded H for the row mask."""
    cin = x_ref.shape[3]
    cout = w_ref.shape[3]
    if gs_ref is not None:
        j = pl.program_id(1)
        xw = x_ref[0].astype(jnp.float32) * gs_ref[0, 0] + gsh_ref[0, 0]
        xw = _ACTS[gn_act](xw)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows + 2, width + 2), 0) + j * block_rows
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows + 2, width + 2), 1)
        valid = ((rows >= 1) & (rows <= valid_rows)
                 & (cols >= 1) & (cols <= width))
        # multiply by a {0,1} f32 mask rather than where(valid[..., None]):
        # Mosaic's backend only supports inserting a minor dim on 32-bit
        # vectors, and the i1 reshape fails tpu_compile_helper (not caught
        # by jax.export lowering, which stops before that backend pass)
        xw = (xw * valid.astype(jnp.float32)[..., None]).astype(x_ref.dtype)
    else:
        xw = x_ref[0]
    acc = jnp.zeros((block_rows * width, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = xw[ky:ky + block_rows, kx:kx + width, :].reshape(
                block_rows * width, cin)
            acc = acc + jax.lax.dot_general(
                patch, w_ref[ky, kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if b_ref is not None:
        # (Cout,) shared or (1, Cout) per-batch bias — both broadcast
        acc = acc + b_ref[...].reshape(1, cout).astype(jnp.float32)
    acc = acc.reshape(block_rows, width, cout)
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = _ACTS[act](acc).astype(o_ref.dtype)


def _conv3x3_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, res_ref, o_ref, *,
                    width: int, act, has_res: bool):
    """x{k}_ref: (1, rows, width+2, Cin) — the input rows for kernel row k.
    w_ref: (3, 3, Cin, Cout); o_ref: (1, rows, width, Cout)."""
    rows = x0_ref.shape[1]
    cin = x0_ref.shape[3]
    cout = w_ref.shape[3]
    acc = jnp.zeros((rows * width, cout), jnp.float32)
    for ky, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for kx in range(3):
            patch = x_ref[0, :, kx:kx + width, :].reshape(rows * width, cin)
            acc = acc + jax.lax.dot_general(
                patch, w_ref[ky, kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if b_ref is not None:
        acc = acc + b_ref[...].reshape(1, cout).astype(jnp.float32)
    acc = acc.reshape(rows, width, cout)
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = _ACTS[act](acc).astype(o_ref.dtype)


def _halo_mode() -> str:
    """How the ky halo reaches the kernel (trace-time, ST_CONV_HALO):

      * "element" (default): ONE height+width-padded input whose row dim is
        an overlapping `pl.Element` window (block_rows+2 rows starting at
        j*block_rows) — the input is materialized and read ~once;
      * "views": three row-offset copies of the padded input, one per kernel
        row (the round-4 original; Pallas Blocked blocks cannot overlap, so
        XLA materializes 3 shifted arrays = ~3x the input HBM traffic).

    Kernel-level the two are SHAPE-DEPENDENT (+-10% either way on v5e);
    step-level "element" wins (9.71 vs 9.58 it/s) so it is the heuristic
    default, and the per-shape tuned table (autotune.tune_conv) overrides
    per dispatch. See benchmarks/NOTES.md round-4 conv entries."""
    import os

    return os.environ.get("ST_CONV_HALO", "element")


def _vmem_model(block_rows, wd, cin, cout, itemsize, out_itemsize, has_res,
                halo=None, gn=False):
    """Estimated VMEM bytes for one program (x window(s) double-buffered; the
    constant-index weight is resident once; f32 accumulator on the stack).

    Every buffer is modelled at its PADDED footprint: Mosaic tiles the last
    two dims to (sublane 8, lane 128), so a cout=4 conv_out pads its lane
    dim 32x and cin/cout=320 pads to 384. The unpadded model undercounted
    exactly that — conv_out (320->4, 128^2) sized a 25.7MB block against the
    16MB scoped limit and crashed the headline bench (round-5 verify)."""
    ci = round_up(cin, 128)
    co = round_up(cout, 128)
    wp = round_up(wd, 8)
    whp = round_up(wd + 2, 8)
    if (halo or _halo_mode()) == "element":
        x_in = (block_rows + 2) * whp * ci * itemsize * 2      # dbl-buffered
    else:
        x_in = 3 * block_rows * whp * ci * itemsize * 2
    w = 9 * round_up(cin, 8) * co * itemsize                   # resident
    acc = block_rows * wp * co * 4
    out = block_rows * wp * co * out_itemsize * 2
    res = block_rows * wp * co * out_itemsize * 2 if has_res else 0
    # fused GN apply materializes an f32 normalized window on the stack
    gn_tmp = (block_rows + 2) * whp * ci * 4 if gn else 0
    return x_in + w + acc + out + res + gn_tmp


@functools.partial(
    jax.jit,
    static_argnames=("act", "block_rows", "out_dtype", "halo", "gn_act",
                     "interpret"),
)
def _conv3x3_call(
    x: jax.Array,       # (B, H, W, Cin)
    w: jax.Array,       # (3, 3, Cin, Cout) HWIO — must be resident-sized
    b: jax.Array | None,
    residual: jax.Array | None,
    *,
    act: str | None,
    block_rows: int | None,
    out_dtype=None,
    halo: str | None = None,
    gn_scale: jax.Array | None = None,   # (B, Cin) f32 — fused GN apply
    gn_shift: jax.Array | None = None,
    gn_act: str | None = None,
    interpret: bool | None = None,
):
    """One pallas_call: SAME-padding stride-1 3x3 conv, epilogue in-kernel.

    ``b`` may be (Cout,) (shared) or (B, Cout) (per-batch — e.g. the resnet
    time-embedding folded into conv1's bias). ``gn_scale``/``gn_shift`` fuse
    the GroupNorm apply (+``gn_act``) into the kernel's input read (element
    halo only — the window is normalized once in-register)."""
    if interpret is None:
        interpret = interpret_mode()
    n, h, wd, cin = x.shape
    cout = w.shape[3]
    out_dtype = out_dtype or x.dtype
    has_res = residual is not None
    has_gn = gn_scale is not None

    if block_rows is None:
        budget = VMEM_BUDGET
        block_rows = h
        while block_rows > 1 and _vmem_model(
            block_rows, wd, cin, cout, x.dtype.itemsize,
            jnp.dtype(out_dtype).itemsize, has_res, halo, has_gn,
        ) > budget:
            block_rows -= 1
        while h % block_rows:
            block_rows -= 1

    rows_p = round_up(h, block_rows)
    xp = jnp.pad(x, ((0, 0), (1, 1 + rows_p - h), (1, 1), (0, 0)))
    grid = (n, rows_p // block_rows)

    elem = (halo or _halo_mode()) == "element"
    assert not (has_gn and not elem), "fused GN needs the element halo"
    if elem:
        # ONE padded input; the row dim is an overlapping Element window of
        # block_rows+2 rows starting at j*block_rows — no shifted copies
        br = block_rows
        # Mosaic requires every dim of a spec to be Element or none: the
        # index map is then all element offsets (batch blocks are size 1,
        # so the batch offset is just i)
        in_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(br + 2),
                          pl.Element(wd + 2), pl.Element(cin)),
                         lambda i, j: (i, j * br, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
        ]
        args = [xp, w]
    else:
        # three ky row views — row-offset slices of the padded array
        # (Blocked Pallas blocks cannot overlap; XLA materializes the views)
        views = [xp[:, k:k + rows_p, :, :] for k in range(3)]
        in_specs = [
            pl.BlockSpec((1, block_rows, wd + 2, cin),
                         lambda i, j: (i, j, 0, 0))
            for _ in range(3)
        ] + [
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
        ]
        args = views + [w]
    if b is not None:
        if b.ndim == 2:  # (B, Cout) per-batch bias
            # Mosaic tiling rule: a Blocked spec's last two dims must be
            # (8, 128)-divisible or EQUAL to the array dims — (1, cout) vs
            # array (B, cout) is illegal at B>1. Carry the bias as
            # (B, 1, Cout) so the (1, 1, Cout) block's last two dims equal
            # the array's (the round-4 rc=1 lowering break, VERDICT r4 #1).
            in_specs.append(
                pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)))
            args.append(b[:, None, :])
        else:
            in_specs.append(pl.BlockSpec((cout,), lambda i, j: (0,)))
            args.append(b)
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, block_rows, wd, cout), lambda i, j: (i, j, 0, 0))
        )
        res_p = (jnp.pad(residual, ((0, 0), (0, rows_p - h), (0, 0), (0, 0)))
                 if rows_p != h else residual)
        args.append(res_p)
    if has_gn:
        # same (B, 1, Cin)/(1, 1, Cin) carry as the per-batch bias above
        for arr in (gn_scale, gn_shift):
            in_specs.append(
                pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0)))
            args.append(arr.astype(jnp.float32)[:, None, :])

    if elem:
        has_b = b is not None
        base = functools.partial(_conv3x3_kernel_elem, width=wd,
                                 block_rows=block_rows, act=act,
                                 has_res=has_res, gn_act=gn_act,
                                 valid_rows=h)

        def kernel(*refs):  # refs = (*in_refs, o_ref); presence-flag mapping
            i = 2
            bb = refs[i] if has_b else None
            i += int(has_b)
            rr = refs[i] if has_res else None
            i += int(has_res)
            gs = refs[i] if has_gn else None
            gsh = refs[i + 1] if has_gn else None
            base(refs[0], refs[1], bb, rr, gs, gsh, refs[-1])
    else:
        base = functools.partial(_conv3x3_kernel, width=wd, act=act,
                                 has_res=has_res)
        if b is not None and has_res:
            kernel = base
        elif b is not None:
            kernel = lambda x0, x1, x2, ww, bb, o: base(  # noqa: E731
                x0, x1, x2, ww, bb, None, o)
        elif has_res:
            kernel = lambda x0, x1, x2, ww, rr, o: base(  # noqa: E731
                x0, x1, x2, ww, None, rr, o)
        else:
            kernel = lambda x0, x1, x2, ww, o: base(      # noqa: E731
                x0, x1, x2, ww, None, None, o)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_rows, wd, cout),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rows_p, wd, cout), out_dtype),
        interpret=interpret,
    )(*args)
    return out[:, :h] if rows_p != h else out


def _direct_or_split(x, w, b, residual, act, out_dtype, block_rows, halo,
                     interpret, gn_scale=None, gn_shift=None, gn_act=None):
    """Recursive planner: one resident-weight pallas_call when it fits, else
    split — Cout halves (independent kernels, disjoint output slices) or Cin
    halves (f32 partial sums chained through the residual operand, epilogue
    only on the last piece — numerically the unsplit kernel's single f32
    accumulation). Fused-GN scale/shift slice with Cin and ride along with
    Cout. Returns None when no feasible plan exists (caller falls back to
    the XLA conv)."""
    cin, cout = w.shape[2], w.shape[3]
    has_gn = gn_scale is not None
    w_bytes = 9 * cin * cout * w.dtype.itemsize
    # even one row must fit the VMEM model (wide-spatial shapes — the VAE
    # decode's 1024-wide feature maps — can exceed it at block_rows=1)
    min_fits = _vmem_model(
        1, x.shape[2], cin, cout, x.dtype.itemsize,
        jnp.dtype(out_dtype or x.dtype).itemsize, residual is not None, halo,
        has_gn,
    ) <= VMEM_BUDGET
    if w_bytes <= W_RESIDENT_MAX and min_fits:
        return _conv3x3_call(x, w, b, residual, act=act,
                             block_rows=block_rows, out_dtype=out_dtype,
                             halo=halo, gn_scale=gn_scale, gn_shift=gn_shift,
                             gn_act=gn_act, interpret=interpret)
    if (w_bytes > W_RESIDENT_MAX and cout % 2 == 0
            and (cout >= cin or cin % 2)):
        halves = [
            _direct_or_split(x, w[..., sl],
                             None if b is None else b[..., sl],
                             None if residual is None else residual[..., sl],
                             act, out_dtype, block_rows, halo, interpret,
                             gn_scale, gn_shift, gn_act)
            for sl in (slice(0, cout // 2), slice(cout // 2, cout))
        ]
        if any(h is None for h in halves):
            return None
        return jnp.concatenate(halves, axis=-1)
    if cin % 2 == 0 and cin > 16:
        # cin split halves the x views AND the weight — the lever for both
        # oversized weights and wide rows
        half = cin // 2
        part = _direct_or_split(
            x[..., :half], w[:, :, :half], None, residual, None, jnp.float32,
            block_rows, halo, interpret,
            None if gn_scale is None else gn_scale[:, :half],
            None if gn_shift is None else gn_shift[:, :half], gn_act)
        if part is None:
            return None
        return _direct_or_split(
            x[..., half:], w[:, :, half:], b, part, act, out_dtype,
            block_rows, halo, interpret,
            None if gn_scale is None else gn_scale[:, half:],
            None if gn_shift is None else gn_shift[:, half:], gn_act)
    return None


def conv3x3_direct(
    x: jax.Array,       # (B, H, W, Cin)
    w: jax.Array,       # (3, 3, Cin, Cout) HWIO
    b: jax.Array | None = None,
    *,
    residual: jax.Array | None = None,
    act: str | None = None,
    block_rows: int | None = None,
    halo: str | None = None,
    gn_scale: jax.Array | None = None,
    gn_shift: jax.Array | None = None,
    gn_act: str | None = None,
    interpret: bool | None = None,
):
    """SAME-padding stride-1 3x3 conv, epilogue fused in-kernel; splits at
    the op level when the weight or the row tiles exceed VMEM (see
    _direct_or_split), falling back to the XLA conv when no plan fits.
    ``block_rows`` and ``halo`` default to the per-shape tuned table entry
    (kernels/autotune.py tune_conv) when one exists, else the VMEM-model
    heuristic / ST_CONV_HALO (element vs views is SHAPE-DEPENDENT on v5e:
    +-10% either way, see NOTES.md); explicit values propagate to every
    op-split leaf. ``gn_scale``/``gn_shift`` ((B, Cin) f32) fuse the GN
    apply + ``gn_act`` into the kernel's input read (forces the element
    halo; the tuned block_rows still applies). Returns None-fallback via
    the XLA conv on the *un-normalized* input only when gn is absent —
    with gn the caller handles infeasible plans."""
    if block_rows is None and (halo is None or gn_scale is not None):
        from stabletriton_tpu.kernels import autotune

        keyargs = (x.shape[0], x.shape[1], x.shape[2], w.shape[2], w.shape[3],
                   x.dtype, residual is not None, act)
        tuned = None
        gn_tuned = False
        if gn_scale is not None:  # fused variant tunes under its own key
            tuned = autotune.lookup(autotune.conv_key(*keyargs, gn=True))
            gn_tuned = tuned is not None
        if tuned is None:
            tuned = autotune.lookup(autotune.conv_key(*keyargs))
        if tuned is not None:
            if tuned.get("impl") == "xla":
                # per-shape measured loss for the direct kernel (cin=4
                # conv_in rows, N1 cond-only batches, wide VAE maps): route
                # straight back to the XLA conv. With gn the caller owns the
                # unfused fallback (gn_conv2d_fused), so signal None.
                if gn_scale is not None:
                    return None
                from stabletriton_tpu.ops import reference

                return reference.conv2d(x, w, b, stride=1, padding=1,
                                        residual=residual, act=act)
            if "block_rows" in tuned:
                block_rows = int(tuned["block_rows"])
            if "halo" in tuned and halo is None:
                halo = str(tuned["halo"])
            if gn_scale is not None and not gn_tuned and block_rows:
                # a non-GN winner bypasses _conv3x3_call's VMEM sizing loop
                # (it only runs when block_rows is None), but the fused-GN
                # kernel adds an f32 window temp — re-validate under the GN
                # model and drop to the heuristic when over budget
                if _vmem_model(block_rows, x.shape[2], w.shape[2],
                               w.shape[3], x.dtype.itemsize,
                               x.dtype.itemsize, residual is not None,
                               "element", True) > VMEM_BUDGET:
                    block_rows = None
    if gn_scale is not None:
        halo = "element"  # the only halo the fused-GN kernel supports
    out = _direct_or_split(x, w, b, residual, act, None, block_rows, halo,
                           interpret, gn_scale, gn_shift, gn_act)
    if out is not None or gn_scale is not None:
        return out
    from stabletriton_tpu.ops import reference

    return reference.conv2d(x, w, b, stride=1, padding=1,
                            residual=residual, act=act)


def _gn_fold(x, gamma, beta, num_groups, eps):
    """f32 GroupNorm moments over (H, W) -> per-(batch, channel) scale/shift
    ((B, C) f32) such that ``normalize(x) = x * scale + shift``. One XLA read
    of x; the apply pass is what the fused conv kernel absorbs."""
    n, h, w, c = x.shape
    per = c // num_groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))
    cnt = h * w * per
    mean = s1.reshape(n, num_groups, per).sum(-1) / cnt
    ex2 = s2.reshape(n, num_groups, per).sum(-1) / cnt
    rstd = jax.lax.rsqrt(jnp.maximum(ex2 - jnp.square(mean), 0.0) + eps)
    scale = jnp.repeat(rstd, per, axis=1) * gamma.astype(jnp.float32)
    shift = beta.astype(jnp.float32) - jnp.repeat(mean, per, axis=1) * scale
    return scale, shift


@register("gn_conv2d", "fused")
def gn_conv2d_fused(x, gamma, beta, w, b=None, *, num_groups=32, eps=1e-5,
                    gn_act="silu", stride=1, padding=1, residual=None,
                    act=None):
    """GroupNorm(+act) -> 3x3 conv with the GN apply fused into the conv's
    input read: XLA cannot fuse elementwise work into a pallas_call, so the
    unfused pair pays a full HBM write+read of the normalized activation at
    the GN/conv boundary; here the conv kernel normalizes its input window
    in-register (stats are one XLA read, kernels absorb the apply). Numerics:
    f32 moments, normalize+act in f32, cast to the input dtype for the MXU
    dots — at least as tight as the default ``group_norm=bf16apply`` binding.
    Ineligible shapes (non-3x3/strided/quantized, or no feasible VMEM plan)
    fall back to the unfused dispatch pair."""
    from stabletriton_tpu.ops import registry

    eligible = (not isinstance(w, tuple) and w.ndim == 4
                and w.shape[:2] == (3, 3) and stride == 1 and padding == 1
                and act in _ACTS and gn_act in _ACTS
                and x.shape[3] % num_groups == 0)
    if eligible:
        scale, shift = _gn_fold(x, gamma, beta, num_groups, float(eps))
        from stabletriton_tpu.kernels.flash_attention import _mesh_axes

        axes = _mesh_axes()
        if axes is not None:
            m, data, dsz, _, _ = axes
            if dsz > 1 and x.shape[0] % dsz == 0:
                P = jax.sharding.PartitionSpec
                bspec = P(data, None, None, None)
                vspec = P(data, None)
                args = [x, w, scale, shift]
                in_specs = [bspec, P(None, None, None, None), vspec, vspec]
                have_b, have_res = b is not None, residual is not None
                if have_b:
                    args.append(b)
                    in_specs.append(vspec if b.ndim == 2 else P(None))
                if have_res:
                    args.append(residual)
                    in_specs.append(bspec)

                def local(*a):
                    xx, ww, gs, gsh = a[:4]
                    i = 4
                    bb = a[i] if have_b else None
                    i += int(have_b)
                    rr = a[i] if have_res else None
                    o = conv3x3_direct(xx, ww, bb, residual=rr, act=act,
                                       gn_scale=gs, gn_shift=gsh,
                                       gn_act=gn_act)
                    if o is None:  # no VMEM plan (trace-time): unfused local
                        from stabletriton_tpu.ops import reference

                        xn = _ACTS[gn_act](
                            xx.astype(jnp.float32) * gs[:, None, None, :]
                            + gsh[:, None, None, :]).astype(xx.dtype)
                        o = reference.conv2d(xn, ww, bb, stride=1, padding=1,
                                             residual=rr, act=act)
                    return o

                out = jax.shard_map(
                    local, mesh=m, in_specs=tuple(in_specs), out_specs=bspec,
                    check_vma=False,
                )(*args)
            else:
                out = conv3x3_direct(x, w, b, residual=residual, act=act,
                                     gn_scale=scale, gn_shift=shift,
                                     gn_act=gn_act)
        else:
            out = conv3x3_direct(x, w, b, residual=residual, act=act,
                                 gn_scale=scale, gn_shift=shift,
                                 gn_act=gn_act)
        if out is not None:
            return out
    # unfused fallback: compose through the active binding
    h = registry.dispatch("group_norm", x, gamma, beta,
                          num_groups=num_groups, eps=eps, act=gn_act)
    return registry.dispatch("conv2d", h, w, b, stride=stride,
                             padding=padding, residual=residual, act=act)


@register("conv2d", "direct")
def conv2d_direct(x, w, b=None, *, stride=1, padding=1, residual=None,
                  act=None):
    """Route the 3x3 s1 SAME hot shape through the Pallas kernel; everything
    else falls back to the XLA reference conv (same contract).

    Mesh-aware like the attention bindings (kernels/flash_attention.py):
    GSPMD treats a pallas_call as opaque and would all-gather the (B,H,W,C)
    activations onto every chip, so under an active mesh the kernel runs in
    jax.shard_map over the batch ("data") axis — a conv is embarrassingly
    parallel over batch, so the local kernel needs no collectives. Weights
    stay replicated (matching runtime/mesh.py: TP shards only the attention/
    FF projections, never conv)."""
    from stabletriton_tpu.ops import reference

    if (not isinstance(w, tuple) and w.ndim == 4 and w.shape[:2] == (3, 3)
            and stride == 1 and padding == 1
            and act in _ACTS):
        from stabletriton_tpu.kernels.flash_attention import _mesh_axes

        axes = _mesh_axes()
        if axes is not None:
            m, data, dsz, _, _ = axes
            if dsz > 1 and x.shape[0] % dsz == 0:
                P = jax.sharding.PartitionSpec
                bspec = P(data, None, None, None)
                rspec = P(None)
                args = [x, w]
                in_specs = [bspec, P(None, None, None, None)]
                have_b, have_res = b is not None, residual is not None
                if have_b:
                    args.append(b)
                    # (B, Cout) per-batch bias shards with the batch;
                    # (Cout,) shared bias replicates
                    in_specs.append(P(data, None) if b.ndim == 2 else rspec)
                if have_res:
                    args.append(residual)
                    in_specs.append(bspec)

                def local(*a):
                    xx, ww = a[0], a[1]
                    i = 2
                    bb = a[i] if have_b else None
                    i += int(have_b)
                    rr = a[i] if have_res else None
                    return conv3x3_direct(xx, ww, bb, residual=rr, act=act)

                return jax.shard_map(
                    local, mesh=m, in_specs=tuple(in_specs), out_specs=bspec,
                    check_vma=False,
                )(*args)
        return conv3x3_direct(x, w, b, residual=residual, act=act)
    return reference.conv2d(x, w, b, stride=stride, padding=padding,
                            residual=residual, act=act)
