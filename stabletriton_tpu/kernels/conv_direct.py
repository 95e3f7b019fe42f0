"""Experimental direct 3x3 Pallas conv with fused bias+residual+activation.

The SURVEY §7 stretch goal, done the honest keep-or-kill way: the reference
tried three custom convs and recorded the failure (reference
``src/stabletriton/kernels/Conv_Kernels/conv_implicit_gemm.py``,
``Conv_Kernels/README.md`` — "~40x slower"); this repo's shipped conv path is
XLA's TPU conv with the bias+residual+act epilogue fused by XLA at ~155 TF/s
(ops/reference.conv2d). This kernel exists to MEASURE whether a hand-fused
Pallas conv can beat that — `benchmarks/kernel_bench.py conv` A/Bs it and
NOTES.md records the verdict. It is opt-in (overrides=(("conv2d","direct"),))
and deliberately narrow: 3x3, stride 1, SAME padding, NHWC/HWIO — the SDXL
resnet hot shape; everything else falls back to the XLA path.

Design (TPU-native, not im2col): a 3x3 s1 conv is nine shifted GEMMs.
The grid tiles (batch, row-blocks); each program holds THREE row-shifted
views of the width-padded input (one per kernel row, passed as three
BlockSpecs over pre-shifted copies — Pallas blocks cannot overlap, so the
ky halo is materialized by XLA as three row-offset views), slices the kx
shift off the padded width in-register, and accumulates nine
(rows*W, Cin) x (Cin, Cout) MXU dots in f32 before applying the
bias+residual+act epilogue in-kernel — output touches HBM exactly once,
epilogue included.
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
    acc = acc + b_ref[...].astype(jnp.float32)
    acc = acc.reshape(rows, width, cout)
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = _ACTS[act](acc).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "block_rows", "interpret")
)
def conv3x3_direct(
    x: jax.Array,       # (B, H, W, Cin)
    w: jax.Array,       # (3, 3, Cin, Cout) HWIO
    b: jax.Array | None = None,
    *,
    residual: jax.Array | None = None,
    act: str | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
):
    """SAME-padding stride-1 3x3 conv, epilogue fused in-kernel."""
    if interpret is None:
        interpret = interpret_mode()
    n, h, wd, cin = x.shape
    cout = w.shape[3]
    if b is None:
        b = jnp.zeros((cout,), jnp.float32)

    if block_rows is None:
        # keep x views (3 x (rows+? , W+2, Cin) bf16) + acc + w under VMEM
        budget = 6 << 20
        per_row = (wd + 2) * cin * x.dtype.itemsize * 3 * 2  # 3 views, dbl-buf
        per_row += wd * cout * 4  # f32 acc
        block_rows = max(1, min(h, budget // max(per_row, 1)))
        while h % block_rows:
            block_rows -= 1

    rows_p = round_up(h, block_rows)
    # width-pad once; the three ky row views are row-offset slices of the
    # height-padded array (Pallas blocks cannot overlap, so the halo is
    # expressed as three shifted inputs — XLA serves them as views)
    xp = jnp.pad(x, ((0, 0), (1, 1 + rows_p - h), (1, 1), (0, 0)))
    views = [xp[:, k:k + rows_p, :, :] for k in range(3)]

    grid = (n, rows_p // block_rows)
    in_specs = [
        pl.BlockSpec((1, block_rows, wd + 2, cin), lambda i, j: (i, j, 0, 0))
        for _ in range(3)
    ] + [
        pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
        pl.BlockSpec((cout,), lambda i, j: (0,)),
    ]
    args = views + [w, b]
    has_res = residual is not None
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, block_rows, wd, cout), lambda i, j: (i, j, 0, 0))
        )
        res_p = (jnp.pad(residual, ((0, 0), (0, rows_p - h), (0, 0), (0, 0)))
                 if rows_p != h else residual)
        args.append(res_p)

    kernel = functools.partial(
        _conv3x3_kernel, width=wd, act=act, has_res=has_res
    )
    if not has_res:
        kernel = lambda x0, x1, x2, ww, bb, o: _conv3x3_kernel(  # noqa: E731
            x0, x1, x2, ww, bb, None, o, width=wd, act=act, has_res=False
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_rows, wd, cout),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rows_p, wd, cout), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :h] if rows_p != h else out


@register("conv2d", "direct")
def conv2d_direct(x, w, b=None, *, stride=1, padding=1, residual=None,
                  act=None):
    """Route the 3x3 s1 SAME hot shape through the Pallas kernel; everything
    else falls back to the XLA reference conv (same contract)."""
    from stabletriton_tpu.ops import reference

    if (not isinstance(w, tuple) and w.ndim == 4 and w.shape[:2] == (3, 3)
            and stride == 1 and padding == 1
            and act in _ACTS):
        return conv3x3_direct(x, w, b, residual=residual, act=act)
    return reference.conv2d(x, w, b, stride=stride, padding=padding,
                            residual=residual, act=act)
