"""Shared kernel utilities: interpret-mode gating, padding/rounding helpers."""

from __future__ import annotations

import functools
import os

import jax

NEG_INF = float(-1e30)  # safe -inf stand-in (avoids nan from inf - inf)


@functools.cache
def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU test mesh).

    The reference repo had no fake backend at all (every kernel needed real
    CUDA — SURVEY.md §4); interpret mode is how this framework's kernels stay
    testable on the CPU mesh. Override with STABLETRITON_INTERPRET=0/1.
    """
    env = os.environ.get("STABLETRITON_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def rows_for_budget(
    cols: int, itemsize: int, *, n_buffers: int, budget_bytes: int = 6 << 20,
    max_rows: int = 1024,
) -> int:
    """Largest multiple-of-8 row-block that keeps n_buffers double-buffered
    (cols-wide) blocks under the VMEM budget (~16 MB total per core)."""
    per_row = cols * itemsize * n_buffers * 2  # x2: Pallas double-buffers
    rows = budget_bytes // max(per_row, 1)
    rows = min(max_rows, max(8, (rows // 8) * 8))
    return rows


def erf_approx(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7) — Mosaic has no
    native erf lowering, so kernels carry their own."""
    import jax.numpy as jnp

    p = 0.3275911
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))
