"""Profiling / tracing utilities (SURVEY.md §5: the reference's observability
was triton do_bench microbenches + one INFO log per graph capture).

TPU equivalents:
  * ``bench_fn`` — steady-state per-call latency with the chained-slope
    methodology (dispatch/readback overhead cancelled; block_until_ready is
    not a reliable fence on tunneled TPU platforms).
  * ``trace`` — jax.profiler wrapper producing a TensorBoard-loadable trace.
  * module logger — pipeline/compile layers emit one INFO per new jitted
    signature (the analog of the reference's per-capture log line,
    ``optimizers/cuda/graphs.py:25-27``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable

import numpy as np

logger = logging.getLogger("stabletriton_tpu")


def _first_scalar(out):
    import jax

    leaves = jax.tree.leaves(out)
    x = leaves[0]
    return np.asarray(x.reshape(-1)[:1])


def bench_fn(
    fn: Callable,
    *args,
    chain_arg: int = 0,
    n_short: int = 4,
    n_long: int = 20,
    reps: int = 3,
    min_window: float = 0.030,
    **kwargs,
) -> float:
    """Steady-state seconds per call.

    Feeds output back into positional arg ``chain_arg`` (shapes/dtypes must
    match) so calls serialize; measures two chain lengths and returns the
    slope, cancelling fixed dispatch+readback overhead. Each length is timed
    ``reps`` times and the minimum taken — tunnel hiccups are one-sided noise
    and a single bad short-chain sample otherwise collapses the slope to ~0.

    The chain is lengthened adaptively until the long-minus-short window
    exceeds ``min_window`` seconds: for sub-millisecond kernels a 16-call
    window sits below the tunnel's RTT jitter and the slope degenerates
    (observed as 0.0us winners in the autotune sweep).
    """
    args = list(args)
    out = fn(*args, **kwargs)
    _ = _first_scalar(out)

    def chain(n):
        a = list(args)
        o = out
        t0 = time.perf_counter()
        for _ in range(n):
            a[chain_arg] = o
            o = fn(*a, **kwargs)
        _ = _first_scalar(o)
        return time.perf_counter() - t0

    chain(2)  # steady-state warmup (first post-compile call can stall)
    t_s = min(chain(n_short) for _ in range(reps))
    t_l = min(chain(n_long) for _ in range(reps))
    while t_l - t_s < min_window and n_long < 5000:
        n_long *= 4
        t_l = min(chain(n_long) for _ in range(reps))
    return max((t_l - t_s) / (n_long - n_short), 1e-9)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stabletriton_trace"):
    """Capture a jax.profiler device trace around the with-block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)
