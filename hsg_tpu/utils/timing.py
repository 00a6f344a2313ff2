"""Chained-dispatch timing used by every benchmark in this repo.

One shared implementation of the methodology (bench.py, tools/
channel_pad_ab.py, tools/export_bench.py all call this) so a fix to the
measurement — the warm run, the carry data dependency, the single host
readback — lands everywhere at once instead of drifting per copy.

Why chaining: each timed call is `iters` DEPENDENT evaluations fused
into one `lax.scan` dispatch with a single scalar readback, so the
number excludes per-call host->device dispatch latency (~25-30 ms
through the tunneled-TPU RTT) and measures device time, which is what a
production pipeline with overlapped dispatch achieves.
"""

from __future__ import annotations

import time
from typing import Callable


def time_chained(step: Callable, x, iters: int) -> float:
    """Seconds per call of ``step`` on device, dispatch excluded.

    ``step(x, carry) -> f32 scalar`` must thread the float32 ``carry``
    into its computation (the convention: ``x + carry * 1e-12``) and
    reduce its output to a float32 scalar — that data dependency is what
    stops XLA from collapsing the scan into one iteration.

    Compiles the chained program AOT, runs it once warm, then times ONE
    dispatch of ``iters`` dependent iterations.
    """
    import jax
    import jax.numpy as jnp

    def chained(x):
        c, _ = jax.lax.scan(lambda c, _: (step(x, c), None),
                            jnp.float32(0), None, length=iters)
        return c

    compiled = jax.jit(chained).lower(x).compile()
    float(compiled(x))  # warm (already compiled)
    t0 = time.perf_counter()
    float(compiled(x))
    return (time.perf_counter() - t0) / iters
