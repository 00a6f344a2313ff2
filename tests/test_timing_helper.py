"""The shared chained-dispatch timing helper (hsg_tpu/utils/timing.py)
that bench.py / tools/channel_pad_ab.py / tools/export_bench.py all use.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hsg_tpu.utils.timing import time_chained


def test_time_chained_measures_dependent_iterations():
    """The helper compiles, runs, and scales ~linearly with iters (the
    carry data dependency keeps XLA from collapsing the scan)."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    jnp.float32)
    x = jnp.ones((256, 256), jnp.float32)

    def step(x, carry):
        # Same convention as every caller: perturb the input by the
        # carry, reduce the output to an f32 scalar.
        return ((x + carry * 1e-12) @ w).sum().astype(jnp.float32)

    dt1 = time_chained(step, x, 2)
    dt2 = time_chained(step, x, 64)
    assert dt1 > 0 and dt2 > 0
    # Per-iteration time must not blow up with chain length (fixed
    # dispatch overhead is amortized, so longer chains are <= ~equal
    # per-iter; allow generous slack for a noisy 1-vCPU host).
    assert dt2 < dt1 * 10


def test_time_chained_step_actually_runs():
    """The timed program evaluates `step`, not a constant-folded stub:
    a step that records its effect via the carry changes the result."""
    x = jnp.float32(3.0)

    def step(x, carry):
        return carry + x

    def chained(x):
        c, _ = jax.lax.scan(lambda c, _: (step(x, c), None),
                            jnp.float32(0), None, length=5)
        return c

    # time_chained's internal program is exactly this shape; assert the
    # semantics it relies on (5 dependent accumulations -> 15).
    assert float(jax.jit(chained)(x)) == 15.0
    assert time_chained(step, x, 5) > 0
