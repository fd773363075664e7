"""Shared two-point chained-timing harness for on-chip probes.

The env's relay adds a FIXED ~27-36 ms per jit dispatch (calibrated by
`probe_call_overhead.py`: constant from 4 to 128 chained `lax.scan`
iterations; per-scan-step cost ~1 µs). `chain_time` cancels it exactly by
taking the slope between two chain lengths of the same fn. Every round-3
probe (`roofline.py`, `probe_nonstage.py`, `probe_sr_extract.py`) uses this
module; the round-2 probe scripts predate it and keep their local copies as
the historical record of the methodology drift this module ends.

The timed fn must map its carry to a same-shaped carry, and the carry must
DEPEND on the computation each step (else XLA hoists it out of the scan).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def total_chained(fn, x0, iters: int, rounds: int = 4) -> float:
    """Best-of-rounds TOTAL seconds for `iters` carry-chained steps of fn,
    fenced by a D2H of a scalar (block_until_ready returns early through
    the relay)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x, n):
        def step(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(step, x, None, length=n)
        lead = jax.tree.leaves(y)[0]
        return jnp.sum(lead[(0,) * (lead.ndim - 1)][:1].astype(jnp.float32))

    _ = np.asarray(chained(x0, n=iters))  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = np.asarray(chained(x0, n=iters))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_time(fn, x0, lo: int, hi: int, rounds: int = 4) -> float:
    """Overhead-cancelled seconds per iteration: the slope between lo- and
    hi-iteration chains. A non-positive slope means shared-chip noise
    swamped the probe's work — raise instead of clamping (a clamped slope
    once implied a 137,000-TFLOP MXU and near-zero floors)."""
    t_lo = total_chained(fn, x0, lo, rounds)
    t_hi = total_chained(fn, x0, hi, rounds)
    slope = (t_hi - t_lo) / (hi - lo)
    if slope <= 0:
        raise RuntimeError(
            f"two-point slope non-positive ({t_lo*1e3:.2f} ms @ {lo} vs "
            f"{t_hi*1e3:.2f} ms @ {hi}): shared-chip noise exceeded the "
            "probe's work; re-run on a quieter machine")
    return slope
