"""Calibrate the fixed per-call overhead of a jit dispatch + scalar D2H
through the env's relay tunnel, by timing the SAME chained fn at several
iteration counts and fitting total(iters) = overhead + iters * t.

If the fit is good (R^2 ~ 1 with constant t), every chained measurement can
cancel the overhead exactly via t = (total(hi) - total(lo)) / (hi - lo).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS = 6


def total_time(fn, x0, iters, rounds=ROUNDS):
    @jax.jit
    def chained(x):
        def step(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(step, x, None, length=iters)
        lead = jax.tree.leaves(y)[0]
        return jnp.sum(lead[(0,) * (lead.ndim - 1)][:1].astype(jnp.float32))

    _ = np.asarray(chained(x0))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = np.asarray(chained(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # medium matmul: real per-it work ~0.7 ms
    n = 4096
    w = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
    x = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

    its = [4, 8, 16, 32, 64, 128]
    totals = [total_time(mm, x, it) for it in its]
    for it, tt in zip(its, totals):
        print(f"mm4096 iters={it}: total {tt*1e3:.2f} ms, per-it {tt/it*1e3:.3f} ms", flush=True)
    # least squares fit
    A = np.stack([np.ones(len(its)), np.asarray(its, np.float64)], 1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(totals) * 1e3, rcond=None)
    print(f"fit: overhead={coef[0]:.2f} ms, per-it={coef[1]:.3f} ms "
          f"-> {2*n**3/(coef[1]/1e3)/1e12:.1f} TFLOPs", flush=True)

    # tiny elementwise: per-it work ~0: the intercept IS the call cost,
    # slope = per-scan-step cost
    y = jax.device_put(np.ones((8, 128), np.float32))

    def tiny(x):
        return x * 1.000001 + 1e-7

    totals = [total_time(tiny, y, it) for it in its]
    for it, tt in zip(its, totals):
        print(f"tiny iters={it}: total {tt*1e3:.2f} ms, per-it {tt/it*1e3:.3f} ms", flush=True)
    coef, *_ = np.linalg.lstsq(A, np.asarray(totals) * 1e3, rcond=None)
    print(f"fit: overhead={coef[0]:.2f} ms, per-scan-step={coef[1]:.4f} ms", flush=True)

    # does the overhead depend on operand residency? device-put fresh each
    # call vs reused (it shouldn't: inputs already on device either way)
    t1 = total_time(mm, x, 16)
    print(f"mm4096 iters=16 again: {t1*1e3:.2f} ms (repeatability)", flush=True)


if __name__ == "__main__":
    main()
