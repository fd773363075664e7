"""Probe: per-grid-step overhead of Pallas TPU kernels.

Hypothesis under test (round 3): the serving graph's stage times are
dominated by a fixed per-grid-step cost (~21 us/step was measured in round 2
for a 0.8 MB pass-through), not by compute or DMA. If true, FEWER/BIGGER
grid steps (multi-block fusion, larger bt) is the main remaining lever.

Measures, all chained inside ONE jit (lax.scan) so host dispatch cannot
pollute per-step numbers:
  (a) pass-through kernel y = x + 1 at several (bt, N, C) block shapes;
  (b) the same with "arbitrary" vs default dimension semantics;
  (c) per-step cost as in-kernel compute grows (k serial matmuls), to
      separate pipeline-bubble overhead from compute time.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 32
ROUNDS = 3


def chain_time(fn, x):
    """Time fn chained ITERS times in one jit; returns seconds per call."""

    @jax.jit
    def chained(x):
        def step(c, i):
            y = fn(x + i.astype(x.dtype) * 0)  # defeat CSE/hoisting cheaply
            return c + jnp.sum(y[0, :1].astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(ITERS))
        return tot

    _ = np.asarray(chained(x))  # compile
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        _ = np.asarray(chained(x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def passthrough(x, bt, semantics=None):
    B, N, C = x.shape
    G = B // bt
    xf = x.reshape(G, bt * N, C)

    def kernel(x_ref, y_ref):
        y_ref[0] = x_ref[0] + jnp.ones((), x_ref.dtype)

    kw = {}
    if semantics is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,)
        )
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * N, C), x.dtype),
        **kw,
    )(xf).reshape(B, N, C)


def compute_kernel(x, w, bt, n_mm):
    """bt*N x C block; n_mm serial [M, C] @ [C, C] matmuls in the body."""
    B, N, C = x.shape
    G = B // bt
    xf = x.reshape(G, bt * N, C)

    def kernel(x_ref, w_ref, y_ref):
        h = x_ref[0]
        for _ in range(n_mm):
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32).astype(h.dtype)
        y_ref[0] = h

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * N, C), x.dtype),
    )(xf, w).reshape(B, N, C)


def main():
    rng = np.random.default_rng(0)
    B = 128
    report = {"B": B, "device": str(jax.devices()[0]), "iters": ITERS}

    # (a)+(b): pass-through at the four stage shapes, several bt
    cases = [
        ("s1", 3136, 64, (1, 2, 4)),
        ("s2", 784, 128, (2, 4, 8)),
        ("s3", 196, 320, (4, 8, 16, 32)),
        ("s4", 49, 512, (8, 16, 32, 64)),
    ]
    for name, N, C, bts in cases:
        x = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
        row = {"N": N, "C": C}
        for bt in bts:
            G = B // bt
            t = chain_time(functools.partial(passthrough, bt=bt), x)
            row[f"bt{bt}_us_per_step"] = round(t / G * 1e6, 2)
            row[f"bt{bt}_total_us"] = round(t * 1e6, 1)
            if bt == bts[0]:
                t2 = chain_time(
                    functools.partial(passthrough, bt=bt, semantics="arbitrary"), x
                )
                row[f"bt{bt}_arbitrary_us_per_step"] = round(t2 / G * 1e6, 2)
        report[name] = row
        print(name, row, flush=True)

    # (c): growing compute at the s3 shape, bt=4 (grid 32)
    N, C, bt = 196, 320, 4
    x = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
    w = jax.device_put((rng.standard_normal((C, C)) * 0.05).astype(jnp.bfloat16))
    comp = {}
    for n_mm in (1, 2, 4, 8, 16):
        t = chain_time(functools.partial(compute_kernel, w=w, bt=bt, n_mm=n_mm), x)
        comp[f"mm{n_mm}_us_per_step"] = round(t / (B // bt) * 1e6, 2)
    report["s3_compute_scaling"] = comp
    print("s3_compute_scaling", comp, flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
