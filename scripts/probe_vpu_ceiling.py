"""VPU ceiling band probe (VERDICT r3 item 2: "tighten the VPU ceiling with
an upper-bound-style probe — multiple op mixes; documented lane width x
clock").

The round-3 roofline priced every VPU floor at ONE measured rate
(`roofline.py::measure_vpu_tops`, a SERIAL fma chain = a lower bound: each
step depends on the last, so pipeline latency is charged to the rate).
Floors built on a lower-bound rate OVERSTATE the floor, flattering the
measured-vs-floor gaps. This probe runs a family of op mixes:

  serial_fma   x = x*a + b; acc += x          (the round-3 probe, 3 ops/step)
  par4_fma     4 independent  x_i = x_i*a+b   (2 ops/step each; ILP exposes
                                               issue width, hides latency)
  par8_fma     8 independent chains           (same, deeper ILP)
  par4_mul     4 independent  x_i = x_i*a     (1 op/step; pure-port rate)
  par4_add     4 independent  x_i = x_i+b     (1 op/step)
  par4_mixed   alternating mul / add chains   (1 op/step, both ports)

and reports each rate plus the band [min, max]. The max across mixes is the
closest measurable estimate of the achievable VPU rate for fma-shaped work;
the hardware-architecture cross-check is lanes x clock:
v5e VPU = 4 independent (8 sublane x 128 lane) ALUs ~ 4096 f32 lanes at
~0.94 GHz => ~3.85 T-op/s issue ceiling (fma counted as 2 => ~7.7 Tflop/s
upper bound that no elementwise mix reaches once loads/stores share issue
slots).

Run on the real chip: `python scripts/probe_vpu_ceiling.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts._timing import chain_time

K = 64          # chain length per element
C = 128         # lane dim
M = 8 * 64      # sublane dim per block
G = 512         # grid size


def _run(kernel_body, ops_per_elt_step, nchains=1):
    """Build a pallas grid over [G, M, C] f32 blocks, time it overhead-
    cancelled, return T-ops/s. `kernel_body(xs) -> list` maps the nchains
    working arrays through K steps."""

    def kernel(x_ref, y_ref):
        sub = M // nchains
        xs = [x_ref[0, i * sub:(i + 1) * sub, :] for i in range(nchains)]
        xs = kernel_body(xs)
        y_ref[0] = jnp.concatenate(xs, axis=0)

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, C), jnp.float32),
    )
    x = jax.device_put(
        np.random.default_rng(2).standard_normal((G, M, C)).astype(np.float32))
    t = chain_time(f, x)
    return ops_per_elt_step * K * x.size / t / 1e12


def main():
    a = jnp.float32(1.000001)
    b = jnp.float32(1e-7)

    def serial_fma(xs):
        (x,) = xs
        acc = jnp.zeros_like(x)
        for _ in range(K):
            x = x * a + b
            acc = acc + x
        return [acc]

    def par_fma(xs):
        for _ in range(K):
            xs = [x * a + b for x in xs]
        return xs

    def par_mul(xs):
        for _ in range(K):
            xs = [x * a for x in xs]
        return xs

    def par_add(xs):
        for _ in range(K):
            xs = [x + b for x in xs]
        return xs

    def par_mixed(xs):
        for _ in range(K):
            xs = [x * a if i % 2 == 0 else x + b for i, x in enumerate(xs)]
        return xs

    probes = {
        "serial_fma_3ops": (serial_fma, 3, 1),
        "par4_fma_2ops": (par_fma, 2, 4),
        "par8_fma_2ops": (par_fma, 2, 8),
        "par4_mul_1op": (par_mul, 1, 4),
        "par4_add_1op": (par_add, 1, 4),
        "par4_mixed_1op": (par_mixed, 1, 4),
    }
    out = {}
    for name, (body, ops, nc) in probes.items():
        out[name] = round(_run(body, ops, nc), 2)
        print(name, out[name], "T-ops/s", flush=True)
    vals = list(out.values())
    out["band_tops"] = [min(vals), max(vals)]
    out["arch_issue_ceiling_tops"] = 3.85  # 4 x (8x128) ALUs @ ~0.94 GHz
    print(json.dumps(out))


if __name__ == "__main__":
    main()
