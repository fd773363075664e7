"""Probe 2: clean per-stage kernel costs + streamed-weight DMA rate.

Round-3 follow-up to probe_grid_overhead.py, whose scan body perturbed the
input with a full-array add (contaminating absolute rates). Here every
timed computation is CARRY-CHAINED — the kernel's output feeds the next
iteration — so no extra ops and no hoisting.

Measures:
  (a) pass-through y = x + 1 per stage shape (clean activation r/w cost);
  (b) the real fused_mit_block per stage (current production per-block cost);
  (c) a weight-STREAMING kernel: grid (G, g) where each inner step reads a
      fresh [Kw, C] weight block (revisited per outer step, as whole-stage
      fusion would stream them) — the fusion plan's key unknown.
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

from surgical_tpu.core.config import BackboneConfig
from surgical_tpu.kernels.mit_block import block_weights_from_params, fused_mit_block
from surgical_tpu.models.mit_evp import MiTEVP

ITERS = 24
ROUNDS = 3
B = 128


def chain_time(fn, x0):
    """Carry-chain fn ITERS times in one jit; returns seconds per iteration."""

    @jax.jit
    def chained(x):
        def step(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(y[0, :1, :1].astype(jnp.float32))

    _ = np.asarray(chained(x0))  # compile
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        _ = np.asarray(chained(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def passthrough(x, bt):
    Bx, N, C = x.shape
    G = Bx // bt
    xf = x.reshape(G, bt * N, C)

    def kernel(x_ref, y_ref):
        y_ref[0] = x_ref[0] + jnp.ones((), x_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * N, C), x.dtype),
    )(xf).reshape(Bx, N, C)


def weight_stream(x, w_all, bt):
    """Grid (G, g): inner step j reads weight block j (refetched per outer
    step — the whole-stage-fusion streaming pattern) and folds one scalar
    of it into the resident output."""
    Bx, N, C = x.shape
    G = Bx // bt
    g, Kw, _ = w_all.shape
    xf = x.reshape(G, bt * N, C)

    def kernel(x_ref, w_ref, y_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            y_ref[0] = x_ref[0]

        # touch the streamed block (sublane-only broadcast: [1, C] -> [M, C];
        # a [1, 1] slice would need a both-dims broadcast Mosaic lacks)
        y_ref[0] += w_ref[0, :1, :] * jnp.full((), 0.001, w_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(G, g),
        in_specs=[
            pl.BlockSpec((1, bt * N, C), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kw, C), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt * N, C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * N, C), x.dtype),
    )(xf, w_all).reshape(Bx, N, C)


def main():
    rng = np.random.default_rng(0)
    report = {"B": B, "device": str(jax.devices()[0]), "iters": ITERS}

    cfg = BackboneConfig.preset("b3")
    from surgical_tpu.core.config import HeadConfig

    model = MiTEVP(cfg, HeadConfig(), compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), variables["params"])

    stages = [
        ("s1", 0, 3136, 64, 1),
        ("s2", 1, 784, 128, 2),
        ("s3", 2, 196, 320, 4),
        ("s4", 3, 49, 512, 8),
    ]
    for name, si, N, C, bt in stages:
        stage = si + 1
        H = W = 56 >> si
        sr = cfg.sr_ratios[si]
        Nkv = (H // sr) * (W // sr)
        heads = cfg.num_heads[si]
        x = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
        G = B // bt
        row = {"N": N, "C": C, "bt": bt}

        # (a) clean pass-through
        t = chain_time(functools.partial(passthrough, bt=bt), x)
        row["pass_us_per_blockcall"] = round(t * 1e6, 1)
        bytes_rw = 2 * B * N * C * 2
        row["pass_GBps"] = round(bytes_rw / t / 1e9, 1)

        # (b) real per-block kernel, carry-chained (fixed k/v, self-feeding)
        kv = jax.device_put((rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
        bw = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                          block_weights_from_params(params[f"block{stage}_0"]))

        def block_fn(x):
            return fused_mit_block(x, None, kv, kv, bw, heads=heads, H=H, W=W, bt=bt)

        t = chain_time(block_fn, x)
        row["block_us_per_call"] = round(t * 1e6, 1)

        # (c) weight streaming at this stage's block-weight size, g = depth
        g = cfg.depths[si]
        hidden = C * 4
        n_params = C * C * 2 + C * 2 * C + 2 * C * hidden + 9 * hidden + (sr * sr * C * C if sr > 1 else 0)
        Kw = max(8, n_params // C)
        w_all = jax.device_put(
            (rng.standard_normal((g, Kw, C)) * 0.01).astype(jnp.bfloat16))
        t = chain_time(functools.partial(weight_stream, w_all=w_all, bt=bt), x)
        w_bytes = G * g * Kw * C * 2
        row["stream_us_per_call"] = round(t * 1e6, 1)
        row["stream_weight_MB_per_call"] = round(w_bytes / 1e6, 1)
        row["stream_GBps"] = round(w_bytes / t / 1e9, 1)
        report[name] = row
        print(name, row, flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
