"""Empirical ceiling probes for the roofline: find the REAL max rates this
chip delivers for MXU matmuls, VPU elementwise, and HBM streaming, across
several probe variants — so roofline.py can use validated ceilings.

Run on TPU: python scripts/probe_ceilings.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 16
ROUNDS = 5


def chain_time(fn, x0, iters=ITERS, rounds=ROUNDS):
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
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def mxu_variants():
    rng = np.random.default_rng(0)
    for n, acc in [(2048, "bf16"), (4096, "bf16"), (4096, "f32"), (8192, "bf16")]:
        w = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
        x = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
        pet = jnp.bfloat16 if acc == "bf16" else jnp.float32

        def mm(x, w=w, pet=pet):
            return jnp.dot(x, w, preferred_element_type=pet).astype(jnp.bfloat16)

        t = chain_time(mm, x)
        print(f"mxu n={n} acc={acc}: {2*n**3/t/1e12:.1f} TFLOPs ({t*1e3:.3f} ms/it)", flush=True)

    # batched smaller matmuls like stage-3 shapes: [B*N, C] @ [C, C]
    for (m, k, nn) in [(128 * 196, 320, 320), (128 * 196, 320, 1280)]:
        w = jax.device_put((rng.standard_normal((k, nn)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
        w2 = jax.device_put((rng.standard_normal((nn, k)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
        x = jax.device_put((rng.standard_normal((m, k)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)

        def mm2(x, w=w, w2=w2):
            return jnp.dot(jnp.dot(x, w, preferred_element_type=jnp.bfloat16), w2,
                           preferred_element_type=jnp.bfloat16)

        t = chain_time(mm2, x)
        fl = 2 * m * k * nn * 2
        print(f"mxu [{m},{k}]@[{k},{nn}]@back: {fl/t/1e12:.1f} TFLOPs ({t*1e3:.3f} ms/it)", flush=True)


def hbm_variants():
    rng = np.random.default_rng(1)
    for mb in [64, 256, 1024]:
        n = int((mb * 1e6 / 4) ** 0.5)
        x = jax.device_put(rng.standard_normal((n, n)).astype(np.float32))

        def f(x):
            return x + 1.0

        t = chain_time(f, x)
        print(f"hbm xla-add {mb}MB f32: {2*x.nbytes/t/1e9:.1f} GB/s ({t*1e3:.3f} ms/it)", flush=True)

    # bf16 version
    n = 16384
    x = jax.device_put(rng.standard_normal((n, n)).astype(np.float32)).astype(jnp.bfloat16)

    def f(x):
        return x + jnp.asarray(1.0, jnp.bfloat16)

    t = chain_time(f, x)
    print(f"hbm xla-add 512MB bf16: {2*x.nbytes/t/1e9:.1f} GB/s ({t*1e3:.3f} ms/it)", flush=True)

    # reduction (read-only traffic): sum along axis -1 keepdims, broadcast back
    def g(x):
        return x * 0.999 + jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True).astype(jnp.bfloat16) * 1e-3

    t = chain_time(g, x)
    print(f"hbm xla-meanbcast 512MB bf16: {2*x.nbytes/t/1e9:.1f} GB/s", flush=True)


def vpu_variants():
    rng = np.random.default_rng(2)
    # XLA gelu chain on a big f32 array (what stages actually do, fused w/ HBM)
    x = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))

    def f(x):
        return jax.nn.gelu(x) * 0.5

    t = chain_time(f, x)
    # tanh-gelu ~ 15 ops/elt
    print(f"vpu xla-gelu 64MB f32: {15*x.size/t/1e12:.2f} T-ops/s eq ({t*1e3:.3f} ms/it, {2*x.nbytes/t/1e9:.0f} GB/s)", flush=True)

    # pallas VMEM-resident with modest unroll + multiple blocks via grid
    M, C = 8, 128  # one vreg
    for K, reps in [(64, 64)]:
        def kernel(x_ref, y_ref, K=K, reps=reps):
            x = x_ref[...]
            acc = jnp.zeros_like(x)
            a = jnp.float32(1.000001)
            b = jnp.float32(1e-7)
            for _ in range(K):
                x = x * a + b
                acc = acc + x
            y_ref[...] = acc

        G = 512
        f2 = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((1, M * reps, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, M * reps, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, M * reps, C), jnp.float32),
        )
        x2 = jax.device_put(rng.standard_normal((G, M * reps, C)).astype(np.float32))
        t = chain_time(f2, x2)
        ops = 4 * K * x2.size  # mul+add+add acc (count fma=2) => 4/elt/step
        print(f"vpu pallas K={K} block={M*reps}x{C} G={G}: {ops/t/1e12:.2f} T-ops/s ({t*1e3:.3f} ms/it)", flush=True)


def pallas_dma_variants():
    # pass-through at stage-like block shapes, with and without multiple dma in flight
    rng = np.random.default_rng(3)
    for (N, C, bt, B) in [(3136, 64, 1, 128), (784, 128, 2, 128), (196, 320, 4, 128), (49, 512, 8, 128)]:
        G = B // bt

        def kernel(x_ref, y_ref):
            y_ref[...] = x_ref[...] + jnp.ones((), x_ref.dtype)

        f = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, bt * N, C), jnp.bfloat16),
        )
        x = jax.device_put((rng.standard_normal((G, bt * N, C)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        t = chain_time(f, x)
        print(f"pallas-dma [{bt}*{N},{C}] G={G}: {2*x.nbytes/t/1e9:.1f} GB/s ({t*1e3:.3f} ms/it)", flush=True)

        # same but XLA add on the identical array
        def fx(x):
            return x + jnp.asarray(1, x.dtype)

        t = chain_time(fx, x)
        print(f"  xla-add same array:        {2*x.nbytes/t/1e9:.1f} GB/s ({t*1e3:.3f} ms/it)", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    print("== MXU ==", flush=True)
    mxu_variants()
    print("== HBM ==", flush=True)
    hbm_variants()
    print("== VPU ==", flush=True)
    vpu_variants()
    print("== pallas DMA ==", flush=True)
    pallas_dma_variants()
