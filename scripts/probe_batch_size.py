"""Does a bigger batch beat B=128 for extraction? Two-point overhead-
cancelled chip-capability rate at several batch sizes (the CLI default is
200 frames/batch; bench measures 128).

Run on TPU: python scripts/probe_batch_size.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_fused import fused_forward

ROUNDS = 4


def main():
    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # params and inputs as ARGUMENTS (closures embed them as constants and
    # the remote compile helper 413s on the request size)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(variables, img_u8, seg_u8, flow_f16, iters):
        def step(carry, i):
            im = (img_u8 ^ (i & 1).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
            sg = jnp.broadcast_to(seg_u8.astype(jnp.bfloat16) / 255.0, im.shape)
            f = fused_forward(variables["params"], variables["batch_stats"],
                              im, sg, flow_f16.astype(jnp.bfloat16), cfg, head,
                              return_features=True, bt=32)
            return carry + jnp.sum(f.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(iters))
        return tot

    for B in (128, 192, 256):
        img = jax.device_put(rng.integers(0, 255, (B, 224, 224, 3), np.uint8))
        seg = jax.device_put(rng.integers(0, 255, (B, 224, 224, 1), np.uint8))
        flw = jax.device_put(rng.standard_normal((B, 224, 224, 2)).astype(np.float16))

        def total(iters):
            _ = np.asarray(chain(variables, img, seg, flw, iters=iters))
            best = float("inf")
            for _r in range(ROUNDS):
                t0 = time.perf_counter()
                _ = np.asarray(chain(variables, img, seg, flw, iters=iters))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = 4, 12
        t = (total(hi) - total(lo)) / (hi - lo)
        print(f"B={B}: {t*1e3:.2f} ms/fwd -> {B/t:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
