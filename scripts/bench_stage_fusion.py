"""A/B the whole-stage fused kernels against the per-block serving path on
the real TPU: full fused_forward at B=128, chained in one jit (bench.py
methodology), for several fuse_stages routings."""

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

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_fused import fused_forward

B = int(os.environ.get("BENCH_B", "128"))
ITERS = 12
ROUNDS = 4


def main():
    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (B, 224, 224, 3), np.uint8))
    seg = jax.device_put(rng.integers(0, 255, (B, 224, 224, 1), np.uint8))
    flw = jax.device_put(rng.standard_normal((B, 224, 224, 2)).astype(np.float16))

    def make_chain(fuse_stages):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(variables, img_u8, seg_u8, flow_f16, iters):
            def step(carry, i):
                im = (img_u8 ^ (i & 1).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
                sg = jnp.broadcast_to(seg_u8.astype(jnp.bfloat16) / 255.0, im.shape)
                f = fused_forward(
                    variables["params"], variables["batch_stats"],
                    im, sg, flow_f16.astype(jnp.bfloat16), cfg, head,
                    return_features=True, bt=32, fuse_stages=fuse_stages,
                )
                return carry + jnp.sum(f.astype(jnp.float32)), None

            tot, _ = jax.lax.scan(step, 0.0, jnp.arange(iters))
            return tot

        return chain

    report = {"B": B, "device": str(jax.devices()[0])}
    variants = eval(os.environ.get("BENCH_FUSE_VARIANTS", "[(), (4,), (3,), (3, 4)]"))
    for fuse in variants:
        chain = make_chain(fuse)
        try:
            _ = np.asarray(chain(variables, img, seg, flw, iters=ITERS))
        except Exception as e:  # noqa: BLE001 — VMEM OOM etc.: record and move on
            report[str(fuse)] = {"error": str(e).split("\n")[0][:200]}
            print(fuse, "FAILED:", str(e).split(chr(10))[0][:200], flush=True)
            continue
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            _ = np.asarray(chain(variables, img, seg, flw, iters=ITERS))
            rates.append(B * ITERS / (time.perf_counter() - t0))
        report[str(fuse)] = {
            "fps_best": round(max(rates), 1),
            "fps_median": round(float(np.median(rates)), 1),
            "rounds": [round(r, 1) for r in rates],
        }
        print(fuse, report[str(fuse)], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
