"""Probe: can the per-chain feature D2H be hidden behind the next chain's
compute via copy_to_host_async?  Production ran ~1952 fps vs 2667 chip in
round 2 — the gap is feature copy-out ([S, B, 2048] f32 = 8 MB/chain)
apparently serialized after compute instead of overlapped."""

from __future__ import annotations

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
from surgical_tpu.train.extract import make_raw_feature_chain_fn

B, S = 128, 8
CHAINS = 4
ROUNDS = 3


def main():
    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    chain_fn = make_raw_feature_chain_fn(model, variables, depth=S)

    rng = np.random.default_rng(0)
    sup = (
        jax.device_put(rng.integers(0, 255, (S, B, 224, 224, 3), dtype=np.uint8)),
        jax.device_put(rng.integers(0, 255, (S, B, 224, 224, 1), dtype=np.uint8)),
        jax.device_put(rng.standard_normal((S, B, 224, 224, 2)).astype(np.float16)),
    )
    _ = np.asarray(chain_fn(*sup))  # compile + warm

    def run(mode):
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            pend = []
            for _c in range(CHAINS):
                feats = chain_fn(*sup)
                if mode == "async":
                    feats.copy_to_host_async()
                pend.append(feats)
                if len(pend) > (2 if mode == "async" else 1):
                    _ = np.asarray(pend.pop(0))
            for f in pend:
                _ = np.asarray(f)
            rates.append(S * B * CHAINS / (time.perf_counter() - t0))
        return rates

    # no D2H at all (chip reference): sum to scalar on device
    def run_nod2h():
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            outs = [chain_fn(*sup) for _ in range(CHAINS)]
            for f in outs:
                jax.block_until_ready(f)
            _ = np.asarray(outs[-1][0, 0, :8])  # tiny fence
            rates.append(S * B * CHAINS / (time.perf_counter() - t0))
        return rates

    for name, fn in (("sync-overlap1", lambda: run("sync")),
                     ("async-depth2", lambda: run("async")),
                     ("no-d2h", run_nod2h)):
        r = fn()
        print(name, [round(x, 1) for x in r], "median", round(float(np.median(r)), 1),
              flush=True)


if __name__ == "__main__":
    main()
