"""Backbone train-step throughput at the reference's B=88 (train_evp.py
stage-1 config) on the real TPU. Baseline: reference stage-1 trains at ~74
fps/GPU (BASELINE.md); round-1 of this framework measured 421 fps/chip.

Usage: PYTHONPATH=/root/repo python scripts/bench_train.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig, OptimConfig, TrainConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.train.backbone import BackboneTrainer

B = int(os.environ.get("BENCH_B", "88"))
STEPS = 6
ROUNDS = 3


def main():
    import jax.numpy as jnp

    cfg = BackboneConfig.preset("b3")
    model = MiTEVP(cfg, HeadConfig(), compute_dtype=jnp.bfloat16)
    use_fused = os.environ.get("BENCH_FUSED", "0") == "1"
    trainer = BackboneTrainer(
        model,
        TrainConfig(optim=OptimConfig(name="sgd", lr=1e-3, weight_decay=0.0,
                                      grad_clip_norm=None)),
        use_fused=use_fused,
    )
    state = trainer.init(jax.random.key(0))
    params, batch_stats, opt_state = state

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (B, 250, 250, 3), dtype=np.uint8))
    seg = jax.device_put(rng.integers(0, 255, (B, 250, 250, 1), dtype=np.uint8))
    flw = jax.device_put(rng.standard_normal((B, 250, 250, 2)).astype(np.float16))
    labels = jax.device_put(rng.integers(0, 7, (B,)).astype(np.int32))
    ant = jax.device_put(rng.uniform(0, 1, (B, 7)).astype(np.float32))

    step = trainer._train_step
    key = jax.random.key(1)
    # warm/compile
    params, batch_stats, opt_state, loss, *_ = step(
        params, batch_stats, opt_state, img, seg, flw, labels, ant, key)
    np.asarray(loss)

    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            params, batch_stats, opt_state, loss, *_ = step(
                params, batch_stats, opt_state, img, seg, flw, labels, ant,
                jax.random.fold_in(key, i))
        np.asarray(loss)  # D2H fences the stream
        best = max(best, B * STEPS / (time.perf_counter() - t0))
    print(json.dumps({
        "fused": use_fused,
        "train_fps_per_chip": round(best, 1),
        "B": B,
        "vs_round1_421": round(best / 421.0, 2),
        "vs_gpu_74": round(best / 74.0, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
