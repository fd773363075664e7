"""A/B the whole-stage fused stage-3 kernel against 18 chained per-block
kernels, standalone (outside the full serving graph, where the remote
compile helper crashes when stage-3 fusion is embedded). If the standalone
gain is large, a split-dispatch serving pipeline (stages 1-2 in one jit,
stage 3+4+head in another) is worth building around the helper crash."""

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
from surgical_tpu.kernels.mit_block import (
    block_weights_from_params,
    fused_mit_block,
    fused_mit_stage,
    stage_weights_from_params,
)
from surgical_tpu.models.mit_evp import MiTEVP

B = int(os.environ.get("BENCH_B", "128"))
ITERS = 8
ROUNDS = 4
STAGE = int(os.environ.get("BENCH_STAGE", "3"))


def chain_time(fn, x0):
    @jax.jit
    def chained(x):
        def step(c, _):
            y = fn(c)
            # renormalize so 18 blocks x ITERS don't overflow bf16
            return (y * jnp.asarray(0.5, y.dtype)), None

        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(y[0, :1, :1].astype(jnp.float32))

    _ = np.asarray(chained(x0))
    best = float("inf")
    meds = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        _ = np.asarray(chained(x0))
        dt = (time.perf_counter() - t0) / ITERS
        best = min(best, dt)
        meds.append(dt)
    return best, float(np.median(meds))


def main():
    cfg = BackboneConfig.preset("b3")
    model = MiTEVP(cfg, HeadConfig(), compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), variables["params"])

    si = STAGE - 1
    H = W = 56 >> si
    N = H * W
    C = cfg.embed_dims[si]
    sr = cfg.sr_ratios[si]
    heads = cfg.num_heads[si]
    depth = cfg.depths[si]
    bt = {1: 1, 2: 2, 3: 4, 4: 8}[STAGE]
    Nkv = (H // sr) * (W // sr) if sr > 1 else N

    rng = np.random.default_rng(0)
    x = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
    kv = jax.device_put((rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
    base = jax.device_put(
        (rng.standard_normal((B, N, C // cfg.prompt_scale_factor)) * 0.1).astype(jnp.bfloat16))

    report = {"B": B, "stage": STAGE, "depth": depth,
              "device": str(jax.devices()[0])}

    # (a) per-block path: depth x fused_mit_block (fixed k/v — slightly
    # cheaper than production, which recomputes SR k/v per block in XLA)
    bw = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                      block_weights_from_params(params[f"block{STAGE}_0"]))

    def blocks_fn(x):
        for _ in range(depth):
            x = fused_mit_block(x, None, kv, kv, bw, heads=heads, H=H, W=W, bt=bt)
        return x

    best, med = chain_time(blocks_fn, x)
    report["blocks_ms"] = round(best * 1e3, 2)
    report["blocks_ms_median"] = round(med * 1e3, 2)
    print("per-block x%d:" % depth, report["blocks_ms"], "ms", flush=True)

    # (b) whole-stage fused, phases in {1, 2}
    sw = stage_weights_from_params(params, STAGE, depth, jnp.bfloat16)
    for phases in (2, 1):
        try:
            fn = functools.partial(
                fused_mit_stage, base=None, sw=sw, heads=heads, H=H, W=W,
                sr=sr, bt=bt, phases=phases)
            best, med = chain_time(fn, x)
            report[f"stage_ms_p{phases}"] = round(best * 1e3, 2)
            report[f"stage_ms_p{phases}_median"] = round(med * 1e3, 2)
            print(f"fused stage p{phases}:", report[f"stage_ms_p{phases}"],
                  "ms", flush=True)
        except Exception as e:  # noqa: BLE001
            report[f"stage_ms_p{phases}"] = "ERR " + str(e).split("\n")[0][:160]
            print(f"fused stage p{phases} FAILED:",
                  str(e).split(chr(10))[0][:160], flush=True)

    # (c) with prompt base in-kernel (what the full graph would route)
    try:
        fn = functools.partial(
            fused_mit_stage, sw=sw, heads=heads, H=H, W=W, sr=sr, bt=bt,
            phases=2)
        best, med = chain_time(lambda xx: fn(xx, base), x)
        report["stage_base_ms_p2"] = round(best * 1e3, 2)
        print("fused stage p2 + prompt:", report["stage_base_ms_p2"], "ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        report["stage_base_ms_p2"] = "ERR " + str(e).split("\n")[0][:160]
        print("fused stage p2 + prompt FAILED:",
              str(e).split(chr(10))[0][:160], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
