"""Per-stage profile of the fused MiT-B3 extraction path on the real TPU.

Times, per stage: the Pallas block loop alone (kernel cost) and the full
stage loop (kernel + XLA-side LN1/SR-conv/KV/prompt adds), plus the whole
fused_forward — the remainder is patch embeds + prompt cascade + flow fusion
+ head. Prints one JSON line of microseconds/image per component.

Measurement discipline (docs/kernel_notes.md): inputs staged in HBM, D2H
forces completion (block_until_ready returns early through the tunnel),
best-of-rounds against +-50% shared-chip noise.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.kernels.mit_block import (
    block_weights_from_params,
    fused_mit_block,
    fused_mit_block_packed2,
    pack_weights2,
)
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_fused import _conv, _dense, _ln, fused_forward

B = int(os.environ.get("PROF_B", "128"))
ITERS = 8
ROUNDS = 3


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + drain
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # D2H fences the stream
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), variables["params"])
    batch_stats = variables["batch_stats"]

    rng = np.random.default_rng(0)
    report = {"B": B, "device": str(jax.devices()[0])}

    HW = 224 // 4
    for si in range(4):
        stage = si + 1
        C = cfg.embed_dims[si]
        H = W = HW // (2 ** si if si else 1)
        H = W = 56 >> si
        N = H * W
        depth = cfg.depths[si]
        heads = cfg.num_heads[si]
        sr = cfg.sr_ratios[si]
        Nkv = (H // sr) * (W // sr) if sr > 1 else N

        x = jax.device_put(
            (rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
        kv_fixed = jax.device_put(
            (rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
        bweights = [
            jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                         block_weights_from_params(params[f"block{stage}_{d}"]))
            for d in range(depth)
        ]
        bp_all = [params[f"block{stage}_{d}"] for d in range(depth)]

        bt_fit = max(1, min(32, (1 << 19) // (N * C * 2)))
        while B % bt_fit != 0:
            bt_fit -= 1

        # NOTE: return a scalar — D2H of a [B, N, C] stage output through the
        # collapsed tunnel (~0.1 GB/s) would dominate the timing by 10x.

        packed = False  # packed2 unrouted: VMEM-edge at N=3136 (see mit_fused.py)
        pweights = [pack_weights2(w) for w in bweights] if packed else None

        # (a) Pallas kernels only: LN1 + block loop with fixed k/v
        def blocks_only(x):
            for d in range(depth):
                xln = _ln(x, bp_all[d]["norm1"])
                if packed:
                    x = fused_mit_block_packed2(x, kv_fixed, kv_fixed,
                                                pweights[d], H=H, W=W)
                else:
                    x = fused_mit_block(x, xln, kv_fixed, kv_fixed, bweights[d],
                                        heads=heads, H=H, W=W, bt=bt_fit)
            return jnp.sum(x.astype(jnp.float32))

        # (b) full stage: + SR conv + KV proj per block (as mit_fused runs)
        def full_stage(x):
            for d in range(depth):
                bp = bp_all[d]
                xln = _ln(x, bp["norm1"])
                if sr > 1:
                    red = _conv(xln.reshape(B, H, W, C), bp["attn"]["sr"], sr, "VALID")
                    kv_in = _ln(red.reshape(B, -1, C), bp["attn"]["norm"])
                else:
                    kv_in = xln
                kv = _dense(kv_in, bp["attn"]["kv"])
                if packed:
                    x = fused_mit_block_packed2(x, kv[..., :C], kv[..., C:],
                                                pweights[d], H=H, W=W)
                else:
                    x = fused_mit_block(x, xln, kv[..., :C], kv[..., C:], bweights[d],
                                        heads=heads, H=H, W=W, bt=bt_fit)
            return jnp.sum(x.astype(jnp.float32))

        t_a = timeit(jax.jit(blocks_only), x)
        t_b = timeit(jax.jit(full_stage), x)
        report[f"stage{stage}"] = {
            "N": N, "C": C, "depth": depth, "bt": bt_fit,
            "pallas_us_per_img": round(t_a / B * 1e6, 1),
            "full_us_per_img": round(t_b / B * 1e6, 1),
            "xla_side_us_per_img": round((t_b - t_a) / B * 1e6, 1),
        }

    img = jax.device_put((rng.standard_normal((B, 224, 224, 3)) * 0.1).astype(jnp.bfloat16))
    seg = jax.device_put((rng.standard_normal((B, 224, 224, 3)) * 0.1).astype(jnp.bfloat16))
    flw = jax.device_put((rng.standard_normal((B, 224, 224, 2)) * 0.1).astype(jnp.bfloat16))

    def full(img, seg, flw):
        return fused_forward(params, batch_stats, img, seg, flw, cfg, head,
                             return_features=True, bt=32)

    t_full = timeit(full, img, seg, flw)
    stage_total = sum(report[f"stage{s}"]["full_us_per_img"] for s in range(1, 5))
    report["full_forward_us_per_img"] = round(t_full / B * 1e6, 1)
    report["fps_per_chip"] = round(B / t_full, 1)
    report["non_stage_us_per_img"] = round(t_full / B * 1e6 - stage_total, 1)

    # no-flow variant (CholecSegmapDataset config)
    def full_noflow(img, seg):
        return fused_forward(params, batch_stats, img, seg, None, cfg, head,
                             return_features=True, bt=32)

    t_nf = timeit(full_noflow, img, seg)
    report["full_noflow_us_per_img"] = round(t_nf / B * 1e6, 1)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
