"""Split the serving graph's non-stage 14.4 ms (docs/roofline.md): how much
is per-block XLA-side work (LN1 for the k/v path + SR conv + kv projection +
prompt MLP adds) vs whole-graph extras (patch embeds, prompt cascade, flow
encoder + cross-attn, head)?

Per stage, measures (overhead-cancelled two-point chains, roofline
methodology):
  (a) the kernel block loop alone (fixed k/v, in-kernel LN1) — same as
      roofline's stage rows;
  (b) the stage AS ROUTED in mit_fused.fused_forward: per-block prompt add
      + XLA LN1 + SR conv + kv proj + the same kernels.
(b) - (a) = the XLA-side per-block cost; full_forward - sum(b) = extras.

Run on TPU: python scripts/probe_nonstage.py
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

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.kernels.mit_block import (
    block_weights_from_params,
    fused_mit_block,
    fused_mit_block_hb,
)
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_fused import _conv, _dense, _ln

B = int(os.environ.get("PROF_B", "128"))
ROUNDS = 4
LO, HI = 8, 24


from scripts._timing import chain_time as _chain_time


def chain_time(fn, x0):
    return _chain_time(fn, x0, LO, HI, ROUNDS)


def main():
    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), variables["params"])
    pg = params["prompt_generator"]

    rng = np.random.default_rng(0)
    report = {"B": B, "device": str(jax.devices()[0])}
    sum_b = 0.0
    for si in range(3):  # stages 1-3 (s4 runs the whole-stage fused kernel)
        stage = si + 1
        C = cfg.embed_dims[si]
        H = W = 56 >> si
        N = H * W
        depth = cfg.depths[si]
        heads = cfg.num_heads[si]
        sr = cfg.sr_ratios[si]
        Nkv = (H // sr) * (W // sr)
        C4 = C // cfg.prompt_scale_factor

        x0 = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
        kvf = jax.device_put((rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
        base = jax.device_put((rng.standard_normal((B, N, C4)) * 0.1).astype(jnp.bfloat16))
        bws = [
            jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                         block_weights_from_params(params[f"block{stage}_{d}"]))
            for d in range(depth)
        ]
        bps = [params[f"block{stage}_{d}"] for d in range(depth)]

        bt_fit = max(1, min(32, (1 << 19) // (N * C * 2)))
        while B % bt_fit != 0:
            bt_fit -= 1

        def kern(x, kk, vv, d, bt=bt_fit, heads=heads, H=H, W=W, Nkv=Nkv,
                 pnext=None, ln_next=None):
            if heads == 2 and bt * C * heads * Nkv * 4 <= (3 << 19):
                return fused_mit_block_hb(x, None, kk, vv, bws[d],
                                          heads=heads, H=H, W=W, bt=bt,
                                          pnext=pnext, ln_next=ln_next)
            return fused_mit_block(x, None, kk, vv, bws[d],
                                   heads=heads, H=H, W=W, bt=bt,
                                   pnext=pnext, ln_next=ln_next)

        # (a) kernels only, fixed kv
        def blocks_only(x):
            for d in range(depth):
                x = kern(x, kvf, kvf, d)
                x = x * jnp.asarray(0.6, x.dtype)
            return x

        # (b-legacy) the round-3 routing: per-block prompt MLP + add + XLA
        # LN1 + SR + kv per block (kept as the A side of the fold A/B)
        def full_stage_r3(x):
            for d in range(depth):
                feat = _dense(base, pg[f"lightweight_mlp{stage}_{d}"])
                feat = jax.nn.gelu(feat.astype(jnp.float32), approximate=False).astype(x.dtype)
                x = x + _dense(feat, pg[f"shared_mlp{stage}"])
                bp = bps[d]
                xln = _ln(x, bp["norm1"])
                red = _conv(xln.reshape(B, H, W, C), bp["attn"]["sr"], sr, "VALID")
                kv_in = _ln(red.reshape(B, -1, C), bp["attn"]["norm"])
                kv = _dense(kv_in, bp["attn"]["kv"])
                x = kern(x, kv[..., :C], kv[..., C:], d)
                x = x * jnp.asarray(0.6, x.dtype)
            return x

        # (b) AS ROUTED round 4 (mit_fused): batched prompt precompute at
        # stage entry, pnext folded into the previous kernel's write, LN
        # emitted by the kernel — XLA side per block = SR conv + kv only
        def full_stage(x):
            lww = jnp.concatenate(
                [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["kernel"], x.dtype)
                 for d in range(depth)], axis=1)
            lwb = jnp.concatenate(
                [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["bias"])
                 for d in range(depth)])
            feat = _dense(base, {"kernel": lww, "bias": lwb})
            feat = jax.nn.gelu(feat.astype(jnp.float32), approximate=False).astype(x.dtype)
            feat = feat.reshape(B, N, depth, C4)
            pf = jnp.dot(feat, jnp.asarray(pg[f"shared_mlp{stage}"]["kernel"], x.dtype),
                         preferred_element_type=jnp.float32)
            pf = (pf + pg[f"shared_mlp{stage}"]["bias"]).astype(x.dtype)
            pf = jnp.moveaxis(pf, 2, 0)
            x = x + pf[0]
            xln = _ln(x, bps[0]["norm1"])
            for d in range(depth):
                bp = bps[d]
                red = _conv(xln.reshape(B, H, W, C), bp["attn"]["sr"], sr, "VALID")
                kv_in = _ln(red.reshape(B, -1, C), bp["attn"]["norm"])
                kv = _dense(kv_in, bp["attn"]["kv"])
                pnext = pf[d + 1] if d + 1 < depth else None
                ln_next = (bps[d + 1]["norm1"] if d + 1 < depth
                           else bps[0]["norm1"])  # stand-in for norm{stage}
                x, xln = kern(x, kv[..., :C], kv[..., C:], d,
                              pnext=pnext, ln_next=ln_next)
                x = x * jnp.asarray(0.6, x.dtype)
            return x

        t_a = chain_time(blocks_only, x0) * 1e3
        t_b3 = chain_time(full_stage_r3, x0) * 1e3
        t_b = chain_time(full_stage, x0) * 1e3
        sum_b += t_b
        report[f"s{stage}"] = {
            "kernel_ms": round(t_a, 2),
            "routed_r3_ms": round(t_b3, 2), "routed_ms": round(t_b, 2),
            "fold_gain_ms": round(t_b3 - t_b, 2),
            "xla_side_ms": round(t_b - t_a, 2), "depth": depth,
            "xla_side_ms_per_block": round((t_b - t_a) / depth, 3),
        }
        print(f"s{stage}", report[f"s{stage}"], flush=True)

    report["stages_1_3_routed_ms"] = round(sum_b, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
