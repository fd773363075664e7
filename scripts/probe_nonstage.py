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
ROUNDS = int(os.environ.get("PROF_ROUNDS", "4"))
LO, HI = 8, 24
# which stages run the kernel-fold routing in leg (b); default mirrors
# mit_fused._FOLD_STAGES (empty — the fold measured a loss at every
# stage). Override to A/B a stage: PROF_FOLD=1,2,3
_FOLD = tuple(int(s) for s in os.environ.get("PROF_FOLD", "").split(",")
              if s.strip())
# which stages batch the D lightweight_mlp prompts into one stage-entry
# dot; default mirrors mit_fused._BATCH_PROMPT_STAGES (s1 = the measured
# winner). Override: PROF_BATCH=1,2,3
_BATCH = tuple(int(s) for s in os.environ.get("PROF_BATCH", "1").split(",")
               if s.strip())
# PROF_NO_EMIT=1: fold ONLY the prompt add (pnext_feat, one extra kernel
# input) and keep LN1 in XLA — isolates the fold's two halves (the full
# fold's second output store doubles the kernel's store traffic per step)
_NO_EMIT = os.environ.get("PROF_NO_EMIT", "") == "1"


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
                 pnext_feat=None, prompt_shared=None, ln_next=None):
            if heads == 2 and bt * C * heads * Nkv * 4 <= (3 << 19):
                return fused_mit_block_hb(x, None, kk, vv, bws[d],
                                          heads=heads, H=H, W=W, bt=bt,
                                          pnext_feat=pnext_feat,
                                          prompt_shared=prompt_shared,
                                          ln_next=ln_next)
            return fused_mit_block(x, None, kk, vv, bws[d],
                                   heads=heads, H=H, W=W, bt=bt,
                                   pnext_feat=pnext_feat,
                                   prompt_shared=prompt_shared,
                                   ln_next=ln_next)

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

        # (b) AS ROUTED round 4 (mit_fused._FOLD_STAGES /
        # _BATCH_PROMPT_STAGES): on batch stages the D prompt MLPs run as
        # one stage-entry dot; on fold stages the kernel additionally
        # finishes the NEXT block's shared_mlp from its C4 feat and emits
        # LN — both A/B-able via PROF_FOLD / PROF_BATCH.
        fold = stage in _FOLD
        batch = fold or stage in _BATCH

        def full_stage(x):
            shared = pg[f"shared_mlp{stage}"]

            def prompt_feat(d):
                f = _dense(base, pg[f"lightweight_mlp{stage}_{d}"])
                return jax.nn.gelu(f.astype(jnp.float32),
                                   approximate=False).astype(x.dtype)

            if batch:
                lww = jnp.concatenate(
                    [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["kernel"], x.dtype)
                     for d in range(depth)], axis=1)
                lwb = jnp.concatenate(
                    [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["bias"])
                     for d in range(depth)])
                feat = _dense(base, {"kernel": lww, "bias": lwb})
                feat = jax.nn.gelu(feat.astype(jnp.float32),
                                   approximate=False).astype(x.dtype)
                feat = feat.reshape(B, N, depth, C4)
                x = x + _dense(feat[:, :, 0], shared)
            else:
                feat = None
                x = x + _dense(prompt_feat(0), shared)
            xln = _ln(x, bps[0]["norm1"])
            for d in range(depth):
                bp = bps[d]
                if d > 0 and not fold:
                    fd = feat[:, :, d] if batch else prompt_feat(d)
                    x = x + _dense(fd, shared)
                    xln = _ln(x, bp["norm1"])
                red = _conv(xln.reshape(B, H, W, C), bp["attn"]["sr"], sr, "VALID")
                kv_in = _ln(red.reshape(B, -1, C), bp["attn"]["norm"])
                kv = _dense(kv_in, bp["attn"]["kv"])
                if fold and _NO_EMIT:
                    pnext_feat = feat[:, :, d + 1] if d + 1 < depth else None
                    x = kern(x, kv[..., :C], kv[..., C:], d,
                             pnext_feat=pnext_feat, prompt_shared=shared)
                    nrm = bps[d + 1]["norm1"] if d + 1 < depth else bps[0]["norm1"]
                    xln = _ln(x, nrm)
                elif fold:
                    pnext_feat = feat[:, :, d + 1] if d + 1 < depth else None
                    ln_next = (bps[d + 1]["norm1"] if d + 1 < depth
                               else bps[0]["norm1"])  # stand-in for norm{stage}
                    x, xln = kern(x, kv[..., :C], kv[..., C:], d,
                                  pnext_feat=pnext_feat, prompt_shared=shared,
                                  ln_next=ln_next)
                else:
                    x = kern(x, kv[..., :C], kv[..., C:], d)
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
