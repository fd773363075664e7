"""Fused inference forward for the MiT-EVP backbone.

A pure functional serving graph over the SAME parameter pytree as
``models.mit_evp.MiTEVP`` (checkpoint-compatible by construction): flax
stays the training surface; extraction/serving runs this lean path where
every transformer block is one fused Pallas kernel
(kernels/mit_block.fused_mit_block) — two activation reads + one write per
block instead of ~10 HBM round-trips.

Inference-only (no dropout/droppath; BatchNorm uses running stats).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.kernels.mit_block import (
    block_weights_from_params,
    fused_mit_block,
    fused_mit_block_hb,
    fused_mit_block_packed2,
    fused_mit_stage,
    pack_weights2,
    stage_weights_from_params,
)

# Whole-stage fusion routing (round 3): stages whose blocks run as ONE
# pallas call with the activation resident in VMEM and per-block weights
# streamed (kernels/mit_block.fused_mit_stage). Probe data
# (scripts/probe_stage_fusion.py): stages 3/4 are ~78-80% activation-DMA
# at their block shapes, while streamed weights move at ~5-10x the
# small-block rate. Stage 1 is excluded — its 8x8 stride-8 SR conv would
# cost 64 full-resolution tap matmuls in-kernel — and stage 2's 16-tap SR
# makes fusion roughly cost-neutral, so both keep the per-block path.
# Stage 3 is excluded too: fused_mit_stage(3) compiles standalone but the
# tpu_compile_helper crashes (HTTP 500, subprocess exit 1) whenever it is
# embedded in the full serving graph — reproduced across two sessions with
# TPU_ACCELERATOR_TYPE set (scripts/bench_stage_fusion.py). Measured A/B at
# B=128: () 2570 fps, (4,) 2618 fps median, so (4,) is routed.
_FUSE_STAGES: tuple = (4,)
_FUSE_BT = {2: 2, 3: 4, 4: 8}
_FUSE_PHASES = {2: 2, 3: 2, 4: 1}

# Round-4 prompt/LN fold routing: stages whose per-block kernels absorb the
# next block's prompt add (C4 feat + in-kernel shared_mlp) and emit LN(y)
# for the next kv path. MEASURED A LOSS AT EVERY STAGE (probe_nonstage
# round 4: s1 -2.2 ms, s2 -0.2, s3 -0.3 vs the round-3 routing — the
# kernel's second activation-sized store (LN(y)) plus the per-grid-step
# feat input outweigh the XLA round-trip they replace), so no stage routes
# here by default; the mechanism stays tested + A/B-able (PROF_FOLD).
# Stage 3 additionally OOMs the 16 MB scoped-VMEM limit with a full-C
# pnext (18.3M at bt=4); stage 4 routes to the whole-stage kernel which
# already does in-kernel prompt adds.
_FOLD_STAGES: tuple = ()

# Stages whose D per-block lightweight_mlp prompts are batched into ONE
# stage-entry dot (pure-XLA restructure, no kernel change; legal because
# every depth's prompt depends only on the stage-entry base —
# mix_transformer_evp.py:776-815). Measured (probe_nonstage round 4,
# fold_probe3): WINS +0.85 ms at s1 (depth 3, N=3136 — fewer fusion
# boundaries on the biggest activations), ~wash at s2 (-0.17), LOSES
# -1.1 ms at s3 (depth 18: the [B,N,18,C4] feat block round-trips HBM
# where the per-block MLP fuses into the add). Only s1 routes here.
_BATCH_PROMPT_STAGES: tuple = (1,)

# 2-images-per-lane-row packed kernel for C=64 stages. Round-2 history: the
# unchunked kernel measured ~3-5% faster than the loop kernel but sat AT the
# 16 MB scoped-VMEM limit at N=3136, flipping OOM with compile-to-compile
# variance (docs/kernel_notes.md packed2 postmortem) — unrouted. Round 5
# added the containment axis the postmortem never tried: SPATIAL row-chunking
# on the pallas grid (1-row dwconv halo, attention rows are k/v-local), which
# shrinks every [N, *] temporary by the chunk factor instead of chunking
# hidden — _PACKED2_ROW_CHUNKS bands per image pair bound scoped VMEM at
# ~9 MB for N=3136. Routed when measured on chip (see kernel_notes round 5).
_ROUTE_PACKED2 = False
_PACKED2_ROW_CHUNKS = 2
_PACKED2_MIN_N_FOR_CHUNKING = 2048
from surgical_tpu.models.mit_evp import gaussian_blur_5x5
from surgical_tpu.models.segformer_head import bilinear_resize


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, -1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, -1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def _conv(x, p, stride, padding):
    # NO preferred_element_type: the conv transpose rule rejects a f32
    # cotangent against a bf16 kernel (the train path differentiates this),
    # and the TPU conv accumulates in f32 internally regardless — the
    # result is rounded once to x.dtype either way.
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def _bn(x, p, stats):
    inv = jax.lax.rsqrt(stats["var"] + 1e-5) * p["scale"]
    return ((x.astype(jnp.float32) - stats["mean"]) * inv + p["bias"]).astype(x.dtype)


def _patch_embed(x, p, patch, stride):
    pad = [(patch // 2, patch // 2)] * 2
    y = _conv(x, p["proj"], stride, pad)
    B, H, W, C = y.shape
    return _ln(y.reshape(B, H * W, C), p["norm"]), H, W


def _prompts(params, segmap, cfg: BackboneConfig):
    """Handcrafted prompt cascade (PromptGenerator.init_prompts)."""
    pg = params["prompt_generator"]
    x = gaussian_blur_5x5(segmap) if cfg.input_type == "gaussian" else segmap
    feats = {}
    prev = x
    for s in (1, 2, 3, 4):
        key = f"handcrafted_generator{s}"
        if key not in pg:
            feats[s] = None
            continue
        patch, stride = (7, 4) if s == 1 else (3, 2)
        tokens, H, W = _patch_embed(prev, pg[key], patch, stride)
        feats[s] = tokens
        prev = tokens.reshape(tokens.shape[0], H, W, -1)
    return feats


def _cross_attn(x_visual, x_flow, p, heads: int):
    B, Nv, C = x_visual.shape
    hd = C // heads
    q = _dense(x_visual, p["q_proj"]).reshape(B, Nv, heads, hd)
    k = _dense(x_flow, p["k_proj"]).reshape(B, -1, heads, hd)
    v = _dense(x_flow, p["v_proj"]).reshape(B, -1, heads, hd)
    a = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
    a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(x_visual.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, Nv, C)
    return _ln(x_visual + _dense(o, p["out_proj"]), p["norm"])


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "head_cfg", "return_features", "bt", "fuse_stages"),
)
def fused_forward(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    segmaps: jax.Array,
    flow: Optional[jax.Array],
    cfg: BackboneConfig,
    head_cfg: HeadConfig,
    return_features: bool = True,
    bt: int = 8,
    fuse_stages: tuple = _FUSE_STAGES,
):
    dt = jnp.bfloat16
    x = images.astype(dt)
    B = x.shape[0]

    handcrafted = _prompts(params, segmaps.astype(dt), cfg) if cfg.handcrafted_tune \
        else {s: None for s in (1, 2, 3, 4)}
    pg = params["prompt_generator"]

    grids = []
    for si in range(4):
        stage = si + 1
        patch, stride = (7, 4) if si == 0 else (3, 2)
        x, H, W = _patch_embed(x, params[f"patch_embed{stage}"], patch, stride)
        N, C = x.shape[1], x.shape[2]

        tuned = str(stage) in cfg.tuning_stage
        base = None
        if tuned:
            hand = handcrafted[stage]
            emb = _dense(x, pg[f"embedding_generator{stage}"]) if cfg.embedding_tune else None
            base = hand + emb if (hand is not None and emb is not None) else (
                hand if hand is not None else emb
            )

        if stage in fuse_stages and B % _FUSE_BT[stage] == 0:
            # whole-stage fused kernel: resident activation, streamed
            # per-block weights, in-kernel SR/kv + prompt adds
            sw = stage_weights_from_params(params, stage, cfg.depths[si], dt)
            x = fused_mit_stage(
                x, base if (tuned and base is not None) else None, sw,
                heads=cfg.num_heads[si], H=H, W=W, sr=cfg.sr_ratios[si],
                bt=_FUSE_BT[stage], phases=_FUSE_PHASES[stage],
            )
            x = _ln(x, params[f"norm{stage}"])
            grids.append(x.reshape(B, H, W, C))
            x = grids[-1]
            continue

        # Round-4 prompt restructure (VERDICT r3 item 1): every depth's
        # prompt feature depends ONLY on the stage-entry base (reference
        # mix_transformer_evp.py:776-815 — init_prompt runs once per
        # stage), so all D lightweight_mlp matmuls CAN batch into one
        # stage-entry dot (_BATCH_PROMPT_STAGES — measured winner at s1
        # only) and each block's `x + shared_mlp(feat)` CAN fold into the
        # previous kernel's residual write (_FOLD_STAGES — measured loss
        # everywhere; kept A/B-able). Default routing: s1 batches the
        # precompute, every stage keeps the prompt add + LN1 in XLA.
        depth = cfg.depths[si]
        fold = stage in _FOLD_STAGES
        batch_prompt = fold or stage in _BATCH_PROMPT_STAGES
        feat = None  # [B, N, depth, C4] when batch_prompt, else per-block
        shared = None

        def _prompt_feat(d):
            f = _dense(base, pg[f"lightweight_mlp{stage}_{d}"])
            return jax.nn.gelu(f.astype(jnp.float32),
                               approximate=False).astype(dt)

        if tuned and base is not None:
            shared = pg[f"shared_mlp{stage}"]
            if batch_prompt:
                C4 = pg[f"lightweight_mlp{stage}_0"]["kernel"].shape[-1]
                lww = jnp.concatenate(
                    [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["kernel"], dt)
                     for d in range(depth)], axis=1)          # [Cb, D*C4]
                lwb = jnp.concatenate(
                    [jnp.asarray(pg[f"lightweight_mlp{stage}_{d}"]["bias"])
                     for d in range(depth)])                  # [D*C4]
                feat = _dense(base, {"kernel": lww, "bias": lwb})
                feat = jax.nn.gelu(feat.astype(jnp.float32),
                                   approximate=False).astype(dt)
                feat = feat.reshape(B, N, depth, C4)
                x = x + _dense(feat[:, :, 0], shared)
            else:
                x = x + _dense(_prompt_feat(0), shared)
        xln = _ln(x, params[f"block{stage}_0"]["norm1"])

        for d in range(depth):
            bp = params[f"block{stage}_{d}"]
            if d > 0 and not fold:
                # per-block prompt add + LN in XLA (the round-3 routing)
                if shared is not None:
                    fd = feat[:, :, d] if batch_prompt else _prompt_feat(d)
                    x = x + _dense(fd, shared)
                xln = _ln(x, bp["norm1"])
            attn = bp["attn"]
            if cfg.sr_ratios[si] > 1:
                sr = cfg.sr_ratios[si]
                red = _conv(xln.reshape(B, H, W, C), attn["sr"], sr, "VALID")
                kv_in = _ln(red.reshape(B, -1, C), attn["norm"])
            else:
                kv_in = xln
            kv = _dense(kv_in, attn["kv"])
            k, v = kv[..., :C], kv[..., C:]

            weights = jax.tree.map(
                lambda a: jnp.asarray(a, dt), block_weights_from_params(bp)
            )
            # fold stages: the NEXT block's prompt (C4 feat + shared matmul)
            # folds into this kernel's residual write, and the kernel emits
            # LN(y) under the next block's norm1 (or the stage-final norm
            # for the last block) — the per-block XLA side shrinks to the
            # dependency-locked SR/kv chain
            pnext_feat = (feat[:, :, d + 1]
                          if fold and feat is not None and d + 1 < depth
                          else None)
            ln_next = (params[f"block{stage}_{d + 1}"]["norm1"]
                       if d + 1 < depth else params[f"norm{stage}"]) \
                if fold else None
            if _ROUTE_PACKED2 and C == 64 and cfg.num_heads[si] == 1 and B % 2 == 0:
                rc = (_PACKED2_ROW_CHUNKS
                      if N >= _PACKED2_MIN_N_FOR_CHUNKING
                      and H % _PACKED2_ROW_CHUNKS == 0 else 1)
                x = fused_mit_block_packed2(
                    x, k, v, pack_weights2(weights), H=H, W=W, row_chunks=rc,
                )
                if pnext_feat is not None:
                    x = x + _dense(pnext_feat, shared)
                if fold:
                    xln = _ln(x, ln_next)
            else:
                # per-stage batch tile sized to VMEM: ~0.5 MB of [N, C]
                # activations per image (x, xln, out blocks are double-
                # buffered; the kernel's f32 temporaries dominate at large N)
                heads = cfg.num_heads[si]
                Nkv = k.shape[1]
                bt_fit = max(1, min(bt, (1 << 19) // (N * C * 2)))
                while B % bt_fit != 0:
                    bt_fit -= 1
                # xln=None -> the kernel recomputes LN1 in-VMEM from x,
                # dropping one activation-sized block read per grid step
                # (the xln it emits feeds the NEXT block's SR k/v path)
                if heads == 2 and bt_fit * C * heads * Nkv * 4 <= (3 << 19):
                    # head-batched attention: scores + softmax for both heads
                    # from one dot over a head-block-diagonal k^T + segment
                    # softmax. Wins ~7% per block at heads=2 (measured);
                    # at heads>=5 the heads-x FLOP waste of the block-diagonal
                    # scores dot outweighs the batching, so those stages keep
                    # the per-head loop.
                    out = fused_mit_block_hb(
                        x, None, k, v, weights,
                        heads=heads, H=H, W=W, bt=bt_fit,
                        pnext_feat=pnext_feat, prompt_shared=shared,
                        ln_next=ln_next,
                    )
                else:
                    out = fused_mit_block(
                        x, None, k, v, weights,
                        heads=heads, H=H, W=W, bt=bt_fit,
                        pnext_feat=pnext_feat, prompt_shared=shared,
                        ln_next=ln_next,
                    )
                x, xln = out if fold else (out, xln)
        if fold:
            # the last kernel's emitted LN is the stage-final norm{stage}
            x = xln
        else:
            x = _ln(x, params[f"norm{stage}"])
        grids.append(x.reshape(B, H, W, C))
        x = grids[-1]

    if cfg.with_flow and flow is not None:
        fe = params["flow_encoder"]
        fs = batch_stats["flow_encoder"]
        f = flow.astype(dt)
        def enc(h, i, k, s):
            h = _conv(h, fe[f"conv{i}"], s, [(k // 2, k // 2)] * 2)
            return jax.nn.relu(_bn(h, fe[f"bn{i}"], fs[f"bn{i}"]))
        f = enc(f, 1, 7, 4)
        f = enc(f, 2, 3, 2)
        f3 = enc(f, 3, 3, 2)
        f4 = enc(f3, 4, 3, 2)
        t3 = grids[2].reshape(B, -1, cfg.embed_dims[2])
        t3 = _cross_attn(t3, f3.reshape(B, -1, cfg.embed_dims[2]),
                         params["cross_attn_s3"], cfg.flow_heads)
        grids[2] = t3.reshape(grids[2].shape)
        t4 = grids[3].reshape(B, -1, cfg.embed_dims[3])
        t4 = _cross_attn(t4, f4.reshape(B, -1, cfg.embed_dims[3]),
                         params["cross_attn_s4"], cfg.flow_heads)
        grids[3] = t4.reshape(grids[3].shape)

    # head
    hp = params["head"]
    hs = batch_stats["head"]
    target = grids[3].shape[1:3]
    parts = []
    for i, g in ((4, grids[3]), (3, grids[2]), (2, grids[1]), (1, grids[0])):
        # resize commutes with the linear projection: downsample at C_stage
        if g.shape[1:3] != target:
            g = bilinear_resize(g, target)
        parts.append(_dense(g, hp[f"linear_c{i}"]))
    h = jnp.concatenate(parts, axis=-1)
    h = _conv(h, hp["linear_fuse"], 1, "VALID")
    h = jax.nn.relu(_bn(h, hp["fuse_bn"], hs["fuse_bn"]))
    feat = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
    if return_features:
        return feat

    def mlp_head(hh, name):
        hh = jax.nn.relu(_dense(hh, hp[f"{name}_1"]))
        return _dense(hh, hp[f"{name}_2"])

    return mlp_head(feat, "fc"), mlp_head(feat, "fc_ant")
