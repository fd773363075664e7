"""Fused TRAINING forward for the MiT-EVP backbone.

The training analogue of ``models.mit_fused``: a pure functional graph over
the SAME parameter pytree as ``models.mit_evp.MiTEVP`` where every frozen
transformer block runs as one fused Pallas kernel in BOTH directions
(kernels/mit_block.fused_mit_block_train — custom VJP, flash-style
recompute backward). Everything the reference recipe trains —
prompt generator, flow encoder, cross-attention fusions, head
(train_evp.py:379-382) — stays in differentiable XLA ops, so its gradients
are exact autodiff; the frozen trunk contributes only chain gradients,
which the kernel computes in-VMEM.

Train-mode semantics reproduced from the flax model:
  - per-sample stochastic depth on both block branches
    (mix_transformer_evp.py Block / DropPath), rate ramp 0..drop_path_rate
  - BatchNorm batch statistics + running-stat updates (momentum 0.99,
    flax default) in the flow encoder and the head fuse-BN
  - channel dropout (Dropout2d) before the head pool

Returns logits and the updated batch_stats; the loss/optimizer side is
train/backbone.py's unchanged.
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
    fused_mit_block_train,
)
from surgical_tpu.models.mit_fused import (
    _conv,
    _cross_attn,
    _dense,
    _ln,
    _patch_embed,
    _prompts,
)
from surgical_tpu.models.segformer_head import bilinear_resize

BN_MOMENTUM = 0.99  # flax nn.BatchNorm default — matches the flax model


def _bn_train(x, p, stats, eps=1e-5):
    """BatchNorm in training mode: normalize by batch stats, return the
    running-stat update (flax BatchNorm semantics, biased variance)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(x32 * x32, axis=axes) - mean * mean
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    new = {
        "mean": BN_MOMENTUM * stats["mean"] + (1 - BN_MOMENTUM) * mean,
        "var": BN_MOMENTUM * stats["var"] + (1 - BN_MOMENTUM) * var,
    }
    return y.astype(x.dtype), new


def _droppath_masks(rng, rates, B, dtype=jnp.float32):
    """Per-block, per-branch DropPath multipliers: {0, 1/keep} per sample."""
    masks = []
    for i, rate in enumerate(rates):
        if rate == 0.0:
            masks.append((jnp.ones((B,), dtype), jnp.ones((B,), dtype)))
            continue
        keep = 1.0 - rate
        k1 = jax.random.fold_in(rng, 2 * i)
        k2 = jax.random.fold_in(rng, 2 * i + 1)
        m1 = jax.random.bernoulli(k1, keep, (B,)).astype(dtype) / keep
        m2 = jax.random.bernoulli(k2, keep, (B,)).astype(dtype) / keep
        masks.append((m1, m2))
    return masks


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "head_cfg", "compute_dtype", "interpret"),
)
def fused_train_forward(
    params: dict,
    batch_stats: dict,
    images: jax.Array,
    segmaps: jax.Array,
    flow: Optional[jax.Array],
    rng: jax.Array,
    cfg: BackboneConfig,
    head_cfg: HeadConfig,
    compute_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
):
    """One training forward: (phase_logits, ant_logits, new_batch_stats).

    ``params`` is the full MiTEVP tree; callers differentiate only the
    trainable subtree (train/backbone.py::partition_params) — block weight
    cotangents from the fused kernel are structurally zero.
    """
    dt = compute_dtype
    x = images.astype(dt)
    B = x.shape[0]
    rng_dp, rng_drop = jax.random.split(rng)

    dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
    dp_masks = _droppath_masks(rng_dp, [float(r) for r in dpr], B)

    handcrafted = _prompts(params, segmaps.astype(dt), cfg) if cfg.handcrafted_tune \
        else {s: None for s in (1, 2, 3, 4)}
    pg = params["prompt_generator"]

    cur = 0
    grids = []
    for si in range(4):
        stage = si + 1
        patch, stride = (7, 4) if si == 0 else (3, 2)
        x, H, W = _patch_embed(x, params[f"patch_embed{stage}"], patch, stride)
        N, C = x.shape[1], x.shape[2]

        tuned = str(stage) in cfg.tuning_stage
        if tuned:
            hand = handcrafted[stage]
            emb = _dense(x, pg[f"embedding_generator{stage}"]) if cfg.embedding_tune else None
            base = hand + emb if (hand is not None and emb is not None) else (
                hand if hand is not None else emb
            )

        for d in range(cfg.depths[si]):
            if tuned and base is not None:
                feat = _dense(base, pg[f"lightweight_mlp{stage}_{d}"])
                feat = jax.nn.gelu(feat.astype(jnp.float32), approximate=False).astype(dt)
                x = x + _dense(feat, pg[f"shared_mlp{stage}"])

            bp = params[f"block{stage}_{d}"]
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
            m1, m2 = dp_masks[cur + d]
            bt = max(1, min(8, (1 << 19) // (N * C * 2)))
            while B % bt != 0:
                bt -= 1
            x = fused_mit_block_train(
                x, xln, k, v, weights, m1, m2,
                heads=cfg.num_heads[si], H=H, W=W, bt=bt, interpret=interpret,
            )
        cur += cfg.depths[si]
        x = _ln(x, params[f"norm{stage}"])
        grids.append(x.reshape(B, H, W, C))
        x = grids[-1]

    new_bs = jax.tree.map(lambda a: a, batch_stats)  # shallow copy
    if cfg.with_flow and flow is not None:
        fe = params["flow_encoder"]
        fs = batch_stats["flow_encoder"]
        new_fs = {}
        f = flow.astype(dt)

        def enc(h, i, kk, s):
            h = _conv(h, fe[f"conv{i}"], s, [(kk // 2, kk // 2)] * 2)
            h, new_fs[f"bn{i}"] = _bn_train(h, fe[f"bn{i}"], fs[f"bn{i}"])
            return jax.nn.relu(h)

        f = enc(f, 1, 7, 4)
        f = enc(f, 2, 3, 2)
        f3 = enc(f, 3, 3, 2)
        f4 = enc(f3, 4, 3, 2)
        new_bs = dict(new_bs)
        new_bs["flow_encoder"] = new_fs
        t3 = grids[2].reshape(B, -1, cfg.embed_dims[2])
        t3 = _cross_attn(t3, f3.reshape(B, -1, cfg.embed_dims[2]),
                         params["cross_attn_s3"], cfg.flow_heads)
        grids[2] = t3.reshape(grids[2].shape)
        t4 = grids[3].reshape(B, -1, cfg.embed_dims[3])
        t4 = _cross_attn(t4, f4.reshape(B, -1, cfg.embed_dims[3]),
                         params["cross_attn_s4"], cfg.flow_heads)
        grids[3] = t4.reshape(grids[3].shape)

    # head (train mode: BN batch stats + channel dropout)
    hp = params["head"]
    hs = batch_stats["head"]
    target = grids[3].shape[1:3]
    parts = []
    for i, g in ((4, grids[3]), (3, grids[2]), (2, grids[1]), (1, grids[0])):
        if g.shape[1:3] != target:
            g = bilinear_resize(g, target)
        parts.append(_dense(g, hp[f"linear_c{i}"]))
    h = jnp.concatenate(parts, axis=-1)
    h = _conv(h, hp["linear_fuse"], 1, "VALID")
    h, new_fuse = _bn_train(h, hp["fuse_bn"], hs["fuse_bn"])
    h = jax.nn.relu(h)
    new_bs = dict(new_bs)
    new_bs["head"] = dict(new_bs.get("head", {}))
    new_bs["head"]["fuse_bn"] = new_fuse

    if head_cfg.dropout > 0.0:
        keep = 1.0 - head_cfg.dropout
        mask = jax.random.bernoulli(rng_drop, keep, (B, 1, 1, h.shape[-1]))
        h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)

    feat = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)

    def mlp_head(hh, name):
        hh = jax.nn.relu(_dense(hh, hp[f"{name}_1"]))
        return _dense(hh, hp[f"{name}_2"])

    return mlp_head(feat, "fc"), mlp_head(feat, "fc_ant"), new_bs
