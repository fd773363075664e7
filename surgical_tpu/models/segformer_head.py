"""SegFormer pooled head with dual phase/anticipation outputs.

Reimplements the reference head (segformer_head.py:46-179): per-stage linear
embedding to 2048-d, bilinear DOWNSAMPLING of stages 1-3 to stage 4's 7x7
grid (the reference inverts SegFormer's usual upsample-to-c1 —
segformer_head.py:146-156), concat in [c4, c3, c2, c1] order, a 1x1
Conv+BN+ReLU fuse (the mmcv ConvModule, segformer_head.py:74-80), channel
dropout, global average pool to the 2048-d LFB feature, then two
2048->512->7 MLP heads for phase logits and anticipation regression.

``return_features=True`` early-returns the pooled 2048-d feature — the LFB
extraction contract (segformer_head.py:171-173).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from surgical_tpu.core.config import HeadConfig


def bilinear_resize(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """align_corners=False bilinear (half-pixel centers), NHWC.

    antialias=False: torch F.interpolate(mode='bilinear') point-samples with
    a 2x2 bilinear kernel even when downscaling (segformer_head.py:150-156);
    jax.image.resize would otherwise widen the kernel for downsampling,
    breaking reference parity.
    """
    B, H, W, C = x.shape
    return jax.image.resize(
        x, (B, out_hw[0], out_hw[1], C), method="bilinear", antialias=False
    ).astype(x.dtype)


class SegFormerPoolHead(nn.Module):
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],  # 4 NHWC grids: c1 56², c2 28², c3 14², c4 7²
        *,
        return_features: bool = False,
        train: bool = False,
    ):
        cfg = self.cfg
        c1, c2, c3, c4 = feats
        target = c4.shape[1:3]

        embedded = []
        for i, c in ((4, c4), (3, c3), (2, c2), (1, c1)):  # concat order: c4..c1
            # bilinear resize and the per-pixel Dense are both linear, so
            # they commute: downsample at C_stage (cheap) BEFORE projecting
            # to 2048 — numerically identical to the reference's
            # project-then-resize (segformer_head.py:146-156), ~32x less
            # resize traffic and projection FLOPs for c1
            if c.shape[1:3] != target:
                c = bilinear_resize(c, target)
            e = nn.Dense(cfg.embedding_dim, dtype=self.dtype, name=f"linear_c{i}")(c)
            embedded.append(e)
        x = jnp.concatenate(embedded, axis=-1)  # [B, 7, 7, 4*2048]

        # mmcv ConvModule: 1x1 conv (no bias with BN) + BN + ReLU
        x = nn.Conv(
            cfg.embedding_dim, kernel_size=(1, 1), use_bias=False,
            dtype=self.dtype, name="linear_fuse",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="fuse_bn"
        )(x)
        x = nn.relu(x)

        # torch Dropout2d zeroes whole channels: broadcast over H, W
        x = nn.Dropout(cfg.dropout, broadcast_dims=(1, 2))(x, deterministic=not train)

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) -> [B, 2048]

        if return_features:
            return x

        def mlp_head(h, name):
            h = nn.Dense(cfg.hidden, dtype=self.dtype, name=f"{name}_1")(h)
            h = nn.relu(h)
            return nn.Dense(cfg.num_phases, dtype=self.dtype, name=f"{name}_2")(h)

        y = mlp_head(x, "fc")
        y_ant = mlp_head(x, "fc_ant")
        return y, y_ant
