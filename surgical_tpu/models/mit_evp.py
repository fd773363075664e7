"""Prompted SegFormer (MiT-EVP) backbone with optical-flow cross-attention.

TPU-native reimplementation of the reference spatial model
(mix_transformer_evp.py:218-449): a 4-stage Mix Vision Transformer where an
EVP-style PromptGenerator injects binary-mask ("bimask") segmentation prompts
into every block of every stage, and RAFT optical-flow tokens are fused into
stages 3-4 by motion-guided cross-attention, feeding the SegFormer pooled
head (models/segformer_head.py).

Design notes (TPU-first, not a translation):
- NHWC layout everywhere; token tensors are [B, N, C] with C in the lane
  dimension. All projections are lane-aligned matmuls on the MXU.
- ``compute_dtype`` (bf16 for training/inference on TPU) is threaded through
  every block; parameters stay fp32.
- Attention capture: the reference uses a bytecode-rewriting decorator
  (visualizer.py:3-42) to spy on the ``attn`` local. Here attention
  probabilities are exposed functionally via ``Module.sow('intermediates',
  'attn', ...)`` — retrieve with ``model.apply(..., mutable=['intermediates'])``
  and zero cost otherwise.
- Stochastic depth (DropPath) is a per-sample Bernoulli on the residual
  branch, identity when deterministic.

Shape map for img_size=224 (mix_transformer_evp.py:368-414):
stage1 56x56x64, stage2 28x28x128, stage3 14x14x320, stage4 7x7x512;
flow tokens: s3 (196, 320), s4 (49, 512).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.segformer_head import SegFormerPoolHead

Dtype = jnp.dtype


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def conv_kaiming_normal():
    """torch's conv init in the reference: N(0, sqrt(2 / fan_out))
    (mix_transformer_evp.py:53-58)."""

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel shape: (kh, kw, in, out)
        fan_out = shape[0] * shape[1] * shape[-1]
        return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)

    return init


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DWConv(nn.Module):
    """3x3 depthwise conv on token grids, (B,N,C) <-> (B,H,W,C)
    (reference mix_transformer_evp.py:19-30)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        x = nn.Conv(
            self.dim,
            kernel_size=(3, 3),
            padding=1,
            feature_group_count=self.dim,
            kernel_init=conv_kaiming_normal(),
            dtype=self.dtype,
            name="dwconv",
        )(x)
        return x.reshape(B, H * W, C)


class MixFFN(nn.Module):
    """Mix-FFN: fc1 -> DWConv -> GELU -> fc2 (reference :32-67)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, H: int, W: int, *, deterministic: bool = True
    ) -> jax.Array:
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init(), dtype=self.dtype, name="fc1")(x)
        x = DWConv(self.hidden, dtype=self.dtype, name="dwconv")(x, H, W)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, kernel_init=trunc_normal_init(), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference :71-131): queries from all
    tokens; keys/values from an sr x sr strided-conv-downsampled + LN'd grid
    when sr_ratio > 1. Attention probabilities are sown to 'intermediates'
    for the visualization path (functional replacement for @get_local)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    capture_attn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, H: int, W: int, *, deterministic: bool = True
    ) -> jax.Array:
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5

        q = nn.Dense(
            C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="q",
        )(x).reshape(B, N, h, hd)

        if self.sr_ratio > 1:
            grid = x.reshape(B, H, W, C)
            grid = nn.Conv(
                C,
                kernel_size=(self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                kernel_init=conv_kaiming_normal(),
                dtype=self.dtype,
                name="sr",
            )(grid)
            kv_in = grid.reshape(B, -1, C)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="norm")(kv_in)
        else:
            kv_in = x

        kv = nn.Dense(
            2 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="kv",
        )(kv_in).reshape(B, -1, 2, h, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.capture_attn:
            self.sow("intermediates", "attn", attn)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        out = nn.Dense(C, kernel_init=trunc_normal_init(), dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class MiTBlock(nn.Module):
    """Pre-LN SRA + pre-LN Mix-FFN with stochastic depth (reference :134-171)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    dtype: Dtype = jnp.float32
    capture_attn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, H: int, W: int, *, deterministic: bool = True
    ) -> jax.Array:
        dp = DropPath(self.drop_path, name="drop_path")
        a = SRAttention(
            self.dim,
            self.num_heads,
            sr_ratio=self.sr_ratio,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            capture_attn=self.capture_attn,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), H, W,
          deterministic=deterministic)
        x = x + dp(a, deterministic=deterministic)
        m = MixFFN(
            int(self.dim * self.mlp_ratio),
            self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x), H, W,
          deterministic=deterministic)
        return x + dp(m, deterministic=deterministic)


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patchify + LN (reference :174-215).
    Returns (tokens [B, H*W, C], H, W)."""

    patch_size: int
    stride: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, int, int]:
        # x: [B, H, W, C]
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(self.stride, self.stride),
            padding=p // 2,
            kernel_init=conv_kaiming_normal(),
            dtype=self.dtype,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, H, W


SRM_FILTERS = np.asarray(
    [
        [[0, 0, 0, 0, 0],
         [0, -1 / 4, 2 / 4, -1 / 4, 0],
         [0, 2 / 4, -4 / 4, 2 / 4, 0],
         [0, -1 / 4, 2 / 4, -1 / 4, 0],
         [0, 0, 0, 0, 0]],
        [[-1 / 12, 2 / 12, -2 / 12, 2 / 12, -1 / 12],
         [2 / 12, -6 / 12, 8 / 12, -6 / 12, 2 / 12],
         [-2 / 12, 8 / 12, -12 / 12, 8 / 12, -2 / 12],
         [2 / 12, -6 / 12, 8 / 12, -6 / 12, 2 / 12],
         [-1 / 12, 2 / 12, -2 / 12, 2 / 12, -1 / 12]],
        [[0, 0, 0, 0, 0],
         [0, 0, 0, 0, 0],
         [0, 1 / 2, -2 / 2, 1 / 2, 0],
         [0, 0, 0, 0, 0],
         [0, 0, 0, 0, 0]],
    ],
    dtype=np.float32,
)


def srm_filter(x: jax.Array) -> jax.Array:
    """Fixed SRM noise-residual filters (reference SRMFilter,
    mix_transformer_evp.py:517-547): each of 3 output channels is one SRM
    kernel applied to all 3 input channels."""
    # HWIO: [5, 5, in=3, out=3]; out channel k sums kernel k over all inputs
    kernel = jnp.asarray(np.tile(SRM_FILTERS.transpose(1, 2, 0)[:, :, None, :], (1, 1, 3, 1)))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)


def fft_prompt(x: jax.Array, rate: float = 0.25, prompt_type: str = "highpass") -> jax.Array:
    """Frequency-domain prompt: zero out a centered low-frequency square of
    relative area `rate` (highpass) or keep only it (lowpass) — the fft
    input_type of the sibling PromptGenerator copy (modules.py:324-345)."""
    B, H, W, C = x.shape
    fx = jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2)), axes=(1, 2))
    hh = int(H * np.sqrt(rate) / 2)
    ww = int(W * np.sqrt(rate) / 2)
    yy = jnp.abs(jnp.arange(H) - H // 2)[:, None]
    xx = jnp.abs(jnp.arange(W) - W // 2)[None, :]
    low = ((yy <= hh) & (xx <= ww))[None, :, :, None]
    mask = ~low if prompt_type == "highpass" else low
    fx = jnp.where(mask, fx, 0.0)
    out = jnp.fft.ifft2(jnp.fft.ifftshift(fx, axes=(1, 2)), axes=(1, 2))
    return jnp.real(out).astype(x.dtype)


def gaussian_blur_5x5(x: jax.Array) -> jax.Array:
    """Fixed 5x5 binomial blur with reflect padding, depthwise over channels
    (reference GaussianFilter, mix_transformer_evp.py:495-514). x: [B,H,W,C]."""
    k1 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0])
    kernel2d = jnp.outer(k1, k1) / 256.0
    C = x.shape[-1]
    kernel = jnp.tile(kernel2d[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    ).astype(x.dtype)


class PromptGenerator(nn.Module):
    """EVP prompt machinery (reference :550-815): per-stage handcrafted
    features from the Gaussian-blurred segmap via a cascade of shrunk-dim
    OverlapPatchEmbeds; per-stage embedding projections C -> C/scale; and
    per-(stage, depth) lightweight MLP + per-stage shared MLP adaptors whose
    output is ADDED to the tokens before every block."""

    cfg: BackboneConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        sf = cfg.prompt_scale_factor
        dims = cfg.embed_dims
        self._stages = [int(c) for c in cfg.tuning_stage]

        if cfg.input_type == "all":
            # fixed (non-learnable) spatial prompt replacing the segmap
            self._all_prompt = self.variable(
                "constants", "prompt",
                lambda: jnp.zeros((cfg.img_size, cfg.img_size, 3), jnp.float32),
            )
        if cfg.input_type == "bimask":
            # learnable positional embedding added to the repeated bimask
            # (the bimaskSTP variant, mix_transformer_evp.py:576-577)
            self._bimask_pos = self.param(
                "bimask_pos_embed", nn.initializers.zeros,
                (cfg.img_size, cfg.img_size, 3),
            )

        hg = {}
        eg = {}
        lmlps = {}
        smlps = {}
        fs_mlps = {}
        fu_mlps = {}
        for s in self._stages:  # 1-based stage ids
            i = s - 1
            if cfg.handcrafted_tune:
                if s == 1:
                    hg[s] = OverlapPatchEmbed(7, 4, dims[0] // sf, dtype=self.dtype,
                                              name=f"handcrafted_generator{s}")
                else:
                    hg[s] = OverlapPatchEmbed(3, 2, dims[i] // sf, dtype=self.dtype,
                                              name=f"handcrafted_generator{s}")
            if cfg.embedding_tune:
                eg[s] = nn.Dense(dims[i] // sf, kernel_init=trunc_normal_init(),
                                 dtype=self.dtype, name=f"embedding_generator{s}")
            if cfg.adaptor == "adaptor":
                for d in range(cfg.depths[i]):
                    lmlps[(s, d)] = nn.Dense(
                        dims[i] // sf, kernel_init=trunc_normal_init(),
                        dtype=self.dtype, name=f"lightweight_mlp{s}_{d}",
                    )
                smlps[s] = nn.Dense(dims[i], kernel_init=trunc_normal_init(),
                                    dtype=self.dtype, name=f"shared_mlp{s}")
            elif cfg.adaptor == "fully_shared":
                fs_mlps[s] = [
                    nn.Dense(dims[i] // sf, kernel_init=trunc_normal_init(),
                             dtype=self.dtype, name=f"fully_shared_mlp{s}_0"),
                    nn.Dense(dims[i], kernel_init=trunc_normal_init(),
                             dtype=self.dtype, name=f"fully_shared_mlp{s}_1"),
                ]
            elif cfg.adaptor == "fully_unshared":
                for d in range(cfg.depths[i]):
                    fu_mlps[(s, d)] = [
                        nn.Dense(dims[i] // sf, kernel_init=trunc_normal_init(),
                                 dtype=self.dtype, name=f"fully_unshared_mlp{s}_{d}_0"),
                        nn.Dense(dims[i], kernel_init=trunc_normal_init(),
                                 dtype=self.dtype, name=f"fully_unshared_mlp{s}_{d}_1"),
                    ]
        self._handcrafted = hg
        self._embedding = eg
        self._light = lmlps
        self._shared = smlps
        self._fully_shared = fs_mlps
        self._fully_unshared = fu_mlps

    def init_prompts(self, segmap: jax.Array):
        """Cascade the (blurred) segmap through the handcrafted generators;
        returns per-stage token features (reference init_prompts :718-747).
        segmap: [B, H, W, 3]."""
        cfg = self.cfg
        if not cfg.handcrafted_tune:
            return {s: None for s in (1, 2, 3, 4)}
        if cfg.input_type == "gaussian":
            x = gaussian_blur_5x5(segmap)
        elif cfg.input_type == "srm":
            x = srm_filter(segmap)
        elif cfg.input_type == "fft":
            x = fft_prompt(segmap, cfg.freq_nums, cfg.prompt_type)
        elif cfg.input_type == "all":
            x = jnp.broadcast_to(
                self._all_prompt.value[None].astype(segmap.dtype), segmap.shape
            )
        elif cfg.input_type == "bimask":
            x = segmap + self._bimask_pos[None].astype(segmap.dtype)
        else:
            x = segmap
        feats = {}
        prev = x
        for s in (1, 2, 3, 4):
            if s not in self._handcrafted:
                feats[s] = None
                continue
            tokens, H, W = self._handcrafted[s](prev)
            feats[s] = tokens
            prev = tokens.reshape(tokens.shape[0], H, W, -1)
        return feats

    def init_prompt(self, x: jax.Array, handcrafted, stage: int):
        emb = self._embedding[stage](x) if self.cfg.embedding_tune else None
        return handcrafted, emb

    def get_prompt(self, x: jax.Array, prompt, stage: int, depth: int) -> jax.Array:
        hand, emb = prompt
        if hand is not None and emb is not None:
            feat = hand + emb
        elif hand is not None:
            feat = hand
        elif emb is not None:
            feat = emb
        else:
            return x
        if self.cfg.adaptor == "adaptor":
            feat = nn.gelu(self._light[(stage, depth)](feat), approximate=False)
            feat = self._shared[stage](feat)
        elif self.cfg.adaptor == "fully_shared":
            a, b = self._fully_shared[stage]
            feat = b(nn.gelu(a(feat), approximate=False))
        elif self.cfg.adaptor == "fully_unshared":
            a, b = self._fully_unshared[(stage, depth)]
            feat = b(nn.gelu(a(feat), approximate=False))
        return x + feat


class OpticalFlowEncoder(nn.Module):
    """4-conv BN-ReLU CNN over flow maps (reference :818-859):
    2 -> 64(s4) -> 128(s2) -> s3_dim(s2) -> s4_dim(s2); returns flattened
    token sequences for stages 3 and 4."""

    out_dim_s3: int
    out_dim_s4: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow: jax.Array, *, train: bool = False):
        # flow: [B, H, W, 2]
        def block(x, dim, k, s, name):
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=k // 2,
                        kernel_init=conv_kaiming_normal(), dtype=self.dtype,
                        name=f"conv{name}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn{name}")(x)
            return nn.relu(x)

        x = block(flow, 64, 7, 4, "1")
        x = block(x, 128, 3, 2, "2")
        s3 = block(x, self.out_dim_s3, 3, 2, "3")
        s4 = block(s3, self.out_dim_s4, 3, 2, "4")
        B = flow.shape[0]
        return (
            s3.reshape(B, -1, self.out_dim_s3),
            s4.reshape(B, -1, self.out_dim_s4),
        )


class MotionGuidedCrossAttention(nn.Module):
    """Q = visual tokens, K/V = flow tokens, residual + LN
    (reference :862-890, torch nn.MultiheadAttention equivalent: joint
    in-proj with bias, out-proj with bias)."""

    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_visual: jax.Array, x_flow: jax.Array) -> jax.Array:
        B, Nv, C = x_visual.shape
        h = self.num_heads
        hd = C // h
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x_visual).reshape(B, Nv, h, hd)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x_flow).reshape(B, -1, h, hd)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x_flow).reshape(B, -1, h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, Nv, C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x_visual + out)


class MiTEVP(nn.Module):
    """The full prompted backbone + pooled head (reference
    MixVisionTransformerEVP, mix_transformer_evp.py:218-449).

    __call__(images [B,H,W,3], segmaps [B,H,W,3], flow [B,H,W,2] | None,
             return_features=False, train=False)
      -> (phase_logits [B,7], anticipation [B,7])  or  features [B,2048]
    """

    cfg: BackboneConfig
    head_cfg: HeadConfig
    compute_dtype: Dtype = jnp.float32
    capture_attn: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        segmaps: jax.Array,
        flow: Optional[jax.Array] = None,
        *,
        return_features: bool = False,
        train: bool = False,
    ):
        cfg = self.cfg
        dt = self.compute_dtype
        deterministic = not train
        x = images.astype(dt)
        segmaps = segmaps.astype(dt)

        prompt_gen = PromptGenerator(cfg, dtype=dt, name="prompt_generator")
        handcrafted = prompt_gen.init_prompts(segmaps)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
        cur = 0
        outs = []
        for si in range(4):
            stage = si + 1
            p = 7 if si == 0 else 3
            s = 4 if si == 0 else 2
            x, H, W = OverlapPatchEmbed(
                p, s, cfg.embed_dims[si], dtype=dt, name=f"patch_embed{stage}"
            )(x)
            tuned = str(stage) in cfg.tuning_stage
            if tuned:
                prompt = prompt_gen.init_prompt(x, handcrafted[stage], stage)
            for d in range(cfg.depths[si]):
                if tuned:
                    x = prompt_gen.get_prompt(x, prompt, stage, d)
                x = MiTBlock(
                    dim=cfg.embed_dims[si],
                    num_heads=cfg.num_heads[si],
                    mlp_ratio=cfg.mlp_ratios[si],
                    sr_ratio=cfg.sr_ratios[si],
                    qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate,
                    attn_drop=0.0,
                    drop_path=float(dpr[cur + d]),
                    dtype=dt,
                    capture_attn=self.capture_attn,
                    name=f"block{stage}_{d}",
                )(x, H, W, deterministic=deterministic)
            cur += cfg.depths[si]
            x_tokens = nn.LayerNorm(epsilon=1e-6, dtype=dt, name=f"norm{stage}")(x)
            outs.append((x_tokens, H, W))
            x = x_tokens.reshape(x.shape[0], H, W, -1)

        if cfg.with_flow and flow is not None:
            flow_s3, flow_s4 = OpticalFlowEncoder(
                cfg.embed_dims[2], cfg.embed_dims[3], dtype=dt, name="flow_encoder"
            )(flow.astype(dt), train=train)
            t3, H3, W3 = outs[2]
            t3 = MotionGuidedCrossAttention(
                cfg.embed_dims[2], num_heads=cfg.flow_heads, dtype=dt, name="cross_attn_s3"
            )(t3, flow_s3)
            outs[2] = (t3, H3, W3)
            t4, H4, W4 = outs[3]
            t4 = MotionGuidedCrossAttention(
                cfg.embed_dims[3], num_heads=cfg.flow_heads, dtype=dt, name="cross_attn_s4"
            )(t4, flow_s4)
            outs[3] = (t4, H4, W4)

        grids = [t.reshape(t.shape[0], H, W, -1) for (t, H, W) in outs]
        return SegFormerPoolHead(self.head_cfg, dtype=dt, name="head")(
            grids, return_features=return_features, train=train
        )
