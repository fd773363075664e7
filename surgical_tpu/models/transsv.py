"""Trans-SVNet-style refinement transformer.

Reconstruction of the reference's refinement stage: the wrapper ``Transformer``
(adapter_transformer.py:290-352) plus the ``Transformer2_3_1`` module that is
MISSING from the reference snapshot (imported at adapter_transformer.py:14;
SURVEY §2.9). The reconstruction follows the call contract —
``transformer(inputs=(T, len_q, 14), feas=(T, 1, 14)) -> (T, 1, 14)`` — and
the public Trans-SVNet design (Gao et al., MICCAI'21): one post-LN encoder
layer self-attending the causal window of temporal logits g̃ₜ, and one decoder
layer whose query is the spatial embedding l̃ₜ with K/V from the encoded
window, followed by a position-wise FFN.

TPU-native departures from the reference:

- The reference builds g̃ₜ with a Python loop over all T frames allocating a
  tensor per frame (adapter_transformer.py:336-343) — the hot spot of
  inference (SURVEY §3.4). Here the window stack is one static gather
  (``causal_windows``), vmapped/batched over T, fully inside jit.
- T is treated as the batch dimension, so every frame's 30-token attention
  runs as one batched matmul on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from surgical_tpu.core.config import RefinerConfig
from surgical_tpu.models.mstcn import torch_like_uniform


def causal_windows(x: jax.Array, len_q: int) -> jax.Array:
    """Zero-left-padded causal sliding windows.

    x: [T, C]  ->  [T, len_q, C] where out[t, j] = x[t - len_q + 1 + j]
    (zeros where the index is negative). Replaces the reference's per-frame
    Python loop (adapter_transformer.py:336-343) with one gather.
    """
    T = x.shape[0]
    t_idx = jnp.arange(T)[:, None]
    j_idx = jnp.arange(len_q)[None, :]
    src = t_idx - (len_q - 1) + j_idx  # [T, len_q]
    valid = src >= 0
    gathered = jnp.take(x, jnp.clip(src, 0, T - 1), axis=0)  # [T, len_q, C]
    return jnp.where(valid[..., None], gathered, 0.0)


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention with residual (Trans-SVNet style):
    separate d_k/d_v head dims decoupled from d_model."""

    d_model: int
    d_k: int
    d_v: int
    n_heads: int

    @nn.compact
    def __call__(self, q_in: jax.Array, k_in: jax.Array, v_in: jax.Array) -> jax.Array:
        # q_in: [B, Lq, d_model]; k_in/v_in: [B, Lk, d_model]
        B, Lq, _ = q_in.shape
        Lk = k_in.shape[1]
        H, dk, dv = self.n_heads, self.d_k, self.d_v

        dense = lambda feats, name: nn.Dense(
            feats,
            use_bias=False,
            kernel_init=torch_like_uniform(self.d_model),
            name=name,
        )
        q = dense(H * dk, "w_q")(q_in).reshape(B, Lq, H, dk)
        k = dense(H * dk, "w_k")(k_in).reshape(B, Lk, H, dk)
        v = dense(H * dv, "w_v")(v_in).reshape(B, Lk, H, dv)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk))
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, H * dv)
        out = nn.Dense(
            self.d_model,
            use_bias=False,
            kernel_init=torch_like_uniform(H * dv),
            name="w_o",
        )(ctx)
        return nn.LayerNorm(name="ln")(q_in + out)


class PoswiseFFN(nn.Module):
    d_model: int
    d_ff: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.d_ff, kernel_init=torch_like_uniform(self.d_model), name="fc1"
        )(x)
        h = nn.relu(h)
        h = nn.Dense(
            self.d_model, kernel_init=torch_like_uniform(self.d_ff), name="fc2"
        )(h)
        return nn.LayerNorm(name="ln")(x + h)


class EncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = MultiHeadAttention(self.d_model, self.d_k, self.d_v, self.n_heads, name="self_attn")(x, x, x)
        return PoswiseFFN(self.d_model, self.d_ff, name="ffn")(x)


class DecoderLayer(nn.Module):
    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int

    @nn.compact
    def __call__(self, dec: jax.Array, enc: jax.Array) -> jax.Array:
        dec = MultiHeadAttention(self.d_model, self.d_k, self.d_v, self.n_heads, name="self_attn")(dec, dec, dec)
        dec = MultiHeadAttention(self.d_model, self.d_k, self.d_v, self.n_heads, name="cross_attn")(dec, enc, enc)
        return PoswiseFFN(self.d_model, self.d_ff, name="ffn")(dec)


class Transformer231(nn.Module):
    """Fusion transformer: encode the temporal-logit window, decode the
    spatial embedding against it. Call contract per adapter_transformer.py:
    inputs (T, len_q, d_model) + feas (T, 1, d_model) -> (T, 1, d_model)."""

    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_layers: int
    n_heads: int
    len_q: int

    @nn.compact
    def __call__(self, inputs: jax.Array, feas: jax.Array) -> jax.Array:
        enc = inputs
        for i in range(self.n_layers):
            enc = EncoderLayer(
                self.d_model, self.d_ff, self.d_k, self.d_v, self.n_heads,
                name=f"enc_{i}",
            )(enc)
        dec = feas
        for i in range(self.n_layers):
            dec = DecoderLayer(
                self.d_model, self.d_ff, self.d_k, self.d_v, self.n_heads,
                name=f"dec_{i}",
            )(dec, enc)
        return dec


class Adaptor(nn.Module):
    """Prompt adaptor for LFB / temporal features (reference ``Adaptor``,
    adapter_transformer.py:241-288 — defined there but commented out of the
    active forward; provided here as an opt-in module).

    ``lt_mode=True``:  x, prompt [T, f_dim]   -> x + mlp(prompt)
    ``lt_mode=False``: x, prompt [T, len_q, C] -> flattened-window variant
    """

    embed_dim: int
    scale_factor: int = 4
    len_q: int = 30
    num_classes: int = 14

    @nn.compact
    def __call__(self, x: jax.Array, prompt: jax.Array, lt_mode: bool = True) -> jax.Array:
        light = nn.Dense(
            self.embed_dim // self.scale_factor,
            kernel_init=torch_like_uniform(self.embed_dim),
            name="lightweight_mlp",
        )
        shared = nn.Dense(
            self.embed_dim,
            kernel_init=torch_like_uniform(self.embed_dim // self.scale_factor),
            name="shared_mlp",
        )
        if lt_mode:
            feat = shared(nn.gelu(light(prompt), approximate=False))
            return x + feat
        T = x.shape[0]
        xf = x.reshape(T, -1)
        pf = prompt.reshape(T, -1)
        feat = shared(nn.gelu(light(pf), approximate=False))
        return (xf + feat).reshape(T, self.len_q, self.num_classes)


class RefinementTransformer(nn.Module):
    """The full refinement stage (reference ``Transformer``,
    adapter_transformer.py:290-352): temporal logits gₜ from the MS-TCN's
    final stage fused with the spatial LFB feature lₜ.

    __call__(temporal_logits [T, out_features], lfb [T, f_dim])
        -> [T, out_features]

    setup-style so the streaming path can reuse the same submodules:
    ``refine_window`` (via ``apply(..., method=...)``) runs ONE precomputed
    causal window — the per-frame form serving/online.OnlineRefiner steps
    with, identical math to the corresponding row of ``__call__``.
    """

    cfg: RefinerConfig

    def setup(self):
        cfg = self.cfg
        # attribute names = param scopes: identical tree to the previous
        # @nn.compact form (name="fc" / name="transformer")
        self.fc = nn.Dense(
            cfg.out_features,
            use_bias=False,
            kernel_init=torch_like_uniform(cfg.f_dim),
        )
        self.transformer = Transformer231(
            d_model=cfg.out_features,
            d_ff=cfg.f_maps,
            d_k=cfg.d_k,
            d_v=cfg.d_k,
            n_layers=cfg.n_layers,
            n_heads=cfg.n_heads,
            len_q=cfg.len_q,
        )

    def __call__(self, temporal_logits: jax.Array, lfb: jax.Array) -> jax.Array:
        # g̃ₜ: causal windows of the temporal logits (one gather, not a loop)
        windows = causal_windows(temporal_logits, self.cfg.len_q)  # [T, len_q, C]
        # l̃ₜ = tanh(fc(LFB)) (adapter_transformer.py:346-347; fc bias=False)
        feas = jnp.tanh(self.fc(lfb))[:, None, :]  # [T, 1, C]
        return self.transformer(windows, feas)[:, 0, :]  # [T, out_features]

    def refine_window(self, window: jax.Array, lfb_t: jax.Array) -> jax.Array:
        """Streaming form: one zero-left-padded causal window
        [len_q, out_features] + this frame's LFB feature [f_dim] ->
        refined logits [out_features]."""
        feas = jnp.tanh(self.fc(lfb_t[None]))[:, None, :]  # [1, 1, C]
        return self.transformer(window[None], feas)[0, 0]
