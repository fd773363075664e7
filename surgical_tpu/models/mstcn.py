"""Multi-stage dilated causal TCN (TeCNO-style) over whole-video features.

TPU-native reimplementation of the reference temporal models
(mstcn.py:14-279). Everything here operates in ``[B, T, C]`` layout — time in
the sublane dimension, channels in the lane dimension — so the 1x1
projections and the dilated convs lower onto the MXU as large batched
matmuls with static shapes. The reference's ``[B, C, T]`` contract is only a
torch memory-layout artifact; compat transposes live at the edges.

Causal semantics (reference mstcn.py:192-211): conv1d k=3 dilation d with
``d*(k-1)`` padding on both sides followed by cropping the trailing ``2d``
samples — algebraically identical to left-padding ``2d`` only, i.e.
``out[t] = f(x[t-2d], x[t-d], x[t])``. We implement the left-pad form
directly; because causal layers never look forward, whole videos can be
right-padded to a static bucket length without changing the valid prefix
(up to XLA reassociation noise), so there is no recompile per video length.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surgical_tpu.core.config import MSTCNConfig


def torch_like_uniform(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — matches the torch Conv/Linear
    default so training dynamics stay comparable to the reference."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DilatedResidualLayer(nn.Module):
    """Dilated residual unit (reference mstcn.py:181-214).

    NOTE: serving/online.py::OnlineMSTCN re-implements this layer's math
    against the raw param tree for the streaming form — any change to the
    forward here (ops, epsilons, activation order) must be mirrored there;
    tests/test_online.py holds the two to 1e-6 parity."""

    dilation: int
    channels: int
    causal: bool = True
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        d = self.dilation
        pad = [(2 * d, 0)] if self.causal else [(d, d)]
        fan_in = x.shape[-1] * 3
        h = nn.Conv(
            self.channels,
            kernel_size=(3,),
            kernel_dilation=(d,),
            padding=pad,
            kernel_init=torch_like_uniform(fan_in),
            bias_init=torch_like_uniform(fan_in),
            name="conv_dilated",
        )(x)
        h = nn.relu(h)
        h = nn.Dense(
            self.channels,
            kernel_init=torch_like_uniform(self.channels),
            bias_init=torch_like_uniform(self.channels),
            name="conv_1x1",
        )(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class SingleStageTCN(nn.Module):
    """One TCN stage: 1x1 in-proj, L dilated residual layers (dilations
    1..2^(L-1)), 1x1 out-proj (reference mstcn.py:153-178)."""

    layers: int
    f_maps: int
    out_features: int
    causal: bool = True
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jax.Array, *, deterministic: bool = True, return_hidden: bool = False
    ):
        h = nn.Dense(
            self.f_maps,
            kernel_init=torch_like_uniform(x.shape[-1]),
            bias_init=torch_like_uniform(x.shape[-1]),
            name="in_proj",
        )(x)
        for i in range(self.layers):
            h = DilatedResidualLayer(
                dilation=2**i,
                channels=self.f_maps,
                causal=self.causal,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(h, deterministic=deterministic)
        out = nn.Dense(
            self.out_features,
            kernel_init=torch_like_uniform(self.f_maps),
            bias_init=torch_like_uniform(self.f_maps),
            name="out_proj",
        )(h)
        if return_hidden:
            return out, h
        return out


class MultiStageTCN(nn.Module):
    """Multi-stage refinement TCN, joint 14-channel phase+anticipation output
    (reference ``MultiStageModel_S``, mstcn.py:94-130).

    Input ``[B, T, f_dim]`` → output ``[S, B, T, out_features]`` (stage-major
    stack; the reference's ``[S, B, C, T]`` transposed to channel-last).
    Refinement stages consume the softmax over ALL out_features channels —
    including the 7 anticipation channels — exactly as the reference does
    (mstcn.py:126).
    """

    cfg: MSTCNConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        out = SingleStageTCN(
            cfg.layers,
            cfg.f_maps,
            cfg.out_features,
            causal=cfg.causal,
            dropout=cfg.dropout,
            name="stage_0",
        )(x, deterministic=deterministic)
        outs = [out]
        for s in range(1, cfg.stages):
            out = SingleStageTCN(
                cfg.layers,
                cfg.f_maps,
                cfg.out_features,
                causal=cfg.causal,
                dropout=cfg.dropout,
                name=f"stage_{s}",
            )(jax.nn.softmax(out, axis=-1), deterministic=deterministic)
            outs.append(out)
        return jnp.stack(outs, axis=0)


class DualTowerMSTCN(nn.Module):
    """Variant with separate phase / anticipation refinement towers
    (reference ``MultiStageModel``, mstcn.py:14-72).

    Behavioral note preserved from the reference: its ``forward`` feeds BOTH
    towers from ``stage1_phase`` — the dedicated ``stage1_phase_ant`` exists
    but is never called (mstcn.py:57-72). We reproduce that call graph (and
    therefore do not instantiate the orphan stage).
    """

    cfg: MSTCNConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        cfg = self.cfg
        stage1 = SingleStageTCN(
            cfg.layers,
            cfg.f_maps,
            cfg.out_features,
            causal=cfg.causal,
            dropout=cfg.dropout,
            name="stage1_phase",
        )

        out_cls = stage1(x, deterministic=deterministic)
        cls_outs = [out_cls]
        for s in range(cfg.stages - 1):
            out_cls = SingleStageTCN(
                cfg.layers,
                cfg.f_maps,
                cfg.out_features,
                causal=cfg.causal,
                dropout=cfg.dropout,
                name=f"stages_phase_{s}",
            )(jax.nn.softmax(out_cls, axis=-1), deterministic=deterministic)
            cls_outs.append(out_cls)

        out_ant = stage1(x, deterministic=deterministic)
        ant_outs = [out_ant]
        for s in range(cfg.stages - 1):
            out_ant = SingleStageTCN(
                cfg.layers,
                cfg.f_maps,
                cfg.out_features,
                causal=cfg.causal,
                dropout=cfg.dropout,
                name=f"stages_phase_ant_{s}",
            )(jax.nn.softmax(out_ant, axis=-1), deterministic=deterministic)
            ant_outs.append(out_ant)

        return jnp.stack(cls_outs, axis=0), jnp.stack(ant_outs, axis=0)


class HiddenFeatureMSTCN(nn.Module):
    """Variant returning the final stage's pre-logit hidden features
    (reference ``MultiStageModel1``/``SingleStageModel1``, mstcn.py:217-279),
    historically used to feed the refinement transformer with temporal
    embeddings. Returns ``[B, T, f_maps]``."""

    cfg: MSTCNConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        out, hidden = SingleStageTCN(
            cfg.layers,
            cfg.f_maps,
            cfg.out_features,
            causal=cfg.causal,
            dropout=cfg.dropout,
            name="stage_0",
        )(x, deterministic=deterministic, return_hidden=True)
        for s in range(1, cfg.stages):
            out, hidden = SingleStageTCN(
                cfg.layers,
                cfg.f_maps,
                cfg.out_features,
                causal=cfg.causal,
                dropout=cfg.dropout,
                name=f"stage_{s}",
            )(jax.nn.softmax(out, axis=-1), deterministic=deterministic, return_hidden=True)
        return hidden


def bct_to_btc(x: Any) -> Any:
    """Compat transpose from the reference's [B, C, T] to native [B, T, C]."""
    return jnp.swapaxes(x, -1, -2)


def btc_to_bct(x: Any) -> Any:
    return jnp.swapaxes(x, -1, -2)
