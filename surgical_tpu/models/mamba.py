"""Causal Mamba temporal model — drop-in for the MS-TCN.

Rebuilds the reference's ``CausalMambaModel`` (mstcn.py:282-343): Linear
2048 -> f_maps, ``layers`` residual Mamba blocks (unidirectional scan, so
strictly causal), dropout, LayerNorm, Linear head to 14, with a singleton
stage axis so callers can keep the ``outputs[-1]`` convention.

The Mamba block follows the public S6 design the CUDA ``mamba_ssm`` package
implements (in_proj -> [x, z]; depthwise causal conv + SiLU on x; data-
dependent dt/B/C; selective state scan; gate by SiLU(z); out_proj), with the
scan running on our Pallas TPU kernel (kernels/selective_scan.py) instead of
the CUDA extension the reference requires.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import MambaConfig
from surgical_tpu.kernels.selective_scan import selective_scan
from surgical_tpu.models.mstcn import torch_like_uniform


class MambaBlock(nn.Module):
    # NOTE: serving/online.py::OnlineMamba re-implements this block's math
    # (conv window + SSM recurrence) against the raw param tree for the
    # streaming form — keep the two in lockstep; tests/test_online.py holds
    # the parity.
    cfg: MambaConfig
    backend: str = "auto"

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        """u: [B, T, d_model] -> [B, T, d_model]."""
        cfg = self.cfg
        d_in = cfg.d_inner
        dt_rank = cfg.resolved_dt_rank

        xz = nn.Dense(2 * d_in, use_bias=False,
                      kernel_init=torch_like_uniform(cfg.d_model), name="in_proj")(u)
        x, z = jnp.split(xz, 2, axis=-1)  # [B, T, d_in] each

        # depthwise causal conv over time, kernel d_conv, then SiLU
        x = nn.Conv(
            d_in,
            kernel_size=(cfg.d_conv,),
            padding=[(cfg.d_conv - 1, 0)],
            feature_group_count=d_in,
            kernel_init=torch_like_uniform(cfg.d_conv),
            bias_init=torch_like_uniform(cfg.d_conv),
            name="conv1d",
        )(x)
        x = nn.silu(x)

        # data-dependent dt, B, C
        dbc = nn.Dense(dt_rank + 2 * cfg.d_state, use_bias=False,
                       kernel_init=torch_like_uniform(d_in), name="x_proj")(x)
        dt, B, C = jnp.split(dbc, [dt_rank, dt_rank + cfg.d_state], axis=-1)
        dt = nn.Dense(d_in, kernel_init=torch_like_uniform(dt_rank),
                      bias_init=_dt_bias_init(d_in), name="dt_proj")(dt)
        dt = nn.softplus(dt)

        # state matrices: A = -exp(A_log) init to -[1..N]; D = 1
        A_log = self.param(
            "A_log",
            lambda _key, shape: jnp.log(
                jnp.broadcast_to(jnp.arange(1, cfg.d_state + 1, dtype=jnp.float32), shape)
            ),
            (d_in, cfg.d_state),
        )
        D = self.param("D", nn.initializers.ones, (d_in,))
        A = -jnp.exp(A_log)

        scan = jax.vmap(
            lambda xs, dts, Bs, Cs: selective_scan(
                xs, dts, A, Bs, Cs, D, backend=self.backend
            )
        )
        y = scan(
            x.astype(jnp.float32),
            dt.astype(jnp.float32),
            B.astype(jnp.float32),
            C.astype(jnp.float32),
        ).astype(u.dtype)

        y = y * nn.silu(z)
        return nn.Dense(cfg.d_model, use_bias=False,
                        kernel_init=torch_like_uniform(d_in), name="out_proj")(y)


def _dt_bias_init(d_in: int, dt_min: float = 1e-3, dt_max: float = 0.1):
    """mamba_ssm's dt bias init: softplus^-1 of log-uniform dt samples."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, dtype)
            * (np.log(dt_max) - np.log(dt_min))
            + np.log(dt_min)
        )
        dt = jnp.clip(dt, 1e-4, None)
        return dt + jnp.log(-jnp.expm1(-dt))  # inverse softplus

    return init


class CausalMambaModel(nn.Module):
    """[B, T, f_dim] -> [1, B, T, out_features] (singleton stage axis,
    reference mstcn.py:328-343)."""

    cfg: MambaConfig
    backend: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = nn.Dense(cfg.d_model, kernel_init=torch_like_uniform(cfg.f_dim),
                     bias_init=torch_like_uniform(cfg.f_dim), name="in_proj")(x)
        for i in range(cfg.layers):
            h = h + MambaBlock(cfg, backend=self.backend, name=f"block_{i}")(h)
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(name="norm")(h)
        logits = nn.Dense(cfg.out_features, kernel_init=torch_like_uniform(cfg.d_model),
                          bias_init=torch_like_uniform(cfg.d_model), name="head")(h)
        return logits[None]  # fake stage axis
