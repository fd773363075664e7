"""Fused MiT transformer block — Pallas TPU kernel.

The MiT backbone's cost on TPU is not FLOPs (the MXU runs its matmuls at
near peak) but HBM traffic: each of the 28 blocks is ~10 XLA ops that each
round-trip the full activation through HBM (measured ~0.2-0.7 ms apiece at
batch 128 — SURVEY §3.1 hot loop). This kernel fuses one whole block —

    q-projection -> multi-head attention over the (tiny, spatially-reduced)
    k/v -> output projection -> +residual -> LayerNorm2 -> fc1 -> 3x3
    depthwise conv (as 9 masked rolls over the token grid) -> GELU -> fc2 ->
    +residual

— into a single pass: two activation reads (x and LN1(x)) and one write.
The spatial-reduction k/v path stays in XLA (it is ~49 tokens — negligible
traffic) and is passed in precomputed, as is LN1(x) (fused by XLA into the
previous op).

Grid: one step per batch tile of ``bt`` images; weights are broadcast
(constant index map). head_dim is 64 for every MiT variant; heads is a
static Python loop.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * scale + bias).astype(x.dtype)


def _dwconv3x3(h, w_taps, bias, H, W):
    """3x3 depthwise conv on tokens [N=H*W, C] via 9 masked circular rolls.

    w_taps: [9, C] (tap order dy-major, dy,dx in {-1,0,1}); bias: [1, C].
    """
    N, C = h.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    row = idx // W
    col = idx % W
    acc = jnp.zeros((N, C), jnp.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = dy * W + dx  # source token offset (static)
            # static concat-based shift: shifted[t] = h[t + off]
            if off > 0:
                shifted = jnp.concatenate([h[off:], jnp.zeros((off, C), h.dtype)], 0)
            elif off < 0:
                shifted = jnp.concatenate([jnp.zeros((-off, C), h.dtype), h[:off]], 0)
            else:
                shifted = h
            valid = (
                (row + dy >= 0) & (row + dy < H) & (col + dx >= 0) & (col + dx < W)
            )
            acc = acc + jnp.where(valid, shifted, 0).astype(jnp.float32) * w_taps[k][None, :]
            k += 1
    return (acc + bias).astype(h.dtype)


def _block_kernel(
    # inputs
    x_ref, xln_ref, k_ref, v_ref,
    wq_ref, bq_ref, wo_ref, bo_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref,
    # output
    y_ref,
    *, heads: int, H: int, W: int,
):
    bt = x_ref.shape[0]
    C = x_ref.shape[-1]
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)

    for b in range(bt):  # static unroll over the batch tile
        x = x_ref[b]        # [N, C]
        xln = xln_ref[b]
        k = k_ref[b]        # [Nkv, C]
        v = v_ref[b]

        q = (
            jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
            + bq_ref[0][None, :]
        ).astype(x.dtype)

        ctx_heads = []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            scores = (
                jax.lax.dot_general(
                    q[:, sl], k[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx_heads.append(
                jnp.dot(probs, v[:, sl], preferred_element_type=jnp.float32)
            )
        ctx = jnp.concatenate(ctx_heads, axis=-1).astype(x.dtype)

        attn_out = (
            jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
            + bo_ref[0][None, :]
        )
        x = (x.astype(jnp.float32) + attn_out).astype(x.dtype)  # +residual

        h2 = _layernorm(x, ln2s_ref[0][None, :], ln2b_ref[0][None, :])
        h2 = (
            jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[0][None, :]
        ).astype(x.dtype)
        h2 = _dwconv3x3(h2, wdw_ref[:], bdw_ref[0][None, :], H, W)
        # tanh-approx GELU: exact erf does not lower in Pallas TPU (Mosaic
        # has no erfc); max deviation ~1e-3 on unit-scale activations
        h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True)
        mlp_out = (
            jnp.dot(h2.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[0][None, :]
        )
        y_ref[b] = (x.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "H", "W", "bt", "interpret"),
)
def fused_mit_block(
    x: jax.Array,      # [B, N, C] residual input
    xln: jax.Array,    # [B, N, C] = LN1(x)
    k: jax.Array,      # [B, Nkv, C]
    v: jax.Array,      # [B, Nkv, C]
    weights: dict[str, Any],
    *,
    heads: int,
    H: int,
    W: int,
    bt: int = 1,
    interpret: bool = False,
) -> jax.Array:
    B, N, C = x.shape
    Nkv = k.shape[1]
    hidden = weights["w1"].shape[1]
    assert B % bt == 0, (B, bt)
    grid = (B // bt,)

    def bspec(shape, batched=True):
        if batched:
            return pl.BlockSpec((bt, *shape), lambda i: (i, *([0] * len(shape))),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    row = lambda w: jnp.asarray(w).reshape(1, -1)
    args = (
        x, xln, k, v,
        weights["wq"], row(weights["bq"]), weights["wo"], row(weights["bo"]),
        row(weights["ln2_scale"]), row(weights["ln2_bias"]),
        weights["w1"], row(weights["b1"]),
        weights["wdw"], row(weights["bdw"]),
        weights["w2"], row(weights["b2"]),
    )
    in_specs = [
        bspec((N, C)), bspec((N, C)), bspec((Nkv, C)), bspec((Nkv, C)),
        bspec((C, C), False), bspec((1, C), False),
        bspec((C, C), False), bspec((1, C), False),
        bspec((1, C), False), bspec((1, C), False),
        bspec((C, hidden), False), bspec((1, hidden), False),
        bspec((9, hidden), False), bspec((1, hidden), False),
        bspec((hidden, C), False), bspec((1, C), False),
    ]

    return pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, H=H, W=W),
        grid=grid,
        in_specs=in_specs,
        out_specs=bspec((N, C)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(*args)


def block_weights_from_params(p: dict) -> dict:
    """Extract fused-kernel weights from a MiTBlock param subtree
    (models/mit_evp.py naming)."""
    attn = p["attn"]
    mlp = p["mlp"]
    dw = jnp.asarray(mlp["dwconv"]["dwconv"]["kernel"])  # [3, 3, 1, hidden]
    return {
        "wq": attn["q"]["kernel"],
        "bq": attn["q"].get("bias", jnp.zeros(attn["q"]["kernel"].shape[1])),
        "wo": attn["proj"]["kernel"],
        "bo": attn["proj"]["bias"],
        "ln2_scale": p["norm2"]["scale"],
        "ln2_bias": p["norm2"]["bias"],
        "w1": mlp["fc1"]["kernel"],
        "b1": mlp["fc1"]["bias"],
        "wdw": dw.reshape(9, dw.shape[-1]),
        "bdw": mlp["dwconv"]["dwconv"]["bias"],
        "w2": mlp["fc2"]["kernel"],
        "b2": mlp["fc2"]["bias"],
    }
