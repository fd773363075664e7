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


def _dwconv3x3(h, w_taps, bias, H, W, N):
    """3x3 depthwise conv on tokens [bt*N, C] via 9 masked static shifts.

    Works on a FLATTENED batch tile: shifts that cross an image boundary
    land on tokens whose intra-image row/col (computed from ``t % N``) falls
    outside the grid, so the same validity mask that handles image edges
    also isolates images from each other.

    w_taps: [9, C] (tap order dy-major, dy,dx in {-1,0,1}); bias: [1, C].
    """
    M, C = h.shape  # M = bt * N
    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % N
    row = idx // W
    col = idx % W
    acc = jnp.zeros((M, C), jnp.float32)
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
    *refs,
    heads: int, H: int, W: int, bt: int, mlp_chunk: int = 0,
    ln1_in_kernel: bool = False, has_pnext: bool = False,
    emit_ln: bool = False,
):
    """One FLATTENED batch tile per grid step: x/xln arrive [bt*N, C] so the
    projections and the MLP run as single large matmuls (M = bt*N keeps the
    MXU fed; per-image M=196 at stage 3 measured only ~23% utilization).
    Only the attention core (scores/softmax/context) loops per image — its
    keys must not mix images.

    ``mlp_chunk`` > 0 runs the MLP tail (fc1 -> dwconv -> GELU -> fc2) per
    hidden-channel chunk so larger batch tiles fit VMEM (fewer grid steps —
    each step carries ~21 us of pipeline overhead).

    ``ln1_in_kernel`` reinterprets the second operand as the LN1 scale/bias
    packed into a [2, C] array instead of a precomputed [bt*N, C] LN1(x):
    recomputing LN1 on-VMEM drops one activation-sized block read per step
    (~30% of the kernel's HBM traffic; the XLA-side xln is still produced
    once for the k/v spatial-reduction path).

    Round-4 prompt/LN folding (the two XLA-side per-block round trips that
    ARE foldable — the SR/kv chain is not, docs/kernel_notes.md):

    - ``has_pnext``: three extra inputs — the NEXT block's GELU'd
      lightweight-MLP feature [bt*N, C4] (C4 = C/prompt_scale, ~C/4) plus
      the stage's shared_mlp kernel [C4, C] and bias [1, C]. The prompt
      depends only on the stage-entry base (mix_transformer_evp.py:776-815:
      init_prompt runs once per stage), so all depths' features are
      computable at stage entry; the kernel finishes the shared_mlp matmul
      and adds it into this block's residual write. Kills the per-block XLA
      read-modify-write of x at 1/4 the activation traffic a full-C prompt
      input would cost (the full-C variant measured ~0 gain and VMEM-OOMs
      at s3 — probe_nonstage, round 4).
    - ``emit_ln``: an extra [2, C] scale/bias input and a second [bt*N, C]
      output carrying LayerNorm(y) under those params — the NEXT block's
      LN1 for its SR/kv path (or the stage-final norm). Kills the per-block
      XLA LN round trip (read y, write xln) for one pipelined block write.
    """
    it = iter(refs)
    (x_ref, xln_ref, k_ref, v_ref,
     wq_ref, bq_ref, wo_ref, bo_ref,
     ln2s_ref, ln2b_ref,
     w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref) = (next(it) for _ in range(16))
    pfeat_ref = next(it) if has_pnext else None
    pshw_ref = next(it) if has_pnext else None
    pshb_ref = next(it) if has_pnext else None
    lnn_ref = next(it) if emit_ln else None
    y_ref = next(it)
    yln_ref = next(it) if emit_ln else None

    N = H * W
    C = x_ref.shape[-1]
    Nkv = k_ref.shape[1] // bt
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)

    x = x_ref[0]          # [bt*N, C]
    if ln1_in_kernel:
        xln = _layernorm(x, xln_ref[0][None, :], xln_ref[1][None, :])
    else:
        xln = xln_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]

    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(x.dtype)

    ctx_rows = []
    for b in range(bt):  # attention: per image, per head (small dots)
        qb = q[b * N : (b + 1) * N]
        kb = kk[b * Nkv : (b + 1) * Nkv]
        vb = vv[b * Nkv : (b + 1) * Nkv]
        ctx_heads = []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            scores = (
                jax.lax.dot_general(
                    qb[:, sl], kb[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx_heads.append(
                jnp.dot(probs, vb[:, sl], preferred_element_type=jnp.float32)
            )
        ctx_rows.append(jnp.concatenate(ctx_heads, axis=-1))
    ctx = (
        jnp.concatenate(ctx_rows, axis=0) if bt > 1 else ctx_rows[0]
    ).astype(x.dtype)

    attn_out = (
        jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[0][None, :]
    )
    x = (x.astype(jnp.float32) + attn_out).astype(x.dtype)  # +residual

    h2ln = _layernorm(x, ln2s_ref[0][None, :], ln2b_ref[0][None, :])
    hidden = w1_ref.shape[-1]
    if mlp_chunk and mlp_chunk < hidden:
        b1_row = b1_ref[0][None, :]
        bdw_row = bdw_ref[0][None, :]
        mlp_out = b2_ref[0][None, :].astype(jnp.float32)
        for c0 in range(0, hidden, mlp_chunk):
            hc = (
                jnp.dot(h2ln, w1_ref[:, c0 : c0 + mlp_chunk],
                        preferred_element_type=jnp.float32)
                + b1_row[:, c0 : c0 + mlp_chunk]
            ).astype(x.dtype)
            hc = _dwconv3x3(hc, wdw_ref[:, c0 : c0 + mlp_chunk],
                            bdw_row[:, c0 : c0 + mlp_chunk], H, W, N)
            hc = jax.nn.gelu(hc.astype(jnp.float32), approximate=True)
            mlp_out = mlp_out + jnp.dot(
                hc.astype(x.dtype), w2_ref[c0 : c0 + mlp_chunk],
                preferred_element_type=jnp.float32,
            )
    else:
        h2 = (
            jnp.dot(h2ln, w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[0][None, :]
        ).astype(x.dtype)
        h2 = _dwconv3x3(h2, wdw_ref[:], bdw_ref[0][None, :], H, W, N)
        # tanh-approx GELU: exact erf does not lower in Pallas TPU (Mosaic
        # has no erfc); max deviation ~1e-3 on unit-scale activations
        h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True)
        mlp_out = (
            jnp.dot(h2.astype(x.dtype), w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2_ref[0][None, :]
        )
    y = (x.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)
    if has_pnext:
        # finish the shared_mlp: same op order/rounding as the XLA
        # `x + _dense(feat, shared)` it replaces (f32 dot, bf16 add)
        pf = (jnp.dot(pfeat_ref[0], pshw_ref[:],
                      preferred_element_type=jnp.float32)
              + pshb_ref[0][None, :]).astype(y.dtype)
        y = y + pf
    y_ref[0] = y
    if emit_ln:
        yln_ref[0] = _layernorm(y, lnn_ref[0][None, :], lnn_ref[1][None, :])


def _ln_stack(p) -> jax.Array:
    """Flax LayerNorm params -> the [2, C] f32 scale/bias stack the kernels
    consume (row 0 = scale, row 1 = bias)."""
    return jnp.stack(
        [jnp.asarray(p["scale"]), jnp.asarray(p["bias"])]
    ).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "H", "W", "bt", "mlp_chunk", "interpret"),
)
def fused_mit_block(
    x: jax.Array,      # [B, N, C] residual input
    xln: jax.Array | None,  # [B, N, C] = LN1(x); None -> LN1 computed in-kernel
    k: jax.Array,      # [B, Nkv, C]
    v: jax.Array,      # [B, Nkv, C]
    weights: dict[str, Any],
    *,
    heads: int,
    H: int,
    W: int,
    bt: int = 1,
    mlp_chunk: int = 0,
    pnext_feat: jax.Array | None = None,  # [B, N, C4] next block's GELU'd feat
    prompt_shared: dict | None = None,    # shared_mlp {kernel [C4,C], bias}
    ln_next: dict | None = None,          # next LN params -> also return LN(y)
    interpret: bool = False,
):
    """Fused MiT block. Pass ``xln=None`` (requires ``weights['ln1_scale']``
    / ``['ln1_bias']``) to recompute LN1 inside the kernel — saves one
    activation-sized HBM read per grid step.

    ``pnext_feat`` + ``prompt_shared`` fold the next block's prompt
    (shared_mlp matmul + add) into the residual write; ``ln_next`` (flax LN
    param dict) makes the call return ``(y, LN(y))`` — see _block_kernel's
    round-4 folding notes."""
    B, N, C = x.shape
    Nkv = k.shape[1]
    hidden = weights["w1"].shape[1]
    assert B % bt == 0, (B, bt)
    grid = (B // bt,)
    ln1_in_kernel = xln is None
    has_pnext = pnext_feat is not None
    emit_ln = ln_next is not None

    # flatten each bt-image tile into one [bt*N, C] row block (an HBM
    # bitcast, free) so the kernel's matmuls see M = bt*N rows
    xf = x.reshape(B // bt, bt * N, C)
    if ln1_in_kernel:
        xln_arg = jnp.stack(
            [jnp.asarray(weights["ln1_scale"]), jnp.asarray(weights["ln1_bias"])]
        ).astype(jnp.float32)
    else:
        xln_arg = xln.reshape(B // bt, bt * N, C)
    kf = k.reshape(B // bt, bt * Nkv, C)
    vf = v.reshape(B // bt, bt * Nkv, C)

    def bspec(shape, batched=True):
        if batched:
            return pl.BlockSpec((1, *shape), lambda i: (i, *([0] * len(shape))),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    row = lambda w: jnp.asarray(w).reshape(1, -1)
    args = [
        xf, xln_arg, kf, vf,
        weights["wq"], row(weights["bq"]), weights["wo"], row(weights["bo"]),
        row(weights["ln2_scale"]), row(weights["ln2_bias"]),
        weights["w1"], row(weights["b1"]),
        weights["wdw"], row(weights["bdw"]),
        weights["w2"], row(weights["b2"]),
    ]
    in_specs = [
        bspec((bt * N, C)),
        bspec((2, C), False) if ln1_in_kernel else bspec((bt * N, C)),
        bspec((bt * Nkv, C)), bspec((bt * Nkv, C)),
        bspec((C, C), False), bspec((1, C), False),
        bspec((C, C), False), bspec((1, C), False),
        bspec((1, C), False), bspec((1, C), False),
        bspec((C, hidden), False), bspec((1, hidden), False),
        bspec((9, hidden), False), bspec((1, hidden), False),
        bspec((hidden, C), False), bspec((1, C), False),
    ]
    if has_pnext:
        C4 = pnext_feat.shape[-1]
        args += [pnext_feat.astype(x.dtype).reshape(B // bt, bt * N, C4),
                 jnp.asarray(prompt_shared["kernel"], x.dtype),
                 jnp.asarray(prompt_shared["bias"],
                             jnp.float32).reshape(1, C)]
        in_specs += [bspec((bt * N, C4)),
                     bspec((C4, C), False), bspec((1, C), False)]
    if emit_ln:
        args.append(_ln_stack(ln_next))
        in_specs.append(bspec((2, C), False))
        out_specs = (bspec((bt * N, C)), bspec((bt * N, C)))
        out_shape = (jax.ShapeDtypeStruct((B // bt, bt * N, C), x.dtype),) * 2
    else:
        out_specs = bspec((bt * N, C))
        out_shape = jax.ShapeDtypeStruct((B // bt, bt * N, C), x.dtype)

    out = pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, H=H, W=W, bt=bt,
                          mlp_chunk=mlp_chunk, ln1_in_kernel=ln1_in_kernel,
                          has_pnext=has_pnext, emit_ln=emit_ln),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if emit_ln:
        return out[0].reshape(B, N, C), out[1].reshape(B, N, C)
    return out.reshape(B, N, C)


# -- head-batched attention variant (heads > 1) --------------------------------
#
# The per-image/per-head attention loop in _block_kernel issues 2*heads tiny
# MXU dots (e.g. stage 3: [196, 64] @ [64, 49] at ~11% utilization) and
# `heads` lane-padded softmaxes per image. This variant applies packed2's
# segment-softmax machinery to HEADS instead of images: scores for all heads
# come from ONE dot against a head-block-diagonal k^T, the per-head softmax
# is exact with a row-GLOBAL max (softmax is shift-invariant per row;
# per-segment sums via indicator matmuls), and the context is one dot
# against the stacked block-diagonal v.


def _block_kernel_hb(
    *refs,
    heads: int, H: int, W: int, bt: int, ln1_in_kernel: bool = False,
    has_pnext: bool = False, emit_ln: bool = False,
):
    it = iter(refs)
    (x_ref, xln_ref, bdk_ref, v_ref, seg_ref, segT_ref,
     wq_ref, bq_ref, wo_ref, bo_ref,
     ln2s_ref, ln2b_ref,
     w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref) = (next(it) for _ in range(18))
    pfeat_ref = next(it) if has_pnext else None
    pshw_ref = next(it) if has_pnext else None
    pshb_ref = next(it) if has_pnext else None
    lnn_ref = next(it) if emit_ln else None
    y_ref = next(it)
    yln_ref = next(it) if emit_ln else None

    N = H * W
    C = x_ref.shape[-1]
    HN = bdk_ref.shape[-1]  # heads * Nkv
    Nkv = HN // heads
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)

    x = x_ref[0]
    if ln1_in_kernel:
        xln = _layernorm(x, xln_ref[0][None, :], xln_ref[1][None, :])
    else:
        xln = xln_ref[0]
    bdk = bdk_ref[0]  # [bt*C, HN]
    vv = v_ref[0]     # [bt*Nkv, C] (compact — a stacked block-diagonal v
                      # would cost another bt*HN*C*2 bytes x2 buffers of
                      # VMEM, which evicts a whole batch-tile step at s3)

    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(x.dtype)

    ctx_rows = []
    for b in range(bt):
        qb = q[b * N : (b + 1) * N]
        scores = (
            jnp.dot(qb, bdk[b * C : (b + 1) * C],
                    preferred_element_type=jnp.float32)
            * scale
        )
        m = jnp.max(scores, axis=-1, keepdims=True)  # row-global max: exact
        p = jnp.exp(scores - m)
        ssum = jnp.dot(p, seg_ref[:], preferred_element_type=jnp.float32)
        denom = jnp.dot(ssum, segT_ref[:], preferred_element_type=jnp.float32)
        probs = (p / denom).astype(x.dtype)
        vb = vv[b * Nkv : (b + 1) * Nkv]
        ctx_heads = [
            jnp.dot(probs[:, h * Nkv : (h + 1) * Nkv],
                    vb[:, h * hd : (h + 1) * hd],
                    preferred_element_type=jnp.float32)
            for h in range(heads)
        ]
        ctx_rows.append(jnp.concatenate(ctx_heads, axis=-1))
    ctx = (
        jnp.concatenate(ctx_rows, axis=0) if bt > 1 else ctx_rows[0]
    ).astype(x.dtype)

    attn_out = (
        jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[0][None, :]
    )
    x = (x.astype(jnp.float32) + attn_out).astype(x.dtype)

    h2 = _layernorm(x, ln2s_ref[0][None, :], ln2b_ref[0][None, :])
    h2 = (
        jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    ).astype(x.dtype)
    h2 = _dwconv3x3(h2, wdw_ref[:], bdw_ref[0][None, :], H, W, N)
    h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True)
    mlp_out = (
        jnp.dot(h2.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    y = (x.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)
    if has_pnext:
        pf = (jnp.dot(pfeat_ref[0], pshw_ref[:],
                      preferred_element_type=jnp.float32)
              + pshb_ref[0][None, :]).astype(y.dtype)
        y = y + pf
    y_ref[0] = y
    if emit_ln:
        yln_ref[0] = _layernorm(y, lnn_ref[0][None, :], lnn_ref[1][None, :])


@functools.partial(
    jax.jit,
    static_argnames=("heads", "H", "W", "bt", "interpret"),
)
def fused_mit_block_hb(
    x: jax.Array,      # [B, N, C] residual input
    xln: jax.Array | None,  # [B, N, C] = LN1(x); None -> LN1 computed in-kernel
    k: jax.Array,      # [B, Nkv, C]
    v: jax.Array,      # [B, Nkv, C]
    weights: dict[str, Any],
    *,
    heads: int,
    H: int,
    W: int,
    bt: int = 1,
    pnext_feat: jax.Array | None = None,  # [B, N, C4] next block's GELU'd feat
    prompt_shared: dict | None = None,    # shared_mlp {kernel [C4,C], bias}
    ln_next: dict | None = None,          # next LN params -> also return LN(y)
    interpret: bool = False,
):
    """fused_mit_block with head-batched attention (see _block_kernel_hb).

    The block-diagonal k^T / stacked v inflate k/v HBM traffic by ~heads x,
    which is negligible at the SR-reduced Nkv (~49 tokens) — callers should
    prefer this variant for heads > 1 when bt*C*heads*Nkv stays small
    relative to VMEM (stages 2/3 of MiT; see models/mit_fused.py routing).
    """
    B, N, C = x.shape
    Nkv = k.shape[1]
    hd = C // heads
    HN = heads * Nkv
    hidden = weights["w1"].shape[1]
    assert B % bt == 0, (B, bt)

    # head-block-diagonal k^T: [B, C, HN], column block h = k[:, :, sl_h]^T
    kT = jnp.swapaxes(k, 1, 2)  # [B, C, Nkv]
    cols = []
    for h in range(heads):
        pre = jnp.zeros((B, h * hd, Nkv), k.dtype)
        post = jnp.zeros((B, C - (h + 1) * hd, Nkv), k.dtype)
        cols.append(jnp.concatenate([pre, kT[:, h * hd : (h + 1) * hd], post], 1))
    bdk = jnp.concatenate(cols, 2)
    # per-head segment indicators
    seg = jnp.asarray(np.kron(np.eye(heads), np.ones((Nkv, 1))), jnp.float32)
    segT = jnp.asarray(seg.T)

    G = B // bt
    ln1_in_kernel = xln is None
    xf = x.reshape(G, bt * N, C)
    if ln1_in_kernel:
        xln_arg = jnp.stack(
            [jnp.asarray(weights["ln1_scale"]), jnp.asarray(weights["ln1_bias"])]
        ).astype(jnp.float32)
    else:
        xln_arg = xln.reshape(G, bt * N, C)
    bdkf = bdk.reshape(G, bt * C, HN)
    vf = v.reshape(G, bt * Nkv, C)

    bspec = _bspec_maker()
    row = lambda w: jnp.asarray(w).reshape(1, -1)
    args = [
        xf, xln_arg, bdkf, vf, seg, segT,
        weights["wq"], row(weights["bq"]), weights["wo"], row(weights["bo"]),
        row(weights["ln2_scale"]), row(weights["ln2_bias"]),
        weights["w1"], row(weights["b1"]),
        weights["wdw"], row(weights["bdw"]),
        weights["w2"], row(weights["b2"]),
    ]
    in_specs = [
        bspec((bt * N, C)),
        bspec((2, C), False) if ln1_in_kernel else bspec((bt * N, C)),
        bspec((bt * C, HN)), bspec((bt * Nkv, C)),
        bspec((HN, heads), False), bspec((heads, HN), False),
        bspec((C, C), False), bspec((1, C), False),
        bspec((C, C), False), bspec((1, C), False),
        bspec((1, C), False), bspec((1, C), False),
        bspec((C, hidden), False), bspec((1, hidden), False),
        bspec((9, hidden), False), bspec((1, hidden), False),
        bspec((hidden, C), False), bspec((1, C), False),
    ]
    has_pnext = pnext_feat is not None
    emit_ln = ln_next is not None
    if has_pnext:
        C4 = pnext_feat.shape[-1]
        args += [pnext_feat.astype(x.dtype).reshape(G, bt * N, C4),
                 jnp.asarray(prompt_shared["kernel"], x.dtype),
                 jnp.asarray(prompt_shared["bias"],
                             jnp.float32).reshape(1, C)]
        in_specs += [bspec((bt * N, C4)),
                     bspec((C4, C), False), bspec((1, C), False)]
    if emit_ln:
        args.append(_ln_stack(ln_next))
        in_specs.append(bspec((2, C), False))
        out_specs = (bspec((bt * N, C)), bspec((bt * N, C)))
        out_shape = (jax.ShapeDtypeStruct((G, bt * N, C), x.dtype),) * 2
    else:
        out_specs = bspec((bt * N, C))
        out_shape = jax.ShapeDtypeStruct((G, bt * N, C), x.dtype)
    out = pl.pallas_call(
        functools.partial(_block_kernel_hb, heads=heads, H=H, W=W, bt=bt,
                          ln1_in_kernel=ln1_in_kernel,
                          has_pnext=has_pnext, emit_ln=emit_ln),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if emit_ln:
        return out[0].reshape(B, N, C), out[1].reshape(B, N, C)
    return out.reshape(B, N, C)


# -- lane-packed variant for C=64 stages ---------------------------------------
#
# MiT stage 1 has C=64: every [*, 64] array wastes half of each 128-lane
# register/tile, capping effective bandwidth at ~125 GB/s (docs/
# kernel_notes.md). This variant packs TWO images into the lane dimension
# ([N, 128]) and runs the whole block on full-width arrays:
#   - projections / MLP: block-diagonal weights (dense FLOPs double but the
#     stage is bandwidth-bound, not FLOPs-bound)
#   - attention (heads=1, true for stage 1 of every MiT variant): scores =
#     q_packed @ blockdiag(k1^T, k2^T) -> [N, 98]; the per-image softmax is
#     EXACT with a row-GLOBAL max (softmax is shift-invariant per row), and
#     per-segment sums come from an indicator matmul
#   - LayerNorm per 64-lane half: mean/var via indicator matmuls
#   - depthwise conv: taps tile across the packed hidden channels; the MLP
#     tail (dwconv+GELU+fc2) runs in two hidden-channel chunks to keep the
#     f32 accumulator inside VMEM


def _ln_packed2(x, ind_ref, indT_ref, scale_row, bias_row, hd):
    """LayerNorm per ``hd``-lane half via indicator matmuls (mean/var of
    each packed image's channels computed with [C2, 2] / [2, C2] one-hot
    matrices)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.dot(
        jnp.dot(x32, ind_ref[:], preferred_element_type=jnp.float32) * (1.0 / hd),
        indT_ref[:], preferred_element_type=jnp.float32,
    )
    d = x32 - mu
    var = jnp.dot(
        jnp.dot(d * d, ind_ref[:], preferred_element_type=jnp.float32) * (1.0 / hd),
        indT_ref[:], preferred_element_type=jnp.float32,
    )
    return ((d * jax.lax.rsqrt(var + 1e-6)) * scale_row + bias_row).astype(x.dtype)


def _block_kernel_packed2(
    x_ref, ln1_ref, bdk_ref, bdv_ref,
    seg_ref, segT_ref, ind_ref, indT_ref,
    wq_ref, bq_ref, wo_ref, bo_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref,
    y_ref,
    *, H: int, W: int, n_chunks: int, CH: int,
):
    """One image pair per grid step; the MLP tail walks hidden chunks in a
    REAL ``fori_loop`` (dynamic 128-aligned slices of the weight refs).
    An unrolled Python chunk loop does NOT bound VMEM — Mosaic keeps every
    iteration's temporaries (measured 16.9-17.4 MB against the 16 MB scoped
    limit, flipping OOM with compile variance) — while a fori_loop body
    allocates one iteration's worth. Putting the chunks on the pallas grid
    instead costs ~15-20 us of step overhead per chunk and measured 23%
    slower end-to-end."""
    N = H * W
    C2 = x_ref.shape[-1]  # 128 (two packed 64-channel images)
    hd = C2 // 2
    scale = 1.0 / np.sqrt(hd)

    x = x_ref[0]      # [N, 128]
    # LN1 recomputed in-kernel from the packed [2, C2] scale/bias — one
    # fewer [N, 128] block read per step
    xln = _ln_packed2(x, ind_ref, indT_ref, ln1_ref[0][None, :],
                      ln1_ref[1][None, :], hd)
    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(x.dtype)

    # [N, 2*Nkv]: lanes [0, Nkv) are image-1 scores (q lanes 0:64 contract
    # k1^T; the other block rows are zero), lanes [Nkv, 2*Nkv) are image-2
    # scores — every lane is a real score, there are no cross terms.
    scores = (
        jnp.dot(q, bdk_ref[0], preferred_element_type=jnp.float32) * scale
    )
    m = jnp.max(scores, axis=-1, keepdims=True)  # row-global max: exact
    p = jnp.exp(scores - m)
    ssum = jnp.dot(p, seg_ref[:], preferred_element_type=jnp.float32)  # [N, 2]
    denom = jnp.dot(ssum, segT_ref[:], preferred_element_type=jnp.float32)
    probs = (p / denom).astype(x.dtype)
    ctx = jnp.dot(probs, bdv_ref[0], preferred_element_type=jnp.float32).astype(x.dtype)

    attn_out = (
        jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[0][None, :]
    )
    x = (x.astype(jnp.float32) + attn_out).astype(x.dtype)

    # LayerNorm per 64-lane half via indicator matmuls
    h2ln = _ln_packed2(x, ind_ref, indT_ref, ln2s_ref[0][None, :],
                       ln2b_ref[0][None, :], hd)

    def chunk(c, mlp_out):
        sl = pl.ds(c * CH, CH)
        hc = (
            jnp.dot(h2ln, w1_ref[:, sl], preferred_element_type=jnp.float32)
            + b1_ref[0, sl][None, :]
        ).astype(x.dtype)
        hc = _dwconv3x3(hc, wdw_ref[:, sl], bdw_ref[0, sl][None, :], H, W, N)
        hc = jax.nn.gelu(hc.astype(jnp.float32), approximate=True)
        return mlp_out + jnp.dot(
            hc.astype(x.dtype), w2_ref[sl, :], preferred_element_type=jnp.float32
        )

    mlp_out = jax.lax.fori_loop(
        0, n_chunks, chunk,
        jnp.zeros((N, C2), jnp.float32) + b2_ref[0][None, :],
    )
    y_ref[0] = (x.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)


def _dwconv3x3_rows(h, w_taps, bias, H, W, row0):
    """3x3 depthwise conv on a contiguous ROW-RANGE tile [M, C] of one
    token grid (M = rows*W), with ``row0`` the (traced) GLOBAL grid row of
    tile-local row 0. Identical math to ``_dwconv3x3`` but validity is
    checked against the global H so spatial chunks + halos compose exactly:
    a tap whose source row falls outside [0, H) is masked even when the
    halo physically holds (clamped-index) garbage."""
    M, C = h.shape
    t = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    grow = row0 + t // W
    col = t % W
    acc = jnp.zeros((M, C), jnp.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = _shift_rows(h, dy * W + dx)  # defined below; resolved at trace time
            valid = (
                (grow + dy >= 0) & (grow + dy < H)
                & (col + dx >= 0) & (col + dx < W)
            )
            acc = acc + jnp.where(valid, shifted, 0).astype(jnp.float32) * w_taps[k][None, :]
            k += 1
    return (acc + bias).astype(h.dtype)


def _block_kernel_packed2s(
    x_ref, xa_ref, xb_ref, ln1_ref, bdk_ref, bdv_ref,
    seg_ref, segT_ref, ind_ref, indT_ref,
    wq_ref, bq_ref, wo_ref, bo_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref,
    y_ref,
    *, H: int, W: int, rpc: int, n_chunks: int, CH: int,
):
    """SPATIALLY-TILED packed2 (round 5, VERDICT r4 item 2): one image pair
    x one ``rpc``-row chunk of the token grid per grid step, with a 1-row
    dwconv halo above/below fetched as separate (clamped-index) blocks.

    Every op in the block except the 3x3 depthwise conv is ROW-LOCAL
    (attention rows attend only to the tiny SR-reduced k/v, which is
    resident per pair; LN/projections/GELU are per-token), so chunking N
    shrinks EVERY [N, *] temporary by the chunk factor — the containment
    axis the packed2 postmortem (docs/kernel_notes.md) never tried. The
    halo rows run through the whole pipeline too (~2/(rpc+2) extra
    compute) and only their dwconv contribution is consumed; their outputs
    are not written. Edge chunks read clamped halo blocks whose garbage is
    masked by the global-row validity in ``_dwconv3x3_rows``.
    """
    N = H * W
    C2 = x_ref.shape[-1]
    hd = C2 // 2
    scale = 1.0 / np.sqrt(hd)
    j = pl.program_id(1)
    row0 = j * rpc - 1  # global grid row of tile-local row 0

    x = jnp.concatenate([xa_ref[0], x_ref[0], xb_ref[0]], axis=0)  # [(rpc+2)W, C2]
    xln = _ln_packed2(x, ind_ref, indT_ref, ln1_ref[0][None, :],
                      ln1_ref[1][None, :], hd)
    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(x.dtype)

    scores = (
        jnp.dot(q, bdk_ref[0], preferred_element_type=jnp.float32) * scale
    )
    m = jnp.max(scores, axis=-1, keepdims=True)  # row-global max: exact
    p = jnp.exp(scores - m)
    ssum = jnp.dot(p, seg_ref[:], preferred_element_type=jnp.float32)
    denom = jnp.dot(ssum, segT_ref[:], preferred_element_type=jnp.float32)
    probs = (p / denom).astype(x.dtype)
    ctx = jnp.dot(probs, bdv_ref[0], preferred_element_type=jnp.float32).astype(x.dtype)

    attn_out = (
        jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[0][None, :]
    )
    x = (x.astype(jnp.float32) + attn_out).astype(x.dtype)

    h2ln = _ln_packed2(x, ind_ref, indT_ref, ln2s_ref[0][None, :],
                       ln2b_ref[0][None, :], hd)

    def chunk(c, mlp_out):
        sl = pl.ds(c * CH, CH)
        hc = (
            jnp.dot(h2ln, w1_ref[:, sl], preferred_element_type=jnp.float32)
            + b1_ref[0, sl][None, :]
        ).astype(x.dtype)
        hc = _dwconv3x3_rows(hc, wdw_ref[:, sl], bdw_ref[0, sl][None, :],
                             H, W, row0)
        hc = jax.nn.gelu(hc.astype(jnp.float32), approximate=True)
        return mlp_out + jnp.dot(
            hc.astype(x.dtype), w2_ref[sl, :], preferred_element_type=jnp.float32
        )

    mlp_out = jax.lax.fori_loop(
        0, n_chunks, chunk,
        jnp.zeros(((rpc + 2) * W, C2), jnp.float32) + b2_ref[0][None, :],
    )
    y = (x.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)
    y_ref[0] = y[W : (rpc + 1) * W]  # center rows only (static slice)


def _block_diag2(w: jax.Array) -> jax.Array:
    """[a, b] -> [2a, 2b] with w on the diagonal blocks."""
    a, b = w.shape
    z = jnp.zeros((a, b), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)], axis=0
    )


def pack_weights2(weights: dict[str, Any]) -> dict[str, Any]:
    """Pack per-image block weights for the 2-image lane-packed kernel."""
    cat = lambda v: jnp.concatenate([jnp.asarray(v)] * 2, axis=-1)
    return {
        "ln1": jnp.stack([cat(weights["ln1_scale"]),
                          cat(weights["ln1_bias"])]).astype(jnp.float32),
        "wq": _block_diag2(jnp.asarray(weights["wq"])),
        "bq": cat(weights["bq"]),
        "wo": _block_diag2(jnp.asarray(weights["wo"])),
        "bo": cat(weights["bo"]),
        "ln2_scale": cat(weights["ln2_scale"]),
        "ln2_bias": cat(weights["ln2_bias"]),
        "w1": _block_diag2(jnp.asarray(weights["w1"])),
        "b1": cat(weights["b1"]),
        "wdw": cat(weights["wdw"]),
        "bdw": cat(weights["bdw"]),
        "w2": _block_diag2(jnp.asarray(weights["w2"])),
        "b2": cat(weights["b2"]),
    }


@functools.partial(jax.jit, static_argnames=("H", "W", "row_chunks", "interpret"))
def fused_mit_block_packed2(
    x: jax.Array,      # [B, N, 64] residual input (B even)
    k: jax.Array,      # [B, Nkv, 64]
    v: jax.Array,      # [B, Nkv, 64]
    packed: dict[str, Any],  # pack_weights2(block_weights_from_params(...))
    *,
    H: int,
    W: int,
    row_chunks: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Single-head C=64 block with two images packed into the 128 lanes.
    LN1 is always computed in-kernel (packed["ln1"]).

    ``row_chunks`` > 1 additionally tiles the token grid SPATIALLY: the
    pallas grid becomes (pairs, row_chunks) and each step processes an
    ``H/row_chunks``-row band plus a 1-row dwconv halo — every [N, *]
    temporary shrinks by the chunk factor, bounding the kernel's scoped
    VMEM well under the 16 MB limit the unchunked variant sat on
    (docs/kernel_notes.md packed2 postmortem)."""
    B, N, C = x.shape
    assert B % 2 == 0 and C == 64, (B, C)
    P = B // 2
    Nkv = k.shape[1]

    def pack(a):  # [B, n, 64] -> [P, n, 128]
        return a.reshape(P, 2, a.shape[1], C).transpose(0, 2, 1, 3).reshape(
            P, a.shape[1], 2 * C)

    xp = pack(x)

    # block-diagonal k^T / v per image pair: [P, 128, 2*Nkv], [P, 2*Nkv, 128]
    kp = k.reshape(P, 2, Nkv, C)
    vp = v.reshape(P, 2, Nkv, C)
    z = jnp.zeros((P, C, Nkv), k.dtype)
    kT = jnp.swapaxes(kp, 2, 3)  # [P, 2, C, Nkv]
    bdk = jnp.concatenate(
        [jnp.concatenate([kT[:, 0], z], axis=2),
         jnp.concatenate([z, kT[:, 1]], axis=2)], axis=1)
    zv = jnp.zeros((P, Nkv, C), v.dtype)
    bdv = jnp.concatenate(
        [jnp.concatenate([vp[:, 0], zv], axis=2),
         jnp.concatenate([zv, vp[:, 1]], axis=2)], axis=1)

    seg = jnp.concatenate(
        [jnp.concatenate([jnp.ones((Nkv, 1)), jnp.zeros((Nkv, 1))], axis=1),
         jnp.concatenate([jnp.zeros((Nkv, 1)), jnp.ones((Nkv, 1))], axis=1)],
        axis=0).astype(jnp.float32)  # [2*Nkv, 2]
    segT = seg.T  # [2, 2*Nkv]
    ind = jnp.concatenate(
        [jnp.concatenate([jnp.ones((C, 1)), jnp.zeros((C, 1))], axis=1),
         jnp.concatenate([jnp.zeros((C, 1)), jnp.ones((C, 1))], axis=1)],
        axis=0).astype(jnp.float32)  # [128, 2]
    indT = ind.T

    hidden2 = packed["w1"].shape[1]
    CH = 128
    # a non-multiple hidden width (custom mlp_ratio) would silently drop the
    # tail hidden channels of the MLP chunk walk
    assert hidden2 % CH == 0, (hidden2, CH)
    n_chunks = hidden2 // CH

    if row_chunks > 1:
        assert H % row_chunks == 0, (H, row_chunks)
        rpc = H // row_chunks
        Cp = 2 * C  # packed lane width (two 64-channel images)
        rowv = lambda w: jnp.asarray(w).reshape(1, -1)

        def cspec(shape, index):
            return pl.BlockSpec(shape, index, memory_space=pltpu.VMEM)

        pair = lambda *s: cspec((1, *s), lambda i, j: (i,) + (0,) * len(s))
        const = lambda *s: cspec(s, lambda i, j: (0,) * len(s))
        args = (
            xp, xp, xp,  # center band + above/below 1-row halos (clamped)
            packed["ln1"], bdk, bdv, seg, segT, ind, indT,
            packed["wq"], rowv(packed["bq"]),
            packed["wo"], rowv(packed["bo"]),
            rowv(packed["ln2_scale"]), rowv(packed["ln2_bias"]),
            packed["w1"], rowv(packed["b1"]),
            packed["wdw"], rowv(packed["bdw"]),
            packed["w2"], rowv(packed["b2"]),
        )
        in_specs = [
            cspec((1, rpc * W, Cp), lambda i, j: (i, j, 0)),
            cspec((1, W, Cp), lambda i, j: (i, jnp.maximum(j * rpc - 1, 0), 0)),
            cspec((1, W, Cp),
                  lambda i, j: (i, jnp.minimum((j + 1) * rpc, H - 1), 0)),
            const(2, Cp),
            pair(Cp, 2 * Nkv), pair(2 * Nkv, Cp),
            const(2 * Nkv, 2), const(2, 2 * Nkv),
            const(Cp, 2), const(2, Cp),
            const(Cp, Cp), const(1, Cp),
            const(Cp, Cp), const(1, Cp),
            const(1, Cp), const(1, Cp),
            const(Cp, hidden2), const(1, hidden2),
            const(9, hidden2), const(1, hidden2),
            const(hidden2, Cp), const(1, Cp),
        ]
        out = pl.pallas_call(
            functools.partial(_block_kernel_packed2s, H=H, W=W, rpc=rpc,
                              n_chunks=n_chunks, CH=CH),
            grid=(P, row_chunks),
            in_specs=in_specs,
            out_specs=cspec((1, rpc * W, Cp), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((P, N, Cp), x.dtype),
            interpret=interpret,
        )(*args)
        return out.reshape(P, N, 2, C).transpose(0, 2, 1, 3).reshape(B, N, C)

    def bspec(shape, batched=True):
        if batched:
            return pl.BlockSpec((1, *shape), lambda i: (i, *([0] * len(shape))),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    row = lambda w: jnp.asarray(w).reshape(1, -1)
    args = (
        xp, packed["ln1"], bdk, bdv, seg, segT, ind, indT,
        packed["wq"], row(packed["bq"]), packed["wo"], row(packed["bo"]),
        row(packed["ln2_scale"]), row(packed["ln2_bias"]),
        packed["w1"], row(packed["b1"]),
        packed["wdw"], row(packed["bdw"]),
        packed["w2"], row(packed["b2"]),
    )
    C2 = 2 * C
    in_specs = [
        bspec((N, C2)), bspec((2, C2), False),
        bspec((C2, 2 * Nkv)), bspec((2 * Nkv, C2)),
        bspec((2 * Nkv, 2), False), bspec((2, 2 * Nkv), False),
        bspec((C2, 2), False), bspec((2, C2), False),
        bspec((C2, C2), False), bspec((1, C2), False),
        bspec((C2, C2), False), bspec((1, C2), False),
        bspec((1, C2), False), bspec((1, C2), False),
        bspec((C2, hidden2), False), bspec((1, hidden2), False),
        bspec((9, hidden2), False), bspec((1, hidden2), False),
        bspec((hidden2, C2), False), bspec((1, C2), False),
    ]

    out = pl.pallas_call(
        functools.partial(_block_kernel_packed2, H=H, W=W,
                          n_chunks=n_chunks, CH=CH),
        grid=(P,),
        in_specs=in_specs,
        out_specs=bspec((N, C2)),
        out_shape=jax.ShapeDtypeStruct((P, N, C2), x.dtype),
        interpret=interpret,
    )(*args)
    # unpack: [P, N, 128] -> [B, N, 64]
    return out.reshape(P, N, 2, C).transpose(0, 2, 1, 3).reshape(B, N, C)


# -- whole-stage fusion: every block of a MiT stage in ONE pallas call ---------
#
# Round-3 finding (scripts/probe_stage_fusion.py): the per-block kernels are
# dominated by activation HBM round-trips — a pass-through of stage 3's
# exact block shape costs ~85% of the real block kernel's time. This kernel
# keeps the activation RESIDENT in VMEM across all ``depth`` blocks of a
# stage (the output block's index is constant over the inner grid axis, so
# Mosaic never flushes it) and instead STREAMS the per-block weights through
# a block-indexed grid axis — large contiguous DMAs that pipeline behind
# compute. Activation traffic drops from 2*depth to 2 block-sized transfers
# per batch tile.
#
# To make each block self-contained (its k/v depend on its own input, which
# only exists in VMEM), the spatial-reduction conv + LN + kv projection move
# IN-kernel: the sr x sr stride-sr conv is computed as sr^2 tap-shifted
# matmuls at full resolution, and the stride-sr row selection is one
# indicator matmul (computed-index gathers run at ~0.45 GB/s on TPU —
# docs/kernel_notes.md — while a 0/1 selection matmul rides the MXU; each
# output row has exactly one hit, so bf16 is exact). The per-depth prompt
# add (lightweight_mlp -> GELU -> shared_mlp, mit_evp PromptGenerator
# get_prompt) is also fused, reading the stage-constant prompt base from a
# second resident input block.
#
# ``phases=2`` splits each block into an attention step and an MLP step on
# the inner grid axis, halving peak VMEM (temporaries of the two halves
# never coexist); weight index maps use j//2 so each block's weights are
# still fetched once.


def _shift_rows(h, off):
    """shifted[t] = h[t + off] with zero fill (static concat shift)."""
    M, C = h.shape
    if off > 0:
        return jnp.concatenate([h[off:], jnp.zeros((off, C), h.dtype)], 0)
    if off < 0:
        return jnp.concatenate([jnp.zeros((-off, C), h.dtype), h[:off]], 0)
    return h


def _stage_kernel(
    *refs,
    heads: int, H: int, W: int, sr: int, bt: int,
    has_base: bool, phases: int,
):
    it = iter(refs)
    x_ref = next(it)
    if has_base:
        base_ref = next(it)
        sharedw_ref = next(it)
        sharedb_ref = next(it)
        lww_ref = next(it)
        lwb_ref = next(it)
    if sr > 1:
        ssel_ref = next(it)
        srw_ref = next(it)
        srb_ref = next(it)
        lnkv_ref = next(it)
    (ln1_ref, wkv_ref, bkv_ref, wq_ref, bq_ref, wo_ref, bo_ref,
     ln2_ref, w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref,
     y_ref) = list(it)

    N = H * W
    C = x_ref.shape[-1]
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _seed():
        y_ref[0] = x_ref[0]

    def attn_half():
        x = y_ref[0]  # [bt*N, C]
        if has_base:
            feat = (
                jnp.dot(base_ref[0], lww_ref[0], preferred_element_type=jnp.float32)
                + lwb_ref[0]
            )
            # tanh-approx GELU (exact erf does not lower in Mosaic); the
            # XLA prompt path uses exact GELU — deviation <= ~1e-3
            feat = jax.nn.gelu(feat, approximate=True).astype(x.dtype)
            prompt = (
                jnp.dot(feat, sharedw_ref[:], preferred_element_type=jnp.float32)
                + sharedb_ref[:]
            )
            x = (x.astype(jnp.float32) + prompt).astype(x.dtype)

        ln1 = ln1_ref[0]
        xln = _layernorm(x, ln1[0:1], ln1[1:2])

        if sr > 1:
            # sr x sr stride-sr conv: tap-shifted matmuls at full resolution
            # (selected rows never read across an image edge: patch origins
            # satisfy sr*r + dy <= H-1), then indicator-matmul row selection
            acc = None
            for t in range(sr * sr):
                dy, dx = t // sr, t % sr
                shifted = _shift_rows(xln, dy * W + dx)
                contrib = jnp.dot(
                    shifted, srw_ref[0][t * C : (t + 1) * C, :],
                    preferred_element_type=jnp.float32,
                )
                acc = contrib if acc is None else acc + contrib
            acc = (acc + srb_ref[0]).astype(x.dtype)
            kvin = jnp.dot(ssel_ref[:], acc, preferred_element_type=jnp.float32)
            lnkv = lnkv_ref[0]
            kvin = _layernorm(kvin.astype(x.dtype), lnkv[0:1], lnkv[1:2])
        else:
            kvin = xln

        kv = (
            jnp.dot(kvin, wkv_ref[0], preferred_element_type=jnp.float32)
            + bkv_ref[0]
        ).astype(x.dtype)
        kk, vv = kv[:, :C], kv[:, C:]
        Nkv = kk.shape[0] // bt

        q = (
            jnp.dot(xln, wq_ref[0], preferred_element_type=jnp.float32)
            + bq_ref[0]
        ).astype(x.dtype)

        ctx_rows = []
        for b in range(bt):
            qb = q[b * N : (b + 1) * N]
            kb = kk[b * Nkv : (b + 1) * Nkv]
            vb = vv[b * Nkv : (b + 1) * Nkv]
            ctx_heads = []
            for h in range(heads):
                sl = slice(h * hd, (h + 1) * hd)
                scores = (
                    jax.lax.dot_general(
                        qb[:, sl], kb[:, sl],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )
                probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                ctx_heads.append(
                    jnp.dot(probs, vb[:, sl], preferred_element_type=jnp.float32)
                )
            ctx_rows.append(jnp.concatenate(ctx_heads, axis=-1))
        ctx = (
            jnp.concatenate(ctx_rows, axis=0) if bt > 1 else ctx_rows[0]
        ).astype(x.dtype)

        attn_out = (
            jnp.dot(ctx, wo_ref[0], preferred_element_type=jnp.float32)
            + bo_ref[0]
        )
        return (x.astype(jnp.float32) + attn_out).astype(x.dtype)

    def mlp_half(x1):
        ln2 = ln2_ref[0]
        h2 = _layernorm(x1, ln2[0:1], ln2[1:2])
        h2 = (
            jnp.dot(h2, w1_ref[0], preferred_element_type=jnp.float32)
            + b1_ref[0]
        ).astype(x1.dtype)
        h2 = _dwconv3x3(h2, wdw_ref[0], bdw_ref[0], H, W, N)
        h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True)
        mlp_out = (
            jnp.dot(h2.astype(x1.dtype), w2_ref[0], preferred_element_type=jnp.float32)
            + b2_ref[0]
        )
        return (x1.astype(jnp.float32) + mlp_out).astype(y_ref.dtype)

    if phases == 1:
        y_ref[0] = mlp_half(attn_half())
    else:
        @pl.when(j % 2 == 0)
        def _attn():
            y_ref[0] = attn_half()

        @pl.when(j % 2 == 1)
        def _mlp():
            y_ref[0] = mlp_half(y_ref[0])


def stage_weights_from_params(
    params: dict, stage: int, depth: int, dtype=jnp.bfloat16,
) -> dict:
    """Stack one MiT stage's per-block weights (+ per-depth prompt MLPs, if
    the prompt generator has them) along a leading depth axis for
    ``fused_mit_stage``'s streaming BlockSpecs."""
    bws = [block_weights_from_params(params[f"block{stage}_{d}"])
           for d in range(depth)]
    bps = [params[f"block{stage}_{d}"] for d in range(depth)]
    cast = lambda a: jnp.asarray(a, dtype)
    stack = lambda key: jnp.stack([cast(w[key]) for w in bws])
    stack_row = lambda key: jnp.stack([cast(w[key]).reshape(1, -1) for w in bws])
    ln = lambda skey, bkey: jnp.stack(
        [jnp.stack([cast(w[skey]), cast(w[bkey])]) for w in bws])
    out = {
        "ln1": ln("ln1_scale", "ln1_bias"),
        "ln2": ln("ln2_scale", "ln2_bias"),
        "wq": stack("wq"), "bq": stack_row("bq"),
        "wo": stack("wo"), "bo": stack_row("bo"),
        "w1": stack("w1"), "b1": stack_row("b1"),
        "wdw": stack("wdw"), "bdw": stack_row("bdw"),
        "w2": stack("w2"), "b2": stack_row("b2"),
        "wkv": jnp.stack([cast(bp["attn"]["kv"]["kernel"]) for bp in bps]),
        "bkv": jnp.stack([cast(bp["attn"]["kv"]["bias"]).reshape(1, -1)
                          for bp in bps]),
    }
    if "sr" in bps[0]["attn"]:
        # flax conv kernel [sr, sr, C, C] -> rows ordered (dy, dx, c_in)
        out["srw"] = jnp.stack([
            cast(bp["attn"]["sr"]["kernel"]).reshape(-1, bp["attn"]["sr"]["kernel"].shape[-1])
            for bp in bps
        ])
        out["srb"] = jnp.stack([cast(bp["attn"]["sr"]["bias"]).reshape(1, -1)
                                for bp in bps])
        out["lnkv"] = jnp.stack([
            jnp.stack([cast(bp["attn"]["norm"]["scale"]),
                       cast(bp["attn"]["norm"]["bias"])])
            for bp in bps
        ])
    pg = params.get("prompt_generator")
    if pg is not None and f"lightweight_mlp{stage}_0" in pg:
        out["lww"] = jnp.stack([cast(pg[f"lightweight_mlp{stage}_{d}"]["kernel"])
                                for d in range(depth)])
        out["lwb"] = jnp.stack([cast(pg[f"lightweight_mlp{stage}_{d}"]["bias"]).reshape(1, -1)
                                for d in range(depth)])
        out["sharedw"] = cast(pg[f"shared_mlp{stage}"]["kernel"])
        out["sharedb"] = cast(pg[f"shared_mlp{stage}"]["bias"]).reshape(1, -1)
    return out


@functools.lru_cache(maxsize=None)
def _sr_selector(bt: int, H: int, W: int, sr: int) -> np.ndarray:
    """[bt*Nkv, bt*N] 0/1 selection of stride-sr patch origins per image."""
    N = H * W
    Hk, Wk = H // sr, W // sr
    Nkv = Hk * Wk
    S = np.zeros((bt * Nkv, bt * N), np.float32)
    for b in range(bt):
        for r in range(Hk):
            for c in range(Wk):
                S[b * Nkv + r * Wk + c, b * N + (sr * r) * W + sr * c] = 1.0
    return S


@functools.partial(
    jax.jit,
    static_argnames=("heads", "H", "W", "sr", "bt", "phases", "interpret"),
)
def fused_mit_stage(
    x: jax.Array,              # [B, N, C] stage input (post patch-embed LN)
    base: jax.Array | None,    # [B, N, C] prompt base (None -> no prompt adds)
    sw: dict[str, Any],        # stage_weights_from_params(...)
    *,
    heads: int,
    H: int,
    W: int,
    sr: int,
    bt: int = 1,
    phases: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """All blocks of one MiT stage fused: resident activation, streamed
    per-block weights. See the section comment above for the design."""
    B, N, C = x.shape
    g = sw["wq"].shape[0]
    hidden = sw["w1"].shape[-1]
    has_base = base is not None
    assert B % bt == 0, (B, bt)
    assert phases in (1, 2), phases
    if has_base:
        assert "lww" in sw, "prompt weights missing from stage weights"
    G = B // bt
    M = bt * N

    resident = lambda ch=C: pl.BlockSpec((1, M, ch), lambda i, j: (i, 0, 0),
                                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    midx = (lambda i, j: (j, 0, 0)) if phases == 1 else (
        lambda i, j: (j // 2, 0, 0))
    stream = lambda shape: pl.BlockSpec((1, *shape), midx,
                                        memory_space=pltpu.VMEM)

    args = [x.reshape(G, M, C)]
    specs = [resident()]
    if has_base:
        # base is the C/scale_factor-wide prompt embedding (PromptGenerator:
        # lightweight_mlp Cb -> C4, shared_mlp C4 -> C)
        Cb = base.shape[-1]
        C4 = sw["lww"].shape[-1]
        assert sw["lww"].shape[1] == Cb, (sw["lww"].shape, Cb)
        args += [base.reshape(G, M, Cb), sw["sharedw"], sw["sharedb"],
                 sw["lww"], sw["lwb"]]
        specs += [resident(Cb), const((C4, C)), const((1, C)),
                  stream((Cb, C4)), stream((1, C4))]
    if sr > 1:
        Nkv = (H // sr) * (W // sr)
        ssel = jnp.asarray(_sr_selector(bt, H, W, sr), x.dtype)
        args += [ssel, sw["srw"], sw["srb"], sw["lnkv"]]
        specs += [const((bt * Nkv, M)), stream((sr * sr * C, C)),
                  stream((1, C)), stream((2, C))]
    args += [sw["ln1"], sw["wkv"], sw["bkv"], sw["wq"], sw["bq"],
             sw["wo"], sw["bo"], sw["ln2"], sw["w1"], sw["b1"],
             sw["wdw"], sw["bdw"], sw["w2"], sw["b2"]]
    specs += [stream((2, C)), stream((C, 2 * C)), stream((1, 2 * C)),
              stream((C, C)), stream((1, C)), stream((C, C)), stream((1, C)),
              stream((2, C)), stream((C, hidden)), stream((1, hidden)),
              stream((9, hidden)), stream((1, hidden)),
              stream((hidden, C)), stream((1, C))]

    out = pl.pallas_call(
        functools.partial(_stage_kernel, heads=heads, H=H, W=W, sr=sr, bt=bt,
                          has_base=has_base, phases=phases),
        grid=(G, g * phases),
        in_specs=specs,
        out_specs=resident(),
        out_shape=jax.ShapeDtypeStruct((G, M, C), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, N, C)


# -- training path: fused forward + fused backward (custom VJP) ---------------
#
# The backbone training recipe freezes the whole MiT trunk (reference
# train_evp.py:379-382 — only head/prompt-generator/flow-encoder/cross-attn
# train), so the block kernels need INPUT gradients only: dx, dxln, dk, dv.
# Weight cotangents are returned as zeros and must never be consumed — the
# trainer guarantees this by differentiating only the trainable parameter
# subtree (train/backbone.py::partition_params).
#
# Forward adds per-sample stochastic-depth multipliers m1/m2 (DropPath,
# mix_transformer_evp.py Block: residual branches scaled by keep-mask/keep):
#   x1 = x + m1 * attn(LN1(x));  y = x1 + m2 * mlp(LN2(x1))
# Backward recomputes the forward intermediates in-VMEM from the saved
# kernel inputs (flash-style: no [B, N, hidden] activations ever touch HBM)
# and emits all four input gradients in one pass.


def _gelu_tanh_grad(x32: jax.Array) -> jax.Array:
    """d/dx of tanh-approx GELU (the forward kernel's nonlinearity)."""
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    inner = c * (x32 + 0.044715 * x32 * x32 * x32)
    t = jnp.tanh(inner)
    dinner = c * (1.0 + 3 * 0.044715 * x32 * x32)
    return 0.5 * (1.0 + t) + 0.5 * x32 * (1.0 - t * t) * dinner


def _dwconv3x3_T(g, w_taps, H, W, N):
    """Transpose (input-gradient) of ``_dwconv3x3`` on [bt*N, C] tokens.

    Forward: acc[t] += valid_k(t) * h[t + off_k] * w_k, so
    dh[u] = sum_k valid_k(u - off_k) * g[u - off_k] * w_k — the classic
    conv-transpose-is-a-flipped-conv identity, written in the SAME structure
    as the forward: shift the SHARED g by the negated offset, then mask and
    scale in one fused elementwise chain. (Masking a per-tap copy of g
    BEFORE shifting materializes 9 [M, C] temporaries — measured +10 MB of
    VMEM stack at stage-1 sizes — because the concat-shift of a computed
    array defeats Mosaic's elementwise fusion.) The mask condition at
    destination u is (row(u) - dy, col(u) - dx) in-grid: exactly the source
    positions that fired the tap in the forward. Returns g.dtype.
    """
    M, C = g.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % N
    row = idx // W
    col = idx % W
    acc = jnp.zeros((M, C), jnp.float32)
    k = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = -(dy * W + dx)  # shifted[t] = g[t + off] = g[u - off_k]
            if off > 0:
                shifted = jnp.concatenate([g[off:], jnp.zeros((off, C), g.dtype)], 0)
            elif off < 0:
                shifted = jnp.concatenate([jnp.zeros((-off, C), g.dtype), g[:off]], 0)
            else:
                shifted = g
            valid = (
                (row - dy >= 0) & (row - dy < H) & (col - dx >= 0) & (col - dx < W)
            )
            acc = acc + jnp.where(valid, shifted, 0).astype(jnp.float32) * w_taps[k][None, :]
            k += 1
    return acc.astype(g.dtype)


def _block_train_fwd_kernel(
    x_ref, xln_ref, k_ref, v_ref, m1_ref, m2_ref,
    wq_ref, bq_ref, wo_ref, bo_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref, b2_ref,
    y_ref, x1_ref=None,
    *, heads: int, H: int, W: int, bt: int,
):
    """_block_kernel + per-sample DropPath branch multipliers m1/m2
    ([bt*N, 1] f32, values in {0, 1/keep}).

    When ``x1_ref`` is present (the VJP forward), the post-attention
    residual x1 is also written out: the backward pass then splits into an
    MLP kernel (x1 -> dx1) and an attention kernel (dx1 -> dxln/dk/dv),
    each with about half the VMEM working set of a monolithic backward."""
    N = H * W
    C = x_ref.shape[-1]
    Nkv = k_ref.shape[1] // bt
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)

    x = x_ref[0]
    xln = xln_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    m1 = m1_ref[0]
    m2 = m2_ref[0]

    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(x.dtype)

    ctx_rows = []
    for b in range(bt):
        qb = q[b * N : (b + 1) * N]
        kb = kk[b * Nkv : (b + 1) * Nkv]
        vb = vv[b * Nkv : (b + 1) * Nkv]
        ctx_heads = []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            scores = (
                jax.lax.dot_general(
                    qb[:, sl], kb[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx_heads.append(
                jnp.dot(probs, vb[:, sl], preferred_element_type=jnp.float32)
            )
        ctx_rows.append(jnp.concatenate(ctx_heads, axis=-1))
    ctx = (
        jnp.concatenate(ctx_rows, axis=0) if bt > 1 else ctx_rows[0]
    ).astype(x.dtype)

    attn_out = (
        jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[0][None, :]
    )
    x = (x.astype(jnp.float32) + m1 * attn_out).astype(x.dtype)
    if x1_ref is not None:
        x1_ref[0] = x

    h2 = _layernorm(x, ln2s_ref[0][None, :], ln2b_ref[0][None, :])
    h2 = (
        jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    ).astype(x.dtype)
    h2 = _dwconv3x3(h2, wdw_ref[:], bdw_ref[0][None, :], H, W, N)
    h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True)
    mlp_out = (
        jnp.dot(h2.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    y_ref[0] = (x.astype(jnp.float32) + m2 * mlp_out).astype(y_ref.dtype)


def _mlp_bwd_kernel(
    h2ln_ref, dmlp_ref,
    w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref,
    dh2ln_ref,
    *, H: int, W: int, bt: int,
):
    """MLP-half backward, ONE hidden chunk per grid step.

    Grid is (batch-tiles, hidden/ch); the chunk axis is a REAL grid
    dimension because Mosaic does not reuse stack slots across an unrolled
    in-kernel chunk loop — measured: an in-kernel loop holds ~7 f32
    [M, hidden]-equivalents regardless of chunk width (22.3 MB at stage 1),
    while per-grid-step temporaries are one chunk's worth. The dh2ln output
    block has a constant index over the chunk axis, so it stays resident in
    VMEM and accumulates across steps (standard TPU reduction pattern).

    fc1 -> dwconv -> GELU' -> fc2^T -> dwconv^T -> fc1^T per chunk; the
    LayerNorm2 statistics and backward are elementwise and run in XLA
    outside (fused into the surrounding ops).
    """
    N = H * W
    j = pl.program_id(1)
    h2ln = h2ln_ref[0]
    dmlp = dmlp_ref[0]
    a1c = (
        jnp.dot(h2ln, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    ).astype(h2ln.dtype)
    hdc = _dwconv3x3(a1c, wdw_ref[:], bdw_ref[0][None, :], H, W, N)
    gp = _gelu_tanh_grad(hdc.astype(jnp.float32))
    # dg_c = dmlp @ W2_c^T  (contract over C)
    dgc = jax.lax.dot_general(
        dmlp, w2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhdc = (dgc * gp).astype(h2ln.dtype)
    da1c = _dwconv3x3_T(dhdc, wdw_ref[:], H, W, N)  # [M, ch], h2ln.dtype
    contrib = jax.lax.dot_general(
        da1c, w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        dh2ln_ref[0] = contrib

    @pl.when(j > 0)
    def _acc():
        dh2ln_ref[0] += contrib


def _attn_bwd_kernel(
    xln_ref, k_ref, v_ref, dx1_ref, m1_ref,
    wq_ref, bq_ref, wo_ref,
    dxln_ref, dk_ref, dv_ref,
    *, heads: int, H: int, W: int, bt: int,
):
    """Attention-half backward: dx1 -> dxln/dk/dv.

    Recomputes q and the per-image/per-head probabilities (Nkv is the tiny
    SR-reduced length), then runs the softmax/context backward per image."""
    N = H * W
    C = xln_ref.shape[-1]
    Nkv = k_ref.shape[1] // bt
    hd = C // heads
    scale = 1.0 / np.sqrt(hd)

    xln = xln_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    m1 = m1_ref[0]

    q = (
        jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(xln.dtype)

    dattn = (dx1_ref[0].astype(jnp.float32) * m1).astype(xln.dtype)
    # dctx = dattn @ Wo^T
    dctx = jax.lax.dot_general(
        dattn, wo_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xln.dtype)

    dq_rows, dk_rows, dv_rows = [], [], []
    for b in range(bt):
        qb = q[b * N : (b + 1) * N]
        kb = kk[b * Nkv : (b + 1) * Nkv]
        vb = vv[b * Nkv : (b + 1) * Nkv]
        dctx_b = dctx[b * N : (b + 1) * N]
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            scores = (
                jax.lax.dot_general(
                    qb[:, sl], kb[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            P = jax.nn.softmax(scores, axis=-1)  # f32 [N, Nkv]
            dctx_h = dctx_b[:, sl]
            # dP = dctx_h @ v_h^T
            dP = jax.lax.dot_general(
                dctx_h, vb[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dv_h = P^T @ dctx_h (contract over N)
            dv_heads.append(jax.lax.dot_general(
                P.astype(xln.dtype), dctx_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dS = P * (dP - jnp.sum(dP * P, axis=-1, keepdims=True))
            dS = (dS * scale).astype(xln.dtype)
            dq_heads.append(jnp.dot(dS, kb[:, sl],
                                    preferred_element_type=jnp.float32))
            dk_heads.append(jax.lax.dot_general(
                dS, qb[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dq_rows.append(jnp.concatenate(dq_heads, axis=-1))
        dk_rows.append(jnp.concatenate(dk_heads, axis=-1))
        dv_rows.append(jnp.concatenate(dv_heads, axis=-1))
    dq = (jnp.concatenate(dq_rows, axis=0) if bt > 1 else dq_rows[0]).astype(xln.dtype)

    # dxln = dq @ Wq^T
    dxln = jax.lax.dot_general(
        dq, wq_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dxln_ref[0] = dxln.astype(dxln_ref.dtype)
    dk_ref[0] = (
        jnp.concatenate(dk_rows, axis=0) if bt > 1 else dk_rows[0]
    ).astype(dk_ref.dtype)
    dv_ref[0] = (
        jnp.concatenate(dv_rows, axis=0) if bt > 1 else dv_rows[0]
    ).astype(dv_ref.dtype)


def _bspec_maker():
    def bspec(shape, batched=True):
        if batched:
            return pl.BlockSpec((1, *shape), lambda i: (i, *([0] * len(shape))),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)
    return bspec


def _flatten_train_args(x, xln, k, v, m1, m2, bt):
    B, N, C = x.shape
    Nkv = k.shape[1]
    G = B // bt
    xf = x.reshape(G, bt * N, C)
    xlnf = xln.reshape(G, bt * N, C)
    kf = k.reshape(G, bt * Nkv, C)
    vf = v.reshape(G, bt * Nkv, C)
    # per-sample multipliers -> per-token rows [G, bt*N, 1]
    m1f = jnp.repeat(m1.astype(jnp.float32), N).reshape(G, bt * N, 1)
    m2f = jnp.repeat(m2.astype(jnp.float32), N).reshape(G, bt * N, 1)
    return xf, xlnf, kf, vf, m1f, m2f


def _mlp_chunk(M: int, hidden: int) -> int:
    """Hidden-chunk width for the MLP backward grid: a power-of-two divisor
    of ``hidden`` keeping one grid step's ~7 f32 [M, ch] temporaries under
    ~6 MB of VMEM stack (measured: straight-line kernel code frees nothing,
    so the whole chunk's temp chain is resident at once)."""
    ch = 128
    while (ch * 2 <= hidden and hidden % (ch * 2) == 0
           and M * (ch * 2) * 28 <= (6 << 20)):
        ch *= 2
    while hidden % ch != 0 and ch > 1:
        ch //= 2
    return max(ch, 1)


row_ = lambda w: jnp.asarray(w).reshape(1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_block_train(heads, H, W, bt, interpret, x, xln, k, v, m1, m2, weights):
    y, _ = _run_train_fwd(heads, H, W, bt, interpret, x, xln, k, v, m1, m2,
                          weights, save_x1=False)
    return y


def _run_train_fwd(heads, H, W, bt, interpret, x, xln, k, v, m1, m2, weights,
                   save_x1: bool):
    B, N, C = x.shape
    Nkv = k.shape[1]
    hidden = weights["w1"].shape[1]
    xf, xlnf, kf, vf, m1f, m2f = _flatten_train_args(x, xln, k, v, m1, m2, bt)
    bspec = _bspec_maker()
    in_specs = [
        bspec((bt * N, C)), bspec((bt * N, C)),
        bspec((bt * Nkv, C)), bspec((bt * Nkv, C)),
        bspec((bt * N, 1)), bspec((bt * N, 1)),
        bspec((C, C), False), bspec((1, C), False),
        bspec((C, C), False), bspec((1, C), False),
        bspec((1, C), False), bspec((1, C), False),
        bspec((C, hidden), False), bspec((1, hidden), False),
        bspec((9, hidden), False), bspec((1, hidden), False),
        bspec((hidden, C), False), bspec((1, C), False),
    ]
    wargs = [
        weights["wq"], row_(weights["bq"]), weights["wo"], row_(weights["bo"]),
        row_(weights["ln2_scale"]), row_(weights["ln2_bias"]),
        weights["w1"], row_(weights["b1"]),
        weights["wdw"], row_(weights["bdw"]),
        weights["w2"], row_(weights["b2"]),
    ]
    out_specs = bspec((bt * N, C))
    out_shape = jax.ShapeDtypeStruct((B // bt, bt * N, C), x.dtype)
    if save_x1:
        out_specs = (out_specs, bspec((bt * N, C)))
        out_shape = (out_shape, jax.ShapeDtypeStruct((B // bt, bt * N, C), x.dtype))
    out = pl.pallas_call(
        functools.partial(_block_train_fwd_kernel, heads=heads, H=H, W=W, bt=bt),
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xf, xlnf, kf, vf, m1f, m2f, *wargs)
    if save_x1:
        y, x1 = out
        return y.reshape(B, N, C), x1.reshape(B, N, C)
    return out.reshape(B, N, C), None


def _fused_block_train_fwd(heads, H, W, bt, interpret, x, xln, k, v, m1, m2, weights):
    y, x1 = _run_train_fwd(heads, H, W, bt, interpret, x, xln, k, v, m1, m2,
                           weights, save_x1=True)
    return y, (x1, xln, k, v, m1, m2, weights)


def _fused_block_train_bwd(heads, H, W, bt, interpret, res, dy):
    x1, xln, k, v, m1, m2, weights = res
    B, N, C = x1.shape
    Nkv = k.shape[1]
    hidden = weights["w1"].shape[1]
    ch = _mlp_chunk(bt * N, hidden)
    bspec = _bspec_maker()

    G = B // bt
    x1f = x1.reshape(G, bt * N, C)
    dyf = dy.reshape(G, bt * N, C)
    m1f = jnp.repeat(m1.astype(jnp.float32), N).reshape(G, bt * N, 1)
    m2f = jnp.repeat(m2.astype(jnp.float32), N).reshape(G, bt * N, 1)

    # ---- kernel 1: MLP backward, x1 + dy -> dx1 (== dx) -------------------
    # LayerNorm2 statistics + backward are elementwise: XLA computes (and
    # fuses) them around the chunked Pallas matmul/dwconv walk.
    eps = 1e-6
    x32 = x1f.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    hhat = (x32 - mu) * inv
    gamma = weights["ln2_scale"].astype(jnp.float32)[None, None, :]
    h2ln = (hhat * gamma + weights["ln2_bias"][None, None, :]).astype(x1.dtype)
    dy32 = dyf.astype(jnp.float32)
    dmlp = (dy32 * m2f).astype(x1.dtype)

    K = hidden // ch
    M = bt * N
    dh2ln = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, H=H, W=W, bt=bt),
        grid=(G, K),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ch), lambda g, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda g, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ch), lambda g, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda g, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, C), lambda g, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, C), lambda g, j: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, C), jnp.float32),
        interpret=interpret,
    )(
        h2ln, dmlp,
        weights["w1"], row_(weights["b1"]),
        weights["wdw"], row_(weights["bdw"]),
        weights["w2"],
    )

    dhhat = dh2ln * gamma
    mh = jnp.mean(dhhat, axis=-1, keepdims=True)
    mh2 = jnp.mean(dhhat * hhat, axis=-1, keepdims=True)
    dx1 = (dy32 + inv * (dhhat - mh - hhat * mh2)).astype(x1.dtype)

    # ---- kernel 2: attention backward, dx1 -> dxln/dk/dv ------------------
    xlnf = xln.reshape(G, bt * N, C)
    kf = k.reshape(G, bt * Nkv, C)
    vf = v.reshape(G, bt * Nkv, C)
    dxln, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads=heads, H=H, W=W, bt=bt),
        grid=(G,),
        in_specs=[
            bspec((bt * N, C)), bspec((bt * Nkv, C)), bspec((bt * Nkv, C)),
            bspec((bt * N, C)), bspec((bt * N, 1)),
            bspec((C, C), False), bspec((1, C), False),
            bspec((C, C), False),
        ],
        out_specs=(
            bspec((bt * N, C)), bspec((bt * Nkv, C)), bspec((bt * Nkv, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, bt * N, C), xln.dtype),
            jax.ShapeDtypeStruct((G, bt * Nkv, C), k.dtype),
            jax.ShapeDtypeStruct((G, bt * Nkv, C), v.dtype),
        ),
        interpret=interpret,
    )(
        xlnf, kf, vf, dx1, m1f,
        weights["wq"], row_(weights["bq"]), weights["wo"],
    )

    # weight/mask cotangents are structurally zero: the trainer freezes the
    # trunk (never differentiates block weights) and the DropPath masks are
    # non-differentiable data
    return (
        dx1.reshape(B, N, C), dxln.reshape(B, N, C),
        dk.reshape(B, Nkv, C), dv.reshape(B, Nkv, C),
        jnp.zeros_like(m1), jnp.zeros_like(m2),
        jax.tree.map(jnp.zeros_like, weights),
    )


_fused_block_train.defvjp(_fused_block_train_fwd, _fused_block_train_bwd)


def fused_mit_block_train(
    x: jax.Array,      # [B, N, C] residual input
    xln: jax.Array,    # [B, N, C] = LN1(x)
    k: jax.Array,      # [B, Nkv, C]
    v: jax.Array,      # [B, Nkv, C]
    weights: dict[str, Any],
    m1: jax.Array,     # [B] DropPath multiplier, attention branch
    m2: jax.Array,     # [B] DropPath multiplier, MLP branch
    *,
    heads: int,
    H: int,
    W: int,
    bt: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused MiT block for FROZEN-trunk training.

    Gradients flow to x/xln/k/v (and through them to the prompt adds and
    LN1/SR/kv projections outside the kernel). Block weight cotangents are
    ZERO by construction — callers must not differentiate w.r.t. ``weights``
    (the reference recipe never does: train_evp.py:379-382).
    """
    assert x.shape[0] % bt == 0, (x.shape, bt)
    return _fused_block_train(heads, H, W, bt, interpret,
                              x, xln, k, v, m1, m2, weights)


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
        "ln1_scale": p["norm1"]["scale"],
        "ln1_bias": p["norm1"]["bias"],
        "ln2_scale": p["norm2"]["scale"],
        "ln2_bias": p["norm2"]["bias"],
        "w1": mlp["fc1"]["kernel"],
        "b1": mlp["fc1"]["bias"],
        "wdw": dw.reshape(9, dw.shape[-1]),
        "bdw": mlp["dwconv"]["dwconv"]["bias"],
        "w2": mlp["fc2"]["kernel"],
        "b2": mlp["fc2"]["bias"],
    }
