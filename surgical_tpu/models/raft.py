"""RAFT optical flow in JAX/flax, weight-compatible with raft-things.pth.

The reference precomputes flow with the upstream CUDA/PyTorch RAFT
(``core/raft`` + ``raft-things.pth``, both MISSING from the snapshot —
RAFT.py:7,19-21,36; SURVEY §2.9), running 20 GRU iterations per frame pair
(RAFT.py:85) at FRAME_INTERVAL=25 (1-fps pairs). This is a from-scratch
TPU-native RAFT (Teed & Deng, ECCV'20 architecture) whose module/parameter
layout matches the upstream checkpoint so trained weights import directly
(models/convert.py::import_raft_state_dict):

- feature encoder (``fnet``): 2-blocks-per-layer residual CNN -> 256-d at
  1/8 resolution, non-affine instance norm (both frames, shared weights)
- context encoder (``cnet``): same trunk with (frozen, eval-mode) batch
  norm -> 128 tanh "net" + 128 relu "inp"
- all-pairs correlation volume as ONE [N, N] matmul on the MXU, then a
  4-level average-pooled pyramid
- per-iteration lookup of a (2r+1)^2 window around the current flow in every
  pyramid level (bilinear gather); window channels enumerate x-offset-major,
  matching upstream's ``meshgrid(dy, dx)`` quirk so conv weights line up
- separable (1x5 then 5x1) ConvGRU update + flow head + convex 8x
  upsampling (mask channels are 9-outer: ``view(N, 1, 9, 8, 8, H, W)``)

RAFT here is inference-only (flow precompute), so batch norm is a frozen
affine transform with imported running statistics — there is no training
path to keep stats for.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class InstanceNorm(nn.Module):
    """Non-affine instance norm (upstream InstanceNorm2d default)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, C]; normalize over H, W per sample/channel
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d: a fixed affine transform from imported running
    statistics. Initializes to identity (mean 0, var 1, scale 1, bias 0)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return InstanceNorm(features, name=name)
    return FrozenBatchNorm(features, name=name)


class ResidualUnit(nn.Module):
    """Upstream ResidualBlock: two conv+norm+relu, optional 1x1 downsample."""

    features: int
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1")(x)
        y = nn.relu(_norm(self.norm, self.features, "norm1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(_norm(self.norm, self.features, "norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride), name="downsample")(x)
            x = _norm(self.norm, self.features, "norm3")(x)
        return nn.relu(x + y)


class Encoder(nn.Module):
    """1/8-resolution trunk (upstream BasicEncoder): conv7x7/2, three
    2-block residual layers (64, 96/2, 128/2), 1x1 projection."""

    out_dim: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = nn.relu(_norm(self.norm, 64, "norm1")(x))
        x = ResidualUnit(64, 1, self.norm, name="layer1_0")(x)
        x = ResidualUnit(64, 1, self.norm, name="layer1_1")(x)
        x = ResidualUnit(96, 2, self.norm, name="layer2_0")(x)
        x = ResidualUnit(96, 1, self.norm, name="layer2_1")(x)
        x = ResidualUnit(128, 2, self.norm, name="layer3_0")(x)
        x = ResidualUnit(128, 1, self.norm, name="layer3_1")(x)
        return nn.Conv(self.out_dim, (1, 1), name="conv2")(x)


def all_pairs_correlation(f1: jax.Array, f2: jax.Array) -> jax.Array:
    """f1, f2: [H, W, C] -> corr [H*W, H, W] (normalized by sqrt(C))."""
    H, W, C = f1.shape
    a = f1.reshape(H * W, C)
    b = f2.reshape(H * W, C)
    corr = (a @ b.T) / np.sqrt(C)  # [N, N] — one MXU matmul
    return corr.reshape(H * W, H, W)


def corr_pyramid(corr: jax.Array, levels: int = 4) -> list[jax.Array]:
    """Average-pool the last two dims into a pyramid."""
    pyr = [corr]
    for _ in range(levels - 1):
        c = pyr[-1]
        N, h, w = c.shape
        if h < 2 or w < 2:
            break  # feature grid too small for more levels
        c = c.reshape(N, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        pyr.append(c)
    return pyr


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """img: [H, W]; coords: [..., 2] (x, y) -> [...] (zero padding)."""
    H, W = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        return jnp.where(valid, img[yi, xi], 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


def lookup_pyramid(pyr: list[jax.Array], flow: jax.Array, radius: int = 4) -> jax.Array:
    """Sample a (2r+1)^2 window around (grid + flow) in every level — as
    DENSE separable tent-weight matmuls, not gathers.

    flow: [H, W, 2] at 1/8 res. Returns [H, W, levels*(2r+1)^2].

    Bilinear sampling with zero padding at fractional coordinate c is
    exactly a contraction against the tent weights w[i] = relu(1 - |i - c|)
    over the source axis (two nonzeros in-range; all-zero out-of-range =
    the zero fill), and the window's integer offsets are just shifted
    centers — so the whole lookup is, per level,

        tmp[n, ky, w] = sum_h corr[n, h, w] * relu(1 - |h - (cy_n + d_ky)|)
        out[n, ky, kx] = sum_w tmp[n, ky, w] * relu(1 - |w - (cx_n + d_kx)|)

    two batched einsums that ride the MXU. Measured on chip (round 5,
    scripts/probe_flow.py): the previous 4-corner computed-index gather ran
    at ~0.43 GB/s (the known TPU gather hazard, docs/kernel_notes.md) and
    was 99.7% of the whole RAFT forward — 12.34 ms/iter at 256², 247.6 ms
    per 20-iter pair; this formulation replaces it with ~25 MFLOP of
    matmul + a streaming read of the corr pyramid. Exact same semantics
    (parity-tested vs the gather oracle).

    Window channel k = i*(2r+1)+j samples offset (dx=vals[i], dy=vals[j]):
    upstream builds ``delta = stack(meshgrid(dy, dx), -1)`` and adds it to
    (x, y) centroids, which enumerates the x offset along the OUTER axis —
    weight import requires the same enumeration.
    """
    H, W = flow.shape[:2]
    N = H * W
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    cx = (xx + flow[..., 0]).reshape(N)
    cy = (yy + flow[..., 1]).reshape(N)
    r = radius
    K = 2 * r + 1
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)  # window offsets

    out = []
    for lvl, corr in enumerate(pyr):
        scale = 2.0**lvl
        h, w = corr.shape[1], corr.shape[2]
        # tent weights [N, K, h/w]: relu(1 - |src - (center + offset)|)
        ys = cy[:, None, None] / scale + d[None, :, None]  # [N, K, 1]
        xs = cx[:, None, None] / scale + d[None, :, None]
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(jnp.arange(h, dtype=jnp.float32) - ys))
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs(jnp.arange(w, dtype=jnp.float32) - xs))
        tmp = jnp.einsum("nhw,nkh->nkw", corr.reshape(N, h, w), wy,
                         preferred_element_type=jnp.float32)
        smp = jnp.einsum("nkw,njw->nkj", tmp, wx,
                         preferred_element_type=jnp.float32)  # [N, ky, kx]
        # channel order: x offset OUTER (upstream meshgrid(dy, dx) quirk)
        out.append(smp.transpose(0, 2, 1).reshape(H, W, K * K))
    return jnp.concatenate(out, axis=-1)


def lookup_pyramid_gather(pyr: list[jax.Array], flow: jax.Array, radius: int = 4) -> jax.Array:
    """Reference 4-corner bilinear GATHER lookup — kept as the semantics
    oracle for lookup_pyramid (tests) and as documentation of the measured
    dead end (0.43 GB/s computed-index gathers, kernel_notes round 5)."""
    H, W = flow.shape[:2]
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    centers = jnp.stack([xx + flow[..., 0], yy + flow[..., 1]], axis=-1)  # [H,W,2]
    r = radius
    vals = jnp.arange(-r, r + 1, dtype=jnp.float32)
    d = jnp.stack(
        jnp.meshgrid(vals, vals, indexing="ij"), axis=-1
    ).reshape(-1, 2)  # [(2r+1)^2, 2] = (dx outer, dy inner)

    out = []
    K = d.shape[0]
    for lvl, corr in enumerate(pyr):
        scale = 2.0**lvl
        h, w = corr.shape[1], corr.shape[2]
        coords = centers.reshape(H * W, 1, 2) / scale + d[None, :, :]  # [N,K,2]
        cx, cy = coords[..., 0], coords[..., 1]
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        dx = cx - x0
        dy = cy - y0
        corr_flat = corr.reshape(H * W, h * w)

        def gather(xi, yi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = (
                jnp.clip(yi.astype(jnp.int32), 0, h - 1) * w
                + jnp.clip(xi.astype(jnp.int32), 0, w - 1)
            )
            vals = jnp.take_along_axis(corr_flat, idx, axis=1)  # [N, K]
            return jnp.where(valid, vals, 0.0)

        v00 = gather(x0, y0)
        v01 = gather(x0 + 1, y0)
        v10 = gather(x0, y0 + 1)
        v11 = gather(x0 + 1, y0 + 1)
        sampled = (
            v00 * (1 - dx) * (1 - dy)
            + v01 * dx * (1 - dy)
            + v10 * (1 - dx) * dy
            + v11 * dx * dy
        )
        out.append(sampled.reshape(H, W, K))
    return jnp.concatenate(out, axis=-1)


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU from raft-things."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        for name, ks in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            pad = (ks[0] // 2, ks[1] // 2)
            z = nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad, name=f"convr_{name}")(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden, ks, padding=pad, name=f"convq_{name}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow: jax.Array, corr_feat: jax.Array) -> jax.Array:
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr_feat))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(f))
        m = nn.relu(
            nn.Conv(128 - 2, (3, 3), padding=1, name="conv")(jnp.concatenate([c, f], -1))
        )
        return jnp.concatenate([m, flow], axis=-1)  # 128 channels


class UpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, corr_feat, flow):
        motion = MotionEncoder(name="encoder")(flow, corr_feat)
        net = SepConvGRU(self.hidden, name="gru")(net, jnp.concatenate([inp, motion], -1))
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, name="flow_head1")(net))
        delta = nn.Conv(2, (3, 3), padding=1, name="flow_head2")(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, name="mask1")(net))
        mask = nn.Conv(64 * 9, (1, 1), name="mask2")(m) * 0.25
        return net, delta, mask


def convex_upsample(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """8x convex-combination upsampling. flow: [H, W, 2]; mask: [H, W, 576].

    Mask channel layout is 9-OUTER (upstream ``view(N, 1, 9, 8, 8, H, W)``):
    channel c = k*64 + u*8 + v selects neighborhood tap k for subpixel (u, v).
    """
    H, W, _ = flow.shape
    mask = mask.reshape(H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=2)
    # 3x3 neighborhoods of the (8x-scaled) coarse flow, row-major like unfold
    fp = jnp.pad(flow * 8.0, ((1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)], axis=-2
    )  # [H, W, 9, 2]
    up = jnp.einsum("hwkuv,hwkc->hwuvc", mask, neigh)  # [H, W, 8, 8, 2]
    return up.transpose(0, 2, 1, 3, 4).reshape(H * 8, W * 8, 2)


class RAFT(nn.Module):
    """Two frames -> optical flow. Images: [H, W, 3] in [-1, 1] (H, W /8)."""

    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array) -> jax.Array:
        fnet = Encoder(256, norm="instance", name="fnet")
        f1 = fnet(image1[None])[0]
        f2 = fnet(image2[None])[0]
        ctx = Encoder(self.hidden * 2, norm="batch", name="cnet")(image1[None])[0]
        net = jnp.tanh(ctx[..., : self.hidden])
        inp = nn.relu(ctx[..., self.hidden :])

        pyr = corr_pyramid(all_pairs_correlation(f1, f2), self.corr_levels)
        H, W = f1.shape[:2]
        update = UpdateBlock(self.hidden, name="update_block")

        # statically unrolled refinement loop (flax modules cannot be called
        # under lax.scan without lifting; `iters` is small and static)
        flow = jnp.zeros((H, W, 2), jnp.float32)
        mask = jnp.zeros((H, W, 576), jnp.float32)
        for _ in range(self.iters):
            corr_feat = lookup_pyramid(pyr, flow, self.corr_radius)
            net2, delta, mask2 = update(net[None], inp[None], corr_feat[None], flow[None])
            net, flow, mask = net2[0], flow + delta[0], mask2[0]
        # upsample the final flow with the final mask
        return convex_upsample(flow, mask)
