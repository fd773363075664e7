"""Device-fused, clip-synchronized augmentations.

The reference implements augmentation as stateful PIL/torch transforms whose
geometry is synchronized across a clip (and across the img/segmap/flow
triple) by reseeding Python's global RNG with a shared counter
(data_process.py:53-186). Here augmentation is one jittable function over a
whole clip: parameters are drawn ONCE per clip from a counter-based key
(core/rng.clip_key) and applied to every frame and modality, which
reproduces the reference semantics without shared mutable state — and runs
fused on device right before the backbone.

Reference transform stacks (train_evp.py:147-183):
- train: Resize(250) -> RandomCrop(224) -> ColorJitter(0.1,0.1,0.1,0.05) ->
         RandomHorizontalFlip -> RandomRotation(±5°) -> Normalize
- eval:  Resize(250) -> CenterCrop(224) -> Normalize

Flow-specific semantics preserved (data_process.py:113-157): only geometric
ops apply to flow; horizontal flip negates u; rotation rotates the (u, v)
vectors by the rotation matrix; color jitter applies to images only (the
segmap gets geometry + normalize, like the reference's shared Compose minus
PIL-only color ops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import CHOLEC80_MEAN, CHOLEC80_STD


@dataclass(frozen=True)
class AugConfig:
    resize: int = 250
    crop: int = 224
    degrees: float = 5.0
    brightness: float = 0.1
    contrast: float = 0.1
    saturation: float = 0.1
    hue: float = 0.05
    flip_prob: float = 0.5


class AugParams(NamedTuple):
    crop_xy: jax.Array  # [2] int32 (x1, y1)
    flip: jax.Array  # bool
    angle_deg: jax.Array  # float
    brightness: jax.Array
    contrast: jax.Array
    saturation: jax.Array
    hue: jax.Array


def draw_params(key: jax.Array, cfg: AugConfig) -> AugParams:
    """One parameter set per clip (shared by all frames + modalities)."""
    ks = jax.random.split(key, 7)
    span = cfg.resize - cfg.crop
    return AugParams(
        crop_xy=jax.random.randint(ks[0], (2,), 0, span + 1),
        flip=jax.random.uniform(ks[1]) < cfg.flip_prob,
        angle_deg=jax.random.randint(
            ks[2], (), -int(cfg.degrees), int(cfg.degrees) + 1
        ).astype(jnp.float32),
        brightness=jax.random.uniform(
            ks[3], (), minval=1 - cfg.brightness, maxval=1 + cfg.brightness
        ),
        contrast=jax.random.uniform(
            ks[4], (), minval=1 - cfg.contrast, maxval=1 + cfg.contrast
        ),
        saturation=jax.random.uniform(
            ks[5], (), minval=1 - cfg.saturation, maxval=1 + cfg.saturation
        ),
        hue=jax.random.uniform(ks[6], (), minval=-cfg.hue, maxval=cfg.hue),
    )


# -- geometry -----------------------------------------------------------------

def resize_bilinear(x: jax.Array, size: int) -> jax.Array:
    T, H, W, C = x.shape
    return jax.image.resize(x, (T, size, size, C), method="bilinear")


def crop(x: jax.Array, xy: jax.Array, size: int) -> jax.Array:
    """Dynamic (x1, y1) crop of a [T, H, W, C] clip."""
    return jax.lax.dynamic_slice(
        x, (0, xy[1], xy[0], 0), (x.shape[0], size, size, x.shape[3])
    )


def center_crop(x: jax.Array, size: int) -> jax.Array:
    H, W = x.shape[1:3]
    y0, x0 = (H - size) // 2, (W - size) // 2
    return x[:, y0 : y0 + size, x0 : x0 + size, :]


def hflip(x: jax.Array, flip: jax.Array, negate_u: bool = False) -> jax.Array:
    flipped = x[:, :, ::-1, :]
    if negate_u:
        flipped = flipped.at[..., 0].multiply(-1.0)
    return jnp.where(flip, flipped, x)


def rotate(x: jax.Array, angle_deg: jax.Array, rotate_vectors: bool = False) -> jax.Array:
    """Rotate a [T, H, W, C] clip CCW about the image center (nearest
    neighbor, zero fill — torchvision TF.rotate defaults). For flow
    (rotate_vectors), the (u, v) values are rotated by the same matrix."""
    T, H, W, C = x.shape
    rad = angle_deg * (np.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # inverse mapping: output pixel <- input pixel rotated by -angle
    xs = (xx - cx) * cos + (yy - cy) * sin + cx
    ys = -(xx - cx) * sin + (yy - cy) * cos + cy
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    out = x[:, yi, xi, :]
    out = jnp.where(valid[None, :, :, None], out, 0.0)
    if rotate_vectors:
        u, v = out[..., 0], out[..., 1]
        out = jnp.stack([u * cos - v * sin, u * sin + v * cos], axis=-1)
    return out


# -- color (torchvision formulas) ---------------------------------------------

_GRAY = jnp.asarray([0.299, 0.587, 0.114])


def adjust_brightness(img: jax.Array, f: jax.Array) -> jax.Array:
    return jnp.clip(img * f, 0.0, 1.0)


def adjust_contrast(img: jax.Array, f: jax.Array) -> jax.Array:
    mean = jnp.mean(img @ _GRAY, axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip(f * img + (1 - f) * mean, 0.0, 1.0)


def adjust_saturation(img: jax.Array, f: jax.Array) -> jax.Array:
    gray = (img @ _GRAY)[..., None]
    return jnp.clip(f * img + (1 - f) * gray, 0.0, 1.0)


def adjust_hue(img: jax.Array, shift: jax.Array) -> jax.Array:
    """Hue rotation in HSV space, shift in turns (torchvision semantics)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-12), 0.0)
    dn = jnp.maximum(d, 1e-12)
    rc = (maxc - r) / dn
    gc = (maxc - g) / dn
    bc = (maxc - b) / dn
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(d == 0, 0.0, h)
    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g2 = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b2 = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


def color_jitter(img: jax.Array, p: AugParams) -> jax.Array:
    img = adjust_brightness(img, p.brightness)
    img = adjust_contrast(img, p.contrast)
    img = adjust_saturation(img, p.saturation)
    return adjust_hue(img, p.hue)


def normalize(img: jax.Array) -> jax.Array:
    # computed in f32 (fused by XLA), written back at the input dtype so a
    # bf16 aug stack stays bf16 end-to-end (half the HBM traffic)
    mean = jnp.asarray(CHOLEC80_MEAN)
    std = jnp.asarray(CHOLEC80_STD)
    return ((img.astype(jnp.float32) - mean) / std).astype(img.dtype)


# -- full stacks ----------------------------------------------------------------

def _rotation_tables(size: int, degrees: int):
    """Static nearest-neighbor rotation index tables for every integer angle
    in [-degrees, degrees]: [A, size*size] int32. Out-of-frame destinations
    point at index ``size*size`` — the rotate appends ONE zero pixel there,
    so the gather itself zero-fills and no validity-mask pass is needed
    (bit-exact vs the old mask; kills one elementwise pass per angle)."""
    yy, xx = np.meshgrid(
        np.arange(size, dtype=np.float32), np.arange(size, dtype=np.float32),
        indexing="ij",
    )
    c = (size - 1) / 2.0
    tables = []
    for a in range(-degrees, degrees + 1):
        r = np.deg2rad(a)
        xs = np.round((xx - c) * np.cos(r) + (yy - c) * np.sin(r) + c).astype(np.int32)
        ys = np.round(-(xx - c) * np.sin(r) + (yy - c) * np.cos(r) + c).astype(np.int32)
        v = (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
        flat = np.clip(ys, 0, size - 1) * size + np.clip(xs, 0, size - 1)
        tables.append(np.where(v, flat, size * size).reshape(-1))
    return np.stack(tables)


def _rotate_flow_vectors(f: jax.Array, angle_idx: jax.Array, degrees: int):
    """Rotate the (u, v) flow VALUES by the per-image angle (the spatial
    permutation is done by the shared table gather)."""
    B, S = f.shape[0], f.shape[1]
    rad = (angle_idx.astype(jnp.float32) - degrees) * (np.pi / 180.0)
    cos = jnp.cos(rad)[:, None]
    sin = jnp.sin(rad)[:, None]
    u, vv = f.reshape(B, S * S, 2)[..., 0], f.reshape(B, S * S, 2)[..., 1]
    out = jnp.stack([u * cos - vv * sin, u * sin + vv * cos], -1)
    return out.astype(f.dtype).reshape(f.shape)


def batched_rotate_nearest(
    x: jax.Array,  # [B, S, S, C]
    angle_idx: jax.Array,  # [B] int32 in [0, 2*degrees]
    degrees: int,
    rotate_vectors: bool = False,
) -> jax.Array:
    """Per-image integer-angle rotation via precomputed index tables, as
    2*degrees+1 STATIC-index takes + a per-angle select. A single batched
    take_along_axis with per-image tables still pays the computed-index
    gather path (~43 ms for [88, 224, 224, 3] on v5e); static-index takes
    ride the copy path, so rotating the batch once per angle and selecting
    measures 9.6 ms for the same shape — and bit-identical output. The
    zero-fill rides the gather via the appended zero pixel (see
    _rotation_tables)."""
    B, S = x.shape[0], x.shape[1]
    tables = _rotation_tables(S, degrees)
    xf = x.reshape(B, S * S, -1)
    xf = jnp.concatenate([xf, jnp.zeros((B, 1, xf.shape[-1]), x.dtype)], axis=1)
    out = jnp.zeros((B, S * S, xf.shape[-1]), x.dtype)
    for a in range(2 * degrees + 1):
        ra = jnp.take(xf, jnp.asarray(tables[a]), axis=1)
        out = jnp.where((angle_idx == a)[:, None, None], ra, out)
    out = out.reshape(x.shape)
    if rotate_vectors:
        out = _rotate_flow_vectors(out, angle_idx, degrees)
    return out


def train_preprocess_batch(
    images: jax.Array,  # [B, H, W, 3] float in [0, 1] (seq_len=1 clips)
    segmaps: jax.Array,
    flow: jax.Array | None,
    key: jax.Array,
    cfg: AugConfig = AugConfig(),
):
    """Batch-level train stack for seq_len=1 clips (the stage-1 config):
    per-image parameters, with the rotation done by table gather. Identical
    semantics to vmapping `train_preprocess_clip` over the batch (geometry
    ops are pure data movement, exact at any dtype; color arithmetic runs
    in f32 and is written back at the INPUT dtype — feed bf16 to halve the
    aug stack's HBM traffic at <=1 bf16 ulp of the f32 stack, which the
    model's bf16 patch-embed conv quantizes to anyway)."""
    B = images.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    params = jax.vmap(lambda k: draw_params(k, cfg))(keys)

    def geom_color(img, seg, f, p):
        img1 = img[None]
        seg1 = seg[None]
        if img1.shape[1] != cfg.resize:
            img1 = resize_bilinear(img1, cfg.resize)
        if seg1.shape[1] != cfg.resize:
            seg1 = resize_bilinear(seg1, cfg.resize)
        img1 = crop(img1, p.crop_xy, cfg.crop)
        seg1 = crop(seg1, p.crop_xy, cfg.crop)
        img1 = color_jitter(img1, p).astype(img.dtype)
        img1 = hflip(img1, p.flip)
        seg1 = hflip(seg1, p.flip)
        if f is not None:
            f1 = crop(f[None], p.crop_xy, cfg.crop)
            f1 = hflip(f1, p.flip, negate_u=True)
            return img1[0], seg1[0], f1[0]
        return img1[0], seg1[0], None

    if flow is None:
        images, segmaps = jax.vmap(
            lambda i, s, p: geom_color(i, s, None, p)[:2]
        )(images, segmaps, params)
        fl = None
    else:
        images, segmaps, fl = jax.vmap(geom_color)(images, segmaps, flow, params)

    deg = int(cfg.degrees)
    angle_idx = (params.angle_deg.astype(jnp.int32) + deg).astype(jnp.int32)
    # ONE table gather for all modalities: img/seg(/flow) concatenated on
    # channels share the same per-image spatial permutation, so the
    # 2*degrees+1 takes read 8 channels once instead of 3 tensors separately
    parts = [images, segmaps] + ([] if fl is None else [fl.astype(images.dtype)])
    widths = [p.shape[-1] for p in parts]
    rotated = batched_rotate_nearest(
        jnp.concatenate(parts, axis=-1), angle_idx, deg)
    images = rotated[..., : widths[0]]
    segmaps = rotated[..., widths[0] : widths[0] + widths[1]]
    if fl is not None:
        fl = _rotate_flow_vectors(
            rotated[..., widths[0] + widths[1] :].astype(fl.dtype),
            angle_idx, deg)
    return normalize(images), normalize(segmaps), fl


def train_preprocess_clip(
    images: jax.Array,  # [T, H, W, 3] float in [0, 1]
    segmaps: jax.Array,  # [T, H, W, 3]
    flow: jax.Array | None,  # [T, H, W, 2] or None
    key: jax.Array,
    cfg: AugConfig = AugConfig(),
):
    """The reference train stack, one fused graph per clip."""
    p = draw_params(key, cfg)
    if images.shape[1] != cfg.resize:
        images = resize_bilinear(images, cfg.resize)
    if segmaps.shape[1] != cfg.resize:
        segmaps = resize_bilinear(segmaps, cfg.resize)
    images = crop(images, p.crop_xy, cfg.crop)
    segmaps = crop(segmaps, p.crop_xy, cfg.crop)
    images = color_jitter(images, p)
    images = hflip(images, p.flip)
    segmaps = hflip(segmaps, p.flip)
    images = rotate(images, p.angle_deg)
    segmaps = rotate(segmaps, p.angle_deg)
    images = normalize(images)
    segmaps = normalize(segmaps)
    if flow is not None:
        # flow arrives already resized to `resize` with displacement rescale
        # (data_process.py:433-444); apply only geometry (:464-485)
        flow = crop(flow, p.crop_xy, cfg.crop)
        flow = hflip(flow, p.flip, negate_u=True)
        flow = rotate(flow, p.angle_deg, rotate_vectors=True)
    return images, segmaps, flow


def eval_preprocess_clip(
    images: jax.Array,
    segmaps: jax.Array,
    flow: jax.Array | None,
    cfg: AugConfig = AugConfig(),
):
    """Resize -> CenterCrop -> Normalize (train_evp.py:173-177)."""
    if images.shape[1] != cfg.resize:
        images = resize_bilinear(images, cfg.resize)
    if segmaps.shape[1] != cfg.resize:
        segmaps = resize_bilinear(segmaps, cfg.resize)
    images = normalize(center_crop(images, cfg.crop))
    segmaps = normalize(center_crop(segmaps, cfg.crop))
    if flow is not None:
        flow = center_crop(flow, cfg.crop)
    return images, segmaps, flow


def resize_flow(flow: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Resize flow to out_hw with displacement rescale
    (data_process.py:433-444). Host-side numpy (runs in the loader)."""
    import jax.image as jimg

    H, W = flow.shape[:2]
    oh, ow = out_hw
    resized = np.asarray(
        jimg.resize(jnp.asarray(flow), (oh, ow, 2), method="bilinear")
    )
    resized[..., 0] *= ow / W
    resized[..., 1] *= oh / H
    return resized
