"""Batch-level augmentation path == vmapped per-clip path (same params)."""

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.data import transforms as T


def test_batch_matches_per_clip(rng):
    cfg = T.AugConfig(resize=64, crop=48, degrees=5)
    B = 4
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    segs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    flow = jnp.asarray(rng.random((B, 64, 64, 2)).astype(np.float32))
    key = jax.random.key(0)

    bi, bs, bf = T.train_preprocess_batch(imgs, segs, flow, key, cfg)

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    for b in range(B):
        ci, cs, cf = T.train_preprocess_clip(
            imgs[b : b + 1], segs[b : b + 1], flow[b : b + 1], keys[b], cfg
        )
        np.testing.assert_allclose(np.asarray(bi[b]), np.asarray(ci[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bs[b]), np.asarray(cs[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bf[b]), np.asarray(cf[0]), atol=1e-5)


def test_batched_rotate_matches_rotate(rng):
    x = jnp.asarray(rng.random((3, 32, 32, 2)).astype(np.float32))
    for a in (-5, 0, 3):
        idx = jnp.full((3,), a + 5, jnp.int32)
        got = np.asarray(T.batched_rotate_nearest(x, idx, 5, rotate_vectors=True))
        exp = np.asarray(T.rotate(x, jnp.asarray(float(a)), rotate_vectors=True))
        np.testing.assert_allclose(got, exp, atol=1e-5)


def test_batch_bf16_matches_f32_geometry(rng):
    """Round-5 bf16 aug stack: geometry (crop/flip/rotate) is pure data
    movement, so a bf16 batch must equal the f32 batch bf16-rounded — and
    color/normalize must stay within a bf16 ulp of the f32 stack."""
    cfg = T.AugConfig(resize=64, crop=48, degrees=5)
    B = 4
    imgs32 = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    segs32 = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    flow32 = jnp.asarray(rng.random((B, 64, 64, 2)).astype(np.float32))
    key = jax.random.key(0)

    fi, fs, ff = T.train_preprocess_batch(imgs32, segs32, flow32, key, cfg)
    bi, bs, bf = T.train_preprocess_batch(
        imgs32.astype(jnp.bfloat16), segs32.astype(jnp.bfloat16),
        flow32.astype(jnp.bfloat16), key, cfg)
    assert bi.dtype == jnp.bfloat16 and bf.dtype == jnp.bfloat16
    # post-normalize values are O(1); 2 bf16 ulps there ~ 0.016 absolute.
    # Images additionally pass through the hue-rotation sextant selector,
    # where a bf16-rounded hue can land one sextant over for isolated
    # pixels — bounded by the jitter range, so gate on the 99.9th pct
    # plus an absolute cap instead of a uniform atol.
    di = np.abs(np.asarray(bi, np.float32) - np.asarray(fi, np.float32))
    assert np.quantile(di, 0.999) < 0.04 and di.max() < 0.5, (
        np.quantile(di, 0.999), di.max())
    np.testing.assert_allclose(np.asarray(bs, np.float32),
                               np.asarray(fs, np.float32), atol=0.04)
    np.testing.assert_allclose(np.asarray(bf, np.float32),
                               np.asarray(ff, np.float32), atol=0.02)
    # the zero-fill corners must be EXACTLY the normalized zero (the rotate's
    # appended zero pixel), not garbage from the clamped tables
    assert np.isfinite(np.asarray(bi, np.float32)).all()


def test_batch_no_flow(rng):
    cfg = T.AugConfig(resize=32, crop=24)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    i, s, f = T.train_preprocess_batch(imgs, imgs, None, jax.random.key(1), cfg)
    assert i.shape == (2, 24, 24, 3) and f is None
