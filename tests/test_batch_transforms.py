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


def test_batch_no_flow(rng):
    cfg = T.AugConfig(resize=32, crop=24)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    i, s, f = T.train_preprocess_batch(imgs, imgs, None, jax.random.key(1), cfg)
    assert i.shape == (2, 24, 24, 3) and f is None
