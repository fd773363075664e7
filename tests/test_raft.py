"""RAFT model + flow precompute driver tests (tiny shapes, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.flow.precompute import (
    FlowPrecomputeDriver,
    load_flow_or_zero,
    pad_to_multiple_hw,
)
from surgical_tpu.models.raft import (
    RAFT,
    all_pairs_correlation,
    bilinear_sample,
    convex_upsample,
    corr_pyramid,
    lookup_pyramid,
)


def test_correlation_matches_naive(rng):
    H, W, C = 4, 5, 8
    f1 = rng.standard_normal((H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((H, W, C)).astype(np.float32)
    corr = np.asarray(all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    for i in range(H * W):
        y, x = divmod(i, W)
        expected = (f1[y, x] @ f2.reshape(-1, C).T).reshape(H, W) / np.sqrt(C)
        np.testing.assert_allclose(corr[i], expected, rtol=1e-5, atol=1e-5)


def test_pyramid_shapes(rng):
    corr = jnp.asarray(rng.standard_normal((12, 8, 8)).astype(np.float32))
    pyr = corr_pyramid(corr, levels=3)
    assert [p.shape for p in pyr] == [(12, 8, 8), (12, 4, 4), (12, 2, 2)]


def test_bilinear_sample_identity(rng):
    img = jnp.asarray(rng.standard_normal((6, 7)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(6, dtype=np.float32), np.arange(7, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xx, yy], axis=-1))
    out = np.asarray(bilinear_sample(img, coords))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-6)
    # out-of-bounds -> 0
    far = jnp.asarray(np.full((3, 2), 100.0, np.float32))
    np.testing.assert_allclose(np.asarray(bilinear_sample(img, far)), 0.0)


def test_lookup_pyramid_shape(rng):
    H = W = 8
    corr = jnp.asarray(rng.standard_normal((H * W, H, W)).astype(np.float32))
    pyr = corr_pyramid(corr, levels=2)
    flow = jnp.zeros((H, W, 2))
    feats = lookup_pyramid(pyr, flow, radius=2)
    assert feats.shape == (H, W, 2 * 25)


def test_lookup_pyramid_dense_matches_gather(rng):
    """The round-5 tent-weight matmul lookup == the 4-corner bilinear
    zero-padded gather (the semantics oracle), including fractional flows,
    window offsets that leave the frame, and non-square grids."""
    from surgical_tpu.models.raft import lookup_pyramid_gather

    H, W = 12, 16
    corr = jnp.asarray(rng.standard_normal((H * W, H, W)).astype(np.float32))
    pyr = corr_pyramid(corr, levels=3)
    for scale in (0.0, 0.5, 3.7, 30.0):
        flow = jnp.asarray(
            (rng.standard_normal((H, W, 2)) * scale).astype(np.float32))
        dense = np.asarray(lookup_pyramid(pyr, flow))
        oracle = np.asarray(lookup_pyramid_gather(pyr, flow))
        np.testing.assert_allclose(dense, oracle, rtol=1e-5, atol=1e-5)


def test_convex_upsample_constant():
    flow = jnp.ones((4, 4, 2))
    mask = jnp.zeros((4, 4, 576))  # uniform convex weights after softmax
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (32, 32, 2)
    # interior: mean of a constant 3x3 neighborhood = 8x unit flow
    np.testing.assert_allclose(up[8:-8, 8:-8], 8.0, rtol=1e-5)
    # corners average with zero padding: 4/9 of the mass
    np.testing.assert_allclose(up[0, 0], 8.0 * 4 / 9, rtol=1e-5)


def test_raft_forward_tiny(rng):
    model = RAFT(iters=2, corr_levels=2)
    img1 = jnp.asarray(rng.standard_normal((32, 32, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img1, img2)
    flow = model.apply(params, img1, img2)
    assert flow.shape == (32, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_precompute_driver_resumable(tmp_path, rng):
    frames = {n: rng.standard_normal((15, 17, 3)).astype(np.float32) for n in (0, 25, 50, 75)}
    calls = []

    def fake_flow(f1, f2):
        calls.append(1)
        assert f1.shape[0] % 8 == 0 and f1.shape[1] % 8 == 0  # padded
        return np.zeros((f1.shape[0], f1.shape[1], 2), np.float32)

    drv = FlowPrecomputeDriver(fake_flow, str(tmp_path / "flow"),
                               log_path=str(tmp_path / "log.txt"))
    drv.run_video(7, sorted(frames), frames.__getitem__)
    # 3 pairs (75 has no successor)
    assert drv.stats["done"] == 3 and len(calls) == 3
    out = np.load(drv.out_path(7, 0))
    assert out.shape == (15, 17, 2)  # cropped back to original size

    # resume: everything skipped, flow_fn not called again
    drv2 = FlowPrecomputeDriver(fake_flow, str(tmp_path / "flow"))
    drv2.run_video(7, sorted(frames), frames.__getitem__)
    assert drv2.stats["skipped"] == 3 and len(calls) == 3


def test_flow_fallback(tmp_path):
    z = load_flow_or_zero(str(tmp_path / "missing.npy"), (5, 6))
    assert z.shape == (5, 6, 2) and (z == 0).all()


def test_pad_to_multiple():
    img = np.ones((15, 17, 3), np.float32)
    padded, (H, W) = pad_to_multiple_hw(img, 8)
    assert padded.shape == (16, 24, 3) and (H, W) == (15, 17)
