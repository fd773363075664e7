"""Extraction-loop tests (feature_fn faked — exercises batching/padding/
copy-out logic without a backbone)."""

import numpy as np

from surgical_tpu.train.extract import extract_features, extract_to_store


def fake_feature_fn(img, seg, flow):
    """Deterministic 'features': per-frame mean of the image, tiled."""
    n = img.shape[0]
    m = img.reshape(n, -1).mean(axis=1, keepdims=True)
    return np.tile(m, (1, 4)).astype(np.float32)


def make_batches(total, batch_size, rng):
    pos = 0
    while pos < total:
        n = min(batch_size, total - pos)
        yield (
            rng.random((n, 8, 8, 3)).astype(np.float32),
            rng.random((n, 8, 8, 1)).astype(np.float32),
            rng.random((n, 8, 8, 2)).astype(np.float32),
        )
        pos += n


def test_extract_features_ragged_last_batch(rng):
    total, bs = 23, 8  # 8 + 8 + 7
    feats, stats = extract_features(
        fake_feature_fn, make_batches(total, bs, rng), total, 4, bs
    )
    assert feats.shape == (total, 4)
    assert stats["frames"] == total and stats["fps"] > 0
    # padded rows must NOT leak into the output: every row nonzero & distinct-ish
    assert (np.abs(feats).sum(axis=1) > 0).all()


def test_extract_features_exact_values(rng):
    """Output rows equal the fake features computed directly (no reordering,
    no padding contamination from the overlap-copy-out pipeline)."""
    total, bs = 10, 4
    batches = list(make_batches(total, bs, rng))
    feats, _ = extract_features(fake_feature_fn, iter(batches), total, 4, bs)
    expected = np.concatenate([fake_feature_fn(*b) for b in batches])
    np.testing.assert_allclose(feats, expected, rtol=1e-6)


def test_extract_to_store(tmp_path, rng):
    lengths = [6, 9]
    store, stats = extract_to_store(
        fake_feature_fn, make_batches(15, 4, rng), lengths, 4, 4,
        str(tmp_path / "lfb"), meta={"split": "t"},
    )
    assert store.video(0).shape == (6, 4)
    assert store.video(1).shape == (9, 4)
    assert store.meta["split"] == "t"


def test_extract_total_mismatch_raises(rng):
    import pytest

    with pytest.raises(AssertionError):
        extract_features(fake_feature_fn, make_batches(10, 4, rng), 12, 4, 4)


def fake_chain_fn(img, seg, flow):
    """[S, B, ...] superbatch -> [S, B, 4] fake features."""
    S, B = img.shape[:2]
    m = img.reshape(S, B, -1).mean(axis=2, keepdims=True)
    return np.tile(m, (1, 1, 4)).astype(np.float32)


def test_extract_features_chained_matches_per_batch(rng):
    from surgical_tpu.train.extract import extract_features_chained

    total, bs, depth = 37, 4, 3  # 10 batches: 3 superbatches + ragged tail
    batches = list(make_batches(total, bs, rng))
    want, _ = extract_features(fake_feature_fn, iter(batches), total, 4, bs)
    got, stats = extract_features_chained(
        fake_chain_fn, iter(batches), total, 4, bs, depth=depth
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert stats["dispatch_depth"] == depth


def test_extract_features_chained_exact_multiple(rng):
    from surgical_tpu.train.extract import extract_features_chained

    total, bs, depth = 16, 4, 2  # exactly 2 superbatches, no tail
    batches = list(make_batches(total, bs, rng))
    want = np.concatenate([fake_feature_fn(*b) for b in batches])
    got, _ = extract_features_chained(
        fake_chain_fn, iter(batches), total, 4, bs, depth=depth
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _interp_kernels():
    """Context manager: route the fused Pallas kernels through interpret
    mode (Mosaic doesn't lower on CPU) — same pattern as test_mit_fused."""
    import contextlib

    import surgical_tpu.kernels.mit_block as mb
    import surgical_tpu.models.mit_fused as mf

    @contextlib.contextmanager
    def cm():
        names = ("fused_mit_block", "fused_mit_block_hb", "fused_mit_stage")
        saved = {n: getattr(mb, n) for n in names}

        def wrap(orig):
            def interp(*args, **kw):
                kw["interpret"] = True
                return orig(*args, **kw)
            return interp

        try:
            for n, orig in saved.items():
                setattr(mb, n, wrap(orig))
                setattr(mf, n, wrap(orig))
            yield
        finally:
            for n, orig in saved.items():
                setattr(mb, n, orig)
                setattr(mf, n, orig)

    return cm()


def test_sharded_fused_extraction_multidevice(rng):
    """VERDICT r3 item 6: the fused Pallas graph must shard over a
    multi-device mesh (shard_map per device), not silently downgrade to the
    flax graph. On the 8-device CPU mesh: the shard_map-fused wire-format
    extractor (a) matches the flax wire-format extractor, (b) lands its
    output sharded over all 8 devices, and (c) the chained-dispatch variant
    agrees with the per-dispatch one."""
    import jax
    import jax.numpy as jnp

    from surgical_tpu.core.config import BackboneConfig, HeadConfig
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.parallel import mesh as meshlib
    from surgical_tpu.train.extract import (
        make_raw_feature_chain_fn,
        make_raw_feature_fn,
    )

    cfg = BackboneConfig(
        variant="tiny", embed_dims=(16, 32, 40, 64), num_heads=(1, 2, 4, 8),
        depths=(1, 1, 2, 1), sr_ratios=(8, 4, 2, 1), qkv_bias=True,
        drop_path_rate=0.0, img_size=64,
    )
    head = HeadConfig(embedding_dim=64, hidden=32)
    model = MiTEVP(cfg, head)
    z = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 64, 64, 2)))

    mesh = meshlib.make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    assert n_dev == 8

    B = 16  # 2 images per device
    img = rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8)
    seg = rng.integers(0, 255, (B, 64, 64, 1)).astype(np.uint8)
    flw = rng.standard_normal((B, 64, 64, 2)).astype(np.float16)

    ref_fn = make_raw_feature_fn(model, variables, mesh=mesh, use_fused=False)
    ref = np.asarray(ref_fn(img, seg, flw), np.float32)

    with _interp_kernels():
        fused_fn = make_raw_feature_fn(model, variables, mesh=mesh,
                                       use_fused=True)
        out = fused_fn(img, seg, flw)
        got = np.asarray(out, np.float32)
        # output committed to the full data mesh, one shard per device
        assert len(out.sharding.device_set) == n_dev
        shard_rows = {s.data.shape[0] for s in out.addressable_shards}
        assert shard_rows == {B // n_dev}

        S = 2
        chain_fn = make_raw_feature_chain_fn(model, variables, mesh=mesh,
                                             depth=S, use_fused=True)
        sup = tuple(np.stack([a] * S) for a in (img, seg, flw))
        chained = np.asarray(chain_fn(*sup), np.float32)

    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(got - ref) / denom) < 0.05
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr
    for s in range(S):
        np.testing.assert_allclose(chained[s], got, rtol=2e-2, atol=2e-2)
