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
