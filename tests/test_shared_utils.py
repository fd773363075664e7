"""Guards for the shared measurement/serving utilities added in round 3."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest


def test_wire_dequant_matches_manual():
    """train/extract.wire_dequant is THE wire-format normalization (shared
    by extraction AND the serving export) — pin its contract against the
    manual Cholec80 normalization."""
    from surgical_tpu.core.config import CHOLEC80_MEAN, CHOLEC80_STD
    from surgical_tpu.train.extract import wire_dequant

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (2, 8, 8, 1), dtype=np.uint8)

    dq = wire_dequant()
    got_img, got_seg = dq(jnp.asarray(img), jnp.asarray(seg))
    assert got_img.dtype == jnp.bfloat16 and got_seg.shape == got_img.shape

    mean = np.asarray(CHOLEC80_MEAN, np.float32) * 255.0
    std = np.asarray(CHOLEC80_STD, np.float32) * 255.0
    want_img = (img.astype(np.float32) - mean) / std
    want_seg = np.broadcast_to((seg.astype(np.float32) - mean) / std,
                               want_img.shape)
    # bf16 wire: ~2-3 decimal digits
    np.testing.assert_allclose(np.asarray(got_img, np.float32), want_img,
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_seg, np.float32), want_seg,
                               rtol=2e-2, atol=2e-2)


def test_chain_time_rejects_noise_negative_slope(monkeypatch):
    """scripts/_timing.chain_time must RAISE on a non-positive two-point
    slope instead of clamping — a clamped slope once published a
    137,000-TFLOP 'ceiling' and near-zero roofline floors."""
    import scripts._timing as t

    totals = {8: 0.050, 40: 0.049}  # hi faster than lo: pure noise
    monkeypatch.setattr(t, "total_chained",
                        lambda fn, x0, iters, rounds=4: totals[iters])
    with pytest.raises(RuntimeError, match="non-positive"):
        t.chain_time(lambda x: x, None, 8, 40)

    totals = {8: 0.050, 40: 0.082}  # healthy slope: 1 ms/iter
    assert abs(t.chain_time(lambda x: x, None, 8, 40) - 1e-3) < 1e-9


def test_causal_windows_window_longer_than_sequence():
    """len_q > T: every window is fully zero-left-padded — the shape the
    OnlineRefiner buffer replays at stream start."""
    from surgical_tpu.models.transsv import causal_windows

    x = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)  # T=3
    w = np.asarray(causal_windows(x, 5))  # len_q=5 > T
    assert w.shape == (3, 5, 2)
    # frame 0's window: 4 zero rows then x[0]
    np.testing.assert_array_equal(w[0, :4], 0.0)
    np.testing.assert_array_equal(w[0, 4], np.asarray(x[0]))
    # frame 2's window: 2 zero rows then x[0..2]
    np.testing.assert_array_equal(w[2, :2], 0.0)
    np.testing.assert_array_equal(w[2, 2:], np.asarray(x))
