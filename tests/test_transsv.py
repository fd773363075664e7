"""Tests for the refinement transformer + window construction."""

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import RefinerConfig
from surgical_tpu.models.transsv import RefinementTransformer, causal_windows


def test_causal_windows_match_loop(rng):
    T, C, L = 47, 14, 30
    x = rng.standard_normal((T, C)).astype(np.float32)
    got = np.asarray(causal_windows(jnp.asarray(x), L))
    # reference semantics: zero-left-pad then slice (adapter_transformer.py:336-343)
    for t in range(T):
        if t < L - 1:
            exp = np.concatenate([np.zeros((L - 1 - t, C), np.float32), x[: t + 1]])
        else:
            exp = x[t - L + 1 : t + 1]
        np.testing.assert_array_equal(got[t], exp)


def test_refiner_shapes_and_finite(rng):
    cfg = RefinerConfig(f_maps=32, f_dim=128)
    model = RefinementTransformer(cfg)
    T = 65
    g = jnp.asarray(rng.standard_normal((T, cfg.out_features)).astype(np.float32))
    lfb = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), g, lfb)
    out = model.apply(params, g, lfb)
    assert out.shape == (T, cfg.out_features)
    assert np.isfinite(np.asarray(out)).all()


def test_refiner_is_causal(rng):
    """Frame t's refined output may only depend on temporal logits in
    [t-len_q+1, t] and the LFB feature at t."""
    cfg = RefinerConfig(f_maps=16, f_dim=32, len_q=8)
    model = RefinementTransformer(cfg)
    T = 40
    g = rng.standard_normal((T, cfg.out_features)).astype(np.float32)
    lfb = rng.standard_normal((T, cfg.f_dim)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(g), jnp.asarray(lfb))
    y0 = np.asarray(model.apply(params, jnp.asarray(g), jnp.asarray(lfb)))

    t = 20
    g2 = g.copy()
    g2[t + 1 :] += 5.0  # future temporal logits
    lfb2 = lfb.copy()
    lfb2[t + 1 :] += 5.0
    y1 = np.asarray(model.apply(params, jnp.asarray(g2), jnp.asarray(lfb2)))
    np.testing.assert_allclose(y0[: t + 1], y1[: t + 1], rtol=1e-5, atol=1e-5)

    # and window truncation: logits older than len_q do not affect frame t
    g3 = g.copy()
    g3[: t - cfg.len_q + 1] += 5.0
    y2 = np.asarray(
        model.apply(params, jnp.asarray(g3), jnp.asarray(lfb))
    )
    np.testing.assert_allclose(y0[t], y2[t], rtol=1e-5, atol=1e-5)


def test_refiner_jits(rng):
    cfg = RefinerConfig(f_maps=16, f_dim=32)
    model = RefinementTransformer(cfg)
    T = 33
    g = jnp.zeros((T, cfg.out_features))
    lfb = jnp.zeros((T, cfg.f_dim))
    params = model.init(jax.random.key(0), g, lfb)
    fn = jax.jit(model.apply)
    out = fn(params, g, lfb)
    assert out.shape == (T, cfg.out_features)
