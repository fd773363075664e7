"""Selective-scan kernel numerics + Mamba model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import MambaConfig
from surgical_tpu.kernels.selective_scan import (
    selective_scan_pallas,
    selective_scan_ref,
    selective_scan_xla,
)
from surgical_tpu.models.mamba import CausalMambaModel


def make_inputs(rng, T=100, D=16, N=8):
    x = rng.standard_normal((T, D)).astype(np.float32)
    dt = np.abs(rng.standard_normal((T, D))).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((D, N))).astype(np.float32)
    B = rng.standard_normal((T, N)).astype(np.float32)
    C = rng.standard_normal((T, N)).astype(np.float32)
    Dp = rng.standard_normal((D,)).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, dt, A, B, C, Dp))


def naive_loop(x, dt, A, B, C, D):
    """Direct per-step recurrence in float64 (independent oracle)."""
    x, dt, A, B, C, D = (np.asarray(v, dtype=np.float64) for v in (x, dt, A, B, C, D))
    T, d = x.shape
    N = A.shape[1]
    h = np.zeros((d, N))
    ys = np.zeros((T, d))
    for t in range(T):
        a = np.exp(dt[t][:, None] * A)
        h = a * h + (dt[t] * x[t])[:, None] * B[t][None, :]
        ys[t] = h @ C[t] + D * x[t]
    return ys


def test_ref_matches_naive(rng):
    args = make_inputs(rng)
    ours = np.asarray(selective_scan_ref(*args))
    oracle = naive_loop(*args)
    # fp32 recurrence vs float64 oracle: absolute tolerance dominates
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-3)


def test_xla_matches_ref(rng):
    args = make_inputs(rng, T=257)
    a = np.asarray(selective_scan_ref(*args))
    b = np.asarray(selective_scan_xla(*args))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T", [64, 100, 300])
def test_pallas_interpret_matches_ref(rng, T):
    """Pallas kernel in interpreter mode (CPU) vs the sequential oracle,
    including non-multiple-of-chunk lengths."""
    args = make_inputs(rng, T=T, D=16, N=8)
    a = np.asarray(selective_scan_ref(*args))
    b = np.asarray(selective_scan_pallas(*args, chunk=64, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_mamba_model_shapes_and_causality(rng):
    cfg = MambaConfig(layers=2, d_model=16, f_dim=32, d_state=8)
    model = CausalMambaModel(cfg, backend="xla")
    T = 50
    x = rng.standard_normal((1, T, cfg.f_dim)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    y = np.asarray(model.apply(params, jnp.asarray(x)))
    assert y.shape == (1, 1, T, cfg.out_features)

    # causality: perturbing the future leaves the past unchanged
    x2 = x.copy()
    x2[0, 30:] += 3.0
    y2 = np.asarray(model.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(y[:, :, :30], y2[:, :, :30], rtol=1e-4, atol=1e-5)
    assert np.abs(y[:, :, 30:] - y2[:, :, 30:]).max() > 1e-4


def test_mamba_trains(rng):
    """One gradient step decreases a simple loss (scan is differentiable)."""
    cfg = MambaConfig(layers=1, d_model=8, f_dim=16, d_state=4, dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    x = jnp.asarray(rng.standard_normal((1, 40, cfg.f_dim)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((1, 40, cfg.out_features)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    def loss(p):
        return jnp.mean((model.apply(p, x)[0] - tgt) ** 2)

    l0, g = jax.value_and_grad(loss)(params)
    p1 = jax.tree.map(lambda a, b: a - 0.05 * b, params, g)
    l1 = loss(p1)
    assert float(l1) < float(l0)
