"""Sequence-parallel temporal inference (parallel/sequence.py): time-sharded
MS-TCN over the 8-device mesh must equal the single-device computation
exactly (the causal left context is bounded, and device 0's ppermute zero
fill coincides with the causal zero padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import MSTCNConfig
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.parallel import mesh as meshlib
from surgical_tpu.parallel.sequence import (
    mstcn_left_context,
    sequence_parallel_infer,
    sp_mstcn_infer,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force an 8-device CPU mesh"
    return meshlib.make_mesh(8)


def test_left_context_formula():
    # L=8: 2*(2^8-1)=510 per stage (reference mstcn.py receptive field)
    assert mstcn_left_context(1, 8) == 510
    assert mstcn_left_context(2, 8) == 1020


def test_sp_mstcn_matches_single_device(mesh8):
    cfg = MSTCNConfig(stages=2, layers=5, f_maps=16, f_dim=64)
    model = MultiStageTCN(cfg)
    T = 1024  # T/n = 128 < halo = 2*2*(2^5-1) = 124 -> single-hop edge
    rng = np.random.default_rng(0)
    lfb = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), lfb[None])

    want = model.apply(params, lfb[None])[:, 0]  # [S, T, out]
    got = sp_mstcn_infer(model, params, lfb, mesh8)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sp_multihop_halo(mesh8):
    """halo > T/n forces multi-hop ppermute accumulation."""
    cfg = MSTCNConfig(stages=2, layers=6, f_maps=8, f_dim=32)
    model = MultiStageTCN(cfg)
    halo = mstcn_left_context(cfg.stages, cfg.layers)  # 504
    T = 512  # T/n = 64 << halo -> 8 hops
    rng = np.random.default_rng(1)
    lfb = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), lfb[None])

    want = model.apply(params, lfb[None])[:, 0]
    got = sp_mstcn_infer(model, params, lfb, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert halo > T // 8


def test_sp_generic_pytree_inputs(mesh8):
    """The generic helper carries a PYTREE of time-sharded inputs (the
    refinement transformer consumes (logits, features))."""
    T, D = 256, 16
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    halo = 5

    def causal_fn(inp):
        x, y = inp
        s = x + 2.0 * y
        # bounded causal op: mean over the last `halo+1` frames
        w = jnp.stack([jnp.pad(s, ((k, 0), (0, 0)))[: s.shape[0]]
                       for k in range(halo + 1)])
        return jnp.mean(w, axis=0)[None]  # [1, T_ext, D]

    want = causal_fn((a, b))
    got = sequence_parallel_infer(causal_fn, (a, b), mesh8, halo,
                                  time_axis=-2, out_prefix_rank=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_sp_mamba_matches_single_device(mesh8):
    """Time-sharded Mamba: inter-device state handoff must reproduce the
    single-device recurrence (closes the sequence.py Mamba exclusion)."""
    from surgical_tpu.core.config import MambaConfig
    from surgical_tpu.models.mamba import CausalMambaModel
    from surgical_tpu.parallel.sequence import sp_mamba_infer

    cfg = MambaConfig(layers=2, d_model=16, f_dim=24, d_state=8, d_conv=4,
                      dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    T = 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(2), x[None])

    want = model.apply(params, x[None])[0, 0]  # [T, out]
    got = sp_mamba_infer(model, params, x, mesh8)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sp_mamba_long_decay_state(mesh8):
    """A long chunk (large cumulative dt decay) must not overflow/underflow
    the closed-form chunk-transition exponentials."""
    from surgical_tpu.core.config import MambaConfig
    from surgical_tpu.models.mamba import CausalMambaModel
    from surgical_tpu.parallel.sequence import sp_mamba_infer

    cfg = MambaConfig(layers=1, d_model=8, f_dim=8, d_state=4, d_conv=2,
                      dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    T = 1024  # Tl = 128 per device
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((T, cfg.f_dim)) * 2).astype(np.float32))
    params = model.init(jax.random.key(4), x[None])
    want = model.apply(params, x[None])[0, 0]
    got = sp_mamba_infer(model, params, x, mesh8)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
