"""Prompt input-type / adaptor-mode variants of the EVP generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP, fft_prompt, srm_filter


def tiny(**kw):
    return BackboneConfig(
        variant="tiny", embed_dims=(8, 16, 24, 32), num_heads=(1, 2, 4, 8),
        depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1), qkv_bias=True,
        drop_path_rate=0.0, with_flow=False, img_size=64, **kw,
    )


@pytest.mark.parametrize("input_type", ["srm", "fft", "all", "bimask", "raw"])
def test_input_types_run(rng, input_type):
    model = MiTEVP(tiny(input_type=input_type), HeadConfig(embedding_dim=32, hidden=16))
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    seg = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), img, seg, None)
    y, y_ant = model.apply(variables, img, seg, None)
    assert y.shape == (1, 7) and np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("adaptor", ["fully_shared", "fully_unshared"])
def test_adaptor_modes_run(rng, adaptor):
    model = MiTEVP(tiny(adaptor=adaptor), HeadConfig(embedding_dim=32, hidden=16))
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    seg = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), img, seg, None)
    feat = model.apply(variables, img, seg, None, return_features=True)
    assert feat.shape == (1, 32)


def test_srm_filter_zero_mean():
    """SRM kernels are high-pass: constant input -> ~zero response."""
    x = jnp.ones((1, 16, 16, 3)) * 0.7
    y = np.asarray(srm_filter(x))
    np.testing.assert_allclose(y[:, 4:-4, 4:-4], 0.0, atol=1e-5)


def test_fft_highpass_kills_dc():
    x = jnp.ones((1, 16, 16, 3)) * 3.0
    y = np.asarray(fft_prompt(x, 0.25, "highpass"))
    np.testing.assert_allclose(y, 0.0, atol=1e-4)
    y2 = np.asarray(fft_prompt(x, 0.25, "lowpass"))
    np.testing.assert_allclose(y2, 3.0, atol=1e-4)
