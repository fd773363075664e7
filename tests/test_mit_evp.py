"""Shape/behavior tests for the MiT-EVP backbone + SegFormer pooled head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP, gaussian_blur_5x5
from surgical_tpu.models.segformer_head import SegFormerPoolHead


def tiny_cfg(**kw):
    """A b0-ish config small enough for CPU tests."""
    return BackboneConfig(
        variant="tiny",
        embed_dims=(16, 32, 40, 64),
        num_heads=(1, 2, 4, 8),
        depths=(1, 1, 2, 1),
        sr_ratios=(8, 4, 2, 1),
        qkv_bias=True,
        drop_path_rate=0.1,
        **kw,
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    head = HeadConfig(embedding_dim=64, hidden=32)
    model = MiTEVP(cfg, head)
    B = 2
    img = jnp.zeros((B, 224, 224, 3))
    seg = jnp.zeros((B, 224, 224, 3))
    flow = jnp.zeros((B, 224, 224, 2))
    variables = model.init(jax.random.key(0), img, seg, flow)
    return model, variables


def test_dual_head_output(model_and_params, rng):
    model, variables = model_and_params
    B = 2
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    seg = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    flow = jnp.asarray(rng.standard_normal((B, 224, 224, 2)).astype(np.float32))
    y, y_ant = model.apply(variables, img, seg, flow)
    assert y.shape == (B, 7) and y_ant.shape == (B, 7)
    assert np.isfinite(np.asarray(y)).all()


def test_return_features_contract(model_and_params, rng):
    """return_features=True yields the pooled embedding (the LFB feature,
    reference segformer_head.py:171-173)."""
    model, variables = model_and_params
    img = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    seg = jnp.zeros((1, 224, 224, 3))
    feat = model.apply(variables, img, seg, None, return_features=True)
    assert feat.shape == (1, 64)  # head embedding_dim in the tiny config


def test_flow_changes_output(model_and_params, rng):
    """Flow fusion must affect predictions (cross-attention is live)."""
    model, variables = model_and_params
    img = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    seg = jnp.zeros((1, 224, 224, 3))
    f0 = jnp.zeros((1, 224, 224, 2))
    f1 = jnp.asarray(rng.standard_normal((1, 224, 224, 2)).astype(np.float32) * 5)
    y0 = model.apply(variables, img, seg, f0, return_features=True)
    y1 = model.apply(variables, img, seg, f1, return_features=True)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-6


def test_segmap_prompt_changes_output(model_and_params, rng):
    """The bimask prompt path must be live in every stage."""
    model, variables = model_and_params
    img = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    s0 = jnp.zeros((1, 224, 224, 3))
    s1 = jnp.ones((1, 224, 224, 3))
    y0 = model.apply(variables, img, s0, None, return_features=True)
    y1 = model.apply(variables, img, s1, None, return_features=True)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-6


def test_attention_capture(rng):
    """sow-based attention capture (replaces the bytecode tracer)."""
    cfg = tiny_cfg()
    head = HeadConfig(embedding_dim=64, hidden=32)
    model = MiTEVP(cfg, head, capture_attn=True)
    img = jnp.zeros((1, 224, 224, 3))
    seg = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.key(0), img, seg, None)
    (_, _), inter = model.apply(
        variables, img, seg, None, mutable=["intermediates"]
    )
    attns = jax.tree.leaves(inter["intermediates"])
    assert len(attns) == sum(cfg.depths)
    # stage-1 attention: 3136 queries, 3136/64 kv after sr=8 reduction
    assert attns[0].shape[-2:] == (3136, 49)


def test_gaussian_blur_preserves_constant():
    x = jnp.ones((1, 16, 16, 3)) * 3.0
    y = gaussian_blur_5x5(x)
    np.testing.assert_allclose(np.asarray(y), 3.0, rtol=1e-5)


def test_head_shapes(rng):
    head = SegFormerPoolHead(HeadConfig(embedding_dim=64, hidden=32))
    feats = [
        jnp.asarray(rng.standard_normal((2, 56, 56, 16)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 28, 28, 32)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 14, 14, 40)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 7, 7, 64)).astype(np.float32)),
    ]
    variables = head.init(jax.random.key(0), feats)
    y, y_ant = head.apply(variables, feats)
    assert y.shape == (2, 7) and y_ant.shape == (2, 7)
    feat = head.apply(variables, feats, return_features=True)
    assert feat.shape == (2, 64)
