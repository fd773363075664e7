"""Fused training forward (models/mit_train.py) vs the flax MiTEVP train
path: logits, BatchNorm running-stat updates, and trainable-subtree
gradients must match (reference semantics: train_evp.py:379-382 frozen
trunk; flax model is the checked oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_train import fused_train_forward
from surgical_tpu.train.backbone import combine_params, partition_params


@pytest.fixture(scope="module")
def setup():
    jax.config.update("jax_default_matmul_precision", "highest")
    cfg = BackboneConfig.preset("tiny")  # drop_path_rate=0 -> deterministic
    head = HeadConfig(embedding_dim=64, hidden=32, dropout=0.0)
    model = MiTEVP(cfg, head, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 4, 64
    img = jnp.asarray(rng.standard_normal((B, S, S, 3)) * 0.5, jnp.float32)
    seg = jnp.asarray(rng.standard_normal((B, S, S, 3)) * 0.5, jnp.float32)
    flw = jnp.asarray(rng.standard_normal((B, S, S, 2)) * 0.5, jnp.float32)
    variables = model.init(jax.random.key(0), img[:1], seg[:1], flw[:1])
    return cfg, head, model, variables, (img, seg, flw)


def test_train_forward_and_batchstats_match_flax(setup):
    cfg, head, model, variables, (img, seg, flw) = setup
    params, bs = variables["params"], variables["batch_stats"]
    key = jax.random.key(7)

    (yf, yaf), upd = model.apply(
        {"params": params, "batch_stats": bs}, img, seg, flw,
        train=True, rngs={"dropout": key}, mutable=["batch_stats"],
    )
    yg, yag, new_bs = fused_train_forward(
        params, bs, img, seg, flw, key, cfg, head,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yf), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yag), np.asarray(yaf), rtol=2e-4, atol=2e-5)

    fb = upd["batch_stats"]
    for modk in ("flow_encoder", "head"):
        for bnk in fb[modk]:
            for stat in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(new_bs[modk][bnk][stat]),
                    np.asarray(fb[modk][bnk][stat]),
                    rtol=1e-5, atol=1e-6, err_msg=f"{modk}/{bnk}/{stat}",
                )


def test_train_gradients_match_flax_on_trainable_subtree(setup):
    cfg, head, model, variables, (img, seg, flw) = setup
    params, bs = variables["params"], variables["batch_stats"]
    key = jax.random.key(7)
    train, frozen, treedef = partition_params(params)

    def loss_flax(train):
        p = combine_params(train, frozen, treedef)
        (y, ya), _ = model.apply(
            {"params": p, "batch_stats": bs}, img, seg, flw,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return jnp.sum(y**2) + jnp.sum(ya**2)

    def loss_fused(train):
        p = combine_params(train, frozen, treedef)
        y, ya, _ = fused_train_forward(
            p, bs, img, seg, flw, key, cfg, head,
            compute_dtype=jnp.float32, interpret=True,
        )
        return jnp.sum(y**2) + jnp.sum(ya**2)

    g1 = jax.grad(loss_flax)(train)
    g2 = jax.grad(loss_fused)(train)
    # normalize by the GLOBAL gradient scale: several trainable biases have
    # structurally-zero true gradients (a bias feeding BatchNorm is removed
    # by the mean subtraction; a key-projection bias is softmax-shift-
    # invariant), so per-leaf relative comparison would amplify fp noise
    gmax = max(float(jnp.abs(a).max()) for a in g1 if a is not None)
    checked = 0
    for a, b in zip(g1, g2):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(b) / gmax, np.asarray(a) / gmax, rtol=5e-3, atol=1e-5)
        checked += 1
    assert checked > 10  # prompts + flow encoder + cross-attn + head all flow


def test_droppath_zeroes_branches(setup):
    """With drop_path forced to 1-eps the trunk's residual branches are
    (almost) always dropped — the fused path must still run and produce
    finite outputs that differ from the no-drop path."""
    cfg, head, model, variables, (img, seg, flw) = setup
    params, bs = variables["params"], variables["batch_stats"]
    import dataclasses

    cfg_dp = dataclasses.replace(cfg, drop_path_rate=0.9)
    y0, _, _ = fused_train_forward(
        params, bs, img, seg, flw, jax.random.key(1), cfg, head,
        compute_dtype=jnp.float32, interpret=True,
    )
    y1, _, _ = fused_train_forward(
        params, bs, img, seg, flw, jax.random.key(1), cfg_dp, head,
        compute_dtype=jnp.float32, interpret=True,
    )
    assert np.isfinite(np.asarray(y1)).all()
    assert float(jnp.abs(y1 - y0).max()) > 1e-6
