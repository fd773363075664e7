"""Loss parity tests vs torch (the reference's loss contract)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from surgical_tpu.core.config import CHOLEC80_CLASS_WEIGHTS
from surgical_tpu.train.losses import (
    refiner_loss,
    smooth_l1,
    temporal_stage_loss,
    weighted_cross_entropy,
)


def test_weighted_ce_matches_torch(rng):
    T, C = 97, 7
    logits = rng.standard_normal((T, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(T,))
    w = np.asarray(CHOLEC80_CLASS_WEIGHTS, dtype=np.float32)

    ours = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)
    )
    theirs = tnn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_unweighted_ce_sum_matches_torch(rng):
    T, C = 31, 7
    logits = rng.standard_normal((T, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(T,))
    ours = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), reduction="sum"
    )
    theirs = tnn.CrossEntropyLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_smooth_l1_matches_torch(rng):
    pred = rng.standard_normal((50, 7)).astype(np.float32) * 2
    tgt = rng.standard_normal((50, 7)).astype(np.float32)
    ours = smooth_l1(jnp.asarray(pred), jnp.asarray(tgt))
    theirs = tnn.SmoothL1Loss()(torch.from_numpy(pred), torch.from_numpy(tgt))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_masked_ce_equals_truncated(rng):
    """Right-padding + mask must reproduce the unpadded loss exactly."""
    T, pad_T, C = 40, 64, 7
    logits = rng.standard_normal((pad_T, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(pad_T,))
    w = jnp.asarray(CHOLEC80_CLASS_WEIGHTS, dtype=jnp.float32)
    mask = np.zeros((pad_T,), dtype=bool)
    mask[:T] = True

    masked = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), w, jnp.asarray(mask)
    )
    truncated = weighted_cross_entropy(
        jnp.asarray(logits[:T]), jnp.asarray(labels[:T]), w
    )
    np.testing.assert_allclose(float(masked), float(truncated), rtol=1e-6)


def test_temporal_stage_loss_matches_reference_recipe(rng):
    """Stage-averaged weighted-CE + SmoothL1 exactly as tecno.py:236-254."""
    S, B, T, P = 2, 1, 60, 7
    out = rng.standard_normal((S, B, T, 2 * P)).astype(np.float32)
    labels = rng.integers(0, P, size=(B, T))
    ant = rng.uniform(0, 1, size=(B, T, P)).astype(np.float32)
    w = np.asarray(CHOLEC80_CLASS_WEIGHTS, dtype=np.float32)

    total, clc, antl = temporal_stage_loss(
        jnp.asarray(out), jnp.asarray(labels), jnp.asarray(ant), jnp.asarray(w)
    )

    ce = tnn.CrossEntropyLoss(weight=torch.from_numpy(w))
    sl1 = tnn.SmoothL1Loss()
    t_out = torch.from_numpy(out)
    exp_clc = sum(
        float(ce(t_out[s, 0, :, :P], torch.from_numpy(labels[0]))) for s in range(S)
    ) / S
    exp_ant = sum(
        float(sl1(t_out[s, 0, :, P:], torch.from_numpy(ant[0]))) for s in range(S)
    ) / S
    np.testing.assert_allclose(float(clc), exp_clc, rtol=1e-5)
    np.testing.assert_allclose(float(antl), exp_ant, rtol=1e-5)
    np.testing.assert_allclose(float(total), exp_clc + exp_ant, rtol=1e-5)


def test_refiner_loss_scaling(rng):
    T, P = 30, 7
    out = rng.standard_normal((T, 2 * P)).astype(np.float32)
    labels = rng.integers(0, P, size=(T,))
    ant = rng.uniform(0, 1, size=(T, P)).astype(np.float32)
    w = np.asarray(CHOLEC80_CLASS_WEIGHTS, dtype=np.float32)
    total, clc, antl = refiner_loss(
        jnp.asarray(out), jnp.asarray(labels), jnp.asarray(ant), jnp.asarray(w)
    )
    np.testing.assert_allclose(float(total), 0.5 * float(clc) + float(antl), rtol=1e-6)
