"""Loss functions with exact reference semantics.

The temporal stage's loss (reference tecno.py:236-254) is
``mean_over_stages(weighted-CE(phase)) + mean_over_stages(SmoothL1(ant))``
with torch defaults: CrossEntropyLoss(weight=w) normalizes by the SUM OF THE
WEIGHTS of the target classes (not the count), and SmoothL1 uses beta=1.0
with mean reduction. The backbone stage uses sum-reduction CE + SmoothL1
(train_evp.py:390-391). All functions take an optional validity mask so
whole videos can be right-padded to bucket lengths without changing the
loss value (SURVEY §7 "ragged video lengths").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
    mask: jax.Array | None = None,
    reduction: str = "mean",
) -> jax.Array:
    """torch.nn.CrossEntropyLoss semantics.

    logits: [..., C]; labels: integer [...]; mask: bool [...] (True = valid).
    mean reduction divides by sum(w[y_i]) over valid i, matching torch.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[labels]
    else:
        w = jnp.ones_like(nll)
    if mask is not None:
        w = w * mask.astype(w.dtype)
    total = jnp.sum(w * nll)
    if reduction == "sum":
        return total
    return total / jnp.maximum(jnp.sum(w), 1e-12)


def smooth_l1(
    pred: jax.Array,
    target: jax.Array,
    beta: float = 1.0,
    mask: jax.Array | None = None,
    reduction: str = "mean",
) -> jax.Array:
    """torch.nn.SmoothL1Loss semantics (beta=1.0 default)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if mask is not None:
        m = jnp.broadcast_to(mask[..., None], loss.shape).astype(loss.dtype)
        loss = loss * m
        denom = jnp.maximum(jnp.sum(m), 1e-12)
    else:
        denom = loss.size
    total = jnp.sum(loss)
    if reduction == "sum":
        return total
    return total / denom


def temporal_stage_loss(
    stage_outputs: jax.Array,
    labels_phase: jax.Array,
    labels_ant: jax.Array,
    class_weights: jax.Array,
    mask: jax.Array | None = None,
    num_phases: int = 7,
):
    """Joint phase + anticipation loss over all TCN stages
    (reference tecno.py:236-254).

    stage_outputs: [S, B, T, 2*num_phases]; labels_phase: [B, T] int;
    labels_ant: [B, T, num_phases]; mask: [B, T] bool.
    Returns (total, clc_loss, ant_loss) — each stage-averaged.
    """
    y_cls = stage_outputs[..., :num_phases]
    y_ant = stage_outputs[..., num_phases:]
    stages = stage_outputs.shape[0]

    def per_stage(i, acc):
        clc, ant = acc
        clc = clc + weighted_cross_entropy(y_cls[i], labels_phase, class_weights, mask)
        ant = ant + smooth_l1(y_ant[i], labels_ant, mask=mask)
        return clc, ant

    clc_loss, ant_loss = jax.lax.fori_loop(
        0, stages, per_stage, (jnp.float32(0.0), jnp.float32(0.0))
    )
    clc_loss = clc_loss / stages
    ant_loss = ant_loss / stages
    return clc_loss + ant_loss, clc_loss, ant_loss


def refiner_loss(
    outputs: jax.Array,
    labels_phase: jax.Array,
    labels_ant: jax.Array,
    class_weights: jax.Array,
    mask: jax.Array | None = None,
    num_phases: int = 7,
    ce_scale: float = 0.5,
):
    """Refinement-transformer loss: ``0.5*weighted-CE + SmoothL1``
    (reference tecno_trans.py:281-288).

    outputs: [T, 2*num_phases] (or [B, T, 2*num_phases]).
    """
    p_cls = outputs[..., :num_phases]
    p_ant = outputs[..., num_phases:]
    clc = weighted_cross_entropy(p_cls, labels_phase, class_weights, mask)
    ant = smooth_l1(p_ant, labels_ant, mask=mask)
    return ce_scale * clc + ant, clc, ant


def backbone_loss(
    logits: jax.Array,
    ant_pred: jax.Array,
    labels_phase: jax.Array,
    labels_ant: jax.Array,
):
    """Backbone training loss: sum-reduction CE + sum-reduction SmoothL1
    (reference train_evp.py:390-391,509)."""
    ce = weighted_cross_entropy(logits, labels_phase, reduction="sum")
    reg = smooth_l1(ant_pred, labels_ant, reduction="sum")
    return ce + reg, ce, reg
