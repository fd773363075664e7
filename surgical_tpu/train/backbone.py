"""Backbone (spatial-stage) training — the train_evp.py / finetune_evp.py
equivalent, as one pjit'd step.

Reference recipe (train_evp.py): loss = sum-reduction CE + sum-reduction
SmoothL1 (:390-391,509); all parameters FROZEN except the head, prompt
generator, flow encoder and the two cross-attention fusions (:379-382);
fp16 autocast + GradScaler. TPU-native: bf16 compute (no loss scaler
needed), fp32 params/optimizer state, frozen params masked out of the
optimizer with optax.multi_transform, batch sharded over the ``data`` mesh
with gradients all-reduced by XLA over ICI.

The finetune stage (finetune_evp.py) is the same step on the 40-video split
with early stopping on a target train loss (:594-616) — provided here as the
``EarlyStop`` helper.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from surgical_tpu.parallel import mesh as meshlib
from surgical_tpu.train.losses import smooth_l1, weighted_cross_entropy

# Parameter-path substrings that stay trainable (train_evp.py:379-382).
TRAINABLE_KEYS = ("head", "prompt_generator", "flow_encoder", "cross_attn_s3", "cross_attn_s4")


def trainable_mask(params: Any) -> Any:
    """True for leaves under a trainable top-level module."""

    def mark(path, _):
        names = [str(getattr(p, "key", p)) for p in path]
        return any(any(k in n for k in TRAINABLE_KEYS) for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def build_frozen_optimizer(tx: optax.GradientTransformation, params: Any):
    """Wrap an optimizer so frozen parameters receive zero updates."""
    mask = trainable_mask(params)
    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


@dataclass
class EarlyStop:
    """Stop when train loss drops below a target (finetune_evp.py:594-616)."""

    target_train_loss: float = 0.0144
    stopped: bool = False

    def update(self, train_loss: float) -> bool:
        if train_loss < self.target_train_loss:
            self.stopped = True
        return self.stopped


def make_backbone_train_step(
    model,
    tx: optax.GradientTransformation,
) -> Callable:
    """Returns jitted step(params, batch_stats, opt_state, batch, rng) ->
    (params, batch_stats, opt_state, metrics).

    batch = (images [B,H,W,3], segmaps [B,H,W,3], flow [B,H,W,2] | None,
             labels_phase [B], labels_ant [B,7]).
    """

    def step(params, batch_stats, opt_state, images, segmaps, flow, labels, ant, rng):
        def loss_fn(p):
            (y, y_ant), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                segmaps,
                flow,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            y = y.astype(jnp.float32)
            y_ant = y_ant.astype(jnp.float32)
            ce = weighted_cross_entropy(y, labels, reduction="sum")
            reg = smooth_l1(y_ant, ant, reduction="sum")
            preds = jnp.argmax(y, axis=-1)
            correct = jnp.sum(preds == labels)
            return ce + reg, (ce, reg, correct, updates["batch_stats"])

        (loss, (ce, reg, correct, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "ce": ce, "reg": reg, "correct": correct}
        return params, new_bs, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_backbone_eval_step(model) -> Callable:
    def step(params, batch_stats, images, segmaps, flow):
        y, y_ant = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            segmaps,
            flow,
            train=False,
        )
        return y.astype(jnp.float32), y_ant.astype(jnp.float32)

    return jax.jit(step)
