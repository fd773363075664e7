"""Optimizer construction + plateau LR control.

Reproduces the reference's temporal-stage recipe (tecno.py:162-177): AdamW
(lr 1e-4, wd 1e-3, betas (0.9, 0.999), eps 1e-8) with grad-clip 1.0 and a
ReduceLROnPlateau(max, factor 0.5, patience 3, min_lr 1e-6) on val accuracy.

The learning rate is injected as a runtime hyperparameter
(``optax.inject_hyperparams``) so the plateau controller can change it
WITHOUT recompiling the jitted train step — the host mutates one scalar in
the optimizer state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import optax

from surgical_tpu.core.config import OptimConfig


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))

    if cfg.name == "adamw":
        make = optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(
                learning_rate,
                b1=cfg.betas[0],
                b2=cfg.betas[1],
                eps=cfg.eps,
                weight_decay=cfg.weight_decay,
            )
        )
    elif cfg.name == "adam":
        make = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(
                learning_rate, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps
            )
        )
    elif cfg.name == "sgd":
        make = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.name}")

    chain.append(make(learning_rate=cfg.lr))
    return optax.chain(*chain)


def get_lr(opt_state) -> float:
    """Read the injected learning rate out of a chained optimizer state."""
    for s in opt_state:
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
    raise ValueError("no injected learning_rate found in optimizer state")


def set_lr(opt_state, lr: float):
    """Return a copy of opt_state with the injected learning rate replaced."""
    new_states = []
    for s in opt_state:
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            s = s._replace(hyperparams=hp)
        new_states.append(s)
    return tuple(new_states)


@dataclass
class PlateauController:
    """Host-side ReduceLROnPlateau (torch semantics, tecno.py:171-177)."""

    mode: str = "max"
    factor: float = 0.5
    patience: int = 3
    min_lr: float = 1e-6
    best: float | None = None
    bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr
