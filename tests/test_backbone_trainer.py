"""Backbone trainer: one epoch on synthetic wire-format data (tiny model)."""

import jax
import numpy as np
import pytest

from surgical_tpu.core.config import BackboneConfig, HeadConfig, OptimConfig, TrainConfig
from surgical_tpu.data.transforms import AugConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.train.backbone import BackboneTrainer, EarlyStop, trainable_mask


def tiny_model():
    cfg = BackboneConfig(
        variant="tiny", embed_dims=(8, 16, 24, 32), num_heads=(1, 2, 4, 8),
        depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1), qkv_bias=True,
        drop_path_rate=0.0,
    )
    return MiTEVP(cfg, HeadConfig(embedding_dim=32, hidden=16))


def make_batches(rng, n_batches=2, B=4, size=64):
    out = []
    for _ in range(n_batches):
        out.append((
            rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8),
            rng.integers(0, 255, (B, size, size, 1), dtype=np.uint8),
            rng.standard_normal((B, size, size, 2)).astype(np.float16),
            rng.integers(0, 7, (B,)).astype(np.int32),
            rng.uniform(0, 1, (B, 7)).astype(np.float32),
        ))
    return out


@pytest.fixture(scope="module")
def trainer_state():
    """NOTE: the train step DONATES its state buffers, so each test gets a
    fresh state via make_state() (reusing one state across tests would hit
    deleted buffers)."""
    trainer = BackboneTrainer(
        tiny_model(),
        TrainConfig(optim=OptimConfig(name="sgd", lr=1e-3)),
        aug_cfg=AugConfig(resize=64, crop=56),
    )
    make_state = lambda: trainer.init(jax.random.key(0), img_size=64)
    return trainer, make_state


def test_epoch_eval_and_freeze_semantics(trainer_state, rng):
    """One epoch trains, evaluates, moves only the unfrozen parameters.

    NOTE: the train step donates its state buffers, so the pre-training
    params are snapshotted to host first (callers must treat train_epoch as
    consuming its state)."""
    trainer, make_state = trainer_state
    state = make_state()
    p_before = jax.tree.map(np.asarray, state[0])

    batches = make_batches(rng)
    state, metrics = trainer.train_epoch(state, batches, jax.random.key(1), epoch=0)
    assert np.isfinite(metrics["train_loss"])
    assert 0 <= metrics["train_acc"] <= 1
    ev = trainer.evaluate(state, make_batches(rng, n_batches=1))
    assert "acc" in ev and "inMAE" in ev

    p_after = state[0]
    # frozen leaf: trunk patch embed must not move (train_evp.py:379-382)
    np.testing.assert_array_equal(
        p_before["patch_embed1"]["proj"]["kernel"],
        np.asarray(p_after["patch_embed1"]["proj"]["kernel"]),
    )
    # trainable leaf: head must move
    assert (
        np.abs(
            p_before["head"]["fc_1"]["kernel"]
            - np.asarray(p_after["head"]["fc_1"]["kernel"])
        ).max()
        > 0
    )


def test_freeze_set(trainer_state):
    """Only head/prompt/flow/cross-attn parameters may move
    (train_evp.py:379-382)."""
    trainer, make_state = trainer_state
    params = make_state()[0]
    mask = trainable_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    trainable = {str(p[0].key) for p, v in flat if v}
    frozen = {str(p[0].key) for p, v in flat if not v}
    assert "head" in trainable and "prompt_generator" in trainable
    assert "flow_encoder" in trainable and "cross_attn_s3" in trainable
    assert any("block" in f for f in frozen)
    assert any("patch_embed" in f for f in frozen)


def test_early_stop():
    es = EarlyStop(target_train_loss=0.0144)
    assert not es.update(1.0)
    assert es.update(0.01)
    assert es.stopped


def test_lr0_ablation_nothing_moves(rng):
    """The selfcheck learned-quality gate's ablation, pinned (cli.py
    cmd_selfcheck_full): with lr=0 a full train epoch moves NO parameter —
    the broken-optimizer case the gate exists to catch sits at its
    init-quality floor rather than silently passing."""
    trainer = BackboneTrainer(
        tiny_model(),
        TrainConfig(optim=OptimConfig(name="sgd", lr=0.0)),
        aug_cfg=AugConfig(resize=64, crop=56),
    )
    state = trainer.init(jax.random.key(0), img_size=64)
    p_before = jax.tree.map(np.asarray, state[0])
    state, metrics = trainer.train_epoch(
        state, make_batches(rng), jax.random.key(1), epoch=0)
    assert np.isfinite(metrics["train_loss"])
    moved = [
        "/".join(str(k.key) for k in path)
        for path, (a, b) in zip(
            (p for p, _ in jax.tree_util.tree_leaves_with_path(p_before)),
            zip(jax.tree_util.tree_leaves(p_before),
                jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state[0]))),
        )
        if np.abs(a - b).max() > 0
    ]
    assert not moved, f"lr=0 epoch moved parameters: {moved[:5]}"


def test_midepoch_validation_logged(trainer_state, rng, tmp_path):
    """Mid-epoch validation fires every `val_every` steps and logs
    (train_evp.py:526-564 semantics)."""
    from surgical_tpu.utils.logging import MetricsLogger

    trainer, make_state = trainer_state
    state = make_state()
    trainer.val_every = 2
    logger = MetricsLogger(str(tmp_path), tensorboard=False)
    batches = make_batches(rng, n_batches=4)
    val_batches = make_batches(rng, n_batches=1)
    state, _ = trainer.train_epoch(
        state, batches, jax.random.key(3), epoch=2,
        val_batches=val_batches, logger=logger,
    )
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    midvals = [l for l in lines if any(k.startswith("midval/") for k in l)]
    assert len(midvals) == 2  # after steps 2 and 4
    assert "midval/acc" in midvals[0]
