"""Full train-state persistence: params + BN running stats + optimizer state
survive a checkpoint round-trip, and restored extraction features are
bit-identical to in-process ones.

Guards the silent-divergence class of bug where BatchNorm running statistics
are not part of the saved state: the reference extracts features under
model.eval() with TRAINED stats (generate_evp_LFB.py:412-437), so a restore
that re-initializes batch_stats (mean=0/var=1) silently changes every
extracted feature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.checkpoint import CheckpointStore
from surgical_tpu.core.config import BackboneConfig, HeadConfig, OptimConfig, TrainConfig
from surgical_tpu.data.transforms import AugConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.train.backbone import BackboneTrainer


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
def trained(tmp_path_factory):
    """Train 2 tiny epochs, checkpoint the FULL state, snapshot to host."""
    rng = np.random.default_rng(7)
    trainer = BackboneTrainer(
        tiny_model(),
        TrainConfig(optim=OptimConfig(name="sgd", lr=1e-2)),
        aug_cfg=AugConfig(resize=64, crop=56),
    )
    state = trainer.init(jax.random.key(0), img_size=64)
    fresh_bs = jax.tree.map(np.asarray, state[1])
    for epoch in range(2):
        state, _ = trainer.train_epoch(
            state, make_batches(rng, n_batches=2), jax.random.key(1), epoch
        )
    params, batch_stats, opt_state = (jax.tree.map(np.asarray, t) for t in state)
    store = CheckpointStore(str(tmp_path_factory.mktemp("ckpt")))
    store.save(1, {"params": params, "batch_stats": batch_stats},
               metrics={"val_acc": 0.5}, aux={"opt_state": opt_state})
    return trainer, store, params, batch_stats, opt_state, fresh_bs


def test_batch_stats_actually_move(trained):
    """Meaningfulness guard: training must have changed some BN stats, or the
    round-trip test below proves nothing."""
    *_, batch_stats, _opt, fresh_bs = trained
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), batch_stats, fresh_bs
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_restore_roundtrip_bitexact(trained):
    trainer, store, params, batch_stats, opt_state, _ = trained
    template = trainer.init(jax.random.key(123), img_size=64)  # different values
    restored = store.restore(
        1, {"params": template[0], "batch_stats": template[1]}
    )
    aux = store.restore_aux(1, {"opt_state": template[2]})
    for want, got in (
        (params, restored["params"]),
        (batch_stats, restored["batch_stats"]),
        (opt_state, aux["opt_state"]),
    ):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            want, got,
        )


def test_restored_extraction_features_bitexact(trained, rng):
    """extract path: features from the restored state == in-process state,
    and != features from a fresh-init batch_stats overlay (the round-1 bug)."""
    from surgical_tpu.train.extract import make_raw_feature_fn

    trainer, store, params, batch_stats, _opt, fresh_bs = trained
    # batch must divide the 8-device test mesh (extraction shards over it)
    img = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (8, 64, 64, 1), dtype=np.uint8)
    flow = rng.standard_normal((8, 64, 64, 2)).astype(np.float16)

    template = trainer.init(jax.random.key(123), img_size=64)
    restored = store.restore(1, {"params": template[0], "batch_stats": template[1]})

    fn_live = make_raw_feature_fn(
        trainer.model, {"params": params, "batch_stats": batch_stats})
    fn_restored = make_raw_feature_fn(trainer.model, restored)
    fn_buggy = make_raw_feature_fn(
        trainer.model, {"params": params, "batch_stats": fresh_bs})

    live = np.asarray(fn_live(img, seg, flow))
    np.testing.assert_array_equal(live, np.asarray(fn_restored(img, seg, flow)))
    assert np.abs(live - np.asarray(fn_buggy(img, seg, flow))).max() > 0


def test_manifest_extra_and_has_aux(trained):
    _, store, *_ = trained
    store.save(2, {"x": np.zeros(2)}, extra={"plateau": {"best": 0.7, "bad_epochs": 1}})
    m = store.manifest(2)
    assert m["extra"]["plateau"] == {"best": 0.7, "bad_epochs": 1}
    assert m["has_aux"] is False
    assert store.manifest(1)["has_aux"] is True
    assert store.has_aux(1) and not store.has_aux(2)
