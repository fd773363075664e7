"""End-to-end temporal-slice test on synthetic LFB-shaped data (CPU).

This exercises config, model, loss, optimizer, bucketing/masking, metric
aggregation, plateau control, and checkpointing — the reference tecno.py
path with no image dependencies (SURVEY §7 minimum slice)."""

import numpy as np
import jax
import pytest

from surgical_tpu.core.checkpoint import CheckpointStore
from surgical_tpu.core.config import MSTCNConfig, OptimConfig, TrainConfig
from surgical_tpu.data.feature_store import FeatureStore
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.train.optim import PlateauController, build_optimizer, get_lr, set_lr
from surgical_tpu.train.temporal import TemporalTrainer, VideoDataset


def synthetic_dataset(rng, num_videos=4, f_dim=32, num_phases=7, tmax=90):
    lengths = rng.integers(40, tmax, size=num_videos)
    n = int(lengths.sum())
    labels = np.zeros((n,), dtype=np.int32)
    feats = np.zeros((n, f_dim), dtype=np.float32)
    ant = rng.uniform(0, 1, size=(n, num_phases)).astype(np.float32)
    pos = 0
    for L in lengths:
        # phases appear in order, feature mean encodes the phase
        phase_seq = np.repeat(np.arange(num_phases), -(-L // num_phases))[:L]
        labels[pos : pos + L] = phase_seq
        feats[pos : pos + L] = (
            rng.standard_normal((L, f_dim)) * 0.1
            + phase_seq[:, None].astype(np.float32)
        )
        pos += L
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])

    class _Feats:
        def video(self, i):
            s = int(starts[i])
            return feats[s : s + int(lengths[i])]

    return VideoDataset(
        features=_Feats(),
        labels_phase=labels,
        labels_ant=ant,
        lengths=np.asarray(lengths),
        starts=starts,
    )


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    ds = synthetic_dataset(rng)
    cfg = TrainConfig(
        bucket_sizes=(128,),
        optim=OptimConfig(lr=1e-2),
    )
    model = MultiStageTCN(
        MSTCNConfig(stages=2, layers=4, f_maps=16, f_dim=32, dropout=0.1)
    )
    trainer = TemporalTrainer(model, cfg)
    params, opt_state = trainer.init(jax.random.key(0), f_dim=32)
    losses = []
    key = jax.random.key(1)
    for epoch in range(50):
        params, opt_state, m = trainer.train_epoch(
            params, opt_state, ds, key, epoch, batch_size=2
        )
        losses.append(m["train_loss"])
    return trainer, params, opt_state, ds, losses


def test_loss_decreases(trained):
    _, _, _, _, losses = trained
    assert losses[-1] < losses[0] * 0.7, losses


def test_eval_metrics(trained):
    trainer, params, _, ds, _ = trained
    metrics, preds = trainer.evaluate(params, ds)
    assert metrics["acc_frame"] > 0.6
    assert len(preds) == ds.num_videos
    assert all(len(p) == L for p, L in zip(preds, ds.lengths))
    for k in ("inMAE", "pMAE", "eMAE", "precision_macro", "jaccard_macro"):
        assert k in metrics


def test_plateau_controller():
    pc = PlateauController(mode="max", factor=0.5, patience=2, min_lr=1e-6)
    lr = 1e-3
    assert pc.step(0.5, lr) == lr  # first sets best
    assert pc.step(0.4, lr) == lr  # bad 1
    assert pc.step(0.4, lr) == lr  # bad 2 == patience
    assert pc.step(0.4, lr) == lr * 0.5  # bad 3 > patience -> reduce


def test_lr_injection(trained):
    trainer, _, opt_state, _, _ = trained
    lr0 = get_lr(opt_state)
    new_state = set_lr(opt_state, lr0 * 0.5)
    assert get_lr(new_state) == pytest.approx(lr0 * 0.5)


def test_checkpoint_roundtrip(trained, tmp_path):
    trainer, params, _, ds, _ = trained
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save(0, params, metrics={"val_acc": 0.5})
    store.save(1, params, metrics={"val_acc": 0.9})
    store.save(2, params, metrics={"val_acc": 0.7})
    assert store.best_step("val_acc") == 1
    assert store.latest_step() == 2
    restored = store.restore(1, params)
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_feature_store_roundtrip(tmp_path, rng):
    feats = rng.standard_normal((100, 16)).astype(np.float32)
    lengths = [30, 70]
    fs = FeatureStore.create(str(tmp_path / "lfb"), feats, lengths)
    np.testing.assert_array_equal(fs.video(1), feats[30:])
    fs2 = FeatureStore.open(str(tmp_path / "lfb"))
    np.testing.assert_array_equal(fs2.video(0), feats[:30])
    # reference-pickle interop
    fs2.to_reference_pickle(str(tmp_path / "evp_LFB_test.pkl"))
    fs3 = FeatureStore.from_reference_pickle(
        str(tmp_path / "evp_LFB_test.pkl"), lengths, str(tmp_path / "lfb2")
    )
    np.testing.assert_array_equal(fs3.video(1), feats[30:])
