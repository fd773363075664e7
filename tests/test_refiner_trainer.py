"""RefinerTrainer: frozen-temporal training + end-to-end prediction."""

import os

import jax
import numpy as np

from surgical_tpu.core.config import (
    MSTCNConfig,
    OptimConfig,
    RefinerConfig,
    TrainConfig,
)
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.models.transsv import RefinementTransformer
from surgical_tpu.train.refiner import RefinerTrainer, predict_and_write
from surgical_tpu.train.temporal import VideoDataset


def make_ds(rng, f_dim=24, lengths=(50, 64)):
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    N = int(np.sum(lengths))
    labels = np.concatenate(
        [np.repeat(np.arange(7), -(-L // 7))[:L] for L in lengths]
    ).astype(np.int32)
    feats = rng.standard_normal((N, f_dim)).astype(np.float32) * 0.1 + labels[:, None]

    class _F:
        def video(self, i):
            s = int(starts[i])
            return feats[s : s + int(lengths[i])]

    return VideoDataset(
        _F(), labels, rng.uniform(0, 1, (N, 7)).astype(np.float32),
        np.asarray(lengths), starts,
    )


def test_refiner_trains_and_freezes_temporal(rng, tmp_path):
    f_dim = 24
    ds = make_ds(rng, f_dim)
    temporal = MultiStageTCN(MSTCNConfig(stages=1, layers=3, f_maps=8, f_dim=f_dim, dropout=0.0))
    import jax.numpy as jnp

    t_params = temporal.init(jax.random.key(0), jnp.zeros((1, 8, f_dim)))["params"]
    t_snapshot = jax.tree.map(np.asarray, t_params)

    trainer = RefinerTrainer(
        temporal,
        RefinementTransformer(RefinerConfig(f_maps=16, f_dim=f_dim, len_q=8)),
        TrainConfig(bucket_sizes=(64,), optim=OptimConfig(name="adam", lr=5e-3, weight_decay=0.0)),
    )
    params, opt = trainer.init(jax.random.key(1), t_params, f_dim)
    losses = []
    for epoch in range(6):
        params, opt, m = trainer.train_epoch(t_params, params, opt, ds, epoch)
        losses.append(m["train_loss"])
    assert losses[-1] < losses[0], losses

    # the temporal model must not have moved (stop_gradient + no updates)
    for a, b in zip(jax.tree.leaves(t_snapshot), jax.tree.leaves(t_params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    metrics, preds, ants = trainer.evaluate(t_params, params, ds)
    assert set(metrics) >= {"acc_frame", "inMAE", "pMAE", "eMAE"}
    assert len(preds) == 2 and preds[0].shape == (50,)
    assert ants[1].shape == (64, 7)

    # end-to-end predict + artifact writing (trans_SV_output contract)
    out = str(tmp_path / "out")
    m2, _, _ = predict_and_write(trainer, t_params, params, ds, out, [41, 42])
    assert os.path.exists(os.path.join(out, "video41-phase.txt"))
    assert abs(m2["acc_frame"] - metrics["acc_frame"]) < 1e-9
