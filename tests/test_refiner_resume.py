"""Refiner-stage full-state persistence (round-3 parity with the hardened
backbone/temporal stages): params + Adam moments survive a checkpoint
round-trip bit-exactly, and a resumed run continues the ORIGINAL schedule —
one more epoch after restore equals one more epoch in-process.

Reference analogue: tecno_trans.py:627-634 (params-only .pth per epoch,
resume by editing path constants).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.checkpoint import CheckpointStore
from surgical_tpu.core.config import (
    MSTCNConfig,
    OptimConfig,
    RefinerConfig,
    TrainConfig,
)
from surgical_tpu.data.feature_store import FeatureStore
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.models.transsv import RefinementTransformer
from surgical_tpu.train.refiner import RefinerTrainer
from surgical_tpu.train.temporal import VideoDataset

F_DIM = 16


def make_ds(tmp_path):
    rng = np.random.default_rng(0)
    lengths = [40, 50]
    N = sum(lengths)
    labels = np.concatenate(
        [np.repeat(np.arange(7), -(-L // 7))[:L] for L in lengths]
    ).astype(np.int32)
    feats = rng.standard_normal((N, F_DIM)).astype(np.float32)
    ant = rng.uniform(0, 1, (N, 7)).astype(np.float32)
    store = FeatureStore.create(str(tmp_path / "lfb"), feats, lengths)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return VideoDataset(store, labels, ant, np.asarray(lengths), starts)


def make_trainer():
    temporal = MultiStageTCN(MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=F_DIM))
    refiner = RefinementTransformer(RefinerConfig(f_maps=8, f_dim=F_DIM, len_q=6))
    cfg = TrainConfig(bucket_sizes=(64,),
                      optim=OptimConfig(name="adam", lr=5e-3, weight_decay=0.0))
    return RefinerTrainer(temporal, refiner, cfg)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    td = tmp_path_factory.mktemp("refiner_resume")
    ds = make_ds(td)
    trainer = make_trainer()
    t_params = trainer.temporal.init(
        jax.random.key(0), jnp.zeros((1, 8, F_DIM)))["params"]
    params, opt = trainer.init(jax.random.key(1), t_params, F_DIM)

    store = CheckpointStore(str(td / "ckpt"))
    for epoch in range(2):
        params, opt, _ = trainer.train_epoch(t_params, params, opt, ds, epoch)
        # snapshot to host BEFORE save: donate_argnums invalidates devices bufs
        params = jax.tree.map(np.asarray, params)
        opt = jax.tree.map(np.asarray, opt)
        store.save(epoch, params, metrics={"val_acc": 0.0},
                   aux={"opt_state": opt})
    # continue in-process for one more epoch (the ground truth for resume)
    cont_params, cont_opt, _ = trainer.train_epoch(t_params, params, opt, ds, 2)
    return td, ds, t_params, params, opt, store, \
        jax.tree.map(np.asarray, cont_params)


def test_refiner_roundtrip_bitexact(run):
    _, _, t_params, params, opt, store, _ = run
    trainer = make_trainer()
    fresh_p, fresh_opt = trainer.init(jax.random.key(9), t_params, F_DIM)
    got_p = store.restore(1, fresh_p)
    got_opt = store.restore_aux(1, {"opt_state": fresh_opt})["opt_state"]
    for a, b in zip(jax.tree.leaves(got_p), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(got_opt), jax.tree.leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refiner_resume_continues_schedule(run):
    td, ds, t_params, _, _, store, cont_params = run
    trainer = make_trainer()
    fresh_p, fresh_opt = trainer.init(jax.random.key(9), t_params, F_DIM)
    params = store.restore(1, fresh_p)
    opt = store.restore_aux(1, {"opt_state": fresh_opt})["opt_state"]
    resumed_params, _, _ = trainer.train_epoch(t_params, params, opt, ds, 2)
    for a, b in zip(jax.tree.leaves(resumed_params), jax.tree.leaves(cont_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
