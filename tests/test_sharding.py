"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from surgical_tpu.parallel import mesh as meshlib


def test_mesh_has_8_devices():
    mesh = meshlib.make_mesh()
    assert mesh.devices.size == 8


def test_batch_sharding_and_allreduce():
    """Params replicated + batch sharded: a jitted loss/grad matches the
    single-device computation (XLA inserts the all-reduce)."""
    mesh = meshlib.make_mesh()
    rng = np.random.default_rng(0)
    W = rng.standard_normal((16, 4)).astype(np.float32)
    x = rng.standard_normal((8 * 4, 16)).astype(np.float32)
    y = rng.standard_normal((8 * 4, 4)).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(jnp.asarray(W), jnp.asarray(x), jnp.asarray(y))

    w_r = meshlib.replicate(mesh, jnp.asarray(W))
    x_s = meshlib.shard_batch(mesh, jnp.asarray(x))
    y_s = meshlib.shard_batch(mesh, jnp.asarray(y))
    g_sharded = jax.jit(jax.grad(loss))(w_r, x_s, y_s)

    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5)


def test_pad_batch_for_mesh():
    batch = (np.ones((5, 3)), np.zeros((5,)))
    padded, mask = meshlib.pad_batch(batch, 8)
    assert padded[0].shape == (8, 3)
    assert mask.sum() == 5 and mask[:5].all()


def test_temporal_trainer_dp_batch():
    """The temporal train step runs with videos sharded across the mesh."""
    from surgical_tpu.core.config import MSTCNConfig, OptimConfig, TrainConfig
    from surgical_tpu.models.mstcn import MultiStageTCN
    from surgical_tpu.train.temporal import TemporalTrainer, VideoDataset

    rng = np.random.default_rng(0)
    n_videos, f_dim, T = 8, 16, 32
    lengths = np.full(n_videos, T)
    starts = np.arange(n_videos) * T
    feats = rng.standard_normal((n_videos * T, f_dim)).astype(np.float32)

    class _F:
        def video(self, i):
            return feats[starts[i] : starts[i] + T]

    ds = VideoDataset(
        _F(),
        rng.integers(0, 7, n_videos * T).astype(np.int32),
        rng.uniform(0, 1, (n_videos * T, 7)).astype(np.float32),
        lengths,
        starts,
    )
    mesh = meshlib.make_mesh()
    trainer = TemporalTrainer(
        MultiStageTCN(MSTCNConfig(stages=1, layers=2, f_maps=8, f_dim=f_dim)),
        TrainConfig(bucket_sizes=(T,)),
        mesh=mesh,
    )
    params, opt = trainer.init(jax.random.key(0), f_dim)
    # one batch = all 8 videos, sharded 1 per device
    params, opt, m = trainer.train_epoch(
        params, opt, ds, jax.random.key(1), 0, batch_size=8
    )
    assert np.isfinite(m["train_loss"])


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
