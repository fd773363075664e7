"""Streaming (online) temporal inference — exact parity with the offline
forward on the same parameters (serving/online.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.core.config import MambaConfig, MSTCNConfig
from surgical_tpu.models.mamba import CausalMambaModel
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.serving.online import OnlineMamba, OnlineMSTCN


@pytest.fixture(autouse=True)
def _full_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


def test_online_mstcn_matches_offline():
    cfg = MSTCNConfig(stages=2, layers=5, f_maps=16, f_dim=32)
    model = MultiStageTCN(cfg)
    T = 96
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(1), feats[None])

    want = model.apply(params, feats[None])[:, 0]  # [S, T, out]
    online = OnlineMSTCN(model, params)
    got = online.run(feats)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_online_mstcn_step_equals_run():
    """Per-frame step() (the serving path) must reproduce run() (the scan)."""
    cfg = MSTCNConfig(stages=1, layers=3, f_maps=8, f_dim=12)
    model = MultiStageTCN(cfg)
    T = 20
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(3), feats[None])

    online = OnlineMSTCN(model, params)
    ref = online.run(feats)
    state = online.init_state()
    outs = []
    for t in range(T):
        state, logits = online.step(state, feats[t])
        outs.append(np.asarray(logits))
    got = np.stack(outs, axis=1)  # [S, T, out]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_online_mstcn_state_is_constant_size():
    """The streaming state must not grow with the number of frames."""
    cfg = MSTCNConfig(stages=2, layers=4, f_maps=8, f_dim=12)
    model = MultiStageTCN(cfg)
    feats = jnp.zeros((1, cfg.f_dim), jnp.float32)
    params = model.init(jax.random.key(0), feats[None])
    online = OnlineMSTCN(model, params)
    state = online.init_state()
    sizes0 = [b.shape for bufs in state for b in bufs]
    for t in range(10):
        state, _ = online.step(state, feats[0])
    assert [b.shape for bufs in state for b in bufs] == sizes0
    # buffer for layer i is exactly 2 * 2^i rows
    assert state[0][0].shape[0] == 2 and state[0][3].shape[0] == 16


def test_online_mamba_matches_offline():
    cfg = MambaConfig(layers=2, d_model=16, f_dim=24, d_state=8, d_conv=4,
                      dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    T = 64
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(5), feats[None])

    want = model.apply(params, feats[None])[0, 0]  # [T, out]
    online = OnlineMamba(model, params)
    got = online.run(feats)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_online_mamba_step_equals_run():
    cfg = MambaConfig(layers=1, d_model=8, f_dim=8, d_state=4, d_conv=3,
                      dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    T = 16
    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(7), feats[None])

    online = OnlineMamba(model, params)
    ref = online.run(feats)
    state = online.init_state()
    outs = []
    for t in range(T):
        state, logits = online.step(state, feats[t])
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(outs), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_online_prefix_consistency():
    """Causality in streaming form: logits at frame t must not change when
    more frames arrive later (the online prediction is final)."""
    cfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=12)
    model = MultiStageTCN(cfg)
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.standard_normal((40, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(9), feats[None])
    online = OnlineMSTCN(model, params)
    full = np.asarray(online.run(feats))
    half = np.asarray(online.run(feats[:20]))
    np.testing.assert_allclose(half, full[:, :20], rtol=1e-6, atol=1e-6)


def test_online_session_end_to_end():
    """Frame-in / phase-out: the OnlineSession chains the frozen backbone's
    features into the streaming temporal step and matches the offline
    pipeline (extract features, run whole-video temporal) frame by frame."""
    import numpy as np

    from surgical_tpu.core.config import BackboneConfig, HeadConfig
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.serving.online import OnlineSession

    bcfg = BackboneConfig.preset("tiny")
    head = HeadConfig(embedding_dim=16, hidden=8)
    backbone = MiTEVP(bcfg, head)
    S = 64
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = backbone.init(jax.random.key(0), z, z,
                              jnp.zeros((1, S, S, 2), jnp.float32))

    tcfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=16)
    tmodel = MultiStageTCN(tcfg)
    tparams = tmodel.init(jax.random.key(1), jnp.zeros((1, 4, 16)))
    temporal = OnlineMSTCN(tmodel, tparams)

    session = OnlineSession(backbone, variables, temporal)
    rng = np.random.default_rng(3)
    T = 4
    imgs = rng.integers(0, 255, (T, S, S, 3), dtype=np.uint8)
    segs = rng.integers(0, 255, (T, S, S, 1), dtype=np.uint8)
    flows = rng.standard_normal((T, S, S, 2)).astype(np.float16)

    online_logits = np.stack([
        session.step(imgs[t], segs[t], flows[t]) for t in range(T)
    ])
    assert session.frame_idx == T
    assert online_logits.shape == (T, tcfg.out_features)

    # offline: extract all features, run the whole sequence at once
    from surgical_tpu.parallel.mesh import make_mesh
    from surgical_tpu.train.extract import make_raw_feature_fn

    # default d2h_dtype (f16 wire): the same rounding OnlineSession's
    # feature leg applies, so parity is exact on production dtypes
    feat_fn = make_raw_feature_fn(backbone, variables, mesh=make_mesh(1))
    feats = feat_fn(imgs, segs, flows)
    offline = tmodel.apply(tparams, np.asarray(feats, np.float32)[None])[-1, 0]
    np.testing.assert_allclose(online_logits, np.asarray(offline),
                               rtol=1e-4, atol=1e-4)

    session.reset()
    assert session.frame_idx == 0


def test_online_refiner_matches_offline():
    """The refinement transformer is strictly causal (frame t = its own LFB
    feature + the last len_q temporal logits), so the streaming form must be
    exact with zero added latency."""
    from surgical_tpu.core.config import RefinerConfig
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.serving.online import OnlineRefiner

    cfg = RefinerConfig(f_maps=16, f_dim=24, len_q=6)
    model = RefinementTransformer(cfg)
    T = 25
    rng = np.random.default_rng(10)
    g = jnp.asarray(rng.standard_normal((T, cfg.out_features)).astype(np.float32))
    lfb = jnp.asarray(rng.standard_normal((T, cfg.f_dim)).astype(np.float32))
    params = model.init(jax.random.key(11), g, lfb)

    want = model.apply(params, g, lfb)  # [T, out]
    online = OnlineRefiner(model, params)
    got = online.run(g, lfb)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # per-frame step() matches run()
    state = online.init_state()
    for t in range(8):
        state, refined = online.step(state, g[t], lfb[t])
        np.testing.assert_allclose(np.asarray(refined), np.asarray(got[t]),
                                   rtol=1e-6, atol=1e-6)


def test_online_session_with_refiner():
    """Full reference pipeline streaming: backbone -> MS-TCN -> refiner,
    frame by frame, equal to the offline composition."""
    import numpy as np

    from surgical_tpu.core.config import BackboneConfig, HeadConfig, RefinerConfig
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.serving.online import OnlineRefiner, OnlineSession

    bcfg = BackboneConfig.preset("tiny")
    head = HeadConfig(embedding_dim=16, hidden=8)
    backbone = MiTEVP(bcfg, head)
    S = 64
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = backbone.init(jax.random.key(0), z, z,
                              jnp.zeros((1, S, S, 2), jnp.float32))

    tcfg = MSTCNConfig(stages=2, layers=2, f_maps=8, f_dim=16)
    tmodel = MultiStageTCN(tcfg)
    tparams = tmodel.init(jax.random.key(1), jnp.zeros((1, 4, 16)))

    rcfg = RefinerConfig(f_maps=8, f_dim=16, len_q=4)
    rmodel = RefinementTransformer(rcfg)
    rparams = rmodel.init(jax.random.key(2), jnp.zeros((4, rcfg.out_features)),
                          jnp.zeros((4, rcfg.f_dim)))

    session = OnlineSession(backbone, variables, OnlineMSTCN(tmodel, tparams),
                            refiner=OnlineRefiner(rmodel, rparams))
    rng = np.random.default_rng(12)
    T = 5
    imgs = rng.integers(0, 255, (T, S, S, 3), dtype=np.uint8)
    segs = rng.integers(0, 255, (T, S, S, 1), dtype=np.uint8)
    flows = rng.standard_normal((T, S, S, 2)).astype(np.float16)

    online_out = np.stack([
        session.step(imgs[t], segs[t], flows[t]) for t in range(T)
    ])

    # offline composition
    from surgical_tpu.parallel.mesh import make_mesh
    from surgical_tpu.train.extract import make_raw_feature_fn

    # default d2h_dtype (f16 wire): the same rounding OnlineSession's
    # feature leg applies, so parity is exact on production dtypes
    feat_fn = make_raw_feature_fn(backbone, variables, mesh=make_mesh(1))
    feats = np.asarray(feat_fn(imgs, segs, flows), np.float32)
    g = tmodel.apply(tparams, feats[None])[-1, 0]          # [T, out]
    offline = rmodel.apply(rparams, g, jnp.asarray(feats))  # [T, out]
    np.testing.assert_allclose(online_out, np.asarray(offline),
                               rtol=1e-4, atol=1e-4)


def test_predict_fn_online_equals_offline(tmp_path):
    """cli predict --online: the streaming predict_fn injected into
    RefinerTrainer.evaluate must reproduce the offline jitted composition
    (same logits, same metrics) over a multi-video dataset."""
    from surgical_tpu.core.config import RefinerConfig, TrainConfig
    from surgical_tpu.data.feature_store import FeatureStore
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.serving.online import OnlineRefiner
    from surgical_tpu.train.refiner import RefinerTrainer
    from surgical_tpu.train.temporal import VideoDataset

    rng = np.random.default_rng(20)
    f_dim, lengths = 16, [37, 24]
    feats = rng.standard_normal((sum(lengths), f_dim)).astype(np.float32)
    store = FeatureStore.create(str(tmp_path / "lfb"), feats, lengths)
    labels = rng.integers(0, 7, sum(lengths)).astype(np.int32)
    ant = rng.uniform(0, 1, (sum(lengths), 7)).astype(np.float32)
    ds = VideoDataset(features=store, labels_phase=labels, labels_ant=ant,
                      lengths=np.asarray(lengths),
                      starts=np.asarray([0, lengths[0]]))

    tcfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=f_dim)
    temporal = MultiStageTCN(tcfg)
    tparams = temporal.init(jax.random.key(0), jnp.zeros((1, 8, f_dim)))["params"]
    rcfg = RefinerConfig(f_maps=8, f_dim=f_dim, len_q=5)
    trainer = RefinerTrainer(temporal, RefinementTransformer(rcfg), TrainConfig())
    rparams, _ = trainer.init(jax.random.key(1), tparams, f_dim)

    off_metrics, off_preds, _ = trainer.evaluate(tparams, rparams, ds)

    from surgical_tpu.serving.online import run_pipeline

    t_on = OnlineMSTCN(temporal, tparams)
    r_on = OnlineRefiner(RefinementTransformer(rcfg), rparams)

    def predict_fn(fp):
        return run_pipeline(t_on, r_on, jnp.asarray(fp, jnp.float32))

    on_metrics, on_preds, _ = trainer.evaluate(tparams, rparams, ds,
                                               predict_fn=predict_fn)
    # compare LOGITS tolerantly (the two compilations reduce in different
    # orders; bit-equal argmax would be flaky near ties on other backends)
    for i in range(ds.num_videos):
        f, l, _ = ds.video_arrays(i)
        from surgical_tpu.data.feature_store import bucket_length, pad_video
        fp, _m = pad_video(f, bucket_length(len(l), trainer.cfg.bucket_sizes))
        off = np.asarray(trainer._predict(tparams, rparams, fp))[: len(l)]
        on = np.asarray(predict_fn(fp))[: len(l)]
        np.testing.assert_allclose(on, off, rtol=1e-4, atol=1e-4)
    assert abs(off_metrics["acc_frame"] - on_metrics["acc_frame"]) < 0.05


def test_run_pipeline_mamba():
    """run_pipeline handles the Mamba run shape ([T, out], no stage axis)
    identically to composing by hand — the cli --online path for --model
    mamba."""
    from surgical_tpu.core.config import RefinerConfig
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.serving.online import OnlineRefiner, run_pipeline

    mcfg = MambaConfig(layers=1, d_model=8, f_dim=12, d_state=4, d_conv=3,
                       dropout=0.0)
    mmodel = CausalMambaModel(mcfg, backend="xla")
    T = 20
    rng = np.random.default_rng(30)
    feats = jnp.asarray(rng.standard_normal((T, mcfg.f_dim)).astype(np.float32))
    mparams = mmodel.init(jax.random.key(0), feats[None])

    rcfg = RefinerConfig(f_maps=8, f_dim=mcfg.f_dim, len_q=4)
    rmodel = RefinementTransformer(rcfg)
    rparams = rmodel.init(jax.random.key(1),
                          jnp.zeros((4, rcfg.out_features)),
                          jnp.zeros((4, rcfg.f_dim)))

    t_on = OnlineMamba(mmodel, mparams)
    r_on = OnlineRefiner(rmodel, rparams)
    got = run_pipeline(t_on, r_on, feats)

    g = mmodel.apply(mparams, feats[None])[0, 0]
    want = rmodel.apply(rparams, g, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_online_session_with_mamba():
    """OnlineSession with a Mamba temporal model (logits have no stage
    axis) returns the per-frame logits and matches offline."""
    import numpy as np

    from surgical_tpu.core.config import BackboneConfig, HeadConfig
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.parallel.mesh import make_mesh
    from surgical_tpu.serving.online import OnlineSession
    from surgical_tpu.train.extract import make_raw_feature_fn

    bcfg = BackboneConfig.preset("tiny")
    head = HeadConfig(embedding_dim=12, hidden=8)
    backbone = MiTEVP(bcfg, head)
    S = 64
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = backbone.init(jax.random.key(0), z, z,
                              jnp.zeros((1, S, S, 2), jnp.float32))

    mcfg = MambaConfig(layers=1, d_model=8, f_dim=12, d_state=4, d_conv=3,
                       dropout=0.0)
    mmodel = CausalMambaModel(mcfg, backend="xla")
    mparams = mmodel.init(jax.random.key(1), jnp.zeros((1, 4, mcfg.f_dim)))

    session = OnlineSession(backbone, variables, OnlineMamba(mmodel, mparams))
    rng = np.random.default_rng(31)
    T = 3
    imgs = rng.integers(0, 255, (T, S, S, 3), dtype=np.uint8)
    segs = rng.integers(0, 255, (T, S, S, 1), dtype=np.uint8)
    flows = rng.standard_normal((T, S, S, 2)).astype(np.float16)
    online_out = np.stack([
        session.step(imgs[t], segs[t], flows[t]) for t in range(T)
    ])
    assert online_out.shape == (T, mcfg.out_features)

    # default d2h_dtype (f16 wire): the same rounding OnlineSession's
    # feature leg applies, so parity is exact on production dtypes
    feat_fn = make_raw_feature_fn(backbone, variables, mesh=make_mesh(1))
    feats = np.asarray(feat_fn(imgs, segs, flows), np.float32)
    offline = mmodel.apply(mparams, feats[None])[0, 0]
    np.testing.assert_allclose(online_out, np.asarray(offline),
                               rtol=2e-4, atol=2e-4)
