"""Deployment export round-trip (serving/export.py): the serialized
StableHLO artifact must reproduce the live forward without model code."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.serving.export import (
    export_feature_extractor,
    load_artifact,
    save_artifact,
)


def _tiny(with_flow=True):
    cfg = BackboneConfig.preset("tiny", with_flow=with_flow)
    head = HeadConfig(embedding_dim=32, hidden=16)
    model = MiTEVP(cfg, head)
    S = 64
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z,
                           jnp.zeros((1, S, S, 2), jnp.float32))
    return model, variables, S


def test_export_roundtrip_features(tmp_path):
    model, variables, S = _tiny()
    B = 2
    exported = export_feature_extractor(model, variables, B, size=S)
    save_artifact(str(tmp_path / "art"), exported, meta={"variant": "tiny"})

    fn = load_artifact(str(tmp_path / "art"))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    flow = rng.standard_normal((B, S, S, 2)).astype(np.float16)

    got = np.asarray(fn(img, seg, flow))
    assert got.shape == (B, 32)

    # parity with the live forward through the same wire-format dequant
    from surgical_tpu.core.config import CHOLEC80_MEAN, CHOLEC80_STD

    mean = (np.asarray(CHOLEC80_MEAN) * 255.0).astype(np.float32)
    std = (np.asarray(CHOLEC80_STD) * 255.0).astype(np.float32)
    imgf = jnp.asarray((img.astype(np.float32) - mean) / std).astype(jnp.bfloat16)
    segf = jnp.broadcast_to(
        jnp.asarray((seg.astype(np.float32) - mean) / std).astype(jnp.bfloat16),
        imgf.shape)
    want = np.asarray(model.apply(
        variables, imgf, segf, jnp.asarray(flow).astype(jnp.bfloat16),
        return_features=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    assert fn.manifest["variant"] == "tiny"
    assert fn.manifest["platforms"] == [jax.default_backend()]


def test_export_no_flow_and_logits(tmp_path):
    model, variables, S = _tiny(with_flow=False)
    B = 2
    exported = export_feature_extractor(
        model, variables, B, size=S, with_flow=False, features=False)
    save_artifact(str(tmp_path / "art2"), exported)
    fn = load_artifact(str(tmp_path / "art2"))
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    phase, ant = fn(img, seg)
    assert np.asarray(phase).shape == (B, 7)
    assert np.asarray(ant).shape == (B, 7)
    assert np.isfinite(np.asarray(phase)).all()


def test_export_online_temporal_step(tmp_path):
    """The streaming MS-TCN step round-trips through jax.export: state
    threads through the artifact and logits match the live step."""
    from surgical_tpu.core.config import MSTCNConfig
    from surgical_tpu.models.mstcn import MultiStageTCN
    from surgical_tpu.serving.export import export_online_temporal
    from surgical_tpu.serving.online import OnlineMSTCN

    cfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=12)
    model = MultiStageTCN(cfg)
    feats = jnp.zeros((1, cfg.f_dim), jnp.float32)
    params = model.init(jax.random.key(0), feats[None])
    online = OnlineMSTCN(model, params)

    exported = export_online_temporal(online, cfg.f_dim)
    save_artifact(str(tmp_path / "tart"), exported, meta={"model": "mstcn"})
    fn = load_artifact(str(tmp_path / "tart"))

    rng = np.random.default_rng(2)
    xs = rng.standard_normal((6, cfg.f_dim)).astype(np.float32)

    # drive the artifact for 6 frames, threading the state manually
    state_live = online.init_state()
    flat = [np.asarray(a) for a in jax.tree.leaves(state_live)]
    arts = []
    for t in range(6):
        out = fn(*flat, xs[t])
        flat, logits = list(out[:-1]), out[-1]
        arts.append(np.asarray(logits))
        state_live, live_logits = online.step(state_live, jnp.asarray(xs[t]))
        np.testing.assert_allclose(np.asarray(logits), np.asarray(live_logits),
                                   rtol=1e-5, atol=1e-5)
    assert np.stack(arts).shape == (6, cfg.stages, cfg.out_features)


def test_export_online_mamba_step(tmp_path):
    """Streaming Mamba step through jax.export: conv window + SSM state
    thread through the artifact; logits match the live step."""
    from surgical_tpu.core.config import MambaConfig
    from surgical_tpu.models.mamba import CausalMambaModel
    from surgical_tpu.serving.export import export_online_temporal
    from surgical_tpu.serving.online import OnlineMamba

    cfg = MambaConfig(layers=2, d_model=8, f_dim=12, d_state=4, d_conv=3,
                      dropout=0.0)
    model = CausalMambaModel(cfg, backend="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 4, cfg.f_dim)))
    online = OnlineMamba(model, params)

    exported = export_online_temporal(online, cfg.f_dim)
    save_artifact(str(tmp_path / "mart"), exported, meta={"model": "mamba"})
    fn = load_artifact(str(tmp_path / "mart"))

    rng = np.random.default_rng(5)
    xs = rng.standard_normal((5, cfg.f_dim)).astype(np.float32)
    state_live = online.init_state()
    flat = [np.asarray(a) for a in jax.tree.leaves(state_live)]
    for t in range(5):
        out = fn(*flat, xs[t])
        flat, logits = list(out[:-1]), out[-1]
        state_live, live_logits = online.step(state_live, jnp.asarray(xs[t]))
        np.testing.assert_allclose(np.asarray(logits), np.asarray(live_logits),
                                   rtol=1e-5, atol=1e-5)


def test_export_online_refiner_step(tmp_path):
    """The streaming refiner step round-trips through jax.export: the len_q
    window buffer threads through the artifact; refined logits match."""
    from surgical_tpu.core.config import RefinerConfig
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.serving.export import export_online_refiner
    from surgical_tpu.serving.online import OnlineRefiner

    cfg = RefinerConfig(f_maps=8, f_dim=16, len_q=4)
    model = RefinementTransformer(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((4, cfg.out_features)),
                        jnp.zeros((4, cfg.f_dim)))
    online = OnlineRefiner(model, params)

    exported = export_online_refiner(online)
    save_artifact(str(tmp_path / "rart"), exported, meta={"model": "refiner"})
    fn = load_artifact(str(tmp_path / "rart"))

    rng = np.random.default_rng(7)
    buf = np.asarray(online.init_state())
    state_live = online.init_state()
    for t in range(6):
        g = rng.standard_normal(cfg.out_features).astype(np.float32)
        lfb = rng.standard_normal(cfg.f_dim).astype(np.float32)
        buf, refined = fn(buf, g, lfb)
        state_live, live = online.step(state_live, jnp.asarray(g), jnp.asarray(lfb))
        np.testing.assert_allclose(np.asarray(refined), np.asarray(live),
                                   rtol=1e-5, atol=1e-5)
